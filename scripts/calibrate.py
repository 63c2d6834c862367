#!/usr/bin/env python
"""Calibration capture CLI (reference `evaluate.py:67-80`: 100 classes x 1
image through the baseline model, saving per-(layer, block, step) inputs)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    from _common import add_model_flags

    add_model_flags(p, default_depth=30)
    p.add_argument("--vae-ckpt", type=str, default=None)
    p.add_argument("--var-ckpt", type=str, default=None)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--num-classes", type=int, default=100,
                   help="calibration label count (reference cali_data_size)")
    p.add_argument("--batch", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from fpqvar_tpu.utils.jit_cache import enable as _jc
    _jc()  # persistent XLA compile cache (.jax_cache)

    from _common import model_config
    from fpqvar_tpu.models import build_vae_var
    from fpqvar_tpu.quantize.calibration import (
        CalibrationStore, capture_condition, capture_generation)
    from fpqvar_tpu.utils import checkpoint as C
    import numpy as np

    cfg = model_config(args)
    if args.vae_ckpt and args.var_ckpt:
        vae_p = C.convert_vqvae_state_dict(
            C.load_torch_state_dict(args.vae_ckpt), cfg.vae)
        var_p = C.convert_var_state_dict(
            C.load_torch_state_dict(args.var_ckpt), cfg)
    else:
        print("[warn] random init (smoke-test mode)", file=sys.stderr)
        vae_p, var_p = build_vae_var(jax.random.PRNGKey(0), cfg)

    store = CalibrationStore(args.out)
    key = jax.random.PRNGKey(args.seed)
    for start in range(0, args.num_classes, args.batch):
        labels = jnp.arange(start, min(start + args.batch, args.num_classes),
                            dtype=jnp.int32)
        taps = capture_generation(var_p, vae_p, cfg, labels,
                                  jax.random.fold_in(key, start))
        store.append_run(taps)
        print(f"captured classes {start}..{int(labels[-1])}", flush=True)
    np.savez_compressed(
        os.path.join(args.out, "condition.npz"),
        cond=capture_condition(var_p, cfg, np.arange(args.num_classes)))


if __name__ == "__main__":
    main()
