#!/usr/bin/env python
"""GALT training CLI (reference learnable_transformation scripts: {mat_qkv,
fc1} x {fp4, fp6} x {256, 512} — one parameterized entry point)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    from _common import add_model_flags

    add_model_flags(p, default_depth=30)
    p.add_argument("--var-ckpt", type=str, default=None)
    p.add_argument("--calib", type=str, required=True)
    p.add_argument("--kind", type=str, default="fc1",
                   choices=["mat_qkv", "fc1"])
    p.add_argument("--bits", type=int, default=4, choices=[4, 6])
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--max-samples-per-step", type=int, default=256)
    p.add_argument("--out", type=str, required=True)
    args = p.parse_args()

    import jax

    from fpqvar_tpu.utils.jit_cache import enable as _jc
    _jc()  # persistent XLA compile cache (.jax_cache)
    import numpy as np

    from _common import model_config
    from fpqvar_tpu.models.var import init_var_params
    from fpqvar_tpu.quantize.calibration import CalibrationStore
    from fpqvar_tpu.quantize import galt as G
    from fpqvar_tpu.utils import checkpoint as C

    cfg = model_config(args)
    if args.var_ckpt:
        var_p = C.convert_var_state_dict(
            C.load_torch_state_dict(args.var_ckpt), cfg)
    else:
        print("[warn] random init (smoke-test mode)", file=sys.stderr)
        var_p = init_var_params(jax.random.PRNGKey(0), cfg)

    weights = np.asarray(var_p["blocks"][f"{args.kind}_w"], np.float32)
    store = CalibrationStore(args.calib)
    best_s = G.train_galt(
        store, weights, args.kind, w_bit=args.bits, epochs=args.epochs,
        lr=args.lr, max_samples_per_step=args.max_samples_per_step)
    G.save_best_s(args.out, best_s)
    print(f"wrote {args.out}: shape {best_s.shape}")


if __name__ == "__main__":
    main()
