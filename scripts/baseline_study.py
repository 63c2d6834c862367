#!/usr/bin/env python
"""Baseline-method comparison study CLI.

Produces the DATA behind the reference's `search/baseline/` motivation
studies (`plot_weight_distribution_for_motivation.py`, `plot_mse_*.py`,
`search_*_for_activation_rotate.py`) as JSON tables instead of matplotlib
figures: per (block, layer kind), reconstruction MSE per baseline method,
the rotation-aware matmul-MSE sweep (plain vs block/full Hadamard), and
per-channel absmax distribution stats of the weights.

Inputs: a calibration store (scripts/calibrate.py) + model weights
(checkpoint or random smoke init).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--depth", type=int, default=30)
    p.add_argument("--resolution", type=int, default=256, choices=[256, 512])
    p.add_argument("--var-ckpt", type=str, default=None)
    p.add_argument("--calib", type=str, required=True)
    p.add_argument("--kind", type=str, default="fc1",
                   choices=["mat_qkv", "proj", "fc1", "fc2"])
    p.add_argument("--bits", type=int, default=4, choices=[4, 6])
    p.add_argument("--blocks", type=str, default=None,
                   help="range a:b (default: all)")
    p.add_argument("--max-samples", type=int, default=1024)
    p.add_argument("--full-rotation", action="store_true",
                   help="full-size Hadamard instead of block-diagonal")
    p.add_argument("--out", type=str, default="baseline_study.json")
    args = p.parse_args()

    import jax

    from fpqvar_tpu.utils.jit_cache import enable as _jc
    _jc()  # persistent XLA compile cache (.jax_cache)
    import numpy as np

    from fpqvar_tpu.config import (
        VARConfig, VQVAEConfig, PATCH_NUMS_256, PATCH_NUMS_512)
    from fpqvar_tpu.models.var import init_var_params
    from fpqvar_tpu.quantize import baselines as B
    from fpqvar_tpu.quantize.calibration import CalibrationStore
    from fpqvar_tpu.utils import checkpoint as C

    pns = PATCH_NUMS_512 if args.resolution == 512 else PATCH_NUMS_256
    cfg = VARConfig(depth=args.depth, shared_aln=(args.resolution == 512),
                    patch_nums=pns, vae=VQVAEConfig(patch_nums=pns))
    if args.var_ckpt:
        var_p = C.convert_var_state_dict(
            C.load_torch_state_dict(args.var_ckpt), cfg)
    else:
        print("[warn] random init (smoke-test mode)", file=sys.stderr)
        var_p = init_var_params(jax.random.PRNGKey(0), cfg)

    weights = np.asarray(var_p["blocks"][f"{args.kind}_w"], np.float32)
    store = CalibrationStore(args.calib)
    rng = np.random.default_rng(0)
    if args.blocks:
        a, b = args.blocks.split(":")
        blocks = range(int(a), int(b))
    else:
        blocks = range(args.depth)

    report = []
    for blk in blocks:
        steps = store.steps(args.kind, blk)
        xs = [store.load(args.kind, blk, s).reshape(-1, weights.shape[-1])
              for s in range(steps)]
        x = np.concatenate(xs, axis=0)
        if x.shape[0] > args.max_samples:
            x = x[rng.choice(x.shape[0], args.max_samples, replace=False)]
        w = weights[blk]
        absmax_c = np.abs(x).max(axis=0)
        entry = {
            "block_idx": blk,
            # per-channel activation absmax distribution (the outlier
            # motivation stats the reference plots)
            "act_absmax": {
                "max": float(absmax_c.max()),
                "median": float(np.median(absmax_c)),
                "p99_over_median": float(
                    np.percentile(absmax_c, 99)
                    / max(np.median(absmax_c), 1e-9)),
            },
            "reconstruction_mse": B.compare_baselines(x, n_bits=args.bits),
            "rotation_aware_matmul_mse": B.rotation_aware_sweep(
                x, w, n_bits=args.bits,
                block_rotate=not args.full_rotation),
        }
        report.append(entry)
        print(json.dumps({"block": blk,
                          "act_p99/med":
                          entry["act_absmax"]["p99_over_median"]}),
              flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
