#!/usr/bin/env python
"""Motivation-study figures (the reference's `search/baseline/plot_*.py`).

Reproduces, as one CLI, the reference's four matplotlib studies:

- ``--plot mse`` with ``--tensor act``: per-block activation reconstruction
  MSE per FP format (`search/baseline/search_fp_format_baseline_1_for_
  activation.py:745-854` computes the curves; `plot_mse_activation.py` /
  `plot_mse_activation_fc2.py` render them).  ``--rotate`` quantizes the
  block-Hadamard-rotated activations instead (`..._for_activation_rotate.py:
  597-660` — MSE is measured in the rotated domain).  ``--kind fc2`` adds
  the dual-grid formats (AFPQ, DFQ, neg-reverse) exactly as the reference's
  fc2 study does.
- ``--plot mse --tensor weight``: per-block weight MSE per format
  (`plot_mse_weight.py`).
- ``--plot dist``: one block's weight histogram with the INT4 and FP4-E2M1
  per-tensor quantization levels overlaid
  (`plot_weight_distribution_for_motivation.py:407-453`) — the paper's
  "FP grids match the bell-shaped distribution" figure.

Unlike the reference (hard-coded author paths, curves precomputed into .pt
files by separate 900-line sweep scripts), this computes the curves live
from a calibration store (scripts/calibrate.py) or the model weights and
writes both the figure (PNG) and the underlying data (JSON).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# validated categorical palette (fixed assignment order, CVD-checked)
SERIES = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100", "#e87ba4",
          "#008300", "#4a3aa7", "#e34948"]
MARKERS = ["o", "^", "D", "s", "*", "v", "P", "X"]


def _formats(kind: str, bits: int):
    """(label -> quantize fn) in the reference's plotting order."""
    from fpqvar_tpu.ops import quantizers as Q
    gran = dict(granularity="per_group", group_size=128)
    if bits == 6:
        fmts = {
            "INT6": lambda x: Q.fake_quant_int_sym(x, n_bits=6, **gran),
            "E2M3": lambda x: Q.fake_quant_fp(x, "fp6_e2m3", **gran),
            "E3M2": lambda x: Q.fake_quant_fp(x, "fp6_e3m2", **gran),
        }
        if kind == "fc2":
            fmts["INT-neg/E2M3-pos"] = lambda x: Q.fake_quant_dual(
                x, "fp6_int_neg_e2m3_pos", **gran)
        return fmts
    fmts = {
        "E1M2 / INT4": lambda x: Q.fake_quant_fp(x, "fp_e1", **gran),
        "E2M1": lambda x: Q.fake_quant_fp(x, "fp_e2", **gran),
        "E3M0": lambda x: Q.fake_quant_fp(x, "fp_e3", **gran),
    }
    if kind == "fc2":
        fmts["AFPQ"] = lambda x: Q.fake_quant_dual(x, "fp4_afpq", **gran)
        fmts["DFQ"] = lambda x: Q.fake_quant_dual(
            x, "fp_e1m2_neg_e2m1_pos", **gran)
        fmts["NegReverse"] = lambda x: Q.fake_quant_neg_reverse(
            x, group_size=128)
    return fmts


def _load_model(args):
    import jax

    from fpqvar_tpu.config import (
        VARConfig, VQVAEConfig, PATCH_NUMS_256, PATCH_NUMS_512)
    from fpqvar_tpu.models.var import init_var_params
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
    return cfg, var_p


def _block_rotation(c: int, seed: int = 42):
    import jax.numpy as jnp

    from fpqvar_tpu.ops import hadamard as H
    qb = jnp.asarray(H.block_hadamard_block(128, seed), jnp.float32)
    return jnp.kron(jnp.eye(c // 128, dtype=jnp.float32), qb)


def mse_study(args):
    import jax.numpy as jnp
    import numpy as np

    from fpqvar_tpu.quantize.calibration import CalibrationStore

    cfg, var_p = _load_model(args)
    weights = np.asarray(var_p["blocks"][f"{args.kind}_w"], np.float32)
    blocks = range(cfg.depth)
    fmts = _formats(args.kind, args.bits)
    rot = _block_rotation(weights.shape[-1]) if args.rotate else None
    rng = np.random.default_rng(0)

    curves = {name: [] for name in fmts}
    store = CalibrationStore(args.calib) if args.tensor == "act" else None
    for blk in blocks:
        if args.tensor == "act":
            steps = store.steps(args.kind, blk)
            xs = [store.load(args.kind, blk, s).reshape(
                -1, weights.shape[-1]) for s in range(steps)]
            x = np.concatenate(xs, axis=0)
            if x.shape[0] > args.max_samples:
                x = x[rng.choice(x.shape[0], args.max_samples,
                                 replace=False)]
        else:
            x = weights[blk]
        xj = jnp.asarray(x, jnp.float32)
        if rot is not None:
            xj = xj @ rot  # MSE is measured in the rotated domain
        for name, fn in fmts.items():
            curves[name].append(float(jnp.mean((xj - fn(xj)) ** 2)))
        print(f"block {blk}: " + ", ".join(
            f"{n}={curves[n][-1]:.3e}" for n in fmts), flush=True)

    means = {n: float(np.mean(v)) for n, v in curves.items()}
    print("per-format mean MSE:", json.dumps(means, indent=2))
    stem = (f"{args.tensor}_mse.{'rotate_' if args.rotate else ''}"
            f"{args.kind}")
    out_json = args.out or f"{stem}.json"
    with open(out_json, "w") as f:
        json.dump({"kind": args.kind, "tensor": args.tensor,
                   "bits": args.bits, "rotate": args.rotate,
                   "curves": curves, "means": means}, f, indent=2)
    _plot_curves(curves, os.path.splitext(out_json)[0] + ".png",
                 ylabel="Quantization Error")
    print(f"wrote {out_json} and companion .png")


def _plot_curves(curves, png, ylabel):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 4.5), dpi=150)
    for i, (name, ys) in enumerate(curves.items()):
        ax.plot(range(len(ys)), ys, label=name, color=SERIES[i],
                linewidth=2, marker=MARKERS[i], markersize=5)
    ax.set_xlabel("Block Index", fontsize=12)
    ax.set_ylabel(ylabel, fontsize=12)
    ax.ticklabel_format(axis="y", style="sci", scilimits=(0, 0))
    ax.grid(True, alpha=0.25, linewidth=0.5)
    ax.spines[["top", "right"]].set_visible(False)
    ax.legend(fontsize=10, frameon=False)
    fig.tight_layout()
    fig.savefig(png, bbox_inches="tight")
    plt.close(fig)


def clip_study(args):
    """Clipping-strength sweep on fc2 activations (the reference's
    `search/fc2_quant.py` clipping experiments / `search_fp_format_
    baseline_2.py:489+`): reconstruction MSE vs the ORIGINAL tensor as the
    pre-quant clamp at ``strength * absmax`` tightens, per format."""
    import jax.numpy as jnp
    import numpy as np

    from fpqvar_tpu.ops import quantizers as Q
    from fpqvar_tpu.quantize.calibration import CalibrationStore

    cfg, var_p = _load_model(args)
    c_in = var_p["blocks"][f"{args.kind}_w"].shape[-1]
    store = CalibrationStore(args.calib)
    rng = np.random.default_rng(0)
    blocks = list(range(cfg.depth))[:: max(1, cfg.depth // 6)]
    strengths = [round(s, 2) for s in np.arange(0.5, 1.01, 0.05)]
    gran = dict(granularity="per_group", group_size=128)

    def quantizers(xc):
        return {
            "DFQ": Q.fake_quant_dual(xc, "fp_e1m2_neg_e2m1_pos", **gran),
            "AFPQ": Q.fake_quant_dual(xc, "fp4_afpq", **gran),
            "E2M1": Q.fake_quant_fp(xc, "fp_e2", **gran),
        }

    curves = {name: [0.0] * len(strengths) for name in ("DFQ", "AFPQ",
                                                        "E2M1")}
    for blk in blocks:
        steps = store.steps(args.kind, blk)
        x = np.concatenate([store.load(args.kind, blk, s).reshape(-1, c_in)
                            for s in range(steps)], axis=0)
        if x.shape[0] > args.max_samples:
            x = x[rng.choice(x.shape[0], args.max_samples, replace=False)]
        xj = jnp.asarray(x, jnp.float32)
        amax = jnp.max(jnp.abs(xj))
        for i, s in enumerate(strengths):
            xc = jnp.clip(xj, -s * amax, s * amax)
            for name, q in quantizers(xc).items():
                curves[name][i] += float(jnp.mean((xj - q) ** 2)) / len(
                    blocks)
    best = {n: strengths[int(np.argmin(v))] for n, v in curves.items()}
    print("argmin strength per format:", json.dumps(best))
    out_json = args.out or f"clip_mse.{args.kind}.json"
    with open(out_json, "w") as f:
        json.dump({"kind": args.kind, "strengths": strengths,
                   "curves": curves, "best": best,
                   "blocks_sampled": list(blocks)}, f, indent=2)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 4.5), dpi=150)
    for i, (name, ys) in enumerate(curves.items()):
        ax.plot(strengths, ys, label=name, color=SERIES[i], linewidth=2,
                marker=MARKERS[i], markersize=5)
    ax.set_xlabel("Clipping Strength", fontsize=12)
    ax.set_ylabel("Quantization Error", fontsize=12)
    ax.ticklabel_format(axis="y", style="sci", scilimits=(0, 0))
    ax.grid(True, alpha=0.25, linewidth=0.5)
    ax.spines[["top", "right"]].set_visible(False)
    ax.legend(fontsize=10, frameon=False)
    fig.tight_layout()
    fig.savefig(os.path.splitext(out_json)[0] + ".png",
                bbox_inches="tight")
    plt.close(fig)
    print(f"wrote {out_json} and companion .png")


def dist_study(args):
    import matplotlib
    matplotlib.use("Agg")
    import jax.numpy as jnp
    import matplotlib.pyplot as plt
    import numpy as np

    from fpqvar_tpu.ops import grids as G
    from fpqvar_tpu.ops import quantizers as Q

    cfg, var_p = _load_model(args)
    w = np.asarray(var_p["blocks"][f"{args.kind}_w"][args.block],
                   np.float32)
    # per-tensor scales, as the reference's motivation figure uses
    # (`plot_weight_distribution_for_motivation.py:414-421`)
    int_scale = float(np.abs(w).max()) / 7.0
    int_levels = [v * int_scale for v in range(-8, 8)]
    fp_grid = np.asarray(G.FP4_E2M1)
    fp_scale = float(np.abs(w).max()) / float(np.abs(fp_grid).max())
    fp_levels = [float(v) * fp_scale for v in fp_grid]
    mse_int = float(jnp.mean((jnp.asarray(w) - Q.fake_quant_int_sym(
        jnp.asarray(w), n_bits=4, granularity="per_tensor")) ** 2))
    mse_fp = float(jnp.mean((jnp.asarray(w) - Q.fake_quant_fp(
        jnp.asarray(w), "fp_e2", granularity="per_tensor")) ** 2))

    fig, ax = plt.subplots(figsize=(8, 4.5), dpi=150)
    ax.hist(w.flatten(), bins=100, alpha=0.75, color=SERIES[0])
    for i, lv in enumerate(int_levels):
        ax.axvline(x=lv, color=SERIES[7], linestyle="--", linewidth=1,
                   label="INT4 levels" if i == 0 else "")
    for i, lv in enumerate(fp_levels):
        ax.axvline(x=lv, color=SERIES[2], linestyle=":", linewidth=1.5,
                   label="FP4-E2M1 levels" if i == 0 else "")
    ax.set_xlabel("Weight Value", fontsize=12)
    ax.set_ylabel("Frequency", fontsize=12)
    ax.spines[["top", "right"]].set_visible(False)
    ax.legend(fontsize=10, frameon=False)
    fig.tight_layout()
    out = args.out or (f"weight_distribution_{args.kind}"
                       f"_block{args.block}.png")
    fig.savefig(out, bbox_inches="tight")
    plt.close(fig)
    print(json.dumps({"kind": args.kind, "block": args.block,
                      "mse_int4_per_tensor": mse_int,
                      "mse_fp4_e2m1_per_tensor": mse_fp}))
    print(f"wrote {out}")


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--plot", choices=["mse", "dist", "clip"],
                   required=True)
    p.add_argument("--depth", type=int, default=30)
    p.add_argument("--resolution", type=int, default=256,
                   choices=[256, 512])
    p.add_argument("--var-ckpt", type=str, default=None)
    p.add_argument("--kind", type=str, default="mat_qkv",
                   choices=["mat_qkv", "proj", "fc1", "fc2"])
    p.add_argument("--tensor", choices=["act", "weight"], default="act")
    p.add_argument("--calib", type=str, default=None,
                   help="calibration store dir (required for --tensor act)")
    p.add_argument("--bits", type=int, default=4, choices=[4, 6])
    p.add_argument("--rotate", action="store_true",
                   help="block-Hadamard-rotate before quantizing "
                        "(the reference's rotate_* studies)")
    p.add_argument("--block", type=int, default=9,
                   help="block index for --plot dist (reference uses 9)")
    p.add_argument("--max-samples", type=int, default=1024)
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()
    if ((args.plot == "clip" or
         (args.plot == "mse" and args.tensor == "act")) and not args.calib):
        p.error("this mode requires --calib")
    {"mse": mse_study, "dist": dist_study, "clip": clip_study}[args.plot](
        args)


if __name__ == "__main__":
    main()
