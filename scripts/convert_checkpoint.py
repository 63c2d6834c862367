#!/usr/bin/env python
"""Checkpoint conversion CLI: upstream torch .pth -> framework npz, with
optional offline quantization (fold GALT -> rotate -> quantize/pack).

The reference re-applies quantization at every startup
(`evaluate_fp_quant_transform_rotate.py:87-131`); here the transformed
(optionally packed) checkpoint is persisted once and loaded directly.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    from _common import add_model_flags

    add_model_flags(p, default_depth=30)
    p.add_argument("--var-ckpt", type=str, default=None,
                   help="upstream torch .pth; omitted -> random init "
                        "(smoke-test mode)")
    p.add_argument("--vae-ckpt", type=str, default=None)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--vae-out", type=str, default=None)
    # quantization recipe (same flags as scripts/evaluate.py, subset)
    p.add_argument("--quant", action="store_true")
    p.add_argument("--backend", type=str, default="packed",
                   choices=["fake", "packed", "int8"])
    p.add_argument("--w_bit", type=int, default=4)
    p.add_argument("--weight_fp_type", type=str, default="fp_e2")
    p.add_argument("--rotate", action="store_true")
    p.add_argument("--block_rotate", action="store_true")
    p.add_argument("--transform", action="store_true")
    p.add_argument("--best-s-dir", type=str, default=None)
    p.add_argument("--bf16", action="store_true",
                   help="bf16-cast unquantized f32 leaves even for plain "
                        "(no-transform) conversions")
    args = p.parse_args()

    from _common import model_config
    from fpqvar_tpu.config import QuantConfig
    from fpqvar_tpu.quantize import quantize_var_params
    from fpqvar_tpu.quantize import galt as G
    from fpqvar_tpu.utils import checkpoint as C

    cfg = model_config(args)
    if args.var_ckpt:
        var_p = C.convert_var_state_dict(
            C.load_torch_state_dict(args.var_ckpt), cfg)
    else:
        import jax

        from fpqvar_tpu.models.var import init_var_params

        print("[warn] no --var-ckpt - random init (smoke-test mode)",
              file=sys.stderr)
        var_p = init_var_params(jax.random.PRNGKey(0), cfg)

    # bf16-cast unquantized leaves BEFORE the transform, mirroring
    # evaluate.py's --var-ckpt path: quantize_var_params preserves dtype of
    # non-quantized leaves (embeddings, head, biases), so a packed ckpt
    # written from f32 would run with 2x the HBM and numerically diverge
    # from the direct --var-ckpt route.  Plain conversions (no transform)
    # keep f32 unless --bf16: lossless torch->npz interchange stays
    # lossless by default.
    if args.bf16 or args.quant or args.rotate or args.transform:
        import jax
        import jax.numpy as jnp

        var_p = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, var_p)

    if args.quant or args.rotate or args.transform:
        qcfg = QuantConfig(
            enabled=args.quant, w_bit=args.w_bit,
            weight_format=args.weight_fp_type, backend=args.backend,
            rotate=args.rotate, block_rotate=args.block_rotate,
            transform=args.transform)
        galt = None
        if args.transform:
            galt = G.load_best_s_pair(args.best_s_dir, args.w_bit)
        var_p = quantize_var_params(var_p, cfg, qcfg, galt=galt)

    C.save_params(args.out, var_p)
    print(f"wrote {args.out}")
    if args.vae_ckpt:
        vae_p = C.convert_vqvae_state_dict(
            C.load_torch_state_dict(args.vae_ckpt), cfg.vae)
        vae_out = args.vae_out or args.out.replace(".npz", "_vae.npz")
        C.save_params(vae_out, vae_p)
        print(f"wrote {vae_out}")


if __name__ == "__main__":
    main()
