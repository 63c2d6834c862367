#!/usr/bin/env python
"""Generation server CLI: continuous batching of class-conditional requests.

Reads requests as lines of "<class_id> [seed]" from stdin (or generates a
demo load with --demo N), writes PNGs to --out.  One server per host; shard
classes across hosts with fpqvar_tpu.eval.pipeline.class_range_for_host.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from _common import add_model_flags

    p = argparse.ArgumentParser()
    add_model_flags(p, default_depth=16)
    p.add_argument("--vae-ckpt", type=str, default=None)
    p.add_argument("--var-ckpt", type=str, default=None)
    p.add_argument("--packed-ckpt", type=str, default=None)
    p.add_argument("--recipe", type=str, default="bf16",
                   choices=["bf16", "w4a4", "w4a16", "w6a6"],
                   help="bf16 = unquantized; w4a16 = weights-only int8-code "
                        "deployment mode (the batch-1 serving winner); "
                        "w4a4/w6a6 = the paper's full recipes (GALT folded "
                        "offline or disabled via --no-transform)")
    p.add_argument("--backend", type=str, default=None,
                   choices=["fake", "packed", "int8"],
                   help="override the recipe's execution backend")
    p.add_argument("--no-transform", action="store_true",
                   help="drop GALT from w4a4/w6a6 (no best_s artifacts)")
    p.add_argument("--best-s-dir", type=str, default=None,
                   help="GALT best_s artifact dir (required by w4a4/w6a6 "
                        "unless --no-transform)")
    p.add_argument("--max-batch", type=int, default=16)
    p.add_argument("--max-wait-ms", type=float, default=50.0)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--demo", type=int, default=0,
                   help="submit N demo requests instead of reading stdin")
    args = p.parse_args()

    import jax

    from fpqvar_tpu.utils.jit_cache import enable as _jc
    _jc()  # persistent XLA compile cache (.jax_cache)
    import numpy as np

    from _common import model_config
    from fpqvar_tpu.config import (
        GenerateConfig, QuantConfig, fpqvar_w4a4, fpqvar_w4a16, fpqvar_w6a6)
    from fpqvar_tpu.models import VARGenerator, build_vae_var
    from fpqvar_tpu.serving import GenerationServer
    from fpqvar_tpu.utils import checkpoint as C
    from fpqvar_tpu.eval.imaging import save_images_png

    cfg = model_config(args)
    # checkpoints load independently: a --packed-ckpt replaces the torch var
    # ckpt (no --var-ckpt needed), the VQVAE comes from --vae-ckpt
    if args.vae_ckpt:
        vae_p = C.convert_vqvae_state_dict(
            C.load_torch_state_dict(args.vae_ckpt), cfg.vae)
    else:
        print("[warn] random-init VQVAE (smoke-test mode)", file=sys.stderr)
        vae_p, _ = build_vae_var(jax.random.PRNGKey(0), cfg)
    if args.packed_ckpt:
        var_p = C.load_params(args.packed_ckpt)
    elif args.var_ckpt:
        var_p = C.convert_var_state_dict(
            C.load_torch_state_dict(args.var_ckpt), cfg)
    else:
        print("[warn] random-init VAR (smoke-test mode)", file=sys.stderr)
        _, var_p = build_vae_var(jax.random.PRNGKey(0), cfg)

    qcfg = {"bf16": QuantConfig(), "w4a4": fpqvar_w4a4(),
            "w4a16": fpqvar_w4a16(), "w6a6": fpqvar_w6a6()}[args.recipe]
    if args.no_transform and qcfg.enabled:
        qcfg = qcfg.replace(transform=False)
    if args.backend is not None and qcfg.enabled:
        qcfg = qcfg.replace(backend=args.backend)
    if qcfg.enabled and not args.packed_ckpt:
        # offline weight pipeline (fold GALT -> rotate -> quantize/encode);
        # a --packed-ckpt already carries transformed weights
        from fpqvar_tpu.quantize import galt as G
        from fpqvar_tpu.quantize import quantize_var_params

        galt = None
        if qcfg.transform:
            if args.best_s_dir is None:
                raise SystemExit(f"--recipe {args.recipe} applies GALT: "
                                 "pass --best-s-dir or --no-transform")
            try:
                galt = G.load_best_s_pair(args.best_s_dir, qcfg.w_bit)
            except FileNotFoundError as e:
                raise SystemExit(str(e))
        var_p = quantize_var_params(var_p, cfg, qcfg, galt=galt)
    gen = VARGenerator(cfg, qcfg, GenerateConfig())
    server = GenerationServer(gen, var_p, vae_p, max_batch=args.max_batch,
                              max_wait_ms=args.max_wait_ms)
    os.makedirs(args.out, exist_ok=True)

    def requests():
        if args.demo:
            for i in range(args.demo):
                yield i % cfg.num_classes, i
        else:
            for line in sys.stdin:
                parts = line.split()
                if parts:
                    yield int(parts[0]), int(parts[1]) if len(parts) > 1 else 0

    futs = []
    for ci, seed in requests():
        futs.append((ci, seed, server.submit(ci, seed)))
    for i, (ci, seed, fut) in enumerate(futs):
        img = fut.result()
        save_images_png(np.asarray(img)[None], args.out, ci, start_idx=seed)
    st = server.stats()
    print(f"served {len(futs)} requests in {st['batches']} batches "
          f"({st['pipelined']} pipelined) -> {args.out}")
    server.stop()


if __name__ == "__main__":
    main()
