#!/usr/bin/env python
"""One-window A/B of the two KV-cache scan plumbings (xs/ys+outer-DUS vs
cache-in-carry, FPQVAR_KV_CARRY=1) for bf16 / int8chs / int8kv at a given
batch.  Alternated legs inside ONE process so relay drift cancels; prints
per-leg rates and the new/carry ratio per mode.

Usage: python scripts/ab_kv_plumbing.py [--batch 8] [--rounds 6]
       [--modes bf16,int8chs,int8kv]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from fpqvar_tpu.utils.jit_cache import enable as _enable_cache

_enable_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--modes", default="bf16,int8chs,int8kv")
    ap.add_argument("--preset", default="d30")
    args = ap.parse_args()

    from fpqvar_tpu.config import (GenerateConfig, VARConfig, bench_recipes,
                                   var_d36_512, var_tiny)
    from fpqvar_tpu.models import VARGenerator
    from fpqvar_tpu.models.vqvae import init_vqvae_params
    from fpqvar_tpu.quantize.recipe import synth_device_params

    cfg = {"tiny": var_tiny, "d16": lambda: VARConfig(depth=16),
           "d30": lambda: VARConfig(depth=30),
           "d36": var_d36_512}[args.preset]()
    recs = bench_recipes()
    salt = int.from_bytes(os.urandom(4), "little") & 0x7FFFFFFF

    @jax.jit
    def _vae_init(k):
        p = init_vqvae_params(k, cfg.vae)
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, p)

    vae_p = _vae_init(jax.random.PRNGKey(1))
    lab = jnp.arange(args.batch, dtype=jnp.int32) % cfg.num_classes
    key = jax.random.fold_in(jax.random.PRNGKey(0), salt)

    def measure(mode, carry):
        os.environ["FPQVAR_KV_PLUMB"] = "carry" if carry else "xs"
        qcfg = recs[mode]
        galt = (np.ones((cfg.depth, cfg.width), np.float32),
                np.ones((cfg.depth, cfg.width), np.float32))
        params = synth_device_params(
            cfg, qcfg, jax.random.PRNGKey(0),
            galt=galt if qcfg.transform else None)
        gen = VARGenerator(cfg, qcfg, GenerateConfig())
        imgs = gen.generate(params, vae_p, lab, key)   # compile+warm
        np.asarray(imgs[0, 0, 0, 0])
        dts = []
        for i in range(args.rounds):
            t0 = time.perf_counter()
            imgs = gen.generate(params, vae_p, lab,
                                jax.random.fold_in(key, i))
            np.asarray(imgs[0, 0, 0, 0])
            dts.append(time.perf_counter() - t0)
        for leaf in jax.tree_util.tree_leaves(params):
            if hasattr(leaf, "delete"):
                leaf.delete()
        rate = args.batch / float(np.median(dts))
        print(f"# {mode}[{'carry' if carry else 'new'}]: {rate:.3f} img/s",
              file=sys.stderr, flush=True)
        return rate

    out = {}
    modes = args.modes.split(",")
    # alternate new/carry per mode, then a closing new-bf16 drift leg
    for mode in modes:
        out[f"{mode}/new"] = measure(mode, False)
        out[f"{mode}/carry"] = measure(mode, True)
    out["bf16/new2"] = measure("bf16", False)
    for mode in modes:
        r = out[f"{mode}/new"] / out[f"{mode}/carry"]
        print(f"{mode}: new/carry = {r:.4f}")
    print(f"drift bf16 new legs: "
          f"{out['bf16/new2'] / out['bf16/new']:.4f}")


if __name__ == "__main__":
    main()
