#!/usr/bin/env python
"""Bisect the batch-8 late-scale int8chs regression (round 3).

The corrected roofline says the int8ch GEMM chain is 1.36x bf16 at the
pn16 shapes, yet the per-scale breakdown shows int8chs LOSING to bf16
exactly there (pn13 +20ms, pn16 +37ms) while winning every smaller
scale.  This probe times the REAL 30-block `run_blocks` forward (the
component the modes actually change) at pn16 shapes under each recipe
ingredient toggled separately:

  bf16            — no quantization (the baseline the mode must beat)
  int8chs         — full recipe: rotate + GALT + per-token act codes
  int8chs_norot   — same minus online rotation + GALT multiply
  int8chs_nogalt  — rotation on, GALT multiply off
  w4a16           — weights-only codes (no act work, no rotate)
  fake            — fake-quant recipe (bf16 GEMMs)

Protocol: 20 dependent iterations inside one jitted fori_loop, FULL
output fed back (mean over C — no DCE), per-leg median of 3 bumped
windows, result fetched (see kernel_roofline.py's measurement-history
warning).  Host param transforms ride bench.py's .bench_cache.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from fpqvar_tpu.utils import jit_cache

jit_cache.enable()

ITERS = 20


def main():
    from fpqvar_tpu.config import VARConfig, bench_recipes
    from fpqvar_tpu.models import var as V
    from fpqvar_tpu.quantize.runtime import build_runtime

    cfg = VARConfig(depth=30)
    b, l = 16, 256                       # cfg-doubled batch 8 at pn16

    reg = bench_recipes()
    modes = {
        "bf16": reg["bf16"],
        "int8chs": reg["int8chs"],
        "int8chs_norot": reg["int8chsnr"],
        "int8chs_nogalt": reg["int8chs"].replace(transform=False),
        "w4a16": reg["w4a16"],
        "fake": reg["fake"],
    }
    galt = (np.ones((cfg.depth, cfg.width), np.float32),
            np.ones((cfg.depth, cfg.width), np.float32))

    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (b, l, cfg.width), jnp.float32)
    mod0 = jax.random.normal(jax.random.fold_in(key, 1),
                             (cfg.depth, 6, b, 1, cfg.width),
                             jnp.float32) * 0.02

    def make_loop(qrt):
        @jax.jit
        def run(params, x, mod):
            def body(i, carry):
                xx, s = carry
                y, _, _ = V.run_blocks(params, cfg, qrt, xx, mod)
                feed = y.astype(jnp.float32).mean(axis=-1, keepdims=True)
                xx = (x + 1e-3 * feed).astype(x.dtype)
                return (xx, s + feed[0, 0, 0])
            return jax.lax.fori_loop(0, ITERS, body, (x, 0.0))[1]
        return run

    from fpqvar_tpu.quantize.recipe import synth_device_params

    results = {}
    dev = jax.devices()[0]
    for name in modes:
        t0 = time.perf_counter()
        params = synth_device_params(
            cfg, modes[name], jax.random.PRNGKey(0),
            galt=galt if modes[name].transform else None)
        qrt = build_runtime(modes[name], cfg.depth, cfg.width)
        fn = make_loop(qrt)
        np.asarray(fn(params, x0, mod0))          # compile + warm
        t_compile = time.perf_counter() - t0
        dts = []
        cur_x = x0
        for r in range(3):
            cur_x = cur_x * 1.0078125
            xd = jax.device_put(cur_x, dev)
            np.asarray(xd[0, 0, 0])
            t1 = time.perf_counter()
            np.asarray(fn(params, xd, mod0))
            dts.append(time.perf_counter() - t1)
        ms = float(np.median(dts)) / ITERS * 1000
        results[name] = round(ms, 2)
        print(f"{name:16s} {ms:8.2f} ms / 30-block fwd "
              f"(compile+warm {t_compile:.0f}s)", flush=True)
        for leaf in jax.tree_util.tree_leaves(params):
            if hasattr(leaf, "delete"):
                leaf.delete()

    print(json.dumps({"pn16_block_fwd_ms": results, "b": b, "l": l}))


if __name__ == "__main__":
    main()
