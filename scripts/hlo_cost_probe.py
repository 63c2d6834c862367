#!/usr/bin/env python
"""Optimized-HLO cost diff between modes for ONE scale-step geometry.

Compiles the real `run_blocks` forward (the component the modes change) at
a chosen (cur, l) step geometry and batch, then walks the optimized HLO's
backend_config estimated cost fields, bucketing
estimated_cycles * prod(iteration_bounds) by opcode class (convolution/dot,
copy/transpose, fusion, all-else) and printing the top ops per mode.  The
technique that localized the round-4 N-D layout-copy finding
(ROUND_NOTES_r04.md §1b) as a reusable CLI.

Usage: python scripts/hlo_cost_probe.py [--modes int8chs,int8kv]
           [--batch 8] [--cur 424] [--l 256] [--top 12] [--preset d30]
"""
import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from fpqvar_tpu.utils.jit_cache import enable as _enable_cache

_enable_cache()


def op_costs(comp_text):
    """[(cycles, opname, snippet)] from an optimized-HLO dump."""
    out = []
    for line in comp_text.splitlines():
        m = re.search(r'"estimated_cycles":\s*"?([0-9.e+]+)"?', line)
        if not m:
            m = re.search(r'estimated_cycles[=:]\s*([0-9.e+]+)', line)
        if not m:
            continue
        cycles = float(m.group(1))
        bounds = re.search(r'"iteration_bounds":\s*\[([^\]]*)\]', line)
        if bounds and bounds.group(1).strip():
            for b in bounds.group(1).split(","):
                cycles *= float(b.strip().strip('"'))
        name = line.strip().split(" = ")[0].strip()
        out.append((cycles, name, line.strip()[:160]))
    return out


def classify(name, snippet):
    s = snippet.lower()
    if "copy" in name or "transpose" in s and "fusion" not in name:
        return "copy/transpose"
    if "convolution" in s or re.match(r"%?dot", name) or ".dot" in s:
        return "dot"
    if "fusion" in name:
        return "fusion"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="int8chs,int8kv")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--cur", type=int, default=424)
    ap.add_argument("--l", type=int, default=256)
    ap.add_argument("--top", type=int, default=12)
    ap.add_argument("--preset", default="d30")
    args = ap.parse_args()

    from fpqvar_tpu.config import VARConfig, bench_recipes, var_d36_512
    from fpqvar_tpu.models import var as V
    from fpqvar_tpu.quantize.recipe import synth_device_params
    from fpqvar_tpu.quantize.runtime import build_runtime

    cfg = var_d36_512() if args.preset == "d36" else VARConfig(
        depth=30 if args.preset == "d30" else 16)
    recs = bench_recipes()
    b2 = 2 * args.batch
    c = cfg.width

    for mode in args.modes.split(","):
        qcfg = recs[mode]
        qrt = build_runtime(qcfg, cfg.depth, cfg.width)
        galt = (np.ones((cfg.depth, cfg.width), np.float32),
                np.ones((cfg.depth, cfg.width), np.float32))
        params = synth_device_params(
            cfg, qcfg, jax.random.PRNGKey(0),
            galt=galt if qcfg.transform else None)
        cache = V.init_kv_cache(cfg, b2, kv_codec=qrt.kv_codec)

        def fwd(p, x, mod, cache):
            return V.run_blocks(p, cfg, qrt, x, mod, cache, args.cur)[:2]

        x = jnp.zeros((b2, args.l, c), jnp.bfloat16)
        mod = jnp.zeros((cfg.depth, 6, b2, 1, c), jnp.bfloat16)
        # donate the cache so the jit-boundary copy (an artifact of this
        # probe — the fused generate creates its cache in-program) doesn't
        # drown the per-block costs
        comp = jax.jit(fwd, donate_argnums=(3,)).lower(
            params, x, mod, cache).compile()
        txt = comp.as_text()
        costs = op_costs(txt)
        buckets = {}
        for cyc, name, snip in costs:
            buckets.setdefault(classify(name, snip), [0.0, 0])
            buckets[classify(name, snip)][0] += cyc
            buckets[classify(name, snip)][1] += 1
        total = sum(cy for cy, _, _ in costs)
        print(f"\n== {mode} (cur={args.cur}, l={args.l}, b={args.batch}) "
              f"total {total/1e6:.1f}M cycles")
        for k, (cy, n) in sorted(buckets.items(), key=lambda t: -t[1][0]):
            print(f"  {k:15s} {cy/1e6:10.1f}M  ({n} ops, "
                  f"{100*cy/total:.1f}%)")
        for cyc, name, snip in sorted(costs, reverse=True)[:args.top]:
            print(f"  {cyc/1e6:8.1f}M  {snip[:150]}")
        for leaf in jax.tree_util.tree_leaves(params):
            if hasattr(leaf, "delete"):
                leaf.delete()


if __name__ == "__main__":
    main()
