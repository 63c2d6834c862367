#!/usr/bin/env python
"""Serving latency/throughput benchmark for the continuous-batching server.

Drives fpqvar_tpu.serving.GenerationServer (the deployment surface — the
reference has no serving stack at all) with two load shapes and reports
per-request latency percentiles plus sustained throughput as one JSON line:

- unloaded: sequential requests, one in flight — the p50 here is the
  floor a single user sees (includes the host<->relay round-trip);
- saturated: an open-loop burst of --n requests — the server coalesces
  batches of --max-batch and runs its depth-2 dispatch pipeline; p99 here
  is queueing + batching delay under full load, and the throughput is the
  serving-regime rate (compare with bench.py's batch-1 pipelined number);
- poisson: --poisson requests with EXPONENTIAL inter-arrivals at
  --util x the measured saturated capacity and uniformly random classes —
  the steady-state arrival process a deployment actually sees.  Unlike
  the burst (where a request's latency is mostly its queue position and
  p99 = the last request), Poisson at sub-1 utilization gives percentiles
  that measure batching + queueing jitter, and with >=500 requests the
  p99 is a real quantile rather than the max of the run.

Per-request latency samples for every phase are embedded in the JSON
artifact so distributions can be re-analyzed offline.

Params are synthesized on-device (quantize.recipe.synth_device_params) —
no multi-GB relay uploads; requests carry per-process-salted seeds so the
relay's (program, inputs) memoization cannot fake the numbers.

Usage: python scripts/serving_bench.py [--preset d30] [--recipes bf16,w4a16]
           [--n 64] [--poisson 500] [--util 0.8] [--max-batch 8]
           [--unloaded 8]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from fpqvar_tpu.utils.jit_cache import enable as _enable_cache  # noqa: E402

_enable_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="d30",
                    choices=["tiny", "d16", "d30", "d36"])
    ap.add_argument("--recipes", default="bf16,w4a16",
                    help="comma list of config.bench_recipes names — all "
                         "measured in ONE process/window (the relay drifts "
                         "1.1-8x between processes; only within-window "
                         "ratios are meaningful)")
    ap.add_argument("--n", type=int, default=64,
                    help="saturation-burst request count")
    ap.add_argument("--poisson", type=int, default=0,
                    help="Poisson-arrival phase request count (0 = skip); "
                         ">=500 makes the p99 a real quantile")
    ap.add_argument("--util", type=float, default=0.8,
                    help="Poisson arrival rate as a fraction of the "
                         "measured saturated capacity")
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--max-wait-ms", type=float, default=30.0)
    ap.add_argument("--unloaded", type=int, default=8,
                    help="sequential single-request probes")
    args = ap.parse_args()

    from fpqvar_tpu.config import (VARConfig, bench_recipes, var_d36_512,
                                   var_tiny)
    from fpqvar_tpu.models.vqvae import init_vqvae_params

    cfg = {"tiny": var_tiny, "d16": lambda: VARConfig(depth=16),
           "d30": lambda: VARConfig(depth=30),
           "d36": var_d36_512}[args.preset]()
    all_qcfg = bench_recipes()

    @jax.jit
    def _vae_init(k):
        p = init_vqvae_params(k, cfg.vae)
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, p)

    vae_p = _vae_init(jax.random.PRNGKey(1))
    salt = int.from_bytes(os.urandom(4), "little") & 0x3FFFFFFF

    results = {}
    for recipe in args.recipes.split(","):
        results[recipe] = run_recipe(
            args, cfg, all_qcfg[recipe], vae_p, salt)
        brief = {k: ({kk: vv for kk, vv in v.items() if kk != "samples_ms"}
                     if isinstance(v, dict) else v)
                 for k, v in results[recipe].items()}
        print(f"# {recipe}: {brief}", file=sys.stderr, flush=True)
        salt += 100000
    print(json.dumps({"preset": args.preset, "max_batch": args.max_batch,
                      "n": args.n, "recipes": results}))


def run_recipe(args, cfg, qcfg, vae_p, salt):
    from fpqvar_tpu.config import GenerateConfig
    from fpqvar_tpu.models import VARGenerator
    from fpqvar_tpu.quantize.recipe import synth_device_params
    from fpqvar_tpu.serving import GenerationServer

    galt = None
    if qcfg.transform:
        galt = (np.ones((cfg.depth, cfg.width), np.float32),
                np.ones((cfg.depth, cfg.width), np.float32))
    params = synth_device_params(cfg, qcfg, jax.random.PRNGKey(0), galt=galt)
    gen = VARGenerator(cfg, qcfg, GenerateConfig())
    server = GenerationServer(gen, params, vae_p, max_batch=args.max_batch,
                              max_wait_ms=args.max_wait_ms)
    # warm both compiled batch shapes (full batch + the single-row shape the
    # unloaded probes use) outside the timed sections
    server.submit(0, salt).result()
    futs = [server.submit(i % cfg.num_classes, salt + 1000 + i)
            for i in range(args.max_batch)]
    for f in futs:
        f.result()

    # ---- unloaded latency (one request in flight) ------------------------
    lat_unloaded = []
    for i in range(args.unloaded):
        t0 = time.perf_counter()
        server.submit(i % cfg.num_classes, salt + 2000 + i).result()
        lat_unloaded.append(time.perf_counter() - t0)

    # ---- saturation burst ------------------------------------------------
    st0 = server.stats()          # snapshot: report burst-only counters
    t0 = time.perf_counter()
    subs = []
    for i in range(args.n):
        subs.append((time.perf_counter(),
                     server.submit(i % cfg.num_classes, salt + 4000 + i)))
    lat_sat = []
    for ts, fut in subs:
        fut.result()
        lat_sat.append(time.perf_counter() - ts)
    wall = time.perf_counter() - t0
    st = server.stats()

    # ---- Poisson mixed-class arrivals at --util x capacity ---------------
    lat_poi, poi = [], {}
    if args.poisson:
        rng = np.random.default_rng(salt & 0xFFFF)
        rate = args.util * (args.n / wall)           # requests/s
        gaps = rng.exponential(1.0 / rate, size=args.poisson)
        classes = rng.integers(0, cfg.num_classes, size=args.poisson)
        done_at = [None] * args.poisson

        def _stamp(i):
            # done-callbacks run on the server's result thread at
            # set_result time — completion timestamps are accurate even
            # though the main thread resolves futures in submit order
            def cb(_):
                done_at[i] = time.perf_counter()
            return cb

        t0 = time.perf_counter()
        subs, t_next = [], t0
        for i in range(args.poisson):
            t_next += gaps[i]
            dt = t_next - time.perf_counter()
            if dt > 0:
                time.sleep(dt)
            # latency clock starts at the INTENDED arrival time: if the
            # submit loop itself falls behind (server backpressure), the
            # delay is charged to the requests it stalled — avoids
            # coordinated omission
            fut = server.submit(int(classes[i]), salt + 8000 + i)
            fut.add_done_callback(_stamp(i))
            subs.append((t_next, fut))
        for _, fut in subs:
            fut.result()
        poi_wall = time.perf_counter() - t0
        lat_poi = [done_at[i] - subs[i][0] for i in range(args.poisson)]
        poi = {"target_rate": round(rate, 3),
               "achieved_imgs_per_s": round(args.poisson / poi_wall, 3)}
    server.stop()

    for leaf in jax.tree_util.tree_leaves(params):
        if hasattr(leaf, "delete"):
            leaf.delete()

    def pct(xs, q):
        return round(float(np.percentile(np.asarray(xs), q)) * 1e3, 1)

    def dist(xs):
        return {"p50": pct(xs, 50), "p90": pct(xs, 90), "p99": pct(xs, 99),
                "mean": round(float(np.mean(xs)) * 1e3, 1),
                "max": round(float(np.max(xs)) * 1e3, 1),
                "samples_ms": [round(v * 1e3, 1) for v in xs]}

    out = {
        "unloaded_ms": {"p50": pct(lat_unloaded, 50),
                        "p90": pct(lat_unloaded, 90)},
        "saturated_ms": dist(lat_sat),
        "saturated_imgs_per_s": round(args.n / wall, 3),
        # burst-only deltas: warmup + unloaded probes would otherwise make
        # n/batches understate the coalesced batch size
        "batches": st["batches"] - st0["batches"],
        "pipelined": st["pipelined"] - st0["pipelined"],
    }
    if lat_poi:
        out["poisson_ms"] = dist(lat_poi)
        out["poisson"] = poi
    return out


if __name__ == "__main__":
    main()
