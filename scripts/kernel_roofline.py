#!/usr/bin/env python
"""Kernel roofline microbenchmark: XLA bf16 GEMM vs the grouped int8 kernel.

Runs N dependent iterations INSIDE one jitted fori_loop (single device
call — the remote-TPU relay's per-call latency and memoization make
per-call microtiming meaningless), perturbing an input each iteration so
no work can be CSE'd.  Reports achieved TFLOP/s and the fraction of the
v5e peak (197 bf16 / 394 int8 TOPS) for:

  bf16   — jnp.dot at the full contraction depth (what the fake path rides)
  int8   — the grouped-scale int8 kernel (per-group-128 scaled dots)
  int8-nogroup — jax.lax int8 dot at full depth (MXU int8 ceiling probe,
                 no per-group scaling: NOT a valid quantization, just the
                 hardware's achievable int8 rate through this stack)

MEASUREMENT-HISTORY WARNING: every number this file reported before
round 3 was corrupted by TWO artifacts fixed on 2026-08-19 — (a) the
loop bodies consumed only y[0, 0], letting XLA dead-code-eliminate the
matmul into one row-by-column dot (legs "measured" past the chip's peak
at the relay's ~40 ms RTT floor); (b) the bf16 input "bump" *(1+1e-6)
rounds back to the same bf16 bits, letting the relay memoize entire
reps.  Round-2's "int8 == bf16 rate parity" conclusion was an artifact.

CORRECTED canonical run (v5e, m=4096 k=1920 n=5760, 100 in-loop iters,
full-output consume, median of 5 bumped windows, 2026-08-19):

  bf16 GEMM        : 114.3 TFLOP/s (58.0% of bf16 peak)
  grouped int8     : 112.4 TOP/s   (28.5% of int8 peak)  — bf16 parity
  int8 full-K dot  : 165.3 TOP/s   (42.0%)               — 1.45x bf16
  int8ch dot+scale : 164.2 TOP/s   — the outer rescale is ~free
  int8ch Pallas krn: 165.3 TOP/s   [bit-exact vs mirror]
  int8ch FULL chain: 156.0 TOP/s   — incl. act quantize, 1.36x bf16

Reading: the MXU's int8 advantage IS real through this stack (1.45x the
bf16 rate at full K; the nominal 2x is not reached at 42% util), and the
per-token act-quant chain costs only ~6%.  Per-group-128 scaling gives
up the int8 advantage (112 ~= bf16's 114) but is NOT slower than bf16 —
the quality knob is free, not a 0.6x penalty as previously reported.
The end-to-end batch-8 gap (int8chs 0.889x bf16, bench.py bracketed) is
therefore NOT in the GEMM chain; see ROUND_NOTES_r03.md for the
per-scale attribution.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def timed(fn, *args, iters):
    # the relay MEMOIZES identical (program, inputs) executions: the timed
    # call must use inputs that differ from the warmup call
    def bump(a):
        if a.dtype == jnp.int8:
            return a ^ jnp.ones_like(a)          # flip bit, still valid
        # 1+2^-7: exactly representable in bf16 so the bump actually
        # changes the uploaded bits (*(1+1e-6) rounds back to the same
        # bf16 value — a no-op bump lets the relay memoize the rep)
        return a * jnp.asarray(1.0078125, a.dtype)

    def drain(o):
        # block_until_ready through the relay does NOT guarantee execution
        # (lazy result fetch): pull every leaf to host to force the work
        return [np.asarray(leaf) for leaf in jax.tree_util.tree_leaves(o)]

    args = [jax.device_put(a) for a in args]
    drain(args)
    drain(fn(*args))                     # compile + warm
    # MEDIAN of repeated windows: the relay injects multi-second stalls
    # into individual calls (the same program has measured 69 vs 107 TOP/s
    # minutes apart); each repeat bumps its inputs so the relay's
    # (program, inputs) memoization can't skip the work
    dts = []
    cur = args
    for _ in range(5):
        cur = [jax.device_put(a) for a in [bump(a) for a in cur]]
        drain(cur)                       # uploads outside the window
        t0 = time.perf_counter()
        drain(fn(*cur))
        dts.append(time.perf_counter() - t0)
    return float(np.median(dts)) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=4096)
    ap.add_argument("--k", type=int, default=1920)
    ap.add_argument("--n", type=int, default=5760)
    # 100+ iters: 30 iters of a ~1ms dot (~30ms) sits at the relay's
    # ~40ms RTT floor, where rates are indistinguishable from latency
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()
    m, k, n, iters = args.m, args.k, args.n, args.iters
    flops = 2.0 * m * k * n

    from fpqvar_tpu.ops import packing as P
    from fpqvar_tpu.ops.pallas.int8_matmul import _int8_matmul_2d

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (m, k), jnp.bfloat16)
    w = jax.random.normal(jax.random.fold_in(key, 1), (k, n), jnp.bfloat16)
    ac, asc = P.quant_int_codes(x.astype(jnp.float32), "fp_e2")
    pw = P.pack_int_codes(
        jax.random.normal(jax.random.fold_in(key, 2), (n, k)), "fp_e2")

    # EVERY loop body must consume the FULL [M, N] output (mean over N):
    # feeding back only y[0, 0] let XLA dead-code-eliminate the matmul
    # into one row-by-column vector dot — legs "measured" past the chip's
    # peak at exactly the relay's RTT floor (round-3 finding; Pallas legs
    # were unaffected, custom calls are opaque to DCE).
    @jax.jit
    def bf16_loop(x, w):
        def body(i, carry):
            xx, s = carry
            y = jnp.dot(xx, w, preferred_element_type=jnp.float32)
            feed = y.mean(axis=1, keepdims=True)          # full consume
            return (xx + (1e-12 * feed).astype(xx.dtype), s + feed[0, 0])
        return jax.lax.fori_loop(0, iters, body, (x, 0.0))[1]

    @jax.jit
    def int8_loop(ac, asc, wc, ws):
        def body(i, carry):
            s_in, acc = carry
            y = _int8_matmul_2d(ac, s_in, wc, ws, group_size=128,
                                n=n, k_dim=k)
            feed = y.mean(axis=1, keepdims=True)
            return (s_in * (1.0 + 1e-12 * feed), acc + feed[0, 0])
        return jax.lax.fori_loop(0, iters, body, (asc, 0.0))[1]

    @jax.jit
    def int8_plain_loop(ac, wc):
        def body(i, carry):
            aa, acc = carry
            y = jax.lax.dot_general(
                aa, wc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            # full-output consume + loop-carried dependency: every code
            # flips a data-dependent bit of the previous output's row mean
            feed = y.astype(jnp.float32).mean(axis=1, keepdims=True)
            return (aa ^ (feed.astype(jnp.int32) % 2).astype(jnp.int8),
                    acc + feed[0, 0])
        return jax.lax.fori_loop(0, iters, body, (ac, jnp.float32(0)))[1]

    # the int8ch building blocks at full fidelity: dot + outer rescale,
    # and the complete act-quantize + dot + rescale chain (what the model
    # actually runs per layer in int8ch mode)
    pwc = P.pack_int_codes(
        jax.random.normal(jax.random.fold_in(key, 2), (n, k)), "fp_e2",
        group_size=k)
    acc_, ascc = P.quant_int_codes(x.astype(jnp.float32), "fp_e2",
                                   group_size=k)

    @jax.jit
    def int8ch_dot_loop(ac, asc, wc, ws):
        from fpqvar_tpu.ops.pallas.int8_matmul import _channel_dot

        def body(i, carry):
            s_in, acc = carry
            y = _channel_dot(ac, s_in, wc, ws)
            feed = y.mean(axis=1, keepdims=True)
            return (s_in * (1.0 + 1e-12 * feed), acc + feed[0, 0])
        return jax.lax.fori_loop(0, iters, body, (asc, 0.0))[1]

    @jax.jit
    def int8ch_kernel_loop(ac, asc, wc, ws):
        from fpqvar_tpu.ops.pallas.int8_matmul import _int8ch_matmul_2d

        def body(i, carry):
            s_in, acc = carry
            y = _int8ch_matmul_2d(ac, s_in, wc, ws, n=n, k_dim=k)
            feed = y.astype(jnp.float32).mean(axis=1, keepdims=True)
            return (s_in * (1.0 + 1e-12 * feed), acc + feed[0, 0])
        return jax.lax.fori_loop(0, iters, body, (asc, 0.0))[1]

    @jax.jit
    def int8ch_full_loop(x, wc, ws):
        from fpqvar_tpu.ops.pallas.int8_matmul import _channel_dot

        def body(i, carry):
            xx, acc = carry
            a, s = P.quant_int_codes(xx.astype(jnp.float32), "fp_e2", k)
            y = _channel_dot(a, s, wc, ws)
            feed = y.mean(axis=1, keepdims=True)
            return (xx + (1e-12 * feed).astype(xx.dtype), acc + feed[0, 0])
        return jax.lax.fori_loop(0, iters, body, (x, 0.0))[1]

    @jax.jit
    def int8ch_scan_loop(x, wcs, wss):
        # the chain as the MODEL runs it: weights stacked [depth, K, N] and
        # dynamic-sliced inside a scan (run_blocks slices block params from
        # depth-stacked arrays).  Compares against int8ch_full_loop to test
        # whether the scan-slice context costs a relayout of the int8 codes.
        from fpqvar_tpu.ops.pallas.int8_matmul import _channel_dot

        d = wcs.shape[0]

        def body(carry, blk):
            xx, acc = carry
            wc, ws = blk
            a, s = P.quant_int_codes(xx.astype(jnp.float32), "fp_e2", k)
            y = _channel_dot(a, s, wc, ws)
            feed = y.mean(axis=1, keepdims=True)
            return ((xx + (1e-12 * feed).astype(xx.dtype),
                     acc + feed[0, 0]), None)

        def outer(i, carry):
            return jax.lax.scan(body, carry, (wcs, wss))[0]

        return jax.lax.fori_loop(0, max(1, iters // d), outer,
                                 (x, jnp.float32(0)))[1]

    @jax.jit
    def wonly_loop(x, wc, ws):
        # the W4A16 GEMM as the model runs it: bf16 dot over int8 codes
        # converted in the operand read + one [M, N] output rescale
        # (int8_matmul._wonly_dot, per-channel).  Explains the batch-8
        # w4a16 ratio: whatever this leg loses vs the plain bf16 dot is
        # pure operand-convert + epilogue cost.
        from fpqvar_tpu.ops.pallas.int8_matmul import _wonly_dot

        def body(i, carry):
            xx, acc = carry
            y = _wonly_dot(xx, wc, ws, k)
            feed = y.mean(axis=1, keepdims=True)
            return (xx + (1e-12 * feed).astype(xx.dtype), acc + feed[0, 0])
        return jax.lax.fori_loop(0, iters, body, (x, 0.0))[1]

    peak_bf16, peak_int8 = 197e12, 394e12
    t = timed(bf16_loop, x, w, iters=iters)
    print(f"bf16 GEMM       : {flops / t / 1e12:7.1f} TFLOP/s "
          f"({flops / t / peak_bf16 * 100:5.1f}% of bf16 peak)")
    t = timed(int8_loop, ac, asc, pw.codes, pw.scales, iters=iters)
    print(f"grouped int8    : {flops / t / 1e12:7.1f} TOP/s "
          f"({flops / t / peak_int8 * 100:5.1f}% of int8 peak)")
    t = timed(int8_plain_loop, ac, pw.codes, iters=iters)
    print(f"int8 full-K dot : {flops / t / 1e12:7.1f} TOP/s "
          f"({flops / t / peak_int8 * 100:5.1f}% of int8 peak)")
    t = timed(int8ch_dot_loop, acc_, ascc, pwc.codes, pwc.scales,
              iters=iters)
    print(f"int8ch dot+scale: {flops / t / 1e12:7.1f} TOP/s "
          f"({flops / t / peak_int8 * 100:5.1f}% of int8 peak)")
    # parity check then rate of the fused-epilogue Pallas kernel
    from fpqvar_tpu.ops.pallas.int8_matmul import (
        _channel_dot, _int8ch_matmul_2d)
    got = np.asarray(_int8ch_matmul_2d(acc_, ascc, pwc.codes, pwc.scales,
                                       n=n, k_dim=k))
    want = np.asarray(_channel_dot(acc_, ascc, pwc.codes, pwc.scales)
                      .astype(jnp.bfloat16))
    exact = bool((got == want).all())
    t = timed(int8ch_kernel_loop, acc_, ascc, pwc.codes, pwc.scales,
              iters=iters)
    print(f"int8ch kernel   : {flops / t / 1e12:7.1f} TOP/s "
          f"({flops / t / peak_int8 * 100:5.1f}% of int8 peak) "
          f"[fused epilogue; bit-exact vs mirror: {exact}]")
    t = timed(int8ch_full_loop, x, pwc.codes, pwc.scales, iters=iters)
    print(f"int8ch q+dot+s  : {flops / t / 1e12:7.1f} TOP/s "
          f"({flops / t / peak_int8 * 100:5.1f}% of int8 peak) "
          f"[incl. act quantize]")
    t = timed(wonly_loop, x, pwc.codes, pwc.scales, iters=iters)
    print(f"w4a16 dot       : {flops / t / 1e12:7.1f} TFLOP/s "
          f"({flops / t / peak_bf16 * 100:5.1f}% of bf16 peak) "
          f"[bf16 dot over converted codes + rescale]")
    depth = 8   # enough blocks to defeat any hoisting, small enough to fit
    wcs = jnp.stack([pwc.codes ^ jnp.int8(i) for i in range(depth)])
    wss = jnp.stack([pwc.scales * (1 + i / 64) for i in range(depth)])
    it_eff = max(1, iters // depth) * depth
    t = timed(int8ch_scan_loop, x, wcs, wss, iters=it_eff)
    print(f"int8ch scan     : {flops / t / 1e12:7.1f} TOP/s "
          f"({flops / t / peak_int8 * 100:5.1f}% of int8 peak) "
          f"[chain inside lax.scan over depth-stacked codes]")


if __name__ == "__main__":
    main()
