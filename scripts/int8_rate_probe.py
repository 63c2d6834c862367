#!/usr/bin/env python
"""int8 MXU rate ceiling probe (round 3).

Question (VERDICT r2 #2): through this jax/XLA/Mosaic stack on v5e, can ANY
int8 matmul formulation exceed the bf16 GEMM rate at VAR-d30 shapes?

ANSWER (corrected harness, 2026-08-19): YES — the XLA int8 full-K dot runs
180-193 TOP/s vs bf16's 120-129 TFLOP/s (1.50x) once the measurement is
honest.  Round 2's "rate parity" was a double artifact: loop bodies that
consumed only y[0, 0] (XLA dead-code-eliminated the matmul; legs measured
PAST the chip's peak at the relay RTT floor) and a bf16 input bump that
rounds to a bit-identical value (the relay memoized whole reps).  See
loop()'s docstring; kernel_roofline.py carries the corrected canonical
numbers including the full int8ch chain (1.36x bf16 incl. act quantize).

Sweeps:
  bf16        — XLA jnp.dot control
  int8-xla    — XLA int8 x int8 -> int32 dot
  int8-pl-*   — Pallas int8 kernels across (bm, bn, bk) tilings, int32
                VMEM scratch accumulator, bf16 write (fused epilogue)
  bf16-pl     — Pallas bf16 kernel (Pallas-overhead control)
  big shapes  — m=n=k=4096 squares (is 26% util a shape artifact?)

Protocol: N dependent iterations inside ONE jitted fori_loop (the relay's
per-call latency and (program, input) memoization make per-call timing
meaningless); every timed window re-uploads perturbed inputs and FETCHES
the result; per-leg median of 5 windows.
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fpqvar_tpu.utils import jit_cache

jit_cache.enable()


def timed(fn, *args, iters, reps=5):
    def bump(a):
        if a.dtype == jnp.int8:
            return a ^ jnp.ones_like(a)
        # bf16 CAVEAT: *(1+1e-6) rounds back to the SAME bf16 bits — a
        # no-op bump lets the relay memoize the whole rep (round-3 review
        # finding).  1+2^-7 is exactly representable in bf16 and flips
        # every nonzero element; 4% drift over 5 reps doesn't change rates
        return a * jnp.asarray(1.0078125, a.dtype)

    def drain(o):
        return [np.asarray(x) for x in jax.tree_util.tree_leaves(o)]

    args = [jax.device_put(a) for a in args]
    drain(args)
    drain(fn(*args))
    dts = []
    cur = args
    for _ in range(reps):
        cur = [jax.device_put(bump(a)) for a in cur]
        drain(cur)
        t0 = time.perf_counter()
        drain(fn(*cur))
        dts.append(time.perf_counter() - t0)
    return float(np.median(dts)) / iters


def loop(dot, iters):
    """Chain iters dependent dots of a (lhs, rhs) pair.

    CRITICAL: the carry must consume EVERY output element.  An earlier
    version fed back only ``y[0, 0]`` — XLA dead-code-eliminated the
    whole [M, N] matmul into one row-by-column vector dot, and the legs
    "measured" 313-392 T(FL)OP/s (PAST the chip's 197/394 peaks) at
    exactly the relay's RTT floor.  ``y.mean(axis=1)`` is a full reduce
    over the output, so no element can be skipped, and the [M, 1] result
    feeds the next iteration's input.
    """

    @jax.jit
    def run(a, b):
        def body(i, carry):
            aa, s = carry
            y = dot(aa, b)
            feed = y.astype(jnp.float32).mean(axis=1, keepdims=True)  # [M,1]
            if aa.dtype == jnp.int8:
                # parity of a data-dependent bit: keeps codes valid while
                # making every iteration depend on the full previous output
                aa = aa ^ (feed.astype(jnp.int32) & 1).astype(jnp.int8)
            else:
                aa = aa + (1e-12 * feed).astype(aa.dtype)
            return (aa, s + feed[0, 0])

        return jax.lax.fori_loop(0, iters, body, (a, 0.0))[1]

    return run


def pallas_int8(m, n, k, bm, bn, bk, out_dtype=jnp.bfloat16):
    nk = k // bk

    def kernel(a_ref, b_ref, o_ref, acc_ref):
        kk = pl.program_id(2)

        @pl.when(kk == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

        @pl.when(kk == nk - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    @jax.jit
    def dot(a, b):
        return pl.pallas_call(
            kernel,
            grid=(m // bm, n // bn, nk),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
            cost_estimate=pl.CostEstimate(
                flops=2 * m * n * k,
                bytes_accessed=m * k + k * n + m * n * 2,
                transcendentals=0),
        )(a, b)

    return dot


def pallas_bf16(m, n, k, bm, bn, bk):
    nk = k // bk

    def kernel(a_ref, b_ref, o_ref, acc_ref):
        kk = pl.program_id(2)

        @pl.when(kk == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(kk == nk - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    @jax.jit
    def dot(a, b):
        return pl.pallas_call(
            kernel,
            grid=(m // bm, n // bn, nk),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=2 * m * n * k,
                bytes_accessed=2 * (m * k + k * n + m * n),
                transcendentals=0),
        )(a, b)

    return dot


def main():
    ap = argparse.ArgumentParser()
    # 100+ iters: at ~1ms/iter, 30 iters (~30ms) sits exactly at the
    # relay's ~40ms RTT floor — rates become indistinguishable from a
    # memoized/latency-bound fetch.  100 iters puts real compute at 3-4x
    # the RTT.
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--shapes", type=str, default="4096x1920x5760,"
                    "4096x4096x4096")
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    for sh in args.shapes.split(","):
        m, k, n = (int(v) for v in sh.split("x"))
        flops = 2.0 * m * k * n
        xb = jax.random.normal(key, (m, k), jnp.bfloat16)
        wb = jax.random.normal(jax.random.fold_in(key, 1), (k, n),
                               jnp.bfloat16)
        xi = jax.random.randint(key, (m, k), -60, 61, jnp.int8)
        wi = jax.random.randint(jax.random.fold_in(key, 2), (k, n), -60, 61,
                                jnp.int8)
        print(f"== {m}x{k}x{n} ({flops/1e12:.2f} TFLOP/iter) ==", flush=True)

        legs = [
            ("bf16-xla", loop(lambda a, b: jnp.dot(
                a, b, preferred_element_type=jnp.float32), args.iters),
             (xb, wb)),
            ("int8-xla", loop(lambda a, b: jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32), args.iters),
             (xi, wi)),
        ]
        tile_opts = [(512, 512, 1920), (1024, 512, 960), (512, 1024, 960),
                     (256, 512, 1920), (512, 256, 1920), (1024, 1024, 512),
                     (512, 512, 512)]
        for bm, bn, bk in tile_opts:
            if m % bm or n % bn or k % bk:
                continue
            legs.append((f"int8-pl-{bm}x{bn}x{bk}",
                         loop(pallas_int8(m, n, k, bm, bn, bk), args.iters),
                         (xi, wi)))
        for bm, bn, bk in [(512, 512, 1920), (512, 512, 512),
                           (1024, 512, 960)]:
            if m % bm or n % bn or k % bk:
                continue
            legs.append((f"bf16-pl-{bm}x{bn}x{bk}",
                         loop(pallas_bf16(m, n, k, bm, bn, bk), args.iters),
                         (xb, wb)))

        for name, fn, operands in legs:
            try:
                dt = timed(fn, *operands, iters=args.iters)
                print(f"  {name:24s} {flops/dt/1e12:8.1f} T(FL)OP/s",
                      flush=True)
            except Exception as e:  # noqa: BLE001 — report and continue
                print(f"  {name:24s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
