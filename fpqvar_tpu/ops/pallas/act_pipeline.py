"""Fused activation-pipeline matmul: rotate -> per-group quantize -> GEMM.

The quantized block forward otherwise runs three separate HBM passes over
every activation tensor (block-Hadamard rotation matmul, per-group fake
quantization, then the GEMM read) — tens of ms per d30 scale step.  This
kernel reads the activation tile once and does everything in VMEM:

    per K-subgroup (128 columns == one rotation block == one quant group):
        xg <- x_tile[:, g]          # [bm, 128]
        xg <- xg @ Q128             # optional randomized-Hadamard block
        s  <- absmax(xg, rows)/gmax
        xq <- snap(xg / s) * s      # select-chain grid snap, no gathers
        acc += xq @ w_tile[:, g].T

Weight side: dense bf16 (the fake/throughput mode — weights already
fake-quantized offline).  Same tie semantics and scaling as
fpqvar_tpu.ops.quantizers.fake_quant_fp, so outputs match the unfused path
to bf16 rounding.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fpqvar_tpu.ops import grids as G

#: formats supported in-kernel (single-grid absmax formats)
FUSED_FORMATS = ("fp_e2", "fp_e1", "fp_e3", "fp6_e2m3", "fp6_e3m2",
                 "fp8_e4m3")

#: sign-split dual-grid formats (the asymmetric fc2 family,
#: `quant_utils.py:380-451,498-535,658-727`) supported by the two-phase
#: fused path — separate neg/pos scales and snap chains per 128-group
DUAL_FUSED_FORMATS = ("fp_e1m2_neg_e2m1_pos", "fp4_afpq",
                      "fp6_int_neg_e2m3_pos")


def _snap_chain(x, grid: np.ndarray):
    """Gather-free cumulative-delta snap (same as quantizers.snap_to_grid),
    usable inside a Pallas kernel (f32)."""
    mids = ((grid[1:] + grid[:-1]) * 0.5).tolist()
    deltas = (grid[1:] - grid[:-1]).tolist()
    out = jnp.full(x.shape, float(grid[0]), jnp.float32)
    for m, d in zip(mids, deltas):
        out = out + jnp.where(x >= m, jnp.float32(d), jnp.float32(0))
    return out


def _kernel(x_ref, w_ref, q_ref, out_ref, *, bkg, grid_vals, gmax, rotate):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for gi in range(bkg):
        xg = x_ref[:, 128 * gi: 128 * (gi + 1)].astype(jnp.float32)
        if rotate:
            xg = jnp.dot(xg, q_ref[:], preferred_element_type=jnp.float32)
        amax = jnp.max(jnp.abs(xg), axis=1, keepdims=True)
        scale = jnp.where(amax > 0, amax * jnp.float32(1.0 / gmax), 1.0)
        xq = _snap_chain(xg * pl.reciprocal(scale, approx=False),
                         grid_vals) * scale
        wg = w_ref[:, 128 * gi: 128 * (gi + 1)]
        acc = acc + jnp.dot(xq.astype(jnp.bfloat16), wg.T,
                            preferred_element_type=jnp.float32)
    out_ref[:] += acc


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick(total: int, unit: int, options) -> int:
    for o in options:
        if (total // unit) % o == 0:
            return o
    return 1


@functools.partial(jax.jit, static_argnames=(
    "fmt", "n", "k_dim", "rotate", "interpret"))
def _fused_matmul_2d(x, w, q, *, fmt, n, k_dim, rotate, interpret=False):
    """quantize(rotate(x)) [M,K] @ w.T ([N,K] bf16) -> [M,N] f32."""
    m = x.shape[0]
    grid_vals = G.GRIDS[fmt]
    gmax = float(np.max(np.abs(grid_vals)))
    bn = 128 * _pick(n, 128, (4, 3, 2, 1))
    bkg = _pick(k_dim, 128, (5, 4, 3, 2, 1))
    bk = 128 * bkg
    bm = 1024 if m >= 1024 else (512 if m >= 512 else 128)
    m_pad = _round_up(max(m, 8), bm) if m > bm else _round_up(max(m, 8), 8)
    bm_eff = min(bm, m_pad)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    grid = (m_pad // bm_eff, n // bn, k_dim // bk)
    out = pl.pallas_call(
        functools.partial(_kernel, bkg=bkg, grid_vals=grid_vals, gmax=gmax,
                          rotate=rotate),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm_eff, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bk), lambda i, j, kk: (j, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),      # Q128, whole array
        ],
        out_specs=pl.BlockSpec((bm_eff, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * k_dim
            + (2 * m_pad * k_dim * 128 if rotate else 0),
            bytes_accessed=m_pad * k_dim * 2 + n * k_dim * 2 + m_pad * n * 4,
            transcendentals=0,
        ),
    )(x, w.astype(jnp.bfloat16), q)
    return out[:m] if m_pad != m else out


def _rotquant_kernel(x_ref, q_ref, out_ref, *, bkg, grid_vals, gmax, rotate):
    """Phase-1 kernel: rotate + per-group quantize, one read/write of x."""
    for gi in range(bkg):
        xg = x_ref[:, 128 * gi: 128 * (gi + 1)].astype(jnp.float32)
        if rotate:
            xg = jnp.dot(xg, q_ref[:], preferred_element_type=jnp.float32)
        amax = jnp.max(jnp.abs(xg), axis=1, keepdims=True)
        scale = jnp.where(amax > 0, amax * jnp.float32(1.0 / gmax), 1.0)
        xq = _snap_chain(xg * pl.reciprocal(scale, approx=False),
                         grid_vals) * scale
        out_ref[:, 128 * gi: 128 * (gi + 1)] = xq.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("fmt", "k_dim", "rotate",
                                             "interpret"))
def _rotquant_2d(x, q, *, fmt, k_dim, rotate, interpret=False):
    """quantize(rotate(x)) [M, K] -> bf16 [M, K] in one pass."""
    m = x.shape[0]
    grid_vals = G.GRIDS[fmt]
    gmax = float(np.max(np.abs(grid_vals)))
    bkg = _pick(k_dim, 128, (5, 4, 3, 2, 1))
    bk = 128 * bkg
    bm = 1024 if m >= 1024 else (256 if m >= 256 else 8)
    m_pad = _round_up(max(m, 8), bm) if m > bm else _round_up(max(m, 8), 8)
    bm_eff = min(bm, m_pad)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_rotquant_kernel, bkg=bkg, grid_vals=grid_vals,
                          gmax=gmax, rotate=rotate),
        grid=(m_pad // bm_eff, k_dim // bk),
        in_specs=[
            pl.BlockSpec((bm_eff, bk), lambda i, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm_eff, bk), lambda i, kk: (i, kk),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, k_dim), jnp.bfloat16),
        interpret=interpret,
    )(x, q)
    return out[:m] if m_pad != m else out


def _rotquant_dual_kernel(x_ref, q_ref, out_ref, *, bkg, neg_grid, pos_grid,
                          ngmax, pgmax, rotate):
    """Phase-1 kernel, dual-grid variant: rotate + sign-split per-group
    quantize (independent neg/pos scales, `quantizers.fake_quant_dual`)."""
    for gi in range(bkg):
        xg = x_ref[:, 128 * gi: 128 * (gi + 1)].astype(jnp.float32)
        if rotate:
            xg = jnp.dot(xg, q_ref[:], preferred_element_type=jnp.float32)
        x_neg = jnp.where(xg <= 0, xg, 0.0)
        x_pos = jnp.where(xg > 0, xg, 0.0)
        amax_n = jnp.max(jnp.abs(x_neg), axis=1, keepdims=True)
        amax_p = jnp.max(x_pos, axis=1, keepdims=True)
        s_n = jnp.where(amax_n > 0, amax_n * jnp.float32(1.0 / ngmax), 1.0)
        s_p = jnp.where(amax_p > 0, amax_p * jnp.float32(1.0 / pgmax), 1.0)
        q_n = _snap_chain(x_neg * pl.reciprocal(s_n, approx=False), neg_grid)
        q_p = _snap_chain(x_pos * pl.reciprocal(s_p, approx=False), pos_grid)
        out_ref[:, 128 * gi: 128 * (gi + 1)] = (
            q_n * s_n + q_p * s_p).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("fmt", "k_dim", "rotate",
                                             "interpret"))
def _rotquant_dual_2d(x, q, *, fmt, k_dim, rotate, interpret=False):
    """dual_quantize(rotate(x)) [M, K] -> bf16 [M, K] in one pass."""
    m = x.shape[0]
    neg_grid, pos_grid = G.DUAL_GRIDS[fmt]
    ngmax = float(np.max(np.abs(neg_grid)))
    pgmax = float(np.max(np.abs(pos_grid)))
    bkg = _pick(k_dim, 128, (5, 4, 3, 2, 1))
    bk = 128 * bkg
    bm = 1024 if m >= 1024 else (256 if m >= 256 else 8)
    m_pad = _round_up(max(m, 8), bm) if m > bm else _round_up(max(m, 8), 8)
    bm_eff = min(bm, m_pad)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_rotquant_dual_kernel, bkg=bkg, neg_grid=neg_grid,
                          pos_grid=pos_grid, ngmax=ngmax, pgmax=pgmax,
                          rotate=rotate),
        grid=(m_pad // bm_eff, k_dim // bk),
        in_specs=[
            pl.BlockSpec((bm_eff, bk), lambda i, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm_eff, bk), lambda i, kk: (i, kk),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, k_dim), jnp.bfloat16),
        interpret=interpret,
    )(x, q)
    return out[:m] if m_pad != m else out


def fused_rotquant_linear(x, w, q128, fmt: str, *, rotate: bool = True,
                          force_jnp: bool = False, interpret: bool = False,
                          mode: str = "two_phase"):
    """x [..., K]: block-rotation + per-group-128 fake quant + GEMM against
    dense bf16 w [N, K].

    ``mode="two_phase"`` (default): one Pallas kernel materializes the
    quantized activation (single HBM round trip, no per-N-tile recompute),
    then XLA's native GEMM consumes it.  ``mode="one_kernel"``: the v1
    all-in-one kernel (recomputes quantization per N-tile — slower at large
    N, kept for comparison).  jnp fallback reproduces the semantics for CPU
    tests."""
    n, k_dim = w.shape
    lead = x.shape[:-1]
    x2 = x.reshape(-1, k_dim)
    dual = fmt in DUAL_FUSED_FORMATS
    usable = (
        not force_jnp
        and (jax.default_backend() == "tpu" or interpret)
        and (fmt in FUSED_FORMATS or dual)
        and n % 128 == 0
        and k_dim % 128 == 0
    )
    if usable:
        q = (jnp.asarray(q128, jnp.float32) if q128 is not None
             else jnp.eye(128, dtype=jnp.float32))
        do_rot = rotate and q128 is not None
        if mode == "one_kernel" and not dual:
            out = _fused_matmul_2d(x2, w, q, fmt=fmt, n=n, k_dim=k_dim,
                                   rotate=do_rot, interpret=interpret)
        else:
            # dual-grid formats always take the two-phase path
            rq = _rotquant_dual_2d if dual else _rotquant_2d
            xq = rq(x2, q, fmt=fmt, k_dim=k_dim, rotate=do_rot,
                    interpret=interpret)
            out = jnp.dot(xq, w.astype(jnp.bfloat16).T,
                          preferred_element_type=jnp.float32)
    else:
        from fpqvar_tpu.ops.hadamard import apply_block_hadamard
        from fpqvar_tpu.ops.quantizers import fake_quant_dual, fake_quant_fp

        xr = (apply_block_hadamard(x2, jnp.asarray(q128, x2.dtype))
              if (rotate and q128 is not None) else x2)
        if dual:
            xq = fake_quant_dual(xr, fmt, granularity="per_group",
                                 group_size=128)
        else:
            xq = fake_quant_fp(xr, fmt, granularity="per_group",
                               group_size=128)
        out = (xq.astype(jnp.bfloat16) @ w.astype(jnp.bfloat16).T
               ).astype(jnp.float32)
    return out.reshape(lead + (n,)).astype(x.dtype)
