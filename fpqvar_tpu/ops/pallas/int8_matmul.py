"""Grouped-scale int8 matmul Pallas kernel — the speed path for W4A4/W6A6.

The reference never executes low-bit arithmetic (fake-quant fp16 GEMMs,
`models_fp_quant/quant_utils.py:844-850`).  Here both operands are exact
integer codes (fp grid values times a power of two, see
fpqvar_tpu.ops.packing.CODE_MULT) and each contraction runs int8 x int8 ->
int32 on the MXU — measured 1.45x the bf16 GEMM rate on v5e for full-K XLA
dots, 0.98x for this grouped-128 Pallas kernel (corrected roofline,
ROUND_NOTES_r03.md; the nominal 2x int8 rate is not realized through this
stack) — with the per-group-128 absmax scales applied in f32 on the partial
products:

    y[m,n] = sum_g  sa[m,g] * sw[g,n] * sum_{k in g} ac[m,k] * wc[k,n]

The inner int32 dot is exact (|codes| <= 60, 128-term groups), so this path
is numerically *tighter* than the bf16 fake GEMM it replaces.

Tiling mirrors quant_matmul.py: grid (M/bm, N/bn, K/bk), bk covering
``bkg`` scale groups, f32 accumulation into the revisited output block.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fpqvar_tpu.ops import packing as P


def _kernel(ac_ref, as_ref, wc_ref, ws_ref, out_ref, *, group, bkg,
            int8_dot):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # dynamic per-group scale rows/columns via iota-mask + reduce — Mosaic
    # cannot prove alignment for a dynamic single-lane / single-sublane
    # slice, but masked reductions vectorize fine
    as_all = as_ref[:]                               # [bm, G_total]
    ws_all = ws_ref[:]                               # [G_total, bn]
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, as_all.shape, 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, ws_all.shape, 0)

    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for gi in range(bkg):
        a = ac_ref[:, group * gi: group * (gi + 1)]
        w = wc_ref[group * gi: group * (gi + 1), :]
        if int8_dot:
            part = jax.lax.dot_general(
                a, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
        else:
            part = jax.lax.dot_general(
                a.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        g_idx = kk * bkg + gi
        sa = jnp.sum(jnp.where(lane_ids == g_idx, as_all, 0.0),
                     axis=1, keepdims=True)          # [bm, 1]
        sw = jnp.sum(jnp.where(row_ids == g_idx, ws_all, 0.0),
                     axis=0, keepdims=True)          # [1, bn]
        acc = acc + part * sa * sw
    out_ref[:] += acc


def _kernel3(ac_ref, as_ref, wc_ref, ws_ref, out_ref, acc_ref, *, group,
             bkg, nk, int8_dot):
    """Batch-aware variant of ``_kernel``: blocks are [1, bm, *] slices of
    the UN-RESHAPED [B, T, K] activations (the leading batch dim rides the
    grid), accumulation lives in f32 VMEM scratch, and the single
    out-dtype cast happens on the registered tile before the one HBM
    write — no [M, K] reshape, no f32 [M, N] epilogue buffer."""
    kk = pl.program_id(3)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    as_all = as_ref[0]                               # [bm, G_total]
    ws_all = ws_ref[:]                               # [G_total, bn]
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, as_all.shape, 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, ws_all.shape, 0)

    acc = jnp.zeros(acc_ref.shape, jnp.float32)
    for gi in range(bkg):
        a = ac_ref[0, :, group * gi: group * (gi + 1)]
        w = wc_ref[group * gi: group * (gi + 1), :]
        if int8_dot:
            part = jax.lax.dot_general(
                a, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
        else:
            part = jax.lax.dot_general(
                a.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        g_idx = kk * bkg + gi
        sa = jnp.sum(jnp.where(lane_ids == g_idx, as_all, 0.0),
                     axis=1, keepdims=True)
        sw = jnp.sum(jnp.where(row_ids == g_idx, ws_all, 0.0),
                     axis=0, keepdims=True)
        acc = acc + part * sa * sw
    acc_ref[:] += acc

    @pl.when(kk == nk - 1)
    def _():
        out_ref[0] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "group_size", "n", "k_dim", "int8_dot", "out_dtype", "interpret"))
def _int8_matmul_3d(
    acodes, ascales, wcodes, wscales, *, group_size, n, k_dim,
    int8_dot=True, out_dtype=jnp.bfloat16, interpret=False,
):
    """acodes [B, T, K] int8, ascales [B, T, G] f32, wcodes [K, N] int8,
    wscales [G, N] f32 -> [B, T, N] out_dtype.

    The N-D-aware wrapper (VERDICT r4 #8): the batch dim rides the grid's
    leading axis and the flattening happens in the BlockSpec index maps,
    not in HLO — the 2D reshape boundary (and the f32 output epilogue)
    that taxed the in-model grouped path disappears from the program."""
    bsz, t = acodes.shape[0], acodes.shape[1]
    g_total = k_dim // group_size
    bn = 128 * _pick(n, 128, (4, 3, 2, 1))
    bkg = _pick(k_dim, group_size, (5, 4, 3, 2, 1))
    bk = group_size * bkg
    bm = 512 if t >= 512 else (256 if t >= 256 else
                               (128 if t >= 128 else 32))
    t_pad = _round_up(max(t, 32), bm) if t > bm else _round_up(max(t, 32), 32)
    bm_eff = min(bm, t_pad)
    if t_pad != t:
        acodes = jnp.pad(acodes, ((0, 0), (0, t_pad - t), (0, 0)))
        ascales = jnp.pad(ascales, ((0, 0), (0, t_pad - t), (0, 0)))
    nk = k_dim // bk
    out = pl.pallas_call(
        functools.partial(_kernel3, group=group_size, bkg=bkg, nk=nk,
                          int8_dot=int8_dot),
        grid=(bsz, t_pad // bm_eff, n // bn, nk),
        in_specs=[
            pl.BlockSpec((1, bm_eff, bk), lambda b, i, j, kk: (b, i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm_eff, g_total),
                         lambda b, i, j, kk: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda b, i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g_total, bn), lambda b, i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bm_eff, bn),
                               lambda b, i, j, kk: (b, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, t_pad, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm_eff, bn), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * t_pad * n * k_dim,
            bytes_accessed=bsz * t_pad * k_dim + n * k_dim
            + bsz * t_pad * n * 2,
            transcendentals=0,
        ),
    )(acodes, ascales, wcodes, wscales)
    return out[:, :t] if t_pad != t else out


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick(total: int, unit: int, options) -> int:
    for o in options:
        if (total // unit) % o == 0:
            return o
    return 1


@functools.partial(jax.jit, static_argnames=(
    "group_size", "n", "k_dim", "int8_dot", "interpret"))
def _int8_matmul_2d(
    acodes, ascales, wcodes, wscales, *, group_size, n, k_dim,
    int8_dot=True, interpret=False,
):
    """acodes [M, K] int8, ascales [M, G] f32, wcodes [K, N] int8 (already
    transposed), wscales [G, N] f32 -> [M, N] f32."""
    m = acodes.shape[0]
    g_total = k_dim // group_size
    bn = 128 * _pick(n, 128, (4, 3, 2, 1))
    bkg = _pick(k_dim, group_size, (5, 4, 3, 2, 1))
    bk = group_size * bkg
    bm = 1024 if m >= 1024 else (512 if m >= 512 else 128)
    # int8 VMEM tiles are (32, 128): pad M to a 32-multiple
    m_pad = _round_up(max(m, 32), bm) if m > bm else _round_up(max(m, 32), 32)
    bm_eff = min(bm, m_pad)
    if m_pad != m:
        acodes = jnp.pad(acodes, ((0, m_pad - m), (0, 0)))
        ascales = jnp.pad(ascales, ((0, m_pad - m), (0, 0)))
    grid = (m_pad // bm_eff, n // bn, k_dim // bk)
    out = pl.pallas_call(
        functools.partial(_kernel, group=group_size, bkg=bkg,
                          int8_dot=int8_dot),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm_eff, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm_eff, g_total), lambda i, j, kk: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g_total, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm_eff, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * k_dim,
            bytes_accessed=m_pad * k_dim + n * k_dim + m_pad * n * 4,
            transcendentals=0,
        ),
    )(acodes, ascales, wcodes, wscales)
    return out[:m] if m_pad != m else out


def _jnp_reference(acodes, ascales, wcodes, wscales, group_size):
    """Exact jnp mirror of the kernel (CPU fallback / parity tests)."""
    m, k_dim = acodes.shape
    n = wcodes.shape[1]
    g = k_dim // group_size
    ai = acodes.reshape(m, g, group_size).astype(jnp.int32)
    wi = wcodes.reshape(g, group_size, n).astype(jnp.int32)
    part = jnp.einsum("mgk,gkn->mgn", ai, wi).astype(jnp.float32)
    return jnp.einsum("mgn,mg,gn->mn", part, ascales, wscales)


def _use_kernel(n: int, k_dim: int, group_size: int) -> bool:
    return (jax.default_backend() == "tpu"
            and n % 128 == 0 and k_dim % group_size == 0)


def _ch_kernel(ac_ref, as_ref, wc_ref, ws_ref, out_ref, acc_ref, *, nk):
    """Full-K int8 matmul with the per-channel rescale fused into the
    output tile.  XLA keeps the scale epilogue as a separate [M, N] pass
    (measured: raw int8 dot 103 TOP/s, +any epilogue -> 76-80, i.e. bf16
    parity — /tmp probe 2026-08-17, recorded in ARCHITECTURE.md); here the
    int32 accumulator lives in VMEM scratch across K steps and the single
    f32 scale + bf16 cast happens on the tile before the one HBM write.
    Accumulation is EXACT: |codes| <= 60 (packing.CODE_MULT) so even a
    full K = 7680 int32 sum stays < 2^25."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        ac_ref[:], wc_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(kk == nk - 1)
    def _():
        out_ref[:] = (acc_ref[:].astype(jnp.float32)
                      * as_ref[:] * ws_ref[:]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n", "k_dim", "out_dtype",
                                             "interpret"))
def _int8ch_matmul_2d(acodes, ascales, wcodes, wscales, *, n, k_dim,
                      out_dtype=jnp.bfloat16, interpret=False):
    """Per-channel path Pallas kernel: acodes [M, K] int8, ascales [M, 1]
    f32, wcodes [K, N] int8, wscales [1, N] f32 -> [M, N] out_dtype."""
    m = acodes.shape[0]
    bn = 128 * _pick(n, 128, (4, 3, 2, 1))
    # largest 128-aligned divisor of K up to 1920 (halving would degrade to
    # sub-128 blocks for K like 2304 = d36's width, breaking int8 tiling)
    bk = 128
    for cand in range(min(k_dim, 1920), 127, -128):
        if k_dim % cand == 0:
            bk = cand
            break
    bm = 1024 if m >= 1024 else (512 if m >= 512 else 128)
    m_pad = _round_up(max(m, 32), bm) if m > bm else _round_up(max(m, 32), 32)
    bm_eff = min(bm, m_pad)
    if m_pad != m:
        acodes = jnp.pad(acodes, ((0, m_pad - m), (0, 0)))
        ascales = jnp.pad(ascales, ((0, m_pad - m), (0, 0)))
    nk = k_dim // bk
    out = pl.pallas_call(
        functools.partial(_ch_kernel, nk=nk),
        grid=(m_pad // bm_eff, n // bn, nk),
        in_specs=[
            pl.BlockSpec((bm_eff, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm_eff, 1), lambda i, j, kk: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm_eff, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm_eff, bn), jnp.int32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * k_dim,
            bytes_accessed=m_pad * k_dim + n * k_dim + m_pad * n * 2,
            transcendentals=0,
        ),
    )(acodes, ascales, wcodes, wscales)
    return out[:m] if m_pad != m else out


def _fused_ch_kernel(x_ref, wc_ref, ws_ref, out_ref, codes_ref, asc_ref,
                     acc_ref, *, nk, bk, int_grid, mids):
    """Two-phase fused per-channel int8 GEMM (the round-3 kernel):

    phase 1 (once per M-tile, at j==kk==0): per-token quantize the WHOLE
    [bm, K] activation block into int8 value codes + one f32 scale per row,
    both kept in VMEM scratch — the act-quant chain never round-trips HBM
    and never re-runs per N-tile;

    phase 2 (every (j, kk)): one int8 x int8 -> int32 MXU dot per K-tile
    into a VMEM accumulator; at the last K-tile the single f32 rescale
    (ascale outer wscale) happens on the registered tile before the one
    bf16 HBM write — no [M, N] int32/f32 epilogue pass ever materializes.

    Round-2's negative result (ROUND_NOTES_r02.md int8ch section) was a
    dot-only Pallas kernel: the pallas_call boundary forced the XLA-side
    quantize chain's codes/scales through HBM.  Bringing the quantize
    inside removes that boundary; the remaining cost is x [bm, K] bf16
    read once per M-tile (index map constant over j/kk -> stays in VMEM).
    """
    j, kk = pl.program_id(1), pl.program_id(2)

    @pl.when((j == 0) & (kk == 0))
    def _():
        y = x_ref[:].astype(jnp.float32)
        amax = jnp.max(jnp.abs(y), axis=1, keepdims=True)
        gmax = float(max(abs(int_grid[0]), abs(int_grid[-1])))
        # divisions (not reciprocal-multiplies): amax/gmax_int is exactly
        # (amax/gmax_grid)/mult for power-of-two mult, so yn's compares are
        # BIT-identical to packing.quant_int_codes' grid-unit compares
        scale = jnp.where(amax > 0, amax / jnp.float32(gmax), 1.0)
        yn = y / scale
        # integer-delta compare-sum: codes = int_grid[0]
        #   + sum_i (int_grid[i+1]-int_grid[i]) * [yn >= mid_i]
        # == round(snap_to_grid(yn/mult_units) * mult): same <=-tie rule,
        # bit-parity with packing.quant_int_codes
        code = jnp.full(yn.shape, float(int_grid[0]), jnp.float32)
        for m_, d_ in zip(mids, (int_grid[1:] - int_grid[:-1]).tolist()):
            code = code + jnp.where(yn >= m_, jnp.float32(d_),
                                    jnp.float32(0))
        codes_ref[:] = code.astype(jnp.int8)
        asc_ref[:] = scale

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        codes_ref[:, pl.ds(pl.multiple_of(kk * bk, bk), bk)], wc_ref[:],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)

    @pl.when(kk == nk - 1)
    def _():
        out_ref[:] = (acc_ref[:].astype(jnp.float32)
                      * asc_ref[:] * ws_ref[:]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("fmt", "n", "k_dim",
                                             "out_dtype", "interpret",
                                             "block_m"))
def _fused_ch_matmul_2d(x, wcodes, wscales, *, fmt, n, k_dim,
                        out_dtype=jnp.bfloat16, interpret=False,
                        block_m=None):
    """x [M, K] (bf16/f32, post rotate+smooth), wcodes [K, N] int8,
    wscales [1, N] f32 (CODE_MULT folded) -> [M, N] out_dtype.

    The activation's per-token scale (absmax/gmax/mult) and int8 value
    codes are computed IN-KERNEL (see _fused_ch_kernel); output equals
    _channel_dot(P.quant_int_codes(x, fmt, K)) bit-wise."""
    import numpy as np  # local: grid table -> static kernel constants

    from fpqvar_tpu.ops import grids as G
    from fpqvar_tpu.ops import packing as P2

    m = x.shape[0]
    grid_vals = np.asarray(G.GRIDS[fmt], np.float32)
    mult = float(P2.CODE_MULT[fmt])
    int_grid = np.round(grid_vals * mult).astype(np.int32)
    # midpoints in scale-normalized units times mult (yn is y/scale where
    # scale = absmax/gmax/... times 1/mult folded into gmax): compare in
    # int-code units, so mids are between consecutive INT values
    mids = (((grid_vals[1:] + grid_vals[:-1]) * 0.5) * mult).tolist()

    bn = 128 * _pick(n, 128, (5, 4, 3, 2, 1))
    bkg = _pick(k_dim, 128, (5, 4, 3, 2, 1))
    bk = 128 * bkg
    # adaptive M-tile under a ~10MB VMEM budget (v5e has 16MB/core and
    # Mosaic double-buffers pipelined blocks): per row the kernel holds
    # x [K] (x2 buffering), codes [K] int8, acc [bn] i32 + out [bn] bf16
    # (x2); plus w tiles [bk, bn] int8 (x2) shared across rows
    xbytes = 4 if x.dtype == jnp.float32 else 2
    per_row = k_dim * (2 * xbytes + 1) + bn * (4 + 2 * 2) + 4
    fixed = 2 * bk * bn + 2 * bn * 4
    # empirical: Mosaic's scoped-vmem demand measures ~2x this estimate
    # (extra pipeline copies); 6MB of modeled budget keeps the observed
    # demand inside the 16MB hardware limit at every recipe shape
    budget = 6 * 2**20 - fixed
    bm = 32
    for cand in (1024, 512, 256, 128, 64):
        if cand * per_row <= budget:
            bm = cand
            break
    if block_m is not None:
        bm = block_m
    m_pad = _round_up(max(m, 32), bm) if m > bm else _round_up(max(m, 32), 32)
    bm_eff = min(bm, m_pad)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    nk = k_dim // bk
    out = pl.pallas_call(
        functools.partial(_fused_ch_kernel, nk=nk, bk=bk,
                          int_grid=int_grid, mids=mids),
        grid=(m_pad // bm_eff, n // bn, nk),
        in_specs=[
            pl.BlockSpec((bm_eff, k_dim), lambda i, j, kk: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm_eff, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bm_eff, k_dim), jnp.int8),
            pltpu.VMEM((bm_eff, 1), jnp.float32),
            pltpu.VMEM((bm_eff, bn), jnp.int32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * k_dim,
            bytes_accessed=m_pad * k_dim * 2 + n * k_dim + m_pad * n * 2,
            transcendentals=0,
        ),
    )(x, wcodes, wscales)
    return out[:m] if m_pad != m else out


def _channel_dot(ac, asc, wc, ws):
    """Per-channel/per-token path (G == 1): ONE full-K int8 MXU dot with the
    scales hoisted entirely out of the contraction.

    The corrected kernel-roofline (ROUND_NOTES_r03.md; the earlier 59-vs-106
    numbers were DCE/memoization artifacts) measured this full-K chain at
    165.3 TOP/s vs the bf16 GEMM's 114.3 TFLOP/s (1.45x; 1.36x including
    the act-quant emit) and the grouped-128 Pallas kernel at 112.4 (0.98x).
    With per-channel weight / per-token act scales the rescale is one
    outer-product multiply amortized over the whole K depth.  Plain XLA —
    no Pallas needed.

    asc [..., 1], ws [1, N]; exact: |codes| <= 60 (packing.CODE_MULT) so the
    int32 dot is overflow-free to K ~ 5e5.

    Accepts N-D ``ac`` ([..., K] codes, contraction over the last dim) and
    this matters: reshaping to [M, K] before the dot makes XLA lay the 2D
    dot out in isolation, and the 2D<->[B,l,H,c] boundaries around it then
    lower to giant physical copies (measured at pn16 batch-8: a 35.9M-cycle
    qkv reshape copy + 20.8M cycles of s8 transposes on the proj input —
    the entire "int8chs loses the largest scales" regression, see
    ROUND_NOTES_r04.md).  Keeping the model's natural [B, l, K] shape lets
    the layout assignment fuse the chain exactly like the bf16 GEMMs.
    """
    p = jax.lax.dot_general(ac, wc, (((ac.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return p.astype(jnp.float32) * asc * ws


def _call(ac, asc, wc, ws, *, group_size, n, k_dim, force_jnp):
    # Per-channel GEMMs always take the XLA _channel_dot chain.  Two retired
    # Pallas alternatives (`_int8ch_matmul_2d` fused-epilogue, round 2;
    # `_fused_ch_matmul_2d` two-phase quantize-in-VMEM, round 3) are kept as
    # measured diagnostics only — both lost drift-free bracketed runs to
    # XLA's quantize->dot->rescale fusion (ARCHITECTURE.md "Fused-kernel
    # appendix"; scripts/kernel_roofline.py still measures them).
    if group_size == k_dim:
        return _channel_dot(ac, asc, wc, ws)
    if force_jnp or not _use_kernel(n, k_dim, group_size):
        return _jnp_reference(ac, asc, wc, ws, group_size)
    return _int8_matmul_2d(ac, asc, wc, ws, group_size=group_size, n=n,
                           k_dim=k_dim)


def _shard_mapped(ac, asc, wcodes, wscales, *, mesh, parallel, group_size,
                  n, k_dim, force_jnp):
    """Tensor-parallel GEMM via jax.shard_map (the packed/int8 + TP
    composition — codes and scales live SHARDED on the mesh, the kernel
    runs on local shards, collectives ride the mesh):

    - "col" (mat_qkv, fc1): weight output dim over tp, activations
      replicated across tp, output tp-sharded (Megatron column parallel);
    - "row" (proj, fc2): weight input dim over tp — activation code/scale
      GROUPS split with it (group_size divides the local K) — one psum over
      tp on the partial products (Megatron row parallel).

    Batch rows ride the dp axis when present.  Returns None when the mesh /
    shape constraints don't hold (caller falls back to the local path).
    """
    from jax.sharding import PartitionSpec as P

    tp = mesh.shape.get("tp", 1)
    if tp <= 1:
        return None
    xr = "dp" if "dp" in mesh.axis_names else None
    if xr is not None and ac.shape[0] % mesh.shape["dp"]:
        xr = None
    if parallel == "col" and n % (128 * tp) == 0:
        fn = functools.partial(_call, group_size=group_size, n=n // tp,
                               k_dim=k_dim, force_jnp=force_jnp)
        return jax.shard_map(
            fn, mesh=mesh,
            in_specs=(P(xr, None), P(xr, None),
                      P(None, "tp"), P(None, "tp")),
            out_specs=P(xr, "tp"),
        )(ac, asc, wcodes, wscales)
    if parallel == "row" and group_size == k_dim and k_dim % (128 * tp) == 0:
        # per-channel (G == 1): K splits over tp but the single per-token /
        # per-channel scale does NOT — psum the exact int32 partials, scale
        # once after the collective
        def fn(a, s, wc, ws):
            p = jax.lax.dot_general(a, wc, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return jax.lax.psum(p, "tp").astype(jnp.float32) * s * ws

        return jax.shard_map(
            fn, mesh=mesh,
            in_specs=(P(xr, "tp"), P(xr, None),
                      P("tp", None), P(None, None)),
            out_specs=P(xr, None),
        )(ac, asc, wcodes, wscales)
    if parallel == "row" and k_dim % (group_size * tp) == 0:
        def fn(a, s, wc, ws):
            local = _call(a, s, wc, ws, group_size=group_size, n=n,
                          k_dim=k_dim // tp, force_jnp=force_jnp)
            return jax.lax.psum(local, "tp")

        return jax.shard_map(
            fn, mesh=mesh,
            in_specs=(P(xr, "tp"), P(xr, "tp"),
                      P("tp", None), P("tp", None)),
            out_specs=P(xr, None),
        )(ac, asc, wcodes, wscales)
    return None


def _wonly_dot(x2, wc, ws, group_size):
    """Weights-only (W4A16 / W6A16) GEMM: activations stay bf16, weight
    codes convert in the dot's operand read.

    Per-channel (group_size == K): y = (x @ codes_bf16) * ws — ONE bf16
    MXU dot, the per-output-channel scale applied once on the [M, N]
    output.  Per-group: the grouped dequant ``codes * ws[g]`` is an
    elementwise producer XLA fuses into the dot's weight read.  Weight HBM
    traffic is the int8 code bytes — half of bf16 — which is the whole win
    in the batch-1 weight-memory-bound regime (ROUND_NOTES_r02.md roofline:
    26.5 GB -> 13.2 GB per d30 generation).  No act-quant chain at all.
    """
    k_dim, n = wc.shape
    xb = x2.astype(jnp.bfloat16)
    cdim = xb.ndim - 1          # N-D lhs: contract the last dim (see
    #                             _channel_dot on why no [M, K] reshape)
    if group_size == k_dim:
        p = jax.lax.dot_general(xb, wc.astype(jnp.bfloat16),
                                (((cdim,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return p * ws
    g = k_dim // group_size
    wdq = (wc.reshape(g, group_size, n).astype(jnp.float32)
           * ws[:, None, :]).astype(jnp.bfloat16).reshape(k_dim, n)
    return jax.lax.dot_general(xb, wdq, (((cdim,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _wonly_shard_mapped(x2, wcodes, wscales, *, mesh, parallel, group_size,
                        n, k_dim):
    """Tensor-parallel weights-only GEMM (same Megatron col/row layout as
    _shard_mapped; the activation is bf16, not codes)."""
    from jax.sharding import PartitionSpec as P

    tp = mesh.shape.get("tp", 1)
    if tp <= 1:
        return None
    xr = "dp" if "dp" in mesh.axis_names else None
    if xr is not None and x2.shape[0] % mesh.shape["dp"]:
        xr = None
    if parallel == "col" and n % (128 * tp) == 0:
        fn = functools.partial(_wonly_dot, group_size=group_size)
        return jax.shard_map(
            fn, mesh=mesh,
            in_specs=(P(xr, None), P(None, "tp"), P(None, "tp")),
            out_specs=P(xr, "tp"),
        )(x2, wcodes, wscales)
    if parallel == "row" and group_size == k_dim and k_dim % (128 * tp) == 0:
        # per-channel: K splits over tp, the [1, N] scale does not — psum
        # the f32 partials, scale once after the collective
        def fn(a, wc, ws):
            p = jax.lax.dot_general(
                a.astype(jnp.bfloat16), wc.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return jax.lax.psum(p, "tp") * ws

        return jax.shard_map(
            fn, mesh=mesh,
            in_specs=(P(xr, "tp"), P("tp", None), P(None, None)),
            out_specs=P(xr, None),
        )(x2, wcodes, wscales)
    if parallel == "row" and k_dim % (group_size * tp) == 0:
        def fn(a, wc, ws):
            return jax.lax.psum(
                _wonly_dot(a, wc, ws, group_size), "tp")

        return jax.shard_map(
            fn, mesh=mesh,
            in_specs=(P(xr, "tp"), P("tp", None), P("tp", None)),
            out_specs=P(xr, None),
        )(x2, wcodes, wscales)
    return None


def int8_linear(x, pw: P.IntPack, act_fmt: str = None, *,
                mesh=None, parallel: str = None, force_jnp: bool = False):
    """Quantize activation to int codes + run the grouped int8 GEMM.

    x [..., K] unquantized (post-rotation/smoothing); pw holds the weight
    codes.  ``act_fmt`` defaults to the weight format (the recipe's W=A
    pairing for mat_qkv/proj/fc1); ``act_fmt="bf16"`` selects the
    weights-only path (activations NOT quantized — the W4A16 deployment
    mode, see _wonly_dot).  With ``mesh`` + ``parallel`` the GEMM runs
    tensor-parallel via shard_map (see _shard_mapped).  Returns [..., N]
    in x.dtype.
    """
    n, k_dim = pw.shape[-2], pw.shape[-1]
    lead = x.shape[:-1]
    if act_fmt == "bf16":
        out = None
        if mesh is not None and parallel is not None:
            out = _wonly_shard_mapped(
                x.reshape(-1, k_dim), pw.codes, pw.scales, mesh=mesh,
                parallel=parallel, group_size=pw.group_size, n=n,
                k_dim=k_dim)
            if out is not None:
                out = out.reshape(lead + (n,))
        if out is None:
            # N-D dot — no [M, K] reshape (see _channel_dot's layout note)
            out = _wonly_dot(x, pw.codes, pw.scales, pw.group_size)
        return out.astype(x.dtype)
    fmt = act_fmt or pw.fmt
    if mesh is not None and parallel is not None:
        x2 = x.reshape(-1, k_dim)
        ac, asc = P.quant_int_codes(x2, fmt, pw.group_size)
        out = _shard_mapped(ac, asc, pw.codes, pw.scales, mesh=mesh,
                            parallel=parallel, group_size=pw.group_size,
                            n=n, k_dim=k_dim, force_jnp=force_jnp)
        if out is None:
            out = _call(ac, asc, pw.codes, pw.scales,
                        group_size=pw.group_size, n=n, k_dim=k_dim,
                        force_jnp=force_jnp)
        return out.reshape(lead + (n,)).astype(x.dtype)
    if pw.group_size == k_dim:
        # per-channel/per-token: quantize AND contract in the model's
        # natural [..., K] shape — the 2D reshape was the source of the
        # large-scale layout-copy regression (ROUND_NOTES_r04.md)
        ac, asc = P.quant_int_codes(x, fmt, k_dim)
        return _channel_dot(ac, asc, pw.codes, pw.scales).astype(x.dtype)
    # N-D-aware routing through _int8_matmul_3d was attempted and measured
    # SLOWER in-model (d30 b8: 0.514x bf16 vs this 2D route's 0.59x —
    # ROUND_NOTES_r05.md): for the grouped kernel the 2D reshape boundary
    # is not the binding cost, the kernel itself is.  Grouped remains the
    # QUALITY/CAPACITY path; the speed path is the per-channel XLA chain.
    x2 = x.reshape(-1, k_dim)
    ac, asc = P.quant_int_codes(x2, fmt, pw.group_size)
    out = _call(ac, asc, pw.codes, pw.scales, group_size=pw.group_size,
                n=n, k_dim=k_dim, force_jnp=force_jnp)
    return out.reshape(lead + (n,)).astype(x.dtype)


def int8_linear_dual(x, pw: P.IntPack, act_fmt: str, *,
                     mesh=None, parallel: str = None,
                     force_jnp: bool = False):
    """fc2: dual-grid activation (separate neg/pos codes + scales) against
    single-grid weight codes — two grouped int8 GEMMs sharing the weight
    tiles (`quant_utils.py:380-451` semantics)."""
    n, k_dim = pw.shape[-2], pw.shape[-1]
    lead = x.shape[:-1]
    nd_single = mesh is None and pw.group_size == k_dim
    x2 = x if nd_single else x.reshape(-1, k_dim)   # N-D when possible
    cn, sn, cp, sp = P.quant_int_codes_dual(x2, act_fmt, pw.group_size)
    halves = []
    for c, s in ((cn, sn), (cp, sp)):
        out = None
        if nd_single:
            out = _channel_dot(c, s, pw.codes, pw.scales)
        if out is None and mesh is not None and parallel is not None:
            out = _shard_mapped(c, s, pw.codes, pw.scales, mesh=mesh,
                                parallel=parallel, group_size=pw.group_size,
                                n=n, k_dim=k_dim, force_jnp=force_jnp)
        if out is None:
            out = _call(c, s, pw.codes, pw.scales,
                        group_size=pw.group_size, n=n, k_dim=k_dim,
                        force_jnp=force_jnp)
        halves.append(out)
    out = halves[0] + halves[1]
    if not nd_single:
        out = out.reshape(lead + (n,))
    return out.astype(x.dtype)
