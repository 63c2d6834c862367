"""Fused packed-weight dequant + matmul Pallas kernel.

Replaces the reference's fake-quant pipeline (activation fake-quant -> dense
fp16 GEMM, `models_fp_quant/quant_utils.py:844-850`): here the weight lives in
HBM as 4-bit codes (two per byte, group-split layout — see
fpqvar_tpu.ops.packing) plus per-group scales, and each K-tile is decoded
in-register (branch-free arithmetic minifloat decode) right before the MXU
contraction.  Weight HBM traffic is ~4x lower than bf16.

Grid: (M/bm, N/bn, K/bk) with bk == group_size so one K-tile == one scale
group; the f32 accumulator lives in the revisited output block (standard
Pallas TPU K-loop accumulation).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fpqvar_tpu.ops import packing as P

_DECODERS = {
    "fp_e2": P.decode_fp4_e2m1,
    "fp6_e2m3": P.decode_fp6_e2m3,
}


def _kernel_fp4(x_ref, codes_ref, scales_ref, out_ref, *, bk, decoder):
    """codes_ref is a (bn/2, bk) byte tile in row-split layout: byte row r
    holds weight row r (lo nibble) and row r + bn/2 (hi nibble) of this
    output tile — unpack is two shifts + a sublane concat."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    bytes_ = codes_ref[:].astype(jnp.int32) & 0xFF      # [bn//2, bk]
    lo = bytes_ & 0xF
    hi = (bytes_ >> 4) & 0xF
    codes = jnp.concatenate([lo, hi], axis=0)           # [bn, bk]
    w = decoder(codes)                                  # [bn, bk] grid values
    acc = jnp.dot(x_ref[:], w.astype(x_ref.dtype).T,
                  preferred_element_type=jnp.float32)   # [bm, bn]
    # per-group scale applied on the output columns (bk == one scale group)
    j = pl.program_id(1)
    bn = w.shape[0]
    # dynamic sublane loads must be aligned -> select group row k by mask
    s_all = scales_ref[:, pl.ds(j * bn, bn)]            # [G, bn]
    row = jax.lax.broadcasted_iota(jnp.int32, s_all.shape, 0)
    s = jnp.sum(jnp.where(row == k, s_all, 0.0), axis=0, keepdims=True)
    out_ref[:] += acc * s


def _kernel_int8codes(x_ref, codes_ref, scales_ref, out_ref, *, bk, decoder):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    codes = codes_ref[:].astype(jnp.int32)              # [bn, bk]
    w = decoder(codes)
    acc = jnp.dot(x_ref[:], w.astype(x_ref.dtype).T,
                  preferred_element_type=jnp.float32)
    j = pl.program_id(1)
    bn = w.shape[0]
    # dynamic sublane loads must be aligned -> select group row k by mask
    s_all = scales_ref[:, pl.ds(j * bn, bn)]            # [G, bn]
    row = jax.lax.broadcasted_iota(jnp.int32, s_all.shape, 0)
    s = jnp.sum(jnp.where(row == k, s_all, 0.0), axis=0, keepdims=True)
    out_ref[:] += acc * s


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=(
    "fmt", "group_size", "n", "k_dim", "nibble", "bm", "bn", "interpret"))
def _packed_matmul_2d(
    x, codes, scales, *, fmt, group_size, n, k_dim, nibble,
    bm=128, bn=128, interpret=False,
):
    """x [M, K] @ dequant(codes, scales_t).T -> [M, N] (f32).
    ``scales`` here is TRANSPOSED: [G, N] (G = K/group_size)."""
    m = x.shape[0]
    bk = group_size
    decoder = _DECODERS[fmt]
    if m >= 4 * bm:
        bm = 4 * bm   # large-M tiles amortize the per-K-tile weight decode
    m_pad = _round_up(max(m, 8), bm) if m > bm else _round_up(max(m, 8), 8)
    bm_eff = min(bm, m_pad)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    grid = (m_pad // bm_eff, n // bn, k_dim // bk)
    kernel = _kernel_fp4 if nibble else _kernel_int8codes
    codes_bn = bn // 2 if nibble else bn
    out = pl.pallas_call(
        functools.partial(kernel, bk=bk, decoder=decoder),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm_eff, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((codes_bn, bk), lambda i, j, kk: (j, kk),
                         memory_space=pltpu.VMEM),
            # scales transposed to [G, N], whole array resident in VMEM
            # (tiny: N*G*4 bytes), sliced dynamically in-kernel
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm_eff, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * k_dim,
            bytes_accessed=m_pad * k_dim * 2 + n * k_dim // (2 if nibble else 1)
            + m_pad * n * 4,
            transcendentals=0,
        ),
    )(x, codes, scales)
    return out[:m] if m_pad != m else out


def packed_linear(x, pw: P.PackedTensor, *, force_jnp: bool = False):
    """x [..., K] @ dequant(pw).T where pw encodes a [N, K] weight.

    On TPU uses the fused Pallas kernel (for supported formats / aligned
    shapes); elsewhere falls back to jnp dequant + matmul (bit-identical
    result, used by the CPU test suite).
    """
    n, k_dim = pw.shape
    lead = x.shape[:-1]
    x2 = x.reshape(-1, k_dim)
    usable = (
        not force_jnp
        and jax.default_backend() == "tpu"
        and pw.fmt in _DECODERS
        and n % 128 == 0
        and k_dim % pw.group_size == 0
    )
    if usable:
        out = _packed_matmul_2d(
            x2, pw.codes, pw.scales.astype(jnp.float32).T,
            fmt=pw.fmt, group_size=pw.group_size, n=n, k_dim=k_dim,
            nibble=pw.nibble_packed,
        )
    else:
        w = P.dequantize(pw, dtype=x.dtype)
        out = (x2 @ w.T).astype(jnp.float32)
    return out.reshape(lead + (n,)).astype(x.dtype)
