"""Packed low-bit code representation (the *real* quantization path).

The reference only ever simulates low-bit inference (fake-quant: dequantized
fp16 tensors, dense fp16 GEMMs — `quant_utils.py:844-850`).  The TPU build
goes further: weights are stored as small integer *codes* plus per-group
scales, and the Pallas kernels (:mod:`fpqvar_tpu.ops.pallas`) decode them
in-register on the way into the MXU.

Layout
------
- fp4 formats (15-entry grids): 4-bit codes, two per int8 byte, halving
  weight HBM traffic vs int8 codes.  Codes are packed across *rows* (the
  output dim of a weight): within each 128-row tile, byte row r (0<=r<64)
  holds row r in its low nibble and row 64+r in its high nibble
  ("row-split" layout).  A Pallas K-tile of codes is then a legal
  (64, 128)-shaped int8 block, and the in-kernel unpack is two shifts plus a
  cheap sublane concat — no lane shuffles.  Requires rows % 128 == 0;
  otherwise codes fall back to one int8 byte per element.
- fp6/int6 formats (<=64-entry grids): one 6-bit code per int8 byte (TPU has
  no native 6-bit lane; byte-aligned codes keep loads vectorizable while
  still 2.7x smaller than bf16).
- scales: float32, shape [rows, groups] for per-group or [rows, 1] per-token.

A code is the index into the format's sorted value grid; dequant is
``grid[code] * scale``.  Codes are produced with the same midpoint-searchsorted
snap as the fake path so packed and fake paths agree bit-exactly.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from fpqvar_tpu.ops import grids as G

Array = jnp.ndarray


@dataclass(frozen=True)
class PackedTensor:
    """Quantized tensor: codes + scales + metadata. A pytree-compatible value
    (registered below) so it can live inside model params."""

    codes: Array            # int8; row-split nibble-packed for 4-bit formats
    scales: Array           # f32 [..., n_groups] broadcastable over groups
    fmt: str
    shape: Tuple[int, ...]  # logical (unpacked) shape
    group_size: int
    nibble_packed: bool = False


def _flatten_fields(p: PackedTensor):
    return (p.codes, p.scales), (p.fmt, p.shape, p.group_size,
                                 p.nibble_packed)


def _unflatten_fields(aux, children):
    fmt, shape, group_size, nibble = aux
    codes, scales = children
    return PackedTensor(codes, scales, fmt, shape, group_size, nibble)


import jax  # noqa: E402

jax.tree_util.register_pytree_node(
    PackedTensor, _flatten_fields, _unflatten_fields
)


def encode_to_grid(x: Array, grid: np.ndarray) -> Array:
    """Nearest-grid code indices (same tie rule as quantizers.snap_to_grid)."""
    g = np.asarray(grid, dtype=np.float32)
    mids = ((g[1:] + g[:-1]) * 0.5).tolist()
    # gather-free, unrolled: index = count of midpoints <= x (same tie rule
    # as quantizers.snap_to_grid; see its note on TPU lowering costs)
    idx = jnp.zeros(x.shape, jnp.int32)
    for m in mids:
        idx = idx + jnp.where(x >= m, 1, 0).astype(jnp.int32)
    return idx


def pack(x: Array, fmt: str, group_size: int = 128) -> PackedTensor:
    """Quantize ``x`` (…, K) to packed codes + per-group scales."""
    grid = G.GRIDS[fmt]
    gmax = float(np.max(np.abs(grid)))
    shape = tuple(x.shape)
    if shape[-1] % group_size:
        raise ValueError("last dim must be divisible by group_size")
    xg = x.reshape(shape[:-1] + (shape[-1] // group_size, group_size))
    absmax = jnp.max(jnp.abs(xg), axis=-1, keepdims=True)
    scales = jnp.where(absmax > 0, absmax / gmax, 1.0).astype(jnp.float32)
    codes = encode_to_grid(xg / scales, grid).reshape(shape)
    nibble = (len(grid) <= 16 and len(shape) >= 2 and shape[-2] % 128 == 0)
    if nibble:
        rows = shape[-2]
        ct = codes.reshape(shape[:-2] + (rows // 128, 128, shape[-1]))
        lo = ct[..., :64, :]
        hi = ct[..., 64:, :]
        packed = (lo | (hi << 4)).astype(jnp.int8)
        packed = packed.reshape(shape[:-2] + (rows // 2, shape[-1]))
    else:
        packed = codes.astype(jnp.int8)
    return PackedTensor(packed, scales[..., 0], fmt, shape, group_size,
                        nibble)


def unpack_codes(p: PackedTensor) -> Array:
    """int32 code indices at logical shape (inverse of the row-split nibble
    layout, see module docstring)."""
    if p.nibble_packed:
        rows = p.shape[-2]
        b = p.codes.astype(jnp.int32) & 0xFF
        bt = b.reshape(p.shape[:-2] + (rows // 128, 64, p.shape[-1]))
        lo = bt & 0xF
        hi = (bt >> 4) & 0xF
        codes = jnp.concatenate([lo, hi], axis=-2).reshape(p.shape)
    else:
        codes = p.codes.astype(jnp.int32)
    return codes


def dequantize(p: PackedTensor, dtype=jnp.float32) -> Array:
    """Reference dequantization: grid[code] * scale (jnp path; the Pallas
    kernels do the same decode in-register)."""
    grid = jnp.asarray(G.GRIDS[p.fmt], dtype=jnp.float32)
    codes = unpack_codes(p)
    vals = jnp.take(grid, codes)
    g = p.group_size
    vg = vals.reshape(p.shape[:-1] + (p.shape[-1] // g, g))
    out = vg * p.scales[..., None]
    return out.reshape(p.shape).astype(dtype)


def pack_stacked(w: Array, fmt: str, group_size: int = 128) -> PackedTensor:
    """Pack a depth-stacked weight [d, out, in] such that slicing the leading
    axis (e.g. inside `lax.scan` over blocks) yields a valid per-block
    PackedTensor: the static ``shape`` aux records the *per-block* logical
    shape (out, in)."""
    p = pack(w, fmt, group_size)
    return PackedTensor(p.codes, p.scales, fmt, p.shape[1:], group_size,
                        p.nibble_packed)


# ---------------------------------------------------------------------------
# Branch-free arithmetic decoders (used inside Pallas kernels where a gather
# from a lookup table is not vectorization-friendly).
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Integer-value codes for the int8-MXU path.
#
# Every fp4/fp6 grid is exactly representable as small integers after
# multiplying by a fixed power of two (e2m1 x2 -> {0,±1..±4,±6,±8,±12}),
# so a quantized GEMM can run as int8 x int8 -> int32 on the MXU (2x the
# bf16 rate on v5e) with the per-group scales applied in f32 afterwards:
#
#   y = sum_g  ascale'[m,g] * wscale'[g,n] * (acodes[m,gk] . wcodes[gk,n])
#
# where scale' = absmax/gmax/mult absorbs the integer multiplier.  The
# int32 dot is EXACT (|code| <= 60, 128-term groups), so this path is
# numerically tighter than the fake bf16 GEMM.
# ---------------------------------------------------------------------------

#: format -> multiplier making every grid value an exact integer (and the
#: largest |integer| staying within int8)
CODE_MULT = {
    "fp_e1": 4,        # e1m2: 0.25 steps        -> |int| <= 7
    "fp_e2": 2,        # e2m1: 0.5 granularity   -> |int| <= 12
    "fp_e3": 4,        # e3m0: 0.25 min          -> |int| <= 64
    "fp6_e2m3": 8,     # e2m3: 0.125 min         -> |int| <= 60
}

#: dual-grid format -> (neg_mult, pos_mult)
DUAL_CODE_MULT = {
    "fp_e1m2_neg_e2m1_pos": (4, 2),
    "fp4_afpq": (2, 2),
    "fp6_int_neg_e2m3_pos": (1, 8),
}


@dataclass(frozen=True)
class IntPack:
    """Weight packed as integer-value codes for the int8-MXU kernel.

    ``codes``: int8, TRANSPOSED layout [K, N] (so kernel K-tiles load
    contiguously, no in-kernel transpose); ``scales``: f32 [G, N] with the
    CODE_MULT folded in (value = code * scale).  ``shape`` is the logical
    (N, K) torch-layout weight shape.
    """

    codes: Array
    scales: Array
    fmt: str
    shape: Tuple[int, ...]
    group_size: int


jax.tree_util.register_pytree_node(
    IntPack,
    lambda p: ((p.codes, p.scales), (p.fmt, p.shape, p.group_size)),
    lambda aux, ch: IntPack(ch[0], ch[1], *aux),
)


def quant_int_codes(x: Array, fmt: str, group_size: int = 128):
    """Quantize (…, K) -> (codes int8, scales f32 (…, G)) with value =
    code * scale.  Uses the same midpoint snap as the fake path, so
    codes * scales reproduces ``quantizers.fake_quant_fp`` bit-wise."""
    from fpqvar_tpu.ops import quantizers as Q

    grid = G.GRIDS[fmt]
    gmax = float(np.max(np.abs(grid)))
    mult = float(CODE_MULT[fmt])
    shape = tuple(x.shape)
    xg = x.reshape(shape[:-1] + (shape[-1] // group_size, group_size))
    xf = xg.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.where(absmax > 0, absmax / gmax, 1.0)
    snapped = Q.snap_to_grid(xf / scale, grid)          # exact grid values
    codes = jnp.round(snapped * mult).astype(jnp.int8)  # exact integers
    return (codes.reshape(shape),
            (scale[..., 0] / mult).astype(jnp.float32))


def quant_int_codes_dual(x: Array, fmt: str, group_size: int = 128):
    """Dual-grid (fc2) variant -> (codes_neg, scales_neg, codes_pos,
    scales_pos); value = cn * sn + cp * sp (each half snaps the other
    half's zeros to 0, matching ``quantizers.fake_quant_dual``)."""
    from fpqvar_tpu.ops import quantizers as Q

    neg_grid, pos_grid = G.DUAL_GRIDS[fmt]
    nmax = float(np.max(np.abs(neg_grid)))
    pmax = float(np.max(np.abs(pos_grid)))
    nmult, pmult = (float(m) for m in DUAL_CODE_MULT[fmt])
    shape = tuple(x.shape)
    xg = x.reshape(shape[:-1] + (shape[-1] // group_size, group_size))
    xf = xg.astype(jnp.float32)
    x_neg = jnp.where(xf <= 0, xf, 0.0)
    x_pos = jnp.where(xf > 0, xf, 0.0)
    amax_n = jnp.max(jnp.abs(x_neg), axis=-1, keepdims=True)
    amax_p = jnp.max(jnp.abs(x_pos), axis=-1, keepdims=True)
    sn = jnp.where(amax_n > 0, amax_n / nmax, 1.0)
    sp = jnp.where(amax_p > 0, amax_p / pmax, 1.0)
    cn = jnp.round(Q.snap_to_grid(x_neg / sn, neg_grid) * nmult)
    cp = jnp.round(Q.snap_to_grid(x_pos / sp, pos_grid) * pmult)
    return (cn.astype(jnp.int8).reshape(shape),
            (sn[..., 0] / nmult).astype(jnp.float32),
            cp.astype(jnp.int8).reshape(shape),
            (sp[..., 0] / pmult).astype(jnp.float32))


def pack_int_codes(w: Array, fmt: str, group_size: int = 128) -> IntPack:
    """Pack a [N, K] (or depth-stacked [d, N, K]) weight into the kernel's
    transposed int8 layout.  Stacked weights keep a leading depth axis on
    codes [d, K, N] and scales [d, G, N] (sliceable inside lax.scan)."""
    codes, scales = quant_int_codes(w, fmt, group_size)
    codes_t = jnp.swapaxes(codes, -1, -2)       # [..., K, N]
    scales_t = jnp.swapaxes(scales, -1, -2)     # [..., G, N]
    return IntPack(codes_t, scales_t, fmt, tuple(w.shape[-2:]), group_size)


def decode_fp4_e2m1(codes: Array) -> Array:
    """code (0..14 index into the sorted 15-value e2m1 grid) -> value.

    Index 7 is 0; value = sign(i-7) * mag[|i-7|] with magnitude ranks
    mag = [0, .5, 1, 1.5, 2, 3, 4, 6]:
    ``mag(k) = k < 2 ? 0.5*k : (2 + (k&1)) * 2^((k>>1) - 2)``.
    Verified against the grid in tests/test_packing.py.
    """
    i = codes.astype(jnp.int32) - 7
    sign = jnp.sign(i).astype(jnp.float32)
    k = jnp.abs(i)
    # 8-way magnitude select [0,.5,1,1.5,2,3,4,6] as a binary tree of
    # where's on the bits of k — no transcendentals, pure VPU selects.
    b0 = (k & 1) != 0
    b1 = (k & 2) != 0
    lo = jnp.where(b1, jnp.where(b0, 1.5, 1.0), jnp.where(b0, 0.5, 0.0))
    hi = jnp.where(b1, jnp.where(b0, 6.0, 4.0), jnp.where(b0, 3.0, 2.0))
    mag = jnp.where(k >= 4, hi, lo)
    return sign * mag


def decode_fp6_e2m3(codes: Array) -> Array:
    """Sorted-index decode of the 63-value e2m3 grid (codes 0..62, 31 -> 0)."""
    i = codes.astype(jnp.int32) - 31
    sign = jnp.sign(i).astype(jnp.float32)
    k = jnp.abs(i)  # 0..31 magnitude rank into the positive e2m3 sequence
    # k in 0..15 -> 0.125*k (subnormals + first octave);
    # k in 16..31 -> (8 + (k & 7)) * 2^((k>>3) - 4); the exponent factor is
    # only ever 0.25 (k<24) or 0.5 (k>=24): a select, not an exp2.
    lin = 0.125 * k.astype(jnp.float32)
    geo = (8.0 + (k & 7).astype(jnp.float32)) * jnp.where(k >= 24, 0.5, 0.25)
    mag = jnp.where(k < 16, lin, geo)
    return sign * mag
