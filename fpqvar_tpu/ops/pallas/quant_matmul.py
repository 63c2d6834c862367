"""Fused packed-weight dequant + matmul Pallas kernel.

Replaces the reference's fake-quant pipeline (activation fake-quant -> dense
fp16 GEMM, `models_fp_quant/quant_utils.py:844-850`): the weight lives in
HBM as 4-bit codes (two per byte, row-split layout — see
fpqvar_tpu.ops.packing) plus per-group scales, and each tile is decoded
in-register (branch-free select-tree minifloat decode) right before the MXU
contraction.  Weight HBM traffic is ~4x lower than bf16.

Tiling: grid (M/bm, N/bn, K/bk) with bn = 128*bn_tiles and bk =
group_size*bk_groups — multi-tile blocks keep the sequential grid shallow
(VAR-d30 shapes would otherwise run ~900 tiny iterations per matmul).  The
f32 accumulator lives in the revisited output block; per-group scales are
applied to the partial product of each K-subgroup (output-column scaling,
exact because a subgroup spans one scale group).
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


def _kernel(x_ref, codes_ref, scales_ref, out_ref, *,
            group, bkg, bn_tiles, nibble, decoder):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    bytes_ = codes_ref[:].astype(jnp.int32) & 0xFF
    if nibble:
        # row-split layout: byte rows [64t, 64t+64) hold rows [128t, 128t+64)
        # in the low nibble and [128t+64, 128t+128) in the high nibble
        parts = []
        for t in range(bn_tiles):
            tb = bytes_[64 * t: 64 * (t + 1), :]
            parts.append(tb & 0xF)
            parts.append((tb >> 4) & 0xF)
        codes = jnp.concatenate(parts, axis=0)          # [bn, bk]
    else:
        codes = bytes_
    w = decoder(codes)                                  # [bn, bk] grid values
    bn = w.shape[0]
    j = pl.program_id(1)
    s_cols = scales_ref[:, pl.ds(j * bn, bn)]           # [G_total, bn]
    g_total = s_cols.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (g_total, bn), 0)

    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for gi in range(bkg):
        xs = x_ref[:, group * gi: group * (gi + 1)]
        ws = w[:, group * gi: group * (gi + 1)]
        part = jnp.dot(xs, ws.astype(xs.dtype).T,
                       preferred_element_type=jnp.float32)
        s = jnp.sum(
            jnp.where(row_ids == kk * bkg + gi, s_cols, 0.0),
            axis=0, keepdims=True)                      # [1, bn]
        acc = acc + part * s
    out_ref[:] += acc


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick(total: int, unit: int, options) -> int:
    for o in options:
        if (total // unit) % o == 0:
            return o
    return 1


@functools.partial(jax.jit, static_argnames=(
    "fmt", "group_size", "n", "k_dim", "nibble", "interpret"))
def _packed_matmul_2d(
    x, codes, scales, *, fmt, group_size, n, k_dim, nibble, interpret=False,
):
    """x [M, K] @ dequant(codes, scales_t).T -> [M, N] (f32).
    ``scales`` is TRANSPOSED: [G, N] (G = K/group_size)."""
    m = x.shape[0]
    decoder = _DECODERS[fmt]
    bn_tiles = _pick(n, 128, (4, 3, 2, 1))
    bn = 128 * bn_tiles
    bkg = _pick(k_dim, group_size, (5, 4, 3, 2, 1))
    bk = group_size * bkg
    # large M-tiles amortize the per-tile weight decode (VPU work comparable
    # to the MXU dot at bm=512; halved again at bm=1024)
    bm = 1024 if m >= 1024 else (512 if m >= 512 else 128)
    m_pad = _round_up(max(m, 8), bm) if m > bm else _round_up(max(m, 8), 8)
    bm_eff = min(bm, m_pad)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    grid = (m_pad // bm_eff, n // bn, k_dim // bk)
    codes_bn = bn // 2 if nibble else bn
    out = pl.pallas_call(
        functools.partial(_kernel, group=group_size, bkg=bkg,
                          bn_tiles=bn_tiles, nibble=nibble, decoder=decoder),
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
            bytes_accessed=m_pad * k_dim * 2
            + n * k_dim // (2 if nibble else 1) + m_pad * n * 4,
            transcendentals=0,
        ),
    )(x, codes, scales)
    return out[:m] if m_pad != m else out


def _packed_call(x2, codes, scales_t, *, fmt, group_size, n, k_dim, nibble,
                 force_jnp):
    usable = (
        not force_jnp
        and jax.default_backend() == "tpu"
        and fmt in _DECODERS
        and n % 128 == 0
        and k_dim % group_size == 0
    )
    if usable:
        return _packed_matmul_2d(
            x2, codes, scales_t, fmt=fmt, group_size=group_size, n=n,
            k_dim=k_dim, nibble=nibble)
    pt = P.PackedTensor(codes, scales_t.T, fmt, (n, k_dim), group_size,
                        nibble)
    w = P.dequantize(pt, dtype=x2.dtype)
    return (x2 @ w.T).astype(jnp.float32)


def packed_linear(x, pw: P.PackedTensor, *, mesh=None, parallel: str = None,
                  force_jnp: bool = False):
    """x [..., K] @ dequant(pw).T where pw encodes a [N, K] weight.

    On TPU uses the fused Pallas kernel (for supported formats / aligned
    shapes); elsewhere falls back to jnp dequant + matmul (bit-identical
    result, used by the CPU test suite).  With ``mesh`` + ``parallel``
    ("col" for mat_qkv/fc1, "row" for proj/fc2) the GEMM runs
    tensor-parallel via shard_map over tp-sharded codes/scales.
    """
    from jax.sharding import PartitionSpec as PS

    n, k_dim = pw.shape
    lead = x.shape[:-1]
    x2 = x.reshape(-1, k_dim)
    scales_t = pw.scales.astype(jnp.float32).T          # [G, N]
    call = functools.partial(
        _packed_call, fmt=pw.fmt, group_size=pw.group_size,
        nibble=pw.nibble_packed, force_jnp=force_jnp)
    out = None
    if mesh is not None and parallel is not None:
        tp = mesh.shape.get("tp", 1)
        xr = "dp" if ("dp" in mesh.axis_names
                      and x2.shape[0] % mesh.shape.get("dp", 1) == 0) \
            else None
        if tp > 1 and parallel == "col" and n % (128 * tp) == 0:
            out = jax.shard_map(
                functools.partial(call, n=n // tp, k_dim=k_dim),
                mesh=mesh,
                in_specs=(PS(xr, None), PS("tp", None), PS(None, "tp")),
                out_specs=PS(xr, "tp"),
            )(x2, pw.codes, scales_t)
        elif (tp > 1 and parallel == "row"
              and k_dim % (pw.group_size * tp) == 0):
            def fn(xs, cs, ss):
                return jax.lax.psum(
                    call(xs, cs, ss, n=n, k_dim=k_dim // tp), "tp")

            out = jax.shard_map(
                fn, mesh=mesh,
                in_specs=(PS(xr, "tp"), PS(None, "tp"), PS("tp", None)),
                out_specs=PS(xr, None),
            )(x2, pw.codes, scales_t)
    if out is None:
        out = call(x2, pw.codes, scales_t, n=n, k_dim=k_dim)
    return out.reshape(lead + (n,)).astype(x.dtype)
