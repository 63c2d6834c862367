"""Pure-jnp fake-quantization library.

Re-implements (TPU-idiomatically, vectorized, jit-friendly) every quantizer of
the reference's quantization math layer — `models_fp_quant/quant_utils.py`
(FP grids, dual-grid asymmetric fc2 formats, neg-reverse, AFPQ, log2, int
sym/asym at per-token / per-tensor / per-group granularity) and
`models_quant/quant_utils.py` (pure INT path).

Design notes (vs the reference):

- Nearest-grid snap is a vectorized ``searchsorted`` over grid midpoints
  instead of the reference's brute-force O(|grid|) CUDA scan
  (`quant/quant_kernel.cu:29-36`).  Tie behavior matches the CUDA kernel: an
  exact midpoint snaps to the *larger* grid value (the kernel's ``<=`` at
  `quant_kernel.cu:31` makes the last-scanned = larger entry win on ties).
- All-zero groups: the reference divides by a zero scale producing NaN/0*0
  artifacts that happen to cancel; we guard the scale with
  ``where(absmax > 0, absmax/gmax, 1)`` so outputs are exactly 0.
- Everything is out-of-place and differentiable-through via the STE wrappers
  in :mod:`fpqvar_tpu.quantize.ste` (the reference's in-place torch ops have
  no autograd path; GALT training there uses separate STE classes).

Fake-quant means: output is a dequantized full-precision tensor; matmuls stay
dense.  The packed real-quant path lives in :mod:`fpqvar_tpu.ops.packing` and
:mod:`fpqvar_tpu.ops.pallas`.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from fpqvar_tpu.ops import grids as G

Array = jnp.ndarray


# ---------------------------------------------------------------------------
# Core helpers
# ---------------------------------------------------------------------------

def snap_to_grid(x: Array, grid: np.ndarray | Array) -> Array:
    """Map every element of ``x`` to the nearest value of a sorted grid.

    Equivalent of `quant_cuda.quant` (`quant/quant.cpp:27-29`) and of the
    broadcast-argmin `quantize_to_nearest_grid`
    (`models_fp_quant/quant_utils.py:208-229`).  Ties snap to the larger grid
    value (CUDA-kernel semantics, see module docstring).
    """
    g = np.asarray(grid, dtype=np.float32)
    mids = (g[1:] + g[:-1]) * 0.5
    deltas = g[1:] - g[:-1]
    # Gather-free cumulative-delta formulation, unrolled over the (static,
    # <=62-entry) grid:
    #   snapped = grid[0] + sum_i deltas[i] * [x >= mids[i]]
    # (x == mid counts as >= -> snaps to the larger value, the CUDA `<=`
    # tie rule, quant_kernel.cu:31).  TPU gathers are scalar-slow and both
    # searchsorted lowerings (binary search / broadcasted extra dim) cost
    # orders of magnitude more than these |grid|-1 fused scalar-broadcast
    # compare-multiply-adds, which stay in x's own layout on the VPU.
    xf = x.astype(jnp.float32)
    out = jnp.full(x.shape, g[0], jnp.float32)
    for m, d in zip(mids.tolist(), deltas.tolist()):
        out = out + jnp.where(xf >= m, jnp.float32(d), jnp.float32(0))
    return out.astype(x.dtype)


def _group_reshape(x: Array, group_size: int):
    if x.shape[-1] % group_size:
        raise ValueError(
            f"last dim {x.shape[-1]} not divisible by group_size {group_size}"
        )
    return x.reshape(x.shape[:-1] + (x.shape[-1] // group_size, group_size))


def _safe_scale(absmax: Array, gmax: float) -> Array:
    return jnp.where(absmax > 0, absmax / gmax, jnp.ones_like(absmax))


def _axis_absmax(x: Array, granularity: str, group_size: int):
    """Returns (x_grouped, absmax, ungroup_fn)."""
    if granularity == "per_tensor":
        return x, jnp.max(jnp.abs(x)), lambda y: y
    if granularity in ("per_token", "per_channel"):
        # per_token == reduce over the last dim; per_channel is the same
        # reduction applied to a weight's input dim (reference
        # quantize_weight_per_channel_sym, quant_utils.py:11-18).
        return x, jnp.max(jnp.abs(x), axis=-1, keepdims=True), lambda y: y
    if granularity == "per_group":
        xg = _group_reshape(x, group_size)
        return (
            xg,
            jnp.max(jnp.abs(xg), axis=-1, keepdims=True),
            lambda y: y.reshape(x.shape),
        )
    raise ValueError(f"unknown granularity {granularity!r}")


# ---------------------------------------------------------------------------
# FP grid quantizers (single grid)
# ---------------------------------------------------------------------------

def fake_quant_fp(
    x: Array,
    fmt: str,
    *,
    granularity: str = "per_group",
    group_size: int = 128,
    clip_abs: Optional[float] = None,
) -> Array:
    """absmax-scaled nearest-grid fake quantization.

    Mirrors ``fp_quant_{e1,e2,e3}_per_{token,group}[_cuda]`` and
    ``fp6_quant_{e2m3,e3m2}_per_{token,group}_cuda``
    (`models_fp_quant/quant_utils.py:236-377,584-655`):
    ``scale = absmax(x)/max(grid)``; snap ``x/scale``; multiply back.

    ``clip_abs`` reproduces the hard ``clamp(x, -3, 3)`` present in the pure
    Python per-token fp4 variants (`quant_utils.py:240,288,336`) but absent
    from the CUDA per-group variants used by the headline configs.
    """
    grid = G.GRIDS[fmt]
    gmax = float(np.max(np.abs(grid)))
    if clip_abs is not None:
        x = jnp.clip(x, -clip_abs, clip_abs)
    xg, absmax, ungroup = _axis_absmax(x, granularity, group_size)
    scale = _safe_scale(absmax, gmax)
    q = snap_to_grid(xg / scale, grid)
    return ungroup(q * scale)


# ---------------------------------------------------------------------------
# Dual-grid asymmetric quantizers (fc2 / AFPQ family)
# ---------------------------------------------------------------------------

def fake_quant_dual(
    x: Array,
    fmt: str,
    *,
    granularity: str = "per_group",
    group_size: int = 128,
    clipping_strength: Optional[float] = None,
) -> Array:
    """Sign-split dual-grid quantization with independent neg/pos scales.

    Mirrors ``fp_quant_e1m2_neg_e2m1_pos_per_group[_cuda]``
    (`quant_utils.py:380-451`), ``fp4_afpq_per_group_cuda`` (`:498-535`) and
    ``fp6_quant_int_neg_e2m3_pos_per_{group,token}_cuda`` (`:658-727`):

    - negatives (x <= 0) scaled by ``absmax(neg)/|min(neg_grid)|`` and snapped
      on the negative grid; positives likewise on the positive grid;
    - outputs recombined as ``q_neg*scale_neg + q_pos*scale_pos`` (each half
      snaps the other half's zeros to 0 so the sum is exact);
    - optional ``clipping_strength`` pre-clamps at
      ``strength * absmax(whole tensor)`` (`quant_utils.py:386-387`).
    """
    neg_grid, pos_grid = G.DUAL_GRIDS[fmt]
    ngmax = float(np.max(np.abs(neg_grid)))
    pgmax = float(np.max(np.abs(pos_grid)))
    if clipping_strength is not None:
        cv = clipping_strength * jnp.max(jnp.abs(x))
        x = jnp.clip(x, -cv, cv)
    xg, _, ungroup = _axis_absmax(x, granularity, group_size)
    x_neg = jnp.where(xg <= 0, xg, 0.0)
    x_pos = jnp.where(xg > 0, xg, 0.0)
    if granularity == "per_tensor":
        amax_n = jnp.max(jnp.abs(x_neg))
        amax_p = jnp.max(jnp.abs(x_pos))
    else:
        amax_n = jnp.max(jnp.abs(x_neg), axis=-1, keepdims=True)
        amax_p = jnp.max(jnp.abs(x_pos), axis=-1, keepdims=True)
    scale_n = _safe_scale(amax_n, ngmax)
    scale_p = _safe_scale(amax_p, pgmax)
    q_neg = snap_to_grid(x_neg / scale_n, neg_grid)
    q_pos = snap_to_grid(x_pos / scale_p, pos_grid)
    return ungroup(q_neg * scale_n + q_pos * scale_p)


def fake_quant_neg_reverse(
    x: Array, *, group_size: int = 128
) -> Array:
    """Shift-negatives-positive trick on a single e2m1 grid.

    Mirrors ``fp_neg_reverse_quant_per_group_cuda`` (`quant_utils.py:454-495`):
    negatives are shifted by ``|min(group)|`` into [0, ...], quantized on the
    full e2m1 grid with their own scale, then shifted back.
    """
    grid = G.FP4_E2M1
    gmax = float(np.max(np.abs(grid)))
    xg = _group_reshape(x, group_size)
    x_min_abs = jnp.abs(jnp.min(xg, axis=-1, keepdims=True))
    x_neg = jnp.where(xg <= 0, xg, 0.0)
    x_pos = jnp.where(xg > 0, xg, 0.0)
    x_neg_rev = x_neg + x_min_abs
    scale_nr = _safe_scale(jnp.max(jnp.abs(x_neg_rev), axis=-1, keepdims=True), gmax)
    scale_p = _safe_scale(jnp.max(jnp.abs(x_pos), axis=-1, keepdims=True), gmax)
    q_nr = snap_to_grid(x_neg_rev / scale_nr, grid)
    q_p = snap_to_grid(x_pos / scale_p, grid)
    out = (q_nr * scale_nr - x_min_abs) + q_p * scale_p
    return out.reshape(x.shape)


# ---------------------------------------------------------------------------
# Linear INT quantizers
# ---------------------------------------------------------------------------

def fake_quant_int_sym(
    x: Array,
    n_bits: int,
    *,
    granularity: str = "per_token",
    group_size: int = 128,
    scale_eps: float = 1e-5,
) -> Array:
    """Symmetric linear quantization.

    Mirrors ``quantize_weight_per_{channel,tensor,group}_sym`` and
    ``quantize_activation_per_{token,tensor,group}_sym``
    (`quant_utils.py:11-43,47-53,82-91,123-130`): ``scale = clamp(absmax,
    1e-5)/q_max``; round; clamp to [q_min, q_max]; rescale.
    """
    q_max = 2 ** (n_bits - 1) - 1
    q_min = -(2 ** (n_bits - 1))
    xg, absmax, ungroup = _axis_absmax(x, granularity, group_size)
    scale = jnp.maximum(absmax, scale_eps) / q_max
    q = jnp.clip(jnp.round(xg / scale), q_min, q_max)
    return ungroup(q * scale)


def fake_quant_int_asym(
    x: Array,
    n_bits: int,
    *,
    granularity: str = "per_token",
    group_size: int = 128,
    scale_eps: float = 1e-5,
) -> Array:
    """Asymmetric linear quantization with zero point.

    Mirrors ``quantize_activation_per_{token,tensor,group}_asymmetric``
    (`quant_utils.py:57-78,94-119,133-154`).
    """
    q_max = 2 ** (n_bits - 1) - 1
    q_min = -(2 ** (n_bits - 1))
    xg, _, ungroup = _axis_absmax(x, granularity, group_size)
    if granularity == "per_tensor":
        t_min, t_max = jnp.min(xg), jnp.max(xg)
    else:
        t_min = jnp.min(xg, axis=-1, keepdims=True)
        t_max = jnp.max(xg, axis=-1, keepdims=True)
    scale = jnp.maximum(t_max - t_min, scale_eps) / (q_max - q_min)
    zp = jnp.round(q_min - t_min / scale)
    q = jnp.clip(jnp.round(xg / scale) + zp, q_min, q_max)
    return ungroup((q - zp) * scale)


def fake_quant_log2(
    x: Array,
    n_bits: int,
    *,
    granularity: str = "per_token",
    group_size: int = 128,
) -> Array:
    """Asymmetric quantization of log2(|x|) with sign restore.

    Mirrors ``log2_quant_per_{token,group}_asym`` (`quant_utils.py:157-205`).
    Note the reference clamps the scale *after* dividing (reverse of the int
    path); preserved here.
    """
    q_max = 2 ** (n_bits - 1) - 1
    q_min = -(2 ** (n_bits - 1))
    xg, _, ungroup = _axis_absmax(x, granularity, group_size)
    zero_mask = xg == 0
    sign = jnp.sign(xg)
    logx = jnp.log2(jnp.where(zero_mask, 1.0, jnp.abs(xg)))
    lmax = jnp.max(logx, axis=-1, keepdims=True)
    lmin = jnp.min(logx, axis=-1, keepdims=True)
    scale = jnp.maximum((lmax - lmin) / (q_max - q_min), 1e-5)
    zp = jnp.round(q_min - lmin / scale)
    ldq = (jnp.clip(jnp.round(logx / scale) + zp, q_min, q_max) - zp) * scale
    out = jnp.where(zero_mask, 0.0, jnp.exp2(ldq) * sign)
    return ungroup(out)


# ---------------------------------------------------------------------------
# KV-cache quantizers
# ---------------------------------------------------------------------------

def fake_quant_kv(x: Array, qcfg) -> Array:
    """Quantize a K or V cache tensor [..., head_dim].

    kv_bit=6 -> per-token fp6 e2m3 (reference
    `models_fp_quant_transform_rotate/basic_var.py:194-195`); kv_bit=4 ->
    per-group(128) fp4 e2m1 (`:197-198`); int fallback mirrors
    ``quantize_KV_per_token`` (`:88-98`, f32 upcast + per-last-dim absmax).
    """
    fmt = qcfg.resolved_kv_format()
    if fmt == "int_sym":
        return fake_quant_int_sym(
            x.astype(jnp.float32), qcfg.kv_bit, granularity="per_token"
        ).astype(x.dtype)
    if fmt in G.DUAL_GRIDS:
        return fake_quant_dual(x, fmt, granularity="per_token")
    gran = "per_group" if fmt in ("fp_e1", "fp_e2", "fp_e3") else "per_token"
    if gran == "per_group" and qcfg.kv_ref_grouping:
        # reference-compat fp4 grouping: the reference flattens its
        # head-major [B, H, L, c] cache to (-1, 128)
        # (`fp_quant_e2_per_group_cuda`, `quant_utils.py:313-330`), so a
        # scale group spans 2 consecutive TOKENS of one head at c=64.
        # The model passes token-major [..., T, H, c] (models/var.py
        # `_q_merged`): swap to head-major before the flat reshape so the
        # element order — and therefore every group — matches the
        # reference bit-wise.  Requires total elements % 128 == 0 (the
        # reference has the same constraint).
        x_hm = jnp.swapaxes(x, -3, -2)             # [..., H, T, c]
        flat = x_hm.reshape(-1, qcfg.group_size)
        out = fake_quant_fp(flat, fmt, granularity="per_group",
                            group_size=qcfg.group_size)
        return jnp.swapaxes(out.reshape(x_hm.shape), -3, -2)
    # fp4 KV grouping (default): head_dim is 64 (< default 128); the
    # reference flattens [B,H,L,c] and groups by 128 across heads/tokens.
    # We group per 64-wide head_dim rows instead, which is both saner and
    # shardable (see kv_ref_grouping for the exact-compat mode).
    gs = min(qcfg.group_size, x.shape[-1])
    return fake_quant_fp(x, fmt, granularity=gran, group_size=gs)


# ---------------------------------------------------------------------------
# Registry: format name -> activation quantizer callable
# ---------------------------------------------------------------------------

def make_act_quantizer(
    fmt: str,
    n_bits: int,
    *,
    granularity: str = "per_group",
    group_size: int = 128,
    symmetric: bool = False,
) -> Callable[[Array], Array]:
    """Build an activation quantizer, mirroring the dispatch tables in
    ``QuantizedLinear.__init__`` / ``QuantizedLinear_fc2.__init__``
    (`quant_utils.py:777-827,1027-1055`)."""
    if fmt in G.GRIDS:
        # per-token *python* fp4 variants carry a clamp(-3,3); the per-group
        # CUDA variants do not (quant_utils.py:264-377).
        clip = 3.0 if (granularity == "per_token" and fmt.startswith("fp_e")) else None
        return partial(
            fake_quant_fp, fmt=fmt, granularity=granularity,
            group_size=group_size, clip_abs=clip,
        )
    if fmt in G.DUAL_GRIDS:
        return partial(
            fake_quant_dual, fmt=fmt, granularity=granularity,
            group_size=group_size,
        )
    if fmt == "fp_neg_reverse_quant":
        return partial(fake_quant_neg_reverse, group_size=group_size)
    if fmt == "log2":
        return partial(
            fake_quant_log2, n_bits=n_bits, granularity=granularity,
            group_size=group_size,
        )
    if fmt == "int_sym" or (fmt == "int" and symmetric):
        return partial(
            fake_quant_int_sym, n_bits=n_bits, granularity=granularity,
            group_size=group_size,
        )
    if fmt in ("int_asym", "int"):
        return partial(
            fake_quant_int_asym, n_bits=n_bits, granularity=granularity,
            group_size=group_size,
        )
    raise ValueError(f"unknown activation format {fmt!r}")


def make_weight_quantizer(
    fmt: str,
    n_bits: int,
    *,
    granularity: str = "per_group",
    group_size: int = 128,
) -> Callable[[Array], Array]:
    """Weight quantizer dispatch, mirroring ``QuantizedLinear.from_float``
    (`quant_utils.py:852-941`).  per_channel FP uses the per-token grid code
    path (which includes the clamp(-3,3) — a no-op for trained weights)."""
    if fmt in G.GRIDS:
        clip = 3.0 if (granularity == "per_channel" and fmt.startswith("fp_e")) else None
        gran = "per_token" if granularity == "per_channel" else granularity
        return partial(
            fake_quant_fp, fmt=fmt, granularity=gran, group_size=group_size,
            clip_abs=clip,
        )
    if fmt in ("int_sym", "int"):
        gran = "per_token" if granularity == "per_channel" else granularity
        return partial(
            fake_quant_int_sym, n_bits=n_bits, granularity=gran,
            group_size=group_size,
        )
    raise ValueError(f"unknown weight format {fmt!r}")
