"""Comparison-method quantizer zoo (the paper's baselines).

Re-implements the baseline methods of `search/search_fp4_format.py` and
`search/baseline/` (SURVEY.md component #13): DuQuant-style two-segment
uniform quantization, FLINT, and a clipping-strength sweep harness.  These
feed the MSE comparison studies; AFPQ / log2 / RTN-int baselines already
live in fpqvar_tpu.ops.quantizers.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Sequence

import jax.numpy as jnp
import numpy as np

from fpqvar_tpu.ops import quantizers as Q

Array = jnp.ndarray

#: FLINT 4-bit grid (`search/search_fp4_format.py:238-240`)
FLINT_GRID = np.array(
    [-10.0, -5.0, -3.75, -2.5, -1.875, -1.25, -0.625, 0.0,
     0.625, 1.25, 1.875, 2.5, 3.75, 5.0, 10.0], dtype=np.float32)


def du_quantizer(
    x: Array,
    n_bits: int = 4,
    *,
    granularity: str = "per_group",
    group_size: int = 128,
    c: float = 1.61,
    m: int = 5,
    big_k: float = 3.0,
) -> Array:
    """DuQuant-style two-segment uniform quantizer.

    Mirrors `du_quantizer_per_{token,group}` (`search_fp4_format.py:128-203`):
    per-token variant normalizes by std (c=1.67), per-group by absmax/K
    (c=1.61, the reference's "v2"); inner region |x|<=c gets step c/m, outer
    region (c, K] gets the remaining levels.
    """
    if granularity == "per_token":
        xg = x
        denom = jnp.std(x, axis=-1, keepdims=True, ddof=1)
        ungroup = lambda y: y  # noqa: E731
        c_eff = 1.67 if c == 1.61 else c
    else:
        xg = x.reshape(x.shape[:-1] + (x.shape[-1] // group_size, group_size))
        amax = jnp.max(jnp.abs(xg), axis=-1, keepdims=True)
        denom = jnp.where(amax > 0, amax / big_k, 1.0)
        ungroup = lambda y: y.reshape(x.shape)  # noqa: E731
        c_eff = c
    xn = jnp.clip(xg / denom, -big_k, big_k)
    s1 = c_eff / m
    n_outer = 2 ** (n_bits - 1) - 1 - m
    s2 = (big_k - c_eff) / n_outer
    inner = jnp.clip(jnp.round(xn / s1), -m, m) * s1
    sign = jnp.sign(xn)
    outer = sign * (c_eff + jnp.clip(
        jnp.round((jnp.abs(xn) - c_eff) / s2), 0, n_outer) * s2)
    out = jnp.where(jnp.abs(xn) <= c_eff, inner, outer) * denom
    return ungroup(out)


def flint_quant(x: Array, *, granularity: str = "per_token",
                group_size: int = 128) -> Array:
    """FLINT 4-bit grid quantization (`search_fp4_format.py:236-250`)."""
    gmax = float(np.max(np.abs(FLINT_GRID)))
    if granularity == "per_group":
        xg = x.reshape(x.shape[:-1] + (x.shape[-1] // group_size, group_size))
    else:
        xg = x
    amax = jnp.max(jnp.abs(xg), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / gmax, 1.0)
    out = Q.snap_to_grid(xg / scale, FLINT_GRID) * scale
    return out.reshape(x.shape)


def clipping_strength_sweep(
    x: np.ndarray,
    w: np.ndarray,
    fmt: str = "fp_e1m2_neg_e2m1_pos",
    strengths: Sequence[float] = tuple(np.arange(0.5, 1.01, 0.05)),
    group_size: int = 128,
) -> Dict[float, float]:
    """Clipping-strength search for the dual-grid fc2 quantizer
    (`search/search_fp_format_baseline_2.py:489+`): output MSE per clamp
    strength; caller picks the argmin."""
    xj = jnp.asarray(x, jnp.float32)
    wj = jnp.asarray(w, jnp.float32)
    ref = xj @ wj.T
    out = {}
    for s in strengths:
        qx = Q.fake_quant_dual(xj, fmt, group_size=group_size,
                               clipping_strength=float(s))
        out[float(s)] = float(jnp.mean((ref - qx @ wj.T) ** 2))
    return out


#: baseline registry for the MSE comparison harness
BASELINES = {
    "du": partial(du_quantizer, granularity="per_group"),
    "du_per_token": partial(du_quantizer, granularity="per_token"),
    "flint": flint_quant,
    "fp4_afpq": lambda x, n_bits=4, **kw: Q.fake_quant_dual(
        x, "fp4_afpq", **kw),
    "log2": lambda x, n_bits=4, **kw: Q.fake_quant_log2(x, n_bits, **kw),
    "int_rtn": lambda x, n_bits=4, **kw: Q.fake_quant_int_sym(
        x, n_bits, **kw),
}


def rotated_matmul_mse(
    x: Array, w: Array, quantize, rotation: Array = None,
) -> float:
    """MSE(x W^T, Q(xR) Q(WR)^T) — one cell of the rotation-aware baseline
    study (`search/baseline/search_fp6_format_for_activation_rotate.py:
    587-600`: quantize the ROTATED pair, compare against the exact
    unrotated product).  ``rotation=None`` gives the plain sweep."""
    ref = x @ w.T
    if rotation is not None:
        r = rotation.astype(x.dtype)
        x = x @ r
        w = w @ r
    qx = quantize(x)
    qw = quantize(w)
    return float(jnp.mean((ref - qx @ qw.T) ** 2))


#: method registry for the rotation-aware sweep: the paper's fp formats plus
#: the baseline zoo, all as x -> quantized(x) closures
def _sweep_methods(n_bits: int, group_size: int):
    gran = dict(granularity="per_group", group_size=group_size)
    methods = {
        "int_rtn": partial(Q.fake_quant_int_sym, n_bits=n_bits, **gran),
        "du": partial(du_quantizer, n_bits=n_bits, **gran),
        "flint": partial(flint_quant, granularity="per_group",
                         group_size=group_size),
    }
    if n_bits == 4:
        for f in ("fp_e1", "fp_e2", "fp_e3"):
            methods[f] = partial(Q.fake_quant_fp, fmt=f, **gran)
        methods["fp4_afpq"] = partial(Q.fake_quant_dual, fmt="fp4_afpq",
                                      **gran)
    else:
        for f in ("fp6_e2m3", "fp6_e3m2"):
            methods[f] = partial(Q.fake_quant_fp, fmt=f, **gran)
    return methods


def rotation_aware_sweep(
    acts: np.ndarray,           # [N, C] calibration activations
    weight: np.ndarray,         # [out, C]
    n_bits: int = 4,
    group_size: int = 128,
    block_rotate: bool = True,
    rotation_seed: int = 42,
) -> Dict[str, Dict[str, float]]:
    """The `--block_rotate` baseline comparison: per method, matmul-output
    MSE with and without Hadamard rotation (block-diagonal or full-size,
    matching `rotate_utils`).  Reproduces the study the reference's
    `search/baseline/*_for_activation_rotate.py` scripts run per block."""
    from fpqvar_tpu.ops import hadamard as H

    x = jnp.asarray(acts, jnp.float32)
    w = jnp.asarray(weight, jnp.float32)
    c = x.shape[-1]
    if block_rotate:
        qb = jnp.asarray(H.block_hadamard_block(128, rotation_seed),
                         jnp.float32)
        rot = jnp.kron(jnp.eye(c // 128, dtype=jnp.float32), qb)
    else:
        rot = jnp.asarray(H.random_hadamard_matrix(c, rotation_seed),
                          jnp.float32)
    out: Dict[str, Dict[str, float]] = {}
    for name, fn in _sweep_methods(n_bits, group_size).items():
        out[name] = {
            "plain": rotated_matmul_mse(x, w, fn),
            "rotated": rotated_matmul_mse(x, w, fn, rot),
        }
    return out


def compare_baselines(
    x: np.ndarray, n_bits: int = 4, group_size: int = 128
) -> Dict[str, float]:
    """Per-method reconstruction MSE on a tensor — the numerical study the
    `search/baseline/` scripts perform."""
    xj = jnp.asarray(x, jnp.float32)
    out = {}
    for name, fn in BASELINES.items():
        try:
            if name == "du_per_token" or name == "flint":
                q = fn(xj)
            else:
                q = fn(xj, n_bits=n_bits, group_size=group_size)
            out[name] = float(jnp.mean((xj - q) ** 2))
        except TypeError:
            q = fn(xj)
            out[name] = float(jnp.mean((xj - q) ** 2))
    return out
