"""Straight-through-estimator wrappers for quantization-aware optimization.

Equivalent of the reference's autograd.Function STE classes ``FPQuant`` /
``SymQuant`` (`learnable_transformation/learnable_transformation_fc1_fp4.py:
25-95`): forward = fake quantization, backward = identity.
"""
from __future__ import annotations

from functools import partial

import jax

from fpqvar_tpu.ops import quantizers as Q


def ste(quant_fn):
    """Wrap a fake-quant function with identity gradients."""

    def wrapped(x):
        return x + jax.lax.stop_gradient(quant_fn(x) - x)

    return wrapped


def fp_quant_ste(fmt: str = "fp_e2", group_size: int = 128):
    """STE fp-grid per-group quantizer (FPQuant equivalent)."""
    return ste(partial(Q.fake_quant_fp, fmt=fmt, granularity="per_group",
                       group_size=group_size))


def int_sym_ste(n_bits: int = 4, group_size: int = 128):
    """STE symmetric int per-group quantizer (SymQuant equivalent)."""
    return ste(partial(Q.fake_quant_int_sym, n_bits=n_bits,
                       granularity="per_group", group_size=group_size))
