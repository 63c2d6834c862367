"""Sampling utilities with explicit JAX PRNG keys.

Re-implements `models/helpers.py:6-36` (``sample_with_top_k_top_p_``,
``gumbel_softmax_with_rng``).  torch.multinomial becomes Gumbel-max via
``jax.random.categorical``; bitwise parity with torch RNG is impossible so the
target is metric-level parity (SURVEY.md §7 hard parts).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray
NEG_INF = -jnp.inf


def top_k_top_p_filter(logits: Array, top_k: int = 0, top_p: float = 0.0) -> Array:
    """Mask logits outside the top-k / nucleus top-p set with -inf.

    Matches the reference's order of operations (`helpers.py:8-15`): top-k
    first, then top-p over the already-filtered logits; ties at the k-th value
    are kept (reference removes strictly-below-threshold entries).
    """
    v = logits.shape[-1]
    if top_k > 0 and top_p > 0.0:
        # One sort serves both filters (sorts dominate the sampling stage:
        # lax.top_k on TPU is itself sort-based, so the two-filter chain
        # would sort the vocab axis twice per scale step).  Masking the
        # sorted copy below the k-th largest value is elementwise identical
        # to sorting the top-k-masked logits — ties at the k-th value
        # included — so the final filter is bit-equal to the sequential
        # reference chain.
        sorted_logits = jnp.sort(logits, axis=-1)  # ascending
        kth = sorted_logits[..., v - min(top_k, v), None]
        sorted_logits = jnp.where(sorted_logits < kth, NEG_INF, sorted_logits)
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep = cum > (1.0 - top_p)
        keep = keep.at[..., -1].set(True)  # never drop the argmax
        min_kept = jnp.min(
            jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True
        )
        return jnp.where(
            (logits < kth) | (logits < min_kept), NEG_INF, logits)
    if top_k > 0:
        kth = jax.lax.top_k(logits, min(top_k, v))[0][..., -1:]
        logits = jnp.where(logits < kth, NEG_INF, logits)
    if top_p > 0.0:
        sorted_logits = jnp.sort(logits, axis=-1)  # ascending
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep = cum > (1.0 - top_p)
        keep = keep.at[..., -1].set(True)  # never drop the argmax
        min_kept = jnp.min(
            jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True
        )
        logits = jnp.where(logits < min_kept, NEG_INF, logits)
    return logits


def sample_with_top_k_top_p(
    key, logits: Array, top_k: int = 0, top_p: float = 0.0
) -> Array:
    """Categorical sample after top-k/top-p filtering; returns int32 [...]."""
    filtered = top_k_top_p_filter(logits.astype(jnp.float32), top_k, top_p)
    return jax.random.categorical(key, filtered, axis=-1)


def gumbel_softmax(key, logits: Array, tau: float, hard: bool = False) -> Array:
    """`gumbel_softmax_with_rng` equivalent (`helpers.py:22-36`)."""
    g = jax.random.gumbel(key, logits.shape, dtype=jnp.float32)
    y_soft = jax.nn.softmax((logits.astype(jnp.float32) + g) / tau, axis=-1)
    if hard:
        idx = jnp.argmax(y_soft, axis=-1, keepdims=True)
        y_hard = jnp.zeros_like(y_soft)
        y_hard = jnp.put_along_axis(y_hard, idx, 1.0, axis=-1, inplace=False)
        return y_hard + jax.lax.stop_gradient(y_soft) - y_soft
    return y_soft
