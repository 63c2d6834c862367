"""Randomized (block-)Hadamard rotation.

Reference: `rotate_utils/hadamard_utils.py:63-99` (QuIP#-style randomized
Hadamard via an in-place butterfly) and
`rotate_utils/rotation_utils.py:69-126` (block-diagonal assembly of 128-wide
blocks).  Two reference facts shape this module:

1. Every 128-block is **identical** — the per-block re-seed is commented out
   (`rotation_utils.py:92`) and ``random_hadamard_matrix`` reseeds torch with
   the same seed on every call.  So the online activation rotation
   ``x @ Q_block`` collapses to one (…,128) x (128,128) matmul — a single
   MXU-friendly contraction instead of a C x C one.
2. The random sign vector comes from torch's CPU RNG
   (``torch.manual_seed(seed); torch.randint(0,2,(size,))*2-1``,
   `hadamard_utils.py:95-97`).  To stay artifact-compatible with the shipped
   GALT tensors (trained against seed-42 rotations) we read the signs from
   torch when available and keep the seed-42/size-128 vector as a frozen
   constant fallback.

The randomized Hadamard is ``Q = diag(s) @ H_n / sqrt(n)`` (row-sign-flipped
normalized Sylvester matrix): matmul_hadU applies the butterfly to each row of
``diag(s)``, i.e. computes ``diag(s) @ H / sqrt(n)`` for symmetric H.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np

# torch.manual_seed(42); torch.randint(0, 2, (128,)) * 2 - 1   (frozen)
_SEED42_SIGNS_128 = np.array([
    -1, 1, -1, -1, -1, 1, -1, -1, -1, 1, -1, -1, -1, -1, 1, -1,
    1, 1, 1, -1, 1, -1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
    1, 1, 1, -1, 1, -1, -1, -1, -1, -1, 1, 1, 1, 1, 1, -1,
    1, 1, -1, 1, -1, 1, -1, 1, 1, -1, -1, -1, -1, -1, -1, -1,
    -1, 1, 1, -1, 1, 1, 1, 1, -1, 1, -1, 1, 1, 1, -1, 1,
    -1, 1, -1, 1, -1, -1, 1, -1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, -1, -1, 1, 1, 1, 1, 1, 1, 1, 1, -1, 1, -1,
    1, 1, -1, 1, -1, 1, 1, -1, 1, -1, 1, -1, -1, 1, 1, -1,
], dtype=np.float64)


def is_pow2(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


@lru_cache(maxsize=None)
def sylvester_hadamard(n: int) -> np.ndarray:
    """Unnormalized symmetric Hadamard matrix of power-of-two order."""
    if not is_pow2(n):
        raise ValueError(f"sylvester_hadamard needs a power of 2, got {n}")
    h = np.array([[1.0]])
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h


def torch_signs(size: int, seed: int) -> np.ndarray:
    """Sign vector identical to the reference's torch-RNG draw."""
    if size == 128 and seed == 42:
        return _SEED42_SIGNS_128.copy()
    try:
        import torch  # local, CPU-only use; never on the TPU compute path

        torch.manual_seed(seed)
        return (
            (torch.randint(low=0, high=2, size=(size,)) * 2 - 1)
            .to(torch.float64)
            .numpy()
        )
    except ImportError:  # pragma: no cover - torch is baked into the image
        rng = np.random.default_rng(seed)
        return (rng.integers(0, 2, size) * 2 - 1).astype(np.float64)


def random_hadamard_matrix(size: int, seed: int = 42) -> np.ndarray:
    """``diag(signs) @ H / sqrt(n)`` — orthogonal randomized Hadamard.

    Equivalent to `hadamard_utils.py:92-99` for power-of-two sizes.
    """
    s = torch_signs(size, seed)
    return (s[:, None] * sylvester_hadamard(size)) / np.sqrt(size)


def block_hadamard_block(block_size: int = 128, seed: int = 42) -> np.ndarray:
    """The single 128x128 block Q_b used by every block of the block-diagonal
    rotation (see module docstring, fact 1)."""
    return random_hadamard_matrix(block_size, seed)


def block_hadamard_matrix(
    total_size: int, block_size: int = 128, seed: int = 42
) -> np.ndarray:
    """Dense block-diagonal rotation, only needed for parity tests and for
    exporting reference-layout artifacts.  Runtime code should use
    :func:`apply_block_hadamard` instead."""
    if total_size % block_size:
        raise ValueError("total_size must be divisible by block_size")
    q = block_hadamard_block(block_size, seed)
    n = total_size // block_size
    out = np.zeros((total_size, total_size), dtype=np.float64)
    for i in range(n):
        out[i * block_size:(i + 1) * block_size,
            i * block_size:(i + 1) * block_size] = q
    return out


def apply_block_hadamard(x, q_block):
    """``x @ block_diag(Q_b, ..., Q_b)`` as a single (…,b)x(b,b) contraction.

    ``x``: [..., C] with C % b == 0; ``q_block``: [b, b].
    """
    import jax.numpy as jnp

    b = q_block.shape[0]
    lead = x.shape[:-1]
    xb = x.reshape(lead + (x.shape[-1] // b, b))
    yb = jnp.einsum("...ij,jk->...ik", xb, jnp.asarray(q_block, dtype=x.dtype))
    return yb.reshape(x.shape)
