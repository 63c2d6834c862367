"""Torch-parity image resizing as precomputed separable matrices.

The VQVAE residual pyramid interpolates every scale with
``F.interpolate(mode='bicubic')`` (up) and ``mode='area'`` (down)
(`models/quant.py:187-196`).  ``jax.image.resize`` is NOT numerically
compatible (its cubic kernel uses Keys a=-0.5; torch uses A=-0.75, and torch
'area' is adaptive average pooling with *uniform* weights over an index
range, not overlap-weighted).  Any mismatch perturbs every subsequent scale's
input, so we reproduce torch exactly.

Because all resizes here are tiny and fixed (pn in {1..32} -> 16 or 32), we
precompute the (out, in) weight matrix per axis once in numpy and apply the
resize as two small matmuls — which is also the TPU-friendly formulation
(MXU contraction instead of gathers).
"""
from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

_A = -0.75  # torch's bicubic coefficient (UpSampleBicubic2d.h)


def _cubic1(t: np.ndarray) -> np.ndarray:
    # |t| <= 1
    return ((_A + 2.0) * t - (_A + 3.0)) * t * t + 1.0


def _cubic2(t: np.ndarray) -> np.ndarray:
    # 1 < |t| < 2
    return (((t - 5.0) * t + 8.0) * t - 4.0) * _A


@lru_cache(maxsize=None)
def bicubic_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) matrix M with (M @ x) == torch bicubic resize of a 1-D signal
    (align_corners=False, border-replicate tap clamping)."""
    m = np.zeros((out_size, in_size), dtype=np.float64)
    scale = in_size / out_size
    for i in range(out_size):
        src = (i + 0.5) * scale - 0.5
        x0 = int(np.floor(src))
        t = src - x0
        w = np.array([
            _cubic2(t + 1.0), _cubic1(t), _cubic1(1.0 - t), _cubic2(2.0 - t),
        ])
        for k in range(4):
            j = min(max(x0 - 1 + k, 0), in_size - 1)
            m[i, j] += w[k]
    return m.astype(np.float32)


@lru_cache(maxsize=None)
def area_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) matrix reproducing torch ``mode='area'`` ==
    adaptive_avg_pool1d: output i uniformly averages input indices
    [floor(i*in/out), ceil((i+1)*in/out))."""
    m = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        i0 = (i * in_size) // out_size
        i1 = -((-(i + 1) * in_size) // out_size)  # ceil div
        m[i, i0:i1] = 1.0 / (i1 - i0)
    return m.astype(np.float32)


def resize2d(x, out_hw: tuple, mode: str):
    """Resize [..., H, W] -> [..., out_h, out_w] with torch semantics."""
    h, w = x.shape[-2], x.shape[-1]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    mk = bicubic_matrix if mode == "bicubic" else area_matrix
    mh = jnp.asarray(mk(h, oh), dtype=x.dtype)
    mw = jnp.asarray(mk(w, ow), dtype=x.dtype)
    y = jnp.einsum("oh,...hw->...ow", mh, x)
    return jnp.einsum("pw,...ow->...op", mw, y)


def upsample2x_nearest(x):
    """[..., H, W] -> [..., 2H, 2W] nearest (Decoder Upsample2x,
    `models/basic_vae.py:22-28`)."""
    x = jnp.repeat(x, 2, axis=-2)
    return jnp.repeat(x, 2, axis=-1)
