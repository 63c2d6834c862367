"""Numerical parity of model primitives against torch equivalents.

These validate the JAX re-implementations of standard layers against
torch's semantics (eps placement, padding conventions, approximations) —
the VQVAE/VAR stacks are only as correct as these primitives."""
import pytest
import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from fpqvar_tpu.models import var as V
from fpqvar_tpu.models import vqvae as vq

pytestmark = pytest.mark.quick

RNG = np.random.default_rng(0)


def test_conv2d_same_padding():
    x = RNG.normal(size=(2, 5, 9, 9)).astype(np.float32)
    w = RNG.normal(size=(7, 5, 3, 3)).astype(np.float32)
    b = RNG.normal(size=(7,)).astype(np.float32)
    ours = np.asarray(vq.conv2d(jnp.asarray(x), {"w": jnp.asarray(w),
                                                 "b": jnp.asarray(b)}))
    theirs = F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                      torch.from_numpy(b), padding=1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)


def test_downsample2x_asymmetric_pad():
    # Downsample2x: F.pad (0,1,0,1) + stride-2 conv, padding 0
    # (`models/basic_vae.py:31-37`)
    x = RNG.normal(size=(1, 4, 8, 8)).astype(np.float32)
    w = RNG.normal(size=(4, 4, 3, 3)).astype(np.float32)
    b = np.zeros(4, np.float32)
    ours = np.asarray(vq.downsample2x(
        jnp.asarray(x), {"w": jnp.asarray(w), "b": jnp.asarray(b)}))
    xt = F.pad(torch.from_numpy(x), (0, 1, 0, 1))
    theirs = F.conv2d(xt, torch.from_numpy(w), torch.from_numpy(b),
                      stride=2).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)


def test_group_norm():
    x = RNG.normal(size=(2, 64, 5, 5)).astype(np.float32)
    g = RNG.normal(size=(64,)).astype(np.float32)
    b = RNG.normal(size=(64,)).astype(np.float32)
    ours = np.asarray(vq.group_norm(
        jnp.asarray(x), {"w": jnp.asarray(g), "b": jnp.asarray(b)},
        num_groups=32, eps=1e-6))
    theirs = F.group_norm(torch.from_numpy(x), 32, torch.from_numpy(g),
                          torch.from_numpy(b), eps=1e-6).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)


def test_layernorm_no_affine():
    x = RNG.normal(size=(3, 7, 32)).astype(np.float32)
    ours = np.asarray(V.layernorm_no_affine(jnp.asarray(x), 1e-6))
    theirs = F.layer_norm(torch.from_numpy(x), (32,), eps=1e-6).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)


def test_gelu_tanh():
    x = np.linspace(-4, 4, 101, dtype=np.float32)
    ours = np.asarray(V.gelu_tanh(jnp.asarray(x)))
    theirs = F.gelu(torch.from_numpy(x), approximate="tanh").numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-6)


def test_silu():
    x = np.linspace(-4, 4, 101, dtype=np.float32)
    ours = np.asarray(jax.nn.silu(jnp.asarray(x)))
    theirs = F.silu(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-6)


def test_attention_matches_sdpa():
    # scale=1 L2-norm attention path (`basic_var.py:211-217` slow_attn with
    # scale = self.scale = 1)
    b, h, lq, lk, c = 2, 3, 5, 9, 16
    # ours takes head-minor [B, l, H, c] layouts
    q = RNG.normal(size=(b, lq, h, c)).astype(np.float32)
    k = RNG.normal(size=(b, lk, h, c)).astype(np.float32)
    v = RNG.normal(size=(b, lk, h, c)).astype(np.float32)
    ours = np.asarray(V._attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), None))
    theirs = F.scaled_dot_product_attention(
        torch.from_numpy(q).transpose(1, 2),
        torch.from_numpy(k).transpose(1, 2),
        torch.from_numpy(v).transpose(1, 2),
        scale=1.0).transpose(1, 2).reshape(b, lq, h * c).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)


def test_l2norm_matches_f_normalize():
    x = RNG.normal(size=(4, 8)).astype(np.float32)
    x[0] *= 1e-20  # near-zero row exercises the eps clamp
    ours = np.asarray(V._l2norm(jnp.asarray(x)))
    theirs = F.normalize(torch.from_numpy(x), dim=-1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_phi_conv():
    x = RNG.normal(size=(1, 8, 6, 6)).astype(np.float32)
    w = RNG.normal(size=(8, 8, 3, 3)).astype(np.float32)
    b = RNG.normal(size=(8,)).astype(np.float32)
    ours = np.asarray(vq.phi_conv(
        jnp.asarray(x), {"w": jnp.asarray(w), "b": jnp.asarray(b)}, 0.5))
    conv = F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                    torch.from_numpy(b), padding=1)
    theirs = (torch.from_numpy(x) * 0.5 + conv * 0.5).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)
