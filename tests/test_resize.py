"""Torch-parity tests for the resize operators.

The VQVAE residual pyramid depends on exact bicubic (A=-0.75) and
adaptive-area semantics (`models/quant.py:187-196`); any mismatch perturbs
every scale's input (SURVEY.md §7 hard parts).  Verified here directly
against torch.nn.functional.interpolate on every (in, out) pair both patch
schedules use."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from fpqvar_tpu.config import PATCH_NUMS_256, PATCH_NUMS_512
from fpqvar_tpu.ops.resize import (
    area_matrix, bicubic_matrix, resize2d, upsample2x_nearest)

pytestmark = pytest.mark.quick


def _pairs():
    pairs = set()
    for pns in (PATCH_NUMS_256, PATCH_NUMS_512):
        hw = pns[-1]
        for pn in pns[:-1]:
            pairs.add((pn, hw, "bicubic"))   # upsample h to full res
            pairs.add((hw, pn, "area"))      # downsample f_hat to next scale
    return sorted(pairs)


@pytest.mark.parametrize("in_size,out_size,mode", _pairs())
def test_resize2d_matches_torch(in_size, out_size, mode):
    rng = np.random.default_rng(in_size * 100 + out_size)
    x = rng.normal(size=(2, 3, in_size, in_size)).astype(np.float32)
    ours = np.asarray(resize2d(jnp.asarray(x), (out_size, out_size), mode))
    theirs = F.interpolate(
        torch.from_numpy(x), size=(out_size, out_size), mode=mode).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)


def test_bicubic_matrix_rows_sum_to_one():
    m = bicubic_matrix(5, 16)
    np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)


def test_area_matrix_rows_sum_to_one():
    m = area_matrix(16, 10)
    np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)


def test_upsample2x_nearest_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 4, 7, 7)).astype(np.float32)
    ours = np.asarray(upsample2x_nearest(jnp.asarray(x)))
    theirs = F.interpolate(torch.from_numpy(x), scale_factor=2,
                           mode="nearest").numpy()
    np.testing.assert_array_equal(ours, theirs)
