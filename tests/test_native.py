"""Native C++ host library: builds, loads, and agrees with the jnp/numpy
reference implementations."""
import jax.numpy as jnp
import numpy as np
import pytest

from fpqvar_tpu.ops import grids as G
from fpqvar_tpu.ops import packing as P
from fpqvar_tpu.ops import quantizers as Q
from fpqvar_tpu.utils import native


def test_native_builds_and_loads():
    assert native.available(), "g++ build of libfpq_native.so failed"


def test_snap_matches_jnp():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4096,)).astype(np.float32) * 4
    for name, g in G.GRIDS.items():
        ours = native.snap_to_grid(x, g)
        ref = np.asarray(Q.snap_to_grid(jnp.asarray(x), g))
        np.testing.assert_array_equal(ours, ref, err_msg=name)


def test_snap_tie_semantics():
    g = G.FP4_E2M1
    out = native.snap_to_grid(np.float32([0.25, -0.25, 2.5]), g)
    np.testing.assert_array_equal(out, [0.5, 0.0, 3.0])


def test_encode_matches_jnp():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2048,)).astype(np.float32)
    ours = native.encode_to_grid(x, G.FP4_E2M1)
    ref = np.asarray(P.encode_to_grid(jnp.asarray(x), G.FP4_E2M1))
    np.testing.assert_array_equal(ours, ref)


def test_pack_rows_matches_packing():
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(256, 256)), jnp.float32)
    pt = P.pack(w, "fp_e2")
    codes = np.asarray(P.unpack_codes(pt))
    ours = native.pack_rows(codes)
    np.testing.assert_array_equal(ours, np.asarray(pt.codes))


def test_images_to_uint8():
    rng = np.random.default_rng(3)
    imgs = rng.random((2, 3, 16, 16)).astype(np.float32)
    ours = native.images_to_uint8(imgs)
    ref = np.clip(np.transpose(imgs, (0, 2, 3, 1)) * 255.0, 0,
                  255).astype(np.uint8)
    np.testing.assert_array_equal(ours, ref)
