"""Native C++ host library: builds, loads, and agrees with the jnp/numpy
reference implementations."""
import jax.numpy as jnp
import numpy as np
import pytest

from fpqvar_tpu.ops import grids as G
from fpqvar_tpu.ops import packing as P
from fpqvar_tpu.ops import quantizers as Q
from fpqvar_tpu.utils import native

pytestmark = pytest.mark.quick


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


def test_write_png_batch_roundtrip(tmp_path):
    """Native PNG writer (zlib IDAT, None/Sub filters): decoded pixels must
    be exactly the input, for both smooth (Sub-filtered) and noisy
    (None-filtered) content."""
    from PIL import Image

    rng = np.random.default_rng(4)
    h, w = 40, 72
    grad = (np.outer(np.linspace(0, 1, h), np.linspace(0, 1, w))
            * 255).astype(np.uint8)
    imgs = np.stack([
        np.stack([grad, grad[::-1], np.full((h, w), 7, np.uint8)], -1),
        rng.integers(0, 256, (h, w, 3)).astype(np.uint8),
    ])
    paths = [str(tmp_path / f"img{i}.png") for i in range(2)]
    if not native.write_png_batch(imgs, paths):
        import pytest
        pytest.skip("native library unavailable")
    for i, p in enumerate(paths):
        back = np.asarray(Image.open(p))
        np.testing.assert_array_equal(back, imgs[i])


def test_write_png_batch_failure_raises(tmp_path):
    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    imgs = np.zeros((1, 8, 8, 3), np.uint8)
    import pytest
    with pytest.raises(OSError):
        native.write_png_batch(imgs, [str(tmp_path / "no/such/dir/x.png")])
