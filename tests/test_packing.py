"""Packed-code path: pack/dequant must agree bit-exactly with the fake-quant
path, and the arithmetic decoders must reproduce the grids."""
import pytest
import jax.numpy as jnp
import numpy as np

from fpqvar_tpu.ops import grids as G
from fpqvar_tpu.ops import packing as P
from fpqvar_tpu.ops import quantizers as Q

pytestmark = pytest.mark.quick


def test_decode_fp4_e2m1_matches_grid():
    codes = jnp.arange(15)
    np.testing.assert_allclose(
        np.asarray(P.decode_fp4_e2m1(codes)), G.FP4_E2M1, atol=0)


def test_decode_fp6_e2m3_matches_grid():
    codes = jnp.arange(63)
    np.testing.assert_allclose(
        np.asarray(P.decode_fp6_e2m3(codes)), G.FP6_E2M3, atol=0)


def test_pack_dequant_equals_fake_quant():
    rng = np.random.default_rng(0)
    for fmt in ("fp_e2", "fp_e1", "fp_e3", "fp6_e2m3", "fp6_e3m2"):
        x = jnp.array(rng.normal(size=(16, 256)).astype(np.float32)) * 3
        fake = Q.fake_quant_fp(x, fmt, granularity="per_group", group_size=128)
        packed = P.pack(x, fmt, group_size=128)
        deq = P.dequantize(packed)
        np.testing.assert_allclose(np.asarray(deq), np.asarray(fake),
                                   rtol=1e-6, err_msg=fmt)


def test_nibble_packing_size():
    x = jnp.array(np.random.default_rng(1).normal(size=(256, 256)),
                  dtype=jnp.float32)
    p4 = P.pack(x, "fp_e2")
    assert p4.nibble_packed
    assert p4.codes.shape == (128, 256)     # two row-codes per byte
    assert p4.codes.dtype == jnp.int8
    p6 = P.pack(x, "fp6_e2m3")
    assert not p6.nibble_packed
    assert p6.codes.shape == (256, 256)     # one code per byte
    assert p6.scales.shape == (256, 2)
    # rows not divisible by 128 -> byte-per-code fallback, still roundtrips
    x8 = x[:8]
    p8 = P.pack(x8, "fp_e2")
    assert not p8.nibble_packed
    np.testing.assert_allclose(
        np.asarray(P.dequantize(p8)),
        np.asarray(Q.fake_quant_fp(x8, "fp_e2")), rtol=1e-6)


def test_packed_tensor_is_pytree():
    import jax

    x = jnp.ones((4, 128))
    p = P.pack(x, "fp_e2")
    leaves = jax.tree_util.tree_leaves(p)
    assert len(leaves) == 2
    p2 = jax.tree_util.tree_map(lambda a: a, p)
    assert p2.fmt == p.fmt and p2.shape == p.shape
