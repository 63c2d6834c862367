"""Unit tests for the fake-quant math core against closed-form expectations
and the reference's documented semantics."""
import jax.numpy as jnp
import numpy as np
import pytest

from fpqvar_tpu.config import QuantConfig
from fpqvar_tpu.ops import grids as G
from fpqvar_tpu.ops import quantizers as Q

pytestmark = pytest.mark.quick


def test_snap_basic():
    g = G.FP4_E2M1
    x = jnp.array([0.0, 0.49, 0.51, 5.9, 100.0, -100.0, -1.24, 1.26])
    out = np.asarray(Q.snap_to_grid(x, g))
    np.testing.assert_allclose(out, [0.0, 0.5, 0.5, 6.0, 6.0, -6.0, -1.0, 1.5])


def test_snap_tie_goes_up():
    # CUDA kernel `<=` semantics: midpoint ties snap to the larger value
    # (quant_kernel.cu:31).
    g = G.FP4_E2M1
    out = np.asarray(Q.snap_to_grid(jnp.array([0.25, -0.25, 2.5, 1.25]), g))
    np.testing.assert_allclose(out, [0.5, 0.0, 3.0, 1.5])


def test_fp_quant_scale_is_absmax_over_gridmax():
    # one group of 128; absmax 12 -> scale 2 on e2m1 (gridmax 6)
    x = np.zeros(128, np.float32)
    x[0] = 12.0
    x[1] = 1.0   # 1.0/2 = 0.5 -> snaps to 0.5 -> 1.0 exactly
    x[2] = 1.3   # 0.65 -> snaps to 0.5 -> 1.0
    out = np.asarray(Q.fake_quant_fp(jnp.array(x), "fp_e2"))
    assert out[0] == 12.0
    assert out[1] == 1.0
    assert out[2] == 1.0
    np.testing.assert_array_equal(out[3:], 0.0)


def test_fp_quant_all_zero_group_stays_zero():
    x = jnp.zeros((4, 128))
    out = np.asarray(Q.fake_quant_fp(x, "fp_e2"))
    assert np.all(out == 0) and not np.any(np.isnan(out))


def test_fp_quant_per_token_vs_group():
    rng = np.random.default_rng(0)
    x = jnp.array(rng.normal(size=(8, 256)).astype(np.float32))
    pt = Q.fake_quant_fp(x, "fp6_e2m3", granularity="per_token")
    pg = Q.fake_quant_fp(x, "fp6_e2m3", granularity="per_group", group_size=128)
    # finer granularity (group) should have <= error than per-token on average
    err_pt = float(jnp.mean((pt - x) ** 2))
    err_pg = float(jnp.mean((pg - x) ** 2))
    assert err_pg <= err_pt * 1.05


def test_dual_grid_fc2():
    # negatives on e1m2 grid (max 1.75), positives on e2m1 pos grid (max 6)
    x = np.zeros(128, np.float32)
    x[0] = -0.35   # scale_neg = 0.35/1.75 = 0.2 -> -1.75*0.2 = -0.35 exact
    x[1] = -0.10   # -0.5 on grid * 0.2 = -0.1 exact
    x[2] = 3.0     # scale_pos = 3/6 = 0.5 -> 6*0.5 = 3 exact
    x[3] = 0.74    # 1.48 -> snaps 1.5 -> 0.75
    out = np.asarray(Q.fake_quant_dual(jnp.array(x), "fp_e1m2_neg_e2m1_pos"))
    np.testing.assert_allclose(out[:4], [-0.35, -0.1, 3.0, 0.75], rtol=1e-6)
    np.testing.assert_array_equal(out[4:], 0.0)


def test_dual_grid_clipping_strength():
    x = np.zeros(128, np.float32)
    x[0] = 10.0
    x[1] = -8.0
    out = np.asarray(
        Q.fake_quant_dual(jnp.array(x), "fp_e1m2_neg_e2m1_pos",
                          clipping_strength=0.5))
    # clip value = 0.5 * 10 = 5 -> pos max 5, neg min -5
    assert out[0] == 5.0
    assert out[1] == -5.0


def test_neg_reverse_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.array(rng.normal(size=(2, 128)).astype(np.float32))
    out = Q.fake_quant_neg_reverse(x)
    assert out.shape == x.shape
    # reconstruction error bounded by largest grid gap * scale
    assert float(jnp.max(jnp.abs(out - x))) < 1.5


def test_int_sym_matches_closed_form():
    x = jnp.array([[1.0, -0.5, 0.25, 127.0] + [0.0] * 124])
    out = np.asarray(Q.fake_quant_int_sym(x, 8, granularity="per_token"))
    # scale = 127/127 = 1 -> values round to integers
    np.testing.assert_allclose(out[0, :4], [1.0, -0.5 * 0, 0.0, 127.0][0:4],
                               atol=0.51)
    assert out[0, 3] == 127.0


def test_int_asym_zero_point():
    # all-positive tensor: asymmetric uses full range
    x = jnp.linspace(0.0, 1.0, 128).reshape(1, 128)
    out_sym = Q.fake_quant_int_sym(x, 4, granularity="per_token")
    out_asym = Q.fake_quant_int_asym(x, 4, granularity="per_token")
    err_sym = float(jnp.mean((out_sym - x) ** 2))
    err_asym = float(jnp.mean((out_asym - x) ** 2))
    assert err_asym < err_sym


def test_log2_preserves_zero_and_sign():
    x = jnp.array([[0.0, -4.0, 4.0, 0.5] + [1.0] * 124])
    out = np.asarray(Q.fake_quant_log2(x, 4, granularity="per_token"))
    assert out[0, 0] == 0.0
    assert out[0, 1] < 0 < out[0, 2]


def test_kv_quant_dispatch():
    qc6 = QuantConfig(enabled=True, kv_bit=6)
    qc4 = QuantConfig(enabled=True, kv_bit=4)
    assert qc6.resolved_kv_format() == "fp6_e2m3"
    assert qc4.resolved_kv_format() == "fp_e2"
    x = jnp.array(np.random.default_rng(2).normal(size=(2, 4, 10, 64)),
                  dtype=jnp.float32)
    for qc in (qc6, qc4):
        out = Q.fake_quant_kv(x, qc)
        assert out.shape == x.shape
        assert not bool(jnp.any(jnp.isnan(out)))


def test_registry_roundtrip():
    x = jnp.array(np.random.default_rng(3).normal(size=(4, 256)),
                  dtype=jnp.float32)
    for fmt in ("fp_e1", "fp_e2", "fp_e3", "fp6_e2m3", "fp6_e3m2",
                "fp_e1m2_neg_e2m1_pos", "fp4_afpq", "fp6_int_neg_e2m3_pos",
                "fp_neg_reverse_quant", "log2", "int_sym", "int_asym"):
        fn = Q.make_act_quantizer(fmt, 4, granularity="per_group",
                                  group_size=128)
        out = fn(x)
        assert out.shape == x.shape, fmt
        assert not bool(jnp.any(jnp.isnan(out))), fmt


def test_weight_quantizer_per_channel_and_group():
    w = jnp.array(np.random.default_rng(4).normal(size=(64, 256)),
                  dtype=jnp.float32)
    for fmt in ("fp_e2", "fp6_e2m3", "int_sym"):
        for gran in ("per_channel", "per_group"):
            fn = Q.make_weight_quantizer(fmt, 4, granularity=gran)
            out = fn(w)
            assert out.shape == w.shape


def test_group_size_validation():
    with pytest.raises(ValueError):
        Q.fake_quant_fp(jnp.zeros((2, 100)), "fp_e2", group_size=128)
