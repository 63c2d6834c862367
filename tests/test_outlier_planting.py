"""plant_activation_outliers: exact function preservation + real outliers.

The quality ladder (scripts/quality_ladder.py) relies on this transform to
retrofit d30-like heavy-tailed activation channels onto its trained small
model; these tests pin the two properties that make the resulting FID
ladder meaningful: the bf16 function must not change (so the bf16 leg
stays a valid reference) and the mat_qkv/fc1 input tensors must actually
become outlier-dominated (so the quant stages have something to fail on).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fpqvar_tpu.config import QuantConfig, VARConfig, VQVAEConfig
from fpqvar_tpu.models import var as V
from fpqvar_tpu.models.var import init_var_params
from fpqvar_tpu.quantize import build_runtime, quantize_var_params
from fpqvar_tpu.quantize.calibration import capture_generation
from fpqvar_tpu.quantize.outliers import (outlier_scale_vector,
                                          plant_activation_outliers)

CFG = VARConfig(
    depth=2, embed_dim=256, num_heads=2, patch_nums=(1, 2, 3),
    vae=VQVAEConfig(vocab_size=64, z_channels=8, ch=16, ch_mult=(1, 2),
                    num_res_blocks=1, patch_nums=(1, 2, 3)),
)


@pytest.fixture(scope="module")
def planted():
    var_p = init_var_params(jax.random.PRNGKey(0), CFG,
                            adaln_gamma_std=0.02)
    var_p = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), var_p)
    s = outlier_scale_vector(CFG.width, num_hot=12, max_scale=32.0, seed=3)
    qp, _ = plant_activation_outliers(var_p, CFG, s)
    qp = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), qp)
    return var_p, qp, s


@pytest.mark.quick
def test_function_preserved(planted):
    var_p, qp, _ = planted
    label = jnp.array([3, 7], jnp.int32)
    x = jax.random.normal(
        jax.random.PRNGKey(2),
        (2, CFG.L - CFG.first_l, CFG.vae.z_channels)) * 0.5
    ref = V.var_forward(var_p, CFG, None, label, x)
    got = V.var_forward(qp, CFG, None, label, x)
    # exact-arithmetic identity, f32 roundoff only: the transform divides
    # weight columns and re-multiplies activations by the same vector
    denom = jnp.maximum(jnp.max(jnp.abs(ref)), 1.0)
    assert float(jnp.max(jnp.abs(ref - got)) / denom) < 5e-5


@pytest.mark.quick
def test_outliers_exist_in_captured_acts(planted):
    """The planted model's mat_qkv/fc1 calibration taps must be dominated
    by the hot channels (per-channel absmax ratio ~ the planted scales),
    while the unplanted model's taps stay near-uniform."""
    from fpqvar_tpu.models.vqvae import init_vqvae_params

    var_p, qp, s = planted
    vae_p = init_vqvae_params(jax.random.PRNGKey(9), CFG.vae)
    hot = s > 1.0

    def chan_ratio(params):
        taps = capture_generation(params, vae_p, CFG, jnp.array([1, 2]),
                                  jax.random.PRNGKey(5))
        ratios = []
        for kind in ("mat_qkv", "fc1"):
            acts = np.concatenate(
                [np.asarray(t[kind], np.float32).reshape(-1, CFG.width)
                 for t in taps])
            absmax = np.abs(acts).max(axis=0)
            ratios.append(absmax[hot].mean() / absmax[~hot].mean())
        return ratios

    base = chan_ratio(var_p)
    plant = chan_ratio(qp)
    for b_r, p_r in zip(base, plant):
        assert p_r > 4 * b_r, (base, plant)
        assert p_r > 5.0, (base, plant)


def test_quant_error_ladder_on_planted(planted):
    """On the planted model, naive per-group FP4 must hurt measurably
    (vs the unplanted model) and rotation must help.

    Rotation-only recovery is PARTIAL here by construction: post-hoc
    planting puts the exact inverse scales into the weight columns, so the
    weight side carries anti-correlated tiny columns that rotation mixes
    back into every lane (measured: act-side error 1.19e-6 -> 5.0e-7 under
    rotation while weight-side grows 2.1e-7 -> 5.8e-7).  The quality
    ladder therefore plants at INIT and lets training shape the weights
    (scripts/quality_ladder.py --plant-outliers); this test pins the
    transform-level mechanics only."""
    _, qp, _ = planted
    label = jnp.array([3, 7], jnp.int32)
    x = jax.random.normal(
        jax.random.PRNGKey(4),
        (2, CFG.L - CFG.first_l, CFG.vae.z_channels)) * 0.5
    ref = V.var_forward(qp, CFG, None, label, x)

    base = QuantConfig(
        enabled=True, w_bit=4, a_bit=4,
        weight_quant="per_group", act_quant="per_group",
        weight_format="fp_e2", act_format="fp_e2", fc2_format="fp_e2")

    def mse(qcfg):
        pp = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float32),
            quantize_var_params(qp, CFG, qcfg))
        qrt = build_runtime(qcfg, CFG.depth, CFG.width)
        got = V.var_forward(pp, CFG, qrt, label, x)
        return float(jnp.mean((ref - got) ** 2))

    naive = mse(base)
    rot = mse(base.replace(rotate=True, block_rotate=True))
    assert naive > 5e-7, naive        # planting makes naive FP4 hurt
    assert rot < 0.9 * naive, (naive, rot)
