"""Recipe-effectiveness regression: each stage of the FPQVAR recipe must
reduce quantization error, in the reference's ablation ordering
(BASELINE.md rows: naive fp4 -> +rotation -> +GALT; fc2 dual-grid vs
single-grid).

Random gaussian weights have no outliers, so the pathologies the recipe
targets are PLANTED: a few AdaLN scale-bias channels are boosted, giving
every block input persistent per-channel activation outliers (the exact
failure mode per-group absmax scaling suffers from and block-Hadamard
rotation / GALT smoothing fix — paper §3, SURVEY.md §2.5-2.6)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fpqvar_tpu.config import QuantConfig, VARConfig, VQVAEConfig
from fpqvar_tpu.models import var as V
from fpqvar_tpu.models.var import init_var_params
from fpqvar_tpu.ops import quantizers as Q
from fpqvar_tpu.quantize import build_runtime, quantize_var_params

CFG = VARConfig(
    depth=2, embed_dim=256, num_heads=2, patch_nums=(1, 2, 3),
    vae=VQVAEConfig(vocab_size=64, z_channels=8, ch=16, ch_mult=(1, 2),
                    num_res_blocks=1, patch_nums=(1, 2, 3)),
)


@pytest.fixture(scope="module")
def outlier_model():
    from fpqvar_tpu.models.vqvae import init_vqvae_params

    var_p = init_var_params(jax.random.PRNGKey(1), CFG, adaln_gamma_std=0.02)
    c = CFG.width
    b = np.array(var_p["blocks"]["ada_lin"]["b"])    # [d, 6C] (copy)
    rng = np.random.default_rng(0)
    hot = rng.choice(c, size=12, replace=False)
    # sections: gamma1, gamma2, scale1, scale2, shift1, shift2 (each C wide)
    for sec in (2, 3):
        b[:, sec * c + hot] = 8.0     # x_i *= 9 in those channels
    var_p = dict(var_p)
    var_p["blocks"] = dict(var_p["blocks"])
    var_p["blocks"]["ada_lin"] = {"w": var_p["blocks"]["ada_lin"]["w"],
                                  "b": jnp.asarray(b)}
    var_p = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), var_p)
    vae_p = init_vqvae_params(jax.random.PRNGKey(9), CFG.vae)
    return vae_p, var_p


@pytest.fixture(scope="module")
def trained_galt(outlier_model, tmp_path_factory):
    """The REAL GALT pipeline: capture calibration activations from the
    outlier model, train s per block (optax AdamW + STE,
    `learnable_transformation_fc1_fp4.py:215-255` structure)."""
    from fpqvar_tpu.quantize import galt as G
    from fpqvar_tpu.quantize.calibration import (
        CalibrationStore, capture_generation)

    vae_p, var_p = outlier_model
    store = CalibrationStore(str(tmp_path_factory.mktemp("ablation_calib")))
    taps = capture_generation(var_p, vae_p, CFG, jnp.array([3, 7, 11]),
                              jax.random.PRNGKey(5))
    store.append_run(taps)
    s_qkv = G.train_galt(store, var_p["blocks"]["mat_qkv_w"], "mat_qkv",
                         w_bit=4, epochs=8, max_samples_per_step=128)
    s_fc1 = G.train_galt(store, var_p["blocks"]["fc1_w"], "fc1",
                         w_bit=4, epochs=8, max_samples_per_step=128)
    return np.asarray(s_qkv), np.asarray(s_fc1)


def _logit_mse(var_p, qp, qrt, label, x):
    ref = V.var_forward(var_p, CFG, None, label, x)
    got = V.var_forward(qp, CFG, qrt, label, x)
    return float(jnp.mean((ref - got) ** 2))


def test_recipe_stages_monotonically_improve(outlier_model, trained_galt):
    _, var_p = outlier_model
    label = jnp.array([3, 7], jnp.int32)
    x = jax.random.normal(
        jax.random.PRNGKey(2),
        (2, CFG.L - CFG.first_l, CFG.vae.z_channels)) * 0.5

    base = QuantConfig(
        enabled=True, w_bit=4, a_bit=4,
        weight_quant="per_group", act_quant="per_group",
        weight_format="fp_e2", act_format="fp_e2", fc2_format="fp_e2")

    mses = {}
    ladder = [
        ("naive", base, None),
        ("rotate", base.replace(rotate=True, block_rotate=True), None),
        ("rotate+galt", base.replace(rotate=True, transform=True),
         trained_galt),
        ("rotate+galt+dual",
         base.replace(rotate=True, transform=True,
                      fc2_format="fp_e1m2_neg_e2m1_pos"), trained_galt),
    ]
    for name, qcfg, galt in ladder:
        qp = quantize_var_params(var_p, CFG, qcfg, galt=galt)
        qp = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float32), qp)
        qrt = build_runtime(qcfg, CFG.depth, CFG.width)
        mses[name] = _logit_mse(var_p, qp, qrt, label, x)

    print("ablation MSEs:", mses)
    assert mses["rotate"] < mses["naive"], mses
    assert mses["rotate+galt"] < mses["rotate"], mses
    assert mses["rotate+galt+dual"] <= mses["rotate+galt"] * 1.05, mses


def test_per_channel_granularity_cost_is_bounded(outlier_model):
    """The int8ch speed path trades per-group-128 scales for per-channel /
    per-token scales (full-K int8 MXU dots — scripts/kernel_roofline.py).
    Pin the quality ladder: with rotation on (which gaussianizes the
    outliers that coarse scaling suffers from most), per-channel error
    stays within an order of magnitude of per-group, and rotation helps
    the coarse granularity too."""
    _, var_p = outlier_model
    label = jnp.array([3, 7], jnp.int32)
    x = jax.random.normal(
        jax.random.PRNGKey(4),
        (2, CFG.L - CFG.first_l, CFG.vae.z_channels)) * 0.5

    def mse(qcfg):
        qp = quantize_var_params(var_p, CFG, qcfg)
        qp = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float32), qp)
        qrt = build_runtime(qcfg, CFG.depth, CFG.width)
        return _logit_mse(var_p, qp, qrt, label, x)

    base = QuantConfig(
        enabled=True, w_bit=4, a_bit=4,
        weight_quant="per_group", act_quant="per_group",
        weight_format="fp_e2", act_format="fp_e2", fc2_format="fp_e2")
    chan = base.replace(weight_quant="per_channel", act_quant="per_token")

    m = {
        "group+rot": mse(base.replace(rotate=True)),
        "chan": mse(chan),
        "chan+rot": mse(chan.replace(rotate=True)),
    }
    print("granularity MSEs:", m)
    assert np.isfinite(list(m.values())).all(), m
    assert m["chan+rot"] < m["chan"], m               # rotation still helps
    assert m["chan+rot"] <= m["group+rot"] * 10.0, m  # bounded coarseness cost


def test_fc2_dual_grid_beats_single_on_gelu():
    """The asymmetric dual-grid format must beat single-grid e2m1 on
    GELU-distributed activations (the motivation study,
    `search/fc2_quant.py`)."""
    key = jax.random.PRNGKey(3)
    x = jax.nn.gelu(jax.random.normal(key, (64, 512)) * 2.0,
                    approximate=True)
    w = jax.random.normal(jax.random.fold_in(key, 1), (128, 512)) * 0.05
    ref = x @ w.T
    wq = Q.fake_quant_fp(w, "fp_e2", granularity="per_group")

    def mse(xq):
        return float(jnp.mean((ref - xq @ wq.T) ** 2))

    single = mse(Q.fake_quant_fp(x, "fp_e2", granularity="per_group"))
    dual = mse(Q.fake_quant_dual(x, "fp_e1m2_neg_e2m1_pos",
                                 granularity="per_group"))
    assert dual < single, (dual, single)
