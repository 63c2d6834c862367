"""Offline pipeline: calibration capture -> format search -> GALT training
-> full-recipe generation, end to end on the tiny model."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fpqvar_tpu.config import QuantConfig, VARConfig, VQVAEConfig, fpqvar_w4a4
from fpqvar_tpu.models import VARGenerator
from fpqvar_tpu.models.var import init_var_params
from fpqvar_tpu.models.vqvae import init_vqvae_params
from fpqvar_tpu.quantize import quantize_var_params
from fpqvar_tpu.quantize.calibration import CalibrationStore, capture_generation
from fpqvar_tpu.quantize import galt as G
from fpqvar_tpu.quantize import search as S

TINY = VARConfig(
    depth=2, embed_dim=128, num_heads=2, patch_nums=(1, 2, 3),
    vae=VQVAEConfig(vocab_size=64, z_channels=8, ch=16, ch_mult=(1, 2),
                    num_res_blocks=1, patch_nums=(1, 2, 3)),
)


@pytest.fixture(scope="module")
def model():
    vae_p = init_vqvae_params(jax.random.PRNGKey(0), TINY.vae)
    var_p = init_var_params(jax.random.PRNGKey(1), TINY, adaln_gamma_std=0.02)
    return vae_p, var_p


@pytest.fixture(scope="module")
def store(model, tmp_path_factory):
    vae_p, var_p = model
    root = str(tmp_path_factory.mktemp("calib"))
    st = CalibrationStore(root)
    taps = capture_generation(
        var_p, vae_p, TINY, jnp.array([1, 2, 3]), jax.random.PRNGKey(5))
    st.append_run(taps)
    return st


def test_capture_shapes(store):
    # step 1 has pn=2 -> l=4; 2B=6 rows; depth=2 blocks
    x = store.load("fc1", 0, 1)
    assert x.shape == (6, 4, 128)
    assert store.steps("mat_qkv", 1) == 3
    # fc2 taps are GELU outputs: skewed-negative distribution
    fc2 = store.load("fc2", 0, 2)
    assert fc2.min() < 0 < fc2.max()
    assert abs(fc2.min()) < fc2.max()  # GELU min is bounded (~ -0.17 * scale)


def test_capture_accumulates(model, store):
    vae_p, var_p = model
    before = store.load("fc1", 0, 0).shape[0]
    taps = capture_generation(
        var_p, vae_p, TINY, jnp.array([7]), jax.random.PRNGKey(9))
    store.append_run(taps)
    after = store.load("fc1", 0, 0).shape[0]
    assert after == before + 2  # CFG-doubled batch of 1


def test_format_search(model, store, tmp_path):
    _, var_p = model
    weights = np.asarray(var_p["blocks"]["fc1_w"])
    results = S.search_formats(store, weights, "fc1", max_samples=128)
    assert len(results) == TINY.depth
    for r in results:
        assert r["weight_format"] in S.FP4_SPACE
        assert r["activation_format"] in S.FP4_SPACE
        assert r["loss"] >= 0
    path = os.path.join(tmp_path, "formats.json")
    S.save_formats_json(path, results)
    loaded = S.load_formats_json(path)
    assert loaded == json.load(open(path))
    mixed = S.formats_to_mixed_config(results)
    assert len(mixed) == TINY.depth and all(m.startswith("fp_") for m in mixed)


def test_galt_training_reduces_loss(model, store):
    _, var_p = model
    weights = np.asarray(var_p["blocks"]["fc1_w"])
    acts = [store.load("fc1", 0, s).reshape(-1, TINY.width)
            for s in range(store.steps("fc1", 0))]
    # loss with s=ones vs trained s
    from fpqvar_tpu.ops.hadamard import block_hadamard_block
    from fpqvar_tpu.quantize.galt import make_quant_ste, quant_error

    qb = jnp.asarray(block_hadamard_block(128, 42), jnp.float32)
    quant = make_quant_ste(4)
    w = jnp.asarray(weights[0], jnp.float32)
    ones = jnp.ones((TINY.width,))
    base_loss = float(np.mean([
        float(quant_error(jnp.asarray(a, jnp.float32), w, ones, qb, quant))
        for a in acts]))
    s, best_loss = G.train_galt_block(acts, weights[0], w_bit=4, epochs=8)
    assert s.shape == (TINY.width,)
    assert best_loss <= base_loss * 1.001
    assert not np.allclose(s, 1.0)  # actually moved


def test_full_offline_to_generation(model, store):
    """Calibrate -> train GALT (1 epoch, tiny) -> quantize -> generate."""
    vae_p, var_p = model
    weights_qkv = np.asarray(var_p["blocks"]["mat_qkv_w"])
    weights_fc1 = np.asarray(var_p["blocks"]["fc1_w"])
    s_qkv = G.train_galt(store, weights_qkv, "mat_qkv", w_bit=4, epochs=1,
                         max_samples_per_step=64)
    s_fc1 = G.train_galt(store, weights_fc1, "fc1", w_bit=4, epochs=1,
                         max_samples_per_step=64)
    assert s_qkv.shape == (TINY.depth, TINY.width)
    qcfg = fpqvar_w4a4()
    qp = quantize_var_params(var_p, TINY, qcfg, galt=(s_qkv, s_fc1))
    gen = VARGenerator(TINY, qcfg)
    imgs = gen.generate(qp, vae_p, jnp.array([3, 5]), jax.random.PRNGKey(1))
    assert not bool(jnp.isnan(imgs).any())


def test_format_search_on_ada_lin(model, store):
    """The search API covers the AdaLN layer too (reference
    `search/search_fp_format_ada.py`: format search over saved condition
    activations against the ada_lin weight)."""
    from fpqvar_tpu.quantize.calibration import capture_condition

    _, var_p = model
    cond = capture_condition(var_p, TINY, np.arange(8))   # SiLU'd cond [8, C]
    ada_w = np.asarray(var_p["blocks"]["ada_lin"]["w"][0])  # [6C, C]
    wn, an, loss = S.search_formats_for_block(cond, ada_w, S.FP4_SPACE)
    assert wn in S.FP4_SPACE and an in S.FP4_SPACE and loss >= 0.0


def test_search_ada_formats_all_blocks(model, tmp_path):
    """Per-block ada search consumes capture_condition output and emits the
    reference JSON schema (`search_fp_format_ada.py:396-469`)."""
    from fpqvar_tpu.quantize.calibration import capture_condition

    _, var_p = model
    cond = capture_condition(var_p, TINY, np.arange(8))
    ada_w = np.asarray(var_p["blocks"]["ada_lin"]["w"])   # [depth, 6C, C]
    results = S.search_ada_formats(cond, ada_w)
    assert len(results) == TINY.depth
    for blk, r in enumerate(results):
        assert r["block_idx"] == blk
        assert r["weight_format"] in S.FP4_SPACE
        assert r["activation_format"] in S.FP4_SPACE
        assert r["loss"] >= 0.0
    p = str(tmp_path / "ada.json")
    S.save_formats_json(p, results)
    assert S.load_formats_json(p) == results
