"""VQVAE tokenizer tests: multi-scale tokenization consistency and
teacher-forcing input construction."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fpqvar_tpu.config import VQVAEConfig
from fpqvar_tpu.models import vqvae as vq

CFG = VQVAEConfig(vocab_size=64, z_channels=8, ch=16, ch_mult=(1, 2),
                  num_res_blocks=1, patch_nums=(1, 2, 4))


@pytest.fixture(scope="module")
def params():
    return vq.init_vqvae_params(jax.random.PRNGKey(0), CFG)


def test_encode_decode_shapes(params):
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 8, 8))
    f = vq.encode(params, CFG, img)
    assert f.shape == (2, CFG.z_channels, 4, 4)   # downsample 2^(len(mult)-1)
    out = vq.decode(params, CFG, f)
    assert out.shape == (2, 3, 8, 8)
    assert float(out.min()) >= -1.0 and float(out.max()) <= 1.0


def test_f_to_idxBl_token_shapes(params):
    f = jax.random.normal(jax.random.PRNGKey(2), (2, CFG.z_channels, 4, 4))
    idxs = vq.f_to_idxBl(params["quantize"], CFG, f)
    assert [i.shape for i in idxs] == [(2, 1), (2, 4), (2, 16)]
    for i in idxs:
        assert int(i.min()) >= 0 and int(i.max()) < CFG.vocab_size


def test_residual_pyramid_reduces_error(params):
    """Each scale's residual-quantized reconstruction must reduce the
    feature error (`models/quant.py:135-166` semantics)."""
    qp = params["quantize"]
    f = jax.random.normal(jax.random.PRNGKey(3), (1, CFG.z_channels, 4, 4))
    idxs = vq.f_to_idxBl(qp, CFG, f)
    # rebuild f_hat progressively via get_next_autoregressive_input
    f_hat = jnp.zeros_like(f)
    errors = []
    for si, pn in enumerate(CFG.patch_nums):
        h = vq.embed_idx(qp, idxs[si]).transpose(0, 2, 1).reshape(
            1, CFG.z_channels, pn, pn)
        f_hat, nxt = vq.get_next_autoregressive_input(qp, CFG, si, f_hat, h)
        errors.append(float(jnp.mean((f - f_hat) ** 2)))
    assert errors[-1] <= errors[0]
    # final next map is f_hat itself (`quant.py:193-196`)
    np.testing.assert_array_equal(np.asarray(nxt), np.asarray(f_hat))


def test_idxBl_to_var_input_shapes(params):
    qp = params["quantize"]
    f = jax.random.normal(jax.random.PRNGKey(4), (2, CFG.z_channels, 4, 4))
    idxs = vq.f_to_idxBl(qp, CFG, f)
    x = vq.idxBl_to_var_input(qp, CFG, idxs)
    # L - first_l tokens, Cvae channels (`models/quant.py:169-184`)
    L = sum(pn * pn for pn in CFG.patch_nums)
    assert x.shape == (2, L - 1, CFG.z_channels)


def test_img_to_idxBl_end_to_end(params):
    img = jax.random.normal(jax.random.PRNGKey(5), (1, 3, 8, 8))
    idxs = vq.img_to_idxBl(params, CFG, img)
    assert len(idxs) == len(CFG.patch_nums)
