"""JAX InceptionV3 (FID variant) tests: primitive parity vs torch, real
shape plumbing, and the end-to-end in-framework scoring pipeline."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from fpqvar_tpu.eval import inception as I


def test_avg_pool_nocount_matches_torch():
    x = np.random.default_rng(0).normal(size=(2, 3, 17, 17)).astype(np.float32)
    want = F.avg_pool2d(torch.from_numpy(x), 3, stride=1, padding=1,
                        count_include_pad=False).numpy()
    got = np.asarray(I.avg_pool_nocount(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_max_pool_matches_torch():
    x = np.random.default_rng(1).normal(size=(2, 4, 35, 35)).astype(np.float32)
    want = F.max_pool2d(torch.from_numpy(x), 3, stride=2).numpy()
    got = np.asarray(I.max_pool(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_conv_bn_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 8, 19, 19)).astype(np.float32)
    w = rng.normal(size=(16, 8, 3, 3)).astype(np.float32) * 0.1
    bn_w = rng.normal(size=16).astype(np.float32)
    bn_b = rng.normal(size=16).astype(np.float32)
    mean = rng.normal(size=16).astype(np.float32)
    var = np.abs(rng.normal(size=16)).astype(np.float32) + 0.5
    xt = torch.from_numpy(x)
    want = F.conv2d(xt, torch.from_numpy(w), stride=2)
    want = F.batch_norm(want, torch.from_numpy(mean), torch.from_numpy(var),
                        torch.from_numpy(bn_w), torch.from_numpy(bn_b),
                        training=False, eps=I.BN_EPS)
    want = F.relu(want).numpy()
    p = {"conv": jnp.asarray(w),
         "bn": {"scale": jnp.asarray(bn_w), "bias": jnp.asarray(bn_b),
                "mean": jnp.asarray(mean), "var": jnp.asarray(var)}}
    got = np.asarray(I.conv_bn(jnp.asarray(x), p, stride=2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def params():
    return I.init_inception_params(jax.random.PRNGKey(0))


def test_feature_shapes(params):
    """Real channel plumbing: 299 input -> pool3 2048, spatial 7*17*17,
    probs 1008 (matching the TF graph taps `openai_evaluator.py:23-24`)."""
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 299, 299))
    pool3, spatial, probs = I.inception_features(params, imgs)
    assert pool3.shape == (2, 2048)
    assert spatial.shape == (2, 7 * 17 * 17)
    assert probs.shape == (2, I.NUM_CLASSES)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-4)
    assert not bool(jnp.isnan(pool3).any())


def test_resize_preprocbatch(params):
    """Non-299 inputs are bilinear-resized; batched driver pads the tail
    batch and strips it."""
    imgs = (np.random.default_rng(3).uniform(
        size=(5, 3, 64, 64)) * 255).astype(np.uint8)
    p3, sp, pr = I.extract_features_batched(params, imgs, batch=2)
    assert p3.shape == (5, 2048) and sp.shape == (5, 7 * 17 * 17)
    assert pr.shape == (5, I.NUM_CLASSES)


def test_end_to_end_scoring(params, tmp_path):
    """PNG folder -> features -> all five metrics, no external step
    (VERDICT item 2 acceptance)."""
    from PIL import Image

    from fpqvar_tpu.eval.metrics import evaluate_all

    rng = np.random.default_rng(4)
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(8):
        Image.fromarray(
            (rng.uniform(size=(32, 32, 3)) * 255).astype(np.uint8)
        ).save(d / f"class0_img{i}.png")

    files = sorted(d.iterdir())
    imgs = np.stack([np.asarray(Image.open(f)) for f in files])
    imgs = imgs.transpose(0, 3, 1, 2)
    f1, s1, p1 = I.extract_features_batched(params, imgs, batch=4)
    f2, s2, p2 = I.extract_features_batched(params, imgs[::-1], batch=4)
    out = evaluate_all(f1, f2, s1, s2, p2)
    for k in ("inception_score", "fid", "sfid", "precision", "recall"):
        assert k in out and np.isfinite(out[k]), (k, out)
    # identical sets (reordered) -> FID ~ 0
    assert out["fid"] < 1e-3


def test_convert_rejects_missing_keys():
    with pytest.raises(KeyError):
        I.convert_inception_state_dict({"Conv2d_1a_3x3.conv.weight":
                                        np.zeros((32, 3, 3, 3))})
