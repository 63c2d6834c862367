"""Evaluation pipeline tests: metric math sanity + imaging round trips +
the 50k driver's resume logic (on a tiny model)."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from fpqvar_tpu.eval import imaging, metrics
from fpqvar_tpu.eval.pipeline import class_range_for_host, generate_eval_set


def test_fid_zero_for_identical_sets():
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(500, 16)).astype(np.float64)
    s = metrics.FIDStatistics.from_features(feats)
    assert abs(s.frechet_distance(s)) < 1e-6


def test_fid_grows_with_mean_shift():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(2000, 8))
    b1 = rng.normal(size=(2000, 8)) + 0.1
    b2 = rng.normal(size=(2000, 8)) + 1.0
    sa = metrics.FIDStatistics.from_features(a)
    f1 = sa.frechet_distance(metrics.FIDStatistics.from_features(b1))
    f2 = sa.frechet_distance(metrics.FIDStatistics.from_features(b2))
    assert f1 < f2
    # mean-shift d in every dim adds ~ D*d^2
    assert abs(f2 - f1 - 8 * (1.0 - 0.01)) < 1.0


def test_inception_score_bounds():
    n, c = 1000, 10
    uniform = np.full((n, c), 1.0 / c)
    assert abs(metrics.inception_score(uniform) - 1.0) < 1e-6
    onehot = np.eye(c)[np.random.default_rng(0).integers(0, c, n)] * 0.999
    onehot += 0.001 / c
    sharp = metrics.inception_score(onehot)
    assert sharp > 5.0  # near c for balanced sharp predictions


def test_precision_recall_identical_sets():
    rng = np.random.default_rng(1)
    feats = rng.normal(size=(300, 8)).astype(np.float32)
    est = metrics.ManifoldEstimator(nhood_size=3)
    r = est.manifold_radii(feats)
    prec, rec = est.evaluate_pr(feats, r, feats, r)
    assert prec == 1.0 and rec == 1.0


def test_precision_recall_disjoint_sets():
    rng = np.random.default_rng(2)
    a = rng.normal(size=(300, 8)).astype(np.float32)
    b = rng.normal(size=(300, 8)).astype(np.float32) + 100.0
    est = metrics.ManifoldEstimator(nhood_size=3)
    prec, rec = est.evaluate_pr(a, est.manifold_radii(a),
                                b, est.manifold_radii(b))
    assert prec == 0.0 and rec == 0.0


def test_evaluate_all_keys():
    rng = np.random.default_rng(3)
    ref = rng.normal(size=(400, 8)).astype(np.float32)
    sam = rng.normal(size=(400, 8)).astype(np.float32)
    probs = np.abs(rng.normal(size=(400, 10)))
    probs /= probs.sum(1, keepdims=True)
    out = metrics.evaluate_all(ref, sam, ref, sam, probs)
    assert set(out) == {"inception_score", "fid", "sfid", "precision",
                       "recall"}


def test_imaging_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    imgs = rng.random((3, 3, 8, 8)).astype(np.float32)
    d = os.path.join(tmp_path, "samples")
    imaging.save_images_png(imgs, d, class_id=7)
    assert sorted(os.listdir(d)) == [
        "class7_img0.png", "class7_img1.png", "class7_img2.png"]
    npz = imaging.create_npz_from_sample_folder(d, expected=3)
    arr = np.load(npz)["arr_0"]
    assert arr.shape == (3, 8, 8, 3) and arr.dtype == np.uint8
    np.testing.assert_allclose(
        arr[0] / 255.0, np.transpose(imgs[0], (1, 2, 0)), atol=0.005)


def test_class_partition():
    r0 = class_range_for_host(1000, 0, 4)
    r3 = class_range_for_host(1000, 3, 4)
    assert list(r0)[:2] == [0, 1] and list(r3)[-1] == 999
    total = sum(len(class_range_for_host(1000, h, 4)) for h in range(4))
    assert total == 1000


def test_eval_driver_resume(tmp_path):
    from fpqvar_tpu.config import QuantConfig, VARConfig, VQVAEConfig
    from fpqvar_tpu.models import VARGenerator, build_vae_var

    cfg = VARConfig(
        depth=2, embed_dim=128, num_heads=2, patch_nums=(1, 2),
        num_classes=4,
        vae=VQVAEConfig(vocab_size=32, z_channels=8, ch=16, ch_mult=(1, 2),
                        num_res_blocks=1, patch_nums=(1, 2)))
    vae_p, var_p = build_vae_var(jax.random.PRNGKey(0), cfg)
    gen = VARGenerator(cfg, QuantConfig())
    d = os.path.join(tmp_path, "figs")
    generate_eval_set(gen, var_p, vae_p, d, num_img_per_class=2,
                      classes=[0, 1])
    files = sorted(os.listdir(d))
    assert files == ["class0_img0.png", "class0_img1.png",
                     "class1_img0.png", "class1_img1.png"]
    # resume: marker mtimes unchanged after re-run
    mtimes = {f: os.path.getmtime(os.path.join(d, f)) for f in files}
    generate_eval_set(gen, var_p, vae_p, d, num_img_per_class=2,
                      classes=[0, 1])
    assert all(os.path.getmtime(os.path.join(d, f)) == m
               for f, m in mtimes.items())
    # tail batch: num_img % batch != 0 always generates at the compiled
    # batch shape and slices the remainder (no re-trace, no extra files)
    d2 = os.path.join(tmp_path, "figs_tail")
    generate_eval_set(gen, var_p, vae_p, d2, num_img_per_class=3, batch=2,
                      classes=[2])
    assert sorted(os.listdir(d2)) == [
        "class2_img0.png", "class2_img1.png", "class2_img2.png"]
