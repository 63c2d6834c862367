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


def test_metrics_golden_vs_reference_formulas():
    """Golden cross-check: FID/IS/P/R vs a brute-force inline transcription
    of the reference formulas (`openai_evaluator.py:71-115` TTUR FID,
    `:178-191` split-KL IS, `:204-359` kNN manifolds) — independent of the
    batched implementations in fpqvar_tpu.eval.metrics."""
    from scipy import linalg

    rng = np.random.default_rng(11)
    ref = rng.normal(size=(600, 12)).astype(np.float64)
    sam = (rng.normal(size=(600, 12)) * 1.3 + 0.4).astype(np.float64)

    # FID: d^2 = |mu1-mu2|^2 + Tr(S1 + S2 - 2 sqrtm(S1 S2))
    mu1, s1 = ref.mean(0), np.cov(ref, rowvar=False)
    mu2, s2 = sam.mean(0), np.cov(sam, rowvar=False)
    covmean = linalg.sqrtm(s1.dot(s2), disp=False)[0].real
    want_fid = ((mu1 - mu2) @ (mu1 - mu2) + np.trace(s1) + np.trace(s2)
                - 2 * np.trace(covmean))
    got_fid = metrics.FIDStatistics.from_features(ref).frechet_distance(
        metrics.FIDStatistics.from_features(sam))
    np.testing.assert_allclose(got_fid, want_fid, rtol=1e-6)

    # IS: exp(mean KL(p(y|x) || p(y))) per split of 5000, averaged; use
    # split_size 250 so multiple splits are exercised
    probs = np.abs(rng.normal(size=(600, 10))) + 1e-3
    probs /= probs.sum(1, keepdims=True)
    splits = []
    for i in range(0, 600, 250):
        part = probs[i: i + 250]
        kl = part * (np.log(part) - np.log(part.mean(0, keepdims=True)))
        splits.append(np.exp(np.mean(np.sum(kl, 1))))
    np.testing.assert_allclose(
        metrics.inception_score(probs, split_size=250),
        np.mean(splits), rtol=1e-6)

    # P/R: brute-force kNN radii (k-th smallest squared distance, self
    # included at index 0 == reference's seq partition) + hypersphere test
    def radii_brute(f, k=3):
        d = ((f[:, None, :] - f[None, :, :]) ** 2).sum(-1)
        return np.sort(d, axis=1)[:, k]

    fr = ref.astype(np.float32)
    fs = sam.astype(np.float32)
    rr, rs = radii_brute(fr), radii_brute(fs)
    d = ((fr[:, None, :] - fs[None, :, :]) ** 2).sum(-1)
    want_prec = np.mean(np.any(d <= rr[:, None], axis=0))   # sample in ref
    want_rec = np.mean(np.any(d <= rs[None, :], axis=1))    # ref in sample
    est = metrics.ManifoldEstimator(nhood_size=3, row_batch=200,
                                    col_batch=150)
    got_rr, got_rs = est.manifold_radii(fr), est.manifold_radii(fs)
    np.testing.assert_allclose(got_rr, rr, rtol=1e-3, atol=1e-3)
    prec, rec = est.evaluate_pr(fr, got_rr, fs, got_rs)
    assert abs(prec - want_prec) < 0.02 and abs(rec - want_rec) < 0.02


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
