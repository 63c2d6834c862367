#!/usr/bin/env python
"""End-to-end recipe quality ladder at real (small) scale (VERDICT r2 #5).

The round-2 recipe evidence was a depth-2 logit-MSE ladder on planted
outliers; this study runs the WHOLE pipeline the way the reference's
de-facto acceptance test does (`evaluate*.py` -> `openai_evaluator.py`),
at a scale that trains on CPU in minutes:

1. synthesize a labeled image dataset (class-dependent gratings + blobs);
2. tokenize with a fixed random-init VQVAE (`img_to_idxBl`) and TRAIN a
   small-but-real VAR (scripts/train.py machinery: teacher-forcing CE,
   CFG label dropout, cosine LR) until the loss converges;
3. capture calibration activations from the trained model and train GALT
   vectors (`quantize/galt.py`, the real loop — not a stub);
4. generate an eval set per recipe stage (bf16, naive FP4, +rotation,
   +GALT, +fc2 dual-grid = full recipe, FP6 full) through the REAL
   generation path;
5. score FID/IS against VQVAE reconstructions of held-out data with the
   in-framework InceptionV3 (fixed random weights — no downloads exist in
   this image; a fixed random projection is a valid RELATIVE metric, and
   the architecture is torch-parity-tested in
   tests/test_inception_torch_parity.py).

Output: a table + JSON artifact (STUDY_quality_ladder.json).  The
reference gate being approximated: BASELINE.md FP4 ΔFID <= +1.60 vs FP16
(absolute values are not comparable — different data, features, scale —
the ORDERING bf16 <= fp4-full < fp4-naive is the check).
"""
import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp


def synth_images(key, n, num_classes, size):
    """Class-conditional synthetic images [n, 3, size, size] in [0, 1]:
    class-dependent grating frequency/orientation + blob position + tint."""
    rng = np.random.default_rng(key)
    labels = rng.integers(0, num_classes, n)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    imgs = np.zeros((n, 3, size, size), np.float32)
    for i, c in enumerate(labels):
        ang = 2 * np.pi * c / num_classes
        freq = 2.0 + 1.5 * (c % 3)
        phase = rng.uniform(0, 2 * np.pi)
        grate = 0.5 + 0.5 * np.sin(
            2 * np.pi * freq * (np.cos(ang) * xx + np.sin(ang) * yy) + phase)
        cy, cx = (0.25 + 0.5 * ((c // 3) % 2), 0.25 + 0.5 * (c % 2))
        cy += rng.uniform(-0.08, 0.08)
        cx += rng.uniform(-0.08, 0.08)
        blob = np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / 0.02))
        tint = np.array([0.4 + 0.6 * ((c >> k) & 1) for k in range(3)],
                        np.float32)
        base = 0.6 * grate + 0.4 * blob
        imgs[i] = np.clip(
            tint[:, None, None] * base[None]
            + rng.normal(0, 0.03, (3, size, size)), 0, 1)
    return imgs.astype(np.float32), labels.astype(np.int32)


def reconstruct(vae_p, cfg, imgs):
    """VQVAE round trip through the multi-scale token pyramid — the
    reference-space images the generated sets are scored against."""
    from fpqvar_tpu.models import vqvae as vq

    idx_list = vq.img_to_idxBl(vae_p, cfg.vae, jnp.asarray(imgs) * 2 - 1)
    b = imgs.shape[0]
    hw = cfg.patch_nums[-1]
    f_hat = jnp.zeros((b, cfg.vae.z_channels, hw, hw), jnp.float32)
    qp = vae_p["quantize"]
    for si, idx in enumerate(idx_list):
        pn = cfg.patch_nums[si]
        h = vq.embed_idx(qp, idx).transpose(0, 2, 1).reshape(
            b, cfg.vae.z_channels, pn, pn)
        f_hat, _ = vq.get_next_autoregressive_input(
            qp, cfg.vae, si, f_hat, h)
    out = vq.decode(vae_p, cfg.vae, f_hat)
    return np.asarray(jnp.clip(out * 0.5 + 0.5, 0, 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--classes", type=int, default=8)
    ap.add_argument("--train-n", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=700)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--eval-n", type=int, default=256)
    ap.add_argument("--galt-epochs", type=int, default=25)
    ap.add_argument("--out", type=str, default="STUDY_quality_ladder.json")
    ap.add_argument("--stages", type=str, default=None,
                    help="comma list to restrict (bf16,fp4_naive,fp4_rot,"
                         "fp4_galt,fp4_full,fp6_full)")
    ap.add_argument("--plant-outliers", type=int, default=16, metavar="N",
                    help="plant N heavy-tailed activation channels "
                         "(quantize.outliers, function-preserving) — the "
                         "d30-like statistics that make the quant stages "
                         "separate (round-3 ladder: no outliers -> every "
                         "stage at the noise floor).  0 disables")
    ap.add_argument("--outlier-scale", type=float, default=32.0)
    ap.add_argument("--plant-when", choices=["init", "post"], default="post",
                    help="init: plant before training (weights adapt; hot "
                         "channels end up carrying the signal, which mutes "
                         "end-to-end damage).  post: plant on the TRAINED "
                         "model — trained information sits in every "
                         "channel, the transform then migrates scale into "
                         "the activations exactly like a SmoothQuant'd "
                         "checkpoint run backwards; naive low-bit quant "
                         "must crush the small-weight columns and the "
                         "recipe (rotation + GALT trained on the planted "
                         "captures) must migrate it back")
    args = ap.parse_args()

    import optax

    from fpqvar_tpu.config import (GenerateConfig, QuantConfig, VARConfig,
                                   VQVAEConfig, fpqvar_w4a4, fpqvar_w6a6)
    from fpqvar_tpu.eval import inception as I
    from fpqvar_tpu.eval import metrics as M
    from fpqvar_tpu.models import VARGenerator, vqvae as vq
    from fpqvar_tpu.models.var import init_var_params
    from fpqvar_tpu.models.vqvae import init_vqvae_params
    from fpqvar_tpu.quantize import quantize_var_params
    from fpqvar_tpu.quantize.calibration import (CalibrationStore,
                                                 capture_generation)
    from fpqvar_tpu.quantize import galt as GALT
    from fpqvar_tpu.train.trainer import (make_optimizer, make_train_state,
                                          train_step)

    pn = (1, 2, 3, 4, 6, 8)
    cfg = VARConfig(
        depth=args.depth, embed_dim=args.width, num_heads=args.width // 64,
        patch_nums=pn, num_classes=args.classes, cond_drop_rate=0.1,
        vae=VQVAEConfig(vocab_size=512, z_channels=16, ch=32, ch_mult=(1, 2),
                        num_res_blocks=1, patch_nums=pn))
    img_size = pn[-1] * 2  # one 2x downsample level in ch_mult=(1, 2)
    t0 = time.time()

    vae_p = init_vqvae_params(jax.random.PRNGKey(0), cfg.vae)
    var_p = init_var_params(jax.random.PRNGKey(1), cfg)
    outlier_s = None

    def plant(params):
        from fpqvar_tpu.quantize.outliers import plant_activation_outliers

        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float32), params)
        params, _ = plant_activation_outliers(params, cfg, outlier_s)
        return jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float32), params)

    if args.plant_outliers:
        from fpqvar_tpu.quantize.outliers import outlier_scale_vector

        outlier_s = outlier_scale_vector(
            cfg.width, num_hot=args.plant_outliers,
            max_scale=args.outlier_scale, seed=13)
        if args.plant_when == "init":
            var_p = plant(var_p)

    # ---- data + tokenization --------------------------------------------
    imgs, labels = synth_images(11, args.train_n, args.classes, img_size)
    idx_list = vq.img_to_idxBl(vae_p, cfg.vae, jnp.asarray(imgs) * 2 - 1)
    targets = np.asarray(jnp.concatenate(idx_list, axis=1))     # [N, L]
    x_teacher = np.asarray(
        vq.idxBl_to_var_input(vae_p["quantize"], cfg.vae, idx_list))
    print(f"[{time.time()-t0:6.1f}s] data: {imgs.shape} -> "
          f"targets {targets.shape}, x {x_teacher.shape}", flush=True)

    # ---- train ------------------------------------------------------------
    sched = optax.warmup_cosine_decay_schedule(
        0.0, 6e-4, warmup_steps=min(50, max(1, args.steps // 5)),
        decay_steps=args.steps)
    opt = make_optimizer(schedule=sched)
    state = make_train_state(var_p, opt)
    step_jit = jax.jit(
        lambda s, b, k: train_step(s, cfg, opt, b, key=k))
    rng = np.random.default_rng(3)
    key = jax.random.PRNGKey(4)
    for it in range(args.steps):
        sel = rng.choice(args.train_n, args.batch, replace=False)
        batch = {"label": jnp.asarray(labels[sel]),
                 "x": jnp.asarray(x_teacher[sel]),
                 "targets": jnp.asarray(targets[sel])}
        key, k = jax.random.split(key)
        state, metr = step_jit(state, batch, k)
        if it % 100 == 0 or it == args.steps - 1:
            print(f"[{time.time()-t0:6.1f}s] step {it}: "
                  f"loss {float(metr['loss']):.4f}", flush=True)
    var_p = state.params
    if outlier_s is not None and args.plant_when == "post":
        # exact-invariance planting on the trained model: the bf16 leg's
        # function (and FID) is unchanged, but every act quantizer now sees
        # heavy-tailed channels and every weight quantizer anti-scaled
        # columns — the imbalance the recipe exists to migrate
        var_p = plant(var_p)

    # ---- calibration + GALT ----------------------------------------------
    calib_labels = jnp.asarray(rng.integers(0, args.classes, 32), jnp.int32)
    taps = capture_generation(var_p, vae_p, cfg, calib_labels,
                              jax.random.PRNGKey(7))
    outlier_ratio = {}
    if outlier_s is not None:
        # did the planted channels survive training?  hot/cold per-channel
        # absmax ratio of the captured mat_qkv/fc1 inputs (the tensors the
        # act quantizers see)
        hot = outlier_s > 1.0
        for kind in ("mat_qkv", "fc1"):
            acts = np.concatenate(
                [np.asarray(t[kind], np.float32).reshape(-1, cfg.width)
                 for t in taps])
            am = np.abs(acts).max(axis=0)
            outlier_ratio[kind] = round(
                float(am[hot].mean() / am[~hot].mean()), 2)
        print(f"[{time.time()-t0:6.1f}s] planted-outlier hot/cold absmax "
              f"ratio after training: {outlier_ratio}", flush=True)
    tmp = tempfile.mkdtemp(prefix="ladder_calib_")
    store = CalibrationStore(tmp)
    store.append_run(taps)
    best = {}
    for kind in ("mat_qkv", "fc1"):
        w = np.asarray(var_p["blocks"][f"{kind}_w"], np.float32)
        best[kind] = GALT.train_galt(store, w, kind, w_bit=4,
                                     epochs=args.galt_epochs,
                                     max_samples_per_step=128)
    galt_pair = (best["mat_qkv"], best["fc1"])
    print(f"[{time.time()-t0:6.1f}s] GALT trained "
          f"(s range {best['mat_qkv'].min():.3f}..{best['mat_qkv'].max():.3f})",
          flush=True)

    # ---- recipe stages -----------------------------------------------------
    fp4 = fpqvar_w4a4()
    stages = {
        "bf16": (QuantConfig(), None),
        # independent-seed bf16 leg: its FID vs the bf16 leg's eval set
        # measures the GENERATION-level floor (sampling + set-size noise)
        # that the top recipe rungs must beat to claim separation — a
        # stricter control than the same-set split floor
        "bf16_rep": (QuantConfig(), None),
        # naive: single-grid fc2, no rotation, no GALT (the paper's "FP4
        # baseline" row)
        "fp4_naive": (fp4.replace(rotate=False, block_rotate=False,
                                  transform=False, fc2_format="fp_e2"), None),
        "fp4_rot": (fp4.replace(transform=False, fc2_format="fp_e2"), None),
        "fp4_galt": (fp4.replace(fc2_format="fp_e2"), galt_pair),
        "fp4_full": (fp4, galt_pair),            # + fc2 dual-grid
        "fp6_full": (fpqvar_w6a6(), galt_pair),
        # sensitivity controls — stages that SHOULD damage quality, proving
        # the metric detects quantization harm at this scale (the paper's
        # INT4 RTN row is the catastrophic baseline, FID 38.6 vs 1.98):
        "fp4_pertensor": (fp4.replace(
            rotate=False, block_rotate=False, transform=False,
            weight_quant="per_tensor", act_quant="per_tensor",
            fc2_format="fp_e2"), None),
        "int4_rtn": (QuantConfig(
            enabled=True, int_quant=True, w_bit=4, a_bit=4,
            weight_quant="per_channel", act_quant="per_token",
            act_sym=True), None),
    }
    if args.stages:
        keep = args.stages.split(",")
        stages = {k: v for k, v in stages.items() if k in keep}

    # ---- reference features ------------------------------------------------
    inc_p = I.init_inception_params(jax.random.PRNGKey(42))

    def features(images_np, bs=64):
        pools, probs = [], []
        for i in range(0, images_np.shape[0], bs):
            p3, _, pr = I.inception_features(
                inc_p, jnp.asarray(images_np[i:i + bs]), resize=True)
            pools.append(np.asarray(p3))
            probs.append(np.asarray(pr))
        return np.concatenate(pools), np.concatenate(probs)

    ref_imgs, _ = synth_images(99, args.eval_n, args.classes, img_size)
    ref_recon = reconstruct(vae_p, cfg, ref_imgs)
    ref_feats, _ = features(ref_recon)
    ref_stats = M.FIDStatistics.from_features(ref_feats.astype(np.float64))
    # noise floor: FID between two halves of the reference set itself —
    # stage deltas below this are measurement noise, not quality signal
    half = args.eval_n // 2
    fid_floor = M.FIDStatistics.from_features(
        ref_feats[:half].astype(np.float64)).frechet_distance(
        M.FIDStatistics.from_features(ref_feats[half:].astype(np.float64)))
    print(f"[{time.time()-t0:6.1f}s] reference set: {ref_recon.shape}, "
          f"same-set split FID floor {fid_floor:.4f}", flush=True)

    # ---- generate + score --------------------------------------------------
    # metric-sensitivity control: pure uniform noise must score FAR above
    # the same-set floor, proving the feature space detects distribution
    # damage at this image size (stage rows at the floor then honestly
    # read "no measurable harm", not "blind metric")
    noise_imgs = np.random.default_rng(123).uniform(
        size=ref_recon.shape).astype(np.float32)
    nf, _ = features(noise_imgs)
    fid_noise = M.FIDStatistics.from_features(
        nf.astype(np.float64)).frechet_distance(ref_stats)
    print(f"[{time.time()-t0:6.1f}s] noise-control FID {fid_noise:.3f} "
          f"(floor {fid_floor:.4f})", flush=True)

    eval_labels = np.arange(args.eval_n, dtype=np.int32) % args.classes
    results = {}
    stage_feats = {}
    for name, (qcfg, g) in stages.items():
        qp = quantize_var_params(var_p, cfg, qcfg, galt=g)
        gen = VARGenerator(cfg, qcfg, GenerateConfig())
        outs = []
        # *_rep stages draw an independent key stream (generation-floor
        # control legs)
        base_key = jax.random.PRNGKey(6 if name.endswith("_rep") else 5)
        for i in range(0, args.eval_n, 64):
            lab = jnp.asarray(eval_labels[i:i + 64])
            for attempt in range(3):
                try:
                    outs.append(np.asarray(gen.generate(
                        qp, vae_p, lab, jax.random.fold_in(base_key, i))))
                    break
                except Exception as e:        # transient relay failures
                    if attempt == 2:
                        raise
                    print(f"[retry] {name} batch {i}: {e}", flush=True)
                    time.sleep(20)
        gen_imgs = np.concatenate(outs)
        feats, probs = features(gen_imgs)
        fid = M.FIDStatistics.from_features(
            feats.astype(np.float64)).frechet_distance(ref_stats)
        is_score = M.inception_score(probs, split_size=args.eval_n // 2)
        results[name] = {"fid": round(float(fid), 4),
                         "is": round(float(is_score), 4)}
        stage_feats[name] = feats if name.startswith("bf16") else None
        print(f"[{time.time()-t0:6.1f}s] {name:10s} FID {fid:8.3f}  "
              f"IS {is_score:6.3f}", flush=True)

    fid_gen_floor = None
    if stage_feats.get("bf16") is not None \
            and stage_feats.get("bf16_rep") is not None:
        # cross-FID between two independent bf16 generations: the
        # generation-level measurement floor for this eval-set size
        fid_gen_floor = float(M.FIDStatistics.from_features(
            stage_feats["bf16"].astype(np.float64)).frechet_distance(
            M.FIDStatistics.from_features(
                stage_feats["bf16_rep"].astype(np.float64))))
        print(f"[{time.time()-t0:6.1f}s] bf16-vs-bf16_rep cross-FID "
              f"(generation floor) {fid_gen_floor:.4f}", flush=True)

    out = {
        "config": {"depth": args.depth, "width": args.width,
                   "classes": args.classes, "train_n": args.train_n,
                   "steps": args.steps, "eval_n": args.eval_n,
                   "img_size": img_size, "patch_nums": list(pn),
                   "plant_outliers": args.plant_outliers,
                   "outlier_scale": args.outlier_scale},
        "outlier_hot_cold_ratio_after_training": outlier_ratio or None,
        "note": "random-weight Inception features (relative metric); "
                "reference set = VQVAE reconstructions of held-out data",
        "fid_noise_floor_same_set_split": round(float(fid_floor), 4),
        "fid_generation_floor_bf16_cross": (
            round(fid_gen_floor, 4) if fid_gen_floor is not None else None),
        "fid_noise_control_uniform_images": round(float(fid_noise), 4),
        "results": results,
        "wall_s": round(time.time() - t0, 1),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["results"]))


if __name__ == "__main__":
    main()
