"""End-to-end CLI smoke tests at the --tiny config.

The reference's user surface is its entry scripts (`run.sh:4-25`); ours is
the CLIs in scripts/.  Everything below runs the REAL subprocess entry
points (argparse -> config -> model -> artifacts on disk), mirroring the
reference pipeline order: calibrate -> format search -> GALT training ->
quantized evaluation -> npz pack -> metric scoring, plus the serving and
training CLIs the reference lacks.  All at fpqvar_tpu.config.var_tiny()
shapes so the whole module is CPU-cheap.
"""
import json
import os
import subprocess
import sys

import numpy as np

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")


def run_cli(script, *args, timeout=900):
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, script), *map(str, args)],
        capture_output=True, text=True, env=env, timeout=timeout)
    assert r.returncode == 0, (script, r.stdout[-2000:], r.stderr[-2000:])
    return r


def test_offline_pipeline_to_scored_eval(tmp_path):
    """calibrate -> search_formats -> train_galt (both kinds) -> evaluate
    with the full FP4 recipe -> packed npz -> score (random Inception).
    This is the reference's whole workflow (`run.sh` + openai_evaluator)
    as one CLI chain."""
    calib = tmp_path / "calib"
    run_cli("calibrate.py", "--tiny", "--num-classes", 2, "--batch", 2,
            "--out", calib)
    assert (calib / "condition.npz").exists()

    fmts = tmp_path / "formats_fc1.json"
    run_cli("search_formats.py", "--tiny", "--kind", "fc1", "--calib", calib,
            "--max-samples", 16, "--out", fmts)
    data = json.loads(fmts.read_text())
    assert len(data) == 2  # one entry per tiny block

    best = tmp_path / "best_s"
    best.mkdir()
    for kind in ("mat_qkv", "fc1"):
        run_cli("train_galt.py", "--tiny", "--kind", kind, "--calib", calib,
                "--epochs", 1, "--max-samples-per-step", 16,
                "--out", best / f"{kind}_best_s_fp4.npz")

    figs = tmp_path / "figs"
    run_cli("evaluate.py", "--tiny", "--quant", "--w_bit", 4, "--a_bit", 4,
            "--weight_quant", "per_group", "--act_quant", "per_group",
            "--activation_fp_quant", "--weight_fp_quant",
            "--rotate", "--block_rotate",
            "--transform", "--best-s-dir", best,
            "--classes", "0:2", "--num-img-per-class", 3, "--batch", 3,
            "--pack-npz", "--out", figs)
    pngs = [f for f in os.listdir(figs) if f.endswith(".png")]
    assert len(pngs) == 6
    npz = str(figs) + ".npz"
    assert os.path.exists(npz)
    assert np.load(npz)["arr_0"].shape == (6, 6, 6, 3)

    mj = tmp_path / "metrics.json"
    run_cli("score.py", npz, npz, "--inception", "random",
            "--json-out", mj, "--batch", 4)
    m = json.loads(mj.read_text())
    assert set(m) >= {"inception_score", "fid", "sfid", "precision", "recall"}
    # identical ref/sample feature sets: FID must collapse to ~0 even with
    # random weights
    assert abs(m["fid"]) < 1e-2 and abs(m["sfid"]) < 1e-2
    assert m["inception_score"] >= 1.0


def test_serve_cli_demo(tmp_path):
    out = tmp_path / "served"
    r = run_cli("serve.py", "--tiny", "--recipe", "w4a16", "--demo", 2,
                "--max-batch", 2, "--out", out)
    assert len([f for f in os.listdir(out) if f.endswith(".png")]) == 2
    assert "served 2 requests" in r.stdout


def test_train_cli(tmp_path):
    out = tmp_path / "run"
    r = run_cli("train.py", "--tiny", "--steps", 2, "--glb-batch", 2,
                "--synthetic-n", 4, "--save-every", 2, "--log-every", 1,
                "--out", out)
    assert "done: 2 steps" in r.stdout
    assert (out / "metrics.jsonl").exists()
    assert os.path.isdir(out / "ckpt")


def test_search_ada_shared_aln(tmp_path):
    """ada-format search on a shared-AdaLN (512-family) model: the weight
    lives at params['shared_ada_lin'], not blocks['ada_lin'] — exactly the
    family the reference's ada search targets (search_fp_format_ada.py)."""
    out = tmp_path / "ada.json"
    run_cli("search_formats.py", "--kind", "ada", "--depth", 2,
            "--resolution", 512, "--labels", 4,
            "--calib", tmp_path, "--out", out)
    data = json.loads(out.read_text())
    assert len(data) == 1  # one shared layer
    assert {"weight_format", "activation_format"} <= set(data[0])


def test_evaluate_packed_ckpt_without_var_ckpt(tmp_path):
    """--packed-ckpt alone must drive generation (no --var-ckpt needed):
    convert a quantized checkpoint, then evaluate from it."""
    ck = tmp_path / "q.npz"
    run_cli("convert_checkpoint.py", "--tiny", "--quant",
            "--w_bit", 4, "--backend", "int8", "--out", ck)
    figs = tmp_path / "figs"
    run_cli("evaluate.py", "--tiny", "--quant", "--w_bit", 4, "--a_bit", 4,
            "--backend", "int8",
            "--activation_fp_quant", "--weight_fp_quant",
            "--weight_quant", "per_group", "--act_quant", "per_group",
            "--packed-ckpt", ck,
            "--classes", "0:1", "--num-img-per-class", 2, "--batch", 2,
            "--out", figs)
    assert len([f for f in os.listdir(figs) if f.endswith(".png")]) == 2


def test_acceptance_runner_tiny(tmp_path):
    """The one-command acceptance gate (scripts/acceptance.py): calibrate ->
    GALT -> quantized + bf16 generation -> npz pack -> Inception features ->
    all five metrics -> verdict JSON.  Tiny mode = random weights + random
    Inception, so the asserted contract is pipeline health: every stage
    artifact exists, metrics are finite, rc==0.  With real checkpoint paths
    the SAME command is the reference's full acceptance protocol
    (`evaluate_fp_quant_transform_rotate.py:187-207` -> `pack_figs.py` ->
    `openai_evaluator.py:26-59` vs BASELINE.md)."""
    out = tmp_path / "acc"
    run_cli("acceptance.py", "--tiny", "--out", out)
    v = json.loads((out / "ACCEPTANCE.json").read_text())
    assert v["pass"] and v["smoke_mode"]
    assert set(v["metrics"]) == {"inception_score", "fid", "sfid",
                                 "precision", "recall"}
    # stage artifacts: GALT vectors, both packed image sets, feature caches
    assert (out / "best_s" / "mat_qkv_best_s_fp4.npz").exists()
    assert (out / "figs_fp4.npz").exists()
    assert (out / "figs_fp16.npz").exists()
    assert (out / "features_fp4.npz").exists()
    # resume: a second invocation must skip every stage (no regeneration)
    r = run_cli("acceptance.py", "--tiny", "--out", out)
    assert "resume" in r.stdout


def test_acceptance_runner_tiny_sharded(tmp_path):
    """acceptance.py --dp 2 --tp 2 on 8 virtual CPU devices: the 50k
    protocol's generation legs run dp-sharded with tp-sharded params —
    the distributed path a real acceptance run on a pod slice would use."""
    out = tmp_path / "acc"
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                          + " --xla_force_host_platform_device_count=8"))
    r = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "acceptance.py"), "--tiny",
         "--dp", "2", "--tp", "2", "--out", str(out)],
        capture_output=True, text=True, env=env, timeout=900)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    v = json.loads((out / "ACCEPTANCE.json").read_text())
    assert v["pass"]


def test_serving_bench_tiny(tmp_path):
    """serving_bench.py: the within-window serving A/B produces latency
    percentiles + throughput per recipe."""
    r = run_cli("serving_bench.py", "--preset", "tiny", "--n", 8,
                "--max-batch", 4, "--unloaded", 2, "--poisson", 12,
                "--recipes", "bf16,w4a16")
    out = json.loads(r.stdout.strip().splitlines()[-1])
    for recipe in ("bf16", "w4a16"):
        rec = out["recipes"][recipe]
        assert rec["saturated_imgs_per_s"] > 0
        assert rec["saturated_ms"]["p99"] >= rec["saturated_ms"]["p50"]
        assert len(rec["poisson_ms"]["samples_ms"]) == 12
        assert rec["poisson"]["achieved_imgs_per_s"] > 0
