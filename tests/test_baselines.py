"""Baseline quantizer zoo tests."""
import jax.numpy as jnp
import numpy as np

from fpqvar_tpu.quantize import baselines as B


def test_du_quantizer_levels():
    # inner region values land on multiples of s1 * scale
    x = np.zeros(128, np.float32)
    x[0] = 3.0    # absmax -> scale = 1
    x[1] = 0.322  # c=1.61, m=5 -> s1=0.322 -> exact level
    x[2] = -0.161  # rounds to 0 or +-0.322 boundary
    out = np.asarray(B.du_quantizer(jnp.asarray(x)))
    assert abs(out[0] - 3.0) < 1e-6
    assert abs(out[1] - 0.322) < 1e-5
    assert not np.any(np.isnan(out))


def test_du_per_token_runs():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 128)), jnp.float32)
    out = B.du_quantizer(x, granularity="per_token")
    assert out.shape == x.shape
    assert not bool(jnp.any(jnp.isnan(out)))


def test_flint_grid_snap():
    x = np.zeros((1, 128), np.float32)
    x[0, 0] = 10.0   # scale 1
    x[0, 1] = 0.7    # nearest flint value 0.625
    out = np.asarray(B.flint_quant(jnp.asarray(x)))
    assert out[0, 0] == 10.0
    assert abs(out[0, 1] - 0.625) < 1e-6


def test_clipping_sweep_monotone_keys():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(64, 128)).astype(np.float32)
    w = rng.normal(size=(32, 128)).astype(np.float32)
    res = B.clipping_strength_sweep(x, w, strengths=(0.6, 0.8, 1.0))
    assert set(res) == {0.6, 0.8, 1.0}
    assert all(v >= 0 for v in res.values())


def test_compare_baselines_returns_all():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(16, 256)).astype(np.float32)
    res = B.compare_baselines(x)
    assert set(res) == set(B.BASELINES)
    assert all(np.isfinite(v) for v in res.values())


def test_rotation_aware_sweep_structure_and_outlier_win():
    """The --block_rotate baseline study (`search/baseline/
    *_for_activation_rotate.py`): every method gets a plain and a rotated
    MSE; with planted per-channel outliers, rotation must reduce the
    per-group fp4 error (the paper's motivation)."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=(128, 256)).astype(np.float32)
    x[:, [7, 130]] *= 12.0                       # outlier channels
    w = (rng.normal(size=(64, 256)) * 0.05).astype(np.float32)
    res = B.rotation_aware_sweep(x, w, n_bits=4)
    for name, cells in res.items():
        assert set(cells) == {"plain", "rotated"}
        assert all(np.isfinite(v) for v in cells.values()), name
    assert res["fp_e2"]["rotated"] < res["fp_e2"]["plain"], res["fp_e2"]

    res6 = B.rotation_aware_sweep(x, w, n_bits=6, block_rotate=False)
    assert "fp6_e2m3" in res6 and "fp6_e3m2" in res6
    assert res6["fp6_e2m3"]["rotated"] < res6["fp6_e2m3"]["plain"]


def test_motivation_plots_cli(tmp_path):
    """scripts/motivation_plots.py (the reference's `search/baseline/
    plot_*.py` studies as one CLI): the fc2 activation study must produce
    the full curve set with the dual-grid formats beating single-grid on
    GELU-shaped data, and the dist mode must emit its figure + MSE line."""
    import json
    import os
    import subprocess
    import sys

    script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                          "motivation_plots.py")
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")

    # fabricate a tiny calibration store: GELU(normal) inputs for fc2
    from fpqvar_tpu.quantize.calibration import CalibrationStore
    rng = np.random.default_rng(0)
    store = CalibrationStore(str(tmp_path / "calib"))
    depth, c = 1, 256
    for step in range(2):
        g = rng.normal(size=(depth, 4, 3, c)).astype(np.float32)
        gelu = g * 0.5 * (1.0 + np.tanh(0.7978845608 * (g + 0.044715 * g**3)))
        store.append_run([{ "fc2": gelu }])

    out = tmp_path / "mse.json"
    r = subprocess.run(
        [sys.executable, script, "--plot", "mse", "--depth", "1",
         "--kind", "fc2", "--calib", str(tmp_path / "calib"),
         "--out", str(out)],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    data = json.loads(out.read_text())
    assert set(data["curves"]) == {"E1M2 / INT4", "E2M1", "E3M0", "AFPQ",
                                   "DFQ", "NegReverse"}
    assert os.path.exists(str(out)[:-5] + ".png")
    # the paper's fc2 motivation: dual-grid beats every single grid
    assert data["means"]["DFQ"] < data["means"]["E2M1"]
    assert data["means"]["DFQ"] < data["means"]["E1M2 / INT4"]

    r = subprocess.run(
        [sys.executable, script, "--plot", "dist", "--depth", "1",
         "--kind", "mat_qkv", "--block", "0",
         "--out", str(tmp_path / "dist.png")],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "dist.png").exists()
    assert "mse_int4_per_tensor" in r.stdout

    out_clip = tmp_path / "clip.json"
    r = subprocess.run(
        [sys.executable, script, "--plot", "clip", "--depth", "1",
         "--kind", "fc2", "--calib", str(tmp_path / "calib"),
         "--out", str(out_clip)],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    clip = json.loads(out_clip.read_text())
    assert set(clip["curves"]) == {"DFQ", "AFPQ", "E2M1"}
    assert all(0.5 <= clip["best"][k] <= 1.0 for k in clip["best"])
