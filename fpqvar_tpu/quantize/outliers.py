"""Function-preserving activation-outlier planting.

The FPQVAR recipe exists because VAR-d30's block inputs have heavy-tailed
per-channel outliers (reference paper §3 motivation, readme_figs; the same
statistics our `scripts/motivation_plots.py` reproduces from calibration
captures).  Small models trained on synthetic data have none, so every
quantization mode measures lossless end-to-end (STUDY_quality_ladder.json
round 3) and the recipe's value is invisible.

`plant_activation_outliers` retrofits d30-like statistics onto ANY trained
model without changing its function: for a scale vector ``s`` over hidden
channels it rewrites

    x1 = LN(x) * (1 + scale1) + shift1        (the mat_qkv input)
    x2 = LN(x) * (1 + scale2) + shift2        (the fc1 input)

to produce ``s * x1`` / ``s * x2`` (by scaling the ada_lin rows that emit
scale1/2 and shift1/2) while dividing the input columns of ``mat_qkv_w`` /
``fc1_w`` by ``s``.  In exact arithmetic the block output is unchanged;
what changes is the tensor every act quantizer, rotation, and GALT vector
actually sees — hot channels now dominate group absmaxes exactly the way
the reference's calibration captures show.  This is the standard
smoothing-equivalence (SmoothQuant/AWQ) run in REVERSE: instead of folding
outliers out of the model, it folds them in.

Only non-shared-AdaLN models are supported (the quality-ladder
configuration); shared-AdaLN (512-family) would need the same rewrite on
``shared_ada_lin`` + ``ada_gss``.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def outlier_scale_vector(width: int, num_hot: int, max_scale: float,
                         seed: int = 0) -> np.ndarray:
    """[width] f32 vector: 1.0 everywhere except ``num_hot`` random channels
    with log-spaced scales in [max_scale**0.5, max_scale] — a heavy tail
    rather than one uniform spike, mirroring the spread of per-channel
    absmax ratios in real VAR calibration data."""
    rng = np.random.default_rng(seed)
    s = np.ones(width, np.float32)
    hot = rng.choice(width, size=num_hot, replace=False)
    if num_hot == 1:
        # np.logspace(num=1) returns only the START point — a single hot
        # channel must still get the full max_scale
        s[hot] = np.float32(max_scale)
    else:
        s[hot] = np.logspace(0.5 * np.log10(max_scale), np.log10(max_scale),
                             num_hot).astype(np.float32)
    return s


def plant_activation_outliers(
    var_p, cfg, s: np.ndarray,
) -> Tuple[dict, np.ndarray]:
    """Return (params with outliers planted, the scale vector used).

    Exact-arithmetic invariance: ada_lin's scale1/scale2 rows become
    ``s*(1+scale)-1`` (affine: w*=s, b=s*b+(s-1)), shift rows scale by
    ``s``, and mat_qkv_w / fc1_w input columns divide by ``s``.
    """
    if "ada_lin" not in var_p["blocks"]:
        raise ValueError("plant_activation_outliers: non-shared AdaLN "
                         "models only (no blocks['ada_lin'])")
    c = cfg.width
    assert s.shape == (c,)
    blocks = dict(var_p["blocks"])
    ada = {k: np.asarray(v, np.float32)
           for k, v in blocks["ada_lin"].items()}
    w, b = ada["w"].copy(), ada["b"].copy()   # [d, 6C, D], [d, 6C]
    # sections of the 6C output: gamma1, gamma2, scale1, scale2, shift1,
    # shift2 (models/var.py compute_modulations -> block unpack order)
    for sec in (2, 3):          # scale1 / scale2: (1+scale') = s * (1+scale)
        w[:, sec * c:(sec + 1) * c, :] *= s[None, :, None]
        b[:, sec * c:(sec + 1) * c] = (s[None, :] * b[:, sec * c:(sec + 1) * c]
                                       + (s[None, :] - 1.0))
    for sec in (4, 5):          # shift1 / shift2: shift' = s * shift
        w[:, sec * c:(sec + 1) * c, :] *= s[None, :, None]
        b[:, sec * c:(sec + 1) * c] *= s[None, :]
    blocks["ada_lin"] = {"w": w, "b": b}
    inv = (1.0 / s).astype(np.float32)
    for kind in ("mat_qkv_w", "fc1_w"):       # [d, out, C]: cols / s
        blocks[kind] = np.asarray(blocks[kind], np.float32) * inv[None, None]
    out = dict(var_p)
    out["blocks"] = blocks
    return out, s
