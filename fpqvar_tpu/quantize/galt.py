"""GALT — GHT-Aware Learnable Transformation: training and artifact IO.

Re-implements the reference's per-block smoothing-vector optimization
(`learnable_transformation/learnable_transformation_fc1_fp4.py:136-255`):

    per block: s in R^C (init ones), AdamW lr=0.01, 50 epochs,
    one optimizer step per scale step per epoch, loss
      mean((x W^T - Q((x*s) @ Q_h) Q((W/s) @ Q_h)^T)^2)
    with STE through Q; keep the s of the best epoch.

TPU-native differences: optax AdamW + jit'd update (the loss/step structure
is identical); the Hadamard is always the block-diagonal matrix — matching
the fc1 scripts (`fc1_fp4.py:160-168`) and the shipped evaluation path
(block rotation for both mat_qkv and fc1, `rotation_utils.py:224-240`).
The reference's mat_qkv script used a full-size Hadamard
(`learnable_transformation_mat_qkv_fp4.py:175`), which is incompatible with
the block-rotated runtime; we standardize on block rotation end-to-end.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fpqvar_tpu.ops.hadamard import apply_block_hadamard, block_hadamard_block
from fpqvar_tpu.quantize.ste import fp_quant_ste, int_sym_ste


def make_quant_ste(w_bit: int, fmt: Optional[str] = None,
                   group_size: int = 128):
    """fp4 -> e2m1 STE (FPQuant, `fc1_fp4.py:70-95`); fp6 -> e2m3 STE; int ->
    SymQuant."""
    if fmt is None:
        fmt = {4: "fp_e2", 6: "fp6_e2m3"}.get(w_bit)
    if fmt is None:
        return int_sym_ste(w_bit, group_size)
    return fp_quant_ste(fmt, group_size)


def quant_error(x, w, s, q_block, quant):
    """compute_quant_error_v1 (`fc1_fp4.py:117-133`) with the block Hadamard
    applied as a 128-wide contraction."""
    fp = x @ w.T
    xq = quant(apply_block_hadamard(x * s, q_block))
    wq = quant(apply_block_hadamard(w / s, q_block))
    return jnp.mean((fp - xq @ wq.T) ** 2)


def train_galt_block(
    acts_per_step: Sequence[np.ndarray],   # list of [N, C] per scale step
    weight: np.ndarray,                    # [out, C]
    *,
    w_bit: int = 4,
    fmt: Optional[str] = None,
    lr: float = 0.01,
    epochs: int = 50,
    group_size: int = 128,
    rotation_seed: int = 42,
    rotation_block: int = 128,
) -> Tuple[np.ndarray, float]:
    """Optimize one block's smoothing vector; returns (best_s, best_loss)."""
    c = weight.shape[-1]
    q_block = jnp.asarray(
        block_hadamard_block(rotation_block, rotation_seed), jnp.float32)
    quant = make_quant_ste(w_bit, fmt, group_size)
    w = jnp.asarray(weight, jnp.float32)
    xs = [jnp.asarray(a, jnp.float32) for a in acts_per_step]

    opt = optax.adamw(lr)
    s = jnp.ones((c,), jnp.float32)
    opt_state = opt.init(s)

    @jax.jit
    def step(s, opt_state, x):
        loss, g = jax.value_and_grad(
            lambda ss: quant_error(x, w, ss, q_block, quant))(s)
        updates, opt_state = opt.update(g, opt_state, s)
        return optax.apply_updates(s, updates), opt_state, loss

    best_loss, best_s = float("inf"), s
    for _ in range(epochs):
        epoch_loss = 0.0
        for x in xs:
            s, opt_state, loss = step(s, opt_state, x)
            epoch_loss += float(loss)
        epoch_loss /= len(xs)
        if epoch_loss < best_loss:
            best_loss, best_s = epoch_loss, s
    return np.asarray(best_s), best_loss


def train_galt(
    store,                      # CalibrationStore
    weights: np.ndarray,        # [depth, out, C]
    kind: str,                  # "mat_qkv" or "fc1"
    *,
    w_bit: int = 4,
    max_samples_per_step: int = 256,
    seed: int = 0,
    **kw,
) -> np.ndarray:
    """Train all blocks -> [depth, C] best_s stack."""
    depth, _, c = weights.shape
    rng = np.random.default_rng(seed)
    out = []
    for blk in range(depth):
        steps = store.steps(kind, blk)
        acts = []
        for st in range(steps):
            a = store.load(kind, blk, st).reshape(-1, c)
            if a.shape[0] > max_samples_per_step:
                a = a[rng.choice(a.shape[0], max_samples_per_step,
                                 replace=False)]
            acts.append(a)
        s, loss = train_galt_block(acts, weights[blk], w_bit=w_bit, **kw)
        out.append(s)
    return np.stack(out)


# ---------------------------------------------------------------------------
# Artifact IO — including the reference's shipped .pt tensors
# ---------------------------------------------------------------------------

def load_reference_best_s(path: str) -> np.ndarray:
    """Load a reference best_s .pt artifact (list of depth [C] tensors,
    `fc1_fp4.py:255`; shipped under best_lambda_var{30,36}/) -> [depth, C]."""
    import torch

    tensors = torch.load(path, map_location="cpu", weights_only=False)
    return np.stack([t.detach().to(torch.float32).numpy() for t in tensors])


def save_best_s(path: str, s: np.ndarray) -> None:
    np.savez_compressed(path, best_s=s)


def load_best_s(path: str) -> np.ndarray:
    return np.load(path)["best_s"]


def load_best_s_pair(best_s_dir: str, bit: int):
    """Load the (mat_qkv, fc1) best_s pair from a directory, preferring our
    .npz artifacts over the reference's .pt (`best_lambda_var{30,36}/`).

    Single loader shared by every CLI (evaluate/serve/convert) so they all
    resolve the SAME artifact given the same directory; raises FileNotFoundError
    with the candidate paths when one kind is missing.
    """
    import os

    out = []
    for kind in ("mat_qkv", "fc1"):
        candidates = [
            (os.path.join(best_s_dir, f"{kind}_best_s_fp{bit}.npz"),
             load_best_s),
            (os.path.join(best_s_dir, f"{kind}_best_s_fp{bit}.pt"),
             load_reference_best_s),
        ]
        for path, loader in candidates:
            if os.path.exists(path):
                out.append(loader(path))
                break
        else:
            raise FileNotFoundError(
                f"no {kind} best_s artifact; looked for "
                + " , ".join(p for p, _ in candidates))
    return tuple(out)
