"""VAR training: loss, schedules, optimizer, sharded train step.

The reference carries upstream-VAR training utilities that are dormant in the
quantization pipeline (`utils/lr_control.py`, `utils/amp_sc.py`,
`utils/misc.py` — SURVEY.md §2.1 #17).  Here they are live, TPU-native:
optax AdamW, the reference's warmup + {cos, lin*, exp} LR annealing with
cosine weight-decay annealing (`utils/lr_control.py:10-49`), and a train step
that jit-compiles over a {dp, tp} mesh (bf16 compute, f32 master params —
replacing the torch AMP scaler machinery of `utils/amp_sc.py`).
"""
from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from fpqvar_tpu.config import VARConfig
from fpqvar_tpu.models import var as V


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def cross_entropy_loss(
    logits: jnp.ndarray,        # [B, L, V] f32
    targets: jnp.ndarray,       # [B, L] int
    label_smoothing: float = 0.0,
) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        smooth = -jnp.mean(logp, axis=-1)
        nll = (1 - label_smoothing) * nll + label_smoothing * smooth
    return jnp.mean(nll)


def lr_wd_schedule(
    sche_type: str, peak_lr: float, wd: float, wd_end: float,
    cur_it: int, wp_it: int, max_it: int,
    wp0: float = 0.005, wpe: float = 0.001,
) -> Tuple[float, float]:
    """Faithful port of `utils/lr_control.py:10-49` (lr multiplier after
    warmup + cosine wd annealing), returned as (lr, wd) scalars."""
    wp_it = round(wp_it)
    if cur_it < wp_it:
        cur_lr = wp0 + (1 - wp0) * cur_it / wp_it
    else:
        pasd = (cur_it - wp_it) / (max_it - 1 - wp_it)
        rest = 1 - pasd
        if sche_type == "cos":
            cur_lr = wpe + (1 - wpe) * (0.5 + 0.5 * math.cos(math.pi * pasd))
        elif sche_type == "lin":
            t = 0.15
            cur_lr = 1.0 if pasd < t else wpe + (1 - wpe) * rest / (1 - t)
        elif sche_type == "lin0":
            t = 0.05
            cur_lr = 1.0 if pasd < t else wpe + (1 - wpe) * rest / (1 - t)
        elif sche_type == "lin00":
            cur_lr = wpe + (1 - wpe) * rest
        elif sche_type.startswith("lin"):
            t = float(sche_type[3:])
            max_rest = 1 - t
            wpe_mid = wpe + (1 - wpe) * max_rest
            wpe_mid = (1 + wpe_mid) / 2
            if pasd < t:
                cur_lr = 1 + (wpe_mid - 1) * pasd / t
            else:
                cur_lr = wpe + (wpe_mid - wpe) * rest / max_rest
        elif sche_type == "exp":
            t = 0.15
            if pasd < t:
                cur_lr = 1.0
            else:
                cur_lr = math.exp((pasd - t) / (1 - t) * math.log(wpe))
        else:
            raise NotImplementedError(f"unknown sche_type {sche_type}")
    lr = cur_lr * peak_lr
    pasd = cur_it / (max_it - 1)
    cur_wd = wd_end + (wd - wd_end) * (0.5 + 0.5 * math.cos(math.pi * pasd))
    return lr, cur_wd


def make_optimizer(
    peak_lr: float = 1e-4, wd: float = 0.05, b1: float = 0.9, b2: float = 0.95,
    grad_clip: float = 2.0, schedule=None,
) -> optax.GradientTransformation:
    """AdamW with grad-norm clipping (upstream VAR defaults: betas (0.9,0.95),
    clip 2.0 — `utils/arg_util.py`)."""
    lr = schedule if schedule is not None else peak_lr
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(lr, b1=b1, b2=b2, weight_decay=wd),
    )


def make_train_state(params, optimizer: optax.GradientTransformation):
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


def loss_fn(
    params, cfg: VARConfig, qrt, label_B, x_teacher, targets,
    cond_drop_key=None, label_smoothing: float = 0.0,
    mixed_precision: bool = False, remat: bool = False,
):
    """Teacher-forcing CE loss with classifier-free-guidance label dropout
    (`models/var.py:229`: labels replaced by num_classes w.p.
    cond_drop_rate).  ``mixed_precision`` runs the forward in bf16 (MXU
    rate) off f32 master params — the TPU replacement for the reference's
    torch AMP scaler (`utils/amp_sc.py:15`; bf16 needs no loss scaling);
    the loss itself is reduced in f32.  ``remat`` rematerializes per-block
    activations on backward (jax.checkpoint over the block scan): one
    extra forward of FLOPs for ~depth x less activation HBM."""
    if cond_drop_key is not None and cfg.cond_drop_rate > 0:
        drop = jax.random.bernoulli(
            cond_drop_key, cfg.cond_drop_rate, label_B.shape)
        label_B = jnp.where(drop, cfg.num_classes, label_B)
    fwd = params
    if mixed_precision:
        fwd = jax.tree_util.tree_map(
            lambda v: v.astype(jnp.bfloat16)
            if v.dtype == jnp.float32 else v, params)
        x_teacher = x_teacher.astype(jnp.bfloat16)
    logits = V.var_forward(fwd, cfg, qrt, label_B, x_teacher, remat=remat)
    return cross_entropy_loss(
        logits.astype(jnp.float32), targets, label_smoothing)


def train_step(
    state: TrainState, cfg: VARConfig, optimizer, batch: Dict[str, Any],
    qrt=None, key=None, mixed_precision: bool = False,
    label_smoothing: float = 0.0, remat: bool = False,
):
    """One optimization step.  ``batch`` = {"label": [B], "x": [B, L-1st, Cvae],
    "targets": [B, L]}.  jit/shard outside (see fpqvar_tpu.parallel)."""
    loss, grads = jax.value_and_grad(loss_fn)(
        state.params, cfg, qrt, batch["label"], batch["x"], batch["targets"],
        cond_drop_key=key, mixed_precision=mixed_precision,
        label_smoothing=label_smoothing, remat=remat)
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), {"loss": loss}
