"""FP-format grid search over calibration data.

Re-implements the reference's `search/search_fp4_format.py:783-860` /
`search_fp6_format.py`: per block and layer kind, choose the
(weight_format, activation_format) pair minimizing the matmul-output MSE

    loss = mean((x W^T - Q_a(x) Q_w(W)^T)^2)

over the calibration activations.  Output is a JSON list with the exact
schema of the shipped `optimal_quantization_formats_*.json` files
([{"block_idx", "weight_format", "activation_format", "loss"}, ...]).
"""
from __future__ import annotations

import json
from functools import partial
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fpqvar_tpu.ops import quantizers as Q

#: reference search space for fp4 (`search_fp4_format.py:805-827`) in the
#: JSON naming (e1m2/e2m1/e3m0) mapped to our format names
FP4_SPACE = {"e1m2": "fp_e1", "e2m1": "fp_e2", "e3m0": "fp_e3"}
FP6_SPACE = {"e2m3": "fp6_e2m3", "e3m2": "fp6_e3m2"}


@partial(jax.jit,
         static_argnames=("w_fmt", "a_fmt", "group_size", "granularity"))
def _pair_loss(x, w, w_fmt: str, a_fmt: str, group_size: int,
               granularity: str = "per_group"):
    ref = x @ w.T
    qx = Q.fake_quant_fp(x, a_fmt, granularity=granularity,
                         group_size=group_size)
    qw = Q.fake_quant_fp(w, w_fmt, granularity=granularity,
                         group_size=group_size)
    return jnp.mean((ref - qx @ qw.T) ** 2)


def search_formats_for_block(
    acts: np.ndarray,           # [N, C] calibration activations
    weight: np.ndarray,         # [out, C]
    space: Dict[str, str] = FP4_SPACE,
    group_size: int = 128,
) -> Tuple[str, str, float]:
    """Returns (weight_format_name, act_format_name, loss) in JSON naming."""
    x = jnp.asarray(acts, jnp.float32)
    w = jnp.asarray(weight, jnp.float32)
    best = (None, None, float("inf"))
    for wn, wf in space.items():
        for an, af in space.items():
            loss = float(_pair_loss(x, w, wf, af, group_size))
            if loss < best[2]:
                best = (wn, an, loss)
    return best


def search_formats(
    store,                      # CalibrationStore
    weights: np.ndarray,        # [depth, out, C] stacked layer weights
    kind: str,
    space: Dict[str, str] = FP4_SPACE,
    max_samples: int = 1024,
    group_size: int = 128,
    seed: int = 0,
) -> List[dict]:
    """Full per-block search for one layer kind -> JSON-ready list."""
    depth = weights.shape[0]
    rng = np.random.default_rng(seed)
    results = []
    for blk in range(depth):
        steps = store.steps(kind, blk)
        xs = [store.load(kind, blk, s).reshape(-1, weights.shape[-1])
              for s in range(steps)]
        x = np.concatenate(xs, axis=0)
        if x.shape[0] > max_samples:
            x = x[rng.choice(x.shape[0], max_samples, replace=False)]
        wn, an, loss = search_formats_for_block(
            x, weights[blk], space, group_size)
        results.append({
            "block_idx": blk,
            "weight_format": wn,
            "activation_format": an,
            "loss": loss,
        })
    return results


def search_ada_formats(
    cond_acts: np.ndarray,      # [N, C] SiLU'd class-condition activations
    ada_weights: np.ndarray,    # [depth, 6C, C] stacked ada_lin weights
    space: Dict[str, str] = FP4_SPACE,
    granularity: str = "per_token",
    group_size: int = 128,
) -> List[dict]:
    """Format search for the AdaLN ``ada_lin`` condition input.

    Re-implements `search/search_fp_format_ada.py:396-469`: per block,
    choose the (weight_format, act_format) pair minimizing the MSE of
    ``silu(cond) @ W_ada^T`` after fake quantization.  The condition tensor
    comes from :func:`fpqvar_tpu.quantize.calibration.capture_condition`
    (the reference saves it per (block, step) but it is the same per-label
    vector every time).  Emits the same JSON schema as the linear-layer
    search.  Default granularity is per-token, matching the reference's ada
    study quantizers.
    """
    x = jnp.asarray(cond_acts, jnp.float32)
    results = []
    for blk in range(ada_weights.shape[0]):
        w = jnp.asarray(ada_weights[blk], jnp.float32)
        best = (None, None, float("inf"))
        for wn, wf in space.items():
            for an, af in space.items():
                loss = float(_pair_loss(x, w, wf, af, group_size,
                                        granularity))
                if loss < best[2]:
                    best = (wn, an, loss)
        results.append({
            "block_idx": blk,
            "weight_format": best[0],
            "activation_format": best[1],
            "loss": best[2],
        })
    return results


def save_formats_json(path: str, results: List[dict]) -> None:
    with open(path, "w") as f:
        json.dump(results, f, indent=4)


def load_formats_json(path: str) -> List[dict]:
    with open(path) as f:
        return json.load(f)


def formats_to_mixed_config(results: List[dict],
                            space: Dict[str, str] = FP4_SPACE) -> tuple:
    """JSON results -> per-block act-format tuple for
    QuantConfig.mixed_act_formats (the MixedFormat ablation wiring,
    `quant_utils.py:1256-1341`)."""
    return tuple(space[r["activation_format"]] for r in results)
