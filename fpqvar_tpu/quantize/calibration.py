"""Calibration activation capture.

Replaces the reference's file-per-(label, block, step) torch.save
instrumentation baked into the baseline model package
(`models/basic_var.py:56-61,144-150`, `models/var.py:165-170`) with a
functional capture pass: one generation run returns, per scale step, the
stacked per-block inputs of the four quantized layer kinds plus the SiLU'd
class condition.  Artifacts are stored as one npz per (layer_kind, block,
step) — the layout the GALT trainer and format search consume (the reference
re-stacks its per-label files into exactly this shape,
`learnable_transformation_fc1_fp4.py:144-156`).
"""
from __future__ import annotations

import os
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from fpqvar_tpu.config import GenerateConfig, VARConfig
from fpqvar_tpu.models import var as V
from fpqvar_tpu.models import vqvae as vq

LAYER_KINDS = ("mat_qkv", "proj", "fc1", "fc2")


def capture_generation(
    params,
    vae_params,
    cfg: VARConfig,
    label_B,
    key,
    gen: GenerateConfig = GenerateConfig(),
    qrt=None,
) -> List[Dict[str, np.ndarray]]:
    """Run class-conditional generation capturing activation taps.

    Returns a list over scale steps; each element maps layer kind ->
    [depth, 2B, l_si, C] array (device->host transferred).  Mirrors the
    calibration pipeline of `evaluate.py:67-80` (which generates one image per
    label for 100 labels).
    """
    b = label_B.shape[0]
    key = jax.random.fold_in(key, 0)
    cond_BD, mod, lvl_pos, x = V.prepare_generation(params, cfg, label_B)
    cache = V.init_kv_cache(cfg, 2 * b, jnp.float32,
        kv_codec=qrt.kv_codec if qrt is not None else None)
    hw = cfg.patch_nums[-1]
    f_hat = jnp.zeros((b, cfg.vae.z_channels, hw, hw), jnp.float32)
    vae_q = vae_params["quantize"]

    all_taps: List[Dict[str, np.ndarray]] = []
    for st in V.GenStatics.all_steps(cfg):
        x_out, cache, taps = V.run_blocks(
            params, cfg, qrt, x, mod, cache, st.cur, capture=True)
        all_taps.append({k: np.asarray(v) for k, v in taps.items()})

        logits = V.head_logits(params, cfg, x_out.astype(jnp.float32), cond_BD)
        t = gen.cfg * (st.si / (cfg.num_scales - 1))
        logits = (1.0 + t) * logits[:b] - t * logits[b:]
        key, k1 = jax.random.split(key)
        from fpqvar_tpu.models.sampling import sample_with_top_k_top_p

        idx_Bl = sample_with_top_k_top_p(k1, logits, gen.top_k, gen.top_p)
        h = vq.embed_idx(vae_q, idx_Bl).transpose(0, 2, 1).reshape(
            b, cfg.vae.z_channels, st.pn, st.pn).astype(jnp.float32)
        f_hat, next_raw = vq.get_next_autoregressive_input(
            vae_q, cfg.vae, st.si, f_hat, h)
        if st.si == cfg.num_scales - 1:
            break
        pn_next = cfg.patch_nums[st.si + 1]
        nxt = next_raw.reshape(b, cfg.vae.z_channels, -1).transpose(0, 2, 1)
        we = params["word_embed"]
        nxt = V.linear(nxt, we["w"], we["b"])
        cur_end = st.cur + st.l
        nxt = nxt + lvl_pos[:, cur_end: cur_end + pn_next * pn_next]
        x = jnp.concatenate([nxt, nxt], axis=0)
    return all_taps


def capture_condition(params, cfg: VARConfig, labels) -> np.ndarray:
    """SiLU(class embedding) per label — the `cond` calibration of
    `models/var.py:165-170` (saved as SiLU(cond) there; ada_lin applies SiLU
    first)."""
    cond = jnp.take(params["class_emb"], jnp.asarray(labels), axis=0)
    return np.asarray(jax.nn.silu(cond))


class CalibrationStore:
    """npz-file artifact store keyed by (kind, block, step)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, kind: str, block: int, step: int) -> str:
        return os.path.join(self.root, f"{kind}_block{block}_step{step}.npz")

    def append_run(self, taps_per_step: List[Dict[str, np.ndarray]]) -> None:
        """Merge a capture run into the store (concatenating over batch)."""
        for step, taps in enumerate(taps_per_step):
            for kind, arr in taps.items():
                # store in f32: np.savez round-trips ml_dtypes bfloat16 as a
                # raw void dtype ("|V2") that poisons every later consumer
                arr = np.asarray(arr, np.float32)
                depth = arr.shape[0]
                for blk in range(depth):
                    p = self._path(kind, blk, step)
                    new = arr[blk]
                    if os.path.exists(p):
                        old = np.load(p)["x"]
                        new = np.concatenate([old, new], axis=0)
                    np.savez_compressed(p, x=new)

    def load(self, kind: str, block: int, step: int) -> np.ndarray:
        return np.load(self._path(kind, block, step))["x"]

    def steps(self, kind: str, block: int) -> int:
        s = 0
        while os.path.exists(self._path(kind, block, s)):
            s += 1
        return s
