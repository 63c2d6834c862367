"""Model family: one config-driven VAR + VQVAE (vs the reference's five
forked packages — SURVEY.md §2.4, §7)."""
from typing import Tuple

import jax

from fpqvar_tpu.config import VARConfig
from fpqvar_tpu.models import engine, sampling, var, vqvae  # noqa: F401
from fpqvar_tpu.models.engine import VARGenerator  # noqa: F401


def build_vae_var(key, cfg: VARConfig, dtype=None) -> Tuple[dict, dict]:
    """Random-init (vae_params, var_params) — equivalent surface to
    `models/__init__.py:9-39` build_vae_var; release weights come from
    fpqvar_tpu.utils.checkpoint conversion of the upstream .pth files."""
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    kv, kr = jax.random.split(key)
    vae_params = vqvae.init_vqvae_params(kv, cfg.vae)
    var_params = var.init_var_params(kr, cfg, dtype=dtype)
    return vae_params, var_params
