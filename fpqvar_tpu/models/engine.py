"""Generation engine: jit-compiled multi-scale decode.

Replaces the reference's eager per-class python loop
(`evaluate_fp_quant_transform_rotate.py:187-199` calling
`VAR.autoregressive_infer_cfg`).  Each of the 10 scale steps is a
static-shape jitted program (KV cache preallocated, step geometry baked in),
compiled once and reused for all 1000 classes; the VQVAE decode is a separate
jitted program.  Under a device mesh the same engine runs dp/tp-sharded (see
fpqvar_tpu.parallel).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from fpqvar_tpu.config import GenerateConfig, QuantConfig, VARConfig
from fpqvar_tpu.models import var as V
from fpqvar_tpu.models import vqvae as vq
from fpqvar_tpu.quantize.runtime import QuantRuntime, build_runtime


def _fold0(key):
    """fold_in(., 0) for either one key or [B, 2] per-row keys."""
    if key.ndim == 2:
        return jax.vmap(lambda k: jax.random.fold_in(k, 0))(key)
    return jax.random.fold_in(key, 0)


class VARGenerator:
    """Holds jitted step functions for one (model, quant, sampling) config."""

    def __init__(
        self,
        cfg: VARConfig,
        qcfg: QuantConfig,
        gen: GenerateConfig = GenerateConfig(),
        qrt: Optional[QuantRuntime] = None,
        cache_dtype=jnp.bfloat16,
        compute_dtype=jnp.bfloat16,
        mesh=None,
        shardings=None,
        fuse_steps: bool = True,
    ):
        """``fuse_steps=True`` traces the full 10-scale decode (including
        sampling and the VQVAE residual pyramid) into ONE jitted program —
        one device dispatch per generation instead of ~12, and XLA gets the
        whole schedule to overlap.  ``False`` keeps per-scale programs
        (smaller compiles; used by tools that intervene between steps)."""
        self.cfg = cfg
        self.qcfg = qcfg
        self.gen = gen
        self.qrt = (qrt if qrt is not None
                    else build_runtime(qcfg, cfg.depth, cfg.width))
        if mesh is not None and self.qrt is not None:
            import dataclasses

            # enable the shard_map'ed TP path for quantized-weight GEMMs
            self.qrt = dataclasses.replace(self.qrt, mesh=mesh)
        self.cache_dtype = cache_dtype
        self.compute_dtype = compute_dtype
        self.statics = V.GenStatics.all_steps(cfg)
        self.mesh = mesh
        self.shardings = shardings
        self.fuse_steps = fuse_steps

        def _step(st, params, vae_qparams, x, cond_BD, mod, lvl_pos,
                  cache, f_hat, key):
            nxt, cache, f_hat, key = V.scale_step(
                params, vae_qparams, cfg, self.qrt, gen, st,
                x, cond_BD, mod, lvl_pos, cache, f_hat, key)
            return nxt, cache, f_hat, key

        # donate the KV cache and f_hat (threaded through the scale loop);
        # arg order after the bound `st`: params, vae_q, x, cond, mod,
        # lvl_pos, cache(6), f_hat(7), key
        self._steps = [
            jax.jit(partial(_step, st), donate_argnums=(6, 7))
            for st in self.statics
        ]
        self._prepare = jax.jit(
            partial(V.prepare_generation, cfg=cfg, qrt=self.qrt))
        self._decode = jax.jit(
            lambda vae_params, f_hat: (
                vq.decode(vae_params, cfg.vae, f_hat) + 1.0) * 0.5
        )

        def _constrain_cache(cache):
            """Pin the KV cache's mesh layout (batch over dp, heads over tp
            for the packed head-major codes — parallel.kv_cache_shardings)
            instead of leaving it to propagation from the params."""
            if self.mesh is None or "tp" not in self.mesh.shape:
                return cache
            from fpqvar_tpu.parallel import kv_cache_shardings

            sh = kv_cache_shardings(
                self.mesh, packed=self.qrt.kv_codec is not None)
            return jax.tree_util.tree_map(
                lambda a: jax.lax.with_sharding_constraint(a, sh), cache)

        self._constrain_cache = _constrain_cache

        def _fused(params, vae_qparams, label_B, key):
            b = label_B.shape[0]
            key = _fold0(key)                 # match the stepwise path
            cond_BD, mod, lvl_pos, x = V.prepare_generation(
                params, cfg, label_B, self.qrt)
            x = x.astype(compute_dtype)
            mod = mod.astype(compute_dtype)
            lvl_pos = lvl_pos.astype(compute_dtype)
            cache = _constrain_cache(V.init_kv_cache(
                cfg, 2 * b, cache_dtype, kv_codec=self.qrt.kv_codec))
            hw = cfg.patch_nums[-1]
            f_hat = jnp.zeros((b, cfg.vae.z_channels, hw, hw), jnp.float32)
            for st in self.statics:
                x, cache, f_hat, key = V.scale_step(
                    params, vae_qparams, cfg, self.qrt, gen, st,
                    x, cond_BD, mod, lvl_pos, cache, f_hat, key)
                if x is not None:
                    x = x.astype(compute_dtype)
            return f_hat

        self._fused = jax.jit(_fused)

    def generate(
        self, params, vae_params, label_B, key, return_fhat: bool = False
    ):
        """Class-conditional generation -> images [B, 3, H, W] in [0, 1]
        (`var.py:134-217`)."""
        cfg = self.cfg
        b = label_B.shape[0]
        if self.fuse_steps:
            f_hat = self._fused(params, vae_params["quantize"], label_B, key)
            if return_fhat:
                return f_hat
            return self._decode(vae_params, f_hat)
        key = _fold0(key)                  # private copy; steps may donate
        cond_BD, mod, lvl_pos, x = self._prepare(
            params=params, label_B=label_B)
        x = x.astype(self.compute_dtype)
        mod = mod.astype(self.compute_dtype)
        lvl_pos = lvl_pos.astype(self.compute_dtype)
        cache = V.init_kv_cache(cfg, 2 * b, self.cache_dtype,
                                kv_codec=self.qrt.kv_codec)
        if self.mesh is not None and "tp" in self.mesh.shape:
            from fpqvar_tpu.parallel import kv_cache_shardings

            cache = jax.device_put(cache, kv_cache_shardings(
                self.mesh, packed=self.qrt.kv_codec is not None))
        hw = cfg.patch_nums[-1]
        f_hat = jnp.zeros((b, cfg.vae.z_channels, hw, hw), jnp.float32)
        vae_q = vae_params["quantize"]

        for st, step in zip(self.statics, self._steps):
            x, cache, f_hat, key = step(
                params, vae_q, x, cond_BD, mod, lvl_pos, cache, f_hat, key)
            if x is not None:
                x = x.astype(self.compute_dtype)
        if return_fhat:
            return f_hat
        return self._decode(vae_params, f_hat)
