"""Parity: the device-traceable offline transform (recipe.transform_blocks_
traced, used by bench.py's on-device param build) vs the host-side
bit-parity pipeline (recipe.quantize_var_params).

Two regimes:
- no rotation: both paths do the same f32 math -> bit-exact codes/scales;
- with rotation: traced rotates in f32 (TPUs have no f64), host in f64 ->
  pre-quant weights differ ~1e-7 relative, so a handful of grid-boundary
  elements may snap to the adjacent code.  Assert near-total code equality
  and tight scale agreement instead of bit parity.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fpqvar_tpu.config import (QuantConfig, VARConfig, VQVAEConfig,
                               fpqvar_w4a4, fpqvar_w4a16)
from fpqvar_tpu.models.var import init_var_params
from fpqvar_tpu.quantize.recipe import (quantize_var_params,
                                        transform_blocks_traced)

TINY = VARConfig(
    depth=2, embed_dim=128, num_heads=2, patch_nums=(1, 2, 3),
    vae=VQVAEConfig(vocab_size=64, z_channels=8, ch=16, ch_mult=(1, 2),
                    num_res_blocks=1, patch_nums=(1, 2, 3)),
)


@pytest.fixture(scope="module")
def var_p():
    return init_var_params(jax.random.PRNGKey(3), TINY, dtype=jnp.bfloat16)


def _galt(rng=7):
    r = np.random.RandomState(rng)
    # realistic non-unit GALT vectors (positive, spread over ~[0.5, 2])
    return (np.exp(r.uniform(-0.7, 0.7, (TINY.depth, TINY.embed_dim))
                   ).astype(np.float32),
            np.exp(r.uniform(-0.7, 0.7, (TINY.depth, TINY.embed_dim))
                   ).astype(np.float32))


def _run_both(var_p, qcfg, galt=None):
    host = quantize_var_params(var_p, TINY, qcfg, galt=galt)["blocks"]
    galt_j = (tuple(jnp.asarray(g) for g in galt)
              if galt is not None else None)
    traced = jax.jit(
        lambda b: transform_blocks_traced(b, TINY, qcfg, galt=galt_j)
    )(var_p["blocks"])
    return host, traced


def _compare(host, traced, exact, ignore=()):
    hl, ht = jax.tree_util.tree_flatten_with_path(host)
    tl, tt = jax.tree_util.tree_flatten_with_path(traced)
    assert ht == tt, "tree structures differ"
    for (ph, h), (pt, t) in zip(hl, tl):
        name = jax.tree_util.keystr(ph)
        if any(k in name for k in ignore):
            continue
        h = np.asarray(h)
        t = np.asarray(t)
        assert h.shape == t.shape, f"{name}: {h.shape} vs {t.shape}"
        if np.issubdtype(h.dtype, np.integer):
            frac = float(np.mean(h != t))
            lim = 0.0 if exact else 2e-3
            assert frac <= lim, f"{name}: {frac:.2%} codes differ"
        else:
            hf = h.astype(np.float32)
            tf = t.astype(np.float32)
            scale = max(float(np.max(np.abs(hf))), 1e-6)
            # traced fake weights come back in bf16 (the dtype every
            # consumer casts to) -> allow bf16 rounding even in the
            # "exact" (no-rotation) regime
            tol = 6e-3 if t.dtype == jnp.bfloat16 else (
                1e-6 if exact else 1e-4)
            err = float(np.max(np.abs(hf - tf))) / scale
            assert err <= tol, f"{name}: rel err {err:.2e} > {tol}"


# untouched leaves (attn biases, norms, embeddings) must pass through
# bit-identically in every mode; quantized-weight leaves are covered by
# the integer/float branches above.

def test_bf16_mode_is_identity(var_p):
    host, traced = _run_both(var_p, QuantConfig())
    _compare(host, traced, exact=True)


def test_w4a16_no_rotation_bit_exact(var_p):
    # w4a16: int8 backend, per-channel, no rotate/transform -> same f32
    # math on both paths, codes and scales must be bit-equal
    host, traced = _run_both(var_p, fpqvar_w4a16())
    _compare(host, traced, exact=True)


def test_int8chs_full_recipe(var_p):
    qcfg = fpqvar_w4a4().replace(backend="int8", weight_quant="per_channel",
                                 act_quant="per_token", fc2_format="fp_e2")
    host, traced = _run_both(var_p, qcfg, galt=_galt())
    _compare(host, traced, exact=False)


def test_packed_full_recipe(var_p):
    host, traced = _run_both(var_p, fpqvar_w4a4().replace(backend="packed"),
                             galt=_galt())
    _compare(host, traced, exact=False)


def test_fake_full_recipe(var_p):
    host, traced = _run_both(var_p, fpqvar_w4a4(), galt=_galt())
    # fake backend quantizes then dequantizes: a boundary element that
    # snaps to the adjacent fp4 grid point moves a full grid step (~2^-2
    # relative), so compare fraction-close instead of max-err
    hl = jax.tree_util.tree_leaves(host)
    tl = jax.tree_util.tree_leaves(traced)
    for h, t in zip(hl, tl):
        h = np.asarray(h, np.float32)
        t = np.asarray(t, np.float32)
        scale = max(float(np.max(np.abs(h))), 1e-6)
        close = np.abs(h - t) <= 6e-3 * scale
        assert float(np.mean(close)) >= 0.998


def test_quantize_ada(var_p):
    qcfg = fpqvar_w4a16().replace(quantize_ada=True)
    host, traced = _run_both(var_p, qcfg)
    _compare(host, traced, exact=True)
