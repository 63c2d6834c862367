"""Multi-scale VQVAE tokenizer (inference paths), TPU-native.

Functional re-design of the reference's `models/vqvae.py`, `models/basic_vae.py`
and `models/quant.py` (VectorQuantizer2): parameters are a plain pytree in
torch layout (convs OIHW, data NCHW) so the checkpoint converter is a direct
key mapping, and every method is a pure function jit-compatible and
shardable with `jax.sharding`.

Implemented surface (the inference/eval subset actually exercised by the
quantization pipeline, plus encode paths needed for calibration):

- ``decode``            — fhat_to_img (`vqvae.py:62-63`)
- ``encode``            — img -> f   (`vqvae.py:65-67` front half)
- ``f_to_idxBl``        — multi-scale tokenization (`quant.py:135-166`)
- ``get_next_autoregressive_input`` — residual-pyramid update
  (`quant.py:187-196`)
- ``embed_idx``         — codebook lookup
- ``idxBl_to_var_input``— teacher-forcing input (`quant.py:169-184`)

The bicubic/area interpolations use the torch-parity matrix operators in
:mod:`fpqvar_tpu.ops.resize` (a known numerical trap — SURVEY.md §7).
"""
from __future__ import annotations

import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fpqvar_tpu.config import VQVAEConfig
from fpqvar_tpu.ops.resize import resize2d, upsample2x_nearest

Array = jnp.ndarray
_DN = ("NCHW", "OIHW", "NCHW")


# ---------------------------------------------------------------------------
# Primitive layers (params in torch layout)
# ---------------------------------------------------------------------------

def conv2d(x: Array, p, stride: int = 1, padding=1) -> Array:
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=_DN,
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)[None, :, None, None]
    return y


def group_norm(x: Array, p, num_groups: int = 32, eps: float = 1e-6) -> Array:
    b, c, h, w = x.shape
    num_groups = min(num_groups, c)   # reference always has c >= 32
    xg = x.reshape(b, num_groups, c // num_groups, h, w).astype(jnp.float32)
    mean = jnp.mean(xg, axis=(2, 3, 4), keepdims=True)
    var = jnp.var(xg, axis=(2, 3, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    y = xg.reshape(b, c, h, w)
    y = y * p["w"][None, :, None, None] + p["b"][None, :, None, None]
    return y.astype(x.dtype)


def swish(x: Array) -> Array:
    return x * jax.nn.sigmoid(x)


def resnet_block(x: Array, p) -> Array:
    h = conv2d(swish(group_norm(x, p["norm1"])), p["conv1"])
    h = conv2d(swish(group_norm(h, p["norm2"])), p["conv2"])
    if "nin_shortcut" in p:
        x = conv2d(x, p["nin_shortcut"], padding=0)
    return x + h


def attn_block(x: Array, p) -> Array:
    """Single-head full attention over H*W positions
    (`models/basic_vae.py:63-92`)."""
    b, c, h, w = x.shape
    qkv = conv2d(group_norm(x, p["norm"]), p["qkv"], padding=0)
    q, k, v = jnp.split(qkv.reshape(b, 3 * c, h * w), 3, axis=1)
    att = jnp.einsum("bci,bcj->bij", q, k) * (c ** -0.5)
    att = jax.nn.softmax(att.astype(jnp.float32), axis=2).astype(x.dtype)
    out = jnp.einsum("bci,bij->bcj", v, att).reshape(b, c, h, w)
    return x + conv2d(out, p["proj_out"], padding=0)


def downsample2x(x: Array, p) -> Array:
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1)))
    return conv2d(x, p, stride=2, padding=0)


def upsample2x(x: Array, p) -> Array:
    return conv2d(upsample2x_nearest(x), p)


# ---------------------------------------------------------------------------
# Encoder / Decoder
# ---------------------------------------------------------------------------

def encoder_forward(params, cfg: VQVAEConfig, x: Array) -> Array:
    nres = len(cfg.ch_mult)
    h = conv2d(x, params["conv_in"])
    for i, level in enumerate(params["down"]):
        for j, blk in enumerate(level["block"]):
            h = resnet_block(h, blk)
            if level["attn"]:
                h = attn_block(h, level["attn"][j])
        if i != nres - 1:
            h = downsample2x(h, level["downsample"])
    h = resnet_block(h, params["mid"]["block_1"])
    h = attn_block(h, params["mid"]["attn_1"])
    h = resnet_block(h, params["mid"]["block_2"])
    return conv2d(swish(group_norm(h, params["norm_out"])), params["conv_out"])


def decoder_forward(params, cfg: VQVAEConfig, z: Array) -> Array:
    nres = len(cfg.ch_mult)
    h = conv2d(z, params["conv_in"])
    h = resnet_block(h, params["mid"]["block_1"])
    h = attn_block(h, params["mid"]["attn_1"])
    h = resnet_block(h, params["mid"]["block_2"])
    for i in reversed(range(nres)):
        level = params["up"][i]
        for j, blk in enumerate(level["block"]):
            h = resnet_block(h, blk)
            if level["attn"]:
                h = attn_block(h, level["attn"][j])
        if i != 0:
            h = upsample2x(h, level["upsample"])
    return conv2d(swish(group_norm(h, params["norm_out"])), params["conv_out"])


# ---------------------------------------------------------------------------
# Vector quantizer / residual pyramid
# ---------------------------------------------------------------------------

def phi_index(si: int, num_scales: int, share: int) -> int:
    """PhiPartiallyShared tick selection (`models/quant.py:218-226`)."""
    at = si / (num_scales - 1)
    k = share
    ticks = (np.linspace(1 / 3 / k, 1 - 1 / 3 / k, k) if k == 4
             else np.linspace(1 / 2 / k, 1 - 1 / 2 / k, k))
    return int(np.argmin(np.abs(ticks - at)))


def phi_conv(x: Array, p, quant_resi: float = 0.5) -> Array:
    """phi(x) = (1-r) x + r conv3x3(x)  (`models/quant.py:199-206`)."""
    r = abs(quant_resi)
    return x * (1.0 - r) + conv2d(x, p) * r


def embed_idx(qparams, idx: Array) -> Array:
    """Codebook lookup: idx [...] -> [..., Cvae]."""
    return jnp.take(qparams["embedding"], idx, axis=0)


def get_next_autoregressive_input(
    qparams, cfg: VQVAEConfig, si: int, f_hat: Array, h_BChw: Array
) -> Tuple[Array, Array]:
    """One residual-pyramid step (`models/quant.py:187-196`).

    si < last: upsample h bicubic to full res, phi-conv, add into f_hat,
    return (f_hat, area-downsample of f_hat to next scale).
    si == last: phi-conv at full res, add, return (f_hat, f_hat).
    """
    pns = cfg.patch_nums
    sn = len(pns)
    hw = pns[-1]
    pidx = phi_index(si, sn, cfg.share_quant_resi)
    phi_p = qparams["phi"][pidx]
    if si != sn - 1:
        h = phi_conv(resize2d(h_BChw, (hw, hw), "bicubic"), phi_p,
                     cfg.quant_resi)
        f_hat = f_hat + h
        nxt = resize2d(f_hat, (pns[si + 1], pns[si + 1]), "area")
        return f_hat, nxt
    h = phi_conv(h_BChw, phi_p, cfg.quant_resi)
    f_hat = f_hat + h
    return f_hat, f_hat


def _nearest_code(qparams, z_NC: Array, using_znorm: bool) -> Array:
    emb = qparams["embedding"]  # (V, C)
    if using_znorm:
        z = z_NC / jnp.linalg.norm(z_NC, axis=-1, keepdims=True)
        e = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        return jnp.argmax(z @ e.T, axis=1)
    d = (jnp.sum(z_NC ** 2, axis=1, keepdims=True)
         + jnp.sum(emb ** 2, axis=1)[None, :]
         - 2.0 * (z_NC @ emb.T))
    return jnp.argmin(d, axis=1)


def f_to_idxBl(qparams, cfg: VQVAEConfig, f_BChw: Array) -> List[Array]:
    """Multi-scale tokenization of an encoder feature map
    (`models/quant.py:135-166`)."""
    pns = cfg.patch_nums
    sn = len(pns)
    b, c, hh, ww = f_BChw.shape
    f_rest = f_BChw
    f_hat = jnp.zeros_like(f_rest)
    idx_list = []
    for si, pn in enumerate(pns):
        z = f_rest if si == sn - 1 else resize2d(f_rest, (pn, pn), "area")
        z_NC = z.transpose(0, 2, 3, 1).reshape(-1, c)
        idx_N = _nearest_code(qparams, z_NC, cfg.using_znorm)
        h = embed_idx(qparams, idx_N.reshape(b, pn, pn)).transpose(0, 3, 1, 2)
        if si != sn - 1:
            h = resize2d(h, (hh, ww), "bicubic")
        h = phi_conv(h, qparams["phi"][phi_index(si, sn, cfg.share_quant_resi)],
                     cfg.quant_resi)
        f_hat = f_hat + h
        f_rest = f_rest - h
        idx_list.append(idx_N.reshape(b, pn * pn))
    return idx_list


def idxBl_to_var_input(qparams, cfg: VQVAEConfig, idx_list: List[Array]) -> Array:
    """Teacher-forcing input for VAR training (`models/quant.py:169-184`)."""
    pns = cfg.patch_nums
    sn = len(pns)
    b = idx_list[0].shape[0]
    c = cfg.z_channels
    hw = pns[-1]
    f_hat = jnp.zeros((b, c, hw, hw), dtype=jnp.float32)
    outs = []
    for si in range(sn - 1):
        pn = pns[si]
        h = embed_idx(qparams, idx_list[si]).transpose(0, 2, 1)
        h = h.reshape(b, c, pn, pn)
        h = resize2d(h, (hw, hw), "bicubic")
        f_hat = f_hat + phi_conv(
            h, qparams["phi"][phi_index(si, sn, cfg.share_quant_resi)],
            cfg.quant_resi)
        pn_next = pns[si + 1]
        outs.append(
            resize2d(f_hat, (pn_next, pn_next), "area")
            .reshape(b, c, -1).transpose(0, 2, 1))
    return jnp.concatenate(outs, axis=1)


# ---------------------------------------------------------------------------
# Top level
# ---------------------------------------------------------------------------

def encode(params, cfg: VQVAEConfig, img: Array) -> Array:
    f = encoder_forward(params["encoder"], cfg, img)
    return conv2d(f, params["quant_conv"])


def decode(params, cfg: VQVAEConfig, f_hat: Array) -> Array:
    """fhat_to_img: returns images in [-1, 1] (`models/vqvae.py:62-63`)."""
    z = conv2d(f_hat, params["post_quant_conv"])
    return jnp.clip(decoder_forward(params["decoder"], cfg, z), -1.0, 1.0)


def img_to_idxBl(params, cfg: VQVAEConfig, img: Array) -> List[Array]:
    return f_to_idxBl(params["quantize"], cfg, encode(params, cfg, img))


# ---------------------------------------------------------------------------
# Initialization (for tests and training-from-scratch; release checkpoints
# come from the converter in fpqvar_tpu.utils.checkpoint)
# ---------------------------------------------------------------------------

def _conv_init(key, o, i, k):
    fan_in = i * k * k
    std = 1.0 / math.sqrt(fan_in)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (o, i, k, k), jnp.float32, -std, std),
        "b": jax.random.uniform(kb, (o,), jnp.float32, -std, std),
    }


def _gn_init(c):
    return {"w": jnp.ones((c,)), "b": jnp.zeros((c,))}


def _resnet_init(key, cin, cout):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm1": _gn_init(cin), "conv1": _conv_init(k1, cout, cin, 3),
        "norm2": _gn_init(cout), "conv2": _conv_init(k2, cout, cout, 3),
    }
    if cin != cout:
        p["nin_shortcut"] = _conv_init(k3, cout, cin, 1)
    return p


def _attn_init(key, c):
    k1, k2 = jax.random.split(key)
    return {
        "norm": _gn_init(c),
        "qkv": _conv_init(k1, 3 * c, c, 1),
        "proj_out": _conv_init(k2, c, c, 1),
    }


def init_vqvae_params(key, cfg: VQVAEConfig):
    keys = iter(jax.random.split(key, 256))
    nres = len(cfg.ch_mult)
    ch = cfg.ch

    # encoder
    enc = {"conv_in": _conv_init(next(keys), ch, 3, 3), "down": []}
    in_mult = (1,) + tuple(cfg.ch_mult)
    for i in range(nres):
        cin, cout = ch * in_mult[i], ch * cfg.ch_mult[i]
        level = {"block": [], "attn": []}
        for j in range(cfg.num_res_blocks):
            level["block"].append(_resnet_init(next(keys), cin, cout))
            cin = cout
            if i == nres - 1:
                level["attn"].append(_attn_init(next(keys), cout))
        if i != nres - 1:
            level["downsample"] = _conv_init(next(keys), cout, cout, 3)
        enc["down"].append(level)
    cmid = ch * cfg.ch_mult[-1]
    enc["mid"] = {
        "block_1": _resnet_init(next(keys), cmid, cmid),
        "attn_1": _attn_init(next(keys), cmid),
        "block_2": _resnet_init(next(keys), cmid, cmid),
    }
    enc["norm_out"] = _gn_init(cmid)
    enc["conv_out"] = _conv_init(next(keys), cfg.z_channels, cmid, 3)

    # decoder
    dec = {"conv_in": _conv_init(next(keys), cmid, cfg.z_channels, 3)}
    dec["mid"] = {
        "block_1": _resnet_init(next(keys), cmid, cmid),
        "attn_1": _attn_init(next(keys), cmid),
        "block_2": _resnet_init(next(keys), cmid, cmid),
    }
    up = [None] * nres
    block_in = cmid
    for i in reversed(range(nres)):
        cout = ch * cfg.ch_mult[i]
        level = {"block": [], "attn": []}
        for j in range(cfg.num_res_blocks + 1):
            level["block"].append(_resnet_init(next(keys), block_in, cout))
            block_in = cout
            if i == nres - 1:
                level["attn"].append(_attn_init(next(keys), cout))
        if i != 0:
            level["upsample"] = _conv_init(next(keys), cout, cout, 3)
        up[i] = level
    dec["up"] = up
    dec["norm_out"] = _gn_init(block_in)
    dec["conv_out"] = _conv_init(next(keys), 3, block_in, 3)

    quant = {
        "embedding": jax.random.normal(
            next(keys), (cfg.vocab_size, cfg.z_channels)) * 0.02,
        "phi": [
            _conv_init(next(keys), cfg.z_channels, cfg.z_channels, 3)
            for _ in range(cfg.share_quant_resi)
        ],
    }
    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv_init(next(keys), cfg.z_channels, cfg.z_channels, 3),
        "post_quant_conv": _conv_init(
            next(keys), cfg.z_channels, cfg.z_channels, 3),
        "quantize": quant,
    }
