"""VAR next-scale-prediction transformer, TPU-native.

One config-driven functional model replacing the reference's five forked
packages (`models/`, `models_quant/`, `models_fp_quant/`,
`models_fp_quant_rotate/`, `models_fp_quant_transform_rotate/` — SURVEY.md
§2.4).  Quantization, rotation and GALT smoothing are runtime config
(:class:`fpqvar_tpu.quantize.runtime.QuantRuntime`), not code forks.

Key structural citations into the reference:

- model hyperparameters/width rules: `models/__init__.py:9-39`
- VAR.__init__ (embeddings, pos, lvl, AdaLN blocks, head):
  `models/var.py:26-121`
- AdaLNSelfAttn forward (modulation + smooth + rotate):
  `models_fp_quant_transform_rotate/basic_var.py:253-269`
- SelfAttention (fused qkv + separate biases, L2-norm attention, KV cache):
  `models_fp_quant_transform_rotate/basic_var.py:128-219`
- FFN (fc1 -> tanh-GELU -> fc2): `basic_var.py:101-122`
- autoregressive_infer_cfg (scale loop, CFG, sampling, pyramid):
  `models_fp_quant_transform_rotate/var.py:134-217`

TPU-first design decisions (vs the reference):

- Block parameters are stacked along a leading ``depth`` axis and the layer
  loop is a single `jax.lax.scan` — one compiled block body instead of
  ``depth`` unrolled ones.
- The KV cache is a preallocated [depth, 2B, H, L, hd] tensor; each scale
  step writes its pn^2 new tokens at a *static* offset and attends over a
  statically-sliced prefix, so all 10 scale steps compile to static-shape
  programs (no concat-growing tensors).
- AdaLN modulations depend only on the class condition, so they are computed
  once per generation instead of per block per step
  (`basic_var.py:258` recomputes them depth x 10 times).
- The online block-Hadamard rotation is a single (…,128)x(128,128) MXU
  contraction (see fpqvar_tpu.ops.hadamard).
"""
from __future__ import annotations

import math
import os as _os
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fpqvar_tpu.config import GenerateConfig, VARConfig
from fpqvar_tpu.models import vqvae as vq
from fpqvar_tpu.models.sampling import gumbel_softmax, sample_with_top_k_top_p
from fpqvar_tpu.ops.hadamard import apply_block_hadamard
from fpqvar_tpu.ops.packing import PackedTensor

Array = jnp.ndarray


# ---------------------------------------------------------------------------
# Primitive ops
# ---------------------------------------------------------------------------

def linear(x: Array, w, b=None) -> Array:
    """torch-layout linear: w is (out, in)."""
    if isinstance(w, PackedTensor):
        from fpqvar_tpu.ops.pallas.quant_matmul import packed_linear

        y = packed_linear(x, w)
    else:
        y = x @ w.astype(x.dtype).T
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def layernorm_no_affine(x: Array, eps: float) -> Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def gelu_tanh(x: Array) -> Array:
    return jax.nn.gelu(x, approximate=True)


def _l2norm(x: Array) -> Array:
    # F.normalize(dim=-1) semantics: x / max(||x||, eps)
    n = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
    return (x.astype(jnp.float32) / jnp.maximum(n, 1e-12)).astype(x.dtype)


MAX_SCALE_MUL = math.log(100.0)


def _scan_unroll() -> int:
    """Block-scan unroll factor (FPQVAR_SCAN_UNROLL, default 1).  A
    latency knob for the batch-1 regime: unrolling lets XLA overlap
    consecutive blocks' small ops at the cost of a bigger program."""
    return int(_os.environ.get("FPQVAR_SCAN_UNROLL", "1"))


# ---------------------------------------------------------------------------
# Block forward
# ---------------------------------------------------------------------------

def _attention(
    q: Array, k: Array, v: Array, attn_bias: Optional[Array]
) -> Array:
    """q [B,l,H,c], k/v [B,M,H,c] -> [B,l,H*c]; softmax in f32, scale=1
    (attn_l2_norm) — `basic_var.py:137-142,211-217`.  Head-minor layouts
    contract directly (no transposes materialized)."""
    b, l, h, c = q.shape
    scores = jnp.einsum(
        "blhc,bmhc->bhlm", q, k, preferred_element_type=jnp.float32
    )
    if attn_bias is not None:
        scores = scores + attn_bias
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhlm,bmhc->blhc", probs, v)
    return out.reshape(b, l, h * c)


def block_forward(
    x: Array,
    bp: Dict[str, Any],
    mod: Array,                    # [6, B, 1, C] (gamma1,gamma2,s1,s2,b1,b2)
    qrt,                           # QuantRuntime or None
    cfg: VARConfig,
    cache: Optional[Dict[str, Array]] = None,
    # dense cache: {"k","v"} [B, L, H*c]; packed: {"kc","vc"} int8 codes
    # head-major [B, H, L*hd] + {"ks","vs"} [B, H, L] f32 scales (see
    # QuantRuntime.kv_codec and init_kv_cache)
    cur: int = 0,                  # static: tokens already cached
    attn_bias: Optional[Array] = None,
    capture: bool = False,
) -> Tuple[Array, Optional[Dict[str, Array]], Optional[Dict[str, Array]]]:
    """One AdaLNSelfAttn block (`basic_var.py:253-269`).

    Returns (new x, minimal KV-cache writes when caching — see the
    ``kv_update`` comment below, applied in place by run_blocks — and
    activation taps when ``capture``).  Taps mirror the reference's calibration capture in the
    baseline model package (`models/basic_var.py:56-61,144-150`): the inputs
    of mat_qkv, proj, fc1 and fc2 — recorded *after* smoothing/rotation/
    act-quant if those are enabled (for the baseline qrt=None they equal the
    reference's raw captures).
    """
    heads, hd = cfg.heads, cfg.head_dim
    b, l, c = x.shape
    gamma1, gamma2, scale1, scale2, shift1, shift2 = mod

    aq = qrt.act_q if qrt is not None else {}
    smooth = qrt is not None and qrt.transform
    rot = qrt.rotation_block if qrt is not None else None
    rot_full = qrt.rotation_full if qrt is not None else None

    def _q_then_lin(kind, xv, w, b=None):
        """Activation quant + linear for one layer kind.  int8-backend
        weights (IntPack) quantize to integer codes inside the kernel call;
        fake/packed paths apply the dequantizing act quantizer first.
        Quantized-weight GEMMs run tensor-parallel when qrt.mesh is set
        (Megatron column split for mat_qkv/fc1, row split for proj/fc2).
        Returns (y, activation-for-capture-tap)."""
        from fpqvar_tpu.ops.packing import DUAL_CODE_MULT, IntPack

        par = "col" if kind in ("mat_qkv", "fc1") else "row"
        mesh = qrt.mesh if qrt is not None else None
        if isinstance(w, IntPack):
            from fpqvar_tpu.ops.pallas.int8_matmul import (
                int8_linear, int8_linear_dual)

            fmt_a = qrt.act_fmts.get(kind) or w.fmt
            if fmt_a in DUAL_CODE_MULT:
                y = int8_linear_dual(xv, w, fmt_a, mesh=mesh, parallel=par)
            else:
                y = int8_linear(xv, w, fmt_a, mesh=mesh, parallel=par)
            if b is not None:
                y = y + b.astype(y.dtype)
            return y, xv
        if aq.get(kind) is not None:
            xv = aq[kind](xv)
        if isinstance(w, PackedTensor):
            from fpqvar_tpu.ops.pallas.quant_matmul import packed_linear

            y = packed_linear(xv, w, mesh=mesh, parallel=par)
            if b is not None:
                y = y + b.astype(y.dtype)
            return y, xv
        return linear(xv, w, b), xv

    # ---- attention branch
    x1 = layernorm_no_affine(x, cfg.norm_eps) * (1.0 + scale1) + shift1
    if smooth:
        x1 = x1 * bp["mat_qkv_s"].astype(x1.dtype)
    if rot is not None:
        x1 = apply_block_hadamard(x1, rot)
    elif rot_full is not None:
        x1 = x1 @ rot_full.astype(x1.dtype)
    qkv, x1t = _q_then_lin("mat_qkv", x1, bp["mat_qkv_w"])
    taps = {"mat_qkv": x1t} if capture else None
    bias = jnp.concatenate(
        [bp["q_bias"], jnp.zeros_like(bp["q_bias"]), bp["v_bias"]]
    )
    qkv = qkv + bias.astype(qkv.dtype)
    qkv = qkv.reshape(b, l, 3, heads, hd)
    # keep q/k/v in [B, l, H, c] layout end-to-end: the attention einsums
    # contract directly from it, and the KV cache stores [B, L, H*c] so the
    # minor dimension is a full 128-lane multiple (a [., ., L, 64] cache
    # pads 2x on TPU)
    q, k, v = jnp.moveaxis(qkv, 2, 0)

    if cfg.attn_l2_norm:
        scale_mul = jnp.exp(
            jnp.minimum(bp["scale_mul"].astype(jnp.float32), MAX_SCALE_MUL)
        ).reshape(1, 1, heads, 1)
        q = _l2norm(q) * scale_mul.astype(q.dtype)
        k = _l2norm(k)

    kv_update = None
    if cache is not None:
        # cache layouts: dense values [B, L, H*c] (full-lane minor dim);
        # packed segments {"segs": (...)} with codes head-major
        # [B, H, l*hd] and scales [B, H, l] per scale (init_kv_cache).
        #
        # Dense ``kv_update``: leaf name -> (values, static start indices)
        # covering only the rows this step appends (or, in
        # kv_mode="reference", the rewritten prefix); run_blocks applies
        # them to the carried [depth, ...] cache with in-place
        # dynamic_update_slice.  Packed ``kv_update``: this step's fresh
        # segment {kc, vc, ks, vs} — run_blocks stacks it over depth and
        # REPLACES the step's segment slot (append-only, no large-buffer
        # updates anywhere).
        end = cur + l
        codec = qrt.kv_codec if qrt is not None else None
        if codec is not None:
            # packed KV cache: quantize-once-on-append, int8 codes +
            # per-(token, head) scales in HBM (the TPU-native replacement
            # for the reference's repeated cache re-fake-quantization)
            segs = cache["segs"]              # valid prefix: segs [0, si)
            kc, ks = codec.encode(k)          # codes [B,l,H,c], s [B,l,H,1]
            vc, vs = codec.encode(v)
            # head-major flat codes [B, H, l*c] (see init_kv_cache: keeps
            # the s8 buffers in XLA's default layout)
            kch = kc.transpose(0, 2, 1, 3).reshape(
                b, heads, l * hd).astype(jnp.int8)
            vch = vc.transpose(0, 2, 1, 3).reshape(
                b, heads, l * hd).astype(jnp.int8)
            ks2 = ks[..., 0].transpose(0, 2, 1).astype(jnp.float32)
            vs2 = vs[..., 0].transpose(0, 2, 1).astype(jnp.float32)
            kv_update = {"kc": kch, "vc": vch, "ks": ks2, "vs": vs2}

            def catc(kn, new):
                return jnp.concatenate([s[kn] for s in segs] + [new], axis=2)

            if codec.value_codes:
                # attention DIRECTLY over the int8 value codes: per-token
                # scales fold into the score columns (K) and the softmax
                # weights (V) — the convert and the folds fuse into the
                # dot/softmax pipeline.  (The alternative of folding the
                # scales at the operand — materializing a dequantized
                # bf16 [B,H,M,hd] — measured 10% SLOWER end-to-end at b8:
                # the fused s8 operand read is already cheaper than a
                # materialized bf16 one.)
                kcodes = catc("kc", kch).reshape(b, heads, end, hd)
                vcodes = catc("vc", vch).reshape(b, heads, end, hd)
                ks_all = catc("ks", ks2)              # [B, H, end] f32
                vs_all = catc("vs", vs2)
                k_all = v_all = None
                if qrt.attn_int8:
                    # both attention contractions as int8 MXU dots over the
                    # cached codes (QuantConfig.attn_int8): q quantized
                    # per-(token, head), softmax weights (v scales folded)
                    # per score row — extra error <=1/254 of each row's
                    # absmax, on top of the KV codec's own quantization
                    qf = q.astype(jnp.float32)
                    qa = jnp.max(jnp.abs(qf), axis=-1, keepdims=True)
                    qs = jnp.where(qa > 0, qa / 127.0, 1.0)  # [B,l,H,1]
                    qc = jnp.round(qf / qs).astype(jnp.int8)
                    scores = jnp.einsum(
                        "blhc,bhmc->bhlm", qc, kcodes,
                        preferred_element_type=jnp.int32).astype(jnp.float32)
                    scores = (scores
                              * qs.transpose(0, 2, 1, 3)
                              * ks_all[:, :, None, :])
                    if attn_bias is not None:
                        scores = scores + attn_bias
                    probs = jax.nn.softmax(scores, axis=-1)
                    pv = probs * vs_all[:, :, None, :]
                    pa = jnp.max(jnp.abs(pv), axis=-1, keepdims=True)
                    ps = jnp.where(pa > 0, pa / 127.0, 1.0)  # [B,H,l,1]
                    pc = jnp.round(pv / ps).astype(jnp.int8)
                    oup = jnp.einsum(
                        "bhlm,bhmc->blhc", pc, vcodes,
                        preferred_element_type=jnp.int32).astype(jnp.float32)
                    oup = (oup * ps.transpose(0, 2, 1, 3)).astype(
                        x.dtype).reshape(b, l, heads * hd)
                else:
                    # scales fold into the score columns / softmax
                    # weights; the s8->bf16 converts fuse into the dot
                    # operand reads.  Three alternatives all measured
                    # SLOWER at d30 b8 (ROUND_NOTES_r05.md): operand-space
                    # dequant (materializes bf16 [B,H,M,hd]: 0.84x),
                    # batched-layout dequant (0.84x), and Pallas flash
                    # attention over dequantized tiles (0.75x — kernel
                    # overheads at l<=256/M<=680/hd=64 outweigh never
                    # materializing the score tensor)
                    scores = jnp.einsum(
                        "blhc,bhmc->bhlm", q, kcodes.astype(q.dtype),
                        preferred_element_type=jnp.float32)
                    scores = scores * ks_all[:, :, None, :]
                    if attn_bias is not None:
                        scores = scores + attn_bias
                    probs = jax.nn.softmax(scores, axis=-1)
                    pv = (probs * vs_all[:, :, None, :]).astype(q.dtype)
                    oup = jnp.einsum(
                        "bhlm,bhmc->blhc", pv, vcodes.astype(q.dtype)
                    ).reshape(b, l, heads * hd)
            else:
                def _decode(codes_all, s_all):
                    codes = codes_all.reshape(b, heads, end, hd)
                    s = s_all[..., None]              # [B, H, end, 1]
                    return codec.decode(codes, s).transpose(
                        0, 2, 1, 3).astype(q.dtype)

                k_all = _decode(catc("kc", kch), catc("ks", ks2))
                v_all = _decode(catc("vc", vch), catc("vs", vs2))
        else:
            kv_q = qrt.kv_q if qrt is not None else None

            def _q_merged(buf_slice):
                # fake KV quantizers operate per [..., head_dim] rows
                x4 = buf_slice.reshape(b, -1, heads, hd)
                return kv_q(x4).reshape(buf_slice.shape)

            k_store, v_store = k, v
            if kv_q is not None and qrt.kv_mode == "store":
                k_store, v_store = kv_q(k), kv_q(v)
            k3 = k_store.reshape(b, l, c).astype(cache["k"].dtype)
            v3 = v_store.reshape(b, l, c).astype(cache["v"].dtype)
            if kv_q is not None and qrt.kv_mode == "reference" and cur > 0:
                # re-fake-quantize the whole existing cache before appending
                # the raw new tokens (`basic_var.py:138-147,186-209`) — this
                # mode inherently rewrites the prefix, so its update covers
                # rows [0, end)
                pk = _q_merged(cache["k"][:, :cur]).astype(cache["k"].dtype)
                pv = _q_merged(cache["v"][:, :cur]).astype(cache["v"].dtype)
                k_all3 = jnp.concatenate([pk, k3], axis=1)
                v_all3 = jnp.concatenate([pv, v3], axis=1)
                kv_update = {"k": (k_all3, (0, 0, 0)),
                             "v": (v_all3, (0, 0, 0))}
            else:
                k_all3 = jnp.concatenate([cache["k"][:, :cur], k3], axis=1)
                v_all3 = jnp.concatenate([cache["v"][:, :cur], v3], axis=1)
                kv_update = {"k": (k3, (0, cur, 0)),
                             "v": (v3, (0, cur, 0))}
            k_all = k_all3.reshape(b, end, heads, hd).astype(q.dtype)
            v_all = v_all3.reshape(b, end, heads, hd).astype(q.dtype)
    else:
        k_all, v_all = k, v

    if k_all is not None:
        oup = _attention(q, k_all, v_all, attn_bias)
    proj_out, oup_t = _q_then_lin("proj", oup, bp["proj_w"], bp["proj_b"])
    if capture:
        taps["proj"] = oup_t
    x = x + (proj_out * gamma1).astype(x.dtype)

    # ---- FFN branch
    x2 = layernorm_no_affine(x, cfg.norm_eps) * (1.0 + scale2) + shift2
    if smooth:
        x2 = x2 * bp["fc1_s"].astype(x2.dtype)
    if rot is not None:
        x2 = apply_block_hadamard(x2, rot)
    elif rot_full is not None:
        x2 = x2 @ rot_full.astype(x2.dtype)
    h1, x2 = _q_then_lin("fc1", x2, bp["fc1_w"], bp["fc1_b"])
    h = gelu_tanh(h1)
    out, h_t = _q_then_lin("fc2", h, bp["fc2_w"], bp["fc2_b"])
    if capture:
        taps["fc1"] = x2
        taps["fc2"] = h_t
    x = x + (out * gamma2).astype(x.dtype)
    return x, kv_update, taps


# ---------------------------------------------------------------------------
# Modulation precompute
# ---------------------------------------------------------------------------

def compute_modulations(params, cfg: VARConfig, cond_BD: Array,
                        qrt=None) -> Array:
    """Per-block AdaLN modulation [depth, 6, B, 1, C].

    Non-shared: per-block SiLU->Linear(D,6C) (`basic_var.py:247-248,258`).
    Shared (512 models): shared SiLU->SharedAdaLin plus per-block ada_gss
    (`var.py:85`, `basic_var.py:244-245,255-256`).  With
    QuantConfig.quantize_ada the SiLU(cond) input is act-quantized here
    (the ada weights were fake-quantized offline by the recipe) — the layer
    the reference's quantize_VAR intends to quantize but silently no-ops.
    """
    d = cfg.depth
    b = cond_BD.shape[0]
    c = cfg.width
    act = jax.nn.silu(cond_BD)
    aq = qrt.act_q.get("ada") if qrt is not None else None
    if aq is not None:
        act = aq(act)
    if cfg.shared_aln:
        gss = linear(
            act, params["shared_ada_lin"]["w"],
            params["shared_ada_lin"]["b"],
        ).reshape(b, 6, c)                       # [B, 6, C]
        ada = params["blocks"]["ada_gss"]        # [depth, 6, C]
        mod = ada[:, None, :, :] + gss[None]     # [depth, B, 6, C]
        mod = mod.transpose(0, 2, 1, 3)[:, :, :, None, :]
    else:
        w = params["blocks"]["ada_lin"]["w"]     # [depth, 6C, D]
        bb = params["blocks"]["ada_lin"]["b"]    # [depth, 6C]
        mod = jnp.einsum("bd,kod->kbo", act, w) + bb[:, None, :]
        mod = mod.reshape(d, b, 6, c).transpose(0, 2, 1, 3)[:, :, :, None, :]
    return mod


def head_logits(params, cfg: VARConfig, x: Array, cond_BD: Array) -> Array:
    """AdaLNBeforeHead + head (`basic_var.py:275-284`, `var.py:125-131`)."""
    hn = params["head_nm"]
    ss = linear(jax.nn.silu(cond_BD), hn["w"], hn["b"])
    scale, shift = jnp.split(ss.reshape(ss.shape[0], 1, 2, cfg.width), 2, 2)
    h = layernorm_no_affine(x.astype(jnp.float32), cfg.norm_eps)
    h = h * (1.0 + scale[:, :, 0]) + shift[:, :, 0]
    return linear(h, params["head"]["w"], params["head"]["b"])


# ---------------------------------------------------------------------------
# Transformer over blocks (scan / unrolled)
# ---------------------------------------------------------------------------

def run_blocks(
    params,
    cfg: VARConfig,
    qrt,
    x: Array,
    mod: Array,                       # [depth, 6, B, 1, C]
    cache: Optional[Dict[str, Array]] = None,   # leaves lead with depth
    cur: int = 0,
    attn_bias: Optional[Array] = None,
    capture: bool = False,
    remat: bool = False,
) -> Tuple[Array, Optional[Tuple[Array, Array]], Optional[Dict[str, Array]]]:
    blocks = params["blocks"]
    mixed = qrt is not None and qrt.mixed_act_q is not None
    # KV-cache plumbing, chosen by cache type (same-window A/Bs,
    # ROUND_NOTES_r05.md):
    #
    # - DENSE bf16 caches ride the scan CARRY: each block dynamic-indexes
    #   its [B, L, H*c] slice and writes back only its newly appended rows
    #   with an in-place dynamic_update_slice at a static token offset.
    #   Measured fastest for bf16/int8chs/w4a16 (b8: carry 15.2/16.5 vs an
    #   xs/ys route 14.1/15.0 img/s).
    # - PACKED int8-code caches are PER-SCALE SEGMENTS (init_kv_cache):
    #   the read prefix segs[0:si] rides the scan's xs (read-only
    #   per-block slices), each block emits its new rows through ys, and
    #   the stacked [depth, ...] result REPLACES segment si wholesale —
    #   append-only, no large-buffer update op anywhere.  The two
    #   single-buffer designs both failed measurably: carried s8 buffers
    #   forced full-buffer copies every scan iteration (the 5x b8
    #   collapse BENCH_r04 shipped), and an outside-the-scan
    #   dynamic_update_slice was not emitted in place (~11.5 ms/step at
    #   pn16 geometry).
    #
    # (The round-3 design — full-cache ys — restacked the whole
    # [depth, B, L, H*c] buffer every scale step and lost to all of the
    # above.)
    packed = cache is not None and "segs" in cache
    if packed:
        si = seg_index(cfg, cur)
        read_segs = cache["segs"][:si]

    def _with_new_seg(newseg):
        # pin the new segment's mesh layout under tp (heads sharded) so
        # layouts don't depend on sharding propagation through attention
        if qrt is not None and getattr(qrt, "mesh", None) is not None \
                and "tp" in qrt.mesh.shape:
            from fpqvar_tpu.parallel import kv_cache_shardings

            sh = kv_cache_shardings(qrt.mesh, packed=True)
            newseg = {kn: jax.lax.with_sharding_constraint(v, sh)
                      for kn, v in newseg.items()}
        segs = cache["segs"]
        return {"segs": segs[:si] + (newseg,) + segs[si + 1:]}

    depth = jax.tree_util.tree_leaves(blocks)[0].shape[0]
    bidx = jnp.arange(depth, dtype=jnp.int32)

    if mixed:
        # Mixed-format configs (`quant_utils.py:1256-1432`): the per-block
        # act format becomes DATA — a [depth] variant index scanned with
        # the weights, switching between one compiled block body per
        # DISTINCT format inside the scan.  Compile cost is O(#formats)
        # bodies (2 for the paper's e2/e3 splits), not O(depth) — the
        # round-2 unrolled loop compiled 30 bodies at d30.
        variants = [qrt.for_variant(v) for v in range(len(qrt.mixed_act_q))]
        vidx = jnp.asarray(qrt.mixed_idx, jnp.int32)

        def _switch(xc, bp, m, ci, bi):
            def _branch(qv):
                def f(ops):
                    return block_forward(
                        ops[0], ops[1], ops[2], qv, cfg, ops[3], cur,
                        attn_bias, capture)

                return f

            return jax.lax.switch(
                bi, [_branch(qv) for qv in variants], (xc, bp, m, ci))

        if packed:
            def body(xc, xs):
                bp, m, ci, bi = xs
                xc, upd, taps = _switch(xc, bp, m, {"segs": ci}, bi)
                return xc, (upd, taps)

            if remat:
                body = jax.checkpoint(body, prevent_cse=False)
            x, (news, taps) = jax.lax.scan(
                body, x, (blocks, mod, read_segs, vidx))
            return x, _with_new_seg(news), taps

        if cache is not None:
            def body(carry, xs):
                xc, cf = carry
                bp, m, i, bi = xs
                ci = {kn: jax.lax.dynamic_index_in_dim(
                          v, i, 0, keepdims=False) for kn, v in cf.items()}
                xc, upd, taps = _switch(xc, bp, m, ci, bi)
                # upd: leaf -> (values, start); starts become (constant)
                # arrays through the switch — dynamic_update_slice takes
                # them as traced indices
                cf = {kn: jax.lax.dynamic_update_slice(
                          cf[kn], upd[kn][0][None],
                          (i,) + tuple(upd[kn][1])) for kn in cf}
                return (xc, cf), taps

            if remat:
                body = jax.checkpoint(body, prevent_cse=False)
            (x, new_cache), taps = jax.lax.scan(
                body, (x, cache), (blocks, mod, bidx, vidx))
            return x, new_cache, taps

        def body(xc, xs):
            bp, m, bi = xs
            xc, _, taps = _switch(xc, bp, m, None, bi)
            return xc, taps

        if remat:
            body = jax.checkpoint(body, prevent_cse=False)
        x, taps = jax.lax.scan(body, x, (blocks, mod, vidx))
        return x, None, taps

    if packed:
        def body(xc, xs):
            bp, m, ci = xs
            xc, upd, taps = block_forward(xc, bp, m, qrt, cfg,
                                          {"segs": ci}, cur,
                                          attn_bias, capture)
            return xc, (upd, taps)

        if remat:
            body = jax.checkpoint(body, prevent_cse=False)
        x, (news, taps) = jax.lax.scan(body, x, (blocks, mod, read_segs),
                                       unroll=_scan_unroll())
        return x, _with_new_seg(news), taps

    if cache is not None:
        def body(carry, xs):
            xc, cf = carry
            bp, m, i = xs
            ci = {kn: jax.lax.dynamic_index_in_dim(v, i, 0, keepdims=False)
                  for kn, v in cf.items()}
            xc, upd, taps = block_forward(xc, bp, m, qrt, cfg, ci, cur,
                                          attn_bias, capture)
            cf = {kn: jax.lax.dynamic_update_slice(
                      cf[kn], upd[kn][0][None], (i,) + upd[kn][1])
                  for kn in cf}
            return (xc, cf), taps

        if remat:
            body = jax.checkpoint(body, prevent_cse=False)
        (x, new_cache), taps = jax.lax.scan(
            body, (x, cache), (blocks, mod, bidx), unroll=_scan_unroll())
        return x, new_cache, taps

    def body(xc, xs):
        bp, m = xs
        xc, _, taps = block_forward(xc, bp, m, qrt, cfg, None, cur,
                                    attn_bias, capture)
        return xc, taps

    if remat:
        # per-block rematerialization: backward recomputes each block's
        # activations from its input instead of storing them — activation
        # memory drops from O(depth * B * L * C) to one block's worth, for
        # one extra forward of FLOPs.  Training-path only (generation never
        # differentiates).  prevent_cse=False is the documented setting for
        # checkpoint-inside-scan.
        body = jax.checkpoint(body, prevent_cse=False)
    x, taps = jax.lax.scan(body, x, (blocks, mod))
    return x, None, taps


# ---------------------------------------------------------------------------
# Training / teacher-forcing forward
# ---------------------------------------------------------------------------

def lvl_1L(cfg: VARConfig) -> np.ndarray:
    return np.concatenate(
        [np.full(pn * pn, i, np.int32) for i, pn in enumerate(cfg.patch_nums)]
    )


def attn_bias_for_masking(cfg: VARConfig) -> np.ndarray:
    """Block-triangular by scale (`models/var.py:112-117`)."""
    d = lvl_1L(cfg)
    bias = np.where(d[:, None] >= d[None, :], 0.0, -np.inf)
    return bias[None, None].astype(np.float32)


def var_forward(
    params, cfg: VARConfig, qrt, label_B: Array, x_BLCv_wo_first_l: Array,
    remat: bool = False,
) -> Array:
    """Teacher-forcing forward returning logits [B, L, V]
    (`models/var.py:220-262`, inference subset: no cond-drop randomness —
    apply label dropout outside if training).  ``remat`` rematerializes
    per-block activations on the backward pass (jax.checkpoint over the
    block scan) — the HBM-for-FLOPs trade that lets deeper models /
    bigger batches train per chip."""
    b = x_BLCv_wo_first_l.shape[0]
    cond_BD = jnp.take(params["class_emb"], label_B, axis=0)
    sos = cond_BD[:, None, :] + params["pos_start"]
    sos = jnp.broadcast_to(sos, (b, cfg.first_l, cfg.width))
    we = params["word_embed"]
    tok = linear(x_BLCv_wo_first_l.astype(jnp.float32), we["w"], we["b"])
    x = jnp.concatenate([sos, tok.astype(sos.dtype)], axis=1)
    lvl = jnp.asarray(lvl_1L(cfg))
    x = x + jnp.take(params["lvl_embed"], lvl, axis=0)[None] + params["pos_1LC"]

    mod = compute_modulations(params, cfg, cond_BD, qrt)
    bias = jnp.asarray(attn_bias_for_masking(cfg))
    x, _, _ = run_blocks(params, cfg, qrt, x, mod, attn_bias=bias,
                         remat=remat)
    return head_logits(params, cfg, x.astype(jnp.float32), cond_BD)


# ---------------------------------------------------------------------------
# Autoregressive generation
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class GenStatics:
    """Per-scale static geometry."""
    si: int
    pn: int
    cur: int          # tokens cached before this step
    l: int            # pn*pn new tokens

    @staticmethod
    def all_steps(cfg: VARConfig):
        out, cur = [], 0
        for si, pn in enumerate(cfg.patch_nums):
            out.append(GenStatics(si, pn, cur, pn * pn))
            cur += pn * pn
        return out


def seg_index(cfg: VARConfig, cur: int) -> int:
    """Scale index whose tokens start at offset ``cur`` (static)."""
    off = 0
    for si, pn in enumerate(cfg.patch_nums):
        if off == cur:
            return si
        off += pn * pn
    raise ValueError(f"cur={cur} is not a scale boundary of {cfg.patch_nums}")


def init_kv_cache(cfg: VARConfig, batch: int, dtype=jnp.bfloat16,
                  kv_codec=None):
    """Preallocated KV cache.

    Dense: bf16 {"k","v"} at [depth, B, L, H*c] (merged heads so the minor
    dim is a full 128-lane multiple — a head-split [..., L, 64] layout pads
    2x on TPU).  The dense cache rides the block scan's carry and is
    updated with in-place dynamic_update_slice writes (run_blocks).

    Packed codec: {"segs": (seg_0, ..., seg_9)} — ONE SEGMENT PER SCALE,
    each {"kc","vc"} int8 codes HEAD-MAJOR at [depth, B, H, l*hd] +
    {"ks","vs"} f32 per-(token, head) scales at [depth, B, H, l], 2-4x
    less HBM than dense (SURVEY.md §2.2; the reference re-quantizes a
    dense fp16 cache every step).  Segments are APPEND-ONLY: scale step s
    REPLACES seg_s wholesale with its freshly stacked codes (the zero
    initializer is dead code the compiler drops) and attention reads a
    concat of segs[0:s] — there is no dynamic_update_slice on a large
    buffer anywhere in the packed path.  A single [depth, B, H, L*hd]
    buffer was measured unusable both ways: carried through the scan,
    XLA copied the full 626 MB s8 buffers every iteration (the 5x b8
    collapse BENCH_r04 shipped); updated outside the scan, the
    static-offset dynamic_update_slice was not emitted in place and cost
    ~11.5 ms/step at the pn16 geometry.

    Why the codes are head-major: the attention dot consumes them as
    [B, H, M, hd] — with heads leading, that view is a free reshape of
    the DEFAULT row-major layout, so XLA layout assignment has no reason
    to pick anything else (token-major codes made the fused generate
    insert ~9 ms transposing copies between steps).  Head-major also
    keeps H shardable over tp (parallel.kv_cache_shardings)."""
    shape = (cfg.depth, batch, cfg.L, cfg.heads * cfg.head_dim)
    if kv_codec is None:
        return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
    hd = cfg.head_dim
    segs = []
    for pn in cfg.patch_nums:
        l = pn * pn
        segs.append({
            "kc": jnp.zeros((cfg.depth, batch, cfg.heads, l * hd), jnp.int8),
            "vc": jnp.zeros((cfg.depth, batch, cfg.heads, l * hd), jnp.int8),
            "ks": jnp.zeros((cfg.depth, batch, cfg.heads, l), jnp.float32),
            "vs": jnp.zeros((cfg.depth, batch, cfg.heads, l), jnp.float32),
        })
    return {"segs": tuple(segs)}


def scale_step(
    params,
    vae_qparams,
    cfg: VARConfig,
    qrt,
    gen: GenerateConfig,
    st: GenStatics,
    x: Array,                 # [2B, l, C] token map for this scale
    cond_BD: Array,           # [2B, C]
    mod: Array,               # [depth, 6, 2B, 1, C]
    lvl_pos: Array,           # [1, L, C]
    cache: Dict[str, Array],
    f_hat: Array,             # [B, Cvae, pn_last, pn_last]
    key,
):
    """One scale of `autoregressive_infer_cfg` (`var.py:175-214`):
    transformer -> logits -> CFG -> sample -> residual pyramid -> next map."""
    b2 = x.shape[0]
    b = b2 // 2
    x, cache, _ = run_blocks(params, cfg, qrt, x, mod, cache, st.cur)
    logits = head_logits(params, cfg, x.astype(jnp.float32), cond_BD)

    t = gen.cfg * (st.si / (cfg.num_scales - 1))
    logits = (1.0 + t) * logits[:b] - t * logits[b:]

    # ``key`` is either one PRNG key (shared batch randomness, the
    # reference's single torch generator) or [B, 2] per-row keys — used by
    # the serving path so a request's randomness is independent of what it
    # is co-batched with.
    per_row = key.ndim == 2

    def _split(k):
        if per_row:
            ks = jax.vmap(jax.random.split)(k)     # [B, 2, 2]
            return ks[:, 0], ks[:, 1]
        return jax.random.split(k)

    key, k1 = _split(key)
    if per_row:
        idx_Bl = jax.vmap(
            lambda kk, lg: sample_with_top_k_top_p(
                kk, lg, gen.top_k, gen.top_p)
        )(k1, logits)
    else:
        idx_Bl = sample_with_top_k_top_p(k1, logits, gen.top_k, gen.top_p)
    if gen.more_smooth:
        # gumbel-softmax blended codebook embedding; idx_Bl is still drawn
        # (and discarded) to keep the key stream identical to the default
        # mode (`models/var.py:202-208`: not used for FID evaluation)
        ratio = st.si / (cfg.num_scales - 1)
        gum_t = max(0.27 * (1.0 - ratio * 0.95), 0.005)
        key, k2 = _split(key)
        if per_row:
            soft = jax.vmap(
                lambda kk, lg: gumbel_softmax(kk, lg * (1.0 + ratio), gum_t)
            )(k2, logits)
        else:
            soft = gumbel_softmax(k2, logits * (1.0 + ratio), gum_t)
        h_BChw = soft @ vae_qparams["embedding"].astype(soft.dtype)
    else:
        h_BChw = vq.embed_idx(vae_qparams, idx_Bl)      # [B, l, Cvae]
    h_BChw = h_BChw.transpose(0, 2, 1).reshape(
        b, cfg.vae.z_channels, st.pn, st.pn).astype(jnp.float32)

    f_hat, next_raw = vq.get_next_autoregressive_input(
        vae_qparams, cfg.vae, st.si, f_hat, h_BChw)

    if st.si == cfg.num_scales - 1:
        return None, cache, f_hat, key

    pn_next = cfg.patch_nums[st.si + 1]
    nxt = next_raw.reshape(b, cfg.vae.z_channels, -1).transpose(0, 2, 1)
    we = params["word_embed"]
    nxt = linear(nxt, we["w"], we["b"]).astype(x.dtype)
    cur_end = st.cur + st.l
    nxt = nxt + lvl_pos[:, cur_end: cur_end + pn_next * pn_next]
    nxt = jnp.concatenate([nxt, nxt], axis=0)   # CFG batch doubling
    return nxt, cache, f_hat, key


def prepare_generation(params, cfg: VARConfig, label_B: Array, qrt=None):
    """Condition embeddings + first token map (`var.py:160-172`)."""
    b = label_B.shape[0]
    uncond = jnp.full_like(label_B, cfg.num_classes)
    cond_BD = jnp.take(
        params["class_emb"], jnp.concatenate([label_B, uncond]), axis=0)
    lvl = jnp.asarray(lvl_1L(cfg))
    lvl_pos = jnp.take(params["lvl_embed"], lvl, axis=0)[None] + params["pos_1LC"]
    sos = cond_BD[:, None, :] + params["pos_start"] + lvl_pos[:, : cfg.first_l]
    first = jnp.broadcast_to(sos, (2 * b, cfg.first_l, cfg.width))
    mod = compute_modulations(params, cfg, cond_BD, qrt)
    return cond_BD, mod, lvl_pos, first


# ---------------------------------------------------------------------------
# Initialization (random weights; real weights via checkpoint converter)
# ---------------------------------------------------------------------------

def init_var_params(key, cfg: VARConfig, dtype=jnp.float32,
                    adaln_gamma_std: float = 0.02 * 1e-2):
    """Random init mirroring `models/var.py:264-314` init_weights.

    ``adaln_gamma_std`` scales the AdaLN gamma rows (reference
    init_adaln_gamma=1e-5 makes fresh blocks near-identity); tests raise it
    so forward outputs are sensitive to block internals.
    """
    c, d, heads = cfg.width, cfg.depth, cfg.heads
    cvae, v = cfg.vae.z_channels, cfg.vae.vocab_size
    init_std = math.sqrt(1.0 / c / 3.0)
    ks = iter(jax.random.split(key, 64))

    def tn(k, shape, std=init_std):
        return (jax.random.truncated_normal(k, -2, 2, shape) * std).astype(dtype)

    def lin_init(k, o, i, std=0.02):
        kw, kb = jax.random.split(k)
        return {"w": tn(kw, (o, i), std), "b": jnp.zeros((o,), dtype)}

    blocks = {
        "mat_qkv_w": tn(next(ks), (d, 3 * c, c), 0.02),
        "q_bias": jnp.zeros((d, c), dtype),
        "v_bias": jnp.zeros((d, c), dtype),
        "scale_mul": jnp.full((d, 1, heads, 1, 1), math.log(4.0), dtype),
        "proj_w": tn(next(ks), (d, c, c), 0.02 / math.sqrt(2 * d)),
        "proj_b": jnp.zeros((d, c), dtype),
        "fc1_w": tn(next(ks), (d, 4 * c, c), 0.02),
        "fc1_b": jnp.zeros((d, 4 * c), dtype),
        "fc2_w": tn(next(ks), (d, c, 4 * c), 0.02 / math.sqrt(2 * d)),
        "fc2_b": jnp.zeros((d, c), dtype),
        "mat_qkv_s": jnp.ones((d, c), dtype),
        "fc1_s": jnp.ones((d, c), dtype),
    }
    if cfg.shared_aln:
        blocks["ada_gss"] = (
            jax.random.normal(next(ks), (d, 6, c)) / math.sqrt(c)
        ).astype(dtype)
    else:
        blocks["ada_lin"] = {
            "w": tn(next(ks), (d, 6 * c, c), adaln_gamma_std),
            "b": jnp.zeros((d, 6 * c), dtype),
        }

    params = {
        "word_embed": lin_init(next(ks), c, cvae),
        "class_emb": tn(next(ks), (cfg.num_classes + 1, c)),
        "pos_start": tn(next(ks), (1, cfg.first_l, c)),
        "pos_1LC": tn(next(ks), (1, cfg.L, c)),
        "lvl_embed": tn(next(ks), (cfg.num_scales, c)),
        "blocks": blocks,
        "head_nm": lin_init(next(ks), 2 * c, c),
        "head": lin_init(next(ks), v, c),
    }
    if cfg.shared_aln:
        params["shared_ada_lin"] = lin_init(next(ks), 6 * c, c)
    return params
