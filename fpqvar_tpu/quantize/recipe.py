"""Offline checkpoint transformation: GALT fold -> rotate -> quantize weights.

Pure function over the params pytree, replacing the reference's sequence of
in-place model surgeries (`evaluate_fp_quant_transform_rotate.py:87-131`):

1. GALT fold: ``W_qkv <- W_qkv / s_qkv``, ``W_fc1 <- W_fc1 / s_fc1`` per block
   (`learnable_transformation/transform_model_utils.py:8-28`), storing the
   vectors for the online activation multiply.
2. Rotation: ``W <- W @ Q_block`` for mat_qkv and fc1
   (`rotate_utils/rotation_utils.py:129-154,211-240`; done in float64 there —
   we use float64 numpy on host too).
3. Weight quantization per format/granularity
   (`quant_utils.py:852-941` from_float), either fake (dequantized weights)
   or packed (codes + scales for the Pallas path).

The result is a new params tree; quantized checkpoints can be persisted with
fpqvar_tpu.utils.checkpoint (the reference re-quantizes at every startup).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from fpqvar_tpu.config import QuantConfig, VARConfig
from fpqvar_tpu.ops import hadamard as H
from fpqvar_tpu.ops import packing as P
from fpqvar_tpu.ops import quantizers as Q

#: block-level weight leaves subject to quantization (see
#: fpqvar_tpu.quantize.runtime.LAYER_KINDS)
_WEIGHT_KEYS = ("mat_qkv_w", "proj_w", "fc1_w", "fc2_w")
_ROTATED_KEYS = ("mat_qkv_w", "fc1_w")   # rotation_utils.py:221-222: fc2 and
                                         # ada_lin rotation exist but are
                                         # commented out of rotate_model


def fold_galt(
    blocks: dict,
    mat_qkv_s: np.ndarray,   # [depth, C]
    fc1_s: np.ndarray,       # [depth, C]
) -> dict:
    """transform_model: W /= s along input channels, keep s for the online
    activation multiply (`transform_model_utils.py:8-28`)."""
    b = dict(blocks)
    s1 = jnp.asarray(mat_qkv_s)
    s2 = jnp.asarray(fc1_s)
    b["mat_qkv_w"] = blocks["mat_qkv_w"] / s1[:, None, :]
    b["fc1_w"] = blocks["fc1_w"] / s2[:, None, :]
    b["mat_qkv_s"] = s1.astype(blocks["mat_qkv_s"].dtype)
    b["fc1_s"] = s2.astype(blocks["fc1_s"].dtype)
    return b


def rotate_blocks(blocks: dict, qcfg: QuantConfig) -> dict:
    """Offline weight rotation W <- W @ Q in float64 (block-diagonal or
    full-size randomized Hadamard, `rotation_utils.py:211-240`)."""
    out = dict(blocks)
    if qcfg.block_rotate:
        qb = H.block_hadamard_block(qcfg.rotation_block, qcfg.rotation_seed)
        for key in _ROTATED_KEYS:
            w = np.asarray(blocks[key], dtype=np.float64)  # [depth, out, in]
            d, o, i = w.shape
            wr = (w.reshape(d, o, i // qb.shape[0], qb.shape[0]) @ qb
                  ).reshape(d, o, i)
            out[key] = jnp.asarray(wr, dtype=blocks[key].dtype)
        return out
    width = blocks[_ROTATED_KEYS[0]].shape[-1]
    qf = H.random_hadamard_matrix(width, qcfg.rotation_seed)
    for key in _ROTATED_KEYS:
        w = np.asarray(blocks[key], dtype=np.float64)
        out[key] = jnp.asarray(w @ qf, dtype=blocks[key].dtype)
    return out


def quantize_weights(blocks: dict, qcfg: QuantConfig) -> dict:
    """Weight quantization; jit-wrapped so the (offline, host-side) transform
    runs as a few fused programs instead of dozens of eager ops over
    multi-hundred-MB stacked weights."""
    import jax

    out = dict(blocks)
    if qcfg.backend == "packed":
        fmt = qcfg.weight_format
        if fmt not in P.G.GRIDS:
            raise ValueError(f"packed backend needs a grid format, got {fmt}")
        pack_j = jax.jit(
            lambda w: P.pack_stacked(w, fmt, qcfg.group_size))
        for key in _WEIGHT_KEYS:
            out[key] = pack_j(jnp.asarray(blocks[key], jnp.float32))
        return out
    if qcfg.backend == "int8":
        fmt = qcfg.weight_format
        if fmt not in P.CODE_MULT:
            raise ValueError(
                f"int8 backend supports {sorted(P.CODE_MULT)}, got {fmt}")
        # weight_quant="per_channel" -> group = the layer's full K: one
        # scale per output channel, acts per-token — the int8ch speed path
        # (full-K int8 MXU dot, scales hoisted out of the contraction;
        # see ops/pallas/int8_matmul._channel_dot)
        per_channel = qcfg.weight_quant == "per_channel"
        for key in _WEIGHT_KEYS:
            w = jnp.asarray(blocks[key], jnp.float32)
            gs = w.shape[-1] if per_channel else qcfg.group_size
            out[key] = jax.jit(functools.partial(
                P.pack_int_codes, fmt=fmt, group_size=gs))(w)
        return out
    fmt = "int_sym" if qcfg.int_quant else qcfg.weight_format
    wq = Q.make_weight_quantizer(
        fmt, qcfg.w_bit, granularity=qcfg.weight_quant,
        group_size=qcfg.group_size)
    wq_j = jax.jit(lambda w: wq(w))
    for key in _WEIGHT_KEYS:
        w = blocks[key]
        out[key] = wq_j(w.astype(jnp.float32)).astype(w.dtype)
    return out


def _ada_weight_quantizer(qcfg: QuantConfig):
    import jax

    fmt = "int_sym" if qcfg.int_quant else qcfg.weight_format
    wq = Q.make_weight_quantizer(fmt, qcfg.w_bit,
                                 granularity=qcfg.weight_quant,
                                 group_size=qcfg.group_size)
    return jax.jit(lambda w: wq(w))


def quantize_var_params(
    params: dict,
    cfg: VARConfig,
    qcfg: QuantConfig,
    galt: Optional[Tuple[np.ndarray, np.ndarray]] = None,
) -> dict:
    """Full offline pipeline.  ``galt`` = (mat_qkv_best_s, fc1_best_s), each
    [depth, C]; required when qcfg.transform is set.

    Runs on the host CPU backend regardless of the default device: this is a
    one-shot offline transform, and tracing its many small ops on a remote
    TPU costs minutes of compile round-trips for zero benefit.
    """
    import jax

    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    ctx = jax.default_device(cpu) if cpu is not None else _nullcontext()
    with ctx:
        out = dict(params)
        blocks = dict(params["blocks"])
        blocks = jax.tree_util.tree_map(
            lambda a: jax.device_put(np.asarray(a), cpu)
            if cpu is not None else a, blocks)
        if qcfg.transform:
            if galt is None:
                raise ValueError("qcfg.transform=True requires GALT vectors")
            blocks = fold_galt(blocks, *galt)
        if qcfg.rotate:
            blocks = rotate_blocks(blocks, qcfg)
        if qcfg.enabled:
            blocks = quantize_weights(blocks, qcfg)
            if qcfg.quantize_ada:
                # ada_lin / shared_ada_lin weight quantization — what the
                # reference's quantize_VAR intends but silently no-ops
                # (`quant_utils.py:1232-1250`).  Always FAKE (dequantized
                # weights): modulations are computed once per generation,
                # so a packed/int8 ada GEMM would buy nothing.
                wq = _ada_weight_quantizer(qcfg)
                if "ada_lin" in blocks:
                    al = dict(blocks["ada_lin"])
                    w = al["w"]
                    al["w"] = wq(w.astype(jnp.float32)).astype(w.dtype)
                    blocks["ada_lin"] = al
                if "shared_ada_lin" in out:
                    sal = dict(out["shared_ada_lin"])
                    w = jnp.asarray(np.asarray(sal["w"]), jnp.float32)
                    sal["w"] = wq(w).astype(params["shared_ada_lin"]["w"].dtype)
                    out["shared_ada_lin"] = jax.tree_util.tree_map(
                        lambda a: jnp.asarray(np.asarray(a)), sal)
    # Materialize on the DEFAULT device as uncommitted arrays.  Two traps
    # this avoids: CPU-committed leaves silently pin downstream jits to the
    # CPU backend, and numpy leaves get re-uploaded to the device on every
    # jitted call (seconds per call over a remote-TPU link).
    blocks = jax.tree_util.tree_map(
        lambda a: jnp.asarray(np.asarray(a)), blocks)
    out["blocks"] = blocks
    return out


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


def transform_blocks_traced(
    blocks: dict,
    cfg: VARConfig,
    qcfg: QuantConfig,
    galt: Optional[Tuple] = None,
) -> dict:
    """Device-traceable offline transform (fold -> rotate -> quantize) over
    the stacked ``blocks`` subtree.  Same pipeline as the host-side
    ``quantize_var_params`` with two deliberate deviations:

    - rotation accumulates in float32, not float64 (TPUs have no f64); the
      host path stays the bit-parity surface for real checkpoint transforms
      (`rotate_utils/rotation_utils.py:129-154` does f64 on GPU too);
    - fake-backend weights come back in the INPUT dtype (bf16) instead of
      f32 — the dtype every consumer casts to anyway.

    Raison d'être: synthesizing per-mode param trees directly in device HBM.
    Uploading a d30 tree through the remote-TPU relay moves at 60-100 MB/s
    (BENCH_r03: 185-210s per mode, which evicted the batch-8 suite from the
    driver window); this traced build is milliseconds of device compute
    after a one-time, persistently cached compile.  Callable inside jit.
    (``quantize_ada`` covers the per-block ada_lin only; the d36
    shared_ada_lin leaf lives outside ``blocks`` — use the host path for it.)
    """
    if qcfg.transform and galt is None:
        raise ValueError("qcfg.transform=True requires GALT vectors")
    s1 = jnp.asarray(galt[0], jnp.float32) if qcfg.transform else None
    s2 = jnp.asarray(galt[1], jnp.float32) if qcfg.transform else None
    qmat = None
    if qcfg.rotate:
        if qcfg.block_rotate:
            qmat = jnp.asarray(H.block_hadamard_block(
                qcfg.rotation_block, qcfg.rotation_seed), jnp.float32)
        else:
            qmat = jnp.asarray(H.random_hadamard_matrix(
                cfg.width, qcfg.rotation_seed), jnp.float32)

    out = dict(blocks)
    in_dt = blocks["mat_qkv_w"].dtype
    for key, s in (("mat_qkv_w", s1), ("fc1_w", s2)):
        w = blocks[key].astype(jnp.float32)
        if s is not None:
            w = w / s[:, None, :]
        if qmat is not None:
            if qcfg.block_rotate:
                nb = qmat.shape[0]
                d, o, i = w.shape
                w = (w.reshape(d, o, i // nb, nb) @ qmat).reshape(d, o, i)
            else:
                w = w @ qmat
        out[key] = w
    if s1 is not None:
        out["mat_qkv_s"] = s1.astype(blocks["mat_qkv_s"].dtype)
        out["fc1_s"] = s2.astype(blocks["fc1_s"].dtype)

    if not qcfg.enabled:
        for key in _ROTATED_KEYS:
            out[key] = out[key].astype(in_dt)
        return out

    def f32(key):
        return out[key] if key in _ROTATED_KEYS else (
            blocks[key].astype(jnp.float32))

    if qcfg.backend == "packed":
        fmt = qcfg.weight_format
        if fmt not in P.G.GRIDS:
            raise ValueError(f"packed backend needs a grid format, got {fmt}")
        for key in _WEIGHT_KEYS:
            out[key] = P.pack_stacked(f32(key), fmt, qcfg.group_size)
    elif qcfg.backend == "int8":
        fmt = qcfg.weight_format
        if fmt not in P.CODE_MULT:
            raise ValueError(
                f"int8 backend supports {sorted(P.CODE_MULT)}, got {fmt}")
        per_channel = qcfg.weight_quant == "per_channel"
        for key in _WEIGHT_KEYS:
            w = f32(key)
            gs = w.shape[-1] if per_channel else qcfg.group_size
            out[key] = P.pack_int_codes(w, fmt=fmt, group_size=gs)
    else:
        fmt = "int_sym" if qcfg.int_quant else qcfg.weight_format
        wq = Q.make_weight_quantizer(
            fmt, qcfg.w_bit, granularity=qcfg.weight_quant,
            group_size=qcfg.group_size)
        for key in _WEIGHT_KEYS:
            out[key] = wq(f32(key)).astype(in_dt)
    if qcfg.quantize_ada and "ada_lin" in blocks:
        wq = Q.make_weight_quantizer(
            "int_sym" if qcfg.int_quant else qcfg.weight_format, qcfg.w_bit,
            granularity=qcfg.weight_quant, group_size=qcfg.group_size)
        al = dict(blocks["ada_lin"])
        al["w"] = wq(al["w"].astype(jnp.float32)).astype(al["w"].dtype)
        out["ada_lin"] = al
    return out


def synth_device_params(cfg: VARConfig, qcfg: QuantConfig, key,
                        galt: Optional[Tuple] = None):
    """Random-init + transform a full VAR param tree DIRECTLY in device HBM
    (one jitted program: init_var_params -> transform_blocks_traced).

    The benchmark/diagnostic entry points (bench.py, latency_breakdown)
    share this so none of them pays the remote-TPU relay's 60-100 MB/s
    host upload (185-210s per d30 mode, BENCH_r03) — the device build is
    milliseconds after a persistently cached compile.  Not for real
    checkpoints: those come from disk via utils.checkpoint + the host-side
    quantize_var_params bit-parity path.
    """
    import jax

    from fpqvar_tpu.models.var import init_var_params

    galt_j = (tuple(jnp.asarray(g, jnp.float32) for g in galt)
              if galt is not None else None)

    @jax.jit
    def build(k):
        p = init_var_params(k, cfg, dtype=jnp.bfloat16)
        if not qcfg.enabled:
            return p
        p = dict(p)
        p["blocks"] = transform_blocks_traced(
            p["blocks"], cfg, qcfg, galt=galt_j)
        if qcfg.backend == "fake":
            p = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, p)
        return p

    return build(key)
