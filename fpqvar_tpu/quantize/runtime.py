"""QuantRuntime: the *online* half of a quantization recipe.

The reference bakes activation quantizers into module objects at surgery time
(``QuantizedLinear.__init__`` dispatch tables,
`models_fp_quant/quant_utils.py:777-827`).  Here the model stays functional:
a :class:`QuantRuntime` carries the per-layer activation quantizer callables,
the KV-cache quantizer, the online rotation block and the GALT flag, and the
forward consumes it as static (trace-time) configuration.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fpqvar_tpu.config import QuantConfig
from fpqvar_tpu.ops import hadamard as H
from fpqvar_tpu.ops import quantizers as Q

#: layer kinds quantized by quantize_VAR (`quant_utils.py:1191-1230`):
#: fc1, fc2 (in FFN), mat_qkv, proj (in SelfAttention).  head, word_embed,
#: embeddings, VQVAE and SharedAdaLin stay full-precision (SharedAdaLin
#: replacement in the reference is a silent no-op — SURVEY.md §2.3).
LAYER_KINDS = ("mat_qkv", "proj", "fc1", "fc2")


@dataclass(frozen=True)
class KVCodec:
    """Packed KV-cache codec: per-token absmax scaling onto a value grid,
    codes stored int8.

    For formats with an integer-value representation (ops.packing.CODE_MULT
    — the recipe's fp_e2 / fp6_e2m3), codes are the grid VALUES times a
    power of two and the scale absorbs the multiplier: decode is a single
    multiply, and attention can consume the codes DIRECTLY, folding the
    per-token scale into the score matrix / softmax weights instead of
    materializing a dequantized cache (see models/var.py packed-KV
    attention).  decode(encode(x)) equals the fake per-token grid quantizer
    bit-wise (exact power-of-two rescale)."""

    fmt: str
    encode: Callable       # x [...,c] -> (codes int8, scales f32 [...,1])
    decode: Callable       # (codes, scales) -> values
    value_codes: bool      # True -> value = codes * scales (fold-friendly)


def make_kv_codec(fmt: str) -> KVCodec:
    import numpy as np

    from fpqvar_tpu.ops import grids as G
    from fpqvar_tpu.ops import packing as P

    grid = G.GRIDS[fmt]
    gmax = float(np.max(np.abs(grid)))
    gj = jnp.asarray(grid)
    mult = P.CODE_MULT.get(fmt)

    if mult is not None:
        def encode(x):
            # one group spanning the whole last dim == per-token; reuses the
            # int8-backend encoder so a snap/tie or zero-absmax fix there
            # applies to the KV codec too (bit-parity with fake store mode)
            return P.quant_int_codes(x, fmt, group_size=x.shape[-1])

        def decode(codes, scales):
            return codes.astype(scales.dtype) * scales

        return KVCodec(fmt, encode, decode, True)

    def encode(x):
        xf = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        scales = jnp.where(amax > 0, amax / gmax, 1.0)
        codes = P.encode_to_grid(xf / scales, grid).astype(jnp.int8)
        return codes, scales

    def decode(codes, scales):
        # generic grids: one-hot contraction instead of a gather
        oh = jax.nn.one_hot(codes.astype(jnp.int32), len(grid),
                            dtype=scales.dtype)
        return (oh @ gj.astype(scales.dtype)) * scales

    return KVCodec(fmt, encode, decode, False)


@dataclass(frozen=True)
class QuantRuntime:
    act_q: Dict[str, Optional[Callable]] = field(default_factory=dict)
    #: per layer kind: activation format NAME (int8 backend quantizes inside
    #: the kernel call and needs the name, not a dequantizing callable)
    act_fmts: Dict[str, Optional[str]] = field(default_factory=dict)
    #: mixed-format configs (`quant_utils.py:1256-1432`): one act_q dict per
    #: DISTINCT block format (2 for the paper's e2/e3 splits) + a per-block
    #: variant index.  The model scans ONE block body containing a
    #: lax.switch over the variants — compile cost scales with the number
    #: of distinct formats, not with depth (the round-2 unrolled loop
    #: compiled 30 separate bodies at d30).
    mixed_act_q: Optional[Tuple[Dict[str, Optional[Callable]], ...]] = None
    mixed_idx: Optional[Tuple[int, ...]] = None
    kv_q: Optional[Callable] = None
    kv_mode: str = "store"
    kv_codec: Optional[KVCodec] = None
    #: int8 MXU attention contractions over packed KV codes (config.py
    #: QuantConfig.attn_int8); only meaningful with a value-codes kv_codec
    attn_int8: bool = False
    rotation_block: Optional[jnp.ndarray] = None   # 128x128 block rotation
    rotation_full: Optional[jnp.ndarray] = None    # dense CxC rotation
    transform: bool = False
    #: device mesh for the packed/int8 + TP composition: quantized-weight
    #: GEMMs run shard_map'ed over tp-sharded codes/scales when set (see
    #: ops/pallas/{int8_matmul,quant_matmul}._shard_mapped)
    mesh: Optional[object] = None

    def for_block(self, i: int) -> "QuantRuntime":
        assert self.mixed_act_q is not None
        return self.for_variant(self.mixed_idx[i])

    def for_variant(self, v: int) -> "QuantRuntime":
        """The runtime with variant ``v``'s act quantizers (one lax.switch
        branch of the mixed-format block body)."""
        assert self.mixed_act_q is not None
        return dataclasses.replace(
            self, act_q=self.mixed_act_q[v], mixed_act_q=None,
            mixed_idx=None)


def _act_quantizer_for(qcfg: QuantConfig, fmt_name: str, kind: str):
    """Build one activation quantizer, mirroring the act-side branch of
    ``QuantizedLinear{,_fc2}.from_float`` wiring in ``quantize_VAR``
    (`quant_utils.py:1180-1230`)."""
    gran = qcfg.act_quant
    if qcfg.int_quant or fmt_name in ("int_sym", "int_asym", "log2"):
        if fmt_name == "log2" or (kind == "fc2" and qcfg.fc2_log2):
            fmt = "log2"
        else:
            # fc2 activation is forced asymmetric (`quant_utils.py:1205`).
            sym = qcfg.act_sym and kind != "fc2"
            fmt = "int_sym" if sym else "int_asym"
        return Q.make_act_quantizer(
            fmt, qcfg.a_bit, granularity=gran, group_size=qcfg.group_size)
    return Q.make_act_quantizer(
        fmt_name, qcfg.a_bit, granularity=gran, group_size=qcfg.group_size)


def build_runtime(qcfg: QuantConfig, depth: Optional[int] = None,
                  width: Optional[int] = None) -> QuantRuntime:
    """Resolve a :class:`QuantConfig` into runtime callables.  ``width`` is
    required for full-size (non-block) rotation."""
    rotation = None
    rotation_full = None
    if qcfg.rotate:
        if qcfg.block_rotate:
            rotation = jnp.asarray(
                H.block_hadamard_block(qcfg.rotation_block,
                                       qcfg.rotation_seed),
                dtype=jnp.float32)
        else:
            if width is None:
                raise ValueError("width required for full-size rotation")
            rotation_full = jnp.asarray(
                H.random_hadamard_matrix(width, qcfg.rotation_seed),
                dtype=jnp.float32)

    act_q: Dict[str, Optional[Callable]] = {k: None for k in LAYER_KINDS}
    fmts: Dict[str, Optional[str]] = {k: None for k in LAYER_KINDS}
    mixed = None
    mixed_idx = None
    if qcfg.enabled:
        if qcfg.int_quant:
            fmts = {k: "int" for k in LAYER_KINDS}
        else:
            fmts = {k: qcfg.act_format for k in ("mat_qkv", "proj", "fc1")}
            fmts["fc2"] = qcfg.fc2_format
        if qcfg.backend == "int8":
            # act quantization happens inside the int8 kernel call (codes +
            # scales, no dequantized intermediate) — see models/var.py
            from fpqvar_tpu.ops import packing as P

            if qcfg.int_quant or qcfg.act_quant not in (
                    "per_group", "per_token"):
                raise ValueError(
                    "int8 backend requires per-group or per-token fp act "
                    "quantization")
            if ((qcfg.act_quant == "per_token")
                    != (qcfg.weight_quant == "per_channel")):
                raise ValueError(
                    "int8 backend: per-token acts pair with per-channel "
                    "weights (the int8ch full-K path) — set both or neither")
            if qcfg.mixed_act_formats is not None:
                raise ValueError(
                    "int8 backend does not support mixed_act_formats")
            for k, f in fmts.items():
                # "bf16" = weights-only (W4A16): acts bypass quantization,
                # the GEMM is bf16 x dequantized-codes (int8_matmul._wonly_dot)
                if (f != "bf16" and f not in P.CODE_MULT
                        and f not in P.DUAL_CODE_MULT):
                    raise ValueError(
                        f"int8 backend: unsupported act format {f!r} ({k})")
            kv_q, kv_codec = _build_kv(qcfg)
            if qcfg.quantize_ada:
                # ada stays on the fake path even under the int8 backend:
                # modulations are computed once per generation, never hot
                act_q = dict(act_q)
                act_q["ada"] = _ada_act_quantizer(qcfg)
            return QuantRuntime(
                act_q=act_q, act_fmts=fmts,
                kv_q=kv_q, kv_codec=kv_codec,
                kv_mode=qcfg.kv_mode,
                attn_int8=_check_attn_int8(qcfg, kv_codec),
                rotation_block=rotation, rotation_full=rotation_full,
                transform=qcfg.transform)
        # "bf16" act format = no activation quantizer (weights-only recipe)
        act_q = {k: (None if fmts[k] == "bf16"
                     else _act_quantizer_for(qcfg, fmts[k], k))
                 for k in LAYER_KINDS}
        if qcfg.quantize_ada:
            act_q["ada"] = _ada_act_quantizer(qcfg)
        if qcfg.mixed_act_formats is not None:
            if depth is None:
                raise ValueError("depth required for mixed-format configs")
            if len(qcfg.mixed_act_formats) != depth:
                raise ValueError("mixed_act_formats must have one entry per block")
            distinct = list(dict.fromkeys(qcfg.mixed_act_formats))
            variants = []
            for bfmt in distinct:
                d = dict(act_q)
                for k in ("mat_qkv", "proj", "fc1"):
                    d[k] = _act_quantizer_for(qcfg, bfmt, k)
                variants.append(d)
            mixed = tuple(variants)
            mixed_idx = tuple(distinct.index(f)
                              for f in qcfg.mixed_act_formats)

    kv_q, kv_codec = _build_kv(qcfg)
    return QuantRuntime(
        act_q=act_q,
        act_fmts=fmts,
        mixed_act_q=mixed,
        mixed_idx=mixed_idx,
        kv_q=kv_q,
        kv_mode=qcfg.kv_mode,
        kv_codec=kv_codec,
        attn_int8=_check_attn_int8(qcfg, kv_codec),
        rotation_block=rotation,
        rotation_full=rotation_full,
        transform=qcfg.transform,
    )


def _ada_act_quantizer(qcfg: QuantConfig):
    """Per-token act quantizer for SiLU(cond) feeding ada_lin /
    shared_ada_lin (QuantConfig.quantize_ada; format searched by
    `search/search_fp_format_ada.py:396-469` — our search_ada_formats)."""
    fmt = qcfg.resolved_ada_format()
    if qcfg.int_quant or fmt in ("int_sym", "int_asym", "log2"):
        fmt = "int_sym" if qcfg.act_sym else "int_asym"
    return Q.make_act_quantizer(fmt, qcfg.a_bit, granularity="per_token",
                                group_size=qcfg.group_size)


def _check_attn_int8(qcfg: QuantConfig, kv_codec) -> bool:
    if not qcfg.attn_int8:
        return False
    if kv_codec is None or not kv_codec.value_codes:
        raise ValueError(
            "attn_int8 requires kv_backend='packed' with an integer-value "
            "kv format (fp_e2 / fp6_e2m3)")
    return True


def _build_kv(qcfg: QuantConfig):
    """(kv_q, kv_codec) — KV quantization is independent of linear-layer
    quantization, like the reference's quant_KV flag (`var.py:134-139`)."""
    if not qcfg.kv_bit:
        return None, None
    if qcfg.kv_backend == "packed":
        fmt = qcfg.resolved_kv_format()
        if fmt == "int_sym":
            raise NotImplementedError(
                "packed int KV not wired; use a grid kv_format")
        return None, make_kv_codec(fmt)
    return (lambda t: Q.fake_quant_kv(t, qcfg)), None
