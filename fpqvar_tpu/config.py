"""Typed configuration for the whole framework.

The reference spreads configuration over per-script argparse flag sets
(`/root/reference/evaluate_fp_quant_transform_rotate.py:27-52`) plus hard-coded
constants (MODEL_DEPTH at :54, group_size=128 inside every quantizer partial at
`models_fp_quant/quant_utils.py:808-824`).  Here everything is a frozen
dataclass so a full experiment (model + quant recipe + rotation + GALT + mesh +
generation params) is one serializable object.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple

# Patch schedules of the two released model families
# (`/root/reference/evaluate_fp_quant_transform_rotate.py:63`,
#  `/root/reference/evaluate_fp_quant_transform_rotate_512x512.py`).
PATCH_NUMS_256 = (1, 2, 3, 4, 5, 6, 8, 10, 13, 16)
PATCH_NUMS_512 = (1, 2, 3, 4, 6, 9, 13, 18, 24, 32)


@dataclass(frozen=True)
class VQVAEConfig:
    """Multi-scale VQVAE tokenizer (reference `models/vqvae.py:17-49`)."""

    vocab_size: int = 4096
    z_channels: int = 32            # Cvae
    ch: int = 160
    ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    quant_resi: float = 0.5
    share_quant_resi: int = 4       # partially-shared phi convs
    patch_nums: Tuple[int, ...] = PATCH_NUMS_256
    using_znorm: bool = False

    @property
    def downsample(self) -> int:
        return 2 ** (len(self.ch_mult) - 1)


@dataclass(frozen=True)
class VARConfig:
    """VAR transformer (reference `models/var.py:26-121`,
    `models/__init__.py:9-39`: width = depth*64, heads = depth)."""

    depth: int = 16
    num_classes: int = 1000
    shared_aln: bool = False
    attn_l2_norm: bool = True
    norm_eps: float = 1e-6
    mlp_ratio: float = 4.0
    cond_drop_rate: float = 0.1
    patch_nums: Tuple[int, ...] = PATCH_NUMS_256
    vae: VQVAEConfig = VQVAEConfig()
    # Overridable; default derivation matches build_vae_var.
    embed_dim: Optional[int] = None
    num_heads: Optional[int] = None

    @property
    def width(self) -> int:
        return self.embed_dim if self.embed_dim is not None else self.depth * 64

    @property
    def heads(self) -> int:
        return self.num_heads if self.num_heads is not None else self.depth

    @property
    def head_dim(self) -> int:
        return self.width // self.heads

    @property
    def L(self) -> int:
        return sum(pn * pn for pn in self.patch_nums)

    @property
    def first_l(self) -> int:
        return self.patch_nums[0] ** 2

    @property
    def num_scales(self) -> int:
        return len(self.patch_nums)

    @property
    def begin_ends(self) -> Tuple[Tuple[int, int], ...]:
        out, cur = [], 0
        for pn in self.patch_nums:
            out.append((cur, cur + pn * pn))
            cur += pn * pn
        return tuple(out)


def var_d16() -> VARConfig:
    return VARConfig(depth=16)


def var_d30() -> VARConfig:
    return VARConfig(depth=30)


def var_d36_512() -> VARConfig:
    return VARConfig(
        depth=36, shared_aln=True, patch_nums=PATCH_NUMS_512,
        vae=VQVAEConfig(patch_nums=PATCH_NUMS_512),
    )


def var_tiny() -> VARConfig:
    """CI/smoke shape: depth-2, 3 scales, 6x6 images; compiles in seconds
    on CPU.  Shared by bench.py --preset tiny and every CLI's --tiny flag
    (the reference has no small configuration at all — its entry scripts
    hard-code the published model shapes)."""
    return VARConfig(
        depth=2, embed_dim=128, num_heads=2, patch_nums=(1, 2, 3),
        vae=VQVAEConfig(vocab_size=64, z_channels=8, ch=16,
                        ch_mult=(1, 2), num_res_blocks=1,
                        patch_nums=(1, 2, 3)),
    )


# ---------------------------------------------------------------------------
# Quantization recipe
# ---------------------------------------------------------------------------

#: act/weight format names, superset of the reference flag values
#: (`evaluate_fp_quant_transform_rotate.py:43-45` and the dispatch tables at
#: `models_fp_quant/quant_utils.py:777-827,1027-1055`).
FORMATS = (
    "fp_e1", "fp_e2", "fp_e3",                  # fp4 e1m2 / e2m1 / e3m0
    "fp6_e2m3", "fp6_e3m2",                     # fp6
    "fp_e1m2_neg_e2m1_pos",                     # fc2 asymmetric dual-grid fp4
    "fp_neg_reverse_quant",                     # fc2 shift-negative trick
    "fp4_afpq",                                 # AFPQ baseline dual-scale
    "fp6_int_neg_e2m3_pos",                     # fc2 asymmetric dual-grid fp6
    "fp8_e4m3",                                 # extension: native fp8 config
    "int_sym", "int_asym", "log2",
    "bf16",     # act-side sentinel: NO act quantization (weights-only W4A16)
)

GRANULARITIES = ("per_token", "per_tensor", "per_group", "per_channel")


@dataclass(frozen=True)
class QuantConfig:
    """One quantization recipe = the union of the reference's CLI flags.

    ``enabled=False`` gives the FP16/bf16 baseline model.
    """

    enabled: bool = False
    w_bit: int = 4
    a_bit: int = 4
    kv_bit: int = 0                 # 0 = KV cache not quantized
    group_size: int = 128

    weight_quant: str = "per_group"     # granularity for weights
    act_quant: str = "per_group"        # granularity for activations
    act_sym: bool = False               # for int linear act quant
    weight_format: str = "fp_e2"        # weight_fp_type
    act_format: str = "fp_e2"           # act_fp_type
    fc2_format: str = "fp_e1m2_neg_e2m1_pos"   # fc2_fp_type
    fc2_log2: bool = False              # legacy fc2 log2 baseline
    int_quant: bool = False             # pure INT path (models_quant fork)

    # KV cache: reference quantizes per token with fp6_e2m3 (kv_bit=6) or
    # per-group fp_e2 (kv_bit=4)
    # (`models_fp_quant_transform_rotate/basic_var.py:192-200`).
    kv_format: str = "auto"
    #: "reference" = re-fake-quantize the whole cache every scale step, exactly
    #: like `basic_var.py:138-147`; "store" = quantize once on append (the
    #: TPU-native design: cache holds quantized values from the start).
    kv_mode: str = "store"
    #: "fake" keeps a dense bf16 cache; "packed" stores int8 codes +
    #: per-token scales (requires kv_mode="store" and a grid kv format).
    kv_backend: str = "fake"
    #: kv_bit=4 grouping compatibility: the reference reshapes the WHOLE
    #: cache tensor to (-1, 128) — one scale group spans 2 consecutive
    #: tokens at head_dim 64 (`fp_quant_e2_per_group_cuda`,
    #: `models_fp_quant_transform_rotate/quant_utils.py:313-330`, called at
    #: `basic_var.py:197-198`).  False (default) groups per head_dim row,
    #: which is shardable over tp and never mixes tokens; True reproduces
    #: the reference grouping bit-wise (kv_mode="reference"/"store" fake
    #: backends only — the packed codec is per-token by design).
    kv_ref_grouping: bool = False
    #: int8 attention contractions over the packed KV codes (TPU-native
    #: extension; the reference never quantizes q or the score matrix).
    #: Requires kv_backend="packed" with an integer-value kv format: q is
    #: quantized per-(token, head) to int8 and QK^T runs int8xint8->int32 on
    #: the MXU against the cached k codes; the per-row softmax weights (with
    #: the v scales folded in) are likewise int8-quantized so the PV
    #: contraction is a second int8 MXU dot.  Extra error is <=1/254 of the
    #: per-row absmax on each side.
    attn_int8: bool = False

    rotate: bool = False
    block_rotate: bool = True
    rotation_block: int = 128
    rotation_seed: int = 42
    transform: bool = False             # GALT smoothing

    #: "fake"   — quantize→dequantize in bf16/f32, matmuls dense (parity path)
    #: "packed" — nibble codes + scales, Pallas fused dequant-matmul
    #:            (weight-HBM-capacity path: 4x smaller weights)
    #: "int8"   — integer-value codes both sides, int8 x int8 -> int32
    #:            MXU GEMM (exact integer arithmetic, tighter than the fake
    #:            bf16 GEMM).  With weight_quant="per_channel" +
    #:            act_quant="per_token" ("int8ch") the scales hoist fully out
    #:            of the contraction and every GEMM is ONE full-K int8 MXU
    #:            dot — measured 1.45x the bf16 GEMM rate on v5e (1.36x
    #:            including the act-quant chain); the grouped-128 Pallas
    #:            GEMM holds 0.98x, so per-group scaling is a free quality
    #:            knob (corrected roofline, ROUND_NOTES_r03.md); quality cost
    #:            of the coarser per-channel scales is ~2x logit MSE with
    #:            rotation on (tests/test_recipe_ablation.py).
    backend: str = "fake"
    # NOTE: a `fuse_act` rotate+quantize+GEMM Pallas pipeline and a fused
    # per-channel int8 kernel existed through round 3 and were retired —
    # four hand-scheduling attempts all measured slower than the XLA-fused
    # chain on v5e (ARCHITECTURE.md "Fused-kernel appendix").

    # Per-block mixed-format assignment (the paper's MixedFormat ablation,
    # `quant_utils.py:1256-1432`): optional tuple of per-block act formats.
    mixed_act_formats: Optional[Tuple[str, ...]] = None

    #: Quantize the AdaLN conditioning linear (per-block ada_lin, or
    #: shared_ada_lin for 512 models).  The reference INTENDS this — its
    #: quantize_VAR walks SharedAdaLin and has an ada_lin branch — but both
    #: are silent no-ops (`quant_utils.py:1232-1250`, SURVEY.md §2.3), and
    #: `search/search_fp_format_ada.py` searches formats for it anyway.
    #: Here it actually works: weights fake-quantized offline (modulations
    #: are computed ONCE per generation, so this is never a hot GEMM),
    #: SiLU(cond) quantized per-token with ``ada_format``.
    quantize_ada: bool = False
    ada_format: str = "auto"            # "auto" -> act_format

    def resolved_ada_format(self) -> str:
        return self.act_format if self.ada_format == "auto" else self.ada_format

    def resolved_kv_format(self) -> str:
        if self.kv_format != "auto":
            return self.kv_format
        if self.kv_bit == 6:
            return "fp6_e2m3"
        if self.kv_bit == 4:
            return "fp_e2"
        return "int_sym"

    def replace(self, **kw) -> "QuantConfig":
        return dataclasses.replace(self, **kw)


def fpqvar_w4a4() -> QuantConfig:
    """The paper's full FP4 recipe (run.sh:4-10 flag set)."""
    return QuantConfig(
        enabled=True, w_bit=4, a_bit=4, kv_bit=0,
        weight_quant="per_group", act_quant="per_group",
        weight_format="fp_e2", act_format="fp_e2",
        fc2_format="fp_e1m2_neg_e2m1_pos",
        rotate=True, block_rotate=True, transform=True,
    )


def fpqvar_w4a16() -> QuantConfig:
    """Weights-only FP4 deployment recipe (TPU-native extension; the
    reference has no weight-only mode — its forks always quantize acts).

    int8 weight codes per output channel, activations stay bf16: every GEMM
    is one bf16 MXU dot over converted codes with a single output-channel
    rescale (ops/pallas/int8_matmul._wonly_dot).  Half the weight HBM
    traffic of bf16 with NO act-quant chain — the batch-1 latency mode.
    No rotation/GALT: those exist to tame activation outliers, and with
    acts unquantized per-channel fp4 weights need neither.
    """
    return QuantConfig(
        enabled=True, w_bit=4, a_bit=16, kv_bit=0,
        weight_quant="per_channel", act_quant="per_token",
        weight_format="fp_e2", act_format="bf16", fc2_format="bf16",
        backend="int8",
    )


def fpqvar_w6a6() -> QuantConfig:
    return QuantConfig(
        enabled=True, w_bit=6, a_bit=6, kv_bit=0,
        weight_quant="per_group", act_quant="per_group",
        weight_format="fp6_e2m3", act_format="fp6_e2m3",
        fc2_format="fp6_int_neg_e2m3_pos",
        rotate=True, block_rotate=True, transform=True,
    )


def bench_recipes() -> dict:
    """The named execution modes every benchmark/diagnostic CLI shares
    (bench.py, scripts/latency_breakdown.py, scripts/serving_bench.py,
    scripts/block_bisect.py).  ONE definition so a recipe tweak cannot make
    two tools measure different configs under the same mode name.

    Semantics (measured ratios in ROUND_NOTES_r04.md):
      bf16      unquantized baseline
      fake      exact fp4 W4A4 values, dense bf16 GEMMs (the parity path)
      int8      grouped-128 int8 codes both sides (Pallas kernel) —
                QUALITY path (per-group scales free), not a speed path:
                in-model b8 0.51-0.59x bf16 across both the 2D and the
                N-D-aware kernel routings (ROUND_NOTES_r05.md)
      int8ch    per-channel/per-token scales -> full-K int8 MXU dots,
                dual-grid fc2 (the paper's full recipe on the int8 backend)
      int8chs   int8ch with single-grid fc2 (every GEMM 1x count)
      int8chsnr int8chs minus online rotation + GALT (diagnostic)
      packed    nibble-packed weights, Pallas fused dequant+matmul
      w4a16     weights-only int8 codes, bf16 acts (batch-1 serving mode)
      w4a16p    weights-only nibble-packed codes (capacity probe)
      int8kv    int8ch + packed int8 KV cache (the CAPACITY mode: ~2x
                less cache HBM, runs d30 b32 where dense bf16 OOMs;
                0.93-0.94x bf16 at b8 — ROUND_NOTES_r05.md)
      int8att   int8kv + int8 MXU attention contractions (measured
                neutral vs int8kv; opt-in)
    """
    base = fpqvar_w4a4()
    return {
        "bf16": QuantConfig(),
        "fake": base,
        "int8": base.replace(backend="int8"),
        "int8ch": base.replace(backend="int8", weight_quant="per_channel",
                               act_quant="per_token"),
        "int8chs": base.replace(backend="int8", weight_quant="per_channel",
                                act_quant="per_token", fc2_format="fp_e2"),
        "int8chsnr": base.replace(backend="int8",
                                  weight_quant="per_channel",
                                  act_quant="per_token", fc2_format="fp_e2",
                                  rotate=False, transform=False),
        "packed": base.replace(backend="packed"),
        "w4a16": fpqvar_w4a16(),
        "w4a16p": fpqvar_w4a16().replace(backend="packed",
                                         weight_quant="per_group"),
        "int8kv": base.replace(backend="int8", weight_quant="per_channel",
                               act_quant="per_token", kv_bit=4,
                               kv_backend="packed"),
        "int8att": base.replace(backend="int8", weight_quant="per_channel",
                                act_quant="per_token", kv_bit=4,
                                kv_backend="packed", attn_int8=True),
    }


# ---------------------------------------------------------------------------
# Generation / mesh
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class GenerateConfig:
    """Sampling parameters (`evaluate_fp_quant_transform_rotate.py:196-199`)."""

    cfg: float = 1.5
    top_k: int = 900
    top_p: float = 0.96
    more_smooth: bool = False
    seed: int = 0


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh for distributed generation/training.

    The reference is single-process single-GPU (§2.9 of SURVEY.md); this layer
    is new.  ``dp`` shards the (CFG-doubled) batch, ``tp`` shards attention
    heads / FFN hidden / vocab.
    """

    dp: int = 1
    tp: int = 1

    @property
    def num_devices(self) -> int:
        return self.dp * self.tp
