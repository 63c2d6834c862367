"""Checkpoint conversion and persistence.

Converts upstream FoundationVision-VAR torch checkpoints (the .pth files the
reference loads at `evaluate_fp_quant_transform_rotate.py:59-76`) into this
framework's stacked-pytree layout, and persists (possibly quantized/packed)
param trees as npz archives — the reference never persists quantized models
(it re-quantizes at every startup, SURVEY.md §5 checkpoint/resume).

Torch key map is derived from the reference module definitions:
`models/var.py:26-121` (VAR), `models/vqvae.py:17-49` + `models/basic_vae.py`
+ `models/quant.py` (VQVAE).  Tensors keep torch layout (conv OIHW, linear
(out,in)) so conversion is transpose-free.
"""
from __future__ import annotations

import json
import re
from typing import Dict, Tuple

import ml_dtypes
import numpy as np

from fpqvar_tpu.config import VARConfig, VQVAEConfig
from fpqvar_tpu.ops.packing import IntPack, PackedTensor

_BF16 = np.dtype(ml_dtypes.bfloat16)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """torch.load -> {key: float32 numpy}. torch is used host-side only."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.to(torch.float32).numpy() for k, v in sd.items()
            if hasattr(v, "numpy")}


# ---------------------------------------------------------------------------
# VAR conversion
# ---------------------------------------------------------------------------

def convert_var_state_dict(
    sd: Dict[str, np.ndarray], cfg: VARConfig
) -> dict:
    """Upstream VAR state dict -> stacked params tree (numpy leaves)."""
    d = cfg.depth

    def stack(fmt: str) -> np.ndarray:
        return np.stack([sd[fmt.format(i=i)] for i in range(d)])

    blocks = {
        "mat_qkv_w": stack("blocks.{i}.attn.mat_qkv.weight"),
        "q_bias": stack("blocks.{i}.attn.q_bias"),
        "v_bias": stack("blocks.{i}.attn.v_bias"),
        "scale_mul": stack("blocks.{i}.attn.scale_mul_1H11"),
        "proj_w": stack("blocks.{i}.attn.proj.weight"),
        "proj_b": stack("blocks.{i}.attn.proj.bias"),
        "fc1_w": stack("blocks.{i}.ffn.fc1.weight"),
        "fc1_b": stack("blocks.{i}.ffn.fc1.bias"),
        "fc2_w": stack("blocks.{i}.ffn.fc2.weight"),
        "fc2_b": stack("blocks.{i}.ffn.fc2.bias"),
        "mat_qkv_s": np.ones((d, cfg.width), np.float32),
        "fc1_s": np.ones((d, cfg.width), np.float32),
    }
    if cfg.shared_aln:
        blocks["ada_gss"] = stack("blocks.{i}.ada_gss").reshape(
            d, 6, cfg.width)
    else:
        blocks["ada_lin"] = {
            "w": stack("blocks.{i}.ada_lin.1.weight"),
            "b": stack("blocks.{i}.ada_lin.1.bias"),
        }

    params = {
        "word_embed": {"w": sd["word_embed.weight"],
                       "b": sd["word_embed.bias"]},
        "class_emb": sd["class_emb.weight"],
        "pos_start": sd["pos_start"],
        "pos_1LC": sd["pos_1LC"],
        "lvl_embed": sd["lvl_embed.weight"],
        "blocks": blocks,
        "head_nm": {"w": sd["head_nm.ada_lin.1.weight"],
                    "b": sd["head_nm.ada_lin.1.bias"]},
        "head": {"w": sd["head.weight"], "b": sd["head.bias"]},
    }
    if cfg.shared_aln:
        params["shared_ada_lin"] = {
            "w": sd["shared_ada_lin.1.weight"],
            "b": sd["shared_ada_lin.1.bias"],
        }
    return params


def expected_var_keys(cfg: VARConfig) -> Tuple[str, ...]:
    """The torch keys the converter consumes (for validation/tests)."""
    keys = ["word_embed.weight", "word_embed.bias", "class_emb.weight",
            "pos_start", "pos_1LC", "lvl_embed.weight",
            "head_nm.ada_lin.1.weight", "head_nm.ada_lin.1.bias",
            "head.weight", "head.bias"]
    if cfg.shared_aln:
        keys += ["shared_ada_lin.1.weight", "shared_ada_lin.1.bias"]
    for i in range(cfg.depth):
        p = f"blocks.{i}."
        keys += [p + "attn.mat_qkv.weight", p + "attn.q_bias",
                 p + "attn.v_bias", p + "attn.scale_mul_1H11",
                 p + "attn.proj.weight", p + "attn.proj.bias",
                 p + "ffn.fc1.weight", p + "ffn.fc1.bias",
                 p + "ffn.fc2.weight", p + "ffn.fc2.bias"]
        keys += [p + "ada_gss"] if cfg.shared_aln else [
            p + "ada_lin.1.weight", p + "ada_lin.1.bias"]
    return tuple(keys)


# ---------------------------------------------------------------------------
# VQVAE conversion
# ---------------------------------------------------------------------------

def _conv(sd, prefix):
    return {"w": sd[prefix + ".weight"], "b": sd[prefix + ".bias"]}


def _gn(sd, prefix):
    return {"w": sd[prefix + ".weight"], "b": sd[prefix + ".bias"]}


def _resnet(sd, p):
    out = {
        "norm1": _gn(sd, p + ".norm1"), "conv1": _conv(sd, p + ".conv1"),
        "norm2": _gn(sd, p + ".norm2"), "conv2": _conv(sd, p + ".conv2"),
    }
    if p + ".nin_shortcut.weight" in sd:
        out["nin_shortcut"] = _conv(sd, p + ".nin_shortcut")
    return out


def _attn(sd, p):
    return {"norm": _gn(sd, p + ".norm"), "qkv": _conv(sd, p + ".qkv"),
            "proj_out": _conv(sd, p + ".proj_out")}


def convert_vqvae_state_dict(
    sd: Dict[str, np.ndarray], cfg: VQVAEConfig
) -> dict:
    nres = len(cfg.ch_mult)

    enc = {"conv_in": _conv(sd, "encoder.conv_in"), "down": []}
    for i in range(nres):
        level = {"block": [], "attn": []}
        for j in range(cfg.num_res_blocks):
            level["block"].append(_resnet(sd, f"encoder.down.{i}.block.{j}"))
            if f"encoder.down.{i}.attn.{j}.norm.weight" in sd:
                level["attn"].append(_attn(sd, f"encoder.down.{i}.attn.{j}"))
        if f"encoder.down.{i}.downsample.conv.weight" in sd:
            level["downsample"] = _conv(sd, f"encoder.down.{i}.downsample.conv")
        enc["down"].append(level)
    enc["mid"] = {
        "block_1": _resnet(sd, "encoder.mid.block_1"),
        "attn_1": _attn(sd, "encoder.mid.attn_1"),
        "block_2": _resnet(sd, "encoder.mid.block_2"),
    }
    enc["norm_out"] = _gn(sd, "encoder.norm_out")
    enc["conv_out"] = _conv(sd, "encoder.conv_out")

    dec = {"conv_in": _conv(sd, "decoder.conv_in")}
    dec["mid"] = {
        "block_1": _resnet(sd, "decoder.mid.block_1"),
        "attn_1": _attn(sd, "decoder.mid.attn_1"),
        "block_2": _resnet(sd, "decoder.mid.block_2"),
    }
    up = []
    for i in range(nres):
        level = {"block": [], "attn": []}
        for j in range(cfg.num_res_blocks + 1):
            level["block"].append(_resnet(sd, f"decoder.up.{i}.block.{j}"))
            if f"decoder.up.{i}.attn.{j}.norm.weight" in sd:
                level["attn"].append(_attn(sd, f"decoder.up.{i}.attn.{j}"))
        if f"decoder.up.{i}.upsample.conv.weight" in sd:
            level["upsample"] = _conv(sd, f"decoder.up.{i}.upsample.conv")
        up.append(level)
    dec["up"] = up
    dec["norm_out"] = _gn(sd, "decoder.norm_out")
    dec["conv_out"] = _conv(sd, "decoder.conv_out")

    # PhiPartiallyShared (share_quant_resi=4) -> quant_resi.qresi_ls.{k};
    # PhiShared -> quant_resi.qresi; PhiNonShared -> quant_resi.{k}
    # (`models/quant.py:28-33,209-243`)
    phi = []
    for k in range(64):
        for pat in (f"quantize.quant_resi.qresi_ls.{k}",
                    f"quantize.quant_resi.{k}",
                    "quantize.quant_resi.qresi" if k == 0 else None):
            if pat and pat + ".weight" in sd:
                phi.append(_conv(sd, pat))
                break
    quant = {"embedding": sd["quantize.embedding.weight"], "phi": phi}

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
        "quantize": quant,
    }


# ---------------------------------------------------------------------------
# Persistence (npz + manifest; supports PackedTensor leaves)
# ---------------------------------------------------------------------------

def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        if not tree:
            # empty containers must survive the round trip: VQVAE levels
            # carry empty 'attn' lists and the forwards index them
            out[prefix + "__empty_dict"] = np.zeros((0,), np.uint8)
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        if not tree:
            out[prefix + "__empty_list"] = np.zeros((0,), np.uint8)
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    elif isinstance(tree, PackedTensor):
        scales = np.asarray(tree.scales)
        sc_bf16 = scales.dtype == _BF16
        out[prefix + "__packed_codes"] = np.asarray(tree.codes)
        out[prefix + "__packed_scales"] = (
            scales.view(np.uint16) if sc_bf16 else scales)
        out[prefix + "__packed_meta"] = np.frombuffer(
            json.dumps({"fmt": tree.fmt, "shape": list(tree.shape),
                        "group_size": tree.group_size,
                        "nibble_packed": tree.nibble_packed,
                        "scales_bf16": sc_bf16}).encode(),
            np.uint8)
    elif isinstance(tree, IntPack):
        scales = np.asarray(tree.scales)
        sc_bf16 = scales.dtype == _BF16
        out[prefix + "__intpack_codes"] = np.asarray(tree.codes)
        out[prefix + "__intpack_scales"] = (
            scales.view(np.uint16) if sc_bf16 else scales)
        out[prefix + "__intpack_meta"] = np.frombuffer(
            json.dumps({"fmt": tree.fmt, "shape": list(tree.shape),
                        "group_size": tree.group_size,
                        "scales_bf16": sc_bf16}).encode(), np.uint8)
    else:
        arr = np.asarray(tree)
        if arr.dtype == _BF16:
            # npz stores dtypes by descr, which loses ml_dtypes' registered
            # bfloat16 (it loads back as raw void and jax rejects it);
            # persist as a tagged uint16 view and re-view on load
            out[prefix.rstrip("/") + "/__bf16"] = arr.view(np.uint16)
        else:
            out[prefix.rstrip("/")] = arr
    return out


def save_params(path: str, tree, compress: bool = False) -> None:
    """Uncompressed by default: bf16/f32 weights and int8 codes are
    near-incompressible, and zlib runs ~10 MB/s single-threaded — a d30
    param tree took minutes to save and seconds to write raw.  Load speed
    matters too (bench.py's disk cache loads inside the driver's timed
    window).  ``compress=True`` restores np.savez_compressed for artifacts
    where disk size wins (archival checkpoints)."""
    (np.savez_compressed if compress else np.savez)(path, **_flatten(tree))


def load_params(path: str) -> dict:
    flat = dict(np.load(path, allow_pickle=False))
    # regroup packed triplets
    packed = {}
    plain = {}
    for k, v in flat.items():
        m = re.match(r"(.*)/__(packed|intpack)_(codes|scales|meta)$", k)
        if m:
            packed.setdefault((m.group(1), m.group(2)), {})[m.group(3)] = v
        else:
            plain[k] = v

    tree: dict = {}

    def insert(keys, val):
        node = tree
        for kk in keys[:-1]:
            node = node.setdefault(kk, {})
        node[keys[-1]] = val

    for k, v in plain.items():
        if k.endswith("/__bf16"):
            insert(k[: -len("/__bf16")].split("/"), v.view(_BF16))
        else:
            insert(k.split("/"), v)
    for (k, kind), parts in packed.items():
        meta = json.loads(bytes(parts["meta"]).decode())
        scales = parts["scales"]
        if meta.get("scales_bf16", False):
            scales = scales.view(_BF16)
        if kind == "intpack":
            insert(k.split("/"), IntPack(
                parts["codes"], scales, meta["fmt"],
                tuple(meta["shape"]), meta["group_size"]))
        else:
            insert(k.split("/"), PackedTensor(
                parts["codes"], scales, meta["fmt"],
                tuple(meta["shape"]), meta["group_size"],
                meta.get("nibble_packed", False)))

    def listify(node):
        if isinstance(node, dict):
            if "__empty_list" in node:
                return []
            if "__empty_dict" in node:
                return {}
            keys = list(node.keys())
            if keys and all(kk.isdigit() for kk in keys):
                return [listify(node[str(i)]) for i in range(len(keys))]
            return {kk: listify(vv) for kk, vv in node.items()}
        return node

    return listify(tree)
