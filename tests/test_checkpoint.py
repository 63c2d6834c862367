"""Checkpoint converter + persistence tests.

Real upstream .pth files are not available in this environment, so the
converter is validated structurally: a synthetic torch-keyed state dict
(built from `expected_var_keys`) must convert into a tree with exactly the
same treedef and shapes as `init_var_params`, and npz save/load must
round-trip both plain and packed trees."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from fpqvar_tpu.config import QuantConfig, VARConfig, VQVAEConfig
from fpqvar_tpu.models.var import init_var_params
from fpqvar_tpu.models.vqvae import init_vqvae_params
from fpqvar_tpu.ops.packing import PackedTensor, pack
from fpqvar_tpu.utils import checkpoint as C

TINY = VARConfig(
    depth=2, embed_dim=128, num_heads=2, patch_nums=(1, 2, 3),
    vae=VQVAEConfig(vocab_size=64, z_channels=8, ch=16, ch_mult=(1, 2),
                    num_res_blocks=1, patch_nums=(1, 2, 3)),
)


def _shapes(tree):
    return jax.tree_util.tree_map(lambda x: tuple(np.shape(x)), tree)


def _synthetic_var_sd(cfg):
    """torch-keyed state dict with the real shapes of each upstream tensor."""
    c, d, heads = cfg.width, cfg.depth, cfg.heads
    cvae, v = cfg.vae.z_channels, cfg.vae.vocab_size
    shapes = {
        "word_embed.weight": (c, cvae), "word_embed.bias": (c,),
        "class_emb.weight": (cfg.num_classes + 1, c),
        "pos_start": (1, cfg.first_l, c), "pos_1LC": (1, cfg.L, c),
        "lvl_embed.weight": (cfg.num_scales, c),
        "head_nm.ada_lin.1.weight": (2 * c, c),
        "head_nm.ada_lin.1.bias": (2 * c,),
        "head.weight": (v, c), "head.bias": (v,),
    }
    for i in range(d):
        p = f"blocks.{i}."
        shapes.update({
            p + "attn.mat_qkv.weight": (3 * c, c),
            p + "attn.q_bias": (c,), p + "attn.v_bias": (c,),
            p + "attn.scale_mul_1H11": (1, heads, 1, 1),
            p + "attn.proj.weight": (c, c), p + "attn.proj.bias": (c,),
            p + "ffn.fc1.weight": (4 * c, c), p + "ffn.fc1.bias": (4 * c,),
            p + "ffn.fc2.weight": (c, 4 * c), p + "ffn.fc2.bias": (c,),
            p + "ada_lin.1.weight": (6 * c, c), p + "ada_lin.1.bias": (6 * c,),
        })
    rng = np.random.default_rng(0)
    return {k: rng.normal(size=s).astype(np.float32) for k, s in shapes.items()}


def test_var_conversion_matches_init_structure():
    sd = _synthetic_var_sd(TINY)
    assert set(sd) == set(C.expected_var_keys(TINY))
    converted = C.convert_var_state_dict(sd, TINY)
    ref = init_var_params(jax.random.PRNGKey(0), TINY)
    assert (jax.tree_util.tree_structure(_shapes(converted))
            == jax.tree_util.tree_structure(_shapes(ref)))
    assert _shapes(converted) == _shapes(ref)
    # spot check a stacked leaf round-trips values
    np.testing.assert_array_equal(
        converted["blocks"]["fc1_w"][1], sd["blocks.1.ffn.fc1.weight"])


def test_vqvae_conversion_matches_init_structure():
    ref = init_vqvae_params(jax.random.PRNGKey(0), TINY.vae)
    # synthesize a torch-keyed sd from the init tree via the inverse mapping
    import re

    flat = C._flatten(ref)
    sd = {}
    for k, v in flat.items():
        kk = re.sub(r"/w$", ".weight", k)
        kk = re.sub(r"/b$", ".bias", kk)
        kk = kk.replace("/", ".")
        # list indices & phi naming
        kk = kk.replace("quantize.phi", "quantize.quant_resi.qresi_ls")
        kk = kk.replace("quantize.quant_resi.qresi_ls.embedding",
                        "quantize.embedding")
        for lvl in range(4):
            kk = kk.replace(f"down.{lvl}.downsample",
                            f"down.{lvl}.downsample.conv")
            kk = kk.replace(f"up.{lvl}.upsample", f"up.{lvl}.upsample.conv")
        sd[kk] = np.asarray(v)
    sd["quantize.embedding.weight"] = np.asarray(ref["quantize"]["embedding"])
    converted = C.convert_vqvae_state_dict(sd, TINY.vae)
    assert _shapes(converted) == _shapes(ref)
    np.testing.assert_array_equal(
        converted["decoder"]["conv_in"]["w"],
        np.asarray(ref["decoder"]["conv_in"]["w"]))


def test_npz_roundtrip_with_packed(tmp_path):
    tree = {
        "a": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "blocks": {
            "list": [np.ones((2,)), np.zeros((3,))],
            "packed": pack(jnp.array(
                np.random.default_rng(1).normal(size=(4, 256)),
                dtype=jnp.float32), "fp_e2"),
        },
    }
    path = os.path.join(tmp_path, "ckpt.npz")
    C.save_params(path, tree)
    loaded = C.load_params(path)
    np.testing.assert_array_equal(loaded["a"]["w"], tree["a"]["w"])
    np.testing.assert_array_equal(loaded["blocks"]["list"][1], np.zeros((3,)))
    p = loaded["blocks"]["packed"]
    assert isinstance(p, PackedTensor)
    assert p.fmt == "fp_e2" and p.shape == (4, 256)
    np.testing.assert_array_equal(
        np.asarray(p.codes), np.asarray(tree["blocks"]["packed"].codes))


def test_intpack_roundtrip(tmp_path):
    """int8-backend checkpoints (IntPack leaves) persist and reload."""
    import jax

    from fpqvar_tpu.ops import packing as P
    from fpqvar_tpu.utils.checkpoint import load_params, save_params

    w = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 256))
    pw = P.pack_int_codes(w, "fp_e2")
    tree = {"blocks": {"mat_qkv_w": pw, "bias": np.zeros((2, 4), np.float32)}}
    path = str(tmp_path / "ck.npz")
    save_params(path, tree)
    back = load_params(path)
    got = back["blocks"]["mat_qkv_w"]
    assert isinstance(got, P.IntPack)
    assert got.fmt == "fp_e2" and got.shape == pw.shape
    np.testing.assert_array_equal(np.asarray(got.codes), np.asarray(pw.codes))
    np.testing.assert_array_equal(np.asarray(got.scales),
                                  np.asarray(pw.scales))


def test_npz_roundtrip_bf16(tmp_path):
    """bfloat16 leaves (plain AND packed scales) survive the npz round trip:
    npz stores dtypes by descr, which loses ml_dtypes' bfloat16 — it loaded
    back as raw void and the first jit rejected the tree (regression: a
    bf16-cast convert_checkpoint.py output crashed evaluate --packed-ckpt)."""
    import jax
    import jax.numpy as jnp

    from fpqvar_tpu.ops import packing as P

    w = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 256))
    tree = {
        "b": np.asarray(jnp.full((3, 4), 1.5, jnp.bfloat16)),
        "f32": np.ones((2,), np.float32),
        "ip": P.IntPack(
            np.zeros((2, 4), np.int8),
            np.asarray(jnp.full((2, 1), 0.25, jnp.bfloat16)),
            "fp_e2", (2, 4), 4),
        "pk": pack(jnp.asarray(w, jnp.float32), "fp_e2"),
    }
    path = os.path.join(tmp_path, "bf16.npz")
    C.save_params(path, tree)
    back = C.load_params(path)
    assert back["b"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(back["b"].astype(np.float32),
                                  np.full((3, 4), 1.5, np.float32))
    assert back["f32"].dtype == np.float32
    assert back["ip"].scales.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(back["ip"].scales, np.float32), 0.25)
    # the loaded tree must be jit-consumable
    jax.jit(lambda t: t["b"].sum() + t["ip"].scales.astype(jnp.float32).sum())(
        {"b": back["b"], "ip": back["ip"]})


def test_npz_roundtrip_empty_containers(tmp_path):
    """Empty lists/dicts survive save/load: VQVAE encoder/decoder levels
    carry empty 'attn' lists that the forwards index (`if level["attn"]`) —
    dropping them made convert_checkpoint.py's _vae.npz unusable."""
    tree = {
        "levels": [
            {"attn": [], "res": [np.ones((2,), np.float32)]},
            {"attn": [{"w": np.zeros((3,), np.float32)}], "res": []},
        ],
        "empty": {},
    }
    path = os.path.join(tmp_path, "vae.npz")
    C.save_params(path, tree)
    back = C.load_params(path)
    assert back["levels"][0]["attn"] == []
    assert back["levels"][1]["res"] == []
    assert back["empty"] == {}
    np.testing.assert_array_equal(back["levels"][0]["res"][0], np.ones((2,)))
    assert back["levels"][1]["attn"][0]["w"].shape == (3,)
