"""Device mesh + sharding rules.

The reference is single-process single-GPU; its only distributed machinery is
dormant upstream-VAR DDP residue (SURVEY.md §2.9).  This layer is new and
TPU-first: a {dp, tp} `jax.sharding.Mesh`, NamedSharding annotations on the
stacked parameter tree, and jit-propagated XLA collectives over ICI.

Sharding scheme (Megatron-style column/row split per transformer block, laid
out so each pair (mat_qkv->proj, fc1->fc2) needs exactly one psum per branch):

- ``mat_qkv_w`` [d, 3C, C]:   split output dim over tp (heads split)
- ``proj_w``    [d, C, C]:    split input dim over tp  (row-parallel)
- ``fc1_w``     [d, 4C, C]:   split output dim over tp
- ``fc2_w``     [d, C, 4C]:   split input dim over tp  (row-parallel)
- ``head.w``    [V, C]:       split vocab over tp
- KV cache [d, B, L, H*c]:    batch over dp, merged heads over tp
- activations [B, l, C]:      batch over dp, replicated over tp

Everything else (embeddings, AdaLN, norms, biases of row-parallel layers) is
replicated — they are tiny next to the four big matmuls.
"""
from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fpqvar_tpu.config import MeshConfig
from fpqvar_tpu.ops.packing import IntPack, PackedTensor


def make_mesh(mcfg: MeshConfig, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = mcfg.dp * mcfg.tp
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(mcfg.dp, mcfg.tp)
    return Mesh(arr, axis_names=("dp", "tp"))


# per-leaf PartitionSpec for the block-stacked weights; None -> replicated
_BLOCK_SPECS = {
    "mat_qkv_w": P(None, "tp", None),
    "proj_w": P(None, None, "tp"),
    "fc1_w": P(None, "tp", None),
    "fc2_w": P(None, None, "tp"),
    "fc1_b": P(None, "tp"),
    "q_bias": P(None),       # qkv bias is added post-matmul on 3C: replicate
    "v_bias": P(None),
}

_TOP_SPECS = {
    "head": {"w": P("tp", None), "b": P("tp")},
}


def _path_keys(path):
    out = []
    for p in path:
        if hasattr(p, "key"):
            out.append(p.key)
        elif hasattr(p, "idx"):
            out.append(p.idx)
        elif hasattr(p, "name"):
            out.append(p.name)
    return out


def _pack_shardings(key: str, pack, mesh: Mesh, tp: int):
    """Shardings for a quantized-weight pack (depth-stacked leaves).

    mat_qkv/fc1 are column-parallel (output dim over tp), proj/fc2
    row-parallel (input dim / scale groups over tp) — matching the
    shard_map'ed kernel paths in ops/pallas.  Falls back to replication
    when tp doesn't divide the relevant 128-tile / scale-group counts.
    """
    col = key in ("mat_qkv_w", "fc1_w")
    n, k_dim = pack.shape[-2], pack.shape[-1]
    gs = pack.group_size
    if isinstance(pack, IntPack):
        # codes [d, K, N], scales [d, G, N]
        if gs == k_dim and not col:
            # per-channel (G == 1): codes split on K, the single scale
            # row replicates (shard_map psums int32 partials, scales after
            # — ops/pallas/int8_matmul row-per-channel branch)
            ok = k_dim % (128 * tp) == 0
            cs = P(None, "tp", None) if ok else P()
            ss = P()
        else:
            ok = (n % (128 * tp) == 0) if col else (k_dim % (gs * tp) == 0)
            cs = ss = (P(None, None, "tp") if col
                       else P(None, "tp", None)) if ok else P()
    else:
        # PackedTensor codes [d, rows, K], scales [d, N, G]
        ok = (n % (128 * tp) == 0) if col else (k_dim % (gs * tp) == 0)
        if not ok:
            cs = ss = P()
        elif col:
            cs = ss = P(None, "tp", None)
        else:
            cs = ss = P(None, None, "tp")
    return dataclasses.replace(
        pack, codes=NamedSharding(mesh, cs), scales=NamedSharding(mesh, ss))


def param_shardings(params, mesh: Mesh):
    """NamedSharding tree matching the params tree (leaf-for-leaf;
    quantized-weight packs get tp-sharded codes/scales)."""
    tp = mesh.shape.get("tp", 1)

    def spec_for(path, leaf):
        keys = _path_keys(path)
        if isinstance(leaf, (IntPack, PackedTensor)):
            for k in keys:
                if k in ("mat_qkv_w", "proj_w", "fc1_w", "fc2_w"):
                    return _pack_shardings(k, leaf, mesh, tp)
            return dataclasses.replace(
                leaf, codes=NamedSharding(mesh, P()),
                scales=NamedSharding(mesh, P()))
        spec = P()
        for i, k in enumerate(keys):
            if k in _BLOCK_SPECS:
                spec = _BLOCK_SPECS[k]
                break
            if k == "head" and i + 1 < len(keys):
                spec = _TOP_SPECS["head"].get(keys[i + 1], P())
                break
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(
        spec_for, params,
        is_leaf=lambda x: isinstance(x, (IntPack, PackedTensor)))


def kv_cache_shardings(mesh: Mesh, packed: bool = False) -> NamedSharding:
    # dense cache [depth, B, L, H*c]: batch over dp, merged heads over tp.
    # packed cache (codes [depth, B, H, L*hd] / scales [depth, B, H, L]):
    # batch over dp, heads over tp (head-major layout — models/var.py
    # init_kv_cache).
    if packed:
        return NamedSharding(mesh, P(None, "dp", "tp", None))
    return NamedSharding(mesh, P(None, "dp", None, "tp"))


def act_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp", None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh):
    """Place a params tree onto the mesh with the scheme above."""
    sh = param_shardings(params, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, sh)
