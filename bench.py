#!/usr/bin/env python
"""Throughput benchmark: images/sec/chip, VAR-d30 FP4 256x256.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}

vs_baseline = fp4-packed throughput / bf16-unquantized throughput on the same
chip and batch (the reference publishes no throughput numbers at all —
BASELINE.md — so our bf16 path is the baseline).

Run standalone (single jax process): `python bench.py`.
Smaller presets: `python bench.py --preset tiny|d16` for smoke runs.
"""
import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: remote compiles through the axon tunnel cost
# 30-60s each; caching makes repeat bench runs (and the driver's) near-free.
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def build(preset: str):
    from fpqvar_tpu.config import VARConfig, VQVAEConfig

    if preset == "tiny":
        cfg = VARConfig(
            depth=2, embed_dim=128, num_heads=2, patch_nums=(1, 2, 3),
            vae=VQVAEConfig(vocab_size=64, z_channels=8, ch=16,
                            ch_mult=(1, 2), num_res_blocks=1,
                            patch_nums=(1, 2, 3)))
        batch = 2
    elif preset == "d16":
        cfg = VARConfig(depth=16)
        batch = 8
    else:
        cfg = VARConfig(depth=30)
        batch = 8
    return cfg, batch


def time_generate(gen, params, vae_params, label, key, rounds=3):
    # warmup + compile
    imgs = gen.generate(params, vae_params, label, key)
    imgs.block_until_ready()
    t0 = time.perf_counter()
    for i in range(rounds):
        imgs = gen.generate(params, vae_params, label,
                            jax.random.fold_in(key, i))
        imgs.block_until_ready()
    dt = (time.perf_counter() - t0) / rounds
    assert not bool(jnp.isnan(imgs).any()), "NaN in generated images"
    return label.shape[0] / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="d30",
                    choices=["tiny", "d16", "d30"])
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--batch", type=int, default=None,
                    help="override preset batch size")
    args = ap.parse_args()

    from fpqvar_tpu.config import GenerateConfig, QuantConfig, fpqvar_w4a4
    from fpqvar_tpu.models import VARGenerator
    from fpqvar_tpu.models.var import init_var_params
    from fpqvar_tpu.models.vqvae import init_vqvae_params
    from fpqvar_tpu.quantize import quantize_var_params

    cfg, batch = build(args.preset)
    if args.batch:
        batch = args.batch
    key = jax.random.PRNGKey(0)
    # init on host CPU (avoids pulling hundreds of MB back from the device
    # for the offline quantization transform), then place on the accelerator
    # once.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        var_p = init_var_params(key, cfg, dtype=jnp.bfloat16)
        vae_p = init_vqvae_params(jax.random.PRNGKey(1), cfg.vae)
        vae_p = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            vae_p)
    dev = jax.devices()[0]
    vae_p = jax.device_put(vae_p, dev)
    label = jnp.arange(batch, dtype=jnp.int32) % cfg.num_classes
    gen_cfg = GenerateConfig()

    # Two fp4 execution modes are benchmarked (ARCHITECTURE.md "three
    # tiers"): "fake" = exact fp4 W4A4 values with pre-dequantized bf16
    # weights (the throughput deployment mode on v5e, where nonuniform-grid
    # decode is VPU-bound), and "packed" = int8-coded weights decoded
    # in-kernel (the memory-capacity mode: 4x less weight HBM).  Offline
    # transforms run host-side; param sets are measured one at a time and
    # freed (three d30 sets at once would exhaust HBM).
    def free(tree):
        for leaf in jax.tree_util.tree_leaves(tree):
            if hasattr(leaf, "delete"):
                leaf.delete()

    var_host = jax.tree_util.tree_map(np.asarray, var_p)
    qcfg_pk = fpqvar_w4a4().replace(backend="packed", transform=False)
    qcfg_fk = fpqvar_w4a4().replace(transform=False)
    qcfg_i8 = fpqvar_w4a4().replace(backend="int8", transform=False)

    var_dev = jax.device_put(var_host, dev)
    gen_bf16 = VARGenerator(cfg, QuantConfig(), gen_cfg)
    ips_bf16 = time_generate(gen_bf16, var_dev, vae_p, label, key, args.rounds)
    print(f"# bf16: {ips_bf16:.3f} images/sec", file=sys.stderr)
    free(var_dev)

    qp_fk = quantize_var_params(var_host, cfg, qcfg_fk)
    qp_fk = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, qp_fk)
    gen_fk = VARGenerator(cfg, qcfg_fk, gen_cfg)
    ips_fk = time_generate(gen_fk, qp_fk, vae_p, label, key, args.rounds)
    print(f"# fp4-fake(W4A4 bf16-gemm): {ips_fk:.3f} images/sec",
          file=sys.stderr)
    free(qp_fk)

    qp_i8 = quantize_var_params(var_host, cfg, qcfg_i8)
    gen_i8 = VARGenerator(cfg, qcfg_i8, gen_cfg)
    ips_i8 = time_generate(gen_i8, qp_i8, vae_p, label, key, args.rounds)
    print(f"# fp4-int8(grouped int8-MXU GEMM): {ips_i8:.3f} images/sec",
          file=sys.stderr)
    free(qp_i8)

    qp_pk = quantize_var_params(var_host, cfg, qcfg_pk)
    gen_pk = VARGenerator(cfg, qcfg_pk, gen_cfg)
    ips_pk = time_generate(gen_pk, qp_pk, vae_p, label, key, args.rounds)
    print(f"# fp4-packed: {ips_pk:.3f} images/sec", file=sys.stderr)
    free(qp_pk)

    best_name, ips_fp4 = max(
        (("fake", ips_fk), ("packed", ips_pk), ("int8", ips_i8)),
        key=lambda t: t[1])
    print(json.dumps({
        "metric": f"images/sec/chip VAR-{args.preset} FP4 W4A4 256x256 "
                  f"(e2m1 per-group-128 + block-Hadamard + fc2 dual-grid; "
                  f"best mode={best_name}; batch {batch}, cfg-doubled; "
                  f"bf16={ips_bf16:.3f}, fake={ips_fk:.3f}, "
                  f"int8={ips_i8:.3f}, packed={ips_pk:.3f})",
        "value": round(ips_fp4, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips_fp4 / ips_bf16, 4),
    }))


if __name__ == "__main__":
    main()
