#!/usr/bin/env python
"""Per-scale latency breakdown of one generation call.

Times each of the 10 scale-step programs (plus prepare and the VQVAE
decode) separately via the engine's stepwise path, and the fused
single-program path for reference.  Used to attribute the gap between the
roofline floor (weight HBM + MXU time, ROUND_NOTES_r02.md) and the
measured batch-1 step time: per-step rows show whether time concentrates
in the late large-M scales (GEMM/weight-bound, expected) or is a flat
per-step overhead (sampling, relay dispatch, cache plumbing).

Timing notes (see tpu-relay memory / bench.py): per-round MEDIAN per step;
each step is forced by fetching f_hat (32 KB at batch 1) because
block_until_ready through the axon relay can return before execution.
The fetch adds one relay round-trip per step — measured identically in
every row, so rows are comparable with each other and their sum slightly
overstates the fused call.

Usage: python scripts/latency_breakdown.py [--mode bf16|w4a16|int8chs]
           [--batch 1] [--rounds 15] [--preset d30|d16|tiny]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from fpqvar_tpu.utils.jit_cache import enable as _enable_cache  # noqa: E402

_enable_cache()


def build_cfg(preset):
    from fpqvar_tpu.config import VARConfig, VQVAEConfig

    if preset == "tiny":
        return VARConfig(
            depth=2, embed_dim=128, num_heads=2, patch_nums=(1, 2, 3),
            vae=VQVAEConfig(vocab_size=64, z_channels=8, ch=16,
                            ch_mult=(1, 2), num_res_blocks=1,
                            patch_nums=(1, 2, 3)))
    if preset == "d16":
        return VARConfig(depth=16)
    return VARConfig(depth=30)


def mode_qcfg(mode):
    from fpqvar_tpu.config import QuantConfig, fpqvar_w4a4, fpqvar_w4a16

    base = fpqvar_w4a4()
    return {
        "bf16": QuantConfig(),
        "fake": base,
        "w4a16": fpqvar_w4a16(),
        "int8chs": base.replace(backend="int8", weight_quant="per_channel",
                                act_quant="per_token", fc2_format="fp_e2"),
    }[mode]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="d30", choices=["tiny", "d16", "d30"])
    ap.add_argument("--mode", default="bf16",
                    choices=["bf16", "fake", "w4a16", "int8chs"])
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--rounds", type=int, default=15)
    args = ap.parse_args()

    from fpqvar_tpu.config import GenerateConfig
    from fpqvar_tpu.models import VARGenerator
    from fpqvar_tpu.models.var import init_kv_cache, init_var_params
    from fpqvar_tpu.models.vqvae import init_vqvae_params
    from fpqvar_tpu.quantize import quantize_var_params

    cfg = build_cfg(args.preset)
    qcfg = mode_qcfg(args.mode)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        var_p = init_var_params(jax.random.PRNGKey(0), cfg,
                                dtype=jnp.bfloat16)
        vae_p = init_vqvae_params(jax.random.PRNGKey(1), cfg.vae)
        vae_p = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, vae_p)
    if args.mode != "bf16":
        galt = (np.ones((cfg.depth, cfg.width), np.float32),
                np.ones((cfg.depth, cfg.width), np.float32))
        var_host = jax.tree_util.tree_map(np.asarray, var_p)
        var_p = quantize_var_params(var_host, cfg, qcfg, galt=galt)
        if qcfg.backend == "fake":
            var_p = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
                var_p)
    dev = jax.devices()[0]
    params = jax.device_put(
        jax.tree_util.tree_map(np.asarray, var_p), dev)
    vae_p = jax.device_put(vae_p, dev)

    b = args.batch
    label = jnp.arange(b, dtype=jnp.int32) % cfg.num_classes
    key = jax.random.PRNGKey(0)
    genc = GenerateConfig()

    # stepwise engine (per-scale programs) for the breakdown; fused for the
    # end-to-end reference number
    eng = VARGenerator(cfg, qcfg, genc, fuse_steps=False)
    fused = VARGenerator(cfg, qcfg, genc)

    # per-pass salt: the relay MEMOIZES identical (program, inputs)
    # executions (see bench.py _RUN_SALT) — an unsalted pass would re-issue
    # bit-identical step inputs every round and measure only the ~40 ms RTT
    salt = int.from_bytes(os.urandom(4), "little") & 0x7FFFFFFF
    pass_no = [0]

    def one_pass(record):
        """Run the stepwise chain once; append per-stage seconds."""
        pass_no[0] += 1
        k = jax.random.fold_in(jax.random.fold_in(key, salt), pass_no[0])
        # salt the transformer input too: prepare/scale0 consume (params,
        # label, x) before any sampling key enters the chain
        lbl = (label + pass_no[0]) % cfg.num_classes
        t0 = time.perf_counter()
        cond_BD, mod, lvl_pos, x = eng._prepare(params=params, label_B=lbl)
        jax.device_get(x)
        record.setdefault("prepare", []).append(time.perf_counter() - t0)
        x = x.astype(eng.compute_dtype)
        mod = mod.astype(eng.compute_dtype)
        lvl_pos = lvl_pos.astype(eng.compute_dtype)
        cache = init_kv_cache(cfg, 2 * b, kv_codec=eng.qrt.kv_codec)
        hw = cfg.patch_nums[-1]
        f_hat = jnp.zeros((b, cfg.vae.z_channels, hw, hw), jnp.float32)
        for st, step in zip(eng.statics, eng._steps):
            t0 = time.perf_counter()
            x, cache, f_hat, k = step(params, vae_p["quantize"], x,
                                      cond_BD, mod, lvl_pos, cache, f_hat, k)
            jax.device_get(f_hat[:, 0, 0, 0])
            record.setdefault(f"scale{st.si}_pn{st.pn}", []).append(
                time.perf_counter() - t0)
            if x is not None:
                x = x.astype(eng.compute_dtype)
        t0 = time.perf_counter()
        img = eng._decode(vae_p, f_hat)
        jax.device_get(img[:, 0, 0, 0])
        record.setdefault("vqvae_decode", []).append(time.perf_counter() - t0)

    rec = {}
    one_pass(rec)  # compile
    rec = {}
    for _ in range(args.rounds):
        one_pass(rec)

    # fused end-to-end (same per-process salt: deterministic keys would be
    # memoized by the relay across runs)
    fkey = jax.random.fold_in(key, salt + 1)
    img = fused.generate(params, vae_p, label, fkey)
    jax.device_get(img[:, 0, 0, 0])
    dts = []
    for i in range(args.rounds):
        t0 = time.perf_counter()
        img = fused.generate(params, vae_p, label,
                             jax.random.fold_in(fkey, i))
        jax.device_get(img[:, 0, 0, 0])
        dts.append(time.perf_counter() - t0)

    rows = {k: round(float(np.median(v)) * 1e3, 3) for k, v in rec.items()}
    total_stepwise = round(sum(rows.values()), 3)
    fused_ms = round(float(np.median(dts)) * 1e3, 3)
    out = {
        "preset": args.preset, "mode": args.mode, "batch": b,
        "rounds": args.rounds, "per_stage_ms": rows,
        "stepwise_sum_ms": total_stepwise, "fused_call_ms": fused_ms,
        "imgs_per_s_fused": round(b / (fused_ms / 1e3), 3),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
