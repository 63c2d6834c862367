#!/usr/bin/env python
"""Per-scale latency breakdown and cross-mode attribution.

Times each of the 10 scale-step programs (plus prepare and the VQVAE
decode) separately via the engine's stepwise path, and the fused
single-program path for reference — for ONE OR MORE modes in a single
invocation, so the rows are directly comparable (same relay window) and a
per-scale ratio table attributes where a quantized mode gives time back
vs bf16: early scales are weight-HBM-bound (low-bit weights should win),
late scales compute-bound (the int8 MXU chain should win per the
kernel_roofline legs), and a flat per-step overhead points at sampling /
cache plumbing / dispatch instead.

Timing notes (see tpu-relay memory / bench.py): per-round MEDIAN per step;
each step is forced by fetching f_hat (32 KB at batch 1) because
block_until_ready through the axon relay can return before execution.
The fetch adds one relay round-trip per step — measured identically in
every row, so rows are comparable with each other and their sum slightly
overstates the fused call.  Param trees are synthesized in device HBM
(quantize.recipe.synth_device_params) — no multi-GB relay uploads.

Usage: python scripts/latency_breakdown.py [--modes bf16,int8chs,...]
           [--batch 8] [--rounds 15] [--preset d30|d16|tiny]
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
    from fpqvar_tpu.config import VARConfig, VQVAEConfig, var_d36_512

    if preset == "tiny":
        return VARConfig(
            depth=2, embed_dim=128, num_heads=2, patch_nums=(1, 2, 3),
            vae=VQVAEConfig(vocab_size=64, z_channels=8, ch=16,
                            ch_mult=(1, 2), num_res_blocks=1,
                            patch_nums=(1, 2, 3)))
    if preset == "d16":
        return VARConfig(depth=16)
    if preset == "d36":
        return var_d36_512()
    return VARConfig(depth=30)


def mode_qcfg(mode):
    from fpqvar_tpu.config import bench_recipes

    return bench_recipes()[mode]


def measure_mode(cfg, mode, vae_p, batch, rounds, key):
    from fpqvar_tpu.config import GenerateConfig
    from fpqvar_tpu.models import VARGenerator
    from fpqvar_tpu.models.var import init_kv_cache
    from fpqvar_tpu.quantize.recipe import synth_device_params

    qcfg = mode_qcfg(mode)
    galt = None
    if qcfg.transform:
        galt = (np.ones((cfg.depth, cfg.width), np.float32),
                np.ones((cfg.depth, cfg.width), np.float32))
    params = synth_device_params(cfg, qcfg, key, galt=galt)
    for leaf in jax.tree_util.tree_leaves(params):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()

    b = batch
    label = jnp.arange(b, dtype=jnp.int32) % cfg.num_classes
    genc = GenerateConfig()
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
    for _ in range(rounds):
        one_pass(rec)

    # fused end-to-end (same per-process salt: deterministic keys would be
    # memoized by the relay across runs)
    fkey = jax.random.fold_in(key, salt + 1)
    img = fused.generate(params, vae_p, label, fkey)
    jax.device_get(img[:, 0, 0, 0])
    dts = []
    for i in range(rounds):
        t0 = time.perf_counter()
        img = fused.generate(params, vae_p, label,
                             jax.random.fold_in(fkey, i))
        jax.device_get(img[:, 0, 0, 0])
        dts.append(time.perf_counter() - t0)

    for leaf in jax.tree_util.tree_leaves(params):
        if hasattr(leaf, "delete"):
            leaf.delete()
    rows = {k: round(float(np.median(v)) * 1e3, 3) for k, v in rec.items()}
    fused_ms = round(float(np.median(dts)) * 1e3, 3)
    return rows, fused_ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="d30",
                    choices=["tiny", "d16", "d30", "d36"])
    ap.add_argument("--modes", default="bf16",
                    help="comma list of config.bench_recipes names; first "
                         "mode is the ratio denominator")
    ap.add_argument("--mode", default=None, help="legacy alias for --modes")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--rounds", type=int, default=15)
    args = ap.parse_args()
    modes = (args.mode or args.modes).split(",")

    from fpqvar_tpu.models.vqvae import init_vqvae_params

    cfg = build_cfg(args.preset)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def _vae_init(k):
        p = init_vqvae_params(k, cfg.vae)
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, p)

    vae_p = _vae_init(jax.random.PRNGKey(1))

    per_mode, fused = {}, {}
    for mode in modes:
        t0 = time.perf_counter()
        rows, fused_ms = measure_mode(cfg, mode, vae_p, args.batch,
                                      args.rounds, key)
        per_mode[mode], fused[mode] = rows, fused_ms
        print(f"# {mode}: stepwise sum {sum(rows.values()):.1f} ms, fused "
              f"{fused_ms:.1f} ms (wall {time.perf_counter()-t0:.0f}s)",
              file=sys.stderr, flush=True)

    out = {
        "preset": args.preset, "batch": args.batch, "rounds": args.rounds,
        "per_stage_ms": per_mode,
        "stepwise_sum_ms": {m: round(sum(r.values()), 3)
                            for m, r in per_mode.items()},
        "fused_call_ms": fused,
        "imgs_per_s_fused": {m: round(args.batch / (v / 1e3), 3)
                             for m, v in fused.items()},
    }
    if len(modes) > 1:
        base = modes[0]
        out["stage_ratio_vs_" + base] = {
            m: {k: round(per_mode[m][k] / per_mode[base][k], 3)
                for k in per_mode[base] if per_mode[m].get(k)}
            for m in modes[1:]
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
