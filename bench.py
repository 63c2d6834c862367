#!/usr/bin/env python
"""Throughput/latency benchmark: images/sec/chip, VAR-d30 FP4 256x256.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}

The reference publishes no throughput numbers at all (BASELINE.md), so our
bf16 path is the baseline.  The plain `python bench.py` run measures TWO
regimes (all rates are per-round medians; bf16 re-measured as a closing
bracket):

- batch 8 throughput across every execution mode — compute-bound, where
  the roofline (ROUND_NOTES_r02.md) shows quantization can at best match
  bf16 (weight HBM is 4% of the step);
- batch 1 serving throughput (bf16 vs the weights-only w4a16 mode) —
  weight-memory-bound, where int8 weight codes halve the traffic that
  sets the step time.  Measured PIPELINED (queue depth 10, one sync per
  window): per-call sync charges every call a ~40 ms host<->relay RTT
  that a real serving deployment (and a real TPU host) does not pay.
  This deployment ratio is the headline value/vs_baseline; per-call-sync
  latency is reported alongside in the metric string.

Smaller presets: `python bench.py --preset tiny|d16` for smoke runs;
`--preset d36` for the 512x512 model; `--modes`/`--batch` for manual
single-regime runs (those report the best quant mode at that batch).

BUDGET: the default invocation is sized for the driver's timed window
(round 2's default — 7 modes x 12 rounds + a 40-round batch-1 suite —
timed out at 4/7 modes and produced NO official number, BENCH_r02.json
rc=124).  The default now measures the four modes that carry the story
(bf16 bracket, int8chs = the throughput recipe mode, w4a16 = the
deployment mode) at 8 rounds plus a short batch-1 pipelined suite, and a
wall-clock
guard (--budget, default 1500s) skips remaining work and emits the JSON
line with whatever completed.  `--full` restores the 8-mode research
suite with no budget cap.
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
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from fpqvar_tpu.utils.jit_cache import enable as _enable_cache  # noqa: E402

_enable_cache()


def build(preset: str):
    from fpqvar_tpu.config import VARConfig

    if preset == "tiny":
        from fpqvar_tpu.config import var_tiny

        cfg = var_tiny()
        batch = 2
    elif preset == "d16":
        cfg = VARConfig(depth=16)
        batch = 8
    elif preset == "d36":
        # 512x512 model: L=2240, C=2304, shared AdaLN
        # (`evaluate_fp_quant_transform_rotate_512x512.py:54-70`); batch 2
        # keeps the dense-KV variant inside 16GB HBM for the comparison
        from fpqvar_tpu.config import var_d36_512

        cfg = var_d36_512()
        batch = 2
    else:
        cfg = VARConfig(depth=30)
        batch = 8
    return cfg, batch


#: per-process key salt: the relay MEMOIZES identical (program, inputs)
#: executions ACROSS processes — a rerun with the deterministic bench keys
#: returns instantly with the previous run's images (observed: "4438
#: img/s" on a warm repeat).  Salting the generation keys per process
#: guarantees every timed call is fresh work; within-run comparability is
#: unaffected (every mode shares the salt).
_RUN_SALT = int.from_bytes(os.urandom(4), "little") & 0x7FFFFFFF


def time_generate(gen, params, vae_params, label, key, rounds=3):
    key = jax.random.fold_in(key, _RUN_SALT)
    # warmup + compile
    imgs = gen.generate(params, vae_params, label, key)
    np.asarray(imgs[0, 0, 0, 0])        # force through the relay
    # per-round MEDIAN, not mean: the remote-TPU relay injects multi-second
    # stalls into otherwise-steady sub-second calls (observed: the same
    # cached bf16 program measuring 3.4 vs 12.0 img/s minutes apart when
    # one stall lands inside a ~4 s mean window).  The median of the round
    # latencies is the steady-state rate and is what the hardware actually
    # sustains.  Each round FETCHES a pixel: block_until_ready through the
    # relay can return before execution.
    dts = []
    for i in range(rounds):
        t0 = time.perf_counter()
        imgs = gen.generate(params, vae_params, label,
                            jax.random.fold_in(key, i))
        np.asarray(imgs[0, 0, 0, 0])
        dts.append(time.perf_counter() - t0)
    dt = float(np.median(dts))
    assert not bool(jnp.isnan(imgs).any()), "NaN in generated images"
    return label.shape[0] / dt




def time_generate_pipelined(gen, params, vae_params, label, key,
                            depth=10, windows=8):
    """Steady-state throughput: issue ``depth`` generation calls back-to-back
    and sync once per window.  Per-call sync charges every call a ~30-40 ms
    host<->relay round-trip (measured: the same cached bf16 d30 batch-1
    program runs 129 ms/call synced vs 99 ms/call at queue depth 20 —
    scripts/latency_breakdown.py found a flat ~40 ms per synchronized
    dispatch regardless of program size).  Pipelining overlaps the RTT with
    device execution, which is how a serving deployment actually drives the
    chip; the median over ``windows`` windows rejects relay stalls."""
    key = jax.random.fold_in(key, _RUN_SALT)
    imgs = gen.generate(params, vae_params, label, key)  # warmup + compile
    np.asarray(imgs[0, 0, 0, 0])        # force through the relay
    rates = []
    for w in range(windows):
        t0 = time.perf_counter()
        outs = [
            gen.generate(params, vae_params, label,
                         jax.random.fold_in(key, 1000 + w * depth + i))
            for i in range(depth)
        ]
        for o in outs:
            o.block_until_ready()
        np.asarray(outs[-1][0, 0, 0, 0])  # force through the relay
        dt = time.perf_counter() - t0
        rates.append(label.shape[0] * depth / dt)
    assert not bool(jnp.isnan(outs[-1]).any()), "NaN in generated images"
    return float(np.median(rates))


def peak_hbm_gb():
    """Measured peak HBM, or None when the runtime exposes no memory stats
    (the axon relay's memory_stats() is empty — never report a fake 0.0)."""
    try:
        stats = jax.devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use")
        return None if peak is None else round(peak / 2**30, 3)
    except Exception:
        return None


def static_hbm_gb(params, cfg, qcfg, batch):
    """Static HBM accounting (weights + KV cache), model-derived: the axon
    relay's memory_stats() is empty, so the capacity story (packed 4x / int8
    2x weights, packed int8 KV ~3.5x cache) is reported from the actual
    array sizes instead of a runtime peak."""
    from fpqvar_tpu.models.var import init_kv_cache
    from fpqvar_tpu.quantize.runtime import build_runtime

    wbytes = sum(
        a.size * a.dtype.itemsize
        for a in jax.tree_util.tree_leaves(params) if hasattr(a, "dtype"))
    qrt = build_runtime(qcfg, cfg.depth, cfg.width)
    cache = jax.eval_shape(
        lambda: init_kv_cache(cfg, 2 * batch, kv_codec=qrt.kv_codec))
    cbytes = sum(
        a.size * jnp.dtype(a.dtype).itemsize
        for a in jax.tree_util.tree_leaves(cache))
    return round(wbytes / 2**30, 3), round(cbytes / 2**30, 3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="d30",
                    choices=["tiny", "d16", "d30", "d36"])
    # per-round medians reject relay stalls, so 8 rounds of steady signal
    # suffice for the default; --full bumps to 12
    ap.add_argument("--rounds", type=int, default=None)
    ap.add_argument("--batch", type=int, default=None,
                    help="override preset batch size")
    ap.add_argument("--warm-cache", action="store_true",
                    help="build + disk-cache the host param trees for the "
                         "selected modes, then exit (no device work); run "
                         "under JAX_PLATFORMS=cpu to leave the TPU free. "
                         "Only useful with --host-params")
    ap.add_argument("--host-params", action="store_true",
                    help="legacy path: build param trees on the host "
                         "(disk-cached) and device_put them. Default is the "
                         "on-device build (jitted init + traced transform): "
                         "the remote-TPU relay uploads at 60-100 MB/s, so "
                         "host trees cost 185-210s per mode (BENCH_r03) "
                         "while the device build is milliseconds after a "
                         "cached compile")
    ap.add_argument("--b1-only", action="store_true",
                    help="skip the batch-8 suite; run only the batch-1 "
                         "pipelined deployment measurement")
    ap.add_argument("--b1-modes", type=str, default=None,
                    help="override the batch-1 pipelined suite's mode list "
                         "(comma list; bf16 bracket legs added around each "
                         "quant leg automatically)")
    ap.add_argument("--full", action="store_true",
                    help="research suite: all modes, 12 rounds, 40-round "
                         "batch-1 legs, no wall-clock budget")
    ap.add_argument("--budget", type=float, default=None,
                    help="wall-clock budget in seconds (default 1500, or "
                         "$FPQVAR_BENCH_BUDGET; --full disables). When "
                         "exceeded, remaining modes are skipped and the "
                         "JSON line reports whatever completed")
    ap.add_argument("--modes", type=str, default=None,
                    help="comma list from bf16,fake,int8,int8ch,int8chs,"
                         "packed,w4a16,w4a16p,int8kv,int8att (w4a16 = "
                         "weights-only int8 codes + bf16 acts; w4a16p = "
                         "weights-only nibble-packed codes; int8kv = int8ch "
                         "GEMMs + packed int8 KV cache; int8att = int8kv + "
                         "int8 attention contractions)")
    args = ap.parse_args()
    if args.warm_cache and not args.host_params:
        # the warm cache only feeds the legacy host-build path
        args.host_params = True
    if args.b1_only and (args.modes or args.batch):
        ap.error("--b1-only runs a fixed batch-1 mode list (bf16, w4a16, "
                 "int8chs, bf16 bracket); it cannot be combined with "
                 "--modes/--batch")
    if args.rounds is None:
        args.rounds = 12 if args.full else 8
    t_start = time.perf_counter()
    if args.full:
        budget = float("inf")
    else:
        budget = args.budget if args.budget is not None else float(
            os.environ.get("FPQVAR_BENCH_BUDGET", "1500"))

    def over_budget(reserve=0.0):
        return time.perf_counter() - t_start > budget - reserve

    from fpqvar_tpu.config import GenerateConfig
    from fpqvar_tpu.models import VARGenerator
    from fpqvar_tpu.models.var import init_var_params
    from fpqvar_tpu.models.vqvae import init_vqvae_params
    from fpqvar_tpu.quantize import quantize_var_params

    cfg, batch = build(args.preset)
    if args.batch:
        batch = args.batch
    key = jax.random.PRNGKey(0)

    # Host-side param trees (random init + each mode's offline quantize
    # transform) are DISK-CACHED under .bench_cache/: at d30 the init is
    # ~60s and an int8chs fold+rotate+snap transform ~130s of host CPU —
    # repeated across modes that alone overran the driver's bench window
    # (the round-2 rc=124).  Keyed by preset + the QuantConfig repr, so a
    # recipe change invalidates cleanly; loads are seconds of disk IO.
    import hashlib

    from fpqvar_tpu.utils import checkpoint as CKPT

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".bench_cache")
    os.makedirs(cache_dir, exist_ok=True)

    def disk_cached(tag, build_fn):
        path = os.path.join(cache_dir, f"{args.preset}-{tag}.npz")
        if os.path.exists(path):
            return CKPT.load_params(path)
        tree = build_fn()
        CKPT.save_params(path, tree)
        return tree

    dev = jax.devices()[0]
    if args.host_params:
        # legacy: init on host CPU, then upload.  60-100 MB/s through the
        # relay — kept for A/B debugging of the device build.
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            var_host = disk_cached("base", lambda: jax.tree_util.tree_map(
                np.asarray, init_var_params(key, cfg, dtype=jnp.bfloat16)))
            vae_p = init_vqvae_params(jax.random.PRNGKey(1), cfg.vae)
            vae_p = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, vae_p)
        vae_p = jax.device_put(vae_p, dev)
    else:
        var_host = None

        @jax.jit
        def _vae_init(k):
            p = init_vqvae_params(k, cfg.vae)
            return jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, p)

        vae_p = _vae_init(jax.random.PRNGKey(1))
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

    # transform=True with unit vectors: random-init weights but the ONLINE
    # GALT multiply cost is included — the benched program is the full
    # flagship recipe, not a lighter variant
    galt = (np.ones((cfg.depth, cfg.width), np.float32),
            np.ones((cfg.depth, cfg.width), np.float32))
    # ONE shared registry (config.bench_recipes) defines every mode so the
    # throughput suite, latency breakdown, serving bench and block bisect
    # can never measure different configs under the same name.  Per-mode
    # rationale + measured ratios: config.bench_recipes docstring and
    # ROUND_NOTES_r04.md.
    from fpqvar_tpu.config import bench_recipes

    mode_cfgs = bench_recipes()
    if args.modes:
        modes = args.modes.split(",")
    elif args.preset == "d36":
        # int8chs = the d36 speed mode; int8kv = the capacity mode.
        # int8att was demoted from the default suite after measuring
        # below int8kv at both presets (d30 b8 1.00x, d36 b2 0.96x of
        # int8kv — ROUND_NOTES_r05.md); still available via --modes.
        modes = ["bf16", "int8chs", "int8kv", "w4a16"]
    elif args.full:
        modes = ["bf16", "fake", "int8", "int8ch", "int8chs", "packed",
                 "w4a16"]
    else:
        # driver-window default BATCH-8 suite (runs AFTER the batch-1
        # headline suite, budget permitting): bf16 bracket + int8chs (the
        # single-grid act-quant recipe — the batch-8 throughput mode,
        # 1.076-1.086x) + int8kv (dual-grid fc2 + packed int8 KV — the
        # CAPACITY mode, 0.93-0.94x at b8 but runs b32 where dense bf16
        # OOMs; ROUND_NOTES_r05.md).  w4a16 lives in the batch-1 suite
        # where it leads.  `--full` for the research suite.
        modes = ["bf16", "int8chs", "int8kv"]

    # The remote-TPU relay's throughput drifts up to 3-4x over minutes, and
    # at d30 batch 8 only ONE param set + program workspace fits in 16GB
    # HBM, so modes can't be co-resident and round-interleaved.  Instead
    # the sequence is BRACKETED: bf16 is re-measured at the end, the
    # quantized ratios are taken against the bf16 mean, and the measured
    # drift is reported in the metric string.
    if "bf16" in modes and len(modes) > 1:
        modes = modes + ["bf16/2"]

    qp_host_cache = {}

    def host_params(mode_name):
        """Host-side (numpy) transformed param tree for a mode, cached so
        the multi-GB offline quantize runs once per mode across suites."""
        if mode_name == "bf16":
            return var_host
        if mode_name not in qp_host_cache:
            qcfg_m = mode_cfgs[mode_name]

            def build_qp():
                qp = quantize_var_params(var_host, cfg, qcfg_m, galt=galt)
                if qcfg_m.backend == "fake":
                    qp = jax.tree_util.tree_map(
                        lambda a: a.astype(jnp.bfloat16)
                        if hasattr(a, "dtype") and a.dtype == jnp.float32
                        else a, qp)
                return jax.tree_util.tree_map(np.asarray, qp)

            tag = (mode_name + "-" + hashlib.sha1(
                repr(qcfg_m).encode()).hexdigest()[:10])
            qp_host_cache[mode_name] = disk_cached(tag, build_qp)
        return qp_host_cache[mode_name]

    def device_params(mode_name):
        """Synthesize the mode's param tree directly in device HBM: one
        jitted program fusing random init + the traced offline transform
        (quantize.recipe.synth_device_params).  Zero multi-GB uploads;
        compile is persistently cached (.jax_cache), so driver reruns pay
        milliseconds where BENCH_r03 paid 185-210s of device_put per mode."""
        from fpqvar_tpu.quantize.recipe import synth_device_params

        return synth_device_params(cfg, mode_cfgs[mode_name], key, galt=galt)

    # --- silent-mode-collapse guard (VERDICT r4 #3): every leg's rate is
    # compared against the trailing median of its own history (persisted
    # in .bench_cache/history.json, keyed by preset/mode/batch/regime).  A
    # leg deviating >20% from its trailing median is re-measured once
    # (budget permitting); if it still deviates it is published FLAGGED as
    # SUSPECT in the metric detail — a poisoned leg can no longer ship as
    # a silent 0.27x (the BENCH_r04 int8kv failure mode).  History is only
    # appended for non-suspect legs so one bad window can't drag the
    # median.
    hist_path = os.path.join(cache_dir, "history.json")
    try:
        with open(hist_path) as fh:
            leg_history = json.load(fh)
    except Exception:
        leg_history = {}
    suspects = {}

    def check_leg(leg_key, value, remeasure):
        hist = leg_history.get(leg_key, [])[-5:]
        trailing = float(np.median(hist)) if hist else None
        deviant = (trailing is not None
                   and not 0.8 <= value / trailing <= 1.2)
        if deviant and not over_budget(reserve=30):
            print(f"# {leg_key}: {value:.3f} deviates >20% from trailing "
                  f"median {trailing:.3f}; re-measuring once",
                  file=sys.stderr, flush=True)
            value = remeasure()
            deviant = not 0.8 <= value / trailing <= 1.2
        if deviant:
            suspects[leg_key] = trailing
            print(f"# {leg_key}: SUSPECT {value:.3f} vs trailing median "
                  f"{trailing:.3f}", file=sys.stderr, flush=True)
        else:
            leg_history.setdefault(leg_key, []).append(round(value, 4))
            leg_history[leg_key] = leg_history[leg_key][-12:]
            with open(hist_path, "w") as fh:
                json.dump(leg_history, fh)
        return value, deviant

    def run_suite(suite_modes, suite_batch, rounds, tag, pipelined=False):
        """``pipelined=True`` reports steady-state pipelined throughput
        (the serving number; hides the per-dispatch relay RTT) and prints
        the per-call-sync latency alongside.  Modes past the wall-clock
        budget are skipped (closing bf16 bracket excepted: it is cheap —
        no transform, program already compiled — and the drift ratio
        needs it)."""
        lab = jnp.arange(suite_batch, dtype=jnp.int32) % cfg.num_classes
        results, latency = {}, {}
        for mode in suite_modes:
            base_name = mode.split("/")[0]
            if base_name != "bf16" and over_budget(reserve=30):
                print(f"# {tag}{mode}: SKIPPED (wall-clock budget "
                      f"{budget:.0f}s exceeded)", file=sys.stderr, flush=True)
                continue
            qcfg_m = mode_cfgs[base_name]
            t_a = time.perf_counter()
            if args.host_params:
                hp = host_params(base_name)
                t_b = time.perf_counter()
                params = jax.device_put(hp, dev)
            else:
                t_b = time.perf_counter()
                params = device_params(base_name)
            for leaf in jax.tree_util.tree_leaves(params):
                if hasattr(leaf, "block_until_ready"):
                    leaf.block_until_ready()
            t_c = time.perf_counter()
            print(f"# {tag}{mode}: host params {t_b - t_a:.1f}s, "
                  f"{'device_put' if args.host_params else 'device build'} "
                  f"{t_c - t_b:.1f}s", file=sys.stderr, flush=True)
            gen = VARGenerator(cfg, qcfg_m, gen_cfg)
            leg_key = (f"{args.preset}:{base_name}:b{suite_batch}:"
                       f"{'pipe' if pipelined else 'sync'}")
            extra = ""
            if pipelined:
                meas = lambda: time_generate_pipelined(  # noqa: E731
                    gen, params, vae_p, lab, key)
                results[mode], _ = check_leg(leg_key, meas(), meas)
                latency[mode] = time_generate(gen, params, vae_p, lab, key,
                                              rounds)
                extra = (f" pipelined; per-call-sync {latency[mode]:.3f}"
                         f" images/sec")
            else:
                meas = lambda: time_generate(  # noqa: E731
                    gen, params, vae_p, lab, key, rounds)
                results[mode], _ = check_leg(leg_key, meas(), meas)
            wgb, cgb = static_hbm_gb(params, cfg, qcfg_m, suite_batch)
            peak = peak_hbm_gb()
            peak_s = "n/a (relay)" if peak is None else f"{peak} GB"
            print(f"# {tag}{mode}: {results[mode]:.3f} images/sec{extra} "
                  f"(peak HBM {peak_s}; static: weights {wgb} GB, "
                  f"KV cache {cgb} GB)", file=sys.stderr, flush=True)
            free(params)
        return (results, latency) if pipelined else results

    def bf16_stats(results):
        samples = [v for k, v in results.items()
                   if k.split("/")[0] == "bf16"]
        mean = sum(samples) / len(samples) if samples else None
        drift = (round(max(samples) / min(samples), 3)
                 if len(samples) > 1 else None)
        return mean, drift

    if args.warm_cache:
        # build (and disk-persist) every selected mode's host param tree
        # without touching the accelerator — run this once after a recipe
        # change so the timed driver window only pays loads + device_puts
        for mode in dict.fromkeys(modes + ["w4a16"]):  # b1 suite needs w4a16
            name = mode.split("/")[0]
            if name != "bf16":
                host_params(name)
                print(f"# warmed {name}", file=sys.stderr, flush=True)
        return

    # Suite ordering: every NEW (mode, batch) program costs ~3-9 min of
    # warm-cache load/compile through the relay — the binding constraint
    # of the driver window (round 2's rc=124).  The plain d30 invocation
    # therefore runs the BATCH-1 PIPELINED suite FIRST (the headline: the
    # weight-memory-bound regime where quantization actually wins — w4a16
    # 1.10x and int8chs ~1.08x in round 2), then spends whatever budget
    # remains on the batch-8 throughput suite (compute-bound; quantized
    # modes can only approach bf16 there — roofline in ROUND_NOTES_r02.md).
    want_b1 = args.b1_only or (
        args.modes is None and args.batch is None and args.preset == "d30")
    if args.b1_modes and not want_b1:
        ap.error("--b1-modes was given but the batch-1 suite would not run "
                 "(it runs by default only for --preset d30, or with "
                 "--b1-only; --modes/--batch disable it) — add --b1-only")

    def run_b1():
        if over_budget(reserve=60):
            # nothing has run yet is no excuse: a fresh bf16 batch-1
            # program is itself a multi-minute compile, and with every
            # quant leg due to be skipped the whole suite would be wasted
            print(f"# b1 suite SKIPPED (wall-clock budget {budget:.0f}s "
                  f"exceeded before start)", file=sys.stderr, flush=True)
            return None, None
        rounds = max(args.rounds, 40) if args.full else args.rounds
        # Alternated brackets: a bf16 leg before, between and after the two
        # quant legs grounds the denominator in a 3-point mean and measures
        # drift across the WHOLE suite (round-3 driver drift was 1.018 with
        # a 2-point bracket).  w4a16 still precedes int8chs so a dying
        # window keeps the (quant, bf16) headline pair — bf16 legs are
        # never budget-skipped.
        if args.b1_modes:
            # custom list: alternate a bf16 bracket leg around each mode
            b1_modes = ["bf16"]
            for i, m in enumerate(args.b1_modes.split(",")):
                if m.split("/")[0] != "bf16":
                    b1_modes += [m, f"bf16/{i + 2}"]
        elif args.preset == "d36":
            # the 512x512 model's serving table (VERDICT r3 #5): the two
            # latency modes plus the HBM-capacity recipe, bracketed
            b1_modes = ["bf16", "w4a16", "bf16/2", "int8chs", "bf16/3",
                        "int8kv", "bf16/4"]
        else:
            b1_modes = ["bf16", "w4a16", "bf16/2", "int8chs", "bf16/3"]
        res, lat = run_suite(b1_modes, 1, rounds, "b1:", pipelined=True)
        if not any(k.split("/")[0] != "bf16" for k in res):
            return None, None   # budget ran out before any quant leg
        return res, lat

    b1 = b1_lat = None
    if want_b1 and not args.full:
        b1, b1_lat = run_b1()   # headline suite first in the driver window

    if args.b1_only:
        results, ips_bf16, drift = {}, None, None
    elif want_b1 and not args.full and over_budget(reserve=700):
        # not enough budget left for two fresh batch-8 programs
        print(f"# batch-{batch} suite SKIPPED (wall-clock budget "
              f"{budget:.0f}s exceeded)", file=sys.stderr, flush=True)
        results, ips_bf16, drift = {}, None, None
    else:
        results = run_suite(modes, batch, args.rounds, "")
        ips_bf16, drift = bf16_stats(results)
    if want_b1 and args.full:
        b1, b1_lat = run_b1()   # research suite keeps batch-8 first
    quant = {k: v for k, v in results.items()
             if k.split("/")[0] != "bf16"}
    if quant:
        best_name, ips_fp4 = max(quant.items(), key=lambda t: t[1])
    else:
        # bf16-only probe run (capacity_study uses these to bracket a
        # mode's max batch); report bf16 itself, ratio 1.
        best_name, ips_fp4 = "bf16", ips_bf16

    def fmt_results(res_dict, suite_batch, pipelined):
        parts = []
        for k, v in res_dict.items():
            lk = (f"{args.preset}:{k.split('/')[0]}:b{suite_batch}:"
                  f"{'pipe' if pipelined else 'sync'}")
            flag = (f" SUSPECT(trailing {suspects[lk]:.3f})"
                    if lk in suspects else "")
            parts.append(f"{k}={v:.3f}{flag}")
        return ", ".join(parts)

    detail = fmt_results(results, batch, False)
    res = "512x512" if args.preset == "d36" else "256x256"

    if b1 is not None:
        b1_bf16, b1_drift = bf16_stats(b1)
        detail += ("; batch-1 pipelined: "
                   + fmt_results(b1, 1, True)
                   + f", b1_bf16_drift={b1_drift}"
                   + "; batch-1 per-call-sync: "
                   + ", ".join(f"{k}={v:.3f}" for k, v in b1_lat.items()))
        b1_quant = {k: v for k, v in b1.items()
                    if k.split("/")[0] != "bf16"}
        b1_best, b1_val = max(b1_quant.items(), key=lambda t: t[1])
        headline_name = f"{b1_best} @ batch 1"
        value = b1_val
        vs = value / b1_bf16
        regime = (f"headline = batch-1 pipelined serving throughput "
                  f"(weight-memory-bound regime, where low-bit weights "
                  f"win; queue depth 10 overlaps the ~40ms per-dispatch "
                  f"relay RTT that per-call sync would charge)"
                  + (f"; batch-{batch} throughput best mode {best_name}="
                     f"{ips_fp4 / ips_bf16:.3f}x bf16 (compute-bound)"
                     if ips_bf16 else
                     f"; batch-{batch} suite skipped"))
    else:
        headline_name = best_name
        value = ips_fp4
        vs = (ips_fp4 / ips_bf16) if ips_bf16 else None
        regime = f"batch {batch}"
    if value is None:  # nothing measured (budget exhausted everywhere)
        headline_name, value, vs = "none (budget exhausted)", 0.0, None
    elapsed = round(time.perf_counter() - t_start, 1)
    print(json.dumps({
        "metric": f"images/sec/chip VAR-{args.preset} FP4 {res} "
                  f"(e2m1 + block-Hadamard; scales per-group-128 + fc2 "
                  f"dual-grid, except int8ch*/w4a16/int8kv=per-channel and "
                  f"int8chs=single-grid fc2, w4a16=weights-only; "
                  f"mode={headline_name}; {regime}; cfg-doubled; "
                  f"{detail}; bf16_drift={drift}; all rates are per-round "
                  f"medians, ratios vs the bracketing bf16 mean; "
                  f"wall {elapsed}s of budget {budget}s)",
        "value": round(value, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs, 4) if vs else None,
    }))


if __name__ == "__main__":
    main()
