#!/usr/bin/env python
"""Per-mode max-batch capacity study: the HBM -> throughput lever.

The reference never has a capacity story: it is a single-GPU fake-quant
codebase whose weights stay fp16 (`models_fp_quant/quant_utils.py:758-766`),
so quantization never buys it a larger batch.  On TPU the production win of
real low-bit storage is exactly that: int8 weight codes (2x) / packed fp4
(4x) and a packed int8 KV cache (~3.5x at d36-512's L=2240) free HBM that a
16GB chip can spend on batch rows, and images/sec/chip keeps rising with
batch until the MXU saturates.  A same-batch comparison (bench.py's
default) therefore understates quantized throughput whenever bf16 is the
mode that hits the HBM wall first.

This driver finds each mode's largest fitting batch by doubling + bisection
and reports images/sec/chip at that batch.  Every (mode, batch) probe runs
`bench.py` in a FRESH SUBPROCESS: a device OOM must not wedge this parent's
TPU client, and consecutive probes must not share HBM.  One TPU process
runs at a time.

Usage (real chip, nothing else using the TPU):
  python scripts/capacity_study.py --preset d36 --modes bf16,int8kv
Writes one JSON line per mode and a final summary JSON line to stdout.
"""
import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OOM_MARKERS = ("RESOURCE_EXHAUSTED", "Out of memory", "out of memory",
               "OOM", "Resource exhausted")


def probe(preset: str, mode: str, batch: int, rounds: int,
          timeout: int) -> dict:
    """One (mode, batch) measurement in a fresh process.

    Returns {"ok": True, "ips": float, "static": str} or {"ok": False,
    "oom": bool, "err": tail}.
    """
    cmd = [sys.executable, os.path.join(REPO, "bench.py"),
           "--preset", preset, "--modes", mode,
           "--batch", str(batch), "--rounds", str(rounds)]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout, cwd=REPO)
    except subprocess.TimeoutExpired:
        return {"ok": False, "oom": False, "err": "probe timeout"}
    if r.returncode == 0:
        line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
        res = json.loads(line)
        static = ""
        m = re.search(r"\(peak HBM.*?\)", r.stderr)
        if m:
            static = m.group(0)
        return {"ok": True, "ips": float(res["value"]), "static": static}
    tail = r.stderr.strip().splitlines()[-15:]
    oom = any(mk in r.stderr for mk in OOM_MARKERS)
    return {"ok": False, "oom": oom, "err": "\n".join(tail)}


def find_max_batch(preset: str, mode: str, start: int, cap: int,
                   rounds: int, timeout: int):
    """Doubling search up from `start`, then one bisection refinement
    between the last fit and the first OOM (batch sizes are cheap-ish to
    probe but each new shape is a fresh compile, so we keep the probe count
    small: the capacity headline cares about the plateau, not the exact
    boundary)."""
    results = {}          # batch -> ips
    batch, last_ok, first_bad = start, None, None
    while batch <= cap:
        print(f"# probe {mode} batch={batch} ...", file=sys.stderr,
              flush=True)
        r = probe(preset, mode, batch, rounds, timeout)
        if r["ok"]:
            results[batch] = r["ips"]
            print(f"#   fits: {r['ips']:.3f} img/s {r['static']}",
                  file=sys.stderr, flush=True)
            last_ok, batch = batch, batch * 2
        else:
            if not r["oom"]:
                raise RuntimeError(
                    f"{mode} batch={batch} failed (not OOM):\n{r['err']}")
            print("#   OOM", file=sys.stderr, flush=True)
            first_bad = batch
            break
    if last_ok is not None and first_bad is not None:
        mid = (last_ok + first_bad) // 2
        if mid not in results and mid != last_ok:
            print(f"# probe {mode} batch={mid} (bisect) ...",
                  file=sys.stderr, flush=True)
            r = probe(preset, mode, mid, rounds, timeout)
            if r["ok"]:
                results[mid] = r["ips"]
                print(f"#   fits: {r['ips']:.3f} img/s {r['static']}",
                      file=sys.stderr, flush=True)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="d36",
                    choices=["tiny", "d16", "d30", "d36"])
    ap.add_argument("--modes", default=None,
                    help="comma list (default: bf16,int8kv for d36; "
                         "bf16,int8chs,packed for d30)")
    ap.add_argument("--start", type=int, default=None,
                    help="first batch to probe (default: preset batch)")
    ap.add_argument("--cap", type=int, default=64,
                    help="largest batch to attempt")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--timeout", type=int, default=3600,
                    help="per-probe wall clock (covers cold compiles)")
    args = ap.parse_args()

    if args.modes:
        modes = args.modes.split(",")
    elif args.preset == "d36":
        modes = ["bf16", "int8kv"]
    else:
        modes = ["bf16", "int8chs", "packed"]
    start = args.start or {"tiny": 2, "d16": 8, "d30": 8,
                           "d36": 2}[args.preset]

    summary = {}
    for mode in modes:
        curve = find_max_batch(args.preset, mode, start, args.cap,
                               args.rounds, args.timeout)
        if not curve:
            raise RuntimeError(f"{mode}: starting batch {start} already OOMs")
        best_b = max(curve, key=lambda b: curve[b])
        summary[mode] = {"max_batch": max(curve), "best_batch": best_b,
                         "best_ips": round(curve[best_b], 3),
                         "curve": {str(b): round(v, 3)
                                   for b, v in sorted(curve.items())}}
        print(json.dumps({"mode": mode, **summary[mode]}), flush=True)

    if "bf16" in summary and len(summary) > 1:
        quant = {m: s for m, s in summary.items() if m != "bf16"}
        best_m = max(quant, key=lambda m: quant[m]["best_ips"])
        print(json.dumps({
            "metric": f"capacity study VAR-{args.preset}: best "
                      f"images/sec/chip at each mode's own max batch "
                      f"(bf16 b={summary['bf16']['best_batch']} vs "
                      f"{best_m} b={quant[best_m]['best_batch']})",
            "value": quant[best_m]["best_ips"],
            "unit": "images/sec/chip",
            "vs_baseline": round(
                quant[best_m]["best_ips"] / summary["bf16"]["best_ips"], 4),
        }), flush=True)


if __name__ == "__main__":
    main()
