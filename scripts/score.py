#!/usr/bin/env python
"""Metric scoring CLI (reference `openai_evaluator.py:26-59` main).

Consumes feature npz files (ref and sample) with keys:
  features [N, D], optional spatial [N, D2], optional probs [N, classes]
and prints IS / FID / sFID / Precision / Recall.  Feature extraction itself
stays an external tool (the reference pins a TF1 Inception graph; any
Inception implementation producing the same npz schema works).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load(path):
    import numpy as np

    d = np.load(path)
    return (d["features"],
            d["spatial"] if "spatial" in d else None,
            d["probs"] if "probs" in d else None)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ref_npz")
    p.add_argument("sample_npz")
    p.add_argument("--json-out", type=str, default=None)
    args = p.parse_args()

    from fpqvar_tpu.eval.metrics import evaluate_all

    ref_f, ref_s, _ = load(args.ref_npz)
    sam_f, sam_s, sam_p = load(args.sample_npz)
    out = evaluate_all(ref_f, sam_f, ref_s, sam_s, sam_p)
    for k, v in out.items():
        print(f"{k}: {v:.4f}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
