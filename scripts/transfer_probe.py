#!/usr/bin/env python
"""Diagnose the bench device_put pathology (VERDICT r3 weak #2).

BENCH_r03: w4a16's 2.51 GB tree uploaded in 2.9s, but bf16's 3.74 GB took
189.6s and int8chs's 2.51 GB took 209.2s — a ~65x per-byte gap that evicted
the batch-8 suite from the driver window.  This probe times device_put for
the candidate factors in isolation on the real chip:

  1. dtype: f32 vs bf16 (ml_dtypes numpy) vs int8, same byte count
  2. provenance: fresh np array vs npz round-trip (+ uint16->bf16 view)
  3. leaf count: 1 big array vs many small leaves
  4. ordering: repeat puts after free() with a compiled program resident

Run: python scripts/transfer_probe.py [--size-mb 256]
"""
import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size-mb", type=int, default=256)
    args = ap.parse_args()

    import jax
    import ml_dtypes

    dev = jax.devices()[0]
    nbytes = args.size_mb * 2**20

    def put(tag, arr_or_tree):
        t0 = time.perf_counter()
        out = jax.device_put(arr_or_tree, dev)
        for leaf in jax.tree_util.tree_leaves(out):
            leaf.block_until_ready()
        dt = time.perf_counter() - t0
        total = sum(x.size * x.dtype.itemsize
                    for x in jax.tree_util.tree_leaves(arr_or_tree))
        print(f"{tag:44s} {total/2**20:8.1f} MB  {dt:7.2f}s  "
              f"{total/2**20/dt:8.1f} MB/s", flush=True)
        return out

    def free(tree):
        for leaf in jax.tree_util.tree_leaves(tree):
            leaf.delete()

    rng = np.random.default_rng(0)

    # 1. dtype
    f32 = rng.standard_normal(nbytes // 4, dtype=np.float32)
    bf16 = f32.astype(ml_dtypes.bfloat16)
    bf16_2x = np.concatenate([bf16, bf16])  # same BYTES as f32
    i8 = rng.integers(-127, 127, nbytes, dtype=np.int8)
    for tag, a in [("fresh f32", f32), ("fresh bf16 (ml_dtypes)", bf16_2x),
                   ("fresh int8", i8)]:
        free(put(tag, a))

    # 2. npz round-trip provenance (the bench disk cache path)
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "x.npz")
        np.savez(p, bf16=bf16_2x.view(np.uint16), i8=i8)
        loaded = dict(np.load(p))
        lb = loaded["bf16"].view(ml_dtypes.bfloat16)
        li = loaded["i8"]
        print(f"# npz bf16 view: contiguous={lb.flags['C_CONTIGUOUS']} "
              f"aligned={lb.flags['ALIGNED']} writeable={lb.flags['WRITEABLE']}",
              flush=True)
        free(put("npz-loaded bf16 (uint16 view)", lb))
        free(put("npz-loaded int8", li))
        free(put("npz bf16 + np.ascontiguousarray copy",
                 np.ascontiguousarray(lb)))

    # 3. leaf count: same bytes split into 64 leaves
    tree = {f"leaf{k}": bf16_2x[k * (len(bf16_2x) // 64):
                                (k + 1) * (len(bf16_2x) // 64)]
            for k in range(64)}
    free(put("64-leaf bf16 tree (views into one buf)", tree))
    tree_c = {k: v.copy() for k, v in tree.items()}
    free(put("64-leaf bf16 tree (owned copies)", tree_c))

    # 4. ordering: put -> compile+run a program -> free -> put again
    import jax.numpy as jnp
    x = put("pre-program bf16", bf16_2x)

    @jax.jit
    def f(a):
        return (a.astype(jnp.float32) ** 2).sum()

    _ = f(x).block_until_ready()
    free(x)
    free(put("post-program bf16 (same bytes)", bf16_2x))
    # salt so the relay cannot memoize the upload by content
    bf16_salt = bf16_2x.copy()
    bf16_salt[:16] = ml_dtypes.bfloat16(0.5)
    free(put("post-program bf16 (salted bytes)", bf16_salt))


if __name__ == "__main__":
    main()
