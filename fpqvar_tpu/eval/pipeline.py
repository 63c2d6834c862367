"""50k-image class-conditional generation driver.

Replaces the reference's eager eval loop
(`evaluate_fp_quant_transform_rotate.py:187-207`): 1000 classes x
num_img_per_class images, PNGs on disk as the resume checkpoint (a class
whose files all exist is skipped — same restart granularity as the
reference, SURVEY.md §5 failure detection).  Classes can be partitioned
across hosts (the workload is embarrassingly parallel — this is the dp axis
of the distributed design the single-GPU reference lacks).
"""
from __future__ import annotations

import os
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from fpqvar_tpu.eval.imaging import save_images_png


def class_range_for_host(num_classes: int, host_id: int,
                         num_hosts: int) -> range:
    per = -(-num_classes // num_hosts)
    return range(host_id * per, min((host_id + 1) * per, num_classes))


def generate_eval_set(
    generator,                  # VARGenerator
    params,
    vae_params,
    out_dir: str,
    num_img_per_class: int = 50,
    classes: Optional[Sequence[int]] = None,
    seed: int = 0,
    batch: Optional[int] = None,
    log_every: int = 50,
    mesh=None,
) -> None:
    """Reference protocol: per class, batch = num_img_per_class images with
    g_seed=0, cfg/top-k/top-p from the generator's GenerateConfig
    (`evaluate...py:187-199`).  With ``mesh``, labels are dp-sharded and
    generation runs under the mesh context (params must already be sharded —
    see fpqvar_tpu.parallel.shard_params)."""
    import contextlib

    cfg = generator.cfg
    classes = classes if classes is not None else range(cfg.num_classes)
    batch = batch or num_img_per_class
    if mesh is not None:
        dp = mesh.shape["dp"]
        batch = max(dp, batch - batch % dp)   # dp-divisible batches
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    done = 0
    # depth-2 pipeline (same trick as serving.GenerationServer): the next
    # batch is dispatched before the previous batch's device->host fetch +
    # PNG encode, so the flat per-dispatch host round-trip (~40 ms through
    # the TPU relay) and the encode overlap device compute.  Resume safety
    # is unchanged: the complete-PNG-set check tolerates one batch landing
    # on disk after a later dispatch was issued.
    pending = None          # (device imgs, class, start_idx, rows to keep)

    def _flush(p):
        imgs, ci, start, keep = p
        save_images_png(imgs[:keep], out_dir, ci, start_idx=start)

    for ci in classes:
        if all(os.path.exists(os.path.join(out_dir, f"class{ci}_img{i}.png"))
               for i in range(num_img_per_class)):
            continue  # resume: the class's COMPLETE PNG set is the
            #             checkpoint (a partial crash re-runs the class)
        produced = 0
        while produced < num_img_per_class:
            # always generate at the full compiled batch shape and slice the
            # tail (a fresh tail shape would re-trace the whole multi-scale
            # generator — minutes over the remote-TPU relay); the extra rows
            # of the final batch are discarded by the keep slice
            b = batch
            label = jnp.full((b,), ci, jnp.int32)
            key = jax.random.PRNGKey(seed)
            key = jax.random.fold_in(key, ci * 1000 + produced)
            ctx = mesh if mesh is not None else contextlib.nullcontext()
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                label = jax.device_put(label, NamedSharding(mesh, P("dp")))
            with ctx:
                imgs = generator.generate(params, vae_params, label, key)
            if pending is not None:
                _flush(pending)
            pending = (imgs, ci, produced,
                       min(b, num_img_per_class - produced))
            produced += pending[3]
        done += 1
        if done % log_every == 0:
            rate = done / (time.time() - t0)
            print(f"[eval] {done} classes done ({rate:.2f} classes/s)",
                  flush=True)
    if pending is not None:
        _flush(pending)
