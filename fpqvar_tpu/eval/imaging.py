"""Image IO: PNG writing and npz sample packing.

Equivalents of the reference's per-image PNG save
(`evaluate_fp_quant_transform_rotate.py:203-207`) and `pack_figs.py:8-24`
(`create_npz_from_sample_folder`).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


def to_uint8(images) -> np.ndarray:
    """[B, 3, H, W] floats in [0,1] -> [B, H, W, 3] uint8 (reference
    `evaluate...py:205`: permute(1,2,0).mul(255)); native C++ fast path."""
    from fpqvar_tpu.utils.native import images_to_uint8

    return images_to_uint8(np.asarray(images, dtype=np.float32))


def save_images_png(images, out_dir: str, class_id: int,
                    start_idx: int = 0) -> None:
    """Save a batch as class{c}_img{j}.png (reference naming).  Uses the
    native parallel PNG encoder (one thread per image) when available; PIL
    otherwise."""
    from fpqvar_tpu.utils import native

    os.makedirs(out_dir, exist_ok=True)
    arr = to_uint8(images)
    paths = [os.path.join(out_dir, f"class{class_id}_img{start_idx + j}.png")
             for j in range(arr.shape[0])]
    if native.write_png_batch(arr, paths):
        return
    from PIL import Image

    for img, p in zip(arr, paths):
        Image.fromarray(img).save(p)


def create_npz_from_sample_folder(
    sample_dir: str, expected: Optional[int] = 50_000
) -> str:
    """Pack a folder of PNGs into `<dir>.npz` with key arr_0 [N, H, W, 3]
    uint8 (`pack_figs.py:8-24`; the 50k assert at :14 becomes an optional
    check)."""
    from concurrent.futures import ThreadPoolExecutor

    from PIL import Image

    files = sorted(
        f for f in os.listdir(sample_dir) if f.lower().endswith(".png"))
    # PIL's PNG decode releases the GIL for the inflate work: threads give
    # ~2x on a small host and keep memory bounded (vs one array per process)
    with ThreadPoolExecutor(min(16, (os.cpu_count() or 4) * 2)) as ex:
        samples = list(ex.map(
            lambda f: np.asarray(Image.open(os.path.join(sample_dir, f))),
            files))
    arr = np.stack(samples)
    if expected is not None and arr.shape[0] != expected:
        raise ValueError(f"expected {expected} samples, found {arr.shape[0]}")
    out = sample_dir.rstrip("/") + ".npz"
    np.savez(out, arr_0=arr)
    return out
