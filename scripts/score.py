#!/usr/bin/env python
"""Metric scoring CLI (reference `openai_evaluator.py:26-59` main).

Computes IS / FID / sFID / Precision / Recall end-to-end in-framework: the
JAX InceptionV3 port (fpqvar_tpu.eval.inception) extracts pool3 / spatial /
softmax features, so no external TF step is needed.  Inputs may be:

- a PNG folder (as produced by scripts/evaluate.py),
- an image npz (``arr_0`` uint8 [N, H, W, 3] — the reference's pack_figs
  schema), or
- a pre-extracted feature npz (keys: features [N, D], optional spatial,
  optional probs) — the reference's two-process design still works.

Weights: pass --inception <pt_inception-2015-12-05 .pth> (pytorch-fid /
torchvision state dict; converted on the fly).  --inception random uses a
random-weight network — metric VALUES are then meaningless but the full
pipeline is exercised (smoke mode).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _load_images(path):
    import numpy as np

    if os.path.isdir(path):
        from PIL import Image

        files = sorted(
            f for f in os.listdir(path) if f.endswith((".png", ".jpg")))
        imgs = np.stack([np.asarray(Image.open(os.path.join(path, f))
                                    .convert("RGB")) for f in files])
        return imgs                       # [N, H, W, 3] uint8
    d = np.load(path)
    if "arr_0" in d:
        return d["arr_0"]
    return None


def _load_or_extract(path, params, batch):
    """Returns (features, spatial, probs) for a folder / image-npz /
    feature-npz input."""
    import numpy as np

    if not os.path.isdir(path):
        d = np.load(path)
        if "features" in d:
            return (d["features"],
                    d["spatial"] if "spatial" in d else None,
                    d["probs"] if "probs" in d else None)
    imgs = _load_images(path)
    if imgs is None:
        raise SystemExit(f"{path}: not a folder, image npz, or feature npz")
    if params is None:
        raise SystemExit(
            f"{path} holds images - pass --inception WEIGHTS (or 'random') "
            f"to extract features in-framework")
    from fpqvar_tpu.eval.inception import extract_features_batched

    imgs = imgs.transpose(0, 3, 1, 2)     # NHWC uint8 -> NCHW
    return extract_features_batched(params, imgs, batch=batch)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ref", help="reference: folder / image npz / feature npz")
    p.add_argument("sample", help="sample: folder / image npz / feature npz")
    p.add_argument("--inception", type=str, default=None,
                   help=".pth state dict (pt_inception-2015-12-05 or "
                        "torchvision inception_v3), or 'random' for a "
                        "pipeline smoke run")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--save-features", type=str, default=None,
                   help="write the sample features to this npz")
    p.add_argument("--json-out", type=str, default=None)
    args = p.parse_args()

    import numpy as np

    params = None
    if args.inception == "random":
        import jax

        from fpqvar_tpu.utils.jit_cache import enable as _jc
        _jc()  # persistent XLA compile cache (.jax_cache)

        from fpqvar_tpu.eval.inception import init_inception_params

        print("[warn] random Inception weights - smoke mode, metric values "
              "are meaningless", file=sys.stderr)
        params = init_inception_params(jax.random.PRNGKey(0))
    elif args.inception:
        import torch

        from fpqvar_tpu.eval.inception import convert_inception_state_dict

        sd = torch.load(args.inception, map_location="cpu",
                        weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
        params = convert_inception_state_dict(sd)

    from fpqvar_tpu.eval.metrics import evaluate_all

    ref_f, ref_s, _ = _load_or_extract(args.ref, params, args.batch)
    sam_f, sam_s, sam_p = _load_or_extract(args.sample, params, args.batch)
    if args.save_features:
        np.savez(args.save_features, features=sam_f,
                 **({"spatial": sam_s} if sam_s is not None else {}),
                 **({"probs": sam_p} if sam_p is not None else {}))
    out = evaluate_all(ref_f, sam_f, ref_s, sam_s, sam_p)
    for k, v in out.items():
        print(f"{k}: {v:.4f}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
