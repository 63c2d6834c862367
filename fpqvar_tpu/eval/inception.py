"""InceptionV3 feature extractor (FID variant) in functional JAX.

Makes FID/sFID/IS/Precision/Recall computable end-to-end in-framework: the
reference shells out to a pinned TF1 graph (`openai_evaluator.py:20-24,
585-607`, pool_3 + mixed_6/conv taps + softmax).  This module implements the
same network — the "2015" Inception used by every FID implementation — as a
pure-JAX forward over a params pytree, plus a converter from the standard
PyTorch weights (`pt_inception-2015-12-05` of pytorch-fid, whose module
naming matches torchvision `inception_v3`).  The weights themselves are not
redistributable in this environment; point the converter at a downloaded
``.pth`` and everything runs on-device.

Architecture notes (the FID variant differs from stock torchvision):

- all in-block 3x3 avg-pools use count_include_pad=False;
- Mixed_7c's pool branch uses MAX pooling (TF graph quirk);
- the classifier has 1008 outputs (TF's padded softmax);
- feature taps: ``pool3`` [N, 2048] (FID/P/R), ``spatial`` = first 7
  channels of Mixed_6d's 1x1-branch output flattened (the TF graph's
  ``mixed_6/conv:0[..., :7]`` used for sFID), ``probs`` [N, 1008] (IS).

Input convention follows pytorch-fid: float images in [0, 1], NCHW,
bilinear-resized to 299x299 (no antialias), scaled to [-1, 1].
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

BN_EPS = 1e-3
NUM_CLASSES = 1008
SPATIAL_CHANNELS = 7


# ---------------------------------------------------------------------------
# Primitives (NCHW activations, OIHW conv weights — torch layouts)
# ---------------------------------------------------------------------------

def conv2d(x: Array, w: Array, stride=(1, 1), padding=(0, 0)) -> Array:
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    pad = [(padding[0], padding[0]), (padding[1], padding[1])]
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=stride, padding=pad,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def conv_bn(x: Array, p: Dict, stride=(1, 1), padding=(0, 0)) -> Array:
    """Conv -> eval-mode BatchNorm(eps=1e-3) -> ReLU (torchvision
    BasicConv2d)."""
    y = conv2d(x, p["conv"], stride, padding)
    bn = p["bn"]
    inv = jax.lax.rsqrt(bn["var"].astype(jnp.float32) + BN_EPS)
    scale = (bn["scale"].astype(jnp.float32) * inv)[None, :, None, None]
    shift = (bn["bias"].astype(jnp.float32)
             - bn["mean"].astype(jnp.float32) * bn["scale"].astype(jnp.float32)
             * inv)[None, :, None, None]
    y = y * scale.astype(y.dtype) + shift.astype(y.dtype)
    return jax.nn.relu(y)


def max_pool(x: Array, window=3, stride=2, padding=0) -> Array:
    pad = [(0, 0), (0, 0), (padding, padding), (padding, padding)]
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, window, window),
        (1, 1, stride, stride), pad)


def avg_pool_nocount(x: Array, window=3, stride=1, padding=1) -> Array:
    """3x3 avg pool, count_include_pad=False (the FID-variant pooling:
    border windows divide by the number of REAL elements)."""
    pad = [(0, 0), (0, 0), (padding, padding), (padding, padding)]
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, window, window),
        (1, 1, stride, stride), pad)
    ones = jnp.ones((1, 1) + x.shape[2:], x.dtype)
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 1, window, window),
        (1, 1, stride, stride), pad)
    return s / cnt


# ---------------------------------------------------------------------------
# Inception blocks (torchvision naming; FID-variant pooling)
# ---------------------------------------------------------------------------

def inception_a(x, p):
    b1 = conv_bn(x, p["branch1x1"])
    b5 = conv_bn(conv_bn(x, p["branch5x5_1"]), p["branch5x5_2"], padding=2)
    b3 = conv_bn(x, p["branch3x3dbl_1"])
    b3 = conv_bn(b3, p["branch3x3dbl_2"], padding=1)
    b3 = conv_bn(b3, p["branch3x3dbl_3"], padding=1)
    bp = conv_bn(avg_pool_nocount(x), p["branch_pool"])
    return jnp.concatenate([b1, b5, b3, bp], axis=1)


def inception_b(x, p):
    b3 = conv_bn(x, p["branch3x3"], stride=2)
    bd = conv_bn(x, p["branch3x3dbl_1"])
    bd = conv_bn(bd, p["branch3x3dbl_2"], padding=1)
    bd = conv_bn(bd, p["branch3x3dbl_3"], stride=2)
    bp = max_pool(x)
    return jnp.concatenate([b3, bd, bp], axis=1)


def inception_c(x, p, tap_branch1x1=False):
    b1 = conv_bn(x, p["branch1x1"])
    b7 = conv_bn(x, p["branch7x7_1"])
    b7 = conv_bn(b7, p["branch7x7_2"], padding=(0, 3))
    b7 = conv_bn(b7, p["branch7x7_3"], padding=(3, 0))
    bd = conv_bn(x, p["branch7x7dbl_1"])
    bd = conv_bn(bd, p["branch7x7dbl_2"], padding=(3, 0))
    bd = conv_bn(bd, p["branch7x7dbl_3"], padding=(0, 3))
    bd = conv_bn(bd, p["branch7x7dbl_4"], padding=(3, 0))
    bd = conv_bn(bd, p["branch7x7dbl_5"], padding=(0, 3))
    bp = conv_bn(avg_pool_nocount(x), p["branch_pool"])
    out = jnp.concatenate([b1, b7, bd, bp], axis=1)
    return (out, b1) if tap_branch1x1 else out


def inception_d(x, p):
    b3 = conv_bn(conv_bn(x, p["branch3x3_1"]), p["branch3x3_2"], stride=2)
    b7 = conv_bn(x, p["branch7x7x3_1"])
    b7 = conv_bn(b7, p["branch7x7x3_2"], padding=(0, 3))
    b7 = conv_bn(b7, p["branch7x7x3_3"], padding=(3, 0))
    b7 = conv_bn(b7, p["branch7x7x3_4"], stride=2)
    bp = max_pool(x)
    return jnp.concatenate([b3, b7, bp], axis=1)


def inception_e(x, p, pool: str):
    b1 = conv_bn(x, p["branch1x1"])
    b3 = conv_bn(x, p["branch3x3_1"])
    b3 = jnp.concatenate([
        conv_bn(b3, p["branch3x3_2a"], padding=(0, 1)),
        conv_bn(b3, p["branch3x3_2b"], padding=(1, 0)),
    ], axis=1)
    bd = conv_bn(x, p["branch3x3dbl_1"])
    bd = conv_bn(bd, p["branch3x3dbl_2"], padding=1)
    bd = jnp.concatenate([
        conv_bn(bd, p["branch3x3dbl_3a"], padding=(0, 1)),
        conv_bn(bd, p["branch3x3dbl_3b"], padding=(1, 0)),
    ], axis=1)
    if pool == "avg":
        bp = avg_pool_nocount(x)
    else:                       # Mixed_7c: MAX pool (FIDInceptionE_2 quirk)
        bp = max_pool(x, window=3, stride=1, padding=1)
    bp = conv_bn(bp, p["branch_pool"])
    return jnp.concatenate([b1, b3, bd, bp], axis=1)


# ---------------------------------------------------------------------------
# Full forward
# ---------------------------------------------------------------------------

def preprocess(images: Array, resize: bool = True) -> Array:
    """float images in [0, 1], NCHW -> [-1, 1] at 299x299 (bilinear,
    pytorch-fid convention)."""
    x = images.astype(jnp.float32)
    if resize and x.shape[-2:] != (299, 299):
        x = jax.image.resize(
            x, x.shape[:2] + (299, 299), method="bilinear")
    return x * 2.0 - 1.0


def inception_features(
    params: Dict, images: Array, resize: bool = True,
) -> Tuple[Array, Array, Array]:
    """images [N, 3, H, W] in [0, 1] -> (pool3 [N, 2048],
    spatial [N, 7*17*17], probs [N, 1008])."""
    x = preprocess(images, resize)
    x = conv_bn(x, params["Conv2d_1a_3x3"], stride=2)
    x = conv_bn(x, params["Conv2d_2a_3x3"])
    x = conv_bn(x, params["Conv2d_2b_3x3"], padding=1)
    x = max_pool(x)
    x = conv_bn(x, params["Conv2d_3b_1x1"])
    x = conv_bn(x, params["Conv2d_4a_3x3"])
    x = max_pool(x)
    x = inception_a(x, params["Mixed_5b"])
    x = inception_a(x, params["Mixed_5c"])
    x = inception_a(x, params["Mixed_5d"])
    x = inception_b(x, params["Mixed_6a"])
    x = inception_c(x, params["Mixed_6b"])
    x = inception_c(x, params["Mixed_6c"])
    x, tap = inception_c(x, params["Mixed_6d"], tap_branch1x1=True)
    spatial = tap[:, :SPATIAL_CHANNELS]            # mixed_6/conv[..., :7]
    x = inception_c(x, params["Mixed_6e"])
    x = inception_d(x, params["Mixed_7a"])
    x = inception_e(x, params["Mixed_7b"], pool="avg")
    x = inception_e(x, params["Mixed_7c"], pool="max")
    pool3 = jnp.mean(x, axis=(2, 3))               # adaptive avg -> [N, 2048]
    logits = pool3 @ params["fc"]["w"].T + params["fc"]["b"]
    probs = jax.nn.softmax(logits, axis=-1)
    n = images.shape[0]
    return pool3, spatial.reshape(n, -1), probs


_jit_inception = jax.jit(inception_features)


def extract_features_batched(params, images: np.ndarray, batch: int = 64):
    """Host-side driver: uint8/float images [N, 3, H, W] -> numpy feature
    arrays, jit-compiled per batch shape (module-level jit so repeated calls
    — e.g. score.py's ref + sample extractions — share one compilation)."""
    fwd = _jit_inception
    pool3, spatial, probs = [], [], []
    n = images.shape[0]
    for i in range(0, n, batch):
        chunk = images[i: i + batch]
        if chunk.dtype == np.uint8:
            chunk = chunk.astype(np.float32) / 255.0
        if chunk.shape[0] < batch:          # pad to keep one compiled shape
            pad = batch - chunk.shape[0]
            chunk = np.concatenate(
                [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
        else:
            pad = 0
        p3, sp, pr = fwd(params, jnp.asarray(chunk))
        end = batch - pad
        pool3.append(np.asarray(p3[:end]))
        spatial.append(np.asarray(sp[:end]))
        probs.append(np.asarray(pr[:end]))
    return (np.concatenate(pool3), np.concatenate(spatial),
            np.concatenate(probs))


# ---------------------------------------------------------------------------
# Weight conversion + random init
# ---------------------------------------------------------------------------

_BLOCK_BRANCHES = {
    "Mixed_5b": ["branch1x1", "branch5x5_1", "branch5x5_2",
                 "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3",
                 "branch_pool"],
    "Mixed_6a": ["branch3x3", "branch3x3dbl_1", "branch3x3dbl_2",
                 "branch3x3dbl_3"],
    "Mixed_6b": ["branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
                 "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                 "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"],
    "Mixed_7a": ["branch3x3_1", "branch3x3_2", "branch7x7x3_1",
                 "branch7x7x3_2", "branch7x7x3_3", "branch7x7x3_4"],
    "Mixed_7b": ["branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
                 "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
                 "branch3x3dbl_3b", "branch_pool"],
}
_BLOCK_BRANCHES.update({
    "Mixed_5c": _BLOCK_BRANCHES["Mixed_5b"],
    "Mixed_5d": _BLOCK_BRANCHES["Mixed_5b"],
    "Mixed_6c": _BLOCK_BRANCHES["Mixed_6b"],
    "Mixed_6d": _BLOCK_BRANCHES["Mixed_6b"],
    "Mixed_6e": _BLOCK_BRANCHES["Mixed_6b"],
    "Mixed_7c": _BLOCK_BRANCHES["Mixed_7b"],
})
_STEM = ["Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
         "Conv2d_3b_1x1", "Conv2d_4a_3x3"]


def convert_inception_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """torchvision/pytorch-fid ``inception_v3`` state dict -> params tree.

    Works for the FID weights (`pt_inception-2015-12-05-graph.pth`, fc=1008)
    and stock torchvision weights (fc=1000; FID values then follow the
    torchvision convention instead of the TF graph)."""

    def cb(prefix):
        return {
            "conv": np.asarray(sd[prefix + ".conv.weight"]),
            "bn": {
                "scale": np.asarray(sd[prefix + ".bn.weight"]),
                "bias": np.asarray(sd[prefix + ".bn.bias"]),
                "mean": np.asarray(sd[prefix + ".bn.running_mean"]),
                "var": np.asarray(sd[prefix + ".bn.running_var"]),
            },
        }

    params = {name: cb(name) for name in _STEM}
    for blk, branches in _BLOCK_BRANCHES.items():
        params[blk] = {br: cb(f"{blk}.{br}") for br in branches}
    params["fc"] = {"w": np.asarray(sd["fc.weight"]),
                    "b": np.asarray(sd["fc.bias"])}
    return params


# channel plumbing for random init: (out, in, kh, kw) per conv
def _shapes():
    s = {}

    def add(name, o, i, k, ):
        kh, kw = k if isinstance(k, tuple) else (k, k)
        s[name] = (o, i, kh, kw)

    add("Conv2d_1a_3x3", 32, 3, 3)
    add("Conv2d_2a_3x3", 32, 32, 3)
    add("Conv2d_2b_3x3", 64, 32, 3)
    add("Conv2d_3b_1x1", 80, 64, 1)
    add("Conv2d_4a_3x3", 192, 80, 3)
    for blk, cin, pf in (("Mixed_5b", 192, 32), ("Mixed_5c", 256, 64),
                         ("Mixed_5d", 288, 64)):
        add(f"{blk}.branch1x1", 64, cin, 1)
        add(f"{blk}.branch5x5_1", 48, cin, 1)
        add(f"{blk}.branch5x5_2", 64, 48, 5)
        add(f"{blk}.branch3x3dbl_1", 64, cin, 1)
        add(f"{blk}.branch3x3dbl_2", 96, 64, 3)
        add(f"{blk}.branch3x3dbl_3", 96, 96, 3)
        add(f"{blk}.branch_pool", pf, cin, 1)
    add("Mixed_6a.branch3x3", 384, 288, 3)
    add("Mixed_6a.branch3x3dbl_1", 64, 288, 1)
    add("Mixed_6a.branch3x3dbl_2", 96, 64, 3)
    add("Mixed_6a.branch3x3dbl_3", 96, 96, 3)
    for blk, c7 in (("Mixed_6b", 128), ("Mixed_6c", 160),
                    ("Mixed_6d", 160), ("Mixed_6e", 192)):
        add(f"{blk}.branch1x1", 192, 768, 1)
        add(f"{blk}.branch7x7_1", c7, 768, 1)
        add(f"{blk}.branch7x7_2", c7, c7, (1, 7))
        add(f"{blk}.branch7x7_3", 192, c7, (7, 1))
        add(f"{blk}.branch7x7dbl_1", c7, 768, 1)
        add(f"{blk}.branch7x7dbl_2", c7, c7, (7, 1))
        add(f"{blk}.branch7x7dbl_3", c7, c7, (1, 7))
        add(f"{blk}.branch7x7dbl_4", c7, c7, (7, 1))
        add(f"{blk}.branch7x7dbl_5", 192, c7, (1, 7))
        add(f"{blk}.branch_pool", 192, 768, 1)
    add("Mixed_7a.branch3x3_1", 192, 768, 1)
    add("Mixed_7a.branch3x3_2", 320, 192, 3)
    add("Mixed_7a.branch7x7x3_1", 192, 768, 1)
    add("Mixed_7a.branch7x7x3_2", 192, 192, (1, 7))
    add("Mixed_7a.branch7x7x3_3", 192, 192, (7, 1))
    add("Mixed_7a.branch7x7x3_4", 192, 192, 3)
    for blk, cin in (("Mixed_7b", 1280), ("Mixed_7c", 2048)):
        add(f"{blk}.branch1x1", 320, cin, 1)
        add(f"{blk}.branch3x3_1", 384, cin, 1)
        add(f"{blk}.branch3x3_2a", 384, 384, (1, 3))
        add(f"{blk}.branch3x3_2b", 384, 384, (3, 1))
        add(f"{blk}.branch3x3dbl_1", 448, cin, 1)
        add(f"{blk}.branch3x3dbl_2", 384, 448, 3)
        add(f"{blk}.branch3x3dbl_3a", 384, 384, (1, 3))
        add(f"{blk}.branch3x3dbl_3b", 384, 384, (3, 1))
        add(f"{blk}.branch_pool", 192, cin, 1)
    return s


def init_inception_params(key, num_classes: int = NUM_CLASSES) -> Dict:
    """Random-weight network with the exact real shapes (shape/smoke tests;
    real evaluation needs converted pt_inception weights)."""
    shapes = _shapes()
    sd = {}
    ks = jax.random.split(key, len(shapes) + 1)
    for (name, shp), k in zip(sorted(shapes.items()), ks):
        o = shp[0]
        fan_in = shp[1] * shp[2] * shp[3]
        # He init (sqrt(2/fan_in)): each conv+ReLU halves variance, and
        # this net stacks ~94 of them — 1/sqrt(fan_in) init decayed pool3
        # features to ~1e-4 with 1e-6 cross-image std (constant features
        # -> FID 0 / IS 1 for ANY input sets, which silently voided
        # random-feature studies)
        sd[name + ".conv.weight"] = np.asarray(
            jax.random.normal(k, shp) * np.sqrt(2.0 / fan_in), np.float32)
        sd[name + ".bn.weight"] = np.ones(o, np.float32)
        sd[name + ".bn.bias"] = np.zeros(o, np.float32)
        sd[name + ".bn.running_mean"] = np.zeros(o, np.float32)
        sd[name + ".bn.running_var"] = np.ones(o, np.float32)
    # logits std ~ |pool3| * sqrt(2048) * scale: 8/45 puts it at ~3 so the
    # softmax is non-uniform and IS varies with the input set
    sd["fc.weight"] = np.asarray(
        jax.random.normal(ks[-1], (num_classes, 2048)) * (8.0 / 45.0),
        np.float32)
    sd["fc.bias"] = np.zeros(num_classes, np.float32)
    return convert_inception_state_dict(sd)
