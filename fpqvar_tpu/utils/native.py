"""ctypes bindings for the native host library (native/fpq_native.cpp).

Auto-builds libfpq_native.so with the repo Makefile on first use (g++ is
part of the toolchain); every entry point has a numpy fallback so the
framework works without a compiler.  Correspondence to the reference's
native layer documented in the .cpp header.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO = os.path.join(_NATIVE_DIR, "libfpq_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            # always invoke make: a no-op when the .so is current, a rebuild
            # when fpq_native.cpp changed since the .so was built
            subprocess.run(
                ["make", "-s"], cwd=_NATIVE_DIR, check=True,
                capture_output=True, timeout=120)
        except Exception:
            if not os.path.exists(_SO):
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        i64, i32, f32p, i32p, i8p, u8p = (
            ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_uint8))
        lib.fpq_snap.argtypes = [f32p, i64, f32p, i32, f32p]
        lib.fpq_encode.argtypes = [f32p, i64, f32p, i32, i32p]
        lib.fpq_pack_rows.argtypes = [i32p, i64, i64, i8p]
        lib.fpq_images_to_u8.argtypes = [f32p, i64, i64, i64, u8p]
        lib.fpq_write_png_batch.argtypes = [
            u8p, i64, i64, i64, ctypes.POINTER(ctypes.c_char_p)]
        lib.fpq_write_png_batch.restype = i32
        lib.fpq_abi_version.restype = ctypes.c_int
        if lib.fpq_abi_version() != 2:
            return None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _fp(a: np.ndarray, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def snap_to_grid(x: np.ndarray, grid: np.ndarray) -> np.ndarray:
    """Nearest-grid snap (native if available; numpy otherwise).  Same
    midpoint/tie semantics as fpqvar_tpu.ops.quantizers.snap_to_grid."""
    xf = np.ascontiguousarray(x, np.float32)
    g = np.ascontiguousarray(grid, np.float32)
    lib = _load()
    if lib is None:
        mids = (g[1:] + g[:-1]) / 2
        return g[np.searchsorted(mids, xf, side="right")]
    out = np.empty_like(xf)
    lib.fpq_snap(_fp(xf, ctypes.c_float), xf.size, _fp(g, ctypes.c_float),
                 len(g), _fp(out, ctypes.c_float))
    return out.reshape(x.shape)


def encode_to_grid(x: np.ndarray, grid: np.ndarray) -> np.ndarray:
    xf = np.ascontiguousarray(x, np.float32)
    g = np.ascontiguousarray(grid, np.float32)
    lib = _load()
    if lib is None:
        mids = (g[1:] + g[:-1]) / 2
        return np.searchsorted(mids, xf, side="right").astype(np.int32)
    out = np.empty(xf.shape, np.int32)
    lib.fpq_encode(_fp(xf, ctypes.c_float), xf.size, _fp(g, ctypes.c_float),
                   len(g), _fp(out, ctypes.c_int32))
    return out


def pack_rows(codes: np.ndarray) -> np.ndarray:
    """Row-split nibble pack: [rows, cols] int32 codes -> [rows/2, cols]
    int8 (rows % 128 == 0); mirrors fpqvar_tpu.ops.packing layout."""
    c = np.ascontiguousarray(codes, np.int32)
    rows, cols = c.shape
    if rows % 128:
        raise ValueError("rows must be divisible by 128")
    lib = _load()
    if lib is None:
        ct = c.reshape(rows // 128, 128, cols)
        return ((ct[:, :64] & 0xF) | ((ct[:, 64:] & 0xF) << 4)).astype(
            np.int8).reshape(rows // 2, cols)
    out = np.empty((rows // 2, cols), np.int8)
    lib.fpq_pack_rows(_fp(c, ctypes.c_int32), rows, cols,
                      _fp(out, ctypes.c_int8))
    return out


def write_png_batch(imgs: np.ndarray, paths) -> bool:
    """Write [B, H, W, 3] uint8 images as PNGs, one thread per image
    (zlib-level-1, None/Sub row filters).  Returns False if the native
    library is unavailable (caller falls back to PIL) and raises on an
    actual write failure."""
    lib = _load()
    if lib is None:
        return False
    x = np.ascontiguousarray(imgs, np.uint8)
    b, h, w, c = x.shape
    assert c == 3 and len(paths) == b
    arr = (ctypes.c_char_p * b)(*[p.encode() for p in paths])
    fails = lib.fpq_write_png_batch(_fp(x, ctypes.c_uint8), b, h, w, arr)
    if fails:
        raise OSError(f"fpq_write_png_batch: {fails}/{b} images failed")
    return True


def images_to_uint8(imgs: np.ndarray) -> np.ndarray:
    """[B, 3, H, W] float[0,1] -> [B, H, W, 3] uint8."""
    x = np.ascontiguousarray(imgs, np.float32)
    b, c, h, w = x.shape
    assert c == 3
    lib = _load()
    if lib is None:
        arr = np.transpose(x, (0, 2, 3, 1)) * 255.0
        return np.clip(arr, 0, 255).astype(np.uint8)
    out = np.empty((b, h, w, 3), np.uint8)
    lib.fpq_images_to_u8(_fp(x, ctypes.c_float), b, h, w,
                         _fp(out, ctypes.c_uint8))
    return out
