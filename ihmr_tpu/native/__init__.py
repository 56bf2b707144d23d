"""ctypes bindings for the native host data-plane kernels.

Falls back gracefully (``available() == False``) when the toolchain is
missing; consumers then use the NumPy/cv2 path in ihmr_tpu.data.preprocess.
"""

from __future__ import annotations

import ctypes
from typing import Tuple

import numpy as np

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        from ihmr_tpu.native.build import build

        path = build()
        lib = ctypes.CDLL(path)
        lib.letterbox_normalize.restype = ctypes.c_float
        lib.letterbox_normalize.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.letterbox_normalize_batch.restype = None
        lib.letterbox_normalize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.normalize_batch.restype = None
        lib.normalize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
    except Exception:  # toolchain missing / build failed -> numpy fallback
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def letterbox_normalize(img: np.ndarray, final_size: int = 224) -> Tuple[np.ndarray, float]:
    """uint8 BGR HWC -> (normalized float32 RGB (S, S, 3), resize ratio)."""
    lib = _load()
    assert lib is not None, "native library not built"
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    out = np.empty((final_size, final_size, 3), np.float32)
    ratio = lib.letterbox_normalize(_u8ptr(img), h, w, c, final_size, _f32ptr(out))
    return out, float(ratio)


def letterbox_normalize_batch(imgs: np.ndarray, final_size: int = 224) -> Tuple[np.ndarray, np.ndarray]:
    """(B, H, W, 3) uint8 BGR -> ((B, S, S, 3) float32 RGB in [-1,1], (B,) ratios)."""
    lib = _load()
    assert lib is not None, "native library not built"
    imgs = np.ascontiguousarray(imgs, np.uint8)
    b, h, w, c = imgs.shape
    out = np.empty((b, final_size, final_size, 3), np.float32)
    ratios = np.empty(b, np.float32)
    lib.letterbox_normalize_batch(
        _u8ptr(imgs), b, h, w, c, final_size, _f32ptr(out), _f32ptr(ratios)
    )
    return out, ratios


def normalize_batch(imgs: np.ndarray) -> np.ndarray:
    """(B, H, W, 3) uint8 BGR -> (B, H, W, 3) float32 RGB in [-1, 1]."""
    lib = _load()
    assert lib is not None, "native library not built"
    imgs = np.ascontiguousarray(imgs, np.uint8)
    b, h, w, _ = imgs.shape
    out = np.empty((b, h, w, 3), np.float32)
    lib.normalize_batch(_u8ptr(imgs), b, h, w, _f32ptr(out))
    return out
