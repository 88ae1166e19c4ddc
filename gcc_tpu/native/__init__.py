"""ctypes bindings for the native image transform engine.

Builds libgcc_image.so on first use (g++ -O3, cached next to the source;
rebuilt when the source is newer). Falls back gracefully: callers check
`available()` and keep the PIL path when the toolchain is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "image_ops.cpp")
_LIB = os.path.join(_DIR, "libgcc_image.so")
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-funroll-loops", "-shared",
           "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if (not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        if not _build():
            _build_failed = True
            return None
    lib = ctypes.CDLL(_LIB)
    lib.gcc_resize_bicubic_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int]
    lib.gcc_transform_batch.argtypes = [
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def resize_bicubic(img_u8: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """uint8 HWC(3) -> uint8 HWC(3), PIL-compatible bicubic."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    img_u8 = np.ascontiguousarray(img_u8, np.uint8)
    out = np.empty((out_h, out_w, 3), np.uint8)
    lib.gcc_resize_bicubic_u8(
        img_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img_u8.shape[0], img_u8.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out_h, out_w)
    return out


def transform_batch(images_u8: Sequence[np.ndarray], load_size: int,
                    crop_size: int, crop_pos: Sequence,
                    flips: Sequence[bool],
                    num_threads: int = 8) -> np.ndarray:
    """Batch of uint8 HWC images -> float32 NHWC [-1,1] (resize->crop->flip
    ->normalize) on the C++ thread pool."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    n = len(images_u8)
    imgs = [np.ascontiguousarray(im, np.uint8) for im in images_u8]
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[im.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for im in imgs])
    hs = (ctypes.c_int * n)(*[im.shape[0] for im in imgs])
    ws = (ctypes.c_int * n)(*[im.shape[1] for im in imgs])
    cxs = (ctypes.c_int * n)(*[int(p[0]) for p in crop_pos])
    cys = (ctypes.c_int * n)(*[int(p[1]) for p in crop_pos])
    fl = (ctypes.c_int * n)(*[int(bool(f)) for f in flips])
    out = np.empty((n, crop_size, crop_size, 3), np.float32)
    lib.gcc_transform_batch(
        ptrs, hs, ws, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        load_size, crop_size, cxs, cys, fl, num_threads)
    return out
