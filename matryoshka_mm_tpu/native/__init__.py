"""Native (C++) runtime ops.

Builds ``libimage_ops.so`` on first use (g++, cached next to the source)
and exposes ctypes bindings.  Falls back cleanly to the PIL path when the
toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "image_ops.cpp")
_LIB = os.path.join(_HERE, "libimage_ops.so")

_lib = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-funroll-loops", "-shared",
             "-fPIC", _SRC, "-o", _LIB],
            check=True, capture_output=True)
        return True
    except Exception as e:  # toolchain missing / build error
        print(f"[native] build failed: {e}")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_LIB) or (
        os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
    ):
        if not _build():
            _load_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB)
        lib.clip_preprocess.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.clip_preprocess_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.image_resize_bicubic.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ]
        _lib = lib
    except OSError as e:
        print(f"[native] load failed: {e}")
        _load_failed = True
    return _lib


def native_available() -> bool:
    return get_lib() is not None


def clip_preprocess_native(rgb: np.ndarray, target_short: int, crop: int,
                           mean, std) -> np.ndarray:
    """(H, W, 3) uint8 -> (3, crop, crop) float32, CLIP semantics."""
    lib = get_lib()
    assert lib is not None, "native library unavailable"
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w = rgb.shape[:2]
    out = np.empty((3, crop, crop), np.float32)
    mean_a = np.asarray(mean, np.float32)
    std_a = np.asarray(std, np.float32)
    lib.clip_preprocess(
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        target_short, crop,
        mean_a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std_a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def resize_bicubic_native(rgb: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    lib = get_lib()
    assert lib is not None, "native library unavailable"
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w = rgb.shape[:2]
    out = np.empty((out_h, out_w, 3), np.uint8)
    lib.image_resize_bicubic(
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out_h, out_w)
    return out
