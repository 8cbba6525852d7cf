"""ctypes bindings for the native image loader (native/image_loader.cpp).

Threaded JPEG decode + PIL-compatible bicubic preprocessing in C++ — the
host-side data path for training input pipelines and serving workers
(replaces per-sample PIL work, which holds the GIL). Auto-builds the shared
library on first use if a toolchain is present; callers fall back to the PIL
path (data/preprocessing.py) when unavailable.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

MODE_RESIZE_CROP = 0
MODE_PAD_SQUARE = 1

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfvlm_image.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except Exception as e:
            logger.info("native image loader unavailable (%s); using PIL", e)
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        logger.info("failed to load %s (%s); using PIL", _LIB_PATH, e)
        return None
    lib.fvlm_preprocess_jpeg.restype = ctypes.c_int
    lib.fvlm_preprocess_jpeg.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float)]
    lib.fvlm_preprocess_rgb.restype = ctypes.c_int
    lib.fvlm_preprocess_rgb.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
    lib.fvlm_preprocess_files.restype = ctypes.c_int
    lib.fvlm_preprocess_files.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def preprocess_jpeg_bytes(data: bytes, size: int,
                          mode: int = MODE_PAD_SQUARE) -> np.ndarray:
    """JPEG bytes -> (size, size, 3) f32 in [0, 1]."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native image loader not available")
    out = np.empty((size, size, 3), np.float32)
    rc = lib.fvlm_preprocess_jpeg(
        data, len(data), size, mode,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc:
        raise ValueError("JPEG decode failed")
    return out


def preprocess_rgb(rgb: np.ndarray, size: int,
                   mode: int = MODE_PAD_SQUARE) -> np.ndarray:
    """(H, W, 3) u8 -> (size, size, 3) f32 in [0, 1]."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native image loader not available")
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w = rgb.shape[:2]
    out = np.empty((size, size, 3), np.float32)
    lib.fvlm_preprocess_rgb(
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h, size, mode,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def preprocess_files(paths: Sequence[str], size: int,
                     mode: int = MODE_PAD_SQUARE,
                     num_threads: int = 8) -> tuple:
    """Threaded batch: JPEG paths -> ((N, size, size, 3) f32, ok (N,) bool)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native image loader not available")
    n = len(paths)
    out = np.empty((n, size, size, 3), np.float32)
    ok = np.empty((n,), np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.fvlm_preprocess_files(
        arr, n, size, mode,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), num_threads)
    return out, ok == 0
