"""ctypes bindings for the native host-preprocessing kernel.

Builds lazily with g++ on first use (cached as libinbed_preprocess.so next
to the source); falls back cleanly when no compiler is available — callers
check `available()`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "preprocess.cc")
_LIB = os.path.join(_DIR, "libinbed_preprocess.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             "-o", _LIB, _SRC, "-lpthread"],
            check=True, capture_output=True,
        )
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        if not _build():
            return None
    lib = ctypes.CDLL(_LIB)
    lib.preprocess_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    lib.preprocess_batch.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def preprocess_batch(
    images: np.ndarray,
    centers: np.ndarray,
    scales: np.ndarray,
    flips: np.ndarray,
    noise: np.ndarray,
    res: int,
    mean: np.ndarray,
    std: np.ndarray,
    num_threads: int = 0,
    rots: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Fused crop+resize+rotate+noise+normalize for a uint8 NHWC batch.

    images: [B, H, W, C] uint8; centers [B, 2]; scales [B]; flips [B];
    noise [B, 3]; rots [B] degrees (None = no rotation).
    Returns [B, res, res, C] float32.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native preprocess library unavailable (no g++?)")
    images = np.ascontiguousarray(images, np.uint8)
    B, H, W, C = images.shape
    if rots is None:
        rots = np.zeros(B, np.float32)
    specs = np.concatenate(
        [
            np.asarray(centers, np.float32).reshape(B, 2),
            np.asarray(scales, np.float32).reshape(B, 1),
            np.asarray(flips, np.float32).reshape(B, 1),
            np.asarray(noise, np.float32).reshape(B, 3),
            np.asarray(rots, np.float32).reshape(B, 1),
        ],
        axis=1,
    ).astype(np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    out = np.empty((B, res, res, C), np.float32)
    if num_threads <= 0:
        num_threads = min(8, os.cpu_count() or 1)
    lib.preprocess_batch(
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), B, H, W, C,
        specs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), res,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), num_threads,
    )
    return out
