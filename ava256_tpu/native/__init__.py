# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""ctypes bindings for the native host-side data kernels (dataio.cpp).

Build: ``python -m ava256_tpu.native.build`` (or make in this directory).
Every entry point has a numpy fallback so the loader works unbuilt.
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LIB_PATH = Path(__file__).parent / "libavadataio.so"


def _load() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.ava_parse_ply_f32.restype = ctypes.c_int64
    lib.ava_parse_ply_f32.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
    ]
    lib.ava_resize_bilinear_u8.restype = None
    lib.ava_resize_bilinear_u8.argtypes = [
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_int64,
    ]
    lib.ava_normalize_hwc.restype = None
    lib.ava_normalize_hwc.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_float,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int64,
    ]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def parse_ply_vertices_native(data: bytes, max_verts: int = 1_000_000) -> Optional[np.ndarray]:
    """Native PLY vertex parse; returns None if unavailable/unsupported."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((max_verts * 8,), np.float32)
    nprops = ctypes.c_int32(0)
    n = lib.ava_parse_ply_f32(data, len(data), out, max_verts, ctypes.byref(nprops))
    if n <= 0:
        return None
    return out[: n * nprops.value].reshape(n, nprops.value).copy()


def resize_bilinear_u8(img: np.ndarray, out_hw: Tuple[int, int]) -> Optional[np.ndarray]:
    """Native uint8 HWC bilinear resize; returns None if unavailable."""
    lib = _load()
    if lib is None or img.dtype != np.uint8 or img.ndim != 3:
        return None
    img = np.ascontiguousarray(img)
    dh, dw = out_hw
    dst = np.empty((dh, dw, img.shape[2]), np.uint8)
    lib.ava_resize_bilinear_u8(
        img, img.shape[0], img.shape[1], img.shape[2], dst, dh, dw
    )
    return dst


def normalize_hwc(x: np.ndarray, mean: np.ndarray, std: float) -> np.ndarray:
    """Fused (x - mean) / std; falls back to numpy."""
    lib = _load()
    if lib is None or x.dtype != np.float32 or not x.flags.c_contiguous:
        return (x - mean) / std
    out = np.empty_like(x)
    lib.ava_normalize_hwc(
        x, np.ascontiguousarray(mean, np.float32), 1.0 / std, out, x.size
    )
    return out
