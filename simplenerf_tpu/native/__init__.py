"""Native (C++) host-side ops, built on demand and bound via ctypes.

The TPU compute path is JAX/XLA/Pallas; this package holds the CPU-side
runtime pieces where Python-level dispatch dominates — currently the
visibility-mask forward-splat (qa/masks.py), whose numpy version spends its
time in serial np.add.at scatters. The shared library is compiled once per
checkout with g++ (no pip packages involved) and cached next to the source;
every entry point has a numpy fallback, so the framework works without a
compiler (set SIMPLENERF_NO_NATIVE=1 to force the fallback).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).parent / "warp.cpp"
_LIB = Path(__file__).parent / "_libwarp.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             str(_SRC), "-o", str(_LIB)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("SIMPLENERF_NO_NATIVE"):
        return None
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
        lib.bilinear_splat.argtypes = [
            ctypes.POINTER(ctypes.c_double),  # values
            ctypes.POINTER(ctypes.c_double),  # trans_pos
            ctypes.POINTER(ctypes.c_double),  # depth
            ctypes.c_void_p,                  # mask (uint8*) or NULL
            ctypes.c_long, ctypes.c_long, ctypes.c_long,  # h, w, c
            ctypes.POINTER(ctypes.c_double),  # acc
            ctypes.POINTER(ctypes.c_double),  # acc_w
        ]
        lib.bilinear_splat.restype = None
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def bilinear_splat_accumulate(
    values: np.ndarray,
    trans_pos: np.ndarray,
    depth: np.ndarray,
    mask: Optional[np.ndarray],
) -> Optional[tuple[np.ndarray, np.ndarray]]:
    """Native scatter-accumulate onto the padded (h+2, w+2) canvas.

    Returns (acc (h+2, w+2, c), acc_w (h+2, w+2)) or None when the native
    library is unavailable. Semantics identical to the numpy path in
    qa/masks.bilinear_splat (reference Warper.py:99-181).
    """
    lib = _load()
    if lib is None:
        return None
    h, w, c = values.shape
    values = np.ascontiguousarray(values, dtype=np.float64)
    trans_pos = np.ascontiguousarray(trans_pos, dtype=np.float64)
    depth = np.ascontiguousarray(depth, dtype=np.float64)
    mask_arr = None
    mask_ptr = None
    if mask is not None:
        mask_arr = np.ascontiguousarray(mask, dtype=np.uint8)
        mask_ptr = mask_arr.ctypes.data_as(ctypes.c_void_p)
    acc = np.zeros((h + 2, w + 2, c), dtype=np.float64)
    acc_w = np.zeros((h + 2, w + 2), dtype=np.float64)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.bilinear_splat(
        values.ctypes.data_as(dp), trans_pos.ctypes.data_as(dp),
        depth.ctypes.data_as(dp), mask_ptr,
        h, w, c,
        acc.ctypes.data_as(dp), acc_w.ctypes.data_as(dp),
    )
    return acc, acc_w
