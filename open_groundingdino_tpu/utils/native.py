"""Native (C++) runtime components, built on demand with g++ and loaded via
ctypes — no pybind11 dependency.  Falls back gracefully when no toolchain
is available; callers keep a pure-numpy path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_BUILD_DIR = os.path.join(_NATIVE_DIR, "build")
_LOCK = threading.Lock()
_LIBS = {}


def _build_and_load(name: str) -> Optional[ctypes.CDLL]:
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        src = os.path.join(_NATIVE_DIR, f"{name}.cpp")
        out = os.path.join(_BUILD_DIR, f"lib{name}.so")
        try:
            if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
                os.makedirs(_BUILD_DIR, exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-o", out, src],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(out)
        except Exception:
            lib = None
        _LIBS[name] = lib
        return lib


def coco_greedy_match(
    ious: np.ndarray,       # (D, G) float64
    gt_ignore: np.ndarray,  # (G,) bool, sorted non-ignored first
    iscrowd: np.ndarray,    # (G,) bool
    thrs: np.ndarray,       # (T,) float64
):
    """Native greedy COCO matching; returns (dt_m (T,D), gt_m (T,G),
    dt_ig_gt (T,D)) or None if the native library is unavailable."""
    lib = _build_and_load("coco_match")
    if lib is None:
        return None
    D, G = ious.shape
    T = len(thrs)
    ious = np.ascontiguousarray(ious, np.float64)
    gt_ignore = np.ascontiguousarray(gt_ignore, np.uint8)
    iscrowd = np.ascontiguousarray(iscrowd, np.uint8)
    thrs = np.ascontiguousarray(thrs, np.float64)
    dt_m = np.full((T, D), -1, np.int64)
    gt_m = np.full((T, G), -1, np.int64)
    dt_ig = np.zeros((T, D), np.uint8)

    lib.coco_greedy_match(
        ious.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        gt_ignore.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        iscrowd.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        thrs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(D), ctypes.c_int64(G), ctypes.c_int64(T),
        dt_m.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        gt_m.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        dt_ig.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return dt_m, gt_m, dt_ig.astype(bool)
