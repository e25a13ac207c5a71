"""ctypes loader for the native grid-knn extension (native/knn.cpp).

The .so is built lazily with g++ on first use and cached next to the
source; `model.gaussians.mean_sq_dist_knn3` falls back to scipy/numpy when
compilation is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "knn.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libknn.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or \
            os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True, capture_output=True)
    lib = ctypes.CDLL(_SO)
    lib.mean_sq_dist_knn3.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float)]
    lib.mean_sq_dist_knn3.restype = None
    _lib = lib
    return lib


def mean_sq_dist_knn3(points: np.ndarray) -> np.ndarray:
    lib = _load()
    pts = np.ascontiguousarray(points, dtype=np.float32)
    n = pts.shape[0]
    out = np.empty(n, np.float32)
    lib.mean_sq_dist_knn3(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(n),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
