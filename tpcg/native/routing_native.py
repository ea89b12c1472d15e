"""ctypes binding for the native routing-network preprocessor
(``libtpcgroute.so``, built lazily from ``routing_builder.cpp``).

Mirrors ``mtx_native``: g++ one-liner on first use, silent ``None``
fallback (callers keep the Python implementation in
``tpcg/ops/routing.py`` as the reference path).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "routing_builder.cpp")
_LIB = os.path.join(_HERE, "libtpcgroute.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-std=c++17", _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB)
            i64 = ctypes.c_longlong
            lib.tpcg_route_build.restype = ctypes.c_void_p
            lib.tpcg_route_build.argtypes = [
                i64, i64, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_ulonglong]
            for f in ("tpcg_route_m", "tpcg_route_layers",
                      "tpcg_route_stages"):
                getattr(lib, f).restype = i64
                getattr(lib, f).argtypes = [ctypes.c_void_p]
            lib.tpcg_route_fill.restype = None
            lib.tpcg_route_fill.argtypes = [ctypes.c_void_p,
                                            ctypes.c_void_p,
                                            ctypes.c_void_p]
            lib.tpcg_route_free.restype = None
            lib.tpcg_route_free.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def build(rows, cols, n: int, seed: int = 0):
    """Native layer decomposition + Benes masks.

    rows/cols : int64 arrays (nnz,).
    Returns (masks int8 (L, S, m), layer int32 (nnz,), m) or None when
    the native library is unavailable.
    """
    import numpy as np

    lib = _load()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    cols = np.ascontiguousarray(cols, dtype=np.int64)
    nnz = len(rows)
    handle = lib.tpcg_route_build(
        n, nnz, rows.ctypes.data_as(ctypes.c_void_p),
        cols.ctypes.data_as(ctypes.c_void_p), seed)
    if not handle:
        return None
    try:
        m = lib.tpcg_route_m(handle)
        L = lib.tpcg_route_layers(handle)
        S = lib.tpcg_route_stages(handle)
        masks = np.zeros((L, S, m), dtype=np.int8)
        layer = np.zeros(nnz, dtype=np.int32)
        lib.tpcg_route_fill(handle,
                            masks.ctypes.data_as(ctypes.c_void_p),
                            layer.ctypes.data_as(ctypes.c_void_p))
        return masks, layer, int(m)
    finally:
        lib.tpcg_route_free(handle)
