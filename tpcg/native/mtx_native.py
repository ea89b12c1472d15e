"""ctypes binding for the native Matrix Market parser (``libtpcgio.so``).

The shared library is built lazily from ``mtx_reader.cpp`` (g++ is part of
the toolchain); if the build or load fails we silently fall back to scipy.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "mtx_reader.cpp")
_LIB = os.path.join(_HERE, "libtpcgio.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _LIB]
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
            lib.tpcg_mtx_read.restype = ctypes.c_void_p
            lib.tpcg_mtx_read.argtypes = [ctypes.c_char_p]
            lib.tpcg_mtx_nrows.restype = ctypes.c_longlong
            lib.tpcg_mtx_nrows.argtypes = [ctypes.c_void_p]
            lib.tpcg_mtx_ncols.restype = ctypes.c_longlong
            lib.tpcg_mtx_ncols.argtypes = [ctypes.c_void_p]
            lib.tpcg_mtx_nnz.restype = ctypes.c_longlong
            lib.tpcg_mtx_nnz.argtypes = [ctypes.c_void_p]
            lib.tpcg_mtx_is_complex.restype = ctypes.c_int
            lib.tpcg_mtx_is_complex.argtypes = [ctypes.c_void_p]
            lib.tpcg_mtx_fill_csr.restype = None
            lib.tpcg_mtx_fill_csr.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p]
            lib.tpcg_mtx_free.restype = None
            lib.tpcg_mtx_free.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def load(path: str):
    """Parse a Matrix Market file natively; returns scipy CSR or None."""
    import numpy as np
    import scipy.sparse as sp

    lib = _load()
    if lib is None:
        return None
    handle = lib.tpcg_mtx_read(path.encode())
    if not handle:
        return None
    try:
        n = lib.tpcg_mtx_nrows(handle)
        m = lib.tpcg_mtx_ncols(handle)
        nnz = lib.tpcg_mtx_nnz(handle)
        is_complex = lib.tpcg_mtx_is_complex(handle)
        indptr = np.zeros(n + 1, dtype=np.int64)
        indices = np.zeros(nnz, dtype=np.int64)
        data = np.zeros(nnz, dtype=np.complex128 if is_complex else np.float64)
        lib.tpcg_mtx_fill_csr(
            handle,
            indptr.ctypes.data_as(ctypes.c_void_p),
            indices.ctypes.data_as(ctypes.c_void_p),
            data.ctypes.data_as(ctypes.c_void_p))
        return sp.csr_matrix((data, indices, indptr), shape=(n, m))
    finally:
        lib.tpcg_mtx_free(handle)
