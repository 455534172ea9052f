"""Native host-runtime bindings (ctypes over ``liblcqpow_host.so``).

The reference's runtime is C++ throughout; here the device compute path is
JAX/XLA and this module provides the native *host* runtime around it: fast
problem-file parsing, CSC<->dense conversion and batch packing
(``src/lcqpow_host.cpp``; reference equivalents at
``/root/reference/src/Utilities.cpp:312-650``).

The shared library is compiled on first import (g++, ~1 s, cached next to the
source).  Every entry point has a pure-numpy fallback in the callers
(:mod:`lcqpow_tpu.ops.csc`, :mod:`lcqpow_tpu.io`), so the framework works —
just slower on large ingests — when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "lcqpow_host.cpp")
_LIB = os.path.join(_HERE, "liblcqpow_host.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", _LIB, _SRC]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=120)
        return r.returncode == 0
    except (OSError, subprocess.SubprocessError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB) or \
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None

    lib.lcqpow_read_doubles.restype = ctypes.c_long
    lib.lcqpow_read_doubles.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_long]
    lib.lcqpow_write_doubles.restype = ctypes.c_int
    lib.lcqpow_write_doubles.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_long]
    lib.lcqpow_csc_to_dense.restype = ctypes.c_int
    lib.lcqpow_csc_to_dense.argtypes = [
        ctypes.c_long, ctypes.c_long, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p]
    lib.lcqpow_dense_to_csc.restype = ctypes.c_long
    lib.lcqpow_dense_to_csc.argtypes = [
        ctypes.c_long, ctypes.c_long, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p]
    lib.lcqpow_pack_padded.restype = None
    lib.lcqpow_pack_padded.argtypes = [
        ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
        ctypes.c_void_p, ctypes.c_long, ctypes.c_long, ctypes.c_long]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def read_doubles_native(path: str) -> Optional[np.ndarray]:
    """Fast parse of a whitespace-separated doubles file.  None if the
    native library is unavailable; raises OSError on unreadable files."""
    lib = _load()
    if lib is None:
        return None
    n = lib.lcqpow_read_doubles(path.encode(), None, 0)
    if n < 0:
        raise OSError(f"cannot read {path}")
    out = np.empty(n, dtype=np.float64)
    got = lib.lcqpow_read_doubles(path.encode(), _ptr(out), n)
    if got != n:
        raise OSError(f"short read on {path}: {got} != {n}")
    return out


def write_doubles_native(path: str, vals) -> bool:
    lib = _load()
    if lib is None:
        return False
    vals = np.ascontiguousarray(vals, dtype=np.float64).reshape(-1)
    if lib.lcqpow_write_doubles(path.encode(), _ptr(vals), vals.size) != 0:
        raise OSError(f"cannot write {path}")
    return True


def csc_to_dense_native(m: int, n: int, indptr, indices, data
                        ) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    data = np.ascontiguousarray(data, dtype=np.float64)
    out = np.empty((m, n), dtype=np.float64)
    if lib.lcqpow_csc_to_dense(m, n, _ptr(indptr), _ptr(indices),
                               _ptr(data), _ptr(out)) != 0:
        raise ValueError("structurally invalid CSC input")
    return out


def dense_to_csc_native(A) -> Optional[tuple]:
    lib = _load()
    if lib is None:
        return None
    A = np.ascontiguousarray(A, dtype=np.float64)
    m, n = A.shape
    indptr = np.empty(n + 1, dtype=np.int64)
    indices = np.empty(m * n, dtype=np.int64)
    data = np.empty(m * n, dtype=np.float64)
    nnz = lib.lcqpow_dense_to_csc(m, n, _ptr(A), _ptr(indptr),
                                  _ptr(indices), _ptr(data))
    return indptr, indices[:nnz].copy(), data[:nnz].copy()


def pack_padded_native(arrays, pad_rows: int, pad_cols: int,
                       fill: float = 0.0) -> Optional[np.ndarray]:
    """Pack a list of 2-D float64 arrays into a (B, pad_rows, pad_cols)
    batch, each at the top-left of its slot, remainder = ``fill``."""
    lib = _load()
    if lib is None:
        return None
    B = len(arrays)
    out = np.full((B, pad_rows, pad_cols), fill, dtype=np.float64)
    for b, a in enumerate(arrays):
        a = np.ascontiguousarray(a, dtype=np.float64)
        lib.lcqpow_pack_padded(_ptr(a), a.shape[0], a.shape[1],
                               _ptr(out), pad_rows, pad_cols, b)
    return out
