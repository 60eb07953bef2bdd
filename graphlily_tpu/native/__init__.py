"""ctypes bindings for the native formatter (with transparent numpy fallback).

The shared library is built on first import if g++ is available; all callers
must handle `lib() is None` (pure-python environments).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libgraphlily_native.so")
_LIB = None
_TRIED = False


def lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) <
            os.path.getmtime(os.path.join(_HERE, "formatter.cpp"))):
        try:
            subprocess.run(["make", "-C", _HERE, "-s"], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        L = ctypes.CDLL(_SO)
    except OSError:
        return None
    L.glt_pack_assign.restype = ctypes.c_int64
    L.glt_pack_assign.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32)]
    L.glt_csr2csc.restype = None
    L.glt_csr2csc.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_float)]
    if not _self_test(L):
        return None
    _LIB = L
    return _LIB


def _self_test(L) -> bool:
    """Gate the native path on a known-answer check (a stale or
    wrong-architecture binary must fall back to numpy, not corrupt layouts)."""
    try:
        rows = np.array([0, 0, 130, 5], np.uint32)
        cols = np.array([0, 200, 1025, 131], np.uint32)
        nnz = 4
        chunk_id = np.empty(nnz, np.int64)
        sub = np.empty(nnz, np.int32)
        lane = np.empty(nnz, np.int32)
        n = L.glt_pack_assign(
            _u32p(rows), _u32p(cols), nnz, 2,
            chunk_id.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            sub.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            lane.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        # groups: (wid0,cid0) -> chunk 0 {(0,0,s0,l0),(0,200,s1,l0),(5,131,s1,l1)},
        # (wid1,cid1) -> chunk 1 {(130,1025,s0,l0)}
        return (n == 2 and list(chunk_id) == [0, 0, 1, 0]
                and list(sub) == [0, 1, 0, 1] and list(lane) == [0, 0, 0, 1])
    except Exception:
        return False


def _u32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def pack_assign(rows: np.ndarray, cols: np.ndarray, nct: int):
    """Native chunk assignment; returns (chunk_id, sub, lane, nchunk) or None."""
    L = lib()
    if L is None:
        return None
    rows = np.ascontiguousarray(rows, dtype=np.uint32)
    cols = np.ascontiguousarray(cols, dtype=np.uint32)
    nnz = len(rows)
    chunk_id = np.empty(nnz, np.int64)
    sub = np.empty(nnz, np.int32)
    lane = np.empty(nnz, np.int32)
    nchunk = L.glt_pack_assign(
        _u32p(rows), _u32p(cols), nnz, nct,
        chunk_id.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        sub.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        lane.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if nchunk < 0:
        return None
    return chunk_id, sub, lane, int(nchunk)


def csr2csc_native(indptr, indices, data, num_rows, num_cols):
    """Native CSR->CSC; returns (indptr, rows, data) or None."""
    L = lib()
    if L is None:
        return None
    indptr = np.ascontiguousarray(indptr, np.uint32)
    indices = np.ascontiguousarray(indices, np.uint32)
    data = np.ascontiguousarray(data, np.float32)
    nnz = int(indptr[num_rows])
    indptr_out = np.empty(num_cols + 1, np.uint32)
    rows_out = np.empty(nnz, np.uint32)
    data_out = np.empty(nnz, np.float32)
    L.glt_csr2csc(_u32p(indptr), _u32p(indices),
                  data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                  num_rows, num_cols, _u32p(indptr_out), _u32p(rows_out),
                  data_out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return indptr_out, rows_out, data_out
