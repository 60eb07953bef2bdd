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
    srcs = [os.path.join(_HERE, f)
            for f in ("formatter.cpp", "planar_packer.cpp",
                      "tropical_split.cpp", "permc_greedy.cpp")]
    if not os.path.exists(_SO) or any(
            os.path.getmtime(_SO) < os.path.getmtime(s) for s in srcs):
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
    _i64p = ctypes.POINTER(ctypes.c_int64)
    _i8p = ctypes.POINTER(ctypes.c_int8)
    _i32p = ctypes.POINTER(ctypes.c_int32)
    _f32p = ctypes.POINTER(ctypes.c_float)
    L.glt_planar_plan.restype = ctypes.c_int64
    L.glt_planar_plan.argtypes = [
        _i64p, _i64p, _f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, _i64p, ctypes.c_int64]
    L.glt_planar_emit.restype = None
    L.glt_planar_emit.argtypes = [
        ctypes.c_int64, _i8p, _i8p, _f32p, _i32p, _i32p, _i8p, _i32p,
        _i8p, _i8p, _i64p, _i8p]
    L.glt_planar_abort.restype = None
    L.glt_planar_abort.argtypes = [ctypes.c_int64]
    L.glt_router_plan.restype = ctypes.c_int64
    L.glt_router_plan.argtypes = [
        _i64p, _i64p, _f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, _i64p]
    L.glt_router_emit.restype = None
    L.glt_router_emit.argtypes = [
        ctypes.c_int64, _i8p, _i8p, _f32p, _i32p, _i32p, _i32p,
        _i8p, _i8p, _i64p]
    L.glt_router_abort.restype = None
    L.glt_router_abort.argtypes = [ctypes.c_int64]
    L.glt_tsplit_plan.restype = ctypes.c_int64
    L.glt_tsplit_plan.argtypes = [
        _i32p, _i8p, _i8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        _i64p]
    L.glt_tsplit_emit.restype = None
    L.glt_tsplit_emit.argtypes = [
        ctypes.c_int64, _i32p, _i32p, _i8p, _i32p, _i8p, _i8p, _i8p]
    L.glt_tsplit_abort.restype = None
    L.glt_tsplit_abort.argtypes = [ctypes.c_int64]
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


def planar_pack_native(rr, cc, vv, nrows, ncols, region_rows, cb, hi_pad=0,
                       pad_val=0.0, deal="bucket"):
    """Native planar schedule build. Returns a dict of layout arrays + dims,
    or None (unavailable / unsupported shape -> numpy fallback). Arrays are
    bit-identical to io/planar_format.pack_planar's
    (tests/test_native_pack.py). `deal="free"` builds the chained-gather
    layout (a_sub table, empty xperm)."""
    L = lib()
    if L is None:
        return None
    free = deal == "free"
    rr = np.ascontiguousarray(rr, np.int64)
    cc = np.ascontiguousarray(cc, np.int64)
    vv = np.ascontiguousarray(vv, np.float32)
    nnz = len(rr)
    dims = np.zeros(12, np.int64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    h = L.glt_planar_plan(
        rr.ctypes.data_as(i64p), cc.ctypes.data_as(i64p),
        vv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nnz, nrows, ncols, region_rows, cb if cb else -1,
        dims.ctypes.data_as(i64p), 1 if free else 0)
    if h == 0:
        return None
    (nsteps, cbv, rstep, f, dmax, nregions, nca, ntiles, ncap,
     nca2, dstep, num_slots) = (int(v) for v in dims[:12])
    try:
        a_r = np.zeros((ncap, 8, 128), np.int8)
        xperm = np.zeros((0 if free else ntiles, 8, 8, 128), np.int8)
        a_sub = np.zeros((ncap, 8, 128), np.int8) if free else None
        a_vals = np.full((ncap, 8, 128), pad_val, np.float32)
        a_page = np.zeros(ncap, np.int32)
        rg = np.zeros((nsteps, rstep, 2), np.int32)
        planes = np.zeros((nsteps, dmax, 8, 128), np.int8)
        c_code = np.full(nsteps * f, -1, np.int32)
        c_hi = np.full((nsteps * f, 8, 128), hi_pad, np.int8)
        c_lo = np.zeros((nsteps * f, 8, 128), np.int8)
        el_slot = np.empty(nnz, np.int64)
    except MemoryError:
        L.glt_planar_abort(h)
        raise
    i8p = ctypes.POINTER(ctypes.c_int8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    L.glt_planar_emit(
        h, a_r.ctypes.data_as(i8p), xperm.ctypes.data_as(i8p),
        a_vals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        a_page.ctypes.data_as(i32p), rg.ctypes.data_as(i32p),
        planes.ctypes.data_as(i8p), c_code.ctypes.data_as(i32p),
        c_hi.ctypes.data_as(i8p), c_lo.ctypes.data_as(i8p),
        el_slot.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        a_sub.ctypes.data_as(i8p) if free else None)
    return dict(a_r=a_r, xperm=xperm, a_vals=a_vals, a_page=a_page, rg=rg,
                planes=planes, c_code=c_code, c_hi=c_hi, c_lo=c_lo,
                el_slot=el_slot, a_sub=a_sub, nsteps=nsteps, cb=cbv,
                rstep=rstep, f=f, dmax=dmax, num_regions=nregions, nca=nca,
                dstep=dstep, num_slots=num_slots)


def permc_pack_native(tile, rho, sig, row, region, lo, ntiles, nregions,
                      depth, chunk_of=None, nca_in=0, spill_cb=8):
    """Native PERM-C element-wise greedy (io/permc_format.py). Returns the
    same tuple as _greedy_permc_py (bit-identical,
    tests/test_native_pack.py) or None -> python fallback."""
    L = lib()
    if L is None or not hasattr(L, "glt_permc_greedy"):
        return None
    n = len(tile)
    i64 = lambda a: np.ascontiguousarray(a, np.int64)
    tile, rho, sig, row, region, lo = map(
        i64, (tile, rho, sig, row, region, lo))
    chunk_arr = (i64(chunk_of) if chunk_of is not None
                 else np.empty(0, np.int64))
    a_chunk = np.empty(n, np.int64)
    sub_of = np.empty(n, np.int64)
    cyc_of = np.empty(n, np.int64)
    pos_of = np.empty(n, np.int64)
    # worst-case event bounds: one flush per element + depth drains/region
    fl_cap = n + 1
    fl_chunk = np.empty(fl_cap, np.int64)
    fl_region = np.empty(fl_cap, np.int64)
    fl_cycle = np.empty(fl_cap, np.int64)
    dr_cap = nregions * depth + 1
    dr_region = np.empty(dr_cap, np.int64)
    dr_cycle = np.empty(dr_cap, np.int64)
    counts = np.zeros(3, np.int64)   # nca, nf, ndrain
    i64p = ctypes.POINTER(ctypes.c_int64)
    p = lambda a: a.ctypes.data_as(i64p)
    ok = L.glt_permc_greedy(
        p(tile), p(rho), p(sig), p(row), p(region), p(lo),
        ctypes.c_int64(n), ctypes.c_int64(ntiles),
        ctypes.c_int64(nregions), ctypes.c_int64(depth),
        p(chunk_arr) if chunk_of is not None else None,
        ctypes.c_int64(nca_in), ctypes.c_int64(spill_cb),
        p(a_chunk), p(sub_of), p(cyc_of), p(pos_of),
        p(fl_chunk), p(fl_region), p(fl_cycle),
        p(dr_region), p(dr_cycle), p(counts))
    if not ok:
        return None
    nca, nf, ndr = (int(v) for v in counts)
    return (a_chunk, sub_of, cyc_of, pos_of, max(nca, 1),
            fl_chunk[:nf], fl_region[:nf], fl_cycle[:nf],
            dr_region[:ndr], dr_cycle[:ndr])


def router_pack_native(rr, cc, vv, nrows, ncols, region_rows, cb):
    """Native router schedule build (bit-identical to pack_router's arrays);
    returns a dict or None (-> numpy fallback)."""
    L = lib()
    if L is None:
        return None
    rr = np.ascontiguousarray(rr, np.int64)
    cc = np.ascontiguousarray(cc, np.int64)
    vv = np.ascontiguousarray(vv, np.float32)
    nnz = len(rr)
    dims = np.zeros(10, np.int64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    h = L.glt_router_plan(
        rr.ctypes.data_as(i64p), cc.ctypes.data_as(i64p),
        vv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nnz, nrows, ncols, region_rows, cb, dims.ctypes.data_as(i64p))
    if h == 0:
        return None
    (nsteps, cbv, rstep, f, nregions, nca, ncap, _,
     dstep, num_slots) = (int(v) for v in dims)
    try:
        a_r = np.zeros((ncap, 8, 128), np.int8)
        a_sub = np.zeros((ncap, 8, 128), np.int8)
        a_vals = np.zeros((ncap, 8, 128), np.float32)
        a_page = np.zeros(ncap, np.int32)
        rg = np.zeros((nsteps, rstep, 2), np.int32)
        c_code = np.full(nsteps * f, -1, np.int32)
        c_hi = np.zeros((nsteps * f, 8, 128), np.int8)
        c_lo = np.zeros((nsteps * f, 8, 128), np.int8)
        el_slot = np.empty(nnz, np.int64)
    except MemoryError:
        L.glt_router_abort(h)
        raise
    i8p = ctypes.POINTER(ctypes.c_int8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    L.glt_router_emit(
        h, a_r.ctypes.data_as(i8p), a_sub.ctypes.data_as(i8p),
        a_vals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        a_page.ctypes.data_as(i32p), rg.ctypes.data_as(i32p),
        c_code.ctypes.data_as(i32p), c_hi.ctypes.data_as(i8p),
        c_lo.ctypes.data_as(i8p),
        el_slot.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return dict(a_r=a_r, a_sub=a_sub, a_vals=a_vals, a_page=a_page, rg=rg,
                c_code=c_code, c_hi=c_hi, c_lo=c_lo, el_slot=el_slot,
                nsteps=nsteps, cb=cbv, rstep=rstep, f=f,
                num_regions=nregions, nca=nca,
                dstep=dstep, num_slots=num_slots)


def tropical_split_native(c_code, c_hi, c_lo, R, kb):
    """Native tropical split/reduce schedule build over a planar layout's
    structure streams. Returns the build_split_schedule array dict (minus
    fill2/num_windows, which the caller derives) or None -> numpy fallback.
    Bit-identical to io/tropical_format.build_split_schedule
    (tests/test_native_pack.py)."""
    L = lib()
    if L is None:
        return None
    c_code = np.ascontiguousarray(c_code, np.int32)
    c_hi = np.ascontiguousarray(c_hi, np.int8)
    c_lo = np.ascontiguousarray(c_lo, np.int8)
    nc = len(c_code)
    dims = np.zeros(8, np.int64)
    i8p = ctypes.POINTER(ctypes.c_int8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    h = L.glt_tsplit_plan(
        c_code.ctypes.data_as(i32p), c_hi.ctypes.data_as(i8p),
        c_lo.ctypes.data_as(i8p), nc, R, kb, dims.ctypes.data_as(i64p))
    if h == 0:
        return None
    (n_in, nsteps2, rstep2, f2, dmax2, _nel,
     dstep2, num_slots2) = (int(v) for v in dims[:8])
    n_out = nsteps2 * f2
    try:
        in_order = np.zeros(nsteps2 * kb, np.int32)
        rg2 = np.zeros((nsteps2, rstep2, 2), np.int32)
        planes2 = np.zeros((nsteps2, dmax2, 8, 128), np.int8)
        c_win = np.full(n_out, -1, np.int32)
        sort2 = np.zeros((n_out, 8, 128), np.int8)
        rowids = np.full((n_out, 8, 128), 127, np.int8)
        inv2 = np.zeros((n_out, 8, 128), np.int8)
    except MemoryError:
        L.glt_tsplit_abort(h)
        raise
    L.glt_tsplit_emit(
        h, in_order.ctypes.data_as(i32p), rg2.ctypes.data_as(i32p),
        planes2.ctypes.data_as(i8p), c_win.ctypes.data_as(i32p),
        sort2.ctypes.data_as(i8p), rowids.ctypes.data_as(i8p),
        inv2.ctypes.data_as(i8p))
    return dict(in_order=in_order, rg2=rg2, planes2=planes2, c_win=c_win,
                sort2=sort2, rowids=rowids, inv2=inv2,
                kb=kb, rstep2=rstep2, f2=f2, dmax2=dmax2, nsteps2=nsteps2,
                dstep2=dstep2, num_slots2=num_slots2)


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
