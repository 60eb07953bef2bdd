#!/usr/bin/env python
"""Kernel A/B harness: pack the primary benchmark graph once (cached to
/tmp/glt_ab_cache.npz), then time resident-kernel variants in one process
with the reliable fori-100 on-device methodology.

Usage: python tools/kernel_ab.py [CB ...]   (default: 8 16 32)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

CACHE = "/tmp/glt_ab_cache.npz"


def get_layout():
    from graphlily_tpu.io import rmat_csr
    from graphlily_tpu.io.formatter import (pack_csr_chunks, symmetric_permute,
                                            degree_sort_permutation,
                                            util_round_csr_matrix_dim,
                                            util_normalize_csr_matrix_by_outdegree)
    from graphlily_tpu.io.formatter import ChunkedSpMVLayout
    from graphlily_tpu.config import EngineConfig
    if os.path.exists(CACHE):
        f = np.load(CACHE)
        return ChunkedSpMVLayout(
            r=f["r"], rows=f["rows"], vals=f["vals"], code=f["code"],
            num_rows=int(f["num_rows"]), num_cols=int(f["num_cols"]),
            nnz=int(f["nnz"]), num_col_tiles=int(f["nct"]),
            num_window_groups=int(f["nwgrp"]), row_window=128, col_tile=1024,
            fill=float(f["fill"]))
    csr = rmat_csr(107614, 13673453, seed=0)
    work = symmetric_permute(csr, degree_sort_permutation(csr))
    util_round_csr_matrix_dim(work, 1024, 1024)
    util_normalize_csr_matrix_by_outdegree(work)
    work.adj_data = work.adj_data * 0.9
    lay = pack_csr_chunks(work, EngineConfig(), pad_val=0.0)
    np.savez(CACHE, r=lay.r, rows=lay.rows, vals=lay.vals, code=lay.code,
             num_rows=lay.num_rows, num_cols=lay.num_cols, nnz=lay.nnz,
             nct=lay.num_col_tiles, nwgrp=lay.num_window_groups, fill=lay.fill)
    return lay


def main():
    cbs = [int(a) for a in sys.argv[1:]] or [8, 16, 32]
    t0 = time.perf_counter()
    lay = get_layout()
    print(f"layout ready {time.perf_counter()-t0:.1f}s chunks={lay.num_chunks} "
          f"fill={lay.fill:.2%}", flush=True)

    import jax
    import jax.numpy as jnp
    import graphlily_tpu.ops.spmv_pallas as sp
    from graphlily_tpu.ops.spmv_pallas import _spmv_resident_call

    n = lay.num_rows
    x0 = jnp.full(n, 1.0 / n, jnp.float32)
    code = jnp.asarray(lay.code)
    r = jnp.asarray(lay.r)
    rows = jnp.asarray(lay.rows)
    vals = jnp.asarray(lay.vals)
    x2s = 1  # reshape inside

    _f = jax.jit(lambda v: v[:8].sum())
    _v = jnp.ones(128)
    for _ in range(2):
        np.asarray(_f(_v))
    t0 = time.perf_counter()
    for _ in range(4):
        np.asarray(_f(_v))
    floor = (time.perf_counter() - t0) / 4

    iters = 100
    for cb in cbs:
        sp.CB = cb
        nc = lay.num_chunks
        pad = (-nc) % cb
        codep = jnp.asarray(np.concatenate(
            [lay.code, np.full(pad, lay.code[-1], lay.code.dtype)]))
        def padA(a, fill=0):
            if pad == 0:
                return jnp.asarray(a)
            f_ = np.full((pad,) + a.shape[1:], fill, a.dtype)
            return jnp.asarray(np.concatenate([a, f_]))
        rp, rowsp, valsp = padA(lay.r), padA(lay.rows), padA(lay.vals)
        static = dict(nct=lay.num_col_tiles, nwgrp=lay.num_window_groups,
                      nchunk=nc + pad, op=0, mxu_precision="default",
                      zero=0.0, interpret=False, reduce_mode="mxu",
                      dtype="float32")

        @jax.jit
        def loop(code_, r_, rows_, vals_, x):
            def body(_i, v):
                out = _spmv_resident_call(
                    code_, r_, rows_, vals_, None,
                    v.reshape(lay.num_col_tiles, 8, 128), **static)
                return out.reshape(n) + (0.1 / n)
            return jax.lax.fori_loop(0, iters, body, x)

        try:
            out = np.asarray(loop(codep, rp, rowsp, valsp, x0))
            assert np.isfinite(out).all()
            t0 = time.perf_counter()
            for _ in range(3):
                np.asarray(loop(codep, rp, rowsp, valsp, x0))
            dt = ((time.perf_counter() - t0) / 3 - floor) / iters
            print(f"CB={cb:3d}: {dt*1e3:7.3f} ms/SpMV  "
                  f"{lay.nnz/dt/1e9:6.3f} GTEPS", flush=True)
        except Exception as e:
            print(f"CB={cb:3d}: FAIL {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
