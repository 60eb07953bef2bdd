#!/usr/bin/env python
"""Tropical engine on the real TPU: Mosaic-compiled correctness vs the f64
oracle + on-device timing vs the chunked tropical kernel.

Usage: python tools/tropical_tpu_check.py [nrows nnz [iters]]
Defaults exercise a mid-size graph; pass pokec-class dims for scale checks.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np


def main():
    nrows = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    nnz = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    import jax
    import jax.numpy as jnp
    from graphlily_tpu import EngineConfig, TropicalSemiring
    from graphlily_tpu.io import rmat_csr, util_round_csr_matrix_dim
    from graphlily_tpu.io.tropical_format import pack_tropical
    from graphlily_tpu.ops.tropical_pallas import TropicalSpMV
    from graphlily_tpu.semiring import FLOAT_INF

    config = EngineConfig(sort_rows_by_degree=True)
    print(f"graph: {nrows} rows, {nnz} nnz; backend "
          f"{jax.devices()[0].platform}", flush=True)
    csr = rmat_csr(num_rows=nrows, nnz=nnz, seed=3)
    csr.adj_data[:csr.nnz] = np.abs(csr.adj_data[:csr.nnz])
    if config.sort_rows_by_degree:   # what the apps do (_maybe_relabel)
        from graphlily_tpu.io.formatter import (symmetric_permute,
                                                degree_sort_permutation)
        csr = symmetric_permute(csr, degree_sort_permutation(csr))

    t0 = time.perf_counter()
    lay = pack_tropical(csr, config)
    print(f"pack: {time.perf_counter() - t0:.1f}s  mem={lay.mem_bytes/1e9:.2f}"
          f" GB  fill1={lay.planar.fill_stream:.2%} fill2={lay.fill2:.2%}"
          f"  nsteps2={lay.nsteps2} rstep2={lay.rstep2} f2={lay.f2}"
          f" dmax2={lay.dmax2}", flush=True)
    eng = TropicalSpMV(lay, TropicalSemiring, config)

    rng = np.random.default_rng(11)
    x = (rng.random(lay.num_cols) * 100).astype(np.float32)
    x[rng.random(lay.num_cols) < 0.2] = float(FLOAT_INF)

    # oracle
    work = csr.copy()
    util_round_csr_matrix_dim(work, 1024, 1024)
    rr = work.row_ids().astype(np.int64)
    cc = work.adj_indices[:work.nnz].astype(np.int64)
    vv = work.adj_data[:work.nnz].astype(np.float64)
    want = np.full(work.num_rows, float(FLOAT_INF))
    np.minimum.at(want, rr, np.minimum(vv + x[cc], float(FLOAT_INF)))

    fwd = jax.jit(lambda a, v: eng(v, arrays=a))
    t0 = time.perf_counter()
    y = np.asarray(fwd(eng.arrays, jnp.asarray(x)))
    print(f"compile+run: {time.perf_counter() - t0:.1f}s", flush=True)
    bad = np.abs(y - want.astype(np.float32))
    rel = bad / np.maximum(np.abs(want), 1.0)
    print(f"max rel err vs f64 oracle: {rel.max():.3e}  "
          f"(exact-match frac {(y == want.astype(np.float32)).mean():.4f})",
          flush=True)
    assert rel.max() < 1e-6, "tropical engine WRONG on TPU"

    # on-device timing loop (carry-dependent)
    n = lay.num_rows

    @jax.jit
    def loop(arrays, v):
        def body(_i, vv_):
            return eng(vv_, arrays=arrays, out_3d=True) + (0.1 / n)
        return jax.lax.fori_loop(0, iters, body, v)

    x3 = jnp.asarray(x.reshape(-1, 8, 128))
    out = np.asarray(loop(eng.arrays, x3))
    assert np.isfinite(out).all()
    f = jax.jit(lambda v: v[:8].sum())
    vsm = jnp.ones(128)
    np.asarray(f(vsm))
    t0 = time.perf_counter()
    for _ in range(4):
        np.asarray(f(vsm))
    floor = (time.perf_counter() - t0) / 4
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = np.asarray(loop(eng.arrays, x3))
    dt = max((time.perf_counter() - t0) / reps - floor, 1e-9) / iters
    print(f"tropical engine: {dt*1e3:.3f} ms/SpMV  "
          f"{csr.nnz/dt/1e9:.3f} GTEPS", flush=True)

    # chunked comparison when feasible
    from graphlily_tpu.io.formatter import (estimate_chunk_layout_gb,
                                            pack_csr_chunks)
    if estimate_chunk_layout_gb(csr) <= 2.0 and nrows <= 700_000:
        from graphlily_tpu.ops.spmv_pallas import PallasSpMV
        work2 = csr.copy()
        util_round_csr_matrix_dim(work2, 1024, 1024)
        lay_c = pack_csr_chunks(work2, config, pad_val=float(FLOAT_INF))
        eng_c = PallasSpMV(lay_c, TropicalSemiring, config)

        @jax.jit
        def loop_c(arrays, v):
            def body(_i, vv_):
                return eng_c(vv_, arrays=arrays) + (0.1 / n)
            return jax.lax.fori_loop(0, iters, body, v)

        x1 = jnp.asarray(x)
        out = np.asarray(loop_c(eng_c.arrays, x1))
        assert np.isfinite(out).all()
        t0 = time.perf_counter()
        for _ in range(reps):
            out = np.asarray(loop_c(eng_c.arrays, x1))
        dt_c = max((time.perf_counter() - t0) / reps - floor, 1e-9) / iters
        print(f"chunked tropical: {dt_c*1e3:.3f} ms/SpMV  "
              f"{csr.nnz/dt_c/1e9:.3f} GTEPS", flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    main()
