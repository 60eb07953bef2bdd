#!/usr/bin/env python
"""Per-phase timing of the tropical engine pipeline on TPU.

Times four nested prefixes of TropicalSpMV.__call__ as separate on-device
loops: (1) xperm+pass-1 scatter, (2) +stream gather, (3) +window split,
(4) full (+window reduce + decode). Differences attribute the cost.

Usage: python tools/tropical_phases.py [nrows nnz [iters [region_rows [kb]]]]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np


def main():
    nrows = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    nnz = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    region_rows = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    kb = int(sys.argv[5]) if len(sys.argv) > 5 else 16

    import jax
    import jax.numpy as jnp
    from graphlily_tpu import EngineConfig, TropicalSemiring
    from graphlily_tpu.io import rmat_csr
    from graphlily_tpu.io.formatter import (symmetric_permute,
                                            degree_sort_permutation)
    from graphlily_tpu.io.tropical_format import pack_tropical
    from graphlily_tpu.ops.tropical_pallas import (TropicalSpMV, _split_call,
                                                   _window_reduce_call, S, L)
    from graphlily_tpu.ops.router_pallas import (_planar_scatter_call,
                                                 _xperm_call)
    from graphlily_tpu.semiring import FLOAT_INF

    config = EngineConfig(sort_rows_by_degree=True)
    csr = rmat_csr(num_rows=nrows, nnz=nnz, seed=3)
    csr.adj_data[:csr.nnz] = np.abs(csr.adj_data[:csr.nnz])
    csr = symmetric_permute(csr, degree_sort_permutation(csr))
    t0 = time.perf_counter()
    lay = pack_tropical(csr, config,
                        region_rows=region_rows or None, kb=kb)
    eng = TropicalSpMV(lay, TropicalSemiring, config)
    p = lay.planar
    print(f"pack {time.perf_counter()-t0:.0f}s rr={p.region_rows} kb={kb} "
          f"fill1={p.fill_stream:.2%} fill2={lay.fill2:.2%} "
          f"nsteps1={p.nsteps} rstep1={p.rstep} f1={p.f} dmax1={p.dmax} "
          f"nsteps2={lay.nsteps2} rstep2={lay.rstep2} f2={lay.f2} "
          f"dmax2={lay.dmax2} mem={lay.mem_bytes/1e9:.2f}GB", flush=True)

    interp = config.resolve_interpret()
    nct = p.num_col_tiles

    def stage1(a, x3):
        x2 = _xperm_call(a.xperm, x3, nct=nct, interpret=interp,
                         dtype=x3.dtype)
        return _planar_scatter_call(a.a_page, a.a_r, a.a_vals, a.rg,
                                    a.planes, x2, **eng._static_scatter)

    def stage2(a, x3):
        g1 = stage1(a, x3).reshape(p.nsteps * p.f, S, L)
        return jnp.take(g1, a.in_order.reshape(-1), axis=0).reshape(
            lay.nsteps2, lay.kb, S, L)

    def stage3(a, x3):
        return _split_call(a.rg2, stage2(a, x3), a.planes2,
                           **eng._static_split)

    def full(a, x3):
        return eng(x3, arrays=a, out_3d=True)

    # carry-dependent loops: fold a slice of the stage output back into x
    def probe(stage, name, project):
        @jax.jit
        def loop(a, x3):
            def body(_i, x_):
                out = stage(a, x_)
                return x_ + project(out)
            return jax.lax.fori_loop(0, iters, body, x3)

        rng = np.random.default_rng(11)
        x = (rng.random(lay.num_cols) * 100).astype(np.float32)
        x3 = jnp.asarray(x.reshape(-1, S, L))
        t0 = time.perf_counter()
        out = np.asarray(loop(eng.arrays, x3))
        tc = time.perf_counter() - t0
        assert np.isfinite(out).all()
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            np.asarray(loop(eng.arrays, x3))
        dt = (time.perf_counter() - t0) / reps / iters
        print(f"{name}: {dt*1e3:.3f} ms  (compile+first {tc:.0f}s)",
              flush=True)
        return dt

    ntile = lay.num_cols // 1024
    z = jnp.float32(0)

    # cast int streams to f32 BEFORE the *0: XLA folds int*0 to 0 (DCE of
    # the whole stage) but cannot fold f32*0 (inf/nan)
    t1 = probe(stage1, "xperm+scatter  ",
               lambda o: (o.reshape(-1)[:1].astype(jnp.float32) * z
                          ).reshape(1, 1, 1))
    t2 = probe(stage2, "+stream gather ",
               lambda o: (o.reshape(-1)[:1].astype(jnp.float32) * z
                          ).reshape(1, 1, 1))
    t3 = probe(stage3, "+window split  ",
               lambda o: (o.reshape(-1)[:1].astype(jnp.float32) * z
                          ).reshape(1, 1, 1))
    t4 = probe(full, "full pipeline  ", lambda o: o[:ntile] * z)
    print(f"deltas: scatter={t1*1e3:.2f} gather={(t2-t1)*1e3:.2f} "
          f"split={(t3-t2)*1e3:.2f} reduce+decode={(t4-t3)*1e3:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
