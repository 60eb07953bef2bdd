#!/usr/bin/env python
"""Planar-router phase profile on real TPU.

Times, per phase, on a full-scale graph (default pokec — the planar perf
target): xperm pre-pass, scatter (A+B), full split pipeline (reduce by
subtraction), and scatter with all descriptors inactive (phase A + loop
overhead; the difference is the deposit/flush cost). Each measurement is an
on-device lax.fori_loop with a carry dependence (LICM otherwise hoists the
body) minus the measured dispatch floor.

Usage: python tools/planar_profile.py [graph] [scale] [region_rows] [mode]
mode: auto (default) | fused | split — force the execution mode for A/B.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    graph = sys.argv[1] if len(sys.argv) > 1 else "pokec"
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    region_rows = (int(sys.argv[3]) if len(sys.argv) > 3
                   and sys.argv[3] not in ("auto", "-") else None)
    mode = sys.argv[4] if len(sys.argv) > 4 else "auto"

    import jax
    import jax.numpy as jnp
    from graphlily_tpu import ArithmeticSemiring, EngineConfig
    from graphlily_tpu.io import iccad_standin
    from graphlily_tpu.io.layout_cache import pack_cached
    from graphlily_tpu.ops.router_pallas import PlanarSpMV
    from bench import _prep, measure_floor

    config = EngineConfig(mxu_precision="default", layout_cache=".layout_cache")
    print(f"graph={graph} scale={scale}", flush=True)
    csr = iccad_standin(graph, scale=scale, seed=1)
    dsort = not (len(sys.argv) > 5 and sys.argv[5] == "nosort")
    work = _prep(csr, config, degree_sort=dsort)
    print(f"degree_sort={dsort}", flush=True)
    t0 = time.perf_counter()
    kw = {} if region_rows is None else {"region_rows": region_rows}
    lay = pack_cached("planar", work, config, log=print, **kw)
    print(f"pack/load: {time.perf_counter()-t0:.1f}s nsteps={lay.nsteps} "
          f"rstep={lay.rstep} f={lay.f} cb={lay.cb} "
          f"region_rows={lay.region_rows} fill_a={lay.fill_a:.3f} "
          f"fill_stream={lay.fill_stream:.3f} mem={lay.mem_bytes/1e9:.2f}GB",
          flush=True)
    eng = PlanarSpMV(lay, ArithmeticSemiring, config)
    if mode != "auto":
        eng.fused = mode == "fused"
    print(f"fused={eng.fused}", flush=True)
    n = lay.num_rows

    # correctness spot-check vs host oracle (padded dims)
    rng_ = np.random.default_rng(5)
    xc = rng_.random(lay.num_cols).astype(np.float32)
    y = np.asarray(eng(jnp.asarray(xc)))
    rr_ = work.row_ids().astype(np.int64)
    cc_ = work.adj_indices[:work.nnz].astype(np.int64)
    want = np.zeros(lay.num_rows)
    np.add.at(want, rr_, work.adj_data[:work.nnz].astype(np.float64)
              * xc[cc_])
    err = np.max(np.abs(y - want) / np.maximum(np.abs(want), 1e-3))
    print(f"oracle max rel err: {err:.2e}", flush=True)
    assert err < 3e-2, "planar kernel wrong on TPU"

    x0 = jnp.full(n, 1.0 / n, jnp.float32)
    floor = measure_floor(jax, jnp)
    print(f"dispatch floor: {floor*1e3:.1f} ms", flush=True)

    iters = 20

    def timeit(name, fn, *args):
        f = jax.jit(fn)
        np.asarray(f(*args))
        t0 = time.perf_counter()
        out = np.asarray(f(*args))
        dt = (time.perf_counter() - t0 - floor) / iters
        print(f"{name:28s} {dt*1e3:8.3f} ms", flush=True)
        return dt

    a = eng.arrays

    # NB: every loop takes the arrays pytree as a jit ARGUMENT — closure
    # capture would serialize ~1 GB of streams into HLO constants (the
    # remote compiler rejects large payloads with HTTP 413)
    npad = lay.num_col_tiles * 1024
    xp = jnp.zeros(npad, jnp.float32).at[:n].set(x0)

    # -1) bare 1D -> (nct,8,128) reshape (relayout cost shared by every
    # engine's x ingestion)
    def loop_reshape(ar, x):
        def body(_i, v):
            x2 = v.reshape(lay.num_col_tiles, 8, 128) + 0.0
            return v.at[0].add(x2[0, 0, 0] * 1e-20)
        return jax.lax.fori_loop(0, iters, body, x)

    timeit("reshape (nct,8,128)", loop_reshape, a, xp)

    # 0) xperm pre-pass only
    def loop_xperm(ar, x):
        def body(_i, v):
            x2 = eng._x2(v, ar)
            return v.at[0].add(x2[0, 0, 0] * 1e-20)
        return jax.lax.fori_loop(0, iters, body, x)

    t_xperm = timeit("xperm", loop_xperm, a, xp)

    # 1) scatter (xperm + A + B)
    def loop_scatter(ar, x):
        def body(_i, v):
            g = eng.scatter(v, arrays=ar)
            return v.at[0].add(g[0, 0, 0, 0] * 1e-20)
        return jax.lax.fori_loop(0, iters, body, x)

    t_scatter = timeit("scatter (xperm+A+B)", loop_scatter, a, xp)

    # 2) scatter with ALL descriptors inactive -> xperm + A + unrolled loop
    import copy
    a_dead = copy.copy(a)
    a_dead.rg = jnp.zeros_like(a.rg)
    t_dead = timeit("scatter, no deposits", loop_scatter, a_dead, xp)

    # 3) deposits only (flush slots deactivated): isolates flush-copy cost
    rg_np = np.asarray(a.rg)          # flat (nsteps, 1, 2*rstep)
    keep = np.repeat(rg_np[:, :, 1::2] > 0, 2, axis=2)
    rg_dep = np.where(keep, rg_np, 0)
    a_dep = copy.copy(a)
    a_dep.rg = jnp.asarray(rg_dep)
    t_dep = timeit("scatter, deposits only", loop_scatter, a_dep, xp)

    # 4) full pipeline, 1D carry (pays the 1D<->tiled relayouts)
    def loop_full(ar, x):
        def body(_i, v):
            y = eng(v[:npad], arrays=ar)
            return v.at[:n].set(y[:n] * 1e-20 + v[:n])
        return jax.lax.fori_loop(0, iters, body, x)

    t_full = timeit("full (1D carry)", loop_full, a, xp)

    # 5) full pipeline, 3D carry (free in/out views)
    def loop_full3(ar, x):
        def body(_i, v):
            y = eng(v, arrays=ar, out_3d=True)
            return y * 1e-20 + v
        return jax.lax.fori_loop(0, iters, body, x)

    x3 = xp.reshape(lay.num_col_tiles, 8, 128)
    t_full3 = timeit("full (3D carry)", loop_full3, a, x3)

    nd = int((rg_np[:, :, 1] > 0).sum())
    nf = int((rg_np[:, :, 1] < 0).sum())
    print(f"\nbreakdown: xperm {t_xperm*1e3:.2f} | A+loop "
          f"{(t_dead - t_xperm)*1e3:.2f} | deposits({nd}) "
          f"{(t_dep - t_dead)*1e3:.2f} | flush-copy({nf}) "
          f"{(t_scatter - t_dep)*1e3:.2f} | reduce "
          f"{(t_full - t_scatter)*1e3:.2f} ms", flush=True)
    print(f"per-deposit: {(t_dep - t_dead)/max(nd,1)*1e9:.1f} ns; "
          f"per-flush-copy: {(t_scatter - t_dep)/max(nf,1)*1e9:.1f} ns; "
          f"per-flush-reduce: {(t_full - t_scatter)/max(nf,1)*1e9:.1f} ns",
          flush=True)


if __name__ == "__main__":
    main()
