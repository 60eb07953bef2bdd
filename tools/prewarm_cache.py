#!/usr/bin/env python
"""Pre-warm the layout disk cache for a full bench run.

Packing dominates the bench wall clock on this 1-vCPU host (1.5-17 min per
graph cold); this tool performs exactly the packs bench.py's sections will
request — SpMV engine layouts, the apps' relabeled/unit-weight/self-edge
variants, and the SpMSpV CSC twins — through the same pack_cached keys, on
the CPU backend (no TPU contention). A later bench run then loads every
layout in seconds.

Usage: python tools/prewarm_cache.py [graph ...]   (default: all six)
"""
import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np  # noqa: F401
    from graphlily_tpu import EngineConfig
    from graphlily_tpu.io import iccad_standin, ICCAD_GRAPHS
    from graphlily_tpu.io.layout_cache import pack_cached
    from graphlily_tpu.module.spmv_module import resolve_router_flavor
    from bench import _prep, feasible_sssp_scale

    config = EngineConfig(mxu_precision="default", sort_rows_by_degree=True,
                          layout_cache=".layout_cache")
    names = sys.argv[1:] or ["googleplus", "ogbl_ppa", "hollywood", "pokec",
                             "ogbn_products", "orkut"]

    def log(*a):
        print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

    for name in names:
        t0 = time.perf_counter()
        try:
            g = iccad_standin(name, scale=1.0, seed=0 if name == "googleplus"
                              else 1)
            log(f"== {name} nnz={g.nnz} ==")
            # ---- bench_spmv: router-flavor layout (+ chunked cross-check
            # on the primary graph) -----------------------------------------
            work = _prep(g, config, degree_sort=True)
            flavor = resolve_router_flavor(work)
            kw = ({"deal": config.planar_deal} if flavor == "planar" else {})
            pack_cached(flavor if flavor != "roll" else "router", work,
                        config, log=log, **kw)
            if name == "googleplus":
                pack_cached("chunked", work, config, log=log, pad_val=0.0)
            log(f"{name} spmv layout done ({time.perf_counter()-t0:.0f}s)")
            # ---- apps: PageRank / BFS / SSSP format through the real
            # modules (their relabel + weight transforms set the cache keys)
            from graphlily_tpu.apps import BFS, SSSP, PageRank
            pr = PageRank(config)
            pr.load_and_format_matrix(g, damping=0.9)
            del pr
            log(f"{name} pagerank done ({time.perf_counter()-t0:.0f}s)")
            bfs = BFS(config)
            bfs.load_and_format_matrix(g)
            del bfs
            log(f"{name} bfs done ({time.perf_counter()-t0:.0f}s)")
            sc, gs = feasible_sssp_scale(name, config)
            if gs is not None:
                ss = SSSP(config)
                ss.load_and_format_matrix(gs)
                del ss
                log(f"{name} sssp (scale {sc}) done "
                    f"({time.perf_counter()-t0:.0f}s)")
            # ---- SpMSpV sweep twin (primary graph only, like bench) --------
            if name == "googleplus":
                from graphlily_tpu import ArithmeticSemiring, MaskType
                from graphlily_tpu.io import csr2csc
                from graphlily_tpu.io.formatter import (
                    util_round_csr_matrix_dim)
                from graphlily_tpu.module import SpMSpVModule
                w2 = g.copy()
                util_round_csr_matrix_dim(w2, 1024, 1024)
                mod = SpMSpVModule(config)
                mod.set_semiring(ArithmeticSemiring)
                mod.set_mask_type(MaskType.NO_MASK)
                mod.load_and_format_matrix(csr2csc(w2))
                del mod
                log(f"{name} spmspv twin done ({time.perf_counter()-t0:.0f}s)")
        except Exception as e:
            log(f"{name} FAILED: {type(e).__name__}: {e}")
    log("prewarm complete")


if __name__ == "__main__":
    main()
