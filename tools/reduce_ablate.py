#!/usr/bin/env python
"""Phase-C attribution on real TPU: is the one-hot reduce MXU-dot-bound or
VPU-build-bound?

Runs the SPLIT reduce kernel alone on a fixed scatter output, under the
ablation knobs:
  full      — builds + dots + output RMW (production)
  nobuilds  — dots only (loop-invariant one-hots): isolates the MXU MACs
  nodots    — builds only (DCE-proofed): isolates the VPU compare volume
  noacc     — builds + dots, tiny static RMW: isolates the dynamic-index
              output accumulate

The answer picks the round-3 replacement scheme: MXU-bound -> cut MACs
(two-level factorization / window-pure chunks); VPU-bound -> pack-time
indicator planes / cheaper builds.

Usage: python tools/reduce_ablate.py [graph] [scale] [region_rows]
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

    import jax
    import jax.numpy as jnp
    from graphlily_tpu import ArithmeticSemiring, EngineConfig
    from graphlily_tpu.io import iccad_standin
    from graphlily_tpu.io.layout_cache import pack_cached
    from graphlily_tpu.ops.router_pallas import (PlanarSpMV,
                                                 _router_reduce_call)
    from bench import _prep, measure_floor

    config = EngineConfig(mxu_precision="default",
                          layout_cache=".layout_cache")
    csr = iccad_standin(graph, scale=scale, seed=1)
    work = _prep(csr, config, degree_sort=True)
    kw = {} if region_rows is None else {"region_rows": region_rows}
    lay = pack_cached("planar", work, config, log=print, **kw)
    eng = PlanarSpMV(lay, ArithmeticSemiring, config)
    nflush = int(np.asarray(lay.c_code >= 0).sum())
    print(f"{graph} s{scale} rr={lay.region_rows} nsteps={lay.nsteps} "
          f"f={lay.f} rh={lay.region_rows // 128} active_flushes={nflush}",
          flush=True)

    a = eng.arrays
    n = lay.num_rows
    x3 = jnp.full((lay.num_col_tiles, 8, 128), 1.0 / n, jnp.float32)
    g = jax.jit(lambda ar, x: eng.scatter(x, arrays=ar))(a, x3)
    g = jax.block_until_ready(g)
    floor = measure_floor(jax, jnp)
    print(f"floor {floor * 1e3:.2f} ms", flush=True)

    iters = 20
    static = dict(eng._static_reduce)

    results = {}
    for ablate in ("full", "nobuilds", "nodots", "noacc"):
        ab = "" if ablate == "full" else ablate

        def loop(code, gg, hi, lo):
            def body(_i, carry):
                # carry feeds an INPUT: without this XLA hoists the whole
                # (loop-invariant) reduce out of the loop and the timing
                # divides one reduce by `iters`
                g2 = gg.at[0, 0, 0, 0].add(carry.astype(gg.dtype) * 1e-20)
                blocks = _router_reduce_call(code, g2, hi, lo,
                                             ablate=ab, **static)
                return carry + blocks[0, 0, 0] * 1e-20
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        f = jax.jit(loop)
        t0 = time.perf_counter()
        np.asarray(f(a.c_code, g, a.c_hi, a.c_lo))
        print(f"{ablate}: compiled+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(a.c_code, g, a.c_hi, a.c_lo))
            best = min(best, (time.perf_counter() - t0 - floor) / iters)
        results[ablate] = best
        print(f"{ablate:9s} {best * 1e3:8.3f} ms "
              f"({best / max(nflush, 1) * 1e9:6.1f} ns/flush)", flush=True)

    full = results["full"]
    print(f"\nattribution: dots-only {results['nobuilds'] / full:.0%} of "
          f"full, builds-only {results['nodots'] / full:.0%}, "
          f"no-RMW {results['noacc'] / full:.0%}", flush=True)


if __name__ == "__main__":
    main()
