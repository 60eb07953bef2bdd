#!/usr/bin/env python
"""Decisive PERM-C vs free-deal A/B on real TPU: the SAME 3D-carry loop
(the bench/app-relevant path) through engines over both layouts,
interleaved min-of-N reps (single samples swing +/-4 ms with host stalls).

Modes compared: free-split, free-fused (production default), permc-split,
permc-fused. Correctness is cross-checked (allclose) before timing.

Usage: python tools/permc_ab.py [graph] [scale] [region_rows] [reps]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    graph = sys.argv[1] if len(sys.argv) > 1 else "pokec"
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    rr = (int(sys.argv[3]) if len(sys.argv) > 3
          and sys.argv[3] not in ("auto", "-") else None)
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 5

    import jax
    import jax.numpy as jnp
    from graphlily_tpu import ArithmeticSemiring, EngineConfig
    from graphlily_tpu.io import iccad_standin
    from graphlily_tpu.io.layout_cache import pack_cached
    from graphlily_tpu.ops.router_pallas import PlanarSpMV
    from bench import _prep, measure_floor

    config = EngineConfig(mxu_precision="default",
                          layout_cache=".layout_cache")
    csr = iccad_standin(graph, scale=scale, seed=1)
    work = _prep(csr, config, degree_sort=True)
    kw = {} if rr is None else {"region_rows": rr}
    lays = {}
    for deal in ("free", "permc"):
        t0 = time.perf_counter()
        lays[deal] = pack_cached("planar", work, config, log=print,
                                 deal=deal, **kw)
        lay = lays[deal]
        npieces = int((lay.rg[:, :lay.dstep, 1] > 0).sum())
        nfl = int((lay.c_code >= 0).sum())
        dep_mb = (lay.triples.nbytes if lay.triples is not None
                  else lay.planes.nbytes) / 1e6
        print(f"{deal}: pack {time.perf_counter()-t0:.0f}s rr="
              f"{lay.region_rows} nsteps={lay.nsteps} dstep={lay.dstep} "
              f"f={lay.f} pieces={npieces} flushes={nfl} "
              f"dep_stream={dep_mb:.0f}MB fill={lay.fill_stream:.2f} "
              f"slots={lay.num_slots}", flush=True)

    iters = 50
    n = lays["free"].num_rows
    engines = {}
    for deal in ("free", "permc"):
        for mode in ("split", "fused"):
            eng = PlanarSpMV(lays[deal], ArithmeticSemiring, config)
            auto = eng.fused
            eng.fused = mode == "fused"
            engines[f"{deal}-{mode}"] = eng
            if mode == "fused":
                print(f"{deal}: auto fused={auto} banks2={eng.banks2} "
                      f"looped={eng._looped}", flush=True)

    def make(e):
        @jax.jit
        def loop(arrays, x):
            def body(_i, v):
                return e(v, arrays=arrays, out_3d=True) + (0.1 / n)
            return jax.lax.fori_loop(0, iters, body, x)
        return loop

    loops = {k: make(e) for k, e in engines.items()}
    x0 = jnp.full((n // 1024, 8, 128), 1.0 / n, jnp.float32)
    outs = {}
    for k in loops:
        t0 = time.perf_counter()
        outs[k] = np.asarray(loops[k](engines[k].arrays, x0))
        assert np.isfinite(outs[k]).all(), k
        print(f"{k}: compiled+first in {time.perf_counter()-t0:.1f}s",
              flush=True)
    for k in outs:
        np.testing.assert_allclose(outs[k], outs["free-split"],
                                   rtol=2e-2, atol=1e-12, err_msg=k)
    print("all modes allclose", flush=True)
    floor = measure_floor(jax, jnp)
    print(f"floor {floor*1e3:.1f} ms", flush=True)

    samples = {k: [] for k in loops}
    for _ in range(reps):
        for k in loops:
            t0 = time.perf_counter()
            np.asarray(loops[k](engines[k].arrays, x0))
            samples[k].append((time.perf_counter() - t0 - floor) / iters)
    for k, ss in samples.items():
        ms = [f"{s*1e3:.2f}" for s in ss]
        print(f"{k}: min {min(ss)*1e3:.2f} ms  all [{', '.join(ms)}]",
              flush=True)


if __name__ == "__main__":
    main()
