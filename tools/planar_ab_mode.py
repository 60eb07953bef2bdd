#!/usr/bin/env python
"""Decisive fused-vs-split A/B for the planar engine on real TPU.

Interleaved reps of the SAME 3D-carry loop (the bench/app-relevant path)
through two engines over one cached layout — single-sample mode timings in
planar_profile.py swing +/-4 ms with host stalls; min-of-N interleaved reps
is robust to them.

Usage: python tools/planar_ab_mode.py [graph] [scale] [region_rows]
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
    lay = pack_cached("planar", work, config, log=print, **kw)
    print(f"{graph} s{scale} rr={lay.region_rows} nsteps={lay.nsteps} "
          f"num_slots={lay.num_slots}", flush=True)

    iters = 50
    n = lay.num_rows
    engines = {}
    for mode in ("split", "fused"):
        eng = PlanarSpMV(lay, ArithmeticSemiring, config)
        eng.fused = mode == "fused"
        engines[mode] = eng
    print(f"auto-select would pick fused={PlanarSpMV(lay, ArithmeticSemiring, config).fused} "
          f"banks2={engines['fused'].banks2}", flush=True)

    loops = {}
    for mode, eng in engines.items():
        def make(e):
            @jax.jit
            def loop(arrays, x):
                def body(_i, v):
                    return e(v, arrays=arrays, out_3d=True) + (0.1 / n)
                return jax.lax.fori_loop(0, iters, body, x)
            return loop
        loops[mode] = make(eng)

    x0 = jnp.full((n // 1024, 8, 128), 1.0 / n, jnp.float32)
    outs = {}
    for mode in ("split", "fused"):
        t0 = time.perf_counter()
        outs[mode] = np.asarray(loops[mode](engines[mode].arrays, x0))
        assert np.isfinite(outs[mode]).all()
        print(f"{mode}: compiled+first in {time.perf_counter()-t0:.1f}s",
              flush=True)
    # a fused miscompile (the risk of running >16 MiB scoped VMEM) must not
    # win the timing on finite-but-wrong numbers
    np.testing.assert_allclose(outs["fused"], outs["split"],
                               rtol=1e-2, atol=1e-12)
    print("fused == split (allclose)", flush=True)
    floor = measure_floor(jax, jnp)  # min-of-6 (see bench.measure_floor)
    print(f"floor {floor*1e3:.1f} ms", flush=True)

    samples = {m: [] for m in loops}
    for rep in range(5):
        for mode in ("split", "fused"):
            t0 = time.perf_counter()
            np.asarray(loops[mode](engines[mode].arrays, x0))
            samples[mode].append((time.perf_counter() - t0 - floor) / iters)
    for mode, ss in samples.items():
        ms = [f"{s*1e3:.2f}" for s in ss]
        print(f"{mode}: min {min(ss)*1e3:.2f} ms  all [{', '.join(ms)}]",
              flush=True)


if __name__ == "__main__":
    main()
