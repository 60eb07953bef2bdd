#!/usr/bin/env python
"""deal="free" (v4) vs deal="bucket" (v3) planar A/B on real TPU.

Interleaved min-of-N reps of the 3D-carry loop over cached layouts; outputs
cross-checked before timing (a miscompile must not win).

Usage: python tools/planar_deal_ab.py [graph] [scale] [iters]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    graph = sys.argv[1] if len(sys.argv) > 1 else "pokec"
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 50

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

    engines, loops = {}, {}
    n = None
    for deal in ("bucket", "free"):
        t0 = time.time()
        kw = {} if deal == "bucket" else {"deal": "free"}
        lay = pack_cached("planar", work, config, log=print, **kw)
        nf = int((lay.rg[..., 1] < 0).sum())
        nd = int((lay.rg[..., 1] > 0).sum())
        print(f"{deal}: pack {time.time()-t0:.0f}s rr={lay.region_rows} "
              f"nsteps={lay.nsteps} cb={lay.cb} f={lay.f} deposits={nd} "
              f"flushes={nf} flush_fill={lay.nnz/max(nf*1024,1):.3f} "
              f"MB={lay.mem_bytes/1e6:.0f}", flush=True)
        eng = PlanarSpMV(lay, ArithmeticSemiring, config)
        print(f"  fused={eng.fused} banks2={eng.banks2} looped={eng._looped}",
              flush=True)
        n = lay.num_rows
        engines[deal] = eng

        def make(e):
            @jax.jit
            def loop(arrays, x):
                def body(_i, v):
                    return e(v, arrays=arrays, out_3d=True) + (0.1 / n)
                return jax.lax.fori_loop(0, iters, body, x)
            return loop
        loops[deal] = make(eng)

    x0 = jnp.full((n // 1024, 8, 128), 1.0 / n, jnp.float32)
    outs = {}
    for deal, loop in loops.items():
        t0 = time.perf_counter()
        outs[deal] = np.asarray(loop(engines[deal].arrays, x0))
        assert np.isfinite(outs[deal]).all()
        print(f"{deal}: compiled+first in {time.perf_counter()-t0:.1f}s",
              flush=True)
    np.testing.assert_allclose(outs["free"], outs["bucket"],
                               rtol=1e-2, atol=1e-12)
    print("free == bucket (allclose)", flush=True)
    floor = measure_floor(jax, jnp)
    print(f"floor {floor*1e3:.1f} ms", flush=True)

    samples = {m: [] for m in loops}
    for rep in range(5):
        for deal in ("bucket", "free"):
            t0 = time.perf_counter()
            np.asarray(loops[deal](engines[deal].arrays, x0))
            samples[deal].append((time.perf_counter() - t0 - floor) / iters)
    for deal, ss in samples.items():
        ms = [f"{s*1e3:.2f}" for s in ss]
        print(f"{deal}: min {min(ss)*1e3:.2f} ms  all [{', '.join(ms)}]",
              flush=True)


if __name__ == "__main__":
    main()
