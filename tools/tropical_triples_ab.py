#!/usr/bin/env python
"""Triples-vs-planes A/B for the tropical engine's deposit streams on TPU.

split_format="triples" (io/tropical_format.derive_split_triples) cuts the
split-pass plane stream ~32x and pass-1 planes the same way — the footprint
lever for orkut-scale SSSP. Pass-1 measured triples at 32.5 vs 22.0
ns/piece (tools/triples_probe.py), so the e2e sign is NOT obvious: this
tool times both formats through the SAME 3D-carry device loop, interleaved
min-of-N (single samples swing +/-4 ms with host stalls), and asserts the
outputs BIT-EQUAL first (the tropical encoding is exact).

Usage: python tools/tropical_triples_ab.py [graph] [scale] [reps]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    graph = sys.argv[1] if len(sys.argv) > 1 else "pokec"
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 0.25
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    import jax
    import jax.numpy as jnp
    from graphlily_tpu import EngineConfig, TropicalSemiring
    from graphlily_tpu.io import iccad_standin
    from graphlily_tpu.io.layout_cache import pack_cached
    from graphlily_tpu.ops.tropical_pallas import TropicalSpMV
    from bench import _prep, measure_floor

    engines = {}
    mems = {}
    for fmt in ("planes", "triples"):
        config = EngineConfig(mxu_precision="default",
                              tropical_split_format=fmt,
                              layout_cache=".layout_cache")
        csr = iccad_standin(graph, scale=scale, seed=1)
        work = _prep(csr, config, degree_sort=True)
        lay = pack_cached("tropical", work, config, log=print)
        mems[fmt] = lay.mem_bytes
        engines[fmt] = TropicalSpMV(lay, TropicalSemiring, config)
        print(f"{fmt}: mem {lay.mem_bytes/1e9:.2f} GB "
              f"(B/nnz {lay.mem_bytes/lay.nnz:.1f}) nsteps2={lay.nsteps2} "
              f"f2={lay.f2} dstep2={lay.dstep2}", flush=True)
    n = engines["planes"].num_rows

    iters = 30
    loops = {}
    for fmt, eng in engines.items():
        def make(e):
            @jax.jit
            def loop(arrays, x):
                def body(_i, v):
                    # min-plus relaxation: carry-dependent (no LICM),
                    # stays in the distances domain
                    return e(v.reshape(-1), arrays=arrays, out_3d=True)
                return jax.lax.fori_loop(0, iters, body, x)
            return loop
        loops[fmt] = make(eng)

    x0 = (jnp.arange(n, dtype=jnp.float32) % 97 + 1.0).reshape(-1, 8, 128)
    outs = {}
    for fmt in ("planes", "triples"):
        t0 = time.perf_counter()
        outs[fmt] = np.asarray(loops[fmt](engines[fmt].arrays, x0))
        print(f"{fmt}: compiled+first in {time.perf_counter()-t0:.1f}s",
              flush=True)
    np.testing.assert_array_equal(outs["planes"], outs["triples"])
    print("triples == planes (bit-equal)", flush=True)
    floor = measure_floor(jax, jnp)
    print(f"floor {floor*1e3:.1f} ms", flush=True)

    samples = {m: [] for m in loops}
    for _ in range(reps):
        for fmt in ("planes", "triples"):
            t0 = time.perf_counter()
            np.asarray(loops[fmt](engines[fmt].arrays, x0))
            samples[fmt].append((time.perf_counter() - t0 - floor) / iters)
    for fmt, ss in samples.items():
        ms = [f"{s*1e3:.2f}" for s in ss]
        print(f"{fmt}: min {min(ss)*1e3:.2f} ms  all [{', '.join(ms)}] "
              f"mem {mems[fmt]/1e9:.2f} GB", flush=True)


if __name__ == "__main__":
    main()
