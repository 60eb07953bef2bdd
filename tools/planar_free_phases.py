#!/usr/bin/env python
"""Phase attribution + banks2 experiment for the free-deal planar engine.

Times (a) scatter-only split call (A+deposits+flush stream), (b) split e2e
(scatter + separate reduce), (c) fused e2e banks2=False (auto), (d) fused
e2e banks2=True (forced; +num_slots*4KB VMEM). Min-of-5 interleaved.
Usage: python tools/planar_free_phases.py [graph] [scale] [iters]
"""
import sys, time
import numpy as np
sys.path.insert(0, ".")

graph = sys.argv[1] if len(sys.argv) > 1 else "pokec"
scale = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
iters = int(sys.argv[3]) if len(sys.argv) > 3 else 30

import jax
import jax.numpy as jnp
from graphlily_tpu import ArithmeticSemiring, EngineConfig
from graphlily_tpu.io import iccad_standin
from graphlily_tpu.io.layout_cache import pack_cached
from graphlily_tpu.ops.router_pallas import PlanarSpMV
from bench import _prep, measure_floor

config = EngineConfig(mxu_precision="default", layout_cache=".layout_cache")
csr = iccad_standin(graph, scale=scale, seed=1)
work = _prep(csr, config, degree_sort=True)
lay = pack_cached("planar", work, config, log=print, deal="free")
n = lay.num_rows
print(f"rr={lay.region_rows} nsteps={lay.nsteps} slots={lay.num_slots}",
      flush=True)

variants = {}
e_split = PlanarSpMV(lay, ArithmeticSemiring, config); e_split.fused = False
e_fused = PlanarSpMV(lay, ArithmeticSemiring, config); e_fused.fused = True
e_b2 = PlanarSpMV(lay, ArithmeticSemiring, config)
e_b2.fused = True; e_b2.banks2 = True
print(f"auto: fused={PlanarSpMV(lay, ArithmeticSemiring, config).fused} "
      f"banks2={PlanarSpMV(lay, ArithmeticSemiring, config).banks2}",
      flush=True)

def make_loop(fn):
    @jax.jit
    def loop(arrays, x):
        def body(_i, v):
            return fn(v, arrays)
        return jax.lax.fori_loop(0, iters, body, x)
    return loop

def scatter_only(v, arrays):
    g = e_split.scatter(v, arrays=arrays)
    # fold the stream into a tile so the carry stays (nct,8,128)-shaped;
    # cost of the fold is ~one elementwise pass over g (reported separately)
    t = g[:, 0].astype(jnp.float32)  # (nsteps, 8, 128)
    upd = jnp.sum(t, axis=0) * 1e-12
    return v + upd[None]

def e2e(eng):
    def fn(v, arrays):
        return eng(v, arrays=arrays, out_3d=True) + (0.1 / n)
    return fn

variants["scatter"] = (make_loop(scatter_only), e_split)
variants["split"] = (make_loop(e2e(e_split)), e_split)
variants["fused_b1"] = (make_loop(e2e(e_fused)), e_fused)
variants["fused_b2"] = (make_loop(e2e(e_b2)), e_b2)

x0 = jnp.full((n // 1024, 8, 128), 1.0 / n, jnp.float32)
outs = {}
for name, (loop, eng) in variants.items():
    t0 = time.perf_counter()
    try:
        outs[name] = np.asarray(loop(eng.arrays, x0))
        assert np.isfinite(outs[name]).all()
        print(f"{name}: compiled+first {time.perf_counter()-t0:.1f}s", flush=True)
    except Exception as ex:
        print(f"{name}: FAILED {type(ex).__name__}: {str(ex)[:200]}", flush=True)
        variants[name] = None
np.testing.assert_allclose(outs["fused_b1"], outs["split"], rtol=1e-2)
if "fused_b2" in outs:
    np.testing.assert_allclose(outs["fused_b2"], outs["split"], rtol=1e-2)
print("outputs agree", flush=True)

floor = measure_floor(jax, jnp)
print(f"floor {floor*1e3:.1f} ms", flush=True)
samples = {m: [] for m in variants if variants[m]}
for rep in range(5):
    for name in samples:
        loop, eng = variants[name]
        t0 = time.perf_counter()
        np.asarray(loop(eng.arrays, x0))
        samples[name].append((time.perf_counter() - t0 - floor) / iters)
for name, ss in samples.items():
    print(f"{name}: min {min(ss)*1e3:.2f} ms  all "
          f"[{', '.join(f'{s*1e3:.2f}' for s in ss)}]", flush=True)
