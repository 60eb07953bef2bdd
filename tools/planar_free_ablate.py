#!/usr/bin/env python
"""Clean phase ablation for the free-deal planar engine via deposit
predication (zero kernel changes): tiles_active=0 masks every deposit body
(w2=0 -> whole DG guard groups skip), leaving A + flushes + reduce.

  fused_full    : everything
  fused_nodep   : fused minus deposit bodies      -> deposits = full - this
  split_scatter : A + deposits + flush-stream write
  split_nodep   : A + flush-stream write          -> A+stream = this
Usage: python tools/planar_free_ablate.py [graph] [scale] [iters]
"""
import sys, time
import numpy as np
sys.path.insert(0, ".")

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

config = EngineConfig(mxu_precision="default", layout_cache=".layout_cache")
csr = iccad_standin(graph, scale=scale, seed=1)
work = _prep(csr, config, degree_sort=True)
lay = pack_cached("planar", work, config, log=print, deal="free")
n = lay.num_rows
nct = lay.num_cols // 1024
e_f = PlanarSpMV(lay, ArithmeticSemiring, config); e_f.fused = True
e_s = PlanarSpMV(lay, ArithmeticSemiring, config); e_s.fused = False
act0 = jnp.zeros(nct, jnp.int32)

def mk(fn):
    @jax.jit
    def loop(arrays, x):
        return jax.lax.fori_loop(0, iters, lambda _i, v: fn(v, arrays), x)
    return loop

def f_full(v, a):  return e_f(v, arrays=a, out_3d=True) + (0.1 / n)
def f_nodep(v, a): return e_f(v, arrays=a, out_3d=True,
                              tiles_active=act0) + (0.1 / n) + v * 0.999
def sc(pred):
    def fn(v, a):
        g = e_s.scatter(v, arrays=a,
                        tiles_active=act0 if pred else None)
        upd = jnp.sum(g[:, 0].astype(jnp.float32), axis=0) * 1e-12
        return v + upd[None]
    return fn

variants = {"fused_full": f_full, "fused_nodep": f_nodep,
            "split_scatter": sc(False), "split_nodep": sc(True)}
loops = {k: mk(v) for k, v in variants.items()}
x0 = jnp.full((n // 1024, 8, 128), 1.0 / n, jnp.float32)
for k, lp in loops.items():
    t0 = time.perf_counter()
    r = np.asarray(lp(e_f.arrays, x0))
    assert np.isfinite(r).all()
    print(f"{k}: compiled+first {time.perf_counter()-t0:.1f}s", flush=True)
floor = measure_floor(jax, jnp)
print(f"floor {floor*1e3:.1f} ms", flush=True)
samples = {k: [] for k in loops}
for rep in range(5):
    for k, lp in loops.items():
        t0 = time.perf_counter()
        np.asarray(lp(e_f.arrays, x0))
        samples[k].append((time.perf_counter() - t0 - floor) / iters)
for k, ss in samples.items():
    print(f"{k}: min {min(ss)*1e3:.2f} ms  all "
          f"[{', '.join(f'{s*1e3:.2f}' for s in ss)}]", flush=True)
