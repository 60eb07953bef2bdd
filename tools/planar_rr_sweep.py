#!/usr/bin/env python
"""region_rows x cb sweep for the free-deal planar engine on real TPU.

With deposits guard-batched (~2ns effective) the old rr=8192 optimum may
have moved down: reduce builds scale with rh while deposits/planes scale
with 1/rr. Packs each config (cached), times the 3D-carry loop min-of-5.

Usage: python tools/planar_rr_sweep.py [graph] [scale] "rr:cb,rr:cb,..."
"""
import sys, time
import numpy as np
sys.path.insert(0, ".")

graph = sys.argv[1] if len(sys.argv) > 1 else "pokec"
scale = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
combos = [tuple(int(v) for v in c.split(":"))
          for c in (sys.argv[3] if len(sys.argv) > 3
                    else "8192:32,4096:32,2048:32,8192:64").split(",")]
iters = 50

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
n = None
engines, loops = {}, {}
for rr, cb in combos:
    key = f"rr{rr}cb{cb}"
    t0 = time.time()
    kw = {"deal": "free"}
    if rr: kw["region_rows"] = rr
    if cb: kw["cb"] = cb
    try:
        lay = pack_cached("planar", work, config, log=print, **kw)
    except Exception as e:
        print(f"{key}: pack FAILED {type(e).__name__}: {str(e)[:150]}", flush=True)
        continue
    nf = int((lay.rg[..., 1] < 0).sum()); nd = int((lay.rg[..., 1] > 0).sum())
    print(f"{key}: pack {time.time()-t0:.0f}s nsteps={lay.nsteps} cb={lay.cb} "
          f"dstep={lay.dstep} f={lay.f} slots={lay.num_slots} dep={nd} "
          f"fl={nf} flush_fill={lay.nnz/max(nf*1024,1):.3f} "
          f"MB={lay.mem_bytes/1e6:.0f}", flush=True)
    eng = PlanarSpMV(lay, ArithmeticSemiring, config)
    print(f"  fused={eng.fused} banks2={eng.banks2} looped={eng._looped}",
          flush=True)
    n = lay.num_rows
    engines[key] = eng
    def make(e):
        @jax.jit
        def loop(arrays, x):
            def body(_i, v):
                return e(v, arrays=arrays, out_3d=True) + (0.1 / n)
            return jax.lax.fori_loop(0, iters, body, x)
        return loop
    loops[key] = make(eng)

x0 = jnp.full((n // 1024, 8, 128), 1.0 / n, jnp.float32)
outs = {}
base = None
for key, loop in list(loops.items()):
    t0 = time.perf_counter()
    try:
        outs[key] = np.asarray(loop(engines[key].arrays, x0))
        print(f"{key}: compiled+first {time.perf_counter()-t0:.1f}s", flush=True)
        if base is None:
            base = key
        else:
            np.testing.assert_allclose(outs[key], outs[base], rtol=1e-2)
    except Exception as e:
        print(f"{key}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        loops.pop(key)
print("outputs agree", flush=True)
floor = measure_floor(jax, jnp)
print(f"floor {floor*1e3:.1f} ms", flush=True)
samples = {k: [] for k in loops}
for rep in range(5):
    for key, loop in loops.items():
        t0 = time.perf_counter()
        np.asarray(loop(engines[key].arrays, x0))
        samples[key].append((time.perf_counter() - t0 - floor) / iters)
for key, ss in samples.items():
    print(f"{key}: min {min(ss)*1e3:.2f} ms  all "
          f"[{', '.join(f'{s*1e3:.2f}' for s in ss)}]", flush=True)
