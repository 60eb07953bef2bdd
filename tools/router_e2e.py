"""Router SpMV end-to-end TPU timing: scatter, reduce, and the full pipeline
on the full-scale googleplus stand-in (or a named graph/scale).

Usage: python tools/router_e2e.py [graph] [scale] [phases...] [--r=REGION]
  phases: e2e scatter reduce   (default: all three)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from graphlily_tpu import EngineConfig, ArithmeticSemiring
from graphlily_tpu.io import iccad_standin, util_round_csr_matrix_dim
from graphlily_tpu.io.formatter import util_normalize_csr_matrix_by_outdegree
from graphlily_tpu.io.router_format import pack_router
from graphlily_tpu.ops.router_pallas import RouterSpMV, _router_reduce_call

S, L = 8, 128


FLOOR = [None]


def dispatch_floor():
    if FLOOR[0] is None:
        f = jax.jit(lambda v: v[:8].sum())
        v = jnp.ones(128)
        for _ in range(2):
            np.asarray(f(v))
        # MIN of several single-dispatch timings: a host stall during the
        # floor measurement otherwise silently deflates EVERY later phase
        # number by (stall / iters) — a 2x-wrong e2e was traced to this
        reps = []
        for _ in range(6):
            t0 = time.perf_counter()
            np.asarray(f(v))
            reps.append(time.perf_counter() - t0)
        FLOOR[0] = min(reps)
    return FLOOR[0]


def timeit(fn, arrays, x, iters=50):
    """fn(arrays, x) -> array; arrays/x are jit ARGUMENTS (the remote
    compiler rejects large HLO constants with HTTP 413)."""
    @jax.jit
    def loop(a, xv):
        def body(_i, acc):
            # carry-dependent input + carry-defining output: keeps XLA from
            # hoisting the body out of the loop (LICM)
            out = fn(a, xv + acc * 1e-30)
            return out.reshape(-1)[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    np.asarray(loop(arrays, x))
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(arrays, x))
        reps.append(max((time.perf_counter() - t0 - dispatch_floor()), 1e-9)
                    / iters)
    if max(reps) > 1.3 * min(reps):
        print(f"  (unstable: {[round(r*1e3, 3) for r in reps]} ms)",
              flush=True)
    return sorted(reps)[1]


def main():
    rr_opt = None
    cb_opt = None
    engine = "router"
    args = []
    for a in sys.argv[1:]:
        if a.startswith("--r="):
            rr_opt = int(a.split("=")[1])
        elif a.startswith("--cb="):
            cb_opt = int(a.split("=")[1])
        elif a.startswith("--engine="):
            engine = a.split("=")[1]
        else:
            args.append(a)
    graph = args[0] if args else "googleplus"
    scale = float(args[1]) if len(args) > 1 else 1.0
    phases = args[2:] or ["e2e", "scatter", "reduce"]

    cfg = EngineConfig(mxu_precision="default")
    g = iccad_standin(graph, scale=scale, seed=0)
    nnz = g.nnz
    util_round_csr_matrix_dim(g, 1024, 1024)
    util_normalize_csr_matrix_by_outdegree(g)
    t0 = time.perf_counter()
    if engine == "planar":
        from graphlily_tpu.io.planar_format import pack_planar
        lay = pack_planar(g, cfg, region_rows=rr_opt, cb=cb_opt)
    else:
        lay = pack_router(g, cfg, region_rows=rr_opt, cb=cb_opt)
    print(f"{graph} s{scale}: nnz={nnz} pack={time.perf_counter()-t0:.1f}s "
          f"nsteps={lay.nsteps} cb={lay.cb} rstep={lay.rstep} f={lay.f} "
          f"nreg={lay.num_regions} fill_a={lay.fill_a:.2%} "
          f"fill_stream={lay.fill_stream:.2%} mem={lay.mem_bytes/1e9:.2f}GB",
          flush=True)

    if engine == "planar":
        from graphlily_tpu.ops.router_pallas import PlanarSpMV
        eng = PlanarSpMV(lay, ArithmeticSemiring, cfg)
    else:
        eng = RouterSpMV(lay, ArithmeticSemiring, cfg)
    print(f"fused={eng.fused}", flush=True)
    a = eng.arrays
    rng = np.random.default_rng(3)
    xh = rng.random(lay.num_cols).astype(np.float32)
    x = jnp.asarray(xh)

    # correctness gate: Mosaic-compiled result vs a host oracle
    y = np.asarray(eng(x, arrays=a))
    indptr = g.adj_indptr.astype(np.int64)
    want = np.zeros(lay.num_rows, np.float64)
    np.add.at(want, g.row_ids().astype(np.int64),
              g.adj_data[:g.nnz].astype(np.float64)
              * xh[g.adj_indices[:g.nnz].astype(np.int64)])
    err = np.max(np.abs(y - want) / np.maximum(np.abs(want), 1e-3))
    print(f"correctness: max rel err {err:.2e}", flush=True)
    assert err < 3e-2, "router result does not match oracle on TPU"

    for ph in phases:
        if ph == "e2e":
            dt = timeit(lambda aa, xv: eng(xv, arrays=aa), a, x)
        elif ph == "scatter":
            dt = timeit(lambda aa, xv: eng.scatter(xv, arrays=aa), a, x)
        elif ph == "noB":
            # all deposits predicated off (w2=0): streams + phase A + loop
            # skeleton + flushes only — isolates the non-deposit floor
            dead = jnp.zeros(lay.num_col_tiles, jnp.int32)
            dt = timeit(lambda aa, xv: eng.scatter(
                xv, arrays=aa, tiles_active=dead), a, x)
        elif ph == "reduce":
            # carry-dependent THROUGH the scatter (a fixed g input gets the
            # whole reduce LICM-hoisted out of the timing loop); report the
            # split-mode pair and the difference vs the scatter number
            def split_pair(aa, xv):
                gs = eng.scatter(xv, arrays=aa)
                return _router_reduce_call(aa.c_code, gs, aa.c_hi, aa.c_lo,
                                           **eng._static_reduce)
            dt = timeit(split_pair, a, x)
            print(f"  (scatter+reduce pair — subtract the scatter row)",
                  flush=True)
        elif ph in ("noC", "nodots", "nobuilds", "noacc") or ph.startswith("pair"):
            if engine == "planar" or not eng.fused:
                print(f"{ph}: fused roll only", flush=True)
                continue
            from graphlily_tpu.ops.router_pallas import _router_fused_call
            st = dict(eng._static_fused, ablate=ph)
            dt = timeit(lambda aa, xv: _router_fused_call(
                aa.a_page, aa.a_r, aa.a_sub, aa.a_vals, aa.rg, aa.c_code,
                aa.c_hi, aa.c_lo,
                xv.reshape(lay.num_col_tiles, S, L), **st), a, x)
        else:
            raise SystemExit(f"unknown phase {ph}")
        print(f"{ph:8s}: {dt*1e3:8.3f} ms  ({nnz/dt/1e9:6.2f} GTEPS)",
              flush=True)


if __name__ == "__main__":
    main()
