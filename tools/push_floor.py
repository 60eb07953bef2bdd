#!/usr/bin/env python
"""Push-vs-pull floor on real TPU (VERDICT r2 #4's 'done' criterion).

For a graph, measures on-device loops (min-of-reps, dispatch floor
subtracted):
  pull      : dense SpMV through the SpMVModule engine (out_3d)
  push(s)   : SpMSpVModule.apply_dense at frontier sparsity s
              (the step-compacted predicated path)
The push module SHARES the pull module's engine (reuse_from), exactly as
the fused apps do, so the numbers are the apps' pull_push economics.

With --attr, additionally attributes the push floor (the ~4 ms tail that
VERDICT r4 weak #2 flagged) into:
  prologue   : the per-call predication chain only (frontier activity ->
               _steps_sm_na -> _predicate_rg), jitted standalone
  zero-floor : a full push call on an ALL-ZERO frontier (na=0: every grid
               step skips its body; measures prologue + grid walk +
               epilogue — the irreducible per-call cost)
so for each sparsity: active-work = push(s) - zero-floor.

Usage: python tools/push_floor.py [graph] [scale] [sparsities] [--attr]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    graph = sys.argv[1] if len(sys.argv) > 1 else "googleplus"
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    spars = [float(s) for s in
             (sys.argv[3] if len(sys.argv) > 3
              and not sys.argv[3].startswith("--")
              else "0.99,0.999,0.9999").split(",")]

    import jax
    import jax.numpy as jnp
    from graphlily_tpu import ArithmeticSemiring, MaskType, EngineConfig
    from graphlily_tpu.io import iccad_standin, csr2csc
    from graphlily_tpu.io.formatter import util_round_csr_matrix_dim
    from graphlily_tpu.module import SpMVModule, SpMSpVModule
    from bench import _prep, measure_floor

    engine = "auto"
    for a in sys.argv:
        if a.startswith("--engine="):
            engine = a.split("=", 1)[1]
    config = EngineConfig(mxu_precision="default", engine=engine,
                          layout_cache=".layout_cache")
    csr = iccad_standin(graph, scale=scale,
                        seed=0 if graph == "googleplus" else 1)
    work = _prep(csr, config, degree_sort=True)
    spmv = SpMVModule(config)
    spmv.set_semiring(ArithmeticSemiring)
    spmv.set_mask_type(MaskType.NO_MASK)
    spmv.load_and_format_matrix(work)
    csc = csr2csc(work)
    mod = SpMSpVModule(config)
    mod.set_semiring(ArithmeticSemiring)
    mod.set_mask_type(MaskType.NO_MASK)
    mod.load_and_format_matrix(csc, reuse_from=spmv)
    eng = mod._pallas
    n = mod.num_cols_
    print(f"{graph} s{scale} engine={type(eng).__name__} "
          f"fused={getattr(eng, 'fused', None)} n={n}", flush=True)
    floor = measure_floor(jax, jnp)
    print(f"floor {floor * 1e3:.2f} ms", flush=True)
    iters = 20
    st_pull = spmv.device_state()
    st_push = mod.device_state()
    x3d = jnp.full((n // 1024, 8, 128), 1.0 / n, jnp.float32)

    def timeit(name, fn, *args):
        f = jax.jit(fn)
        r = f(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0])   # real sync (axon)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(jax.tree_util.tree_leaves(f(*args))[0])
            best = min(best, (time.perf_counter() - t0 - floor) / iters)
        print(f"{name:18s} {best * 1e3:8.3f} ms", flush=True)
        return best

    def loop_pull(st, x_):
        def body(_i, v):
            y = spmv._pallas(v, arrays=st, out_3d=True)
            return y * 1e-20 + v
        return jax.lax.fori_loop(0, iters, body, x_)

    pull = timeit("pull SpMV", loop_pull, st_pull, x3d)

    def loop_push(st, x_):
        # rebuild the EXACT frontier each iteration (bench_spmspv_sweep's
        # loop_dense idiom): `y*1e-20 + v` densifies v after one iteration
        # (every entry becomes nonzero), silently turning the "push" loop
        # into an all-pages-active dense product
        active = x_ != 0.0
        def body(_i, v):
            y, _nnz = mod.apply_dense(v, state=st, out_3d=True)
            return jnp.where(active, 1.0, 0.0).astype(v.dtype) + y * 0.0
        return jax.lax.fori_loop(0, iters, body, x_)

    zero_floor = None
    if "--attr" in sys.argv and not hasattr(eng, "_act_chunk"):
        print("--attr: engine has no router predication chain "
              f"({type(eng).__name__}); skipping attribution", flush=True)
    elif "--attr" in sys.argv:
        from graphlily_tpu.ops.router_pallas import (
            RouterSpMV, _steps_sm_na, _predicate_rg, _predicate_exact)
        flavor = "roll" if isinstance(eng, RouterSpMV) else "planar"
        nct = eng.layout.num_col_tiles
        unit = nct * 8 if flavor == "roll" else nct
        zero = mod.semiring_.zero

        def loop_prologue(st, x_):
            # the exact per-call predication chain _run_engine pays;
            # jnp.sum forces full rg materialization (as feeding the
            # kernel would); the frontier is rebuilt each iteration
            a = st["arrays"] if isinstance(st, dict) else st
            fidx = st.get("fidx") if isinstance(st, dict) else None
            active = x_ != 0.0
            def body(_i, v):
                act = jnp.any(v.reshape(unit, -1)
                              != jnp.asarray(zero, v.dtype), axis=1)
                act_chunk = eng._act_chunk(a, act)
                if fidx is not None:
                    rg, cmask, sm, na = _predicate_exact(a.rg, act_chunk,
                                                         flavor, fidx)
                    probe = jnp.sum(rg) + jnp.sum(cmask) + sm[0] + na[0]
                else:
                    sm, na = _steps_sm_na(act_chunk, eng._minw)
                    rg = _predicate_rg(a.rg, act_chunk, flavor)
                    probe = jnp.sum(rg) + sm[0] + na[0]
                return (jnp.where(active, 1.0, 0.0).astype(v.dtype)
                        + probe.astype(v.dtype) * 0.0)
            return jax.lax.fori_loop(0, iters, body, x_)

        xj0 = jnp.zeros((n // 1024, 8, 128), jnp.float32)
        prol = timeit("prologue only", loop_prologue, st_push, xj0)
        zero_floor = timeit("push ZERO frontier", loop_push, st_push, xj0)
        print(f"  floor attribution: prologue {prol*1e3:.3f} ms | "
              f"grid+epilogue {max(0.0, zero_floor - prol)*1e3:.3f} ms "
              f"(zero-frontier total {zero_floor*1e3:.3f})", flush=True)

    rng = np.random.default_rng(7)
    for s in spars:
        nv = max(1, int(round(n * (1 - s))))
        x = np.zeros(n, np.float32)
        idx = rng.choice(n, size=nv, replace=False)
        x[idx] = 1.0
        xj = jnp.asarray(x.reshape(n // 1024, 8, 128))

        t = timeit(f"push s={s} nnz={nv}", loop_push, st_push, xj)
        extra = (f", active-work {max(0.0, t - zero_floor)*1e3:.3f} ms"
                 if zero_floor is not None else "")
        print(f"  -> push/pull = {t / pull:.2f}{extra}", flush=True)


if __name__ == "__main__":
    main()
