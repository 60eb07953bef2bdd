#!/usr/bin/env python
"""SpMSpV floor attribution on real TPU.

The round-2 sweep showed push NEVER beating pull: googleplus SpMSpV at
sparsity 0.99 cost 14.97 ms when a full DENSE router SpMV costs 2.8 ms —
so ~12 ms is floor, not kernel work. This tool times each stage of the
dense-emulation path separately (all as on-device loops minus the dispatch
floor):

  sparse_to_dense   scatter of the frontier into a semiring-zero vector
  act               col-tile activity reduction
  predicate         _predicate_rg descriptor masking (XLA gathers)
  engine(pred)      the predicated kernel call (x pre-tiled)
  engine(dense)     the same kernel, no predication (reference point)
  dense_to_sparse   static-size nonzero compaction

Usage: python tools/spmspv_profile.py [graph] [scale] [sparsity]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    graph = sys.argv[1] if len(sys.argv) > 1 else "googleplus"
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    sparsity = float(sys.argv[3]) if len(sys.argv) > 3 else 0.99

    import jax
    import jax.numpy as jnp
    from graphlily_tpu import ArithmeticSemiring, MaskType, EngineConfig
    from graphlily_tpu.io import iccad_standin, csr2csc
    from graphlily_tpu.io.formatter import util_round_csr_matrix_dim
    from graphlily_tpu.module import SpMSpVModule
    from graphlily_tpu.ops import sparse_from_entries
    from graphlily_tpu.ops.vector import sparse_to_dense, dense_to_sparse
    from graphlily_tpu.ops.router_pallas import _predicate_rg
    from bench import measure_floor

    config = EngineConfig(mxu_precision="default",
                          layout_cache=".layout_cache")
    csr = iccad_standin(graph, scale=scale, seed=0 if graph == "googleplus"
                        else 1)
    work = csr.copy()
    util_round_csr_matrix_dim(work, 1024, 1024)
    csc = csr2csc(work)
    mod = SpMSpVModule(config)
    mod.set_semiring(ArithmeticSemiring)
    mod.set_mask_type(MaskType.NO_MASK)
    mod.load_and_format_matrix(csc)
    eng = mod._pallas
    lay = eng.layout
    n = mod.num_cols_
    print(f"{graph} s{scale} engine={type(eng).__name__} "
          f"fused={getattr(eng, 'fused', None)} n={n}", flush=True)

    rng = np.random.default_rng(7)
    nnz_vec = max(1, int(round(n * (1 - sparsity))))
    idx = np.sort(rng.choice(n, size=nnz_vec, replace=False))
    sv = sparse_from_entries(idx, np.ones(nnz_vec, np.float32),
                             mod.capacity, dtype=config.jdtype)
    zero = mod.semiring_.zero
    a = eng.arrays
    nct = lay.num_col_tiles
    floor = measure_floor(jax, jnp)
    print(f"floor {floor * 1e3:.2f} ms, frontier nnz {nnz_vec}", flush=True)
    iters = 20

    def timeit(name, fn, *args):
        f = jax.jit(fn)
        jax.block_until_ready(f(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args))
            best = min(best, (time.perf_counter() - t0 - floor) / iters)
        print(f"{name:22s} {best * 1e3:8.3f} ms", flush=True)
        return best

    # 1) sparse -> dense scatter
    def loop_s2d(sv_):
        def body(_i, c):
            x = sparse_to_dense(sv_, n, zero)
            return c + x[0] * 1e-20
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    timeit("sparse_to_dense", loop_s2d, sv)

    x = sparse_to_dense(sv, n, zero)
    x3 = jnp.asarray(np.asarray(x).reshape(nct, 8, 128))

    # 2) activity reduction
    def loop_act(x_):
        def body(_i, c):
            act = jnp.any(x_.reshape(nct, -1) != jnp.asarray(zero, x_.dtype),
                          axis=1)
            return c + act[0].astype(jnp.float32) * 1e-20
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    timeit("act reduction", loop_act, x3)

    router_like = type(eng).__name__ in ("PlanarSpMV", "RouterSpMV",
                                         "TropicalSpMV")
    unit = nct * 8 if type(eng).__name__ == "RouterSpMV" else nct
    act = jnp.any(x3.reshape(unit, -1) != jnp.asarray(zero, x3.dtype),
                  axis=1)
    flavor = "planar" if type(eng).__name__ in ("PlanarSpMV",
                                                "TropicalSpMV") else "roll"

    if router_like:
        from graphlily_tpu.ops.router_pallas import _chunk_activity

        # 3) descriptor predication
        def loop_pred(rg, page, sub, act_):
            def body(_i, c):
                ac = _chunk_activity(page, sub, act_, nct)
                rg2 = _predicate_rg(rg, ac, flavor)
                return c + rg2[0, 0, 0].astype(jnp.float32) * 1e-20
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        timeit("predicate_rg", loop_pred, a.rg, a.a_page,
               getattr(a, "a_sub", None), act)

    # 4) engine, predicated (pre-tiled x)
    if router_like:
        def loop_eng_pred(ar, x_, act_):
            def body(_i, v):
                y = eng(v, arrays=ar, out_3d=True, tiles_active=act_)
                return y * 1e-20 + v
            return jax.lax.fori_loop(0, iters, body, x_)

        timeit("engine (predicated)", loop_eng_pred, a, x3, act)
    else:
        # chunked engine: step-compacted call_predicated via sm/na
        touch = jnp.asarray(eng.layout.step_touch)

        def loop_eng_pred(ar, x_, act_):
            def body(_i, v):
                sa = (touch @ act_.astype(touch.dtype)) > 0
                sm = jnp.nonzero(sa, size=touch.shape[0],
                                 fill_value=0)[0].astype(jnp.int32)
                na = jnp.sum(sa).astype(jnp.int32).reshape(1)
                y = eng.call_predicated(v, sm, na, arrays=ar, out_3d=True)
                return y * 1e-20 + v
            return jax.lax.fori_loop(0, iters, body, x_)

        timeit("engine (predicated)", loop_eng_pred, a, x3, act)

    # 5) engine, dense
    def loop_eng(ar, x_):
        def body(_i, v):
            y = eng(v, arrays=ar, out_3d=True)
            return y * 1e-20 + v
        return jax.lax.fori_loop(0, iters, body, x_)

    timeit("engine (dense)", loop_eng, a, x3)

    # 6) dense -> sparse compaction
    def loop_d2s(x_):
        def body(_i, c):
            svo = dense_to_sparse(x_.reshape(-1), zero, mod.capacity)
            return c + svo.values[0] * 1e-20
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    timeit("dense_to_sparse", loop_d2s, x3)

    # 7) the module's full apply_dense (3D) — what fused app loops pay
    st = mod.device_state()

    def loop_mod(st_, x_):
        def body(_i, v):
            y, _nnz = mod.apply_dense(v, state=st_, out_3d=True)
            return y * 1e-20 + v
        return jax.lax.fori_loop(0, iters, body, x_)

    timeit("apply_dense (3D)", loop_mod, st, x3)


if __name__ == "__main__":
    main()
