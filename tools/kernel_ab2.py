#!/usr/bin/env python
"""A/B of one-hot reduce restructurings (standalone kernels, cached layout).

Variants:
  base      : current production (transpose rt + 8x (1,128)@(128,W) dots)
  flip      : no transpose; oh built sublane-oriented; 8x (W,128)@(128,1) dots
  flip2lvl  : flip + two-level (8x16) one-hot factorization; needs an
              (8,16)->(1,128) relayout per chunk
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
from kernel_ab import get_layout  # type: ignore

S, L, W = 8, 128, 128
CB = 16


def main():
    lay = get_layout()
    print(f"layout chunks={lay.num_chunks} fill={lay.fill:.2%}", flush=True)
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nct, nwgrp = lay.num_col_tiles, lay.num_window_groups
    nc = lay.num_chunks
    pad = (-nc) % CB
    ncp = nc + pad

    def padA(a, fill=0):
        if pad == 0:
            return jnp.asarray(a)
        f_ = np.full((pad,) + a.shape[1:], fill, a.dtype)
        return jnp.asarray(np.concatenate([a, f_]))

    CODE = jnp.asarray(np.concatenate(
        [lay.code, np.full(pad, lay.code[-1], lay.code.dtype)]))
    nsteps = ncp // CB
    R = padA(lay.r).reshape(nsteps, CB * S, L)
    ROWS = padA(lay.rows).reshape(nsteps, CB * S, L)
    VALS = padA(lay.vals).reshape(nsteps, CB * S, L)
    n = lay.num_rows
    x0 = jnp.full(n, 1.0 / n, jnp.float32)

    def make(variant):
        def kernel(code_ref, r_ref, rt_ref, v_ref, x_ref, o_ref):
            step = pl.program_id(0)

            @pl.when(step == 0)
            def _():
                o_ref[...] = jnp.zeros_like(o_ref)

            sub_ids = jax.lax.broadcasted_iota(jnp.int32, (S, W), 0)
            r_all = r_ref[0].astype(jnp.int32)
            rt_all = rt_ref[0].astype(jnp.int32)
            for k in range(CB):
                ci = step * CB + k
                code = code_ref[ci]
                cid = code % nct
                wgrp = code // (S * nct)
                wsub = (code // nct) % S
                x2 = x_ref[cid]
                r = r_all[k * S:(k + 1) * S, :]
                vals = v_ref[0, k * S:(k + 1) * S, :]
                rows = rt_all[k * S:(k + 1) * S, :]          # (8,128) natural
                g = jnp.take_along_axis(x2, r, axis=1) * vals
                if variant == "base":
                    rt = rows.T
                    lane_t = jax.lax.broadcasted_iota(jnp.int32, (W, W), 1)
                    acc = jnp.zeros((1, W), jnp.float32)
                    for s in range(S):
                        ohs = (lane_t == rt[:, s:s + 1]).astype(jnp.float32)
                        acc = acc + jax.lax.dot_general(
                            g[s:s + 1, :], ohs, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                elif variant == "flip":
                    sub_t = jax.lax.broadcasted_iota(jnp.int32, (W, L), 0)
                    accc = jnp.zeros((W, 1), jnp.float32)
                    for s in range(S):
                        ohs = (sub_t == rows[s:s + 1, :]).astype(jnp.float32)
                        accc = accc + jax.lax.dot_general(
                            ohs, g[s:s + 1, :].T, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)   # (W,1)
                    acc = accc.T                                   # (1,W)
                else:  # flip2lvl
                    hi_t = jax.lax.broadcasted_iota(jnp.int32, (8, L), 0)
                    lo_t = jax.lax.broadcasted_iota(jnp.int32, (16, L), 0)
                    acc816 = jnp.zeros((8, 16), jnp.float32)
                    for s in range(S):
                        rrow = rows[s:s + 1, :]
                        oh_hi = (hi_t == (rrow >> 4)).astype(jnp.float32)
                        m_lo = jnp.where(lo_t == (rrow & 15),
                                         jnp.broadcast_to(g[s:s + 1, :], (16, L)),
                                         0.0)
                        acc816 = acc816 + jax.lax.dot_general(
                            oh_hi, m_lo, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)   # (8,16)
                    # flatten (8,16)->(1,W): B[hi,t]=acc816[hi,t&15] via a
                    # static selector matmul, mask by hi==t>>4, sum sublanes
                    # (tpu.reshape (8,16)->(1,128) is unsupported)
                    t_ids = jax.lax.broadcasted_iota(jnp.int32, (16, W), 1)
                    sel = ((t_ids & 15) == jax.lax.broadcasted_iota(
                        jnp.int32, (16, W), 0)).astype(jnp.float32)
                    b = jax.lax.dot_general(acc816, sel, (((1,), (0,)), ((), ())),
                                            preferred_element_type=jnp.float32)
                    hi_ids = jax.lax.broadcasted_iota(jnp.int32, (8, W), 1) >> 4
                    hmask = (hi_ids == jax.lax.broadcasted_iota(
                        jnp.int32, (8, W), 0)).astype(jnp.float32)
                    acc = jnp.sum(b * hmask, axis=0, keepdims=True)
                o_ref[wgrp] += jnp.where(sub_ids == wsub,
                                         jnp.broadcast_to(acc, (S, W)), 0.0)

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(ncp // CB,),
            in_specs=[
                pl.BlockSpec((1, CB * S, L), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, CB * S, L), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, CB * S, L), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
        return pl.pallas_call(kernel, grid_spec=gs,
                              out_shape=jax.ShapeDtypeStruct((nwgrp, S, W),
                                                             jnp.float32))

    _f = jax.jit(lambda v: v[:8].sum())
    _v = jnp.ones(128)
    for _ in range(2):
        np.asarray(_f(_v))
    t0 = time.perf_counter()
    for _ in range(4):
        np.asarray(_f(_v))
    floor = (time.perf_counter() - t0) / 4

    iters = 100
    want_sum = None
    for variant in ("base", "flip2lvl"):
        try:
            f = make(variant)

            @jax.jit
            def loop(code_, r_, rows_, vals_, x):
                def body(_i, v):
                    out = f(code_, r_, rows_, vals_,
                            v.reshape(nct, S, L))
                    return out.reshape(n) + (0.1 / n)
                return jax.lax.fori_loop(0, iters, body, x)

            out = np.asarray(loop(CODE, R, ROWS, VALS, x0))
            s_ = out.sum()
            note = ""
            if variant == "base":
                want_sum = s_
            elif variant != "flip2lvl" and want_sum is not None:
                note = f" (sum match: {np.isclose(s_, want_sum, rtol=1e-3)})"
            elif variant == "flip2lvl":
                note = " (lane-swizzled: sum-only check: " \
                       f"{np.isclose(s_, want_sum, rtol=1e-3)})"
            t0 = time.perf_counter()
            for _ in range(3):
                np.asarray(loop(CODE, R, ROWS, VALS, x0))
            dt = ((time.perf_counter() - t0) / 3 - floor) / iters
            print(f"{variant:9s}: {dt*1e3:7.3f} ms/SpMV "
                  f"{lay.nnz/dt/1e9:6.3f} GTEPS  sum={s_:.4f}{note}",
                  flush=True)
        except Exception as e:
            print(f"{variant:9s}: FAIL {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
