#!/usr/bin/env python
"""Triple-run deposit descriptors vs (8,128) int8 planes — the planes-stream
compression probe.

tools/layout_stats.py measured the pokec planes stream at 814 MB with 4%
plane fill: each deposit piece ships a full 1 KB (8,128) gather plane for
~43 elements. But every (piece, sublane) is ONE contiguous source run
mapped to ONE contiguous accumulator run (scatter_planes writes src0+off
at dest0+off), so a piece compresses losslessly to 8 per-sublane triples
(a0, d0, n) packed one int32 per sublane = 32 B/piece. The kernel decodes
a step's triples once into (8,128) int32 vregs (3 vreg-ops per 128
pieces), and each deposit body uses a STATIC lane slice (the descriptor
ordinal == its unroll position), iota arithmetic and the same single
gather + select as the plane path.

This probe converts a REAL planar layout's planes to triples host-side
(asserting the contiguity invariant), then A/Bs the split scatter phase:
bitwise-equal flush streams + interleaved min-of-5 timing.

Usage: python tools/triples_probe.py [graph] [scale] [reps]
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

graph = sys.argv[1] if len(sys.argv) > 1 else "pokec"
scale = float(sys.argv[2]) if len(sys.argv) > 2 else 0.0625
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graphlily_tpu import EngineConfig
from graphlily_tpu.io import iccad_standin
from graphlily_tpu.io.layout_cache import pack_cached
from graphlily_tpu.ops.router_pallas import (_planar_scatter_call, _cparams,
                                             S, L, _rg_flat)
from graphlily_tpu.semiring import OpType
from bench import _prep, measure_floor


def planes_to_triples(lay):
    """(nsteps, dmax, 8, 128) int8 planes -> (nsteps, TP, 8, 128) int32
    triple words (a0 | d0<<7 | n<<14), TP = ceil(dstep/128)."""
    nsteps, dmax = lay.planes.shape[:2]
    TP = (lay.dstep + L - 1) // L
    tw = np.zeros((nsteps, TP, S, L), np.int32)
    pv = lay.planes.astype(np.int32)          # < 0 -> take src (pv & 127)
    take = pv < 0
    n_ = take.sum(axis=3)                     # (nsteps, dmax, 8)
    d0 = np.where(n_ > 0, np.argmax(take, axis=3), 0)
    src = pv & 127
    a0 = np.take_along_axis(src, d0[..., None], axis=3)[..., 0]
    a0 = np.where(n_ > 0, a0, 0)
    # contiguity invariant: the take-mask is one run and srcs ascend by 1
    lane_i = np.arange(L)
    run = (lane_i[None, None, None, :] >= d0[..., None]) & (
        lane_i[None, None, None, :] < (d0 + n_)[..., None])
    assert (take == run).all(), "plane take-mask is not a single run"
    expect = (a0[..., None] + lane_i[None, None, None, :]
              - d0[..., None]) & 127
    assert (np.where(run, src, 0) == np.where(run, expect, 0)).all(), \
        "plane srcs are not contiguous"
    words = (a0 | (d0 << 7) | (n_ << 14)).astype(np.int32)
    assert dmax <= TP * L
    p = np.arange(dmax)
    # two advanced indices around a slice: result dims are (dmax, nsteps, 8)
    tw[:, p >> 7, :, p & 127] = words.transpose(1, 0, 2)
    return tw


def make_triples_kernel(op, cb, rstep, nreg, dstep, TP, banks2,
                        variant="sh"):
    def kernel(page_ref, r_ref, sub_ref, v_ref, rg_ref, tri_ref, x_ref,
               o_ref, g_buf, acc_ref, acc2_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            if banks2:
                acc2_ref[...] = jnp.zeros_like(acc2_ref)

        r_all = r_ref[0].astype(jnp.int32)
        sub_all = sub_ref[0].astype(jnp.int32)
        for k in range(cb):
            t = x_ref[page_ref[0, 0, k]]
            rk = r_all[k * S:(k + 1) * S, :]
            t = jnp.take_along_axis(t, sub_all[k * S:(k + 1) * S, :], axis=0)
            g = jnp.take_along_axis(t, rk, axis=1)
            vals = v_ref[0, k * S:(k + 1) * S, :].astype(g.dtype)
            if op == OpType.MULADD:
                g = g * vals
            else:
                raise ValueError(op)
            g_buf[k] = g

        # decode the step's triples once (vectorized over 128 pieces/plane):
        # sh = (a0 - d0) & 127 fuses the gather shift; variant "u32" packs
        # the range test into ONE unsigned compare (t = lane - d0 in
        # [0, n) <=> u32(t) < n)
        dec = []
        for tp in range(TP):
            w = tri_ref[0, tp]
            a0 = w & 127
            d0 = (w >> 7) & 127
            nn = (w >> 14) & 255
            dec.append(((a0 - d0) & 127, d0, nn, d0 + nn))

        lane_i = jax.lax.broadcasted_iota(jnp.int32, (S, L), 1)

        if variant == "u32":
            def dep_body(j, w1, w2, bank):
                k = w1 & 0xFF
                c = j & 127
                sh, d0, nn, _e = (dd[:, c:c + 1] for dd in dec[j >> 7])
                t = lane_i - d0
                idx = (t + (d0 + sh)) & 127
                y = jnp.take_along_axis(g_buf[k], idx, axis=1)
                ne = jnp.where(w2 > 0, nn, 0)
                m = t.astype(jnp.uint32) < ne.astype(jnp.uint32)
                slot = w2 & 0xFFF
                bank[slot] = jnp.where(m, y, bank[slot])
        else:
            def dep_body(j, w1, w2, bank):
                k = w1 & 0xFF
                c = j & 127
                sh, d0, _nn, e = (dd[:, c:c + 1] for dd in dec[j >> 7])
                idx = (lane_i + sh) & 127
                y = jnp.take_along_axis(g_buf[k], idx, axis=1)
                ee = jnp.where(w2 > 0, e, 0)
                m = jnp.logical_and(lane_i >= d0, lane_i < ee)
                slot = w2 & 0xFFF
                bank[slot] = jnp.where(m, y, bank[slot])

        DG = 8
        for j0 in range(0, dstep, DG):
            n = min(DG, dstep - j0)
            ws = [(rg_ref[0, j0 + u, 0], rg_ref[0, j0 + u, 1])
                  for u in range(n)]
            anyact = ws[0][1]
            for u in range(1, n):
                anyact = jnp.maximum(anyact, ws[u][1])

            @pl.when(anyact > 0)
            def _():
                for u in range(n):
                    bank = acc2_ref if (banks2 and u % 2) else acc_ref
                    dep_body(j0 + u, ws[u][0], ws[u][1], bank)

        for j in range(dstep, rstep):
            w2 = rg_ref[0, j, 1]
            slot = w2 & 0xFFF

            @pl.when(w2 < 0)
            def _():
                q = (w2 >> 16) & 0xFF
                gch = (acc_ref[slot] + acc2_ref[slot] if banks2
                       else acc_ref[slot])
                o_ref[0, pl.ds(q, 1)] = gch[None].astype(o_ref.dtype)
                acc_ref[slot] = jnp.zeros_like(gch)
                if banks2:
                    acc2_ref[slot] = jnp.zeros_like(gch)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("op", "cb", "rstep", "f", "TP", "nreg", "nct",
                     "nsteps", "dstep", "banks2", "interpret", "variant"))
def triples_scatter(page, r, sub, vals, rg, tri, x2, *, op, cb, rstep, f,
                    TP, nreg, nct, nsteps, dstep, banks2, interpret=False,
                    variant="sh"):
    kernel = make_triples_kernel(op, cb, rstep, nreg, dstep, TP, banks2,
                                 variant)
    stream = lambda i: (i, 0, 0)
    stream4 = lambda i: (i, 0, 0, 0)
    ab_spec = pl.BlockSpec((1, cb * S, L), stream, memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 1, cb), stream, memory_space=pltpu.SMEM),
        ab_spec,
        ab_spec,
        ab_spec,
        pl.BlockSpec((1, rstep, 2), stream, memory_space=pltpu.SMEM),
        pl.BlockSpec((1, TP, S, L), stream4, memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    fn = pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, f, S, L), stream4,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nsteps, f, S, L), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((cb, S, L), jnp.float32),
            pltpu.VMEM((nreg, S, L), jnp.float32),
            pltpu.VMEM((nreg if banks2 else 1, S, L), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_cparams(interpret),
    )
    return fn(page, r, sub, vals, rg, tri, x2)


def main():
    config = EngineConfig(mxu_precision="default",
                          layout_cache=".layout_cache")
    csr = iccad_standin(graph, scale=scale, seed=1)
    work = _prep(csr, config, degree_sort=True)
    lay = pack_cached("planar", work, config, log=print, deal="free")
    nct = lay.num_col_tiles
    print(f"{graph} s{scale}: rr={lay.region_rows} nsteps={lay.nsteps} "
          f"cb={lay.cb} dstep={lay.dstep} f={lay.f} dmax={lay.dmax} "
          f"slots={lay.num_slots}", flush=True)
    npieces = int((lay.rg[:, :lay.dstep, 1] > 0).sum())
    planes_mb = lay.planes.nbytes / 1e6
    tw = planes_to_triples(lay)
    print(f"pieces={npieces} planes {planes_mb:.1f} MB -> triples "
          f"{tw.nbytes/1e6:.1f} MB ({planes_mb/max(tw.nbytes/1e6,1e-9):.0f}x)",
          flush=True)

    rng = np.random.default_rng(3)
    x = rng.random((nct, S, L), np.float32)
    args = dict(op=OpType.MULADD, cb=lay.cb, rstep=lay.rstep, f=lay.f,
                TP=tw.shape[1], nreg=lay.num_slots, nct=nct,
                nsteps=lay.nsteps, dstep=lay.dstep, banks2=True)
    page = jnp.asarray(np.pad(lay.a_page, (0, lay.nsteps * lay.cb
                                           - len(lay.a_page)))
                       .reshape(lay.nsteps, 1, lay.cb))
    r = jnp.asarray(lay.a_r.reshape(lay.nsteps, lay.cb * S, L))
    sub = jnp.asarray(lay.a_sub.reshape(lay.nsteps, lay.cb * S, L))
    vals = jnp.asarray(lay.a_vals.reshape(lay.nsteps, lay.cb * S, L))
    rg = jnp.asarray(_rg_flat(lay.rg))
    planes = jnp.asarray(lay.planes)
    tri = jnp.asarray(tw)
    xj = jnp.asarray(x)

    t0 = time.perf_counter()
    out_old = np.asarray(_planar_scatter_call(
        page, r, vals, rg, planes, xj, sub,
        op=OpType.MULADD, cb=lay.cb, rstep=lay.rstep, f=lay.f,
        dmax=lay.dmax, nreg=lay.num_slots, nct=nct, nsteps=lay.nsteps,
        interpret=False, dtype="float32", dstep=lay.dstep, banks2=True))
    print(f"old compiled+ran in {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    out_new = np.asarray(triples_scatter(page, r, sub, vals, rg, tri, xj,
                                         **args))
    print(f"new compiled+ran in {time.perf_counter()-t0:.1f}s", flush=True)
    # padding flush slots are uninitialized in both kernels: mask to real
    msk = (lay.c_code.reshape(lay.nsteps, lay.f) >= 0)[:, :, None, None]
    ok = np.where(msk, out_old == out_new, True)
    if not ok.all():
        bad = np.nonzero(~ok)
        print(f"MISMATCH at {len(bad[0])} positions; first "
              f"{[b[:5] for b in bad]}", flush=True)
        sys.exit(1)
    print("BITWISE EQUAL", flush=True)

    floor = measure_floor(jax, jnp)
    print(f"floor {floor*1e3:.2f} ms", flush=True)
    iters = 20

    def mk_loop(fn):
        # big streams ride as jit ARGUMENTS (a closure capture serializes
        # them into the HLO -> remote-compile HTTP 413 at full scale)
        def loop(ops, x_):
            def body(_i, carry):
                x2 = x_.at[0, 0, 0].add(carry * 1e-20)
                out = fn(ops, x2)
                return carry + out[0, 0, 0, 0] * 1e-20
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return jax.jit(loop)

    ops_old = (page, r, vals, rg, planes, sub)
    ops_new = (page, r, sub, vals, rg, tri)
    old_loop = mk_loop(lambda o, x_: _planar_scatter_call(
        o[0], o[1], o[2], o[3], o[4], x_, o[5],
        op=OpType.MULADD, cb=lay.cb, rstep=lay.rstep, f=lay.f,
        dmax=lay.dmax, nreg=lay.num_slots, nct=nct, nsteps=lay.nsteps,
        interpret=False, dtype="float32", dstep=lay.dstep, banks2=True))
    new_loop = mk_loop(lambda o, x_: triples_scatter(
        o[0], o[1], o[2], o[3], o[4], o[5], x_, **args))
    u32_loop = mk_loop(lambda o, x_: triples_scatter(
        o[0], o[1], o[2], o[3], o[4], o[5], x_, variant="u32", **args))

    runs = (("old", old_loop, ops_old), ("new", new_loop, ops_new),
            ("u32", u32_loop, ops_new))
    for name, lp, o in runs:
        t0 = time.perf_counter()
        np.asarray(lp(o, xj))
        print(f"{name} loop compiled in {time.perf_counter()-t0:.0f}s",
              flush=True)
    best = {"old": float("inf"), "new": float("inf"), "u32": float("inf")}
    for _ in range(reps):
        for name, lp, o in runs:
            t0 = time.perf_counter()
            np.asarray(lp(o, xj))
            best[name] = min(best[name],
                             (time.perf_counter() - t0 - floor) / iters)
    for name, t in best.items():
        print(f"{name}: {t*1e3:8.3f} ms ({t/max(npieces,1)*1e9:6.1f} "
              f"ns/piece)", flush=True)


if __name__ == "__main__":
    main()
