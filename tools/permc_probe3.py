#!/usr/bin/env python
"""PERM-C v3 reduce probe: prefix-difference with a BATCHED tri matmul.

permc_probe2.py showed prefix-diff kills the (L,L) lo one-hot build
(nodot: 63-110 ns/flush vs production 172) but the per-chunk
(8,128)@(128,128) prefix dot eats most of the win back (permc2 full:
153 ns/flush at rh=64) — each tiny dot uses 8/128 MXU rows.  This probe
computes ALL chunks' prefixes in ONE (cbc*8,128)@(128,128) pass per grid
step, outside the per-chunk activity guards, so the MXU runs at full row
utilization (~16x fewer MXU passes) and the per-chunk bodies reduce to
two lane gathers + the hi one-hot + tree add.

Variants at rh in {64, 32, 16}:
  old      — production _router_reduce_call
  permc3   — batched tri dot + prefix-diff
  permc3_f — batched tri dot in bf16->f32 (MXU fast path) [precision risk:
             kept only to bound the dot's cost share]

Usage: python tools/permc_probe3.py [nsteps] [f]
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graphlily_tpu.ops.router_pallas import (_router_reduce_call, _cparams,
                                             S, L)
from bench import measure_floor

nsteps = int(sys.argv[1]) if len(sys.argv) > 1 else 994
f = int(sys.argv[2]) if len(sys.argv) > 2 else 38


def make_permc3_kernel(cbc, rh, prec):
    def kernel(code_ref, g_ref, hi_ref, end_ref, beg_ref, o_ref, p_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        hi_t = jax.lax.broadcasted_iota(jnp.int32, (rh, L), 0)
        tri = (jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
               <= jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
               ).astype(jnp.float32)
        # ONE full-width prefix pass for the whole step's chunks
        g_all = g_ref[0].reshape(cbc * S, L).astype(jnp.float32)
        p_ref[...] = jax.lax.dot(g_all, tri, precision=prec)

        CG = 4
        for k0 in range(0, cbc, CG):
            n = min(CG, cbc - k0)
            cs = [code_ref[0, 0, k0 + u] for u in range(n)]
            anyact = cs[0]
            for u in range(1, n):
                anyact = jnp.maximum(anyact, cs[u])

            @pl.when(anyact >= 0)
            def _():
                for u in range(n):
                    k = k0 + u
                    c = cs[u]
                    g = p_ref[k * S:(k + 1) * S, :]
                    ei = end_ref[0, k * S:(k + 1) * S, :].astype(jnp.int32)
                    bi = beg_ref[0, k * S:(k + 1) * S, :].astype(jnp.int32)
                    e = jnp.take_along_axis(g, ei & 127, axis=1)
                    b = jnp.take_along_axis(g, bi & 127, axis=1)
                    seg = jnp.where(bi < 0, e, e - b)
                    hi8 = hi_ref[0, k * S:(k + 1) * S, :].astype(jnp.int32)
                    parts = [
                        (hi_t == hi8[s:s + 1, :]).astype(jnp.float32)
                        * seg[s:s + 1, :]
                        for s in range(S)]
                    while len(parts) > 1:
                        parts = [parts[i] + parts[i + 1]
                                 for i in range(0, len(parts), 2)]
                    acc = jnp.where(c >= 0, parts[0], 0.0)
                    o_ref[jnp.maximum(c, 0)] += acc

    return kernel


@functools.partial(jax.jit, static_argnames=("cbc", "nregions", "rh",
                                             "nsteps_", "fast"))
def permc3_reduce(code, g, hi, end, beg, *, cbc, nregions, rh, nsteps_,
                  fast=False):
    prec = (jax.lax.Precision.DEFAULT if fast
            else jax.lax.Precision.HIGHEST)
    kernel = make_permc3_kernel(cbc, rh, prec)
    stream = lambda i: (i, 0, 0)
    fn = pl.pallas_call(
        kernel,
        grid=(nsteps_,),
        in_specs=[
            pl.BlockSpec((1, 1, cbc), stream, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, cbc, S, L), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cbc * S, L), stream, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cbc * S, L), stream, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cbc * S, L), stream, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nregions, rh, L), jnp.float32),
        scratch_shapes=[pltpu.VMEM((cbc * S, L), jnp.float32)],
        interpret=False,
        compiler_params=_cparams(False),
    )
    return fn(code, g, hi, end, beg)


def main():
    rng = np.random.default_rng(7)
    NR64 = 200
    code_np = rng.integers(0, NR64, (nsteps, 1, f), dtype=np.int32)
    code_np[rng.random((nsteps, 1, f)) > 0.805] = -1
    nflush = int((code_np >= 0).sum())
    g_np = rng.random((nsteps, f, S, L), dtype=np.float32)
    hi_np = rng.integers(0, 64, (nsteps, f * S, L), dtype=np.int8)
    lo_np = rng.integers(0, 128, (nsteps, f * S, L)).astype(np.int8)
    end_np = rng.integers(0, 128, (nsteps, f * S, L)).astype(np.int8)
    beg_np = (rng.integers(0, 128, (nsteps, f * S, L)) - 64).astype(np.int8)

    g = jnp.asarray(g_np)
    hi = jnp.asarray(hi_np)
    lo = jnp.asarray(lo_np)
    end = jnp.asarray(end_np)
    beg = jnp.asarray(beg_np)
    print(f"nsteps={nsteps} f={f} active flushes={nflush} "
          f"g stream={g_np.nbytes/1e6:.0f} MB", flush=True)

    floor = measure_floor(jax, jnp)
    print(f"floor {floor*1e3:.2f} ms", flush=True)
    iters = 20

    def time_loop(fn, code):
        def loop(code_, gg):
            def body(_i, carry):
                g2 = gg.at[0, 0, 0, 0].add(carry.astype(gg.dtype) * 1e-20)
                blocks = fn(code_, g2)
                return carry + blocks[0, 0, 0] * 1e-20
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        lj = jax.jit(loop)
        t0 = time.perf_counter()
        np.asarray(lj(code, g))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(lj(code, g))
            best = min(best, (time.perf_counter() - t0 - floor) / iters)
        return best, compile_s

    for rh, nreg in ((64, NR64), (32, 2 * NR64), (16, 4 * NR64)):
        code = jnp.asarray(np.clip(code_np, -1, nreg - 1))
        hi_r = jnp.asarray(np.clip(hi_np, -1, rh - 1))
        old = lambda c, gg: _router_reduce_call(
            c, gg, hi_r, lo, cbc=f, nregions=nreg, rh=rh, nsteps=nsteps,
            mxu_precision="default", interpret=False, dtype="float32")
        t, cs = time_loop(old, code)
        print(f"old     rh={rh:3d}: {t*1e3:8.3f} ms "
              f"({t/nflush*1e9:6.1f} ns/flush, compile {cs:.0f}s)",
              flush=True)
        for fast in (False, True):
            new = lambda c, gg, fast=fast: permc3_reduce(
                c, gg, hi_r, end, beg, cbc=f, nregions=nreg, rh=rh,
                nsteps_=nsteps, fast=fast)
            t, cs = time_loop(new, code)
            name = f"permc3{'_f' if fast else ''} rh={rh}"
            print(f"{name:16s}: {t*1e3:8.3f} ms "
                  f"({t/nflush*1e9:6.1f} ns/flush, compile {cs:.0f}s)",
                  flush=True)


if __name__ == "__main__":
    main()
