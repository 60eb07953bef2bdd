"""Scatter-kernel variant A/B harness (TPU): isolates where the per-
descriptor time goes. Usage: python tools/router_ab.py [variants...]

Variants:
  base      - the shipping kernel
  nodep     - gathers only, deposits skipped        (grid + phase-A floor)
  dslice    - nodep with dynamic-slice page select  (vs ax0 broadcast gather)
  nogather  - nodep without the ax1 element gather  (phase-A fixed costs)
  noroll    - deposits without the 3 rolls          (roll cost)
  fixedacc  - deposits into acc slot 0              (dynamic-index cost)
  nowhen    - deposits without the pl.when guard    (branch cost)
  smem      - descriptors from SMEM scalar prefetch (VMEM scalar-read cost)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from graphlily_tpu import EngineConfig
from graphlily_tpu.io import iccad_standin, util_round_csr_matrix_dim
from graphlily_tpu.io.formatter import util_normalize_csr_matrix_by_outdegree
from graphlily_tpu.io.router_format import pack_router, CHUNK
from graphlily_tpu.ops.router_pallas import _rg_flat

S, L = 8, 128


def make_kernel(cb, rstep, nreg, variant):
    smem = variant == "smem"

    def kernel(*refs):
        if smem:
            rgs_ref, page_ref, r_ref, v_ref, x_ref, o_ref, g_buf, acc_ref = refs
        else:
            page_ref, r_ref, v_ref, rg_ref, x_ref, o_ref, g_buf, acc_ref = refs
        i = pl.program_id(0)
        if variant == "empty":
            o_ref[0, 0] = v_ref[0, :S, :]
            return
        if variant == "nocast":
            for k in range(cb):
                g_buf[k] = v_ref[0, k * S:(k + 1) * S, :]
            o_ref[0, 0] = g_buf[cb - 1]
            return
        r_all = r_ref[0].astype(jnp.int32)
        if variant == "castonly":
            o_ref[0, 0] = r_all[:S, :].astype(jnp.float32)
            return
        for k in range(cb):
            p = page_ref[0, 0, k]
            if variant == "dslice":
                row = x_ref[p // 8, pl.ds(p % 8, 1), :]       # (1, 128)
                xp = jnp.broadcast_to(row, (S, L))
            else:
                t = x_ref[p // 8]
                xp = jnp.take_along_axis(
                    t, jnp.full((S, L), p % 8, jnp.int32), 0)
            if variant == "nogather":
                g = xp
            else:
                g = jnp.take_along_axis(
                    xp, r_all[k * S:(k + 1) * S, :], axis=1)
            g_buf[k] = g * v_ref[0, k * S:(k + 1) * S, :]

        lane_i = jax.lax.broadcasted_iota(jnp.int32, (S, L), 1)
        flat_i = jax.lax.broadcasted_iota(jnp.int32, (S, L), 0) * L + lane_i
        if variant in ("nodep", "dslice", "nogather"):
            o_ref[0, 0] = g_buf[cb - 1]
            return
        for j in range(rstep):
            if smem:
                w1 = rgs_ref[i, j, 0]
                w2 = rgs_ref[i, j, 1]
            else:
                w1 = rg_ref[0, j, 0]
                w2 = rg_ref[0, j, 1]
            ln = w2 >> 16
            slot = w2 & 0xFFF

            def deposit():
                # w1 = dst10 | dl7<<10 | ds3<<17 | k8<<20 (precomputed)
                dst = w1 & 0x3FF
                dl = (w1 >> 10) & 0x7F
                ds = (w1 >> 17) & 0x7
                k = w1 >> 20
                g = g_buf[k]
                if variant == "noroll":
                    y = g
                else:
                    r1 = pltpu.roll(g, dl, 1)
                    y = jnp.where(lane_i >= dl,
                                  pltpu.roll(r1, ds, 0),
                                  pltpu.roll(r1, (ds + 1) % S, 0))
                m = jnp.logical_and(flat_i >= dst, flat_i < dst + ln)
                sl = 0 if variant == "fixedacc" else slot
                acc_ref[sl] = jnp.where(m, y, acc_ref[sl])

            if variant == "when":
                pl.when(w2 > 0)(deposit)
            else:
                deposit()

            @pl.when(w2 < 0)
            def _():
                q = (w2 >> 16) & 0xFF
                o_ref[0, pl.ds(q, 1)] = jnp.where(flat_i < w1,
                                                  acc_ref[slot], 0.0)[None]

    return kernel


def run(lay, x2, variant):
    cb, rstep, f, nreg = lay.cb, lay.rstep, lay.f, lay.num_regions
    kernel = make_kernel(cb, rstep, nreg, variant)
    stream = (lambda i, c: (i, 0, 0)) if variant == "smem" else (lambda i: (i, 0, 0))
    in_specs = [
        pl.BlockSpec((1, 1, cb), stream, memory_space=pltpu.SMEM),
        pl.BlockSpec((1, cb * S, L), stream, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cb * S, L), stream, memory_space=pltpu.VMEM),
    ]
    args = [jnp.asarray(lay.a_page.reshape(lay.nsteps, 1, cb)),
            jnp.asarray(lay.a_r.reshape(lay.nsteps, cb * S, L)),
            jnp.asarray(lay.a_vals.reshape(lay.nsteps, cb * S, L))]
    if variant != "smem":
        in_specs.append(pl.BlockSpec((1, rstep, 2), stream,
                                     memory_space=pltpu.SMEM))
        args.append(jnp.asarray(_rg_flat(lay.rg)))
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    args.append(x2)
    kwargs = dict(
        out_specs=pl.BlockSpec((1, f, S, L),
                               (lambda i, c: (i, 0, 0, 0)) if variant == "smem"
                               else (lambda i: (i, 0, 0, 0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((lay.nsteps, f, S, L), jnp.float32),
        scratch_shapes=[pltpu.VMEM((cb, S, L), jnp.float32),
                        pltpu.VMEM((nreg, S, L), jnp.float32)],
    )
    if variant == "smem":
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(lay.nsteps,), in_specs=in_specs,
            out_specs=kwargs["out_specs"], scratch_shapes=kwargs["scratch_shapes"])
        fn = pl.pallas_call(kernel, grid_spec=gs,
                            out_shape=kwargs["out_shape"])
        call = lambda: fn(jnp.asarray(_rg_flat(lay.rg)), *args)
    else:
        fn = pl.pallas_call(kernel, grid=(lay.nsteps,), in_specs=in_specs,
                            **kwargs)
        call = lambda: fn(*args)

    iters = 50

    @jax.jit
    def loop():
        def body(_i, acc):
            out = call()
            return acc + out[0, 0, 0, 0] * 0.0
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    np.asarray(loop())
    t0 = time.perf_counter()
    np.asarray(loop())
    dt = (time.perf_counter() - t0) / iters
    print(f"{variant:9s}: {dt*1e3:8.3f} ms", flush=True)


def main():
    cb = 8
    args = []
    for a in sys.argv[1:]:
        if a.startswith("--cb="):
            cb = int(a.split("=")[1])
        else:
            args.append(a)
    sys.argv[1:] = args
    cfg = EngineConfig(mxu_precision="default")
    g = iccad_standin("googleplus", scale=1.0, seed=0)
    util_round_csr_matrix_dim(g, 1024, 1024)
    util_normalize_csr_matrix_by_outdegree(g)
    lay = pack_router(g, cfg, cb=cb)
    print(f"nsteps={lay.nsteps} rstep={lay.rstep} f={lay.f} "
          f"rg={lay.rg.nbytes/1e6:.1f}MB", flush=True)
    x2 = jnp.ones((lay.num_col_tiles, S, L), jnp.float32)
    for v in (sys.argv[1:] or ["base", "nodep", "noroll", "when"]):
        try:
            run(lay, x2, v)
        except Exception as e:
            print(f"{v:9s}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
