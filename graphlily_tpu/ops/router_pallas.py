"""Router SpMV engine: gather -> radix-scatter -> region-reduce.

The scalable SpMV for graphs whose (row-window x col-tile) density is too low
for the chunked dual-gather layout (ops/spmv_pallas.py). Consumes the layout
built by io/router_format.py (which precomputes EVERY index: only values move
at runtime; they ride as bf16 when MXU precision is "default").

Two execution modes over the same layout:

  FUSED (default whenever x + output + accumulators fit VMEM, ~16 MB/core):
  one kernel, grid over A-chunk batches —
    1. phase A: per A-chunk, chained ax0+ax1 dynamic_gather against the
       resident x tile (the ax0 index is the chunk's constant page%8 plane —
       positional gathers compose as t[sub[s, r[s,l]], r[s,l]], so the
       sublane plane must be constant across the whole chunk, padding
       included), g = val (x) x[col];
    2. phase B: walk the step's SMEM descriptor stream — deposits move flat
       runs of g into per-region (8,128) VMEM accumulators (one dynamic lane
       roll, two sublane rolls, masked merge at the precomputed cursor);
       flushes copy the masked accumulator into an f-slot VMEM ring;
    3. phase C: after the descriptor loop, each flush ordinal with a region
       code >= 0 is one-hot placed into the VMEM-resident (nregions, rh, 128)
       output on the MXU (hi one-hot x lo-masked value dots, rh =
       region_rows/128). The value stream never round-trips HBM.

  SPLIT (large graphs): the same phases as two kernels with an HBM flush
  stream between them — x resident in the scatter, output resident in the
  reduce, each within VMEM on its own.

Counterpart of the reference's bounded 2-D partitioned SpMV
(graphlily/hw/kernel_spmv_impl.h:470-513); the radix scatter plays the role
of its shuffle stage, done through static schedules instead of a crossbar.
Supported semirings: MULADD, ANDOR (see router_format.py for why tropical
stays on the chunked kernel).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import EngineConfig, DEFAULT_CONFIG
from ..semiring import Semiring, OpType, MaskType, apply_mask, FLOAT_INF
from ..io.router_format import RouterSpMVLayout, CHUNK

S = 8
L = 128

# XLA's scoped-VMEM default is 16 MiB — a compiler allowance, NOT the v5e
# hardware (128 MiB VMEM/core). Raising the per-kernel cap lets the fused
# single-kernel pipelines (x + output + accumulators resident) cover graphs
# the 16 MiB default rejects; verified on-chip (pokec fused compiled at
# 16.02 MiB scoped and runs correctly with the raised cap).
VMEM_CAP = 64 * 1024 * 1024


def _cparams(interpret: bool):
    return None if interpret else pltpu.CompilerParams(
        vmem_limit_bytes=VMEM_CAP)

# Exact tropical encoding (see io/tropical_format.py): for v >= 0 the f32
# bit pattern is order-preserving, so INF_BITS - bits(sat(v+x)) is an exact
# order-REVERSING integer map with E(FLOAT_INF) = 0 — the scatter's
# flush/padding zeros become the max-identity and the reduce is an int32 max.
INF_BITS = int(np.float32(FLOAT_INF).view(np.int32))


def _tropical_encode(vals, g):
    """E(min(val + x, INF)) as int32; val pad = FLOAT_INF annihilates."""
    p = jnp.minimum(vals + g, jnp.float32(FLOAT_INF))
    return INF_BITS - jax.lax.bitcast_convert_type(p, jnp.int32)


def _stream_map(pred: bool, ndim: int = 3):
    """Per-step stream index map; with `pred`, grid step i is remapped to
    layout step sm[i] through the scalar-prefetch arrays (step compaction:
    repeated tail indices skip the DMA entirely)."""
    zeros = (0,) * (ndim - 1)
    if pred:
        return lambda i, sm, na: (sm[i],) + zeros
    return lambda i: (i,) + zeros


def _onehot_place(gch, hi8, lo8, rh: int, precision, ablate: str = ""):
    """One-hot MXU placement of a flushed (8,128) chunk into (rh, 128)
    region rows: out[h, v] = sum_m [hi_m==h] * g_m * [lo_m==v].

    The values FOLD INTO THE HI FACTOR (ohg = indicator * g) so the lo
    factor is a pure indicator — this removes the (128,128) where-select
    per sublane that the previous (oh_hi, lo-masked-values) formulation
    paid (~20-25% of the dominant VPU build cost; same single bf16
    rounding of g at DEFAULT MXU precision). Both factors stay slot-major
    in lanes (one-hot targets ride the sublane dim), so no transposes
    appear — Mosaic contracts lane dims natively.

    Build dtype is f32 END OF STORY on this libtpu: the reduce is
    VPU-BUILD-bound (tools/reduce_ablate.py: builds-only = 88% of full,
    dots-only = 51%) and 16-bit one-hot vregs would halve the build
    volume, but every narrow path is rejected by Mosaic/hardware —
    bf16 vector compares ("unsupported"), int32-compare->bf16-select
    (i1 mask relayout (8,128)->(16,128) "Non-singleton logical dimension
    is replicated in destination but not in source"), int16 iota
    ("16-bit iota not supported by hardware"), and int16 compares
    ("Target does not support this comparison")."""
    hi_t = jax.lax.broadcasted_iota(jnp.int32, (rh, L), 0)
    lo_t = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    parts = []
    for s in range(S):
        g = gch[s:s + 1, :].astype(jnp.float32)
        if ablate == "nobuilds":   # dots only, loop-invariant one-hots
            ohg = jnp.broadcast_to(g, (rh, L))
            ohlo = (lo_t == 0).astype(jnp.float32)
        else:
            ohg = (hi_t == hi8[s:s + 1, :]).astype(jnp.float32) * g
            ohlo = (lo_t == lo8[s:s + 1, :]).astype(jnp.float32)
        if ablate == "nodots":     # builds only; keep them DCE-proof
            parts.append(ohg * jnp.sum(ohlo, axis=0, keepdims=True))
            continue
        parts.append(jax.lax.dot_general(
            ohg, ohlo, (((1,), (1,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32))
    # pairwise tree sum: a serial `accd += dot` chain costs 8x the MXU
    # latency (~19 cycles/dot measured, tools/router_e2e.py ablation);
    # independent dots pipeline, the VPU pays 7 cheap (rh,L) adds
    while len(parts) > 1:
        parts = [parts[i] + parts[i + 1] for i in range(0, len(parts), 2)]
    return parts[0]


def _permc_place(g_pref, hi8, end8, beg8, rh: int):
    """PERM-C prefix-difference placement of one flushed chunk (see
    io/permc_format.py): `g_pref` is the (8,128) inclusive prefix of the
    flushed accumulator along lanes; each destination lane v (== the row's
    lo, unique per sublane by the cap-1 pack constraint) carries its row's
    contiguous-run sum P[end] - P[beg] (beg < 0 -> P[end]); the (L,L) lo
    one-hot build of _onehot_place disappears — only the hi one-hot
    remains. ~126 ns/flush at rh=64 vs 175 (tools/permc_probe3.py)."""
    e = jnp.take_along_axis(g_pref, end8 & 127, axis=1)
    b = jnp.take_along_axis(g_pref, beg8 & 127, axis=1)
    seg = jnp.where(beg8 < 0, e, e - b)
    hi_t = jax.lax.broadcasted_iota(jnp.int32, (rh, L), 0)
    parts = [(hi_t == hi8[s:s + 1, :]).astype(jnp.float32) * seg[s:s + 1, :]
             for s in range(S)]
    while len(parts) > 1:
        parts = [parts[i] + parts[i + 1] for i in range(0, len(parts), 2)]
    return parts[0]


def _permc_prefix(gv, precision_unused=None):
    """One batched inclusive prefix along lanes for a whole step's flush
    block: (M, L) @ upper-triangular (L, L) on the MXU. ALWAYS at HIGHEST
    precision: prefix differences amplify input rounding by the P/seg
    ratio (up to ~128x), so the bf16 DEFAULT path is numerically unsafe
    here; HIGHEST costs ~8% of the reduce (probe3: 126 vs 115.6 ns)."""
    tri = (jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
           <= jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
           ).astype(jnp.float32)
    return jax.lax.dot(gv.astype(jnp.float32), tri,
                       precision=jax.lax.Precision.HIGHEST)


def _make_scatter_kernel(op: OpType, cb: int, rstep: int, nreg: int,
                         fuse: bool = False, rh: int = 0, precision=None,
                         fnum: int = 0, ablate: str = "",
                         banks2: bool = True, dstep: int = 0,
                         predicated: bool = False):
    """Phases A+B (gather -> radix deposit). With `fuse`, phase C (the
    one-hot MXU region reduce) runs INLINE at each flush — the value stream
    never round-trips HBM (the split pipeline pays ~124 MB read+write on the
    googleplus stand-in against a measured ~95 GB/s streaming ceiling) and
    the reduce's MXU dots overlap the deposits' VPU rolls.

    `predicated`: scalar-prefetch sm/na step compaction for SpMSpV — see
    _make_planar_kernel."""
    def kernel(*refs):
        if predicated:
            sm_ref, na_ref, *refs = refs
        if fuse:
            (page_ref,            # (1, 1, cb) int32 SMEM : 1024-col tile ids
             r_ref,               # (1, cb*8, 128) int8 : lane = col & 127
             sub_ref,             # (1, cb*8, 128) int8 : sublane = (col>>7)&7
             v_ref,               # (1, cb*8, 128) f32|bf16
             rg_ref,              # (1, 1, 2*rstep) int32 SMEM (w1,w2 interleaved)
             code_ref,            # (1, 1, f) int32 SMEM : region per ordinal
             hi_ref,              # (1, f*8, 128) int8, flush-ordinal aligned
             lo_ref,              # (1, f*8, 128) int8
             x_ref,               # (nct, 8, 128) resident
             o_ref,               # (nregions, rh, 128) resident output
             g_buf, acc_ref, acc2_ref, ring_ref) = refs
        else:
            (page_ref, r_ref, sub_ref, v_ref, rg_ref, x_ref,
             o_ref,               # (1, f, 8, 128) flush block
             g_buf,               # scratch (cb, 8, 128)
             acc_ref,             # scratch (nreg, 8, 128), even slots' bank
             acc2_ref) = refs     # odd slots' bank (see banks note below)

        @pl.when(pl.program_id(0) == 0)
        def _():
            # banks MUST start zeroed: a flush sums both banks, and a
            # position's range is written in only one of them — the other
            # bank's uninitialized garbage would leak into the first cycle
            # (the single-bank kernel was safe uninitialized: its cursor
            # mask only exposed written positions)
            acc_ref[...] = jnp.zeros_like(acc_ref)
            if banks2:
                acc2_ref[...] = jnp.zeros_like(acc2_ref)
            if fuse:
                o_ref[...] = jnp.zeros_like(o_ref)

        def _bigbody():
            # ---- phase A: chained ax0+ax1 dynamic gather for cb chunks --------
            # full 1024-col tile reach: xp[s,l] = t[sub[s,l], l], then
            # g[s,l] = xp[s, lane[s,l]] -- both gather forms measured fast
            # (79 / 35 G elem/s) on this chip
            r_all = r_ref[0].astype(jnp.int32)
            sub_all = sub_ref[0].astype(jnp.int32)
            for k in range(cb):
                t = x_ref[page_ref[0, 0, k]]                    # (8, 128) tile
                xp = jnp.take_along_axis(
                    t, sub_all[k * S:(k + 1) * S, :], axis=0)
                g = jnp.take_along_axis(xp, r_all[k * S:(k + 1) * S, :], axis=1)
                vals = v_ref[0, k * S:(k + 1) * S, :].astype(g.dtype)
                if op == OpType.MULADD:
                    g = g * vals
                elif op == OpType.ANDOR:
                    g = jnp.logical_and(vals != 0, g != 0).astype(g.dtype)
                else:
                    raise ValueError(op)
                g_buf[k] = g

            # ---- phase B: deposits + inline flushes ----------------------------
            # descriptors arrive through SMEM (scalar memory): per-descriptor
            # reads are ~2 cycles vs ~100 for VMEM scalar loads, and the pl.when
            # guard lets Mosaic skip the (dominant) dynamic rolls on inactive
            # slots — measured 18.5 -> 4.7 ms on the googleplus stand-in
            # (tools/router_ab.py).
            #
            # BANKS: every deposit RMWs the accumulator at a DYNAMIC slot, so
            # the compiler must serialize all of them against each other. Two
            # scratch banks picked by STATIC descriptor parity split that into
            # two independent chains (deposits of one region cycle write
            # disjoint ranges on a zero background, so the where-merges
            # distribute across banks and the flush sums them).
            lane_i = jax.lax.broadcasted_iota(jnp.int32, (S, L), 1)
            flat_i = jax.lax.broadcasted_iota(jnp.int32, (S, L), 0) * L + lane_i

            def _fused_tail():
                # ---- inline phase C, AFTER the descriptor loop: one reduce per
                # flush ordinal (code stream: region id, -1 = no flush this
                # step). Batched CG to a shared any-active guard like the
                # deposits — a pl.when per ordinal is a scheduling barrier that
                # serializes the builds' and dots' latency chains; inactive
                # members are masked to zero before the output RMW.
                if ablate == "noC":
                    return
                hi_all = hi_ref[0].astype(jnp.int32)
                lo_all = lo_ref[0].astype(jnp.int32)
                CG = 4
                for q0 in range(0, fnum, CG):
                    n = min(CG, fnum - q0)
                    cs = [code_ref[0, 0, q0 + u] for u in range(n)]
                    anyact = cs[0]
                    for u in range(1, n):
                        anyact = jnp.maximum(anyact, cs[u])

                    @pl.when(anyact >= 0)
                    def _():
                        for u in range(n):
                            qq = q0 + u
                            c = cs[u]
                            accd = _onehot_place(ring_ref[qq],
                                                 hi_all[qq * S:(qq + 1) * S, :],
                                                 lo_all[qq * S:(qq + 1) * S, :],
                                                 rh, precision, ablate)
                            accd = jnp.where(c >= 0, accd, 0.0)
                            safe = jnp.maximum(c, 0)
                            if ablate == "noacc":   # tiny static RMW
                                o_ref[0, 0:1] += accd[0:1].astype(o_ref.dtype)
                            else:
                                o_ref[safe] += accd.astype(o_ref.dtype)

            def dep_body(w1, w2, bank):
                """One deposit; no-op when w2 is not a deposit word (ln<=0)."""
                ln = w2 >> 16
                dst = w1 & 0x3FF
                dl = (w1 >> 10) & 0x7F
                ds = (w1 >> 17) & 0x7
                k = w1 >> 20
                g = g_buf[k]
                r1 = pltpu.roll(g, dl, 1)
                t = pltpu.roll(r1, ds, 0)
                y = jnp.where(lane_i >= dl, t, pltpu.roll(t, 1, 0))
                m = jnp.logical_and(flat_i >= dst, flat_i < dst + ln)
                bank[slot_of(w2)] = jnp.where(m, y, bank[slot_of(w2)])

            def slot_of(w2):
                return w2 & 0xFFF

            # ---- phase-ordered stream (layout v3): the step's deposit slots
            # [0, dstep) run FIRST, batched DG to a shared any-active guard —
            # one pl.when per descriptor serializes the bodies' ~55-cycle roll
            # chains (measured 2.2 ms of the googleplus scatter; batch-4 guards
            # recovered 1.3 ms). Safe because the pack rotates each region's
            # cycles through K accumulator slots, so no slot is flushed and
            # re-deposited within one step. Flushes occupy [dstep, rstep).
            DG = 8
            for j0 in range(0, dstep, DG):
                n = min(DG, dstep - j0)
                ws = [(rg_ref[0, 0, 2 * (j0 + u)], rg_ref[0, 0, 2 * (j0 + u) + 1])
                      for u in range(n)]
                anyact = ws[0][1]
                for u in range(1, n):
                    anyact = jnp.maximum(anyact, ws[u][1])

                @pl.when(anyact > 0)
                def _():
                    for u in range(n):
                        bank = acc2_ref if (banks2 and u % 2) else acc_ref
                        dep_body(ws[u][0], ws[u][1], bank)

            for j in range(dstep, rstep):
                w1 = rg_ref[0, 0, 2 * j]
                w2 = rg_ref[0, 0, 2 * j + 1]
                slot = w2 & 0xFFF

                @pl.when(w2 < 0)   # flush: slot12 | q8<<16 | 1<<31
                def _():
                    q = (w2 >> 16) & 0xFF
                    cur = w1
                    both = (acc_ref[slot] + acc2_ref[slot] if banks2
                            else acc_ref[slot])
                    gch = jnp.where(flat_i < cur, both, 0.0)
                    if not fuse:
                        # HBM flush stream may ride narrower than the f32
                        # accumulator (bf16 when the reduce dot rounds to bf16
                        # anyway at DEFAULT precision: halves the round-trip)
                        o_ref[0, pl.ds(q, 1)] = gch[None].astype(o_ref.dtype)
                    else:
                        ring_ref[pl.ds(q, 1)] = gch[None]
                    # zero after drain: a deposit SKIPPED by SpMSpV predication
                    # (descriptor masked to w2=0, see _predicate_rg) then leaves
                    # true zeros in its range instead of stale previous-cycle
                    # values; the cursor mask above keeps dense semantics exact
                    acc_ref[slot] = jnp.zeros_like(acc_ref[slot])
                    if banks2:
                        acc2_ref[slot] = jnp.zeros_like(acc2_ref[slot])

            if not fuse:
                return
            _fused_tail()

        if predicated:
            pl.when(pl.program_id(0) < na_ref[0])(_bigbody)
        else:
            _bigbody()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("op", "cb", "rstep", "f", "nreg", "nct", "nsteps",
                     "interpret", "dtype", "gdtype", "dstep", "banks2"))
def _router_scatter_call(page, r, sub, vals, rg, x2, sm=None, na=None, *,
                         op, cb, rstep, f, nreg, nct, nsteps, interpret,
                         dtype, gdtype=None, dstep=0, banks2=True):
    use2 = banks2 and not interpret
    pred = sm is not None
    kernel = _make_scatter_kernel(op, cb, rstep, nreg,
                                  banks2=use2, dstep=dstep, predicated=pred)
    stream = _stream_map(pred)
    in_specs = [
        pl.BlockSpec((1, 1, cb), stream, memory_space=pltpu.SMEM),
        pl.BlockSpec((1, cb * S, L), stream, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cb * S, L), stream, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cb * S, L), stream, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 2 * rstep), stream, memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),   # x resident
    ]
    # predicated: the out stream rides the SAME sm remap — kept steps write
    # blocks g[sm[i]]; padding steps repeat the last kept block (the kernel
    # body is skipped, so the revisited buffer still holds its data) and the
    # reduce reads back through the same remap
    out_specs = pl.BlockSpec((1, f, S, L), _stream_map(pred, ndim=4),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((nsteps, f, S, L),
                                     jnp.dtype(gdtype or dtype))
    scratch_shapes = [
        pltpu.VMEM((cb, S, L), jnp.dtype(dtype)),
        pltpu.VMEM((nreg, S, L), jnp.dtype(dtype)),
        # odd-parity bank (1-slot dummy when single-banked: the kernel
        # never touches it with banks2=False)
        pltpu.VMEM((nreg if use2 else 1, S, L), jnp.dtype(dtype)),
    ]
    fn = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2 if pred else 0,
            grid=(nsteps,), in_specs=in_specs, out_specs=out_specs,
            scratch_shapes=scratch_shapes),
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=_cparams(interpret),
    )
    if pred:
        return fn(sm, na, page, r, sub, vals, rg, x2)
    return fn(page, r, sub, vals, rg, x2)


@functools.partial(
    jax.jit,
    static_argnames=("op", "cb", "rstep", "f", "nreg", "rh", "nregions",
                     "nct", "nsteps", "mxu_precision", "interpret", "dtype",
                     "ablate", "dstep", "banks2"))
def _router_fused_call(page, r, sub, vals, rg, code, hi, lo, x2,
                       sm=None, na=None, *, op, cb,
                       rstep, f, nreg, rh, nregions, nct, nsteps,
                       mxu_precision, interpret, dtype, ablate="",
                       dstep=0, banks2=True):
    precision = (jax.lax.Precision.HIGHEST if mxu_precision == "highest"
                 else jax.lax.Precision.DEFAULT)
    use2 = banks2 and not interpret
    pred = sm is not None
    kernel = _make_scatter_kernel(op, cb, rstep, nreg, fuse=True, rh=rh,
                                  precision=precision, fnum=f, ablate=ablate,
                                  banks2=use2, dstep=dstep, predicated=pred)
    stream = _stream_map(pred)
    in_specs = [
        pl.BlockSpec((1, 1, cb), stream, memory_space=pltpu.SMEM),
        pl.BlockSpec((1, cb * S, L), stream, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cb * S, L), stream, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cb * S, L), stream, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 2 * rstep), stream, memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, f), stream, memory_space=pltpu.SMEM),
        pl.BlockSpec((1, f * S, L), stream, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, f * S, L), stream, memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),   # x resident
    ]
    fn = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2 if pred else 0,
            grid=(nsteps,), in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),  # resident out
            scratch_shapes=[
                pltpu.VMEM((cb, S, L), jnp.dtype(dtype)),
                pltpu.VMEM((nreg, S, L), jnp.dtype(dtype)),
                pltpu.VMEM((nreg if use2 else 1, S, L), jnp.dtype(dtype)),
                pltpu.VMEM((f, S, L), jnp.dtype(dtype)),
            ]),
        out_shape=jax.ShapeDtypeStruct((nregions, rh, L), jnp.dtype(dtype)),
        interpret=interpret,
        compiler_params=_cparams(interpret),
    )
    if pred:
        return fn(sm, na, page, r, sub, vals, rg, code, hi, lo, x2)
    return fn(page, r, sub, vals, rg, code, hi, lo, x2)


def _flush_minw(rg, dstep: int):
    """Host-side (engine-init) flush live-window for step compaction:
    minw[t] = the earliest step whose deposits the flushes at step t could
    drain = min over flushes at t of the FIRST deposit step inside that
    flush's slot window (r5: previously `previous flush step + 1`, which
    made every slot's FIRST flush carry window [0, t] — one active early
    page then kept every later first-cycle flush, the measured ~2.3 ms
    push-floor leak on full googleplus). A flush's window deposits exist
    only in [first_dep_step, t], so clipping there is exact at step
    granularity; windowless flushes (static padding) contribute nothing."""
    rg = np.asarray(rg)
    nsteps, rstep, _ = rg.shape
    minw = np.arange(nsteps, dtype=np.int32)
    idx = _flush_index(rg, dstep)
    if idx is None:
        return minw
    dep_step = idx["dep_flat"].astype(np.int64) // rstep
    start, end, fl_t = idx["fl_start"], idx["fl_end"], idx["fl_t"]
    has = start < end
    if has.any():
        first_step = dep_step[start[has]].astype(np.int32)
        np.minimum.at(minw, fl_t[has], first_step)
    return minw


def _chunk_activity(a_page, a_sub, active, num_col_tiles: int):
    """Per-chunk frontier activity (nsteps, cb). `active` is either
    (num_col_tiles,) tile-granular or (num_col_tiles*8,) PAGE-granular
    (128 columns — the roll flavor's natural unit: each roll A-chunk holds
    one page, whose sublane rides chunk-constant in a_sub, so no extra
    layout stream is needed). Page granularity is 8x finer than the tile
    predication VERDICT r2 flagged as too coarse for push to ever win."""
    tiles = a_page[:, 0, :]
    if active.shape[0] == num_col_tiles * 8 and a_sub is not None:
        page = tiles * 8 + a_sub[:, 0::S, 0].astype(jnp.int32)
        return jnp.take(active.astype(jnp.int32), page, axis=0, mode="clip")
    return jnp.take(active.astype(jnp.int32), tiles, axis=0, mode="clip")


def _steps_sm_na(act_chunk, minw):
    """Device-side step-compaction schedule for SpMSpV (the router/planar
    analog of the chunked engine's sm/na remap): a step is KEPT iff any
    step in its flush live-window [minw[t], t] has a frontier-active chunk.
    This keeps (a) every step with active deposits and (b) every flush
    that could drain one; a SKIPPED flush's slot is provably zero — its
    whole window was inactive, so no deposit ever executed into it, and
    the previous kept flush zeroed it. Returns (sm, na): grid step i runs
    layout step sm[i]; steps >= na repeat the last kept block (no DMA)
    and skip the kernel body."""
    nsteps = act_chunk.shape[0]
    act_step = jnp.max(act_chunk, axis=1)
    iota = jnp.arange(nsteps, dtype=jnp.int32)
    last_act = jax.lax.cummax(jnp.where(act_step > 0, iota, -1))
    kept = last_act >= minw
    sm = jnp.nonzero(kept, size=nsteps, fill_value=0)[0].astype(jnp.int32)
    na = jnp.sum(kept).astype(jnp.int32)
    last_kept = sm[jnp.maximum(na - 1, 0)]
    sm = jnp.where(iota < na, sm, last_kept)
    return sm, na.reshape(1)


def _rg_flat(rg):
    """Device-side layout of a descriptor stream: (nsteps, 1, 2*rstep).

    The natural (nsteps, rstep, 2) shape is stored by XLA:TPU with a
    T(8,128) tile over the last two dims — the 2-wide minor dim pads to
    128 (64x HBM expansion; products-scale SSSP carried 2.99 GB of padding
    for 47.8 MB of descriptor words, its single largest OOM term) and
    every grid step's SMEM DMA streams the padded bytes. The flat
    (nsteps, 1, 2*rstep) view takes a T(1,128)-style layout (~1x, like
    the established (nsteps, 1, f) SMEM streams). Words stay interleaved:
    w1 = [:, 0, 2j], w2 = [:, 0, 2j+1]. Host layouts keep the 3D shape;
    this reshape is applied once at engine init (free on numpy)."""
    n, r, two = rg.shape
    assert two == 2, rg.shape
    return rg.reshape(n, 1, 2 * r)


def _predicate_rg(rg, act_chunk, flavor: str):
    """SpMSpV work-proportional predication (counterpart of the reference's
    active-column bursts, hw/kernel_spmspv_impl.h:55-124): mask the w2 word
    of every DEPOSIT whose source chunk holds no active frontier entry
    (act_chunk from _chunk_activity — tile- or page-granular) — the
    kernel's w2==0 path then skips its (dominant) gather/roll work.
    Flushes keep running (accumulators may drain active contributions)
    and skipped ranges read zero (accumulators are zeroed at flush), which
    is exactly the skipped products' value: x is semiring-zero on inactive
    columns. Pure XLA gathers (~nsteps*rstep int32s), jit-fusable.

    `rg` rides the flat device layout (nsteps, 1, 2*rstep) — see _rg_flat."""
    w1, w2 = rg[:, 0, 0::2], rg[:, 0, 1::2]
    if flavor == "planar":
        k = w1 & 0xFF                       # chunk-in-step
    else:                                   # roll: w1 = dst|dl<<10|ds<<17|k<<20
        k = w1 >> 20
    act_d = jnp.take_along_axis(act_chunk, k, axis=1)   # (nsteps, rstep)
    dead = jnp.logical_and(w2 > 0, act_d == 0)
    return jnp.stack([w1, jnp.where(dead, 0, w2)],
                     axis=-1).reshape(rg.shape)


def _flush_index(rg, dstep: int, f: int | None = None):
    """Host-side (engine-init) index for EXACT per-flush SpMSpV predication.

    The window criterion (_flush_minw/_steps_sm_na) keeps a flush whenever
    ANY step in its live window holds a frontier-active chunk — but a slot's
    FIRST flush has window [0, t], so one active page early in the stream
    keeps every first-cycle flush after it, and a kept step runs its whole
    flush batch at full phase-C cost (~148 ns/flush). Measured on full
    googleplus (tools/push_floor.py --attr): zero-frontier floor 1.08 ms,
    yet an 11-vertex frontier still cost 3.3 ms ≈ a full pull — the gap is
    exactly these window-kept flushes.

    The exact criterion: a flush is needed iff some LIVE deposit targeted
    its accumulator slot since the slot's previous flush (stream order).
    Dead deposits never write (their in-kernel masks are empty), flushes
    zero their slot after draining and accumulators start zeroed — so a
    flush whose window holds no live deposit drains exactly zero and may be
    masked (w2 -> 0: both kernels already treat 0 as a dead descriptor).

    A live flush inside a kept step needs no descriptor masking at all: a
    dead flush that EXECUTES drains a provably-zero slot into the output
    (adding zero) and re-zeroes it — exactly its skipped semantics. So the
    index only has to answer "does step t hold any live flush" (the step
    keep-set), never "mask this flush word" — which keeps the per-call
    device work to one D-gather + cumsum + two nsteps-gathers (an earlier
    variant that also masked w2/code words through two (nsteps,rstep)-sized
    maps paid ~1 ms/call of XLA:TPU gather at googleplus scale for zero
    additional skipped work in kept steps).

    Returns stream-order numpy index arrays (device copies ride as jit
    ARGUMENTS via the module's device_state — a products-scale dep_flat is
    ~1M int32s, far past the remote compiler's constant-payload limit):
      dep_flat  (D,) deposit positions in the flat (nsteps*rstep) act_d
                plane, sorted by (slot, stream position)
      fl_start/fl_end (F,) that sorted array's [start, end) window per
                flush, in stream order
      step_off  (nsteps+1,) stream-order flush offsets per step, so
                fl_any[t] = any(live_f[step_off[t]:step_off[t+1]])
    or None for a degenerate flushless stream."""
    rg = np.asarray(rg)
    nsteps, rstep, _ = rg.shape
    w2 = rg[..., 1]
    dmask = w2[:, :dstep] > 0
    dt_, dj = np.nonzero(dmask)
    dep_pos = dt_.astype(np.int64) * rstep + dj
    dep_slot = w2[:, :dstep][dmask].astype(np.int64) & 0xFFF
    fmask = w2[:, dstep:] < 0
    ft, fjr = np.nonzero(fmask)
    if ft.size == 0:
        return None
    w2f = w2[:, dstep:][fmask].astype(np.int64)
    f_slot = w2f & 0xFFF
    f_q = (w2f >> 16) & 0xFF
    f_pos = ft.astype(np.int64) * rstep + (fjr + dstep)
    # deposits sorted by (slot, stream position); within a step all
    # deposits ([0, dstep)) precede all flushes, matching kernel order
    M = np.int64(nsteps) * rstep
    dep_key = dep_slot * M + dep_pos
    order = np.argsort(dep_key, kind="stable")
    dep_key_sorted = dep_key[order]
    # previous flush position per (slot, flush) in stream order
    forder = np.lexsort((f_pos, f_slot))
    fs, fp = f_slot[forder], f_pos[forder]
    prev = np.full(ft.size, -1, np.int64)
    if ft.size > 1:
        same = fs[1:] == fs[:-1]
        prev[1:][same] = fp[:-1][same]
    start = np.searchsorted(dep_key_sorted, fs * M + prev + 1)
    end = np.searchsorted(dep_key_sorted, fs * M + fp)
    start_u = np.empty_like(start)
    end_u = np.empty_like(end)
    start_u[forder] = start
    end_u[forder] = end
    step_off = np.zeros(nsteps + 1, np.int32)
    step_off[1:] = np.cumsum(np.bincount(ft, minlength=nsteps))
    out = dict(dep_flat=dep_pos[order].astype(np.int32),
               fl_start=start_u.astype(np.int32),
               fl_end=end_u.astype(np.int32),
               step_off=step_off, fl_t=ft.astype(np.int32))
    if f is not None:
        qmap = np.zeros((nsteps, f), np.int32)
        qmap[ft, f_q] = np.arange(1, ft.size + 1, dtype=np.int32)
        out["qmap"] = qmap
    return out


def _predicate_exact(rg, act_chunk, flavor: str, fidx):
    """Exact SpMSpV predication: deposits masked as in _predicate_rg, plus
    the EXACT step-compaction keep-set — a step runs iff it holds a live
    deposit or a live flush, where a flush is live iff a live deposit
    targeted its accumulator slot since the slot's previous flush (the
    _flush_index windows; segment-any = one gather + cumsum + two gathers
    of F + two of nsteps). Dead flushes inside kept steps run unmasked:
    they drain provably-zero slots (adding zero) and re-zero them, which
    IS their skipped semantics — see _flush_index.

    Returns (rg_pred, code_mask (nsteps,1,f) bool, sm, na). The code mask
    (one small (nsteps,f) gather) disables the phase-C builds of dead
    flushes inside kept steps — the flush COPY bodies stay unmasked (cheap;
    they drain zero), but each code-driven one-hot build costs ~148 ns and
    a kept step runs f of them."""
    w1, w2 = rg[:, 0, 0::2], rg[:, 0, 1::2]
    k = (w1 & 0xFF) if flavor == "planar" else (w1 >> 20)
    act_d = jnp.take_along_axis(act_chunk, k, axis=1)   # (nsteps, rstep)
    nsteps, rstep = w2.shape
    live_d = jnp.logical_and(w2 > 0, act_d > 0)
    w2m = jnp.where(jnp.logical_and(w2 > 0, act_d == 0), 0, w2)
    da = jnp.take(live_d.reshape(-1).astype(jnp.int32), fidx["dep_flat"])
    cs0 = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(da)])
    live_f = (jnp.take(cs0, fidx["fl_end"])
              - jnp.take(cs0, fidx["fl_start"])).astype(jnp.int32)
    cs1 = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(live_f)])
    fl_any = (jnp.take(cs1, fidx["step_off"][1:])
              - jnp.take(cs1, fidx["step_off"][:-1])) > 0
    live_pad = jnp.concatenate([jnp.zeros(1, bool), live_f > 0])
    cmask = jnp.take(live_pad, fidx["qmap"])[:, None, :]
    kept = jnp.logical_or(jnp.any(live_d, axis=1), fl_any)
    iota = jnp.arange(nsteps, dtype=jnp.int32)
    sm = jnp.nonzero(kept, size=nsteps, fill_value=0)[0].astype(jnp.int32)
    na = jnp.sum(kept).astype(jnp.int32)
    sm = jnp.where(iota < na, sm, sm[jnp.maximum(na - 1, 0)])
    rgp = jnp.stack([w1, w2m], axis=-1).reshape(rg.shape)
    return rgp, cmask, sm, na.reshape(1)


def _make_reduce_kernel(cbc: int, rh: int, precision, ablate: str = "",
                        predicated: bool = False):
    """rh = region_rows // 128: the hi one-hot height. Smaller regions cut
    the MXU MAC count linearly (the dominant reduce cost at rh=128).
    `ablate` ("nobuilds" | "nodots" | "noacc") isolates the VPU one-hot
    builds, the MXU dots, and the output RMW for phase attribution."""
    def kernel(*refs):
        if predicated:
            sm_ref, na_ref, *refs = refs
        (code_ref,              # (1, 1, cbc) int32 region ids (-1 skip)
         g_ref,                 # (1, cbc, 8, 128) f32 flushed values
         hi_ref,                # (1, cbc*8, 128) int8
         lo_ref,                # (1, cbc*8, 128) int8
         o_ref) = refs          # (nregions, rh, 128) resident output
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        def _body():
            # (bf16 one-hot builds would halve the VPU cost, but this
            # libtpu rejects bf16 vector compares: "Target does not support
            # this comparison" — builds stay f32. The g upcast from a bf16
            # stream happens inside _onehot_place.)
            # Reduces run batched under shared any-active guards: one
            # pl.when per chunk is a scheduling barrier that serializes the
            # builds' and dots' latency chains (see the fused tail).
            hi_all = hi_ref[0].astype(jnp.int32)
            lo_all = lo_ref[0].astype(jnp.int32)
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
                        acc = _onehot_place(g_ref[0, k],
                                            hi_all[k * S:(k + 1) * S, :],
                                            lo_all[k * S:(k + 1) * S, :],
                                            rh, precision, ablate)
                        acc = jnp.where(c >= 0, acc, 0.0)
                        if ablate == "noacc":
                            o_ref[0, 0:1] += acc[0:1].astype(o_ref.dtype)
                        else:
                            o_ref[jnp.maximum(c, 0)] += acc.astype(
                                o_ref.dtype)

        if predicated:
            pl.when(step < na_ref[0])(_body)
        else:
            _body()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("cbc", "nregions", "rh", "nsteps", "mxu_precision",
                     "interpret", "dtype", "ablate"))
def _router_reduce_call(code, g, hi, lo, sm=None, na=None, *, cbc, nregions,
                        rh, nsteps, mxu_precision, interpret, dtype,
                        ablate=""):
    """Consumes the scatter output (nsteps, f, 8, 128) DIRECTLY — one reduce
    step per scatter step, no reshape between the kernels (a materialized
    reshape/copy of the stream measured ~4 ms on the googleplus stand-in).
    With sm/na (step compaction) the same remap the scatter wrote through is
    read back, so only kept steps' blocks are touched."""
    precision = (jax.lax.Precision.HIGHEST if mxu_precision == "highest"
                 else jax.lax.Precision.DEFAULT)
    pred = sm is not None
    kernel = _make_reduce_kernel(cbc, rh, precision, ablate, predicated=pred)
    stream = _stream_map(pred)
    stream4 = _stream_map(pred, ndim=4)
    in_specs = [
        pl.BlockSpec((1, 1, cbc), stream, memory_space=pltpu.SMEM),
        pl.BlockSpec((1, cbc, S, L), stream4, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cbc * S, L), stream, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cbc * S, L), stream, memory_space=pltpu.VMEM),
    ]
    fn = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2 if pred else 0,
            grid=(nsteps,), in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),  # whole out
        out_shape=jax.ShapeDtypeStruct((nregions, rh, L), jnp.dtype(dtype)),
        interpret=interpret,
        compiler_params=_cparams(interpret),
    )
    if pred:
        return fn(sm, na, code, g, hi, lo)
    return fn(code, g, hi, lo)


def _make_permc_reduce_kernel(cbc: int, rh: int, predicated: bool = False):
    """Split-pipeline PERM-C phase C (see io/permc_format.py and
    _permc_place): ONE batched (cbc*8,128)@(128,128) triangular prefix dot
    per grid step, then per flush ordinal two lane gathers + the hi
    one-hot + output RMW. Measured 126 ns/flush at rh=64 vs 175 for the
    lo-one-hot reduce (tools/permc_probe3.py)."""
    def kernel(*refs):
        if predicated:
            sm_ref, na_ref, *refs = refs
        (code_ref,              # (1, 1, cbc) int32 region ids (-1 skip)
         g_ref,                 # (1, cbc, 8, 128) flushed values
         hi_ref,                # (1, cbc*8, 128) int8, DEST-lane keyed
         end_ref,               # (1, cbc*8, 128) int8 run end
         beg_ref,               # (1, cbc*8, 128) int8 run start - 1
         o_ref,                 # (nregions, rh, 128) resident output
         p_ref) = refs          # scratch (cbc*8, 128) f32 prefix
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        def _body():
            p_ref[...] = _permc_prefix(g_ref[0].reshape(cbc * S, L))
            hi_all = hi_ref[0].astype(jnp.int32)
            end_all = end_ref[0].astype(jnp.int32)
            beg_all = beg_ref[0].astype(jnp.int32)
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
                        acc = _permc_place(p_ref[k * S:(k + 1) * S, :],
                                           hi_all[k * S:(k + 1) * S, :],
                                           end_all[k * S:(k + 1) * S, :],
                                           beg_all[k * S:(k + 1) * S, :],
                                           rh)
                        acc = jnp.where(c >= 0, acc, 0.0)
                        o_ref[jnp.maximum(c, 0)] += acc.astype(o_ref.dtype)

        if predicated:
            pl.when(step < na_ref[0])(_body)
        else:
            _body()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("cbc", "nregions", "rh", "nsteps", "interpret",
                     "dtype"))
def _permc_reduce_call(code, g, hi, end, beg, sm=None, na=None, *, cbc,
                       nregions, rh, nsteps, interpret, dtype):
    pred = sm is not None
    kernel = _make_permc_reduce_kernel(cbc, rh, predicated=pred)
    stream = _stream_map(pred)
    stream4 = _stream_map(pred, ndim=4)
    in_specs = [
        pl.BlockSpec((1, 1, cbc), stream, memory_space=pltpu.SMEM),
        pl.BlockSpec((1, cbc, S, L), stream4, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cbc * S, L), stream, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cbc * S, L), stream, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cbc * S, L), stream, memory_space=pltpu.VMEM),
    ]
    fn = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2 if pred else 0,
            grid=(nsteps,), in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((cbc * S, L), jnp.float32)]),
        out_shape=jax.ShapeDtypeStruct((nregions, rh, L), jnp.dtype(dtype)),
        interpret=interpret,
        compiler_params=_cparams(interpret),
    )
    if pred:
        return fn(sm, na, code, g, hi, end, beg)
    return fn(code, g, hi, end, beg)


def _make_xperm_kernel(tb: int, pred: bool = False):
    """Per-tile static column re-layout of x (see planar_format.py): for
    each source sublane, broadcast its row and gather/select by the tile's
    shuffle plane. 8 gather+selects per tile, ~30 us for the largest graph.

    With `pred`, an SMEM per-block activity flag (SpMSpV: any tile in the
    16-tile block holds a frontier entry) skips the whole block's work —
    inactive blocks write zeros (their gathered values are deposit-masked
    downstream by _predicate_rg, so any value is correct; zeros keep the
    stream debuggable)."""
    def body(pl_ref, x_ref, o_ref):
        for t in range(tb):
            xt = x_ref[0, t * S:(t + 1) * S, :]
            out = jnp.zeros((S, L), xt.dtype)
            for s in range(S):
                tab = jnp.broadcast_to(xt[s:s + 1, :], (S, L))
                pv = pl_ref[0, (t * S + s) * S:(t * S + s + 1) * S, :]
                pv = pv.astype(jnp.int32)
                g = jnp.take_along_axis(tab, pv & 127, axis=1)
                out = jnp.where(pv < 0, g, out)
            o_ref[0, t * S:(t + 1) * S, :] = out

    if not pred:
        def kernel(pl_ref, x_ref, o_ref):
            body(pl_ref, x_ref, o_ref)
        return kernel

    def kernel(act_ref,   # (1, 1, 1) int32 SMEM : block activity
               pl_ref,    # (1, tb*64, 128) int8 : per tile 8 source planes
               x_ref,     # (1, tb*8, 128) input tiles
               o_ref):    # (1, tb*8, 128) re-laid tiles
        @pl.when(act_ref[0, 0, 0] > 0)
        def _():
            body(pl_ref, x_ref, o_ref)

        @pl.when(act_ref[0, 0, 0] == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("nct", "interpret", "dtype"))
def _xperm_call(planes, x2, *, nct, interpret, dtype, act=None):
    # always run 16-tile blocks: small blocks (tb=2 when nct is even but
    # not 16-divisible) load (128,128) int8 sub-tiles that pay a Mosaic
    # relayout — measured ~5 ms on full pokec vs ~1 ms padded. Padding
    # tiles are zeros and never referenced downstream (a_page < nct).
    nct_p = -(-nct // 16) * 16
    if nct_p != nct:
        planes = jnp.concatenate(
            [planes, jnp.zeros((nct_p - nct,) + planes.shape[1:],
                               planes.dtype)], axis=0)
        x2 = jnp.concatenate(
            [x2, jnp.zeros((nct_p - nct, S, L), x2.dtype)], axis=0)
    tb = 16
    if act is not None:
        pad = jnp.zeros(nct_p - nct, jnp.int32) if nct_p != nct else None
        act_i = act.astype(jnp.int32)
        if pad is not None:
            act_i = jnp.concatenate([act_i, pad])
        blk = jnp.max(act_i.reshape(nct_p // tb, tb), axis=1)
        act = blk.reshape(nct_p // tb, 1, 1)
    out = _xperm_call_padded(planes, x2, act, nct=nct_p, interpret=interpret,
                             dtype=dtype, tb=tb)
    return out[:nct]


@functools.partial(jax.jit,
                   static_argnames=("nct", "interpret", "dtype", "tb"))
def _xperm_call_padded(planes, x2, act, *, nct, interpret, dtype, tb):
    kernel = _make_xperm_kernel(tb, pred=act is not None)
    in_specs = [
        pl.BlockSpec((1, tb * 64, L), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tb * S, L), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = (planes.reshape(nct // tb, tb * 64, L),
            x2.reshape(nct // tb, tb * S, L))
    if act is not None:
        in_specs.insert(0, pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                                        memory_space=pltpu.SMEM))
        args = (act,) + args
    fn = pl.pallas_call(
        kernel,
        grid=(nct // tb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tb * S, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nct // tb, tb * S, L),
                                       jnp.dtype(dtype)),
        interpret=interpret,
        # no raised vmem cap: this kernel's blocks are far under the
        # 16 MiB scoped default; only kernels that NEED >16 MiB get the
        # raised cap (don't hand the scheduler headroom it can't use)
    )
    return fn(*args).reshape(nct, S, L)


def _make_planar_kernel(op: OpType, cb: int, rstep: int, nreg: int,
                        fuse: bool = False, rh: int = 0, precision=None,
                        fnum: int = 0, banks2: bool = True,
                        dstep: int = 0, chained: bool = False,
                        predicated: bool = False, triples: bool = False,
                        TP: int = 0, permc: bool = False):
    """Planar-deposit kernel (see io/planar_format.py): bucket-binned tile
    chunks make phase A a single ax1 dynamic_gather, and each deposit ships
    a static (8,128) int8 plane — entry < 0 routes source lane (v & 127) of
    the same sublane into the region accumulator, else the accumulator is
    kept. Accumulators are zeroed at flush, so flushed chunks carry zeros in
    unused slots and the phase-C reduce needs no cursor mask.

    `chained` (layout deal="free"): phase A is the composed 2D gather
    t[sub[s, r[s,l]], r[s,l]] through an extra a_sub stream, freeing the
    dest sublane from the column bucket so the packer can quota-deal hub
    columns across sublanes (flush fill 0.485 -> ~0.9, see _deal_free).

    `predicated` (work-proportional SpMSpV, the step-compaction analog of
    the chunked engine's path — reference hw/kernel_spmspv_impl.h:55-124):
    two scalar-prefetch arrays remap grid step i to layout step sm[i];
    steps >= na repeat the last kept block (no DMA) and skip the body.
    Correctness of skipping whole steps rests on the flush live-window
    closure computed in _steps_sm_na: every flush draining an active
    deposit is kept, and a skipped flush's slot is provably zero."""
    def kernel(*refs):
        if predicated:
            sm_ref, na_ref, *refs = refs
        beg_ref = None
        if fuse:
            if permc:           # triples scatter + prefix-diff inline C
                (page_ref, r_ref, sub_ref, v_ref, rg_ref, pl_ref,
                 code_ref, hi_ref, lo_ref, beg_ref, x_ref, o_ref,
                 g_buf, acc_ref, acc2_ref, ring_ref) = refs
            elif chained:
                (page_ref, r_ref, sub_ref, v_ref, rg_ref, pl_ref,
                 code_ref, hi_ref, lo_ref, x_ref, o_ref,
                 g_buf, acc_ref, acc2_ref, ring_ref) = refs
            else:
                (page_ref,        # (1, 1, cb) int32 SMEM : tile ids
                 r_ref,           # (1, cb*8, 128) int8 : lane = col & 127
                 v_ref,           # (1, cb*8, 128) f32|bf16
                 rg_ref,          # (1, 1, 2*rstep) int32 SMEM (w1,w2 interleaved)
                 pl_ref,          # (1, dmax, 8, 128) int8 deposit planes
                                  #   (triples: (1, TP, 8, 128) int32)
                 code_ref,        # (1, 1, f) int32 SMEM
                 hi_ref,          # (1, f*8, 128) int8
                 lo_ref,          # (1, f*8, 128) int8 (permc: c_end)
                 x_ref,           # (nct, 8, 128) resident
                 o_ref,           # (nregions, rh, 128) resident output
                 g_buf, acc_ref, acc2_ref, ring_ref) = refs
                sub_ref = None
        else:
            if chained:
                (page_ref, r_ref, sub_ref, v_ref, rg_ref, pl_ref, x_ref,
                 o_ref, g_buf, acc_ref, acc2_ref) = refs
            else:
                (page_ref, r_ref, v_ref, rg_ref, pl_ref, x_ref,
                 o_ref,           # (1, f, 8, 128) flush stream block
                 g_buf, acc_ref, acc2_ref) = refs
                sub_ref = None

        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            if banks2:
                acc2_ref[...] = jnp.zeros_like(acc2_ref)
            if fuse:
                o_ref[...] = jnp.zeros_like(o_ref)

        def _body():
            # ---- phase A: one ax1 gather per chunk (sublane == col
            # bucket), or the chained 2D gather when the layout deals
            # sublanes freely --------------------------------------------
            r_all = r_ref[0].astype(jnp.int32)
            sub_all = sub_ref[0].astype(jnp.int32) if chained else None
            for k in range(cb):
                t = x_ref[page_ref[0, 0, k]]                # (8, 128) tile
                rk = r_all[k * S:(k + 1) * S, :]
                if chained:
                    t = jnp.take_along_axis(t, sub_all[k * S:(k + 1) * S, :],
                                            axis=0)
                g = jnp.take_along_axis(t, rk, axis=1)
                vals = v_ref[0, k * S:(k + 1) * S, :].astype(g.dtype)
                if op == OpType.MULADD:
                    g = g * vals
                elif op == OpType.ANDOR:
                    g = jnp.logical_and(vals != 0, g != 0).astype(g.dtype)
                elif op == OpType.ADDMIN:
                    g = _tropical_encode(vals, g)
                else:
                    raise ValueError(op)
                g_buf[k] = g

            # ---- phase B (phase-ordered stream): batched deposits, then
            # flushes — see the roll kernel / io/planar_format.py layout
            # notes. A deposit body no-ops via the w2-driven threshold when
            # its slot is padding or SpMSpV-predicated (w2 == 0): the plane
            # compare never takes. Banks by in-group parity.
            lane_i = jax.lax.broadcasted_iota(jnp.int32, (S, L), 1)
            if triples:
                # decode the step's triple-run words once (32 B/piece
                # replacing 1 KB planes — io/permc_format.py): 3 vreg-ops
                # per 128 pieces; bodies use STATIC lane slices (descriptor
                # ordinal == unroll position)
                dec = []
                for tp in range(TP):
                    w = pl_ref[0, tp]
                    dec.append((w & 127, (w >> 7) & 127, (w >> 14) & 255))

                def dep_body(j, w1, w2, bank):
                    c = j & 127
                    a0, d0, nn = (dd[:, c:c + 1] for dd in dec[j >> 7])
                    idx = (lane_i - d0 + a0) & 127
                    g = jnp.take_along_axis(g_buf[w1 & 0xFF], idx, axis=1)
                    m = jnp.logical_and(
                        jnp.logical_and(lane_i >= d0, lane_i < d0 + nn),
                        w2 > 0)
                    slot = w2 & 0xFFF
                    bank[slot] = jnp.where(m, g, bank[slot])
            else:
                def dep_body(j, w1, w2, bank):
                    pv = pl_ref[0, w1 >> 8].astype(jnp.int32)
                    idx = pv & 127
                    g = jnp.take_along_axis(g_buf[w1 & 0xFF], idx, axis=1)
                    thr = jnp.where(w2 > 0, 0, -256)
                    slot = w2 & 0xFFF
                    bank[slot] = jnp.where(pv < thr, g, bank[slot])

            DG = 8
            for j0 in range(0, dstep, DG):
                n = min(DG, dstep - j0)
                ws = [(rg_ref[0, 0, 2 * (j0 + u)], rg_ref[0, 0, 2 * (j0 + u) + 1])
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
                w2 = rg_ref[0, 0, 2 * j + 1]
                slot = w2 & 0xFFF

                @pl.when(w2 < 0)   # flush: copy + zero
                def _():
                    q = (w2 >> 16) & 0xFF
                    gch = (acc_ref[slot] + acc2_ref[slot] if banks2
                           else acc_ref[slot])
                    if fuse:
                        ring_ref[pl.ds(q, 1)] = gch[None]
                    else:
                        o_ref[0, pl.ds(q, 1)] = gch[None].astype(o_ref.dtype)
                    acc_ref[slot] = jnp.zeros_like(gch)
                    if banks2:
                        acc2_ref[slot] = jnp.zeros_like(gch)

            if not fuse:
                return

            # ---- inline phase C: batched reduces (see the roll tail) ----
            hi_all = hi_ref[0].astype(jnp.int32)
            lo_all = lo_ref[0].astype(jnp.int32)   # permc: c_end
            if permc:
                beg_all = beg_ref[0].astype(jnp.int32)
                pref = _permc_prefix(
                    ring_ref[...].reshape(fnum * S, L))
            CG = 4
            for q0 in range(0, fnum, CG):
                n = min(CG, fnum - q0)
                cs = [code_ref[0, 0, q0 + u] for u in range(n)]
                anyact = cs[0]
                for u in range(1, n):
                    anyact = jnp.maximum(anyact, cs[u])

                @pl.when(anyact >= 0)
                def _():
                    for u in range(n):
                        qq = q0 + u
                        c = cs[u]
                        if permc:
                            accd = _permc_place(
                                pref[qq * S:(qq + 1) * S, :],
                                hi_all[qq * S:(qq + 1) * S, :],
                                lo_all[qq * S:(qq + 1) * S, :],
                                beg_all[qq * S:(qq + 1) * S, :], rh)
                        else:
                            accd = _onehot_place(
                                ring_ref[qq],
                                hi_all[qq * S:(qq + 1) * S, :],
                                lo_all[qq * S:(qq + 1) * S, :],
                                rh, precision)
                        accd = jnp.where(c >= 0, accd, 0.0)
                        o_ref[jnp.maximum(c, 0)] += accd.astype(o_ref.dtype)

        if predicated:
            pl.when(step < na_ref[0])(_body)
        else:
            _body()

    return kernel


def _make_planar_kernel_looped(op: OpType, cb: int, rstep: int, nreg: int,
                               fuse: bool = False, rh: int = 0,
                               precision=None, fnum: int = 0,
                               unroll: int = 16, banks2: bool = True,
                               dstep: int = 0, chained: bool = False,
                               predicated: bool = False,
                               triples: bool = False, TP: int = 0,
                               permc: bool = False):
    """Partially-unrolled phase B: a lax.fori_loop over descriptor slots,
    `unroll` bodies per iteration. The fully-unrolled kernel compiles in
    ~35 min at pokec scale (rstep=195, f=47 fused) — far beyond the bench
    budget — while a fully-rolled loop costs ~148 ns/deposit vs 19 ns
    unrolled (no cross-descriptor ILP; measured on full pokec). Partial
    unroll keeps Mosaic's within-group scheduling (ILP across `unroll`
    descriptors) with a ~rstep/unroll-times smaller program. Every index
    the body uses is already dynamic (plane ordinal, source chunk,
    accumulator slot), so nothing else is lost."""
    def kernel(*refs):
        if predicated:
            sm_ref, na_ref, *refs = refs
        beg_ref = pref_ref = None
        if fuse:
            if permc:
                (page_ref, r_ref, sub_ref, v_ref, rg_ref, pl_ref,
                 code_ref, hi_ref, lo_ref, beg_ref, x_ref, o_ref,
                 g_buf, acc_ref, acc2_ref, ring_ref, pref_ref) = refs
            elif chained:
                (page_ref, r_ref, sub_ref, v_ref, rg_ref, pl_ref,
                 code_ref, hi_ref, lo_ref, x_ref, o_ref,
                 g_buf, acc_ref, acc2_ref, ring_ref) = refs
            else:
                (page_ref, r_ref, v_ref, rg_ref, pl_ref,
                 code_ref, hi_ref, lo_ref, x_ref, o_ref,
                 g_buf, acc_ref, acc2_ref, ring_ref) = refs
                sub_ref = None
        else:
            if chained:
                (page_ref, r_ref, sub_ref, v_ref, rg_ref, pl_ref, x_ref,
                 o_ref, g_buf, acc_ref, acc2_ref) = refs
            else:
                (page_ref, r_ref, v_ref, rg_ref, pl_ref, x_ref,
                 o_ref, g_buf, acc_ref, acc2_ref) = refs
                sub_ref = None

        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            if banks2:
                acc2_ref[...] = jnp.zeros_like(acc2_ref)
            if fuse:
                o_ref[...] = jnp.zeros_like(o_ref)

        def _bigbody():
            # ---- phase A: identical to the unrolled kernel ----------------
            r_all = r_ref[0].astype(jnp.int32)
            sub_all = sub_ref[0].astype(jnp.int32) if chained else None
            for k in range(cb):
                t = x_ref[page_ref[0, 0, k]]
                if chained:
                    t = jnp.take_along_axis(t, sub_all[k * S:(k + 1) * S, :],
                                            axis=0)
                g = jnp.take_along_axis(t, r_all[k * S:(k + 1) * S, :],
                                        axis=1)
                vals = v_ref[0, k * S:(k + 1) * S, :].astype(g.dtype)
                if op == OpType.MULADD:
                    g = g * vals
                elif op == OpType.ANDOR:
                    g = jnp.logical_and(vals != 0, g != 0).astype(g.dtype)
                elif op == OpType.ADDMIN:
                    g = _tropical_encode(vals, g)
                else:
                    raise ValueError(op)
                g_buf[k] = g

            # ---- phase B: block-unrolled deposit loop (phase-ordered
            # stream). Mosaic's pallas fori_loop lowering supports only
            # unroll=1 or full unroll, so the partial unroll is MANUAL: a
            # dynamic outer loop over blocks of `unroll` statically-inlined
            # bodies. Bodies run UNCONDITIONALLY with the w2-driven
            # threshold no-op (padding / SpMSpV-predicated slots route
            # nothing) — batching replaces the per-descriptor pl.when
            # barrier that serialized the bodies.
            lane_i = jax.lax.broadcasted_iota(jnp.int32, (S, L), 1)

            if triples:
                def dep_body(j, parity):
                    # dynamic ordinal: decode via one broadcast gather of
                    # the triple word's column (the static-slice decode of
                    # the unrolled kernel needs a static j)
                    w1 = rg_ref[0, 0, 2 * j]
                    w2 = rg_ref[0, 0, 2 * j + 1]
                    slot = w2 & 0xFFF
                    bank = acc2_ref if (banks2 and parity) else acc_ref
                    p_ = w1 >> 8
                    w = pl_ref[0, p_ >> 7]
                    wc = jnp.take_along_axis(
                        w, jnp.full((S, L), p_ & 127, jnp.int32), axis=1)
                    a0 = wc & 127
                    d0 = (wc >> 7) & 127
                    nn = (wc >> 14) & 255
                    idx = (lane_i - d0 + a0) & 127
                    g = jnp.take_along_axis(g_buf[w1 & 0xFF], idx, axis=1)
                    m = jnp.logical_and(
                        jnp.logical_and(lane_i >= d0, lane_i < d0 + nn),
                        w2 > 0)
                    bank[slot] = jnp.where(m, g, bank[slot])
            else:
                def dep_body(j, parity):
                    w1 = rg_ref[0, 0, 2 * j]
                    w2 = rg_ref[0, 0, 2 * j + 1]
                    slot = w2 & 0xFFF
                    bank = acc2_ref if (banks2 and parity) else acc_ref
                    pv = pl_ref[0, w1 >> 8].astype(jnp.int32)
                    idx = pv & 127
                    g = jnp.take_along_axis(g_buf[w1 & 0xFF], idx, axis=1)
                    thr = jnp.where(w2 > 0, 0, -256)
                    bank[slot] = jnp.where(pv < thr, g, bank[slot])

            nb = dstep // unroll

            def body(b, carry):
                base = b * unroll
                for u in range(unroll):
                    dep_body(base + u, u % 2)
                return carry

            if nb:
                jax.lax.fori_loop(0, nb, body, 0, unroll=1)
            for j in range(nb * unroll, dstep):   # static tail
                dep_body(j, j % 2)

            for j in range(dstep, rstep):         # flushes (few; static)
                w2 = rg_ref[0, 0, 2 * j + 1]
                slot = w2 & 0xFFF

                @pl.when(w2 < 0)   # flush: copy + zero
                def _():
                    q = (w2 >> 16) & 0xFF
                    gch = (acc_ref[slot] + acc2_ref[slot] if banks2
                           else acc_ref[slot])
                    if fuse:
                        ring_ref[pl.ds(q, 1)] = gch[None]
                    else:
                        o_ref[0, pl.ds(q, 1)] = gch[None].astype(o_ref.dtype)
                    acc_ref[slot] = jnp.zeros_like(gch)
                    if banks2:
                        acc2_ref[slot] = jnp.zeros_like(gch)

            if not fuse:
                return

            # ---- phase C: blocked reduce loop over flush ordinals ---------
            # masked-unconditional bodies in blocks of CG (same ILP
            # argument); hi/lo ride 4D (1, f, 8, 128) so the dynamic
            # flush-ordinal index stays at vreg-tile granularity
            if permc:
                # one batched triangular prefix dot for the whole ring,
                # staged in scratch so bodies dynamic-index vreg tiles
                pref_ref[...] = _permc_prefix(
                    ring_ref[...].reshape(fnum * S, L)).reshape(fnum, S, L)

                def cred(qq):
                    c = code_ref[0, 0, qq]
                    accd = _permc_place(pref_ref[qq],
                                        hi_ref[0, qq].astype(jnp.int32),
                                        lo_ref[0, qq].astype(jnp.int32),
                                        beg_ref[0, qq].astype(jnp.int32),
                                        rh)
                    accd = jnp.where(c >= 0, accd, 0.0)
                    o_ref[jnp.maximum(c, 0)] += accd.astype(o_ref.dtype)
            else:
                def cred(qq):
                    c = code_ref[0, 0, qq]
                    accd = _onehot_place(ring_ref[qq],
                                         hi_ref[0, qq].astype(jnp.int32),
                                         lo_ref[0, qq].astype(jnp.int32),
                                         rh, precision)
                    accd = jnp.where(c >= 0, accd, 0.0)
                    o_ref[jnp.maximum(c, 0)] += accd.astype(o_ref.dtype)

            CG = 4
            ncb = fnum // CG

            def cbody(b, carry):
                for u in range(CG):
                    cred(b * CG + u)
                return carry

            if ncb:
                jax.lax.fori_loop(0, ncb, cbody, 0, unroll=1)
            for qq in range(ncb * CG, fnum):
                cred(qq)

        if predicated:
            pl.when(step < na_ref[0])(_bigbody)
        else:
            _bigbody()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("op", "cb", "rstep", "f", "dmax", "nreg", "nct",
                     "nsteps", "interpret", "dtype", "gdtype", "looped",
                     "dstep", "banks2", "triples"))
def _planar_scatter_call(page, r, vals, rg, planes, x2, sub=None,
                         sm=None, na=None, *, op, cb,
                         rstep, f, dmax, nreg, nct, nsteps, interpret, dtype,
                         gdtype=None, looped=False, dstep=0, banks2=True,
                         triples=False):
    # tropical rides the exact int32 bit encoding end-to-end (see
    # _tropical_encode); deposits/flushes are dtype-agnostic bit movers
    sdt = jnp.int32 if op == OpType.ADDMIN else jnp.dtype(dtype)
    use2 = banks2 and not interpret
    chained = sub is not None
    pred = sm is not None
    TP = planes.shape[1] if triples else 0
    make = _make_planar_kernel_looped if looped else _make_planar_kernel
    kernel = make(op, cb, rstep, nreg, banks2=use2, dstep=dstep,
                  chained=chained, predicated=pred, triples=triples, TP=TP)
    stream = _stream_map(pred)
    stream4 = _stream_map(pred, ndim=4)
    ab_spec = pl.BlockSpec((1, cb * S, L), stream, memory_space=pltpu.VMEM)
    pl_spec = (pl.BlockSpec((1, TP, S, L), stream4,
                            memory_space=pltpu.VMEM) if triples
               else pl.BlockSpec((1, dmax, S, L), stream4,
                                 memory_space=pltpu.VMEM))
    in_specs = [
        pl.BlockSpec((1, 1, cb), stream, memory_space=pltpu.SMEM),
        ab_spec,
        *([ab_spec] if chained else []),
        ab_spec,
        pl.BlockSpec((1, 1, 2 * rstep), stream, memory_space=pltpu.SMEM),
        pl_spec,
        pl.BlockSpec(memory_space=pltpu.VMEM),   # x resident
    ]
    fn = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2 if pred else 0,
            grid=(nsteps,), in_specs=in_specs,
            out_specs=pl.BlockSpec((1, f, S, L), stream4,
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((cb, S, L), sdt),
                pltpu.VMEM((nreg, S, L), sdt),
                pltpu.VMEM((nreg if use2 else 1, S, L), sdt),
            ]),
        out_shape=jax.ShapeDtypeStruct((nsteps, f, S, L),
                                       jnp.dtype(gdtype or dtype)),
        interpret=interpret,
        compiler_params=_cparams(interpret),
    )
    args = (page, r, sub, vals, rg, planes, x2) if chained else \
        (page, r, vals, rg, planes, x2)
    if pred:
        return fn(sm, na, *args)
    return fn(*args)


@functools.partial(
    jax.jit,
    static_argnames=("op", "cb", "rstep", "f", "dmax", "nreg", "rh",
                     "nregions", "nct", "nsteps", "mxu_precision",
                     "interpret", "dtype", "looped", "dstep", "banks2",
                     "triples"))
def _planar_fused_call(page, r, vals, rg, planes, code, hi, lo, x2,
                       sub=None, sm=None, na=None, beg=None, *, op, cb,
                       rstep, f, dmax, nreg, rh,
                       nregions, nct, nsteps, mxu_precision, interpret,
                       dtype, looped=False, dstep=0, banks2=True,
                       triples=False):
    precision = (jax.lax.Precision.HIGHEST if mxu_precision == "highest"
                 else jax.lax.Precision.DEFAULT)
    use2 = banks2 and not interpret
    chained = sub is not None
    pred = sm is not None
    permc = beg is not None
    assert not permc or (triples and chained)
    TP = planes.shape[1] if triples else 0
    make = _make_planar_kernel_looped if looped else _make_planar_kernel
    kernel = make(op, cb, rstep, nreg, fuse=True, rh=rh,
                  precision=precision, fnum=f, banks2=use2, dstep=dstep,
                  chained=chained, predicated=pred, triples=triples, TP=TP,
                  permc=permc)
    stream = _stream_map(pred)
    stream4 = _stream_map(pred, ndim=4)
    ab_spec = pl.BlockSpec((1, cb * S, L), stream, memory_space=pltpu.VMEM)
    pl_spec = (pl.BlockSpec((1, TP, S, L), stream4,
                            memory_space=pltpu.VMEM) if triples
               else pl.BlockSpec((1, dmax, S, L), stream4,
                                 memory_space=pltpu.VMEM))
    # the looped kernel indexes hi/lo by dynamic flush ordinal, so they ride
    # 4D (vreg-tile granularity); the unrolled kernel slices them statically
    hilo_spec = (pl.BlockSpec((1, f, S, L), stream4,
                              memory_space=pltpu.VMEM) if looped
                 else pl.BlockSpec((1, f * S, L), stream,
                                   memory_space=pltpu.VMEM))
    if looped:
        hi = hi.reshape(nsteps, f, S, L)
        lo = lo.reshape(nsteps, f, S, L)
        if permc:
            beg = beg.reshape(nsteps, f, S, L)
    in_specs = [
        pl.BlockSpec((1, 1, cb), stream, memory_space=pltpu.SMEM),
        ab_spec,
        *([ab_spec] if chained else []),
        ab_spec,
        pl.BlockSpec((1, 1, 2 * rstep), stream, memory_space=pltpu.SMEM),
        pl_spec,
        pl.BlockSpec((1, 1, f), stream, memory_space=pltpu.SMEM),
        hilo_spec,
        hilo_spec,
        *([hilo_spec] if permc else []),
        pl.BlockSpec(memory_space=pltpu.VMEM),   # x resident
    ]
    fn = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2 if pred else 0,
            grid=(nsteps,), in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((cb, S, L), jnp.dtype(dtype)),
                pltpu.VMEM((nreg, S, L), jnp.dtype(dtype)),
                pltpu.VMEM((nreg if use2 else 1, S, L), jnp.dtype(dtype)),
                pltpu.VMEM((f, S, L), jnp.dtype(dtype)),
                *([pltpu.VMEM((f, S, L), jnp.float32)]
                  if permc and looped else []),
            ]),
        out_shape=jax.ShapeDtypeStruct((nregions, rh, L), jnp.dtype(dtype)),
        interpret=interpret,
        compiler_params=_cparams(interpret),
    )
    args = ((page, r, sub, vals, rg, planes, code, hi, lo,
             *([beg] if permc else []), x2) if chained
            else (page, r, vals, rg, planes, code, hi, lo, x2))
    if pred:
        return fn(sm, na, *args)
    return fn(*args)


@jax.tree_util.register_pytree_node_class
class PlanarArrays:
    """Device-resident planar streams as a jit-argument pytree. `a_sub` is
    None for deal="bucket" layouts (single-gather phase A through xperm) and
    the chained-gather sublane table for deal="free" ones (xperm empty).

    PERM-C layouts (io/permc_format.py) overload two slots so the pytree
    stays positional: `planes` carries the (nsteps, TP, 8, 128) int32
    triple-run words (the 1 KB/piece plane stream never ships), `c_lo`
    carries c_end, and `c_beg` (appended, else None) the run starts."""

    FIELDS = ("a_page", "a_r", "xperm", "a_vals", "rg", "planes",
              "c_code", "c_hi", "c_lo", "a_sub", "c_beg")

    def __init__(self, *children):
        children = children + (None,) * (len(self.FIELDS) - len(children))
        for name, c in zip(self.FIELDS, children):
            setattr(self, name, c)

    def tree_flatten(self):
        return tuple(getattr(self, n) for n in self.FIELDS), None

    @classmethod
    def tree_unflatten(cls, _aux, children):
        return cls(*children)


class PlanarSpMV:
    """Compiled planar-router SpMV over a PlanarSpMVLayout. Same call
    surface as PallasSpMV/RouterSpMV."""

    def __init__(self, layout, semiring: Semiring,
                 config: EngineConfig = DEFAULT_CONFIG,
                 mask_type: MaskType = MaskType.NO_MASK):
        if semiring.op == OpType.ADDMIN:
            raise ValueError("planar router supports MULADD/ANDOR only "
                             "(tropical has no MXU reduce; use the chunked "
                             "kernel)")
        self.layout = layout
        self.semiring = semiring
        self.config = config
        self.mask_type = mask_type
        self.num_rows = layout.num_rows
        self.num_cols = layout.num_cols
        lay = layout
        vdt = (jnp.bfloat16 if config.mxu_precision == "default"
               else jnp.dtype(config.dtype))
        a_sub = getattr(lay, "a_sub", None)
        self.chained = a_sub is not None
        self.permc = getattr(lay, "c_end", None) is not None
        self.triples = getattr(lay, "triples", None) is not None
        assert self.permc == self.triples, \
            "permc layouts carry triples (and only they do, for now)"
        self.arrays = PlanarArrays(
            jnp.asarray(lay.a_page.reshape(lay.nsteps, 1, lay.cb)),
            jnp.asarray(lay.a_r.reshape(lay.nsteps, lay.cb * S, L)),
            jnp.asarray(lay.xperm),
            jnp.asarray(lay.a_vals.reshape(lay.nsteps, lay.cb * S, L)
                        .astype(vdt)),
            jnp.asarray(_rg_flat(lay.rg)),
            jnp.asarray(lay.triples if self.triples else lay.planes),
            jnp.asarray(lay.c_code.reshape(lay.nsteps, 1, lay.f)),
            jnp.asarray(lay.c_hi.reshape(lay.nsteps, lay.f * S, L)),
            jnp.asarray((lay.c_end if self.permc else lay.c_lo)
                        .reshape(lay.nsteps, lay.f * S, L)),
            (jnp.asarray(a_sub.reshape(lay.nsteps, lay.cb * S, L))
             if self.chained else None),
            (jnp.asarray(lay.c_beg.reshape(lay.nsteps, lay.f * S, L))
             if self.permc else None),
        )
        rh = lay.region_rows // 128
        # FUSED mode: partially-unrolled descriptor loop for big steps —
        # the fully-unrolled fused kernel (rstep descriptor bodies + f
        # inline reduces) hits a superlinear Mosaic compile blowup (~35 min
        # at pokec scale rstep=195/f=47, vs 10-20 s for the same-size SPLIT
        # kernels); unroll-by-8 keeps within-group ILP at ~24x smaller
        # program. SPLIT kernels always fully unroll (19 ns/deposit vs
        # 148 ns fully rolled, measured on full pokec).
        self._looped = lay.rstep > 48
        # split-mode flush stream dtype: bf16 when the reduce dot rounds its
        # inputs to bf16 anyway (DEFAULT MXU precision) — halves the
        # dominant HBM round-trip
        gdt = ("bfloat16" if config.mxu_precision == "default"
               else config.dtype)
        self._static_scatter = dict(
            op=semiring.op, cb=lay.cb, rstep=lay.rstep, f=lay.f,
            dmax=lay.dmax, dstep=lay.dstep,
            nreg=lay.num_slots, nct=lay.num_col_tiles, nsteps=lay.nsteps,
            interpret=config.resolve_interpret(), dtype=config.dtype,
            gdtype=gdt, triples=self.triples,
        )
        if self.permc:
            self._static_reduce = dict(
                cbc=lay.f, nregions=lay.num_regions, rh=rh,
                nsteps=lay.nsteps,
                interpret=config.resolve_interpret(), dtype=config.dtype,
            )
        else:
            self._static_reduce = dict(
                cbc=lay.f, nregions=lay.num_regions, rh=rh,
                nsteps=lay.nsteps, mxu_precision=config.mxu_precision,
                interpret=config.resolve_interpret(), dtype=config.dtype,
            )
        self._static_fused = dict(
            op=semiring.op, cb=lay.cb, rstep=lay.rstep, f=lay.f,
            dmax=lay.dmax, dstep=lay.dstep,
            nreg=lay.num_slots, rh=rh, nregions=lay.num_regions,
            nct=lay.num_col_tiles, nsteps=lay.nsteps,
            mxu_precision=config.mxu_precision,
            interpret=config.resolve_interpret(), dtype=config.dtype,
            triples=self.triples,
        )
        vbytes = jnp.dtype(vdt).itemsize
        tpw = getattr(lay, "triples", None)
        dep_stream = (tpw.shape[1] * S * L * 4 if self.triples
                      else lay.dmax * S * L)
        base = (lay.num_col_tiles * 4096
                + lay.num_regions * rh * L * 4
                + (lay.cb + lay.f) * 4096          # g_buf + flush ring
                + (lay.f * 4096 if self.permc else 0)   # prefix scratch
                + 2 * (lay.cb * S * L
                       * (1 + (1 if self.chained else 0) + vbytes)
                       + dep_stream
                       + (3 if self.permc else 2) * lay.f * S * L
                       + lay.rstep * 8 + lay.cb * 4))
        # Two banks only with comfortable headroom (14.5 MB); the fused
        # limit itself is 17.5 MB — beyond the 16 MiB scoped-VMEM default
        # but measured real: full-scale pokec single-banked fused compiles
        # at ~17.0 MB scoped under the raised cap, is oracle-exact, and
        # beats split 13.27 -> 12.46 ms (min-of-5 interleaved 3D-carry
        # reps, tools/planar_ab_mode.py, session 5 — post-v3 the split
        # flush round-trip is cheap, so the fused win is modest: the
        # reduce reads accumulators in VMEM instead of a g stream).
        # Single-bank is safe: batching under shared guards, not bank
        # parity, is what won the deposit ILP (session-4 measurements).
        self.banks2 = base + 2 * lay.num_slots * 4096 <= 14.5e6
        self.fused = (base + (2 if self.banks2 else 1)
                      * lay.num_slots * 4096 <= 17.5e6)
        # step-compaction live window (SpMSpV): small enough to ride as a
        # jit closure constant (nsteps int32)
        self._minw = jnp.asarray(_flush_minw(lay.rg, lay.dstep))
        self._fidx_dev = None

    def flush_index_device(self):
        """Planar chunks mix all 8 pages of a tile (tile-granular
        activity), so with cb~32 chunks/step nearly every step stays
        active under sparse frontiers and the exact index's per-call
        gathers (~2 ms at pokec scale, XLA:TPU gather ~0.05-0.1 G elem/s)
        buy almost no skipped work — measured pokec sweep 9.7 -> 11.5 ms
        FLAT. The planar engine therefore stays on the (first-deposit-
        clipped) window path; the exact path remains callable by passing
        fidx explicitly (tests do)."""
        return None

    def _normalize_act(self, active):
        # planar chunks mix all 8 pages of their tile, so activity stays
        # tile-granular (page-granular input is reduced back to tiles)
        if (active is not None
                and active.shape[0] == self.layout.num_col_tiles * 8):
            return jnp.max(active.astype(jnp.int32).reshape(-1, 8), axis=1)
        return active

    def _x2(self, x, a, tiles_active=None):
        """Static per-tile column re-layout of x (bucket balancing).
        Accepts x as (ncols,) or pre-tiled (nct, 8, 128) — the 1D form pays
        a ~2.3 GB/s 1D->tiled relayout (measured 5.6 ms on full pokec), so
        iterating callers should stay in 3D (see __call__ out_3d).
        `tiles_active` skips inactive 16-tile blocks (SpMSpV floor).
        deal="free" layouts need no re-layout (the chained phase-A gather
        reaches any (sublane, lane) of the natural tile)."""
        nct = self.layout.num_col_tiles
        x3 = x.reshape(nct, S, L) if x.ndim == 1 else x
        if self.chained:
            return x3
        return _xperm_call(a.xperm, x3, nct=nct,
                           interpret=self.config.resolve_interpret(),
                           dtype=x3.dtype, act=tiles_active)

    def scatter(self, x, arrays=None, tiles_active=None, sm=None, na=None):
        a = self.arrays if arrays is None else arrays
        tiles_active = self._normalize_act(tiles_active)
        x2 = self._x2(x, a, tiles_active)
        rg = (a.rg if tiles_active is None
              else _predicate_rg(a.rg, self._act_chunk(a, tiles_active),
                                 "planar"))
        return _planar_scatter_call(a.a_page, a.a_r, a.a_vals, rg,
                                    a.planes, x2, a.a_sub, sm, na,
                                    **self._static_scatter)

    def _act_chunk(self, a, tiles_active):
        return _chunk_activity(a.a_page, None, tiles_active,
                               self.layout.num_col_tiles)

    def __call__(self, x, mask=None, mask_type: MaskType | None = None,
                 arrays=None, out_3d: bool = False, tiles_active=None,
                 fidx=None):
        """One SpMV. `out_3d=True` returns y as (num_rows/1024, 8, 128) —
        a FREE view of the region blocks (the (nregions, rh, 128) output's
        row tiling matches the vector tiling exactly), so 3D-iterating
        loops never pay the 1D<->tiled relayout. A 3D `mask` is required
        with out_3d. `tiles_active` (num_col_tiles,) predicates deposits for
        SpMSpV (see _predicate_rg) AND step-compacts the grid to the
        frontier's step footprint. With `fidx` (flush_index_device(), a jit
        argument), flushes are ALSO predicated exactly (_predicate_exact):
        phase-C cost then scales with the frontier's slot footprint instead
        of paying every window-kept step's full flush batch."""
        mt = self.mask_type if mask_type is None else mask_type
        a = self.arrays if arrays is None else arrays
        lay = self.layout
        tiles_active = self._normalize_act(tiles_active)
        sm = na = None
        rg, code = a.rg, a.c_code
        if tiles_active is not None:
            act_chunk = self._act_chunk(a, tiles_active)
            if fidx is not None:
                rg, cmask, sm, na = _predicate_exact(a.rg, act_chunk,
                                                     "planar", fidx)
                code = jnp.where(cmask, a.c_code, -1)
            else:
                sm, na = _steps_sm_na(act_chunk, self._minw)
                rg = _predicate_rg(a.rg, act_chunk, "planar")
        x2 = self._x2(x, a, tiles_active)
        if self.fused:
            blocks = _planar_fused_call(a.a_page, a.a_r, a.a_vals, rg,
                                        a.planes, code, a.c_hi, a.c_lo,
                                        x2, a.a_sub, sm, na, beg=a.c_beg,
                                        looped=self._looped,
                                        banks2=self.banks2,
                                        **self._static_fused)
        else:
            g = _planar_scatter_call(a.a_page, a.a_r, a.a_vals, rg,
                                     a.planes, x2, a.a_sub, sm, na,
                                     **self._static_scatter)
            if self.permc:
                blocks = _permc_reduce_call(code, g, a.c_hi, a.c_lo,
                                            a.c_beg, sm, na,
                                            **self._static_reduce)
            else:
                blocks = _router_reduce_call(code, g, a.c_hi, a.c_lo,
                                             sm, na, **self._static_reduce)
        if out_3d:
            y = _blocks_to_3d(blocks, self.num_rows)
        else:
            y = blocks.reshape(-1)[:self.num_rows]
        if self.semiring.op == OpType.ANDOR:
            y = jnp.where(y != 0, jnp.ones_like(y), jnp.zeros_like(y))
        if mask is not None and mt != MaskType.NO_MASK:
            y = apply_mask(y, mask, mt, self.semiring.zero)
        return y


def _blocks_to_3d(blocks, num_rows: int):
    """(nregions, rh, 128) region blocks -> (num_rows/1024, 8, 128). When the
    padded region rows are 1024-divisible (every full-scale layout) this is a
    free view; small layouts pad region_rows to an odd sublane count (e.g.
    5248) and must flatten + prefix-slice first (row-aligned, still cheap)."""
    if blocks.size % (S * L) == 0:
        return blocks.reshape(-1, S, L)[:num_rows // (S * L)]
    return blocks.reshape(-1)[:num_rows].reshape(-1, S, L)


@jax.tree_util.register_pytree_node_class
class RouterArrays:
    """Device-resident router streams as a pytree (jit-argument friendly:
    large operands must never be closure constants on this sandbox)."""

    FIELDS = ("a_page", "a_r", "a_sub", "a_vals", "rg",
              "c_code", "c_hi", "c_lo")

    def __init__(self, *children):
        for name, c in zip(self.FIELDS, children):
            setattr(self, name, c)

    def tree_flatten(self):
        return tuple(getattr(self, n) for n in self.FIELDS), None

    @classmethod
    def tree_unflatten(cls, _aux, children):
        return cls(*children)


class RouterSpMV:
    """Compiled router SpMV over a fixed RouterSpMVLayout.

    Same call surface as PallasSpMV: `__call__(x, mask, mask_type, arrays)`.
    """

    def __init__(self, layout: RouterSpMVLayout, semiring: Semiring,
                 config: EngineConfig = DEFAULT_CONFIG,
                 mask_type: MaskType = MaskType.NO_MASK):
        if semiring.op == OpType.ADDMIN:
            raise ValueError("router engine supports MULADD/ANDOR only "
                             "(tropical needs row-contiguous runs; use the "
                             "chunked kernel)")
        self.layout = layout
        self.semiring = semiring
        self.config = config
        self.mask_type = mask_type
        self.num_rows = layout.num_rows
        self.num_cols = layout.num_cols
        lay = layout
        # the reduce consumes the scatter output 4D-as-is: one reduce step
        # per scatter step (its f flushed chunks), zero reshapes/copies
        cbc = lay.f
        self.cbc = cbc
        nsteps_c = lay.nsteps
        code, hi, lo = lay.c_code, lay.c_hi, lay.c_lo
        # matrix values ride as bf16 when the MXU runs at DEFAULT precision
        # (inputs get rounded to bf16 by the dot anyway): halves the
        # dominant a_vals stream against the ~95 GB/s streaming ceiling
        vdt = (jnp.bfloat16 if config.mxu_precision == "default"
               else jnp.dtype(config.dtype))
        self.arrays = RouterArrays(
            jnp.asarray(lay.a_page.reshape(lay.nsteps, 1, lay.cb)),
            jnp.asarray(lay.a_r.reshape(lay.nsteps, lay.cb * S, L)),
            jnp.asarray(lay.a_sub.reshape(lay.nsteps, lay.cb * S, L)),
            jnp.asarray(lay.a_vals.reshape(lay.nsteps, lay.cb * S, L)
                        .astype(vdt)),
            jnp.asarray(_rg_flat(lay.rg)),
            jnp.asarray(code.reshape(nsteps_c, 1, cbc)),
            jnp.asarray(hi.reshape(nsteps_c, cbc * S, L)),
            jnp.asarray(lo.reshape(nsteps_c, cbc * S, L)),
        )
        rh = lay.region_rows // 128
        gdt = ("bfloat16" if config.mxu_precision == "default"
               else config.dtype)   # see PlanarSpMV: bf16 flush stream
        self._static_scatter = dict(
            op=semiring.op, cb=lay.cb, rstep=lay.rstep, f=lay.f,
            nreg=lay.num_slots, dstep=lay.dstep,
            nct=lay.num_col_tiles, nsteps=lay.nsteps,
            interpret=config.resolve_interpret(), dtype=config.dtype,
            gdtype=gdt,
        )
        self._static_reduce = dict(
            cbc=cbc, nregions=lay.num_regions, rh=rh,
            nsteps=nsteps_c, mxu_precision=config.mxu_precision,
            interpret=config.resolve_interpret(), dtype=config.dtype,
        )
        self._static_fused = dict(
            op=semiring.op, cb=lay.cb, rstep=lay.rstep, f=lay.f,
            nreg=lay.num_slots, dstep=lay.dstep,
            rh=rh, nregions=lay.num_regions,
            nct=lay.num_col_tiles, nsteps=lay.nsteps,
            mxu_precision=config.mxu_precision,
            interpret=config.resolve_interpret(), dtype=config.dtype,
        )
        # fused when everything resident fits VMEM (~16 MB/core): x + output
        # + accumulators + double-buffered stream blocks, with headroom.
        # Single-bank fallback as in PlanarSpMV: when the second parity bank
        # alone blows the budget, fused still beats the split flush
        # round-trip.
        vbytes = jnp.dtype(vdt).itemsize
        base = (lay.num_col_tiles * 4096            # x resident
                + lay.num_regions * rh * L * 4      # output resident
                + lay.cb * 4096                     # g_buf
                + 2 * (lay.cb * S * L * (2 + vbytes)
                       + 2 * lay.f * S * L + lay.rstep * 8 + lay.cb * 4))
        self.banks2 = base + 2 * lay.num_slots * 4096 <= 12e6
        self.fused = (base + (2 if self.banks2 else 1)
                      * lay.num_slots * 4096 <= 12e6)
        self._minw = jnp.asarray(_flush_minw(lay.rg, lay.dstep))
        self._fidx_dev = None

    def flush_index_device(self):
        """Device copy of the exact flush-predication index (lazy; rides
        as a jit argument through SpMSpVModule.device_state — see
        _flush_index on why it must not be a closure constant)."""
        if self._fidx_dev is None:
            idx = _flush_index(self.layout.rg, self.layout.dstep,
                               self.layout.f)
            self._fidx_dev = ({} if idx is None else
                              {k: jnp.asarray(v) for k, v in idx.items()})
        return self._fidx_dev or None

    def _act_chunk(self, a, active):
        # roll A-chunks are page-local (a_sub rides the page's sublane,
        # chunk-constant), so (nct*8,)-sized activity predicates at
        # 128-column granularity for free
        return _chunk_activity(a.a_page, a.a_sub, active,
                               self.layout.num_col_tiles)

    def scatter(self, x, arrays: RouterArrays | None = None,
                tiles_active=None, sm=None, na=None):
        """Run phases A+B only: returns the flush-ordered value stream
        (exposed for tests against the formatter simulation)."""
        a = self.arrays if arrays is None else arrays
        x2 = (x.reshape(self.layout.num_col_tiles, S, L)
              if x.ndim == 1 else x)
        rg = (a.rg if tiles_active is None
              else _predicate_rg(a.rg, self._act_chunk(a, tiles_active),
                                 "roll"))
        return _router_scatter_call(a.a_page, a.a_r, a.a_sub, a.a_vals,
                                    rg, x2, sm, na, **self._static_scatter)

    def __call__(self, x, mask=None, mask_type: MaskType | None = None,
                 arrays: RouterArrays | None = None, out_3d: bool = False,
                 tiles_active=None, fidx=None):
        """One SpMV; x as (ncols,) or (nct, 8, 128). `out_3d=True` returns
        (num_rows/1024, 8, 128) — a free view of the region blocks — so
        3D-iterating loops skip the ~2.3 GB/s 1D<->tiled relayout.
        `tiles_active` — (num_col_tiles,) tile- or (num_col_tiles*8,)
        page-granular — predicates deposits for SpMSpV and step-compacts
        the grid. With `fidx` (flush_index_device(), a jit argument),
        flushes are ALSO predicated exactly (_predicate_exact)."""
        mt = self.mask_type if mask_type is None else mask_type
        a = self.arrays if arrays is None else arrays
        lay = self.layout
        sm = na = None
        rg, code = a.rg, a.c_code
        if tiles_active is not None:
            act_chunk = self._act_chunk(a, tiles_active)
            if fidx is not None:
                rg, cmask, sm, na = _predicate_exact(a.rg, act_chunk,
                                                     "roll", fidx)
                code = jnp.where(cmask, a.c_code, -1)
            else:
                sm, na = _steps_sm_na(act_chunk, self._minw)
                rg = _predicate_rg(a.rg, act_chunk, "roll")
        x2 = x.reshape(lay.num_col_tiles, S, L) if x.ndim == 1 else x
        if self.fused:
            blocks = _router_fused_call(a.a_page, a.a_r, a.a_sub, a.a_vals,
                                        rg, code, a.c_hi, a.c_lo, x2,
                                        sm, na, banks2=self.banks2,
                                        **self._static_fused)
        else:
            g = _router_scatter_call(a.a_page, a.a_r, a.a_sub, a.a_vals,
                                     rg, x2, sm, na, **self._static_scatter)
            blocks = _router_reduce_call(code, g, a.c_hi, a.c_lo,
                                         sm, na, **self._static_reduce)
        if out_3d:
            y = _blocks_to_3d(blocks, self.num_rows)
        else:
            y = blocks.reshape(-1)[:self.num_rows]
        if self.semiring.op == OpType.ANDOR:
            y = jnp.where(y != 0, jnp.ones_like(y), jnp.zeros_like(y))
        if mask is not None and mt != MaskType.NO_MASK:
            y = apply_mask(y, mask, mt, self.semiring.zero)
        return y
