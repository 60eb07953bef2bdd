"""Scalable tropical (min-plus) SpMV engine: gather -> scatter -> window
split -> scan/max reduce.

Executes the TropicalSpMVLayout built by io/tropical_format.py (see its
docstring for the full design). Pipeline per SpMV:

  1. xperm + planar scatter (ops/router_pallas.py, op=ADDMIN): phase A
     computes the EXACT int32 tropical encoding E(min(val+x, INF)) =
     INF_BITS - bits(.) (order-reversing on non-negative f32, identity 0),
     phase B radix-scatters it by `region_rows`-row region. Unchanged
     planar machinery — deposits are dtype-agnostic bit movers.
  2. an XLA chunk gather reorders the flush stream region-major.
  3. SPLIT kernel (here): planar-style plane deposits redistribute each
     region's stream into 128-row window-pure chunks; only
     region_rows/128 digit accumulators are live (drained between regions
     by pack-time flush descriptors).
  4. WINDOW REDUCE kernel (here): per chunk, one per-sublane sort gather +
     7-step segmented max-scan + run-end inv gather + sublane max gives the
     (1,128) window max, accumulated into the resident (nwin, 1, 128)
     output. The epilogue decodes y = bits^-1(INF_BITS - out).

Counterpart of the reference's MIN_ADD SpMV at full scale (min-ALU PEs,
graphlily/hw/ufixed_pe_fwd.h:23-65 + kernel_spmv_impl.h partitions); the
chunked kernel (ops/spmv_pallas.py) remains the small-graph tropical path.
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
from .router_pallas import (_planar_scatter_call, _xperm_call, INF_BITS,
                            PlanarArrays, _rg_flat)

S = 8
L = 128


def _make_split_kernel(kb: int, rstep: int, nreg: int,
                       banks2: bool = True, dstep: int = 0,
                       looped: bool = False, unroll: int = 16):
    """Window split: planar deposit/flush body minus phase A (the input is
    the already-encoded region stream). Phase-ordered stream with batched
    deposit guards — see ops/router_pallas.py layout v3.

    `looped` block-unrolls the deposit loop (manual partial unroll, the
    _make_planar_kernel_looped idiom): the fully-unrolled kernel CRASHES
    the remote Mosaic compiler past ~400 descriptor slots (ogbn_products
    rstep2=765 -> tpu_compile_helper exit 1, while hollywood's 396
    compiled) — every index the body needs (plane ordinal, chunk, slot)
    is already dynamic, so only cross-block ILP is lost."""
    def kernel(qb_ref,            # scalar-prefetch: out block per step
               rg_ref,            # (1, 1, 2*rstep) int32 SMEM (w1,w2 interleaved)
               g_ref,             # (1, kb, 8, 128) int32 region-major stream
               pl_ref,            # (1, dmax, 8, 128) int8 deposit planes
               o_ref,             # (1, f, 8, 128) int32 window stream block
               acc_ref,           # scratch (nreg, 8, 128) int32, even bank
               acc2_ref):         # odd-parity bank (router_pallas banks note)
        del qb_ref               # consumed by the out index_map only
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            if banks2:
                acc2_ref[...] = jnp.zeros_like(acc2_ref)

        def dep_body(w1, w2, bank):
            pv = pl_ref[0, w1 >> 8].astype(jnp.int32)
            g = jnp.take_along_axis(g_ref[0, w1 & 0xFF], pv & 127, axis=1)
            thr = jnp.where(w2 > 0, 0, -256)   # padding slots route nothing
            slot = w2 & 0xFFF
            bank[slot] = jnp.where(pv < thr, g, bank[slot])

        if looped:
            # unconditional bodies (the w2 threshold no-ops padding); a
            # dynamic outer loop over blocks of `unroll` inlined bodies
            def dyn_body(j, parity):
                bank = acc2_ref if (banks2 and parity) else acc_ref
                dep_body(rg_ref[0, 0, 2 * j], rg_ref[0, 0, 2 * j + 1], bank)

            nb = dstep // unroll

            def body(b, carry):
                base = b * unroll
                for u in range(unroll):
                    dyn_body(base + u, u % 2)
                return carry

            if nb:
                jax.lax.fori_loop(0, nb, body, 0, unroll=1)
            for j in range(nb * unroll, dstep):   # static tail
                dyn_body(j, j % 2)
        else:
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
            w2 = rg_ref[0, 0, 2 * j + 1]
            slot = w2 & 0xFFF

            @pl.when(w2 < 0)   # flush: copy + zero (banks hold disjoint
            def _():           # ranges on zero background -> sum = union)
                q = (w2 >> 16) & 0xFF
                gch = (acc_ref[slot] + acc2_ref[slot] if banks2
                       else acc_ref[slot])
                o_ref[0, pl.ds(q, 1)] = gch[None]
                acc_ref[slot] = jnp.zeros_like(gch)
                if banks2:
                    acc2_ref[slot] = jnp.zeros_like(gch)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("kb", "rstep", "f", "dmax", "nreg", "nsteps",
                     "interpret", "dstep", "looped", "nblocks"))
def _split_call(qblk, rg, g, planes, *, kb, rstep, f, dmax, nreg, nsteps,
                interpret, dstep=0, looped=False, nblocks=0):
    # compact window stream (io/tropical_format.compact_window_stream):
    # the output block index rides a scalar-prefetched monotone map —
    # consecutive steps SHARE a block (Mosaic keeps a revisited output
    # block in VMEM, writing it back once on advance), so the stream is
    # sized by total flushes, not nsteps2 * max-flushes-per-step
    nblocks = nblocks or nsteps
    kernel = _make_split_kernel(kb, rstep, nreg,
                                banks2=not interpret, dstep=dstep,
                                looped=looped)
    stream = lambda i, qb: (i, 0, 0)
    stream4 = lambda i, qb: (i, 0, 0, 0)
    fn = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nsteps,),
            in_specs=[
                pl.BlockSpec((1, 1, 2 * rstep), stream,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, kb, S, L), stream4,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, dmax, S, L), stream4,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, f, S, L),
                                   lambda i, qb: (qb[i], 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((nreg, S, L), jnp.int32),
                            pltpu.VMEM((nreg, S, L), jnp.int32)]),
        out_shape=jax.ShapeDtypeStruct((nblocks, f, S, L), jnp.int32),
        interpret=interpret,
    )
    return fn(qblk, rg, g, planes)


def _make_split_kernel_triples(kb: int, rstep: int, nreg: int, TP: int,
                               banks2: bool = True, dstep: int = 0,
                               looped: bool = False, unroll: int = 16):
    """Triples split variant (io/tropical_format.derive_split_triples):
    each input chunk is digit-major sorted ONCE (xsort2), after which every
    deposit piece is one contiguous source run onto one contiguous
    accumulator run — decoded from 32 B of packed words instead of a 1 KB
    gather plane (the permc deposit format, ops/router_pallas.py).

    `looped` block-unrolls the deposit loop exactly like the planes split
    kernel: the fully-unrolled kernel crashes the remote Mosaic compiler
    past ~400 descriptor slots, and the triples format targets the graphs
    whose rstep2 is far beyond that (products 765, orkut-class more). A
    dynamic ordinal can't use the static-slice word decode, so the looped
    dep_body decodes via one broadcast take_along_axis of the triple
    word's column (the _make_planar_kernel_looped triples idiom)."""
    def kernel(qb_ref,            # scalar-prefetch: out block per step
               rg_ref,            # (1, 1, 2*rstep) int32 SMEM (w1,w2 interleaved)
               g_ref,             # (1, kb, 8, 128) int32 region-major stream
               xs_ref,            # (1, kb, 8, 128) int32 chunk sort planes
               tp_ref,            # (1, TP, 8, 128) int32 packed run words
               o_ref,             # (1, f, 8, 128) int32 window stream block
               acc_ref,           # scratch (nreg, 8, 128) int32, even bank
               acc2_ref,          # odd-parity bank
               gs_ref):           # scratch (kb, 8, 128) int32 sorted chunks
        del qb_ref               # consumed by the out index_map only
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            if banks2:
                acc2_ref[...] = jnp.zeros_like(acc2_ref)

        for k in range(kb):
            gs_ref[k] = jnp.take_along_axis(g_ref[0, k], xs_ref[0, k],
                                            axis=1)

        lane_i = jax.lax.broadcasted_iota(jnp.int32, (S, L), 1)
        if not looped:
            dec = []
            for tp in range(TP):
                w = tp_ref[0, tp]
                dec.append((w & 127, (w >> 7) & 127, (w >> 14) & 255))

        if looped:
            # dynamic-ordinal word decode: the piece ordinal is w1 >> 8
            # (stamped by derive_split_triples), its word is column
            # (p & 127) of plane (p >> 7) — one broadcast gather
            def dyn_body(j, parity):
                w1 = rg_ref[0, 0, 2 * j]
                w2 = rg_ref[0, 0, 2 * j + 1]
                bank = acc2_ref if (banks2 and parity) else acc_ref
                p_ = w1 >> 8
                w = tp_ref[0, p_ >> 7]
                wc = jnp.take_along_axis(
                    w, jnp.full((S, L), p_ & 127, jnp.int32), axis=1)
                a0 = wc & 127
                d0 = (wc >> 7) & 127
                nn = (wc >> 14) & 255
                idx = (lane_i - d0 + a0) & 127
                g = jnp.take_along_axis(gs_ref[w1 & 0xFF], idx, axis=1)
                m = jnp.logical_and(
                    jnp.logical_and(lane_i >= d0, lane_i < d0 + nn), w2 > 0)
                slot = w2 & 0xFFF
                bank[slot] = jnp.where(m, g, bank[slot])

            nb = dstep // unroll

            def body(b, carry):
                base = b * unroll
                for u in range(unroll):
                    dyn_body(base + u, u % 2)
                return carry

            if nb:
                jax.lax.fori_loop(0, nb, body, 0, unroll=1)
            for j in range(nb * unroll, dstep):   # static tail
                dyn_body(j, j % 2)
        else:
            def dep_body(j, w1, w2, bank):
                c = j & 127
                a0, d0, nn = (dd[:, c:c + 1] for dd in dec[j >> 7])
                idx = (lane_i - d0 + a0) & 127
                g = jnp.take_along_axis(gs_ref[w1 & 0xFF], idx, axis=1)
                m = jnp.logical_and(
                    jnp.logical_and(lane_i >= d0, lane_i < d0 + nn), w2 > 0)
                slot = w2 & 0xFFF
                bank[slot] = jnp.where(m, g, bank[slot])

            DG = 8
            for j0 in range(0, dstep, DG):
                n = min(DG, dstep - j0)
                ws = [(rg_ref[0, 0, 2 * (j0 + u)],
                       rg_ref[0, 0, 2 * (j0 + u) + 1])
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
                o_ref[0, pl.ds(q, 1)] = gch[None]
                acc_ref[slot] = jnp.zeros_like(gch)
                if banks2:
                    acc2_ref[slot] = jnp.zeros_like(gch)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("kb", "rstep", "f", "dmax", "nreg", "nsteps",
                     "interpret", "dstep", "TP", "looped", "nblocks"))
def _split_call_triples(qblk, rg, g, xsort, triples, *, kb, rstep, f, dmax,
                        nreg, nsteps, interpret, dstep=0, TP=1, looped=False,
                        nblocks=0):
    nblocks = nblocks or nsteps
    kernel = _make_split_kernel_triples(kb, rstep, nreg, TP,
                                        banks2=not interpret, dstep=dstep,
                                        looped=looped)
    stream = lambda i, qb: (i, 0, 0)
    stream4 = lambda i, qb: (i, 0, 0, 0)
    fn = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nsteps,),
            in_specs=[
                pl.BlockSpec((1, 1, 2 * rstep), stream,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, kb, S, L), stream4,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kb, S, L), stream4,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TP, S, L), stream4,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, f, S, L),
                                   lambda i, qb: (qb[i], 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((nreg, S, L), jnp.int32),
                            pltpu.VMEM((nreg, S, L), jnp.int32),
                            pltpu.VMEM((kb, S, L), jnp.int32)]),
        out_shape=jax.ShapeDtypeStruct((nblocks, f, S, L), jnp.int32),
        interpret=interpret,
    )
    return fn(qblk, rg, g, xsort, triples)


def _make_window_reduce_kernel(cbc: int):
    """Per window-pure chunk: sort gather -> segmented max-scan -> run-end
    inv gather -> sublane max -> resident window max-accumulate.

    Chunks run batched under shared any-active guards: one pl.when per
    chunk is a scheduling barrier that serializes the scan's roll chains
    (see ops/router_pallas.py layout v3); inactive members mask their
    result to 0, the bit-encoded max identity."""
    def kernel(cwin_ref,          # (1, 1, cbc) int32 SMEM: window ids
               g_ref,             # (1, cbc, 8, 128) int32
               sort_ref,          # (1, cbc*8, 128) int8 sort permutation
               row_ref,           # (1, cbc*8, 128) int8 POST-SORT row ids
               inv_ref,           # (1, cbc*8, 128) int8 run-end lanes
               o_ref):            # (nwin, 1, 128) int32 resident
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        def body(k, c):
            sidx = sort_ref[0, k * S:(k + 1) * S, :].astype(jnp.int32)
            g = jnp.take_along_axis(g_ref[0, k], sidx & 127, axis=1)
            rows = row_ref[0, k * S:(k + 1) * S, :].astype(jnp.int32)
            for shift in (1, 2, 4, 8, 16, 32, 64):
                g_s = pltpu.roll(g, shift, 1)
                r_s = pltpu.roll(rows, shift, 1)
                g = jnp.where(r_s == rows, jnp.maximum(g, g_s), g)
            iv = inv_ref[0, k * S:(k + 1) * S, :].astype(jnp.int32)
            h = jnp.take_along_axis(g, iv & 127, axis=1)
            h = jnp.where(iv < 0, h, 0)
            m = jnp.max(h, axis=0, keepdims=True)           # (1, 128)
            m = jnp.where(c >= 0, m, 0)                     # inactive -> id
            o_ref[jnp.maximum(c, 0)] = jnp.maximum(
                o_ref[jnp.maximum(c, 0)], m)

        CG = 4
        for k0 in range(0, cbc, CG):
            n = min(CG, cbc - k0)
            cs = [cwin_ref[0, 0, k0 + u] for u in range(n)]
            anyact = cs[0]
            for u in range(1, n):
                anyact = jnp.maximum(anyact, cs[u])

            @pl.when(anyact >= 0)
            def _():
                for u in range(n):
                    body(k0 + u, cs[u])

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("cbc", "nwin", "nsteps", "interpret"))
def _window_reduce_call(cwin, g, sort2, rowids, inv2, *, cbc, nwin, nsteps,
                        interpret):
    kernel = _make_window_reduce_kernel(cbc)
    stream = lambda i: (i, 0, 0)
    fn = pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((1, 1, cbc), stream, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, cbc, S, L), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cbc * S, L), stream, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cbc * S, L), stream, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cbc * S, L), stream, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nwin, 1, L), jnp.int32),
        interpret=interpret,
    )
    return fn(cwin, g, sort2, rowids, inv2)


@jax.tree_util.register_pytree_node_class
class TropicalArrays:
    """Device-resident tropical streams as a jit-argument pytree."""

    FIELDS = ("a_page", "a_r", "xperm", "a_vals", "rg", "planes",
              "in_order", "rg2", "planes2", "c_win", "sort2", "rowids",
              "inv2", "a_sub", "xsort2", "triples2", "qblk2")

    def __init__(self, *children):
        children = children + (None,) * (len(self.FIELDS) - len(children))
        for name, c in zip(self.FIELDS, children):
            setattr(self, name, c)

    def tree_flatten(self):
        return tuple(getattr(self, n) for n in self.FIELDS), None

    @classmethod
    def tree_unflatten(cls, _aux, children):
        return cls(*children)


class TropicalSpMV:
    """Compiled scalable tropical SpMV over a TropicalSpMVLayout. Same call
    surface as PlanarSpMV. Requires x >= 0 (distances; matches the
    reference's unsigned ufixed datatype, graphlily/global.h:63)."""

    def __init__(self, layout, semiring: Semiring,
                 config: EngineConfig = DEFAULT_CONFIG,
                 mask_type: MaskType = MaskType.NO_MASK):
        if semiring.op != OpType.ADDMIN:
            raise ValueError("TropicalSpMV is the ADDMIN engine; use "
                             "PlanarSpMV/RouterSpMV for MULADD/ANDOR")
        self.layout = layout
        self.semiring = semiring
        self.config = config
        self.mask_type = mask_type
        self.num_rows = layout.num_rows
        self.num_cols = layout.num_cols
        p = layout.planar
        self.chained = getattr(p, "a_sub", None) is not None
        # split_format="triples": pass-1 planes are ALSO compressed to
        # triple-run words (io/planar_format.planes_to_triples) — they ride
        # the planes slot, with the scatter's triples decode switched on
        self.p1_triples = getattr(p, "triples", None) is not None
        # compact window stream (io/tropical_format.compact_window_stream):
        # legacy rectangular layouts (dist mesh pads, old cache entries)
        # ride the identity block map — same kernel, same semantics
        qblk2 = getattr(layout, "qblk2", None)
        nblocks2 = (int(layout.nblocks2) if qblk2 is not None
                    else layout.nsteps2)
        if qblk2 is None:
            qblk2 = np.arange(layout.nsteps2, dtype=np.int32)
        self.nblocks2 = nblocks2
        self.arrays = TropicalArrays(
            jnp.asarray(p.a_page.reshape(p.nsteps, 1, p.cb)),
            jnp.asarray(p.a_r.reshape(p.nsteps, p.cb * S, L)),
            jnp.asarray(p.xperm),
            jnp.asarray(p.a_vals.reshape(p.nsteps, p.cb * S, L)),
            jnp.asarray(_rg_flat(p.rg)),
            jnp.asarray(p.triples if self.p1_triples else p.planes),
            jnp.asarray(layout.in_order.reshape(layout.nsteps2, layout.kb)),
            jnp.asarray(_rg_flat(layout.rg2)),
            jnp.asarray(layout.planes2),
            jnp.asarray(layout.c_win.reshape(nblocks2, 1, layout.f2)),
            jnp.asarray(layout.sort2.reshape(nblocks2, layout.f2 * S, L)),
            jnp.asarray(layout.rowids.reshape(nblocks2, layout.f2 * S, L)),
            jnp.asarray(layout.inv2.reshape(nblocks2, layout.f2 * S, L)),
            (jnp.asarray(p.a_sub.reshape(p.nsteps, p.cb * S, L))
             if self.chained else None),
            (jnp.asarray(layout.xsort2)
             if layout.xsort2 is not None else None),
            (jnp.asarray(layout.triples2)
             if layout.triples2 is not None else None),
            jnp.asarray(qblk2),
        )
        self.split_triples = layout.triples2 is not None
        self._static_scatter = dict(
            op=OpType.ADDMIN, cb=p.cb, rstep=p.rstep, f=p.f, dmax=p.dmax,
            dstep=p.dstep,
            nreg=p.num_slots, nct=p.num_col_tiles, nsteps=p.nsteps,
            interpret=config.resolve_interpret(), dtype="float32",
            gdtype="int32", looped=p.rstep > 48, triples=self.p1_triples)
        self._static_split = dict(
            kb=layout.kb, rstep=layout.rstep2, f=layout.f2,
            dmax=layout.dmax2, dstep=layout.dstep2,
            nreg=layout.num_slots2, nblocks=nblocks2,
            nsteps=layout.nsteps2, interpret=config.resolve_interpret())
        if self.split_triples:
            self._static_split["TP"] = layout.triples2.shape[1]
        # fully unrolled past ~400 slots crashes the Mosaic compiler
        # (ogbn_products rstep2=765); hollywood's 396 compiled and is
        # the measured config, so the threshold sits just above it.
        # Applies to BOTH split formats: triples targets exactly the
        # graphs whose rstep2 is far beyond the threshold (ADVICE r4).
        self._static_split["looped"] = layout.rstep2 > 448
        self._static_reduce = dict(
            cbc=layout.f2, nwin=layout.num_windows, nsteps=nblocks2,
            interpret=config.resolve_interpret())

    def __call__(self, x, mask=None, mask_type: MaskType | None = None,
                 arrays=None, out_3d: bool = False, tiles_active=None):
        """One tropical SpMV: y[r] = min over nnz(r,c) of (A[r,c] + x[c]).
        `out_3d` returns (num_rows/1024, 8, 128) — the window-major output
        tiling equals the vector tiling, so the view is free. `tiles_active`
        predicates pass-1 deposits for SpMSpV: skipped ranges read 0, the
        MAX-identity of the bit-encoded domain (= E(INF), the tropical
        annihilator), so inactive columns drop out exactly."""
        from .router_pallas import _predicate_rg, _chunk_activity
        mt = self.mask_type if mask_type is None else mask_type
        a = self.arrays if arrays is None else arrays
        lay = self.layout
        p = lay.planar
        nct = p.num_col_tiles
        if tiles_active is not None and tiles_active.shape[0] == nct * 8:
            tiles_active = jnp.max(
                tiles_active.astype(jnp.int32).reshape(-1, 8), axis=1)
        x3 = x.reshape(nct, S, L) if x.ndim == 1 else x
        # deal="free" layouts need no xperm re-layout (chained phase-A
        # gather reaches any (sublane, lane) of the natural tile)
        x2 = (x3 if self.chained else
              _xperm_call(a.xperm, x3, nct=nct,
                          interpret=self.config.resolve_interpret(),
                          dtype=x3.dtype, act=tiles_active))
        rg = (a.rg if tiles_active is None
              else _predicate_rg(
                  a.rg, _chunk_activity(a.a_page, None, tiles_active, nct),
                  "planar"))
        g1 = _planar_scatter_call(a.a_page, a.a_r, a.a_vals, rg, a.planes,
                                  x2, a.a_sub, **self._static_scatter)
        g1 = g1.reshape(p.nsteps * p.f, S, L)
        # in_order is in-bounds by construction (pads repeat a real chunk);
        # the default fill mode materialized an extra g1-sized select temp
        # (441-490 MB at products scale in the r4 OOM dumps)
        gm = jnp.take(g1, a.in_order.reshape(-1), axis=0,
                      mode="clip").reshape(
            lay.nsteps2, lay.kb, S, L)
        if self.split_triples:
            g2 = _split_call_triples(a.qblk2, a.rg2, gm, a.xsort2,
                                     a.triples2, **self._static_split)
        else:
            g2 = _split_call(a.qblk2, a.rg2, gm, a.planes2,
                             **self._static_split)
        blocks = _window_reduce_call(a.c_win, g2, a.sort2, a.rowids, a.inv2,
                                     **self._static_reduce)
        ybits = INF_BITS - blocks.reshape(-1)[:self.num_rows]
        y = jax.lax.bitcast_convert_type(ybits, jnp.float32)
        if out_3d:
            y = y.reshape(-1, S, L)
        if mask is not None and mt != MaskType.NO_MASK:
            y = apply_mask(y, mask, mt, self.semiring.zero)
        return y
