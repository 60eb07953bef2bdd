"""Router SpMV engine: gather -> radix-scatter -> region-reduce.

The scalable SpMV for graphs whose (row-window x col-tile) density is too low
for the chunked dual-gather layout (ops/spmv_pallas.py). Two pallas kernels
over the layout built by io/router_format.py (which precomputes EVERY index:
only f32 values move at runtime):

  scatter kernel (phases A+B fused), grid over A-chunk batches:
    1. per A-chunk: broadcast-select the chunk's 128-col x page from the
       resident x (ax0 dynamic_gather with a constant index — the known-good
       8-sublane table form), one ax1 dynamic_gather, g = val (x) x[col];
    2. walk the step's unified descriptor stream:
       - deposit: move a flat run of g into its region's (8,128) VMEM
         accumulator at the precomputed cursor (one dynamic lane roll, two
         sublane rolls, masked merge);
       - flush: copy the (masked) accumulator into the step's output block
         at flush ordinal q — the value stream leaves in flush order.

  reduce kernel (phase C), grid over the flush stream:
    per flushed chunk (tagged with its 16384-row region, -1 = garbage): per
    sublane, a (128,L) hi one-hot against the static hi stream and a (128,L)
    lo-masked value matrix contract on the MXU into a (128,128) accumulator
    — which IS the region's output rows arranged [hi, lo] = [(row>>7)&127,
    row&127] — added into the VMEM-resident (nregions,128,128) output
    (zeroed at step 0).

Counterpart of the reference's bounded 2-D partitioned SpMV
(graphlily/hw/kernel_spmv_impl.h:470-513); the radix scatter plays the role
of its shuffle stage, done through HBM with static schedules instead of a
crossbar. Supported semirings: MULADD, ANDOR (see router_format.py for why
tropical stays on the chunked kernel).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import EngineConfig, DEFAULT_CONFIG
from ..semiring import Semiring, OpType, MaskType, apply_mask
from ..io.router_format import RouterSpMVLayout, CHUNK

S = 8
L = 128


def _make_scatter_kernel(op: OpType, cb: int, rstep: int, nreg: int):
    def kernel(page_ref,              # (1, 1, cb) int32
               r_ref,                 # (1, cb*8, 128) int8
               v_ref,                 # (1, cb*8, 128) f32
               rg_ref,                # (1, rstep, 2) int32
               x_ref,                 # (nct, 8, 128) resident
               o_ref,                 # (1, f, 8, 128) flush block
               g_buf,                 # scratch (cb, 8, 128)
               acc_ref):              # scratch (nreg, 8, 128)
        # ---- phase A: gather + semiring mul for the step's cb chunks ------
        r_all = r_ref[0].astype(jnp.int32)
        for k in range(cb):
            p = page_ref[0, 0, k]
            t = x_ref[p // 8]                               # (8, 128)
            xp = jnp.take_along_axis(
                t, jnp.full((S, L), p % 8, jnp.int32), axis=0)
            g = jnp.take_along_axis(xp, r_all[k * S:(k + 1) * S, :], axis=1)
            vals = v_ref[0, k * S:(k + 1) * S, :]
            if op == OpType.MULADD:
                g = g * vals
            elif op == OpType.ANDOR:
                g = jnp.logical_and(vals != 0, g != 0).astype(vals.dtype)
            else:
                raise ValueError(op)
            g_buf[k] = g

        # ---- phase B: deposits + inline flushes ----------------------------
        # descriptors arrive through SMEM (scalar memory): per-descriptor
        # reads are ~2 cycles vs ~100 for VMEM scalar loads, and the pl.when
        # guard lets Mosaic skip the (dominant) dynamic rolls on inactive
        # slots — measured 18.5 -> 4.7 ms on the googleplus stand-in
        # (tools/router_ab.py).
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (S, L), 1)
        flat_i = jax.lax.broadcasted_iota(jnp.int32, (S, L), 0) * L + lane_i
        for j in range(rstep):
            w1 = rg_ref[0, j, 0]
            w2 = rg_ref[0, j, 1]
            ln = w2 >> 16
            slot = w2 & 0xFF

            @pl.when(ln > 0)
            def _():
                src13 = w1 & 0x1FFF
                dst = (w1 >> 13) & 0x3FF
                k = src13 // CHUNK
                src = src13 % CHUNK
                delta = (dst - src) % CHUNK
                dl = delta % L
                ds = delta // L
                g = g_buf[k]
                r1 = pltpu.roll(g, dl, 1)
                y = jnp.where(lane_i >= dl,
                              pltpu.roll(r1, ds, 0),
                              pltpu.roll(r1, (ds + 1) % S, 0))
                m = jnp.logical_and(flat_i >= dst, flat_i < dst + ln)
                acc_ref[slot] = jnp.where(m, y, acc_ref[slot])

            @pl.when((w2 >> 15) & 1 == 1)
            def _():
                q = (w2 >> 8) & 0x7F
                cur = w1
                o_ref[0, pl.ds(q, 1)] = jnp.where(flat_i < cur,
                                                  acc_ref[slot], 0.0)[None]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("op", "cb", "rstep", "f", "nreg", "nct", "nsteps",
                     "interpret", "dtype"))
def _router_scatter_call(page, r, vals, rg, x2, *, op, cb, rstep, f, nreg,
                         nct, nsteps, interpret, dtype):
    kernel = _make_scatter_kernel(op, cb, rstep, nreg)
    stream = lambda i: (i, 0, 0)
    fn = pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((1, 1, cb), stream, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, cb * S, L), stream, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cb * S, L), stream, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rstep, 2), stream, memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x resident
        ],
        out_specs=pl.BlockSpec((1, f, S, L), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nsteps, f, S, L), jnp.dtype(dtype)),
        scratch_shapes=[
            pltpu.VMEM((cb, S, L), jnp.dtype(dtype)),
            pltpu.VMEM((nreg, S, L), jnp.dtype(dtype)),
        ],
        interpret=interpret,
    )
    return fn(page, r, vals, rg, x2)


def _make_reduce_kernel(cbc: int, precision):
    def kernel(code_ref,              # (1, 1, cbc) int32 region ids (-1 skip)
               g_ref,                 # (1, cbc, 8, 128) f32 flushed values
               hi_ref,                # (1, cbc*8, 128) int8
               lo_ref,                # (1, cbc*8, 128) int8
               o_ref):                # (nregions, 128, 128) resident output
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        hi_t = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
        lo_t = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
        hi_all = hi_ref[0].astype(jnp.int32)
        lo_all = lo_ref[0].astype(jnp.int32)
        for k in range(cbc):
            c = code_ref[0, 0, k]

            @pl.when(c >= 0)
            def _():
                acc = jnp.zeros((L, L), jnp.float32)
                for s in range(S):
                    row = k * S + s
                    g = g_ref[0, k, s:s + 1, :]
                    hi = hi_all[row:row + 1, :]
                    lo = lo_all[row:row + 1, :]
                    oh_hi = (hi_t == hi).astype(jnp.float32)     # (128, L)
                    m_lo = jnp.where(lo_t == lo,
                                     jnp.broadcast_to(g, (L, L)), 0.0)
                    acc = acc + jax.lax.dot_general(
                        oh_hi, m_lo, (((1,), (1,)), ((), ())),
                        precision=precision,
                        preferred_element_type=jnp.float32)
                o_ref[c] += acc.astype(o_ref.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("cbc", "nregions", "nsteps", "mxu_precision",
                     "interpret", "dtype"))
def _router_reduce_call(code, g, hi, lo, *, cbc, nregions, nsteps,
                        mxu_precision, interpret, dtype):
    """Consumes the scatter output (nsteps, f, 8, 128) DIRECTLY — one reduce
    step per scatter step, no reshape between the kernels (a materialized
    reshape/copy of the stream measured ~4 ms on the googleplus stand-in)."""
    precision = (jax.lax.Precision.HIGHEST if mxu_precision == "highest"
                 else jax.lax.Precision.DEFAULT)
    kernel = _make_reduce_kernel(cbc, precision)
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
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),   # whole out
        out_shape=jax.ShapeDtypeStruct((nregions, L, L), jnp.dtype(dtype)),
        interpret=interpret,
    )
    return fn(code, g, hi, lo)


@jax.tree_util.register_pytree_node_class
class RouterArrays:
    """Device-resident router streams as a pytree (jit-argument friendly:
    large operands must never be closure constants on this sandbox)."""

    FIELDS = ("a_page", "a_r", "a_vals", "rg", "c_code", "c_hi", "c_lo")

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
        self.arrays = RouterArrays(
            jnp.asarray(lay.a_page.reshape(lay.nsteps, 1, lay.cb)),
            jnp.asarray(lay.a_r.reshape(lay.nsteps, lay.cb * S, L)),
            jnp.asarray(lay.a_vals.reshape(lay.nsteps, lay.cb * S, L)
                        .astype(config.dtype)),
            jnp.asarray(lay.rg),
            jnp.asarray(code.reshape(nsteps_c, 1, cbc)),
            jnp.asarray(hi.reshape(nsteps_c, cbc * S, L)),
            jnp.asarray(lo.reshape(nsteps_c, cbc * S, L)),
        )
        self._static_scatter = dict(
            op=semiring.op, cb=lay.cb, rstep=lay.rstep, f=lay.f,
            nreg=lay.num_regions, nct=lay.num_col_tiles, nsteps=lay.nsteps,
            interpret=config.resolve_interpret(), dtype=config.dtype,
        )
        self._static_reduce = dict(
            cbc=cbc, nregions=lay.num_regions, nsteps=nsteps_c,
            mxu_precision=config.mxu_precision,
            interpret=config.resolve_interpret(), dtype=config.dtype,
        )

    def scatter(self, x, arrays: RouterArrays | None = None):
        """Run phases A+B only: returns the flush-ordered value stream
        (exposed for tests against the formatter simulation)."""
        a = self.arrays if arrays is None else arrays
        x2 = x.reshape(self.layout.num_col_tiles, S, L)
        return _router_scatter_call(a.a_page, a.a_r, a.a_vals, a.rg, x2,
                                    **self._static_scatter)

    def __call__(self, x, mask=None, mask_type: MaskType | None = None,
                 arrays: RouterArrays | None = None):
        mt = self.mask_type if mask_type is None else mask_type
        a = self.arrays if arrays is None else arrays
        lay = self.layout
        g = self.scatter(x, arrays=a)
        blocks = _router_reduce_call(a.c_code, g, a.c_hi, a.c_lo,
                                     **self._static_reduce)
        y = blocks.reshape(-1)[:self.num_rows]
        if self.semiring.op == OpType.ANDOR:
            y = jnp.where(y != 0, jnp.ones_like(y), jnp.zeros_like(y))
        if mask is not None and mt != MaskType.NO_MASK:
            y = apply_mask(y, mask, mt, self.semiring.zero)
        return y
