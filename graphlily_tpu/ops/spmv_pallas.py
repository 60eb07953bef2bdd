"""Pallas SpMV engine: chunked dual-gather masked semiring SpMV.

TPU-native replacement for the reference's 16-channel x 8-PE SpMV dataflow
(graphlily/hw/kernel_spmv_impl.h). Mapping of the reference architecture onto
the v5e (measured-primitive driven; see SURVEY.md section 7):

  reference                               this kernel
  ---------                               -----------
  CPSR channel streams (matrix loader)    chunk grid: (8,128) nnz tiles streamed
                                          HBM->VMEM by the pallas pipeline
  vector URAM + shuffle-1 + gather        x col-tile (1024 elems) as a VMEM
  (hw/kernel_spmv_impl.h:165-216)         (8,128) block; per-element gather =
                                          ONE `tpu.dynamic_gather` along lanes:
                                          g[s,l] = x2[s, r[s,l]] (the formatter
                                          bins sublane s to x-bucket s, making
                                          the sublane pick the identity)
  shuffle-2 + forwarding PE accumulate    one-hot MXU matmul into a 128-row
  (hw/ufixed_pe_fwd.h:346-462)            window (add semirings) or transposed
                                          masked-min (tropical); no hazards --
                                          the TPU grid is sequential
  output URAM row partitions              out blocks (8,128)=1024 rows, revisited
  (SPMV_OUT_BUF_LEN)                      across chunks, zeroed on first visit
  masked write_to_out_ddr                 jnp.where epilogue outside the kernel
  (hw/kernel_spmv_impl.h:361-385)

Throughput notes (v5e, measured): dynamic_gather ax0 ~79 G/s, ax1 ~35 G/s;
XLA's own gather ~0.1 G/s (hence this kernel exists).
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
from ..io.formatter import ChunkedSpMVLayout

W = 128   # row window (one-hot width)
S = 8     # chunk sublanes
L = 128   # lanes


def _reduce_rows_add(g, rows, precision):
    """Sum-by-row-local reduce of a chunk: returns (1, W) window accumulator.

    Two-level one-hot factorization (row = hi*16 + lo): per sublane, an
    (8,L) hi one-hot and a (16,L) lo-masked value matrix contract on the MXU
    into an (8,16) accumulator; a static selector matmul + hi-mask flatten
    rebuilds the (1,W) window row. 5.3x less one-hot compare volume than the
    direct (128,W) construction and no transposes — measured 2.8x end-to-end
    (23.3 -> 8.2 ms on the googleplus-scale benchmark). All index math stays
    sublane-oriented so only supported Mosaic ops appear (tpu.reshape
    (8,16)->(1,128) is unsupported; the selector matmul replaces it).
    """
    hi_t = jax.lax.broadcasted_iota(jnp.int32, (8, L), 0)
    lo_t = jax.lax.broadcasted_iota(jnp.int32, (16, L), 0)
    acc816 = jnp.zeros((8, 16), jnp.float32)
    for s in range(S):
        rrow = rows[s:s + 1, :]
        oh_hi = (hi_t == (rrow >> 4)).astype(jnp.float32)
        m_lo = jnp.where(lo_t == (rrow & 15),
                         jnp.broadcast_to(g[s:s + 1, :], (16, L)), 0.0)
        acc816 = acc816 + jax.lax.dot_general(
            oh_hi, m_lo, (((1,), (1,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (16, W), 1)
    sel = ((t_ids & 15) == jax.lax.broadcasted_iota(
        jnp.int32, (16, W), 0)).astype(jnp.float32)
    b = jax.lax.dot_general(acc816, sel, (((1,), (0,)), ((), ())),
                            precision=precision,
                            preferred_element_type=jnp.float32)
    hi_ids = jax.lax.broadcasted_iota(jnp.int32, (8, W), 1) >> 4
    hmask = (hi_ids == jax.lax.broadcasted_iota(
        jnp.int32, (8, W), 0)).astype(jnp.float32)
    return jnp.sum(b * hmask, axis=0, keepdims=True)


def _gather_x(x2, r):
    """Gather g[s,l] = x2[s, r[s,l]] (one ax1 dynamic_gather; the formatter
    binned sublane s to x-bucket s, so the sublane pick is the identity).
    `r` arrives int8 (stream compression); dynamic_gather needs int32."""
    return jnp.take_along_axis(x2, r.astype(jnp.int32), axis=1)


def _reduce_rows_min(g, rows, inv, inf):
    """Min-by-row reduce of a tropical chunk: returns (1, W) window accumulator.

    Lanes are packed row-sorted (formatter), so each row's slots form one
    contiguous lane run per sublane. A 7-step segmented min-scan along lanes
    (roll + same-row compare + min) leaves every run's min at its last lane;
    `inv[s,w]` (the run-end lane of row w, -1 if absent) turns the (1,W)
    rebuild into ONE ax1 dynamic_gather + a sublane min-reduce. Min is
    idempotent, so the circular roll wrap combining equal-row slots is
    harmless. ~40 VPU ops/chunk vs ~1100 for the (W,W) masked-min it replaces
    — the reference PE does min at the same II=1 cost as add
    (graphlily/hw/ufixed_pe_fwd.h:23-65); this is the TPU equivalent.
    """
    for shift in (1, 2, 4, 8, 16, 32, 64):
        g_s = pltpu.roll(g, shift, 1)
        r_s = pltpu.roll(rows, shift, 1)
        g = jnp.where(r_s == rows, jnp.minimum(g, g_s), g)
    h = jnp.take_along_axis(g, jnp.maximum(inv, 0), axis=1)
    h = jnp.where(inv >= 0, h, inf)
    return jnp.min(h, axis=0, keepdims=True)


def _make_kernel(nct: int, op: OpType, precision, zero: float, fuse_dots: bool):
    nct8 = S * nct

    def kernel(code_ref, r_ref, rt_ref, v_ref, *rest):
        if op == OpType.ADDMIN:
            inv_ref, x_ref, o_ref = rest
        else:
            x_ref, o_ref = rest
        i = pl.program_id(0)
        first = jnp.logical_or(
            i == 0, code_ref[jnp.maximum(i - 1, 0)] // nct8 != code_ref[i] // nct8)

        @pl.when(first)
        def _():
            o_ref[...] = jnp.full_like(o_ref, zero)

        x2 = x_ref[0]
        g = _gather_x(x2, r_ref[0])
        vals = v_ref[0]
        rows = rt_ref[0].astype(jnp.int32)   # (8,128) natural
        wsub = (code_ref[i] // nct) % S
        sub_ids = jax.lax.broadcasted_iota(jnp.int32, (S, W), 0)
        # (fuse_dots is a legacy knob; the two-level reduce superseded it)
        if op == OpType.MULADD or op == OpType.ANDOR:
            if op == OpType.MULADD:
                g = g * vals
            else:
                g = jnp.logical_and(vals != 0, g != 0).astype(vals.dtype)
            acc = _reduce_rows_add(g, rows, precision).astype(o_ref.dtype)
            o_ref[0] += jnp.where(sub_ids == wsub,
                                  jnp.broadcast_to(acc, (S, W)), 0.0)
        elif op == OpType.ADDMIN:
            inf = jnp.asarray(zero, vals.dtype)
            g = jnp.minimum(g + vals, inf)   # saturating tropical mul
            acc = _reduce_rows_min(g, rows, inv_ref[0].astype(jnp.int32), inf)
            o_ref[0] = jnp.minimum(
                o_ref[0],
                jnp.where(sub_ids == wsub, jnp.broadcast_to(acc, (S, W)), inf))
        else:
            raise ValueError(op)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("nct", "nwgrp", "nchunk", "op", "mxu_precision",
                     "zero", "interpret", "fuse_dots", "dtype"))
def _spmv_pallas_call(code, r, rows, vals, inv, x2, *, nct, nwgrp, nchunk,
                      op, mxu_precision, zero, interpret, fuse_dots, dtype):
    precision = (jax.lax.Precision.HIGHEST if mxu_precision == "highest"
                 else jax.lax.Precision.DEFAULT)
    kernel = _make_kernel(nct, op, precision, zero, fuse_dots)
    chunk_spec = pl.BlockSpec((1, S, L), lambda i, code: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    in_specs = [chunk_spec, chunk_spec, chunk_spec]
    args = [r, rows, vals]
    if op == OpType.ADDMIN:
        in_specs.append(pl.BlockSpec((1, S, W), lambda i, code: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(inv)
    in_specs.append(pl.BlockSpec((1, S, L), lambda i, code: (code[i] % nct, 0, 0),
                                 memory_space=pltpu.VMEM))
    args.append(x2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunk,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, S, W), lambda i, code: (code[i] // (S * nct), 0, 0),
                               memory_space=pltpu.VMEM),
    )
    f = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nwgrp, S, W), jnp.dtype(dtype)),
        interpret=interpret,
    )
    return f(code, *args)


CB = 32       # chunks per grid step (amortizes grid-step overhead and
              # per-stream DMA latency; the scan-based tropical reduce has
              # only (8,128) intermediates, so all ops share the same batch)


def _make_resident_kernel(nct: int, op: OpType, precision, zero: float,
                          reduce_mode: str, cb: int,
                          predicated: bool = False):
    """Resident variant: the whole x (nct,8,128) and the whole out
    (nwgrp,8,128) live in VMEM; CB chunks per grid step amortize grid/DMA
    overhead; dynamic first-dim indexing replaces prefetch-driven block maps.
    Feasible when (nct + nwgrp) * 4KB fits VMEM (~N <= 700K vertices).

    `predicated` (the work-proportional SpMSpV path, counterpart of the
    reference's active-column traversal, hw/kernel_spmspv_impl.h:55-124):
    two scalar-prefetch arrays remap grid step i to chunk-batch sm[i] and
    give the active-step count na; steps >= na are no-ops whose block maps
    repeat the previous index (no DMA), so cost scales with the number of
    col tiles the frontier actually touches."""

    def kernel(*refs):
        if predicated:
            sm_ref, na_ref, code_ref, r_ref, rt_ref, v_ref, *rest = refs
        else:
            code_ref, r_ref, rt_ref, v_ref, *rest = refs
        if op == OpType.ADDMIN:
            inv_ref, x_ref, o_ref = rest
        else:
            x_ref, o_ref = rest
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            o_ref[...] = jnp.full_like(o_ref, zero)

        if predicated:
            body = _make_body(op, nct, precision, zero, cb,
                              code_ref, r_ref, rt_ref, v_ref, rest)
            pl.when(step < na_ref[0])(body)
            return
        _make_body(op, nct, precision, zero, cb,
                   code_ref, r_ref, rt_ref, v_ref, rest)()

    return kernel


def _make_body(op, nct, precision, zero, cb, code_ref, r_ref, rt_ref, v_ref,
               rest):
    if op == OpType.ADDMIN:
        inv_ref, x_ref, o_ref = rest
    else:
        inv_ref = None
        x_ref, o_ref = rest

    def body():

        sub_ids = jax.lax.broadcasted_iota(jnp.int32, (S, W), 0)
        # unpack the int8 index streams once per step: int8 VMEM tiles are
        # (32,128), so per-chunk (8,128) int8 slices would each pay a relayout
        r_all = r_ref[0].astype(jnp.int32)    # (cb*8, 128)
        rt_all = rt_ref[0].astype(jnp.int32)
        inv_all = (inv_ref[0].astype(jnp.int32) if op == OpType.ADDMIN
                   else None)
        for k in range(cb):
            # per-chunk code comes from a VMEM stream, not scalar prefetch:
            # SMEM caps at 1MB and chunk counts reach millions
            code = code_ref[0, 0, k]
            cid = code % nct
            wgrp = code // (S * nct)
            wsub = (code // nct) % S
            x2 = x_ref[cid]
            r = r_all[k * S:(k + 1) * S, :]
            vals = v_ref[0, k * S:(k + 1) * S, :]
            rows = rt_all[k * S:(k + 1) * S, :]   # (8,128) natural
            g = jnp.take_along_axis(x2, r, axis=1)
            if op == OpType.MULADD or op == OpType.ANDOR:
                if op == OpType.MULADD:
                    g = g * vals
                else:
                    g = jnp.logical_and(vals != 0, g != 0).astype(vals.dtype)
                acc = _reduce_rows_add(g, rows, precision).astype(o_ref.dtype)
                o_ref[wgrp] += jnp.where(
                    sub_ids == wsub, jnp.broadcast_to(acc, (S, W)), 0.0)
            elif op == OpType.ADDMIN:
                inf = jnp.asarray(zero, vals.dtype)
                g = jnp.minimum(g + vals, inf)
                acc = _reduce_rows_min(g, rows,
                                       inv_all[k * S:(k + 1) * S, :], inf)
                o_ref[wgrp] = jnp.minimum(
                    o_ref[wgrp],
                    jnp.where(sub_ids == wsub,
                              jnp.broadcast_to(acc, (S, W)), inf))
            else:
                raise ValueError(op)

    return body


@functools.partial(
    jax.jit,
    static_argnames=("nct", "nwgrp", "nchunk", "op", "mxu_precision",
                     "zero", "interpret", "reduce_mode", "dtype"))
def _spmv_resident_call(code, r, rows, vals, inv, x2, *, nct, nwgrp, nchunk,
                        op, mxu_precision, zero, interpret, reduce_mode,
                        dtype):
    cb = CB
    assert nchunk % cb == 0
    precision = (jax.lax.Precision.HIGHEST if mxu_precision == "highest"
                 else jax.lax.Precision.DEFAULT)
    kernel = _make_resident_kernel(nct, op, precision, zero, reduce_mode, cb)
    nsteps = nchunk // cb
    stream_spec = pl.BlockSpec((1, cb * S, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 1, cb), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),   # per-chunk codes
        stream_spec, stream_spec, stream_spec,
    ]
    args = [code.reshape(nsteps, 1, cb),
            r.reshape(nsteps, cb * S, L),
            rows.reshape(nsteps, cb * S, L),
            vals.reshape(nsteps, cb * S, L)]
    if op == OpType.ADDMIN:
        in_specs.append(pl.BlockSpec((1, cb * S, W), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(inv.reshape(nsteps, cb * S, W))
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # x2 whole
    args.append(x2)
    f = pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),  # out whole
        out_shape=jax.ShapeDtypeStruct((nwgrp, S, W), jnp.dtype(dtype)),
        interpret=interpret,
    )
    return f(*args)


@functools.partial(
    jax.jit,
    static_argnames=("nct", "nwgrp", "nchunk", "op", "mxu_precision",
                     "zero", "interpret", "reduce_mode", "dtype"))
def _spmv_resident_predicated_call(sm, na, code, r, rows, vals, inv, x2, *,
                                   nct, nwgrp, nchunk, op, mxu_precision,
                                   zero, interpret, reduce_mode, dtype):
    """Predicated resident SpMV: grid step i executes chunk-batch sm[i];
    steps >= na repeat the last batch's block index (no DMA) and skip
    compute. `sm`/`na` are computed on device per call from the frontier's
    col-tile activity (see SpMSpVModule.apply_dense) — the TPU counterpart
    of the reference's active-column traversal
    (hw/kernel_spmspv_impl.h:55-124)."""
    cb = CB
    assert nchunk % cb == 0
    precision = (jax.lax.Precision.HIGHEST if mxu_precision == "highest"
                 else jax.lax.Precision.DEFAULT)
    kernel = _make_resident_kernel(nct, op, precision, zero, reduce_mode, cb,
                                   predicated=True)
    nsteps = nchunk // cb
    remap = lambda i, sm, na: (sm[i], 0, 0)
    stream_spec = pl.BlockSpec((1, cb * S, L), remap, memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 1, cb), remap, memory_space=pltpu.VMEM),
        stream_spec, stream_spec, stream_spec,
    ]
    args = [code.reshape(nsteps, 1, cb),
            r.reshape(nsteps, cb * S, L),
            rows.reshape(nsteps, cb * S, L),
            vals.reshape(nsteps, cb * S, L)]
    if op == OpType.ADDMIN:
        in_specs.append(pl.BlockSpec((1, cb * S, W), remap,
                                     memory_space=pltpu.VMEM))
        args.append(inv.reshape(nsteps, cb * S, W))
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # x2 whole
    args.append(x2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),  # out whole
    )
    f = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nwgrp, S, W), jnp.dtype(dtype)),
        interpret=interpret,
    )
    return f(sm, na, *args)


@jax.tree_util.register_pytree_node_class
class ChunkArrays:
    """Device-resident chunk arrays as a pytree (passable through jit as an
    argument — large operands must not be closure constants: the sandbox's
    remote compiler serializes HLO constants and caps payload size)."""

    def __init__(self, code, r, rows, vals, inv=None):
        self.code, self.r, self.rows, self.vals = code, r, rows, vals
        self.inv = inv  # tropical layouts only (run-end lanes)

    def tree_flatten(self):
        return (self.code, self.r, self.rows, self.vals, self.inv), None

    @classmethod
    def tree_unflatten(cls, _aux, children):
        return cls(*children)


class PallasSpMV:
    """Compiled SpMV over a fixed ChunkedSpMVLayout.

    Holds device copies of the layout; `__call__(x, mask)` runs the kernel and
    epilogues. Whole object is jit-cache friendly: geometry is static. For use
    inside an outer jit, pass `arrays=` explicitly (see ChunkArrays).
    """

    def __init__(self, layout: ChunkedSpMVLayout, semiring: Semiring,
                 config: EngineConfig = DEFAULT_CONFIG,
                 mask_type: MaskType = MaskType.NO_MASK):
        self.layout = layout
        self.semiring = semiring
        self.mask_type = mask_type
        self.config = config
        self.num_rows = layout.num_rows
        self.num_cols = layout.num_cols
        if semiring.op == OpType.ADDMIN and layout.inv is None:
            raise ValueError("tropical SpMV needs a layout packed with the "
                             "tropical pad value (pack_csr_chunks pad_val="
                             "semiring.zero builds the inv stream)")
        self.arrays = ChunkArrays(
            jnp.asarray(layout.code), jnp.asarray(layout.r),
            jnp.asarray(layout.rows),
            jnp.asarray(layout.vals, dtype=config.jdtype),
            None if layout.inv is None else jnp.asarray(layout.inv))
        # resident variant: whole x + whole out in VMEM; pick it whenever the
        # footprint fits (chunk stream double-buffering needs the rest)
        vmem_need = (layout.num_col_tiles + layout.num_window_groups) * S * L * 4
        fits_vmem = (vmem_need <= 8 * 1024 * 1024
                     and layout.num_chunks % CB == 0)
        # the streamed kernel's scalar-prefetch code array lives in SMEM
        # (1MB cap) -> it cannot exceed ~200K chunks; the resident kernel
        # streams codes through VMEM and has no such cap
        streamed_feasible = layout.num_chunks <= 200_000
        if layout.step_touch is not None:
            # chunk_order="col" layouts (SpMSpV predicated path) are only
            # valid under the resident kernel: the streamed kernel's
            # out-revisit zeroing needs code-grouped chunk order
            if not fits_vmem:
                raise ValueError("col-ordered layout requires the resident "
                                 "kernel but x+out exceed VMEM")
            self.resident = True
        elif config.resident_kernel is not None:
            self.resident = config.resident_kernel
        elif not streamed_feasible:
            if not fits_vmem:
                raise ValueError(
                    f"matrix too large for both kernel variants: "
                    f"{layout.num_chunks} chunks (streamed SMEM cap 200K) and "
                    f"{vmem_need/1e6:.1f}MB x+out footprint (resident cap 8MB);"
                    f" needs the multi-phase kernel (ARCHITECTURE.md)")
            self.resident = True
        else:
            # interpret mode (CPU tests) defaults to the streamed kernel: the
            # CB-unrolled resident body is ~10x slower in the interpreter
            self.resident = fits_vmem and not config.resolve_interpret()
        self._static = dict(
            nct=layout.num_col_tiles,
            nwgrp=layout.num_window_groups,
            nchunk=layout.num_chunks,
            op=self.semiring.op,
            mxu_precision=config.mxu_precision,
            zero=float(self.semiring.zero),
            interpret=config.resolve_interpret(),
            dtype=config.dtype,
        )
        if self.resident:
            self._static["reduce_mode"] = config.reduce_mode
        else:
            # fuse_dots concatenates the 8 per-sublane dots into one MXU call;
            # Mosaic (2026-08 libtpu) rejects the lane-concat ("offset mismatch
            # on non-concat dimension"), so default to the 8-dot path.
            self._static["fuse_dots"] = False

    def __call__(self, x, mask=None, mask_type: MaskType | None = None,
                 arrays: ChunkArrays | None = None, out_3d: bool = False):
        """y = mask(A (x) x). `x` is a dense (num_cols,) vector or its
        pre-tiled (nct, 8, 128) view; `out_3d=True` returns y as
        (num_rows/1024, 8, 128) — a free view of the window-group blocks —
        so iterating loops skip the ~2.3 GB/s 1D<->tiled relayout."""
        mt = self.mask_type if mask_type is None else mask_type
        a = self.arrays if arrays is None else arrays
        x2 = (x.reshape(self.layout.num_col_tiles, S, L)
              if x.ndim == 1 else x)
        call = _spmv_resident_call if self.resident else _spmv_pallas_call
        out = call(a.code, a.r, a.rows, a.vals, a.inv, x2, **self._static)
        return self._epilogue(out, mask, mt, out_3d)

    def call_predicated(self, x, sm, na, mask=None,
                        mask_type: MaskType | None = None,
                        arrays: ChunkArrays | None = None,
                        out_3d: bool = False):
        """Work-proportional variant: execute only the chunk batches listed
        in `sm[:na]` (computed from the frontier's col-tile activity).
        Requires the resident kernel and a chunk_order="col" layout."""
        assert self.resident, "predicated path needs the resident kernel"
        mt = self.mask_type if mask_type is None else mask_type
        a = self.arrays if arrays is None else arrays
        x2 = (x.reshape(self.layout.num_col_tiles, S, L)
              if x.ndim == 1 else x)
        static = dict(self._static)
        static.setdefault("reduce_mode", self.config.reduce_mode)
        static.pop("fuse_dots", None)
        out = _spmv_resident_predicated_call(
            sm, na, a.code, a.r, a.rows, a.vals, a.inv, x2, **static)
        return self._epilogue(out, mask, mt, out_3d)

    def _epilogue(self, out, mask, mt, out_3d: bool = False):
        y = (out.reshape(-1, S, L)[:self.num_rows // (S * L)] if out_3d
             else out.reshape(self.num_rows))
        if self.semiring.op == OpType.ANDOR:
            y = jnp.where(y != 0, jnp.ones_like(y), jnp.zeros_like(y))
        if mask is not None and mt != MaskType.NO_MASK:
            y = apply_mask(y, mask, mt, self.semiring.zero)
        return y
