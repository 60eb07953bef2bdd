"""Multi-chip distributed SpMV over a 2D device mesh.

This is a TPU-native *extension*: the reference is strictly single-FPGA
(SURVEY.md section 5.8 — its "fabric" is 16 on-package HBM channels). The
natural scale-out of that design maps the channel axis onto a device mesh:

  mesh = (rows, cols)
  * matrix block-sharded: device (i,j) holds the chunked layout of row-block i
    x col-tile-block j (a 2D SUMMA decomposition);
  * x sharded over 'cols' (each device gathers only from its local x slice —
    the multi-chip analog of the reference's per-channel vector URAM slice);
  * partial y psum'd over 'cols' (ICI all-reduce), y emerges sharded over
    'rows';
  * iterating apps reshard y('rows') -> x('cols') with a sharding constraint,
    letting XLA place the all-to-all on ICI.

Per-shard compute reuses the exact single-chip pallas kernel — channel
parallelism became mesh parallelism without touching the kernel.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import EngineConfig, DEFAULT_CONFIG
from ..semiring import Semiring, MaskType, OpType, apply_mask
from ..io.matrix import CSRMatrix
from ..io.formatter import pack_csr_chunks, util_round_csr_matrix_dim
from ..ops.spmv_pallas import _spmv_pallas_call, S, L, W


@dataclasses.dataclass
class ShardedSpMVLayout:
    """Chunk arrays with leading (rows_shards, col_shards) mesh dims."""

    code: np.ndarray    # (R, C, NC)
    r: np.ndarray       # (R, C, NC, 8, 128)
    rows: np.ndarray    # (R, C, NC, 8, 128) int8
    vals: np.ndarray
    inv: Optional[np.ndarray]  # (R, C, NC, 8, 128) int8, tropical only
    num_rows: int       # global padded
    num_cols: int
    nnz: int
    rows_shards: int
    col_shards: int
    local_rows: int
    local_cols: int
    local_nct: int
    local_nwgrp: int
    # cross-device load balance (the mesh analog of analyze_row_balance):
    # per-shard packed chunk counts BEFORE max-padding. balance = max/avg is
    # the wall-clock stretch the max-pad scheme pays on skewed graphs — the
    # known killer on power-law inputs (SURVEY §7 "load imbalance").
    chunk_counts: Optional[np.ndarray] = None   # (R, C) int64

    @property
    def shard_balance(self) -> float:
        if self.chunk_counts is None or self.chunk_counts.size == 0:
            return 1.0
        avg = float(self.chunk_counts.mean())
        return float(self.chunk_counts.max()) / max(avg, 1e-9)


def pack_sharded(csr: CSRMatrix, rows_shards: int, col_shards: int,
                 config: EngineConfig = DEFAULT_CONFIG,
                 pad_val: float = 0.0) -> ShardedSpMVLayout:
    """Split CSR into (R x C) blocks, pack each with the single-chip packer,
    pad every shard to the same chunk count with filler chunks."""
    work = csr.copy()
    util_round_csr_matrix_dim(work, rows_shards * 1024, col_shards * 1024)
    nrows, ncols = work.num_rows, work.num_cols
    rb, cb = nrows // rows_shards, ncols // col_shards

    nnz = work.nnz
    rows = work.row_ids()
    cols = work.adj_indices[:nnz].astype(np.int64)
    vals = work.adj_data[:nnz]

    layouts = []
    for i in range(rows_shards):
        row_l = []
        sel_i = (rows >= i * rb) & (rows < (i + 1) * rb)
        for j in range(col_shards):
            sel = sel_i & (cols >= j * cb) & (cols < (j + 1) * cb)
            sub_rows = rows[sel] - i * rb
            sub_cols = cols[sel] - j * cb
            sub = _csr_from_sorted_coo(sub_rows, sub_cols, vals[sel], rb, cb)
            row_l.append(pack_csr_chunks(sub, config, pad_val=pad_val))
        layouts.append(row_l)

    max_nc = max(l.num_chunks for rl in layouts for l in rl)
    nct_local = cb // 1024

    def pad_stack(attr, fill):
        out = []
        for rl in layouts:
            row_o = []
            for l in rl:
                a = getattr(l, attr)
                padn = max_nc - a.shape[0]
                if padn:
                    f = np.broadcast_to(fill, (padn,) + a.shape[1:]).astype(a.dtype)
                    a = np.concatenate([a, f])
                row_o.append(a)
            out.append(np.stack(row_o))
        return np.stack(out)

    lay0 = layouts[0][0]
    # filler chunks revisit the LAST window group with pad values (harmless)
    code_fill = np.int32((lay0.num_window_groups - 1) * S * nct_local)
    return ShardedSpMVLayout(
        code=pad_stack("code", code_fill),
        r=pad_stack("r", np.zeros((S, L), np.int8)),
        rows=pad_stack("rows", np.zeros((S, L), np.int8)),
        vals=pad_stack("vals", np.full((S, L), pad_val, np.float32)),
        inv=(pad_stack("inv", np.full((S, W), -1, np.int8))
             if lay0.inv is not None else None),
        num_rows=nrows, num_cols=ncols, nnz=nnz,
        rows_shards=rows_shards, col_shards=col_shards,
        local_rows=rb, local_cols=cb,
        local_nct=nct_local, local_nwgrp=rb // 1024,
        chunk_counts=np.array([[l.num_chunks for l in rl]
                               for rl in layouts], np.int64),
    )


def _csr_from_sorted_coo(rows, cols, vals, nr, nc) -> CSRMatrix:
    order = np.argsort(rows, kind="stable")
    rows, cols, vals = rows[order], cols[order], vals[order]
    indptr = np.zeros(nr + 1, np.int64)
    indptr[1:] = np.bincount(rows, minlength=nr)
    return CSRMatrix(nr, nc, vals, cols.astype(np.uint32),
                     np.cumsum(indptr).astype(np.uint32))


class DistSpMV:
    """y = mask(A (x) x) over a 2D mesh; reusable inside jitted app loops."""

    def __init__(self, layout: ShardedSpMVLayout, semiring: Semiring,
                 mesh: Mesh, config: EngineConfig = DEFAULT_CONFIG,
                 mask_type: MaskType = MaskType.NO_MASK):
        self.layout = layout
        self.semiring = semiring
        self.mesh = mesh
        self.config = config
        self.mask_type = mask_type
        self.num_rows = layout.num_rows
        self.num_cols = layout.num_cols

        spec_chunks = P("rows", "cols")
        put = lambda a: jax.device_put(
            jnp.asarray(a), NamedSharding(mesh, spec_chunks))
        self.code = put(layout.code)
        self.r = put(layout.r)
        self.rows = put(layout.rows)
        self.vals = put(jnp.asarray(layout.vals, dtype=config.jdtype))
        self.inv = put(layout.inv) if layout.inv is not None else None
        if semiring.op == OpType.ADDMIN and self.inv is None:
            raise ValueError("tropical DistSpMV needs pack_sharded(pad_val="
                             "semiring.zero) so the inv stream exists")

        static = dict(
            nct=layout.local_nct, nwgrp=layout.local_nwgrp,
            nchunk=layout.code.shape[2], op=semiring.op,
            mxu_precision=config.mxu_precision,
            zero=float(semiring.zero),
            interpret=config.resolve_interpret(),
            fuse_dots=False, dtype=config.dtype,
        )
        nct_l = layout.local_nct

        op = semiring.op

        def local_fn(code, r, rows, vals, inv, x_local):
            out = _spmv_pallas_call(
                code[0, 0], r[0, 0], rows[0, 0], vals[0, 0],
                None if inv is None else inv[0, 0],
                x_local.reshape(nct_l, S, L), **static)
            y_local = out.reshape(-1)
            # cross-shard <+> combine: sum for arithmetic (and logical, whose
            # or-counts are clamped in the epilogue), min for tropical
            if op == OpType.ADDMIN:
                return jax.lax.pmin(y_local, "cols")
            return jax.lax.psum(y_local, "cols")

        self._sharded_fn = jax.shard_map(
            local_fn, mesh=mesh,
            in_specs=(spec_chunks, spec_chunks, spec_chunks, spec_chunks,
                      spec_chunks if self.inv is not None else P(),
                      P("cols")),
            out_specs=P("rows"),
            check_vma=False,
        )

    def __call__(self, x: jax.Array, mask: jax.Array | None = None) -> jax.Array:
        y = self._sharded_fn(self.code, self.r, self.rows,
                             self.vals, self.inv, x)
        if self.semiring.op == OpType.ANDOR:
            y = jnp.where(y != 0, jnp.ones_like(y), jnp.zeros_like(y))
        if mask is not None and self.mask_type != MaskType.NO_MASK:
            y = apply_mask(y, mask, self.mask_type, self.semiring.zero)
        return y

    def reshard_for_input(self, y: jax.Array) -> jax.Array:
        """Reshard a row-sharded result to the col-sharded input layout
        (XLA inserts the ICI all-to-all)."""
        return jax.lax.with_sharding_constraint(
            y, NamedSharding(self.mesh, P("cols")))
