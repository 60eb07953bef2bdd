"""Matrix formatting: host-side preprocessing + TPU device layouts.

Counterpart of the reference's data formatter (graphlily/io/data_formatter.h).
The reference builds CPSR — HBM-channel-packed streams of rows with IDX_MARKER
row terminators — for a 16-channel x 8-PE dataflow overlay. The TPU-native
layout here ("chunked dual-gather", `ChunkedSpMVLayout`) instead packs nnz into
(8,128) chunks shaped for the v5e's vector unit:

  * chunks are grouped by (row_window, col_tile): the row window (128 rows) is
    the unit the kernel one-hot-accumulates into (VMEM out tile ~ URAM out
    buffer, SPMV_OUT_BUF_LEN analog), the col tile (1024 x-elements) is the
    slice of the dense vector resident for gathers (VEC_BUF_LEN analog,
    graphlily/hw/kernel_spmv_impl.h:470-472).
  * within a group, nnz are binned by x-bucket (col>>7 within the tile) into
    sublanes (8 buckets per tile), so the gather is a single ax1
    dynamic_gather: g[s,l] = x2[s, r[s,l]] with r = col & 127.
  * per-nnz indices (x-lane, row-local) are int8 streams in natural (8,128)
    orientation — dense VMEM tiles and half the HBM traffic of int32.

Empty-row skipping, row reordering, and dimension rounding mirror the
reference's utilities (data_formatter.h:19-33, 37-51, 330-360) as host-side
functions over CSR.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ..config import EngineConfig, DEFAULT_CONFIG
from .matrix import CSRMatrix, CSCMatrix


# --------------------------------------------------------------------------
# Host-side CSR utilities (parity with reference data_formatter utils)
# --------------------------------------------------------------------------

def util_round_csr_matrix_dim(csr: CSRMatrix, row_divisor: int, col_divisor: int) -> CSRMatrix:
    """Pad rows/cols up to divisors (in place, returns csr).

    Reference: graphlily/io/data_formatter.h:19-33 — padded rows are empty,
    padded cols are just a num_cols bump.
    """
    if csr.num_rows % row_divisor != 0:
        pad = row_divisor - csr.num_rows % row_divisor
        csr.adj_indptr = np.concatenate(
            [csr.adj_indptr,
             np.full(pad, csr.adj_indptr[csr.num_rows], dtype=csr.adj_indptr.dtype)])
        csr.num_rows += pad
    if csr.num_cols % col_divisor != 0:
        csr.num_cols += col_divisor - csr.num_cols % col_divisor
    return csr


def util_normalize_csr_matrix_by_outdegree(csr: CSRMatrix) -> CSRMatrix:
    """Set data[i] = 1 / (#nnz in that column). Reference: data_formatter.h:37-51.

    (For a graph adjacency where A[dst,src]=edge, column count = outdegree.)
    """
    cols = csr.adj_indices[: csr.nnz].astype(np.int64)
    nnz_each_col = np.bincount(cols, minlength=csr.num_cols)
    with np.errstate(divide="ignore"):
        inv = 1.0 / nnz_each_col
    csr.adj_data = inv[cols].astype(csr.adj_data.dtype)
    return csr


def util_reorder_rows_ascending_nnz(csr: CSRMatrix):
    """Sort rows by ascending nnz; returns (reordered_csr, row_perm).

    row_perm[i] = original row id now at position i.
    Reference: graphlily/io/data_formatter.h:330-360 (built + tested there,
    unused by modules; here it is the SELL-sigma-style balance lever).
    """
    counts = np.diff(csr.adj_indptr.astype(np.int64))
    perm = np.argsort(counts, kind="stable")
    return permute_rows(csr, perm), perm


def permute_rows(csr: CSRMatrix, perm: np.ndarray) -> CSRMatrix:
    """Return CSR with rows reordered so new row i = old row perm[i]."""
    counts = np.diff(csr.adj_indptr.astype(np.int64))
    new_counts = counts[perm]
    new_indptr = np.zeros(csr.num_rows + 1, dtype=np.int64)
    np.cumsum(new_counts, out=new_indptr[1:])
    nnz = csr.nnz
    starts = csr.adj_indptr[:-1].astype(np.int64)[perm]
    # gather each row's slice
    idx = np.repeat(starts - new_indptr[:-1], new_counts) + np.arange(nnz)
    return CSRMatrix(csr.num_rows, csr.num_cols,
                     csr.adj_data[idx], csr.adj_indices[idx],
                     new_indptr.astype(np.uint32))


def symmetric_permute(csr: CSRMatrix, perm: np.ndarray) -> CSRMatrix:
    """Relabel vertices: new id i = old id perm[i]; A'[i,j] = A[perm[i],perm[j]].

    Graph algorithms are invariant under vertex relabeling, so apps can run
    entirely in the relabeled space (translate the source going in, un-permute
    the result coming out) — no per-iteration permutation cost."""
    assert csr.num_rows == csr.num_cols
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    nnz = csr.nnz
    rows = inv[csr.row_ids()]
    cols = inv[csr.adj_indices[:nnz].astype(np.int64)]
    if csr.num_cols <= (1 << 32):
        # composite-key argsort is ~3x np.lexsort at 30M+ nnz on this host
        # (21.9 s -> 7.5 s measured) — this sort dominates graph prep time
        order = np.argsort((rows.astype(np.uint64) << 32)
                           | cols.astype(np.uint64), kind="stable")
    else:
        order = np.lexsort((cols, rows))
    indptr = np.zeros(csr.num_rows + 1, np.int64)
    indptr[1:] = np.bincount(rows, minlength=csr.num_rows)
    return CSRMatrix(csr.num_rows, csr.num_cols, csr.adj_data[order],
                     cols[order].astype(np.uint32),
                     np.cumsum(indptr).astype(np.uint32))


def degree_sort_permutation(csr: CSRMatrix) -> np.ndarray:
    """Vertices by descending (in+out) degree. Clusters power-law hubs into
    the same chunk groups, raising slot fill (the TPU analog of the
    reference's load-balance lever, util_reorder_rows_ascending_nnz)."""
    # bincount, NOT np.add.at: this host runs add.at at ~1M op/s, which
    # made degree_sort_permutation alone cost ~150 s on 112M-edge graphs
    deg = (np.bincount(csr.row_ids(), minlength=csr.num_rows)
           + np.bincount(csr.adj_indices[: csr.nnz].astype(np.int64),
                         minlength=csr.num_rows)[:csr.num_rows])
    return np.argsort(-deg, kind="stable")


def add_self_edges_for_sssp(csr: CSRMatrix) -> CSRMatrix:
    """Insert zero-weight self edges (and zero existing diagonals).

    Reference SSSP preprocessing: graphlily/app/sssp.h:16-62. Vectorized:
    zero any existing diagonal entries, then insert missing ones.
    """
    n = min(csr.num_rows, csr.num_cols)
    nnz = csr.nnz
    rows = csr.row_ids()
    cols = csr.adj_indices[:nnz].astype(np.int64)
    data = csr.adj_data[:nnz].astype(np.float32).copy()
    diag = rows == cols
    data[diag] = 0.0
    have_diag = np.zeros(csr.num_rows, dtype=bool)
    have_diag[rows[diag]] = True
    missing = np.nonzero(~have_diag[:n])[0]
    all_rows = np.concatenate([rows, missing])
    all_cols = np.concatenate([cols, missing])
    all_data = np.concatenate([data, np.zeros(len(missing), np.float32)])
    # stable sort by (row, col) to keep deterministic layout
    order = np.lexsort((all_cols, all_rows))
    all_rows, all_cols, all_data = all_rows[order], all_cols[order], all_data[order]
    indptr = np.zeros(csr.num_rows + 1, dtype=np.int64)
    indptr[1:] = np.bincount(all_rows, minlength=csr.num_rows)
    indptr = np.cumsum(indptr)
    return CSRMatrix(csr.num_rows, csr.num_cols, all_data,
                     all_cols.astype(np.uint32), indptr.astype(np.uint32))


# --------------------------------------------------------------------------
# TPU device layout: chunked dual-gather SpMV format
# --------------------------------------------------------------------------

@dataclasses.dataclass
class ChunkedSpMVLayout:
    """Device arrays for the pallas SpMV engine (all numpy until shipped).

    Shapes (NC = number of chunks, S = 8 sublanes, L = 128 lanes):
      r      (NC, S, L) int8  : x-lane (col & 127). The x-bucket q is implied:
                                sublane s holds only bucket-s nnz (the class
                                binning), so the gather is one ax1
                                dynamic_gather g[s,l] = x2[s, r[s,l]].
      rows   (NC, S, L) int8  : row - window_base (int8: both indices < 128;
                                int8 streams halve HBM traffic and keep VMEM
                                tiles dense — a (128,8) i32 layout wastes 16x)
      vals   (NC, S, L)       : nnz values (padding = semiring-safe fill)
      code   (NC,)     int32  : packed (window_group, window_sub, col_tile) id
      inv    (NC, S, W) int8  : tropical layouts only — inv[c,s,w] = last lane
                                of row-local w's run in (chunk c, sublane s),
                                -1 if the row is absent. Lanes are packed in
                                row-sorted order, so a segmented min-scan along
                                lanes leaves each run's min at its last lane
                                and ONE ax1 dynamic_gather by `inv` rebuilds
                                the (1,W) window accumulator (the TPU stand-in
                                for the reference PE's II=1 min ALU,
                                graphlily/hw/ufixed_pe_fwd.h:23-65).
    Plus geometry for the kernel grid.
    """

    r: np.ndarray
    rows: np.ndarray
    vals: np.ndarray
    code: np.ndarray
    num_rows: int          # padded
    num_cols: int          # padded
    nnz: int               # real nnz packed
    num_col_tiles: int
    num_window_groups: int  # out blocks: (num_window_groups, 8, 128)
    row_window: int
    col_tile: int
    fill: float            # nnz / slots
    row_perm: Optional[np.ndarray] = None  # if rows were reordered
    inv: Optional[np.ndarray] = None       # tropical run-end lanes (see above)
    step_touch: Optional[np.ndarray] = None  # (nsteps, nct) incidence when
                                             # packed with chunk_order="col"
    el_slot: Optional[np.ndarray] = None   # (nnz,) original-order nnz -> flat
                                           # vals slot (structure/value split)

    @property
    def num_chunks(self) -> int:
        return self.r.shape[0]


def pack_csr_chunks(csr: CSRMatrix, config: EngineConfig = DEFAULT_CONFIG,
                    pad_val: float = 0.0,
                    chunk_order: str = "row") -> ChunkedSpMVLayout:
    """Pack a CSR matrix into the chunked dual-gather layout.

    `pad_val` must be the semiring's <x> annihilator (semiring.zero): 0 for
    arithmetic/logical, FLOAT_INF for tropical — padding then contributes the
    <+> identity after mul (cf. the reference's semiring-zero column padding,
    graphlily/io/data_formatter.h:675-680).

    `chunk_order`: "row" (default) orders chunks by code = (window, col tile)
    — required by the STREAMED kernel's out-revisit zeroing. "col" orders by
    (col tile, window) and additionally builds `step_touch` — the static
    (grid step x col tile) incidence used by the predicated resident kernel
    to skip steps whose col tiles hold no active frontier entries (the
    work-proportional SpMSpV path; resident kernel only, which zeroes its
    whole output at step 0 and so accepts any chunk order).
    """
    W = config.row_window
    C = config.col_tile
    S = config.chunk_sublanes
    L = config.lanes
    assert W == 128 and S == 8 and L == 128, "kernel geometry is fixed at (128,8,128)"

    work = csr.copy()
    util_round_csr_matrix_dim(work, 8 * W, C)
    nrows, ncols = work.num_rows, work.num_cols
    nnz = work.nnz

    rr = work.row_ids().astype(np.int64)
    cc = work.adj_indices[:nnz].astype(np.int64)
    vv = work.adj_data[:nnz]

    nct = ncols // C

    # chunk assignment: native C++ path (10x faster on 100M-edge graphs),
    # numpy fallback otherwise
    from .. import native as _native
    assigned = _native.pack_assign(rr, cc, nct) if nnz else None
    if assigned is not None:
        chunk_id, sub, lane, nchunk = assigned
        wid = rr // W
        cid = cc // C
    else:
        wid = rr // W
        cid = cc // C
        sub = ((cc % C) >> 7) % S
        # rr before cc: within a (wid,cid,sub) class, lanes are packed in
        # row-sorted order (row runs contiguous — required by the tropical
        # segmented-scan reduce; harmless for the add semirings). The native
        # packer gets this for free: its tiebreaker is the original CSR
        # (row-major) index.
        order = np.lexsort((cc, rr, sub, cid, wid))
        rr, cc, vv, wid, cid, sub = (a[order] for a in (rr, cc, vv, wid, cid, sub))
        gkey = wid * nct + cid
        ckey = gkey * S + sub
        _, cstart, ccount = np.unique(ckey, return_index=True, return_counts=True)
        rank = np.arange(nnz, dtype=np.int64) - np.repeat(cstart, ccount)
        k = rank // L
        lane = rank % L
        guniq = np.unique(gkey)
        class_need = (ccount + L - 1) // L
        gidx_of_class = np.searchsorted(guniq, ckey[cstart] // S)
        gneed = np.zeros(len(guniq), np.int64)
        np.maximum.at(gneed, gidx_of_class, class_need)
        goff = np.concatenate([[0], np.cumsum(gneed)])
        nchunk = max(int(goff[-1]), 1)
        gidx = np.searchsorted(guniq, gkey)
        chunk_id = goff[gidx] + k
    nchunk = max(nchunk, 1)

    r = np.zeros((nchunk, S, L), np.int8)
    rows_arr = np.zeros((nchunk, S, L), np.int8)
    vals = np.full((nchunk, S, L), pad_val, dtype=np.float32)

    r[chunk_id, sub, lane] = (cc & 127).astype(np.int8)
    rows_arr[chunk_id, sub, lane] = (rr % W).astype(np.int8)
    vals[chunk_id, sub, lane] = vv

    # original-order element -> flat vals slot (the native path never
    # reorders elements; the numpy path applied `order`)
    el_slot = np.empty(nnz, np.int64)
    flat_slot = chunk_id * (S * L) + sub * L + lane
    if assigned is not None:
        el_slot[:] = flat_slot
    else:
        el_slot[order] = flat_slot

    # tropical layouts additionally carry `inv`: the last lane of each
    # row-local run per (chunk, sublane); -1 where the row is absent (padding
    # slots never enter inv, so the scan gather reads only real minima)
    with_inv = pad_val != 0.0
    inv = None
    if with_inv:
        inv = np.full((nchunk, S, W), -1, np.int8)
        np.maximum.at(inv, (chunk_id, sub, (rr % W).astype(np.int64)),
                      lane.astype(np.int8))

    # with C=1024, bucket == sublane class exactly, so the kernel's gather
    # table row s is bucket s; col_tile > 1024 would need a page-select stage
    assert C == 1024, "col_tile != 1024 requires page-select kernel support"

    cwid = np.zeros(nchunk, np.int64)
    ccid = np.zeros(nchunk, np.int64)
    cwid[chunk_id] = wid
    ccid[chunk_id] = cid
    code = (cwid * nct + ccid).astype(np.int64)  # = (wgrp*8+wsub)*nct + cid

    # Every 1024-row window group needs >= 1 chunk: the kernel initializes an
    # out block on its first visit, so a group with no chunks would leave
    # uninitialized output. Add all-padding filler chunks for missing groups.
    nwgrp = nrows // (8 * W)
    present = np.zeros(nwgrp, bool)
    present[(code // (S * nct)).astype(np.int64)] = True
    missing = np.nonzero(~present)[0]
    if len(missing):
        nm = len(missing)
        r = np.concatenate([r, np.zeros((nm, S, L), np.int8)])
        rows_arr = np.concatenate([rows_arr, np.zeros((nm, S, L), np.int8)])
        vals = np.concatenate([vals, np.full((nm, S, L), pad_val, np.float32)])
        code = np.concatenate([code, missing * (S * nct)])
        order2 = np.argsort(code, kind="stable")
        r, rows_arr, vals, code = (r[order2], rows_arr[order2], vals[order2],
                                   code[order2])
        if with_inv:
            inv = np.concatenate([inv, np.full((nm, S, W), -1, np.int8)])[order2]
        inv2 = np.empty(len(order2), np.int64)
        inv2[order2] = np.arange(len(order2))
        el_slot = inv2[el_slot // (S * L)] * (S * L) + el_slot % (S * L)
        nchunk += nm

    if chunk_order == "col":
        order3 = np.lexsort((code, code % nct))
        r, rows_arr, vals, code = (r[order3], rows_arr[order3],
                                   vals[order3], code[order3])
        if inv is not None:
            inv = inv[order3]
        inv3 = np.empty(len(order3), np.int64)
        inv3[order3] = np.arange(len(order3))
        el_slot = inv3[el_slot // (S * L)] * (S * L) + el_slot % (S * L)

    # pad chunk count to a multiple of the resident kernel's per-step batch
    # (filler chunks revisit the last code with pad values — harmless)
    pad_mult = 64
    padn = (-nchunk) % pad_mult
    if padn:
        r = np.concatenate([r, np.zeros((padn, S, L), np.int8)])
        rows_arr = np.concatenate([rows_arr, np.zeros((padn, S, L), np.int8)])
        vals = np.concatenate([vals, np.full((padn, S, L), pad_val, np.float32)])
        code = np.concatenate([code, np.full(padn, code[-1], code.dtype)])
        if with_inv:
            inv = np.concatenate([inv, np.full((padn, S, W), -1, np.int8)])
        nchunk += padn

    code = code.astype(np.int32)
    step_touch = None
    if chunk_order == "col":
        # static (grid step x col tile) incidence for the predicated kernel
        from ..ops.spmv_pallas import CB
        nsteps = nchunk // CB
        step_touch = np.zeros((nsteps, nct), np.float32)
        step_touch[np.arange(nchunk) // CB, code % nct] = 1.0
    dtype = np.dtype(config.dtype)
    return ChunkedSpMVLayout(
        r=r, rows=rows_arr, vals=vals.astype(dtype), code=code,
        num_rows=nrows, num_cols=ncols, nnz=nnz,
        num_col_tiles=nct, num_window_groups=nrows // (8 * W),
        row_window=W, col_tile=C,
        fill=nnz / (nchunk * S * L),
        inv=inv,
        step_touch=step_touch,
        el_slot=el_slot,
    )


def estimate_chunk_layout_gb(csr: CSRMatrix) -> float:
    """Cheap (no-pack) estimate of the chunked layout's device memory —
    used by engine auto-selection and benchmarks to decide when the layout's
    (window x tile)-group scaling makes it infeasible."""
    work = csr.copy()
    util_round_csr_matrix_dim(work, 1024, 1024)
    nnz = work.nnz
    rows = work.row_ids()
    cols = work.adj_indices[:nnz].astype(np.int64)
    nct = work.num_cols // 1024
    ckey = ((rows // 128) * nct + cols // 1024) * 8 + ((cols % 1024) >> 7)
    uniq, counts = np.unique(ckey, return_counts=True)
    need = (counts + 127) // 128
    guniq, ginv = np.unique(uniq // 8, return_inverse=True)
    gneed = np.zeros(len(guniq), np.int64)
    np.maximum.at(gneed, ginv, need)
    return float(gneed.sum() * 1024 * 12) / 1e9
