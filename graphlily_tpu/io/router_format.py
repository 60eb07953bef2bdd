"""Router SpMV formatter: the static-router (gather -> radix-scatter ->
region-reduce) layout and its precomputed runtime schedules.

This is the scalable replacement for the chunked dual-gather layout
(`pack_csr_chunks`), whose memory grows with nonempty (128-row x 1024-col)
groups and whose fill collapses on hypersparse graphs (5-19% on the ICCAD
stand-ins). It is the TPU counterpart of the reference's bounded 2-D
partitioning (graphlily/hw/kernel_spmv_impl.h:470-513: output URAM row
partitions x vector URAM col partitions), re-designed around what the v5e
actually does fast.

Pipeline (two pallas kernels, see ops/router_pallas.py):

  scatter kernel (phases A+B fused), grid over A-chunk batches:
    * A-chunk = (8,128) slots holding up to 1024 nnz of ONE 128-column page,
      packed row-sorted in lanes-major flat order (~99% fill: the only waste
      is each page's final partial chunk). The x page is broadcast-selected
      from the resident x via an ax0 dynamic_gather, so the element gather is
      one ax1 dynamic_gather with NO bucket constraint (unlike the chunked
      layout's sublane binning).
    * g = val (x) x[col] is deposited into per-region accumulators: a
      "region" is a 16384-row slice of the output (the radix digit).
      Elements of one region form contiguous flat runs inside the row-sorted
      chunk, so each deposit is a RANGE move: one dynamic lane roll + two
      sublane rolls + masked merge into the region's (8,128) VMEM accumulator
      at its cursor. Cursors/splits/parities are simulated here at format
      time; the kernel executes a static descriptor stream.
    * F flush slots per step copy full (or draining) accumulators to the
      step's output block — the value stream leaves in FLUSH ORDER, no
      positioning needed: the reduce kernel accumulates region blocks
      resident in VMEM, so any chunk order is fine.

  reduce kernel (phase C), grid over the flush stream:
    * per flushed chunk (one region each, but steps may mix regions): per
      sublane, a (128,L) hi one-hot against the static hi stream and a
      (128,L) lo-masked value matrix contract on the MXU into a (128,128)
      accumulator — which IS the region's output rows arranged as
      [hi, lo] = [(row>>7)&127, row&127] — added into the resident
      (nregions,128,128) output (zeroed at step 0).

Only f32 values move at runtime; every index/descriptor stream is static,
which is what makes the radix scatter affordable.

Supported ops: MULADD and ANDOR (the <+> reduce is an MXU dot). ADDMIN
(tropical) needs row-contiguous runs in phase C, which the scatter does not
preserve across pages — tropical stays on the chunked kernel (SSSP-scale
graphs fit it; see PARITY.md).

Limits: rows <= REGION_ROWS * MAX_REGIONS and the resident output
(num_rows * 4B) must fit VMEM alongside streams — practically ~3.2M rows,
which covers all six ICCAD graphs (orkut = 3.07M). Beyond that: the 2-pass
extension (region-grouped intermediate), not yet needed.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ..config import EngineConfig, DEFAULT_CONFIG
from .matrix import CSRMatrix
from .formatter import util_round_csr_matrix_dim

REGION_ROWS = 16384      # rows per radix class: (128 hi) x (128 lo)
CHUNK = 1024             # elements per (8,128) chunk
MAX_REGIONS = 200        # acc scratch 2*MAX_REGIONS*4KB + resident out cap


@dataclasses.dataclass
class RouterSpMVLayout:
    """Static streams + schedules for the router SpMV (all numpy).

    Shapes: NSTEPS = scatter grid steps, CB = A-chunks per step, RSTEP =
    range-descriptor slots per step, F = flush slots per step. The flush
    stream (reduce kernel input) has NSTEPS*F chunks in flush order.
    """

    # ---- scatter kernel (phases A+B) ----
    a_r: np.ndarray        # (NSTEPS*CB, 8, 128) int8 : col & 127 in the page
    a_vals: np.ndarray     # (NSTEPS*CB, 8, 128) f32  : nnz values (pad 0)
    a_page: np.ndarray     # (NSTEPS*CB,) int32       : 128-col page id
    rg: np.ndarray         # (NSTEPS, RSTEP, 2) int32 : unified descriptors
                           #   deposit: w1 = src13 | dst10<<13
                           #            w2 = region8 | len11<<16   (len > 0)
                           #   flush:   w1 = valid cursor (1..1024)
                           #            w2 = region8 | q7<<8 | 1<<15
                           #   w2 == 0 -> inactive slot
    # ---- reduce kernel (phase C) ----
    c_code: np.ndarray     # (NSTEPS*F,) int32 : region per flushed chunk,
                           #   -1 for garbage chunks (skipped)
    c_hi: np.ndarray       # (NSTEPS*F, 8, 128) int8 : (row >> 7) & 127
    c_lo: np.ndarray       # (NSTEPS*F, 8, 128) int8 : row & 127
    # ---- geometry ----
    num_rows: int
    num_cols: int
    nnz: int
    num_col_tiles: int     # padded_cols / 1024 (x resident shape)
    num_regions: int
    cb: int
    rstep: int
    f: int
    nsteps: int
    fill_a: float          # nnz / A-chunk slots
    fill_stream: float     # nnz / flush-stream slots

    @property
    def mem_bytes(self) -> int:
        return (self.a_r.nbytes + self.a_vals.nbytes + self.a_page.nbytes
                + self.rg.nbytes + self.c_code.nbytes
                + self.c_hi.nbytes + self.c_lo.nbytes
                + self.nsteps * self.f * CHUNK * 4)   # + runtime g stream


def pack_router(csr: CSRMatrix, config: EngineConfig = DEFAULT_CONFIG,
                pad_val: float = 0.0, cb: int = 8) -> RouterSpMVLayout:
    """Build the router layout + schedules. `pad_val` must be the semiring
    <x> annihilator (0 for arithmetic/logical — the only router semirings)."""
    assert pad_val == 0.0, "router supports MULADD/ANDOR (pad 0) only"
    work = csr.copy()
    util_round_csr_matrix_dim(work, 1024, 1024)
    nrows, ncols = work.num_rows, work.num_cols
    nregions = (nrows + REGION_ROWS - 1) // REGION_ROWS
    if nregions > MAX_REGIONS:
        raise ValueError(
            f"{nrows} rows -> {nregions} regions exceeds the single-pass "
            f"router limit {MAX_REGIONS} (needs the 2-pass extension)")
    nnz = work.nnz
    rr = work.row_ids().astype(np.int64)
    cc = work.adj_indices[:nnz].astype(np.int64)
    vv = work.adj_data[:nnz].astype(np.float32)

    # ---- A-order: sort by (page, row, col); pack per page ----------------
    page = cc >> 7
    order = np.lexsort((cc, rr, page))
    rr, cc, vv, page = rr[order], cc[order], vv[order], page[order]

    page_ids, pstart, pcount = np.unique(page, return_index=True,
                                         return_counts=True)
    chunks_per_page = (pcount + CHUNK - 1) // CHUNK
    page_chunk_base = np.concatenate([[0], np.cumsum(chunks_per_page)])
    nca = max(int(page_chunk_base[-1]), 1)
    rank = np.arange(nnz, dtype=np.int64) - np.repeat(pstart, pcount)
    pidx = np.searchsorted(page_ids, page)
    a_chunk = page_chunk_base[pidx] + rank // CHUNK
    a_flat = rank % CHUNK                      # lanes-major: (f//128, f%128)

    # ---- ranges: runs of equal region within each A-chunk ----------------
    region = (rr >> 14).astype(np.int64)
    if nnz:
        newrun = np.ones(nnz, bool)
        newrun[1:] = (a_chunk[1:] != a_chunk[:-1]) | (region[1:] != region[:-1])
        run_start = np.nonzero(newrun)[0]
        run_len = np.diff(np.concatenate([run_start, [nnz]]))
        run_chunk = a_chunk[run_start]
        run_src = a_flat[run_start]
        run_region = region[run_start]
    else:
        run_start = run_len = run_chunk = run_src = run_region = \
            np.zeros(0, np.int64)
    nrun = len(run_start)

    # ---- per-region cursor simulation (vectorized) -----------------------
    # ranges execute in chunk order; per region, the exclusive prefix of
    # lengths gives each range's cursor/parity and its 1024-boundary splits.
    r_sorted = np.lexsort((np.arange(nrun), run_region))   # stable by region
    reg_s = run_region[r_sorted]
    len_s = run_len[r_sorted]
    if nrun:
        cum = np.cumsum(len_s)
        cum_excl = cum - len_s
        seg_start = np.searchsorted(reg_s, np.unique(reg_s))
        seg_sizes = np.diff(np.concatenate([seg_start, [nrun]]))
        start_pos = cum_excl - np.repeat(cum_excl[seg_start], seg_sizes)
    else:
        start_pos = np.zeros(0, np.int64)

    first_fill = np.minimum(len_s, CHUNK - (start_pos % CHUNK))
    needs_split = first_fill < len_s
    d_count = 1 + needs_split.astype(np.int64)
    nd_total = int(d_count.sum())
    d_of = np.repeat(np.arange(nrun), d_count)
    piece = np.zeros(nd_total, np.int64)   # 0 = first piece, 1 = split tail
    if nrun:
        firsts = np.concatenate([[0], np.cumsum(d_count)[:-1]])
        piece[firsts[needs_split] + 1] = 1
    d_len = np.where(piece == 0, first_fill[d_of],
                     len_s[d_of] - first_fill[d_of])
    d_src = run_src[r_sorted][d_of] + np.where(piece == 1, first_fill[d_of], 0)
    d_elem = start_pos[d_of] + np.where(piece == 1, first_fill[d_of], 0)
    d_dst = d_elem % CHUNK
    d_cir = d_elem // CHUNK                 # chunk-in-region
    d_region = reg_s[d_of]
    d_chunk = run_chunk[r_sorted][d_of]
    d_step = d_chunk // cb
    d_src13 = (d_chunk % cb) * CHUNK + d_src

    # region-chunk global ids (unpadded) and per-chunk facts
    reg_elems = np.zeros(nregions, np.int64)
    if nrun:
        np.add.at(reg_elems, reg_s, len_s)
    reg_chunks = (reg_elems + CHUNK - 1) // CHUNK
    reg_base = np.concatenate([[0], np.cumsum(reg_chunks)])
    nrc = int(reg_base[-1])                 # real region-chunks
    d_rc = reg_base[d_region] + d_cir

    # ---- unified descriptor stream (deposits + inline flushes) ------------
    # Elements arrive in strict region order, so a region-chunk fills
    # completely before the next one of the same region starts: a FLUSH
    # descriptor placed immediately after the topping deposit is always
    # safe, and each region needs exactly ONE accumulator (no parity).
    # Partial last chunks drain through trailing flush descriptors.
    nsteps_deposit = (nca + cb - 1) // cb
    if nd_total:
        exec_order = np.lexsort((d_src13, d_step))
        e_step = d_step[exec_order]
        e_w1 = (d_src13[exec_order] | (d_dst[exec_order] << 13)).astype(np.int64)
        e_w2 = (d_region[exec_order] | (d_len[exec_order] << 16)).astype(np.int64)
        e_topping = (d_dst[exec_order] + d_len[exec_order]) == CHUNK
        e_rc = d_rc[exec_order]
        rc_cursor = np.zeros(nrc + 1, np.int64)
        np.maximum.at(rc_cursor, d_rc, d_dst + d_len)
    else:
        e_step = e_w1 = e_w2 = e_rc = np.zeros(0, np.int64)
        e_topping = np.zeros(0, bool)
        rc_cursor = np.zeros(nrc + 1, np.int64)

    # drains: region-chunks whose final cursor < 1024 (each region's last)
    drain_rc = np.nonzero(rc_cursor[:nrc] < CHUNK)[0] if nrc else \
        np.zeros(0, np.int64)
    n_drain = len(drain_rc)
    drain_per_step = cb + 2
    n_drain_steps = (n_drain + drain_per_step - 1) // drain_per_step
    nsteps = nsteps_deposit + n_drain_steps

    # interleave: deposits keep order; a flush follows each topping deposit
    nd = len(e_step)
    n_items = nd + int(e_topping.sum()) + n_drain
    it_step = np.zeros(n_items, np.int64)
    it_w1 = np.zeros(n_items, np.int64)
    it_w2 = np.zeros(n_items, np.int64)
    it_is_flush = np.zeros(n_items, bool)
    it_rc = np.full(n_items, -1, np.int64)
    if nd:
        dep_pos = np.arange(nd) + np.concatenate(
            [[0], np.cumsum(e_topping)[:-1]])
        it_step[dep_pos] = e_step
        it_w1[dep_pos] = e_w1
        it_w2[dep_pos] = e_w2
        fl_pos_arr = dep_pos[e_topping] + 1
        it_step[fl_pos_arr] = e_step[e_topping]
        it_w1[fl_pos_arr] = CHUNK                      # cursor = full
        it_w2[fl_pos_arr] = d_region[exec_order][e_topping]  # slot; q later
        it_is_flush[fl_pos_arr] = True
        it_rc[fl_pos_arr] = e_rc[e_topping]
    if n_drain:
        dr_pos = nd + int(e_topping.sum()) + np.arange(n_drain)
        dr_region = np.searchsorted(reg_base, drain_rc, side="right") - 1
        it_step[dr_pos] = nsteps_deposit + np.arange(n_drain) // drain_per_step
        it_w1[dr_pos] = rc_cursor[drain_rc]
        it_w2[dr_pos] = dr_region
        it_is_flush[dr_pos] = True
        it_rc[dr_pos] = drain_rc

    # per-step slot layout + flush ordinal q
    per_step = np.zeros(nsteps, np.int64)
    np.add.at(per_step, it_step, 1)
    rstep = max(int(per_step.max()) if n_items else 1, 1)
    step_first = np.concatenate([[0], np.cumsum(per_step)[:-1]])
    slot_in_step = np.arange(n_items) - step_first[it_step]
    # q = number of flushes before this item within its step
    fcum = np.cumsum(it_is_flush)
    q_of = np.where(it_is_flush,
                    fcum - 1 - np.concatenate(
                        [[0], fcum])[step_first[it_step]],
                    0)
    f_max = max(int((q_of[it_is_flush].max() + 1)) if it_is_flush.any()
                else 1, 1)
    assert f_max <= 128, f"flush ordinal overflow ({f_max} > 7 bits)"

    rg = np.zeros((nsteps, rstep, 2), np.int32)
    w2_final = np.where(it_is_flush,
                        it_w2 | (q_of << 8) | (1 << 15),
                        it_w2)
    rg[it_step, slot_in_step, 0] = it_w1.astype(np.int32)
    rg[it_step, slot_in_step, 1] = w2_final.astype(np.int32)

    # pad the step count so the flush stream (nsteps * f chunks) is a
    # multiple of the reduce batch — the reduce then consumes the scatter
    # output with a free reshape (a runtime concatenate would relayout the
    # whole stream: measured ~3.8 ms on the googleplus stand-in)
    f = f_max
    for k in range(cb + 1):
        if ((nsteps + k) * f) % cb == 0:
            nsteps += k
            break
    else:
        raise AssertionError("no step padding aligns the flush stream")
    if rg.shape[0] < nsteps:
        rg = np.concatenate(
            [rg, np.zeros((nsteps - rg.shape[0], rstep, 2), np.int32)])

    # region-chunk -> flush stream position
    c_code = np.full(nsteps * f, -1, np.int32)
    rc_linear = np.zeros(nrc + 1, np.int64)
    fmask = it_is_flush
    rc_linear[it_rc[fmask]] = it_step[fmask] * f + q_of[fmask]
    c_code[rc_linear[it_rc[fmask]]] = (
        np.searchsorted(reg_base, it_rc[fmask], side="right") - 1)

    # ---- A streams (padded to the full grid) ------------------------------
    ncap = nsteps * cb
    a_r = np.zeros((ncap, 8, 128), np.int8)
    a_vals = np.zeros((ncap, 8, 128), np.float32)
    a_page_arr = np.zeros(ncap, np.int32)
    a_r[a_chunk, a_flat // 128, a_flat % 128] = (cc & 127).astype(np.int8)
    a_vals[a_chunk, a_flat // 128, a_flat % 128] = vv
    if len(page_ids):
        a_page_arr[:nca] = np.repeat(page_ids,
                                     chunks_per_page).astype(np.int32)

    # ---- phase C static streams --------------------------------------------
    # element stream position: its region-chunk's linear slot + its offset.
    c_hi = np.zeros((nsteps * f, 8, 128), np.int8)
    c_lo = np.zeros((nsteps * f, 8, 128), np.int8)
    if nnz:
        # per-element region position (expand range prefix back to elements)
        r_first = np.concatenate([[0], np.cumsum(run_len)[:-1]])
        within = np.arange(nnz, dtype=np.int64) - np.repeat(r_first, run_len)
        inv_rs = np.empty(nrun, np.int64)
        inv_rs[r_sorted] = np.arange(nrun)
        elem_rpos = start_pos[inv_rs].repeat(run_len) + within
        elem_rc = reg_base[region] + elem_rpos // CHUNK
        elem_pos = rc_linear[elem_rc] * CHUNK + elem_rpos % CHUNK
        oc, of = elem_pos // CHUNK, elem_pos % CHUNK
        row_in_reg = rr & (REGION_ROWS - 1)
        c_hi[oc, of // 128, of % 128] = (row_in_reg >> 7).astype(np.int8)
        c_lo[oc, of // 128, of % 128] = (row_in_reg & 127).astype(np.int8)

    return RouterSpMVLayout(
        a_r=a_r, a_vals=a_vals, a_page=a_page_arr,
        rg=rg, c_code=c_code, c_hi=c_hi, c_lo=c_lo,
        num_rows=nrows, num_cols=ncols, nnz=nnz,
        num_col_tiles=ncols // 1024, num_regions=nregions,
        cb=cb, rstep=rstep, f=f, nsteps=nsteps,
        fill_a=nnz / max(nca * CHUNK, 1),
        fill_stream=nnz / max(nsteps * f * CHUNK, 1),
    )
