"""Full-scale tropical (min-plus) SpMV: the split-pass schedule builder.

Why: the router/planar phase-C reduce is a one-hot MXU dot — min has no MXU
form, so tropical (SSSP) was capped at the chunked layout's feasible scale
(PARITY.md gap #1). The reference's PE does min at the same II=1 cost as add
(graphlily/hw/ufixed_pe_fwd.h:23-65); this module gives the TPU a scalable
tropical path built on three observations:

  1. BIAS TRICK: store A-values as val' = FLOAT_INF - val. The phase-A
     product becomes g' = max(val' - x, 0) = FLOAT_INF - min(val + x, INF),
     so the semiring reduce turns into a MAX whose identity is 0 — exactly
     the planar scatter's padding/flush value. The ENTIRE planar phase-A/B
     machinery (io/planar_format.py, pad_val=0) is reused unchanged, and
     empty A-slots (val'=0) are inert for any x >= 0 (distances are
     non-negative, matching the reference's unsigned ufixed datatype,
     graphlily/global.h:63).
  2. SPLIT PASS: the planar flush stream groups values by `region_rows`-row
     region. One more static plane-scatter pass (schedule built here, same
     descriptor format as the planar kernel) splits each region's stream
     into 128-row WINDOW-pure chunks — a pack-time radix step whose digit is
     c_hi (the row's window within its region). Input is consumed
     region-major, so only region_rows/128 digit accumulators are live.
  3. WINDOW REDUCE: per window-pure chunk, ONE per-sublane sort gather (a
     static (8,128) permutation plane — within-sublane sorts need no
     cross-sublane routing) makes every (sublane, row) a single contiguous
     lane run; a 7-step segmented max-scan leaves each run's max at its last
     lane; an inv plane (run-end lane per window row, sign bit = valid)
     rebuilds (8,128); max over sublanes gives the (1,128) window vector,
     max-accumulated into the resident (nwin, 1, 128) output. The epilogue
     restores y = FLOAT_INF - out. Biased padding is the max-identity 0, so
     padding needs no masks anywhere.

Counterpart of the reference's MIN_ADD SpMV at full scale
(graphlily/hw/kernel_spmv_impl.h bounded 2-D partitions + min PEs).
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..config import EngineConfig, DEFAULT_CONFIG
from .matrix import CSRMatrix
from .planar_format import (PlanarSpMVLayout, pack_planar, simulate_cursors,
                            choose_planar_region_rows)
from .router_format import CHUNK, MAX_REGIONS

S = 8
L = 128
W = 128   # window rows (the scan granularity, = vreg lanes)


@dataclasses.dataclass
class TropicalSpMVLayout:
    """Planar pass-1 layout + split/reduce pass schedules (all numpy)."""

    planar: PlanarSpMVLayout
    # ---- split pass (region stream -> window-pure stream) ----
    in_order: np.ndarray    # (nsteps2*kb,) int32: pass-1 stream chunk ids in
                            #   region-major consumption order (pad: repeat
                            #   of a garbage chunk, descriptors never touch)
    rg2: np.ndarray         # (nsteps2, rstep2, 2) int32, planar descriptor
                            #   format: deposit w1 = k | p<<8, w2 = d | 1<<15
                            #   flush w1 = 0, w2 = d | q<<16 | 1<<31
    planes2: np.ndarray     # (nsteps2, dmax2, 8, 128) int8 deposit planes
    # ---- window reduce pass ----
    c_win: np.ndarray       # (nsteps2*f2,) int32 global window id (-1 skip)
    sort2: np.ndarray       # (nsteps2*f2, 8, 128) int8 per-sublane sort
                            #   permutation (source lane per sorted slot)
    rowids: np.ndarray      # (nsteps2*f2, 8, 128) int8 POST-SORT row-in-
                            #   window per slot (padding rides as 127)
    inv2: np.ndarray        # (nsteps2*f2, 8, 128) int8 run-end lane per
                            #   (sublane, window row); v<0 valid (v&127)
    num_rows: int
    num_cols: int
    nnz: int
    num_windows: int        # padded_rows / 128
    region_digits: int      # region_rows / 128
    kb: int                 # split-pass input chunks per grid step
    rstep2: int
    f2: int
    dmax2: int
    nsteps2: int
    fill2: float            # nnz / window-stream slots

    @property
    def mem_bytes(self) -> int:
        return (self.planar.mem_bytes + self.in_order.nbytes
                + self.rg2.nbytes + self.planes2.nbytes + self.c_win.nbytes
                + self.sort2.nbytes + self.rowids.nbytes + self.inv2.nbytes)

    @property
    def num_col_tiles(self) -> int:
        return self.planar.num_col_tiles


def choose_tropical_region_rows(nrows: int) -> int:
    """Pass-1 regions must fit MAX_REGIONS; bigger regions cut pass-1
    deposit counts but raise the split pass's digits-per-chunk (plane
    bandwidth). The 2048 floor keeps pass-1 deposit counts near the ADD
    path's on small graphs."""
    need = -(-nrows // MAX_REGIONS)
    return max(2048, -(-need // 128) * 128)


def build_split_schedule(lay: PlanarSpMVLayout, kb: int = 16,
                         native: bool = True):
    """Split + reduce schedules from a planar layout packed with hi_pad=-1.
    Consumes only structure (c_code / c_hi / c_lo); returns the layout
    fields (everything except the planar layout itself).

    `native=True` routes through the C++ builder
    (native/tropical_split.cpp — the Python path walks every deposit in a
    Python loop, minutes-slow at full scale on this 1-vCPU host); outputs
    are bit-identical (tests/test_native_pack.py)."""
    R = lay.region_rows // W
    if native:
        from ..native import tropical_split_native
        parts = tropical_split_native(lay.c_code, lay.c_hi, lay.c_lo, R, kb)
        if parts is not None:
            nwin = lay.num_rows // W
            n_out = parts["nsteps2"] * parts["f2"]
            parts["num_windows"] = max(nwin, 1)
            parts["region_digits"] = R
            parts["fill2"] = lay.nnz / max(n_out * CHUNK, 1)
            return parts
    assert R <= 512, "digit accumulators exceed the scratch budget"
    nwin = lay.num_rows // W
    c_code = np.asarray(lay.c_code)
    valid = np.nonzero(c_code >= 0)[0]
    # region-major, cycle creation order preserved inside a region
    in_order = valid[np.argsort(c_code[valid], kind="stable")]
    n_in = len(in_order)
    nsteps2 = max(-(-n_in // kb), 1)
    regions = c_code[in_order].astype(np.int64)

    hi = np.asarray(lay.c_hi)[in_order].astype(np.int64)   # (n_in, 8, 128)
    lo = np.asarray(lay.c_lo)[in_order].astype(np.int64)

    # ---- elements, sorted (chunk, digit, sublane, row, lane) --------------
    ci, si, li = np.nonzero(hi >= 0)
    dg = hi[ci, si, li]
    rw = lo[ci, si, li]
    order = np.lexsort((li, rw, si, dg, ci))
    ci, si, li, dg, rw = (a[order] for a in (ci, si, li, dg, rw))
    nel = len(ci)
    assert nel, "empty layout"

    # ---- deposits: (chunk, digit) groups, per-sublane lens ----------------
    nd_mask = np.ones(nel, bool)
    nd_mask[1:] = (ci[1:] != ci[:-1]) | (dg[1:] != dg[:-1])
    dep_first = np.nonzero(nd_mask)[0]
    dep_count = np.diff(np.concatenate([dep_first, [nel]]))
    nd = len(dep_first)
    dep_chunk = ci[dep_first]
    dep_digit = dg[dep_first]
    dep_of_el = np.repeat(np.arange(nd), dep_count)
    d_lens = np.zeros((nd, S), np.int64)
    # (deposit, sublane) counts: elements sorted by sublane within deposit
    ds_key = dep_of_el * S + si
    ds_ids, ds_cnt = np.unique(ds_key, return_counts=True)
    d_lens[ds_ids // S, ds_ids % S] = ds_cnt

    # cursor keys: (region, digit) — regions are consumed major, so each key
    # is live only within its region's span; acc SLOT in the kernel is the
    # digit alone (drains at region boundaries zero it before reuse)
    dep_key = regions[dep_chunk] * R + dep_digit
    # keys span ALL digits of every touched region: the drain loop visits
    # digits with zero deposits too
    nkeys = (int(regions.max()) + 1) * R
    sim = simulate_cursors(dep_chunk, dep_key, d_lens, nkeys)
    # sim sorts by (chunk, key); within a chunk our digit order matches
    inv_ed = np.empty(nd, np.int64)
    inv_ed[sim.ed] = np.arange(nd)
    has_resid = sim.C.any(axis=1)
    ncyc = sim.cycle + has_resid
    rc_base = np.concatenate([[0], np.cumsum(ncyc)])
    nrc = int(rc_base[-1])

    # ---- descriptor stream ------------------------------------------------
    # walk deposits in exec order; emit [piece1, flush?, piece2] per
    # deposit; when the region changes between chunks, emit the finished
    # region's drains first (in the step of ITS last chunk — descriptors in
    # a step execute in slot order, so boundary mid-step stays correct)
    step_of_chunk = np.arange(n_in) // kb
    last_chunk_of_region = {}
    for i in range(n_in):
        last_chunk_of_region[int(regions[i])] = i
    # exec-order deposit fields
    e_chunk = sim.dc
    e_key = sim.dr
    e_digit = e_key % R
    e_step = step_of_chunk[e_chunk]
    slot_cnt = np.zeros(nsteps2, np.int64)
    q_cnt = np.zeros(nsteps2, np.int64)
    p_cnt = np.zeros(nsteps2, np.int64)
    it_pos, it_w1, it_w2 = [], [], []
    fl_rc, fl_pos_meta = [], []     # rc -> (step, q) resolved after f known
    piece_sp = np.full((2 * nd, 2), -1, np.int64)   # (step, plane ordinal)

    def emit_flush(key, cyc, step):
        d = int(key % R)
        q = int(q_cnt[step])
        q_cnt[step] += 1
        it_pos.append((step, int(slot_cnt[step])))
        slot_cnt[step] += 1
        it_w1.append(0)
        it_w2.append(np.int32(d | (q << 16) | -(1 << 31)))
        fl_rc.append(int(rc_base[key] + cyc))
        fl_pos_meta.append((step, q))

    def emit_dep(k_exec, piece, step, chunk):
        p = int(p_cnt[step])
        p_cnt[step] += 1
        piece_sp[2 * k_exec + piece] = (step, p)
        it_pos.append((step, int(slot_cnt[step])))
        slot_cnt[step] += 1
        it_w1.append(np.int32((chunk - step * kb) | (p << 8)))
        it_w2.append(np.int32(int(e_digit[k_exec]) | (1 << 15)))

    prev_region = -1
    for k in range(nd):
        ch = int(e_chunk[k])
        reg = int(regions[ch])
        if reg != prev_region:
            if prev_region >= 0:
                dr_step = int(step_of_chunk[last_chunk_of_region[prev_region]])
                base = prev_region * R
                for d in range(R):
                    if has_resid[base + d]:
                        emit_flush(base + d, int(sim.cycle[base + d]), dr_step)
            prev_region = reg
        step = int(e_step[k])
        emit_dep(k, 0, step, ch)
        if sim.split[k]:
            emit_flush(int(e_key[k]), int(sim.cyc1[k]), step)
            emit_dep(k, 1, step, ch)
    if prev_region >= 0:
        dr_step = int(step_of_chunk[last_chunk_of_region[prev_region]])
        base = prev_region * R
        for d in range(R):
            if has_resid[base + d]:
                emit_flush(base + d, int(sim.cycle[base + d]), dr_step)

    rstep2 = max(int(slot_cnt.max()), 1)
    f2 = max(int(q_cnt.max()), 1)
    dmax2 = max(int(p_cnt.max()), 1)
    assert f2 <= 256, f"flush ordinal overflow ({f2})"

    rg2 = np.zeros((nsteps2, rstep2, 2), np.int32)
    pos_arr = np.asarray(it_pos, np.int64)
    rg2[pos_arr[:, 0], pos_arr[:, 1], 0] = np.asarray(it_w1, np.int64) \
        .astype(np.int32)
    rg2[pos_arr[:, 0], pos_arr[:, 1], 1] = np.asarray(it_w2, np.int64) \
        .astype(np.int32)

    # rc -> out stream position
    rc_linear = np.zeros(nrc + 1, np.int64)
    fl_rc_a = np.asarray(fl_rc, np.int64)
    fl_meta = np.asarray(fl_pos_meta, np.int64)
    out_pos = fl_meta[:, 0] * f2 + fl_meta[:, 1]
    rc_linear[fl_rc_a] = out_pos
    c_win = np.full(nsteps2 * f2, -1, np.int32)
    # rc -> global window: key = region*R + digit, window = same value
    rc_key = np.searchsorted(rc_base, fl_rc_a, side="right") - 1
    c_win[out_pos] = rc_key.astype(np.int32)

    # ---- deposit planes + per-element out positions -----------------------
    # elements of deposit k (exec pos): piece split at part1 per sublane
    el_dep = inv_ed[dep_of_el]                 # exec position per element
    # rank within (deposit, sublane)
    ds_first = np.concatenate([[0], np.cumsum(ds_cnt)[:-1]])
    el_rank = np.arange(nel) - np.repeat(ds_first, ds_cnt)
    p1 = sim.part1[el_dep, si]
    in_piece1 = el_rank < p1
    el_dst = np.where(in_piece1, sim.dest1[el_dep, si] + el_rank,
                      el_rank - p1)
    el_cyc = np.where(in_piece1, sim.cyc1[el_dep], sim.cyc2[el_dep])
    el_key = e_key[el_dep]
    el_rc = rc_base[el_key] + el_cyc
    el_out = rc_linear[el_rc]                  # out chunk position
    piece_idx = 2 * el_dep + (~in_piece1).astype(np.int64)
    pst = piece_sp[piece_idx, 0]
    psl = piece_sp[piece_idx, 1]
    planes2 = np.zeros((nsteps2, dmax2, S, L), np.int8)
    planes2[pst, psl, si, el_dst] = (li - 128).astype(np.int8)

    # ---- reduce streams: per-sublane sort, post-sort rowids, inv ----------
    n_out = nsteps2 * f2
    sk = (el_out * S + si)                     # (out chunk, sublane) group
    sorder = np.lexsort((el_dst, rw, sk))
    sk_s = sk[sorder]
    uniq, first = np.unique(sk_s, return_index=True)
    counts = np.diff(np.concatenate([first, [nel]]))
    spos = np.arange(nel) - np.repeat(first, counts)
    sort2 = np.tile(
        np.arange(L, dtype=np.int8), (n_out, S, 1))   # identity tail: the
    # unoccupied lanes hold the max-identity 0 and row 127 padding
    sort2[sk_s // S, sk_s % S, spos] = el_dst[sorder].astype(np.int8)
    rowids = np.full((n_out, S, L), 127, np.int8)
    rowids[sk_s // S, sk_s % S, spos] = rw[sorder].astype(np.int8)
    # runs: post-sort equal-row groups per (out chunk, sublane)
    newrun = np.ones(nel, bool)
    newrun[1:] = (sk_s[1:] != sk_s[:-1]) | (rw[sorder][1:] != rw[sorder][:-1])
    run_first = np.nonzero(newrun)[0]
    run_len = np.diff(np.concatenate([run_first, [nel]]))
    run_end_pos = spos[run_first + run_len - 1]
    inv2 = np.zeros((n_out, S, L), np.int8)
    rsk = sk_s[run_first]
    inv2[rsk // S, rsk % S, rw[sorder][run_first]] = \
        (run_end_pos - 128).astype(np.int8)

    # sort plane tail correctness: identity-tail lanes may collide with
    # occupied source lanes; point every tail slot at an UNOCCUPIED source
    # lane (value 0). Unoccupied lanes are exactly those never used as dst.
    occ = np.zeros((n_out, S, L), bool)
    occ[el_out, si, el_dst] = True
    cnt_os = occ.sum(axis=2)                   # occupied per (chunk, sub)
    # for each (chunk, sublane): tail slots [cnt..L) must read lanes where
    # occ is False; the unoccupied lanes listed in order:
    oc_i, os_i, ol_i = np.nonzero(~occ)
    tk = oc_i * S + os_i
    torder = np.argsort(tk, kind="stable")
    tk_s = tk[torder]
    tfirst = np.unique(tk_s, return_index=True)[1]
    tcnt = np.diff(np.concatenate([tfirst, [len(tk_s)]]))
    tpos = np.arange(len(tk_s)) - np.repeat(tfirst, tcnt)
    # tail slot index = cnt + tpos (tail length == #unoccupied lanes)
    sort2[tk_s // S, tk_s % S,
          cnt_os[tk_s // S, tk_s % S] + tpos] = ol_i[torder].astype(np.int8)

    in_pad = np.zeros(nsteps2 * kb, np.int32)
    in_pad[:n_in] = in_order.astype(np.int32)

    fill2 = lay.nnz / max(n_out * CHUNK, 1)
    return dict(in_order=in_pad, rg2=rg2, planes2=planes2, c_win=c_win,
                sort2=sort2, rowids=rowids, inv2=inv2,
                num_windows=max(nwin, 1), region_digits=R, kb=kb,
                rstep2=rstep2, f2=f2, dmax2=dmax2, nsteps2=nsteps2,
                fill2=fill2)


def pack_tropical(csr: CSRMatrix, config: EngineConfig = DEFAULT_CONFIG,
                  region_rows: int | None = None,
                  kb: int = 16, native: bool = True) -> TropicalSpMVLayout:
    """Pack for the scalable tropical engine. Values ride RAW (clipped to
    [0, FLOAT_INF]) with the tropical annihilator FLOAT_INF as the A-slot
    pad — the kernel's exact bit encoding maps pad products to the
    max-identity 0 (ops/tropical_pallas.py). Requires val, x >= 0 (the
    reference's unsigned ufixed domain, graphlily/global.h:63)."""
    from ..semiring import FLOAT_INF
    work = csr.copy()
    vals = work.adj_data[:work.nnz]
    work.adj_data[:work.nnz] = np.clip(vals, 0.0, FLOAT_INF)
    if region_rows is None:
        region_rows = choose_tropical_region_rows(
            -(-csr.num_rows // 1024) * 1024)
    lay = pack_planar(work, config, region_rows=region_rows, hi_pad=-1,
                      pad_val=float(FLOAT_INF), native=native)
    parts = build_split_schedule(lay, kb=kb, native=native)
    return TropicalSpMVLayout(
        planar=lay, num_rows=lay.num_rows, num_cols=lay.num_cols,
        nnz=lay.nnz, **parts)
