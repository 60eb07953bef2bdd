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
    rg2: np.ndarray         # (nsteps2, rstep2, 2) int32, phase-ordered:
                            #   deposits [0, dstep2): w1 = k | p<<8,
                            #     w2 = slot12 | 1<<15 (slot = digit*K +
                            #     global_cycle%K — K-rotated, see builder)
                            #   flushes [dstep2, rstep2): w1 = 0,
                            #     w2 = slot12 | q<<16 | 1<<31
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
    dstep2: int = 0         # deposit slots per split step (rstep2 - f2)
    num_slots2: int = 0     # rotated digit slots (split scratch height)
    # ---- triples split format (split_format="triples"/"auto") ----
    # replaces planes2 (1 KB/piece) with ONE digit-major sort plane per
    # input chunk + 32 B of packed run words per piece (~32x smaller
    # deposit stream); planes2 is then a 0-size placeholder
    xsort2: np.ndarray | None = None    # (nsteps2, kb, 8, 128) int32
    triples2: np.ndarray | None = None  # (nsteps2, ceil(dmax2/128), 8, 128)
                                        #   int32: a0 | d0<<7 | n<<14
    # ---- compact window stream (compact_window_stream) ----
    # qblk2[i] = output BLOCK the split kernel's step i flushes into
    # (monotone; consecutive steps share a block until its f2 chunk slots
    # run out). None = legacy rectangular stream (block i per step i).
    qblk2: np.ndarray | None = None     # (nsteps2,) int32
    nblocks2: int = 0                   # compact stream height (0 = nsteps2)

    @property
    def mem_bytes(self) -> int:
        extra = sum(a.nbytes for a in (self.xsort2, self.triples2,
                                       self.qblk2)
                    if a is not None)
        return (self.planar.mem_bytes + self.in_order.nbytes
                + self.rg2.nbytes + self.planes2.nbytes + self.c_win.nbytes
                + self.sort2.nbytes + self.rowids.nbytes + self.inv2.nbytes
                + extra)

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


def _schedule_flushes(er, dl, tie, nsteps):
    """Stagger ALL split-pass flushes (cycle splits AND residual drains)
    across grid steps.

    Historically a split flushed at its deposit's step and every key of a
    region drained at the region's LAST chunk's step, so hub windows (16
    cycles/step) and region ends piled up to 175 flushes on single steps
    while the mean was ~20 — f2 (the flush-slot width, which sizes the
    window stream, the three reduce index streams AND the inter-pass temp)
    ran ~8x the average and the window stream sat at ~8% fill. Pass-3
    compute is any-active-guarded, but its DMA streams every padded slot
    (7 KB each), so the padding is both a memory and a bandwidth tax.

    A flush of (digit, global cycle g) may legally run at ANY step in
    [er, dl]:
      er = the step of the deposit that closed the cycle (split: the
           overflowing deposit; drain: the key's last deposit),
      dl = one step BEFORE the first deposit of (digit, g + K0) — that
           deposit reuses the K-rotated accumulator slot, and a step's
           deposit phase precedes its flush phase. K0 is the rotation
           depth of the UNSTAGGERED schedule; the final K is forced to
           max(K0, recomputed), so the windows stay valid (a larger K
           only moves the reuse later).
    Greedy: walk steps ascending, keep available flushes in a (deadline,
    tie) min-heap, fill each step to a cap; a flush whose deadline IS the
    current step places regardless of cap. A too-small cap BUNCHES: held
    flushes pile up behind it until a deadline cluster force-dumps them in
    one step (measured f2=425 at pokec scale with cap=average vs 175
    unstaggered — hub digits cycle every chunk, so their windows are
    zero-width). The cap is therefore binary-searched: the smallest cap
    whose greedy run never exceeds it (doubling to find a feasible upper
    bound first). Deterministic (tie = the flush's unique global
    region-cycle id), mirrored bit-identically by
    native/tropical_split.cpp.

    Returns (order, steps): flush indices in placement order + their steps
    (non-decreasing).
    """
    import heapq
    n = len(er)
    by_er = [[] for _ in range(nsteps)]
    for i in range(n):
        by_er[int(er[i])].append(i)

    def run(cap, emit):
        heap: list = []
        order = np.empty(n, np.int64) if emit else None
        steps_out = np.empty(n, np.int64) if emit else None
        pos = 0
        maxload = 0
        for s in range(nsteps):
            for i in by_er[s]:
                heapq.heappush(heap, (int(dl[i]), int(tie[i]), i))
            load = 0
            while heap and (heap[0][0] == s or load < cap):
                _, _, i = heapq.heappop(heap)
                if emit:
                    order[pos] = i
                    steps_out[pos] = s
                pos += 1
                load += 1
            maxload = max(maxload, load)
        assert pos == n, "flush scheduler left pending flushes"
        return maxload, order, steps_out

    lo = max(-(-n // max(nsteps, 1)), 1)
    hi = lo
    while run(hi, False)[0] > hi:
        hi *= 2
    while lo < hi:
        mid = (lo + hi) // 2
        if run(mid, False)[0] <= mid:
            hi = mid
        else:
            lo = mid + 1
    _, order, steps_out = run(lo, True)
    return order, steps_out


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

    # ---- phase-ordered descriptor stream (K-rotated digit slots) ----------
    # Per step the kernel runs ALL deposits (batched under shared guards —
    # see ops/router_pallas.py layout v3) then all flushes; a digit's
    # GLOBAL cycle sequence (cumulative across regions, since the digit
    # slot is reused region to region) rotates through K accumulator slots
    # so no slot is flushed and re-deposited within one step.
    step_of_chunk = np.arange(n_in) // kb
    nregs = int(regions.max()) + 1
    last_pos = np.zeros(nregs, np.int64)
    np.maximum.at(last_pos, regions, np.arange(n_in))
    # exec-order deposit fields
    e_chunk = sim.dc
    e_key = sim.dr
    e_digit = e_key % R
    e_step = step_of_chunk[e_chunk]
    sp_mask = sim.split.astype(bool)
    spw = np.nonzero(sp_mask)[0]

    # per-digit global cycle ids (cumulative flush count across regions)
    basecyc = np.concatenate(
        [np.zeros((1, R), np.int64),
         np.cumsum(ncyc.reshape(nregs, R), axis=0)[:-1]]).reshape(-1)
    gc1 = basecyc[e_key] + sim.cyc1
    gc2 = basecyc[e_key] + sim.cyc2
    dr_all = np.nonzero(has_resid)[0]
    dr_gc_all = basecyc[dr_all] + sim.cycle[dr_all]
    er_all = np.zeros(nkeys, np.int64)
    np.maximum.at(er_all, e_key, e_step)

    # K: max distinct global cycles of one digit touched in one step
    # (deposit pieces AND flushes — a flushed slot must not be re-deposited
    # by cycle gc+K within the flush's step)
    def _rotation_depth(t_dig, t_step, t_gc):
        gspan = int(t_gc.max()) + 2
        tk = (t_dig * np.int64(nsteps2 + 1) + t_step) * gspan + t_gc
        uk = np.unique(tk)
        _, cnt = np.unique(uk // gspan, return_counts=True)
        return int(cnt.max()) + 1

    # K0: rotation depth of the UNSTAGGERED schedule (splits at their
    # deposit step, drains at region end) — sets the flush windows below
    K0 = _rotation_depth(
        np.concatenate([e_digit, e_digit[spw], dr_all % R]),
        np.concatenate([e_step, e_step[spw],
                        step_of_chunk[last_pos[dr_all // R]]]),
        np.concatenate([gc1, gc2[spw], dr_gc_all]))

    # first deposit step per (digit, global cycle): the reuse horizon for
    # the flush windows (cycles of a digit are globally contiguous and
    # every cycle contains at least one deposit piece)
    dd = np.concatenate([e_digit, e_digit[spw]])
    dgc = np.concatenate([gc1, gc2[spw]])
    dstp = np.concatenate([e_step, e_step[spw]])
    gspan0 = int(dgc.max()) + K0 + 2
    fd_key = dd * gspan0 + dgc
    o0 = np.lexsort((dstp, fd_key))
    fk_s = fd_key[o0]
    fst = np.ones(len(fk_s), bool)
    fst[1:] = fk_s[1:] != fk_s[:-1]
    fd_keys_u = fk_s[fst]
    fd_step_u = dstp[o0][fst]

    # all flushes (splits + drains) with [er, dl] stagger windows
    fl_er = np.concatenate([e_step[spw], er_all[dr_all]])
    fl_dig = np.concatenate([e_digit[spw], dr_all % R])
    fl_gc = np.concatenate([gc1[spw], dr_gc_all])
    fl_key0 = np.concatenate([e_key[spw], dr_all])
    fl_rc0 = np.concatenate([rc_base[e_key[spw]] + sim.cyc1[spw],
                             rc_base[dr_all] + sim.cycle[dr_all]])
    reuse = fl_dig * gspan0 + fl_gc + K0
    look = np.minimum(np.searchsorted(fd_keys_u, reuse),
                      max(len(fd_keys_u) - 1, 0))
    hit = (fd_keys_u[look] == reuse) if len(fd_keys_u) else \
        np.zeros(len(reuse), bool)
    fl_dl = np.where(hit, fd_step_u[look] - 1, nsteps2 - 1)
    assert (fl_dl >= fl_er).all(), "flush window inverted (K0 violated)"
    forder2, fl_step_all = _schedule_flushes(fl_er, fl_dl, fl_rc0, nsteps2)
    fl_key_all = fl_key0[forder2]
    fl_rc_all = fl_rc0[forder2]
    fl_gc_s = fl_gc[forder2]
    fl_dig_s = fl_dig[forder2]

    # final K: never below K0 (the windows assumed reuse no earlier than
    # gc + K0), raised if the staggered steps pack more distinct cycles
    K = max(K0, _rotation_depth(
        np.concatenate([e_digit, e_digit[spw], fl_dig_s]),
        np.concatenate([e_step, e_step[spw], fl_step_all]),
        np.concatenate([gc1, gc2[spw], fl_gc_s])))
    num_slots2 = R * K
    assert num_slots2 <= 4096, \
        f"rotated split slots exceed the 12-bit field ({num_slots2})"
    slot1 = e_digit * K + gc1 % K
    slot2 = e_digit * K + gc2 % K
    fl_slot_all = fl_dig_s * K + fl_gc_s % K

    # deposit pieces in exec order (piece2 right after its piece1)
    per_dep = np.where(sp_mask, 2, 1)
    dbase = np.concatenate([[0], np.cumsum(per_dep)[:-1]])
    npc = int(per_dep.sum())
    pc_step = np.zeros(npc, np.int64)
    pc_chunk = np.zeros(npc, np.int64)
    pc_slot = np.zeros(npc, np.int64)
    pc_piece = np.zeros(npc, np.int64)
    pc_step[dbase] = e_step
    pc_chunk[dbase] = e_chunk
    pc_slot[dbase] = slot1
    pc_piece[dbase] = 2 * np.arange(nd)
    pc_step[dbase[spw] + 1] = e_step[spw]
    pc_chunk[dbase[spw] + 1] = e_chunk[spw]
    pc_slot[dbase[spw] + 1] = slot2[spw]
    pc_piece[dbase[spw] + 1] = 2 * spw + 1
    dep_counts = np.bincount(pc_step, minlength=nsteps2)
    dstep2 = max(int(dep_counts.max()), 1)
    dep_first2 = np.concatenate([[0], np.cumsum(dep_counts)[:-1]])
    p_of = np.arange(npc) - dep_first2[pc_step]
    dmax2 = dstep2

    # flushes arrive from _schedule_flushes in placement (step-ascending)
    # order with fl_slot_all already K-rotated above
    nf = len(fl_step_all)
    fl_counts = np.bincount(fl_step_all, minlength=nsteps2)
    f2 = max(int(fl_counts.max()), 1)
    assert f2 <= 256, f"flush ordinal overflow ({f2})"
    fl_first2 = np.concatenate([[0], np.cumsum(fl_counts)[:-1]])
    q_of = np.arange(nf) - fl_first2[fl_step_all]

    rstep2 = dstep2 + f2
    rg2 = np.zeros((nsteps2, rstep2, 2), np.int32)
    rg2[pc_step, p_of, 0] = ((pc_chunk - pc_step * kb)
                             | (p_of << 8)).astype(np.int32)
    rg2[pc_step, p_of, 1] = (pc_slot | (1 << 15)).astype(np.int32)
    if nf:
        rg2[fl_step_all, dstep2 + q_of, 1] = (
            fl_slot_all | (q_of << 16) | (np.int64(1) << 31)).astype(np.int32)

    piece_sp = np.full((2 * nd, 2), -1, np.int64)   # (step, plane ordinal)
    piece_sp[pc_piece, 0] = pc_step
    piece_sp[pc_piece, 1] = p_of

    # rc -> out stream position
    rc_linear = np.zeros(nrc + 1, np.int64)
    out_pos = fl_step_all * f2 + q_of
    rc_linear[fl_rc_all] = out_pos
    c_win = np.full(nsteps2 * f2, -1, np.int32)
    # rc -> global window: key = region*R + digit, window = same value
    c_win[out_pos] = fl_key_all.astype(np.int32)

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
                dstep2=dstep2, num_slots2=num_slots2, fill2=fill2)


AUTO_TRIPLES_PLANES_BYTES = 2_000_000_000  # "auto": triples only where the
# plane stream is the footprint wall (orkut-class); smaller graphs keep the
# TPU-measured planes path
PLANES2_BYTES_PER_NNZ = 30.0   # measured pokec/hollywood-class planes2 rate


def resolve_tropical_split_format(nnz: int, config=None,
                                  split_format: str | None = None) -> str:
    """Resolve "auto" to a concrete split format from a-priori structure
    (nnz only): the SAME rule keys the layout disk cache (ADVICE r4: an
    "auto" key stored a bit-identical duplicate of the planes entry) and
    picks the packed format, so key and content can never diverge."""
    fmt = (getattr(config, "tropical_split_format", "planes")
           if split_format is None else split_format)
    if fmt == "auto":
        return ("triples" if nnz * PLANES2_BYTES_PER_NNZ
                >= AUTO_TRIPLES_PLANES_BYTES else "planes")
    if fmt not in ("planes", "triples"):
        raise ValueError(f"unknown split_format {fmt!r}")
    return fmt


def derive_split_triples(lay: PlanarSpMVLayout, parts: dict):
    """Compress the split-pass deposit planes into (sort plane, run words).

    Pass-2 deposit destinations are contiguous runs by construction
    (el_dst = cursor_dest + rank), but the SOURCE lanes are the arbitrary
    subset of the chunk's lanes holding the piece's digit. Sorting each
    input chunk digit-major (stable by (digit, row, lane) — the SAME order
    the builder ranks elements in) makes every piece's sources contiguous
    too: piece1 of deposit (chunk, digit) reads sorted positions
    [digit_start, digit_start+p1) and piece2 the remainder. Each
    (piece, sublane) then compresses from a 1 KB int8 gather plane to one
    packed int32 word a0 | d0<<7 | n<<14 (the permc deposit format,
    ops/router_pallas.py triples decode) plus ONE shared 4 KB sort plane
    per chunk — ~32x less deposit-stream HBM, the wall between orkut-scale
    SSSP and the 14 GB budget (BENCH feasibility math).

    Derived POST-HOC from planes2 + rg2, so it composes with both the
    numpy and the native C++ schedule builders unchanged (and the existing
    bit-identity tests keep their meaning). Returns (xsort2, triples2).
    """
    planes2 = parts["planes2"]
    rg2 = parts["rg2"]
    in_pad = np.asarray(parts["in_order"], dtype=np.int64)
    kb = parts["kb"]
    nsteps2, dmax2 = planes2.shape[:2]

    hi = np.asarray(lay.c_hi)[in_pad].astype(np.int64)   # (C, 8, 128)
    lo = np.asarray(lay.c_lo)[in_pad].astype(np.int64)
    C = hi.shape[0]
    lane = np.arange(L, dtype=np.int64)
    invalid = hi < 0
    key = (np.where(invalid, 1, 0) << 24 \
           | np.where(invalid, 0, hi) << 14 \
           | np.where(invalid, 0, lo) << 7 | lane)
    xsort = np.argsort(key, axis=2, kind="stable").astype(np.int32)
    sortpos = np.empty((C, S, L), np.int32)
    np.put_along_axis(sortpos, xsort.astype(np.int64),
                      np.broadcast_to(lane.astype(np.int32), (C, S, L)),
                      axis=2)

    # elements: planes2 stores li-128 in [-128,-1]; 0 == empty slot
    pst, psl, es, el = np.nonzero(planes2)
    src = planes2[pst, psl, es, el].astype(np.int64) + 128
    cpos = pst.astype(np.int64) * kb + (rg2[pst, psl, 0] & 0xFF)
    sp = sortpos[cpos, es, src].astype(np.int64)
    pk = (pst.astype(np.int64) * dmax2 + psl) * S + es
    npk = nsteps2 * dmax2 * S

    order = np.lexsort((el, pk))
    pk_s, el_s, sp_s = pk[order], el[order], sp[order]
    first = np.ones(len(pk_s), bool)
    first[1:] = pk_s[1:] != pk_s[:-1]
    fi = np.nonzero(first)[0]
    cnt_g = np.diff(np.concatenate([fi, [len(pk_s)]]))
    la = fi + cnt_g - 1
    # contiguity (the run property triples encode) — both ends + the
    # per-element diagonal sp - el == const within each group
    assert (el_s[la] - el_s[fi] + 1 == cnt_g).all(), "dest run broken"
    assert (sp_s[la] - sp_s[fi] + 1 == cnt_g).all(), "src run broken"
    diag = np.zeros(npk, np.int64)
    diag[pk_s[fi]] = sp_s[fi] - el_s[fi]
    assert (sp_s - el_s == diag[pk_s]).all(), "run order mismatch"

    a0 = np.zeros(npk, np.int64)
    d0 = np.zeros(npk, np.int64)
    nn = np.zeros(npk, np.int64)
    a0[pk_s[fi]] = sp_s[fi]
    d0[pk_s[fi]] = el_s[fi]
    nn[pk_s[fi]] = cnt_g
    assert nn.max() <= 128 and a0.max() <= 127 and d0.max() <= 127
    TP2 = max(-(-dmax2 // L), 1)
    triples2 = np.zeros((nsteps2, TP2 * L, S), np.int64)
    words = (a0 | d0 << 7 | nn << 14).reshape(nsteps2, dmax2, S)
    triples2[:, :dmax2, :] = words
    triples2 = triples2.reshape(nsteps2, TP2, L, S) \
                       .transpose(0, 1, 3, 2).astype(np.int32)
    return (xsort.reshape(nsteps2, kb, S, L),
            np.ascontiguousarray(triples2))


def compact_window_stream(parts: dict) -> dict:
    """Pack the rectangular window stream into shared fixed-height blocks.

    The split pass's output is (nsteps2, f2, 8, 128) with f2 = the MAX
    flushes in any step — but the average is far lower (products-scale
    fill2 ~0.10), so the window stream, and the three reduce tables
    indexed by it (sort2/rowids/inv2, 3 B/slot), carry 6-10x padding: the
    r4 OOM wall for full-scale SSSP on ogbn-products/orkut.

    Fix: successive split steps share one f2-chunk output block until its
    slots run out (monotone block map qblk2, consumed by the kernel's
    scalar-prefetched out index_map — Mosaic keeps a revisited output
    block in VMEM and writes it back once on advance). Flush descriptors'
    q bits become offsets in the CURRENT block; a step whose flushes would
    straddle a block boundary advances early (waste <= avg flushes/step
    per block). Applied POST-HOC to the schedule parts, so the native C++
    builder and the triples derivation stay untouched. Unwritten slots
    keep inert defaults (c_win -1, identity sort, rowids 127, inv 0):
    the reduce masks them exactly like rectangular padding."""
    rg2 = parts["rg2"]
    f2, dstep2, nsteps2 = parts["f2"], parts["dstep2"], parts["nsteps2"]
    w2 = rg2[:, dstep2:, 1].astype(np.int64)
    is_fl = w2 < 0
    n_i = is_fl.sum(axis=1)
    fb = f2
    qblk = np.zeros(nsteps2, np.int32)
    off0 = np.zeros(nsteps2, np.int64)
    cur_blk, cur_off = 0, 0
    for i in range(nsteps2):            # host loop, ~nsteps2 iterations
        if cur_off + n_i[i] > fb:
            cur_blk += 1
            cur_off = 0
        qblk[i] = cur_blk
        off0[i] = cur_off
        cur_off += n_i[i]
    nblocks = cur_blk + 1

    st, jf = np.nonzero(is_fl)
    old_q = (w2[st, jf] >> 16) & 0xFF
    new_q = off0[st] + old_q            # q_of is dense 0..n_i-1 per step
    assert new_q.max(initial=0) < fb <= 256
    w2_new = (w2[st, jf] & ~(0xFF << 16)) | (new_q << 16)
    rg2 = rg2.copy()
    rg2[st, dstep2 + jf, 1] = w2_new.astype(np.int32)

    old_pos = st.astype(np.int64) * f2 + old_q
    new_pos = qblk[st].astype(np.int64) * fb + new_q
    n_out = nblocks * fb
    c_win = np.full(n_out, -1, np.int32)
    c_win[new_pos] = parts["c_win"][old_pos]
    sort2 = np.tile(np.arange(L, dtype=np.int8), (n_out, S, 1))
    sort2[new_pos] = parts["sort2"].reshape(-1, S, L)[old_pos]
    rowids = np.full((n_out, S, L), 127, np.int8)
    rowids[new_pos] = parts["rowids"].reshape(-1, S, L)[old_pos]
    inv2 = np.zeros((n_out, S, L), np.int8)
    inv2[new_pos] = parts["inv2"].reshape(-1, S, L)[old_pos]

    return dict(parts, rg2=rg2, c_win=c_win, sort2=sort2, rowids=rowids,
                inv2=inv2, qblk2=qblk, nblocks2=nblocks,
                fill2=parts["fill2"] * (nsteps2 * f2) / max(n_out, 1))


def pack_tropical(csr: CSRMatrix, config: EngineConfig = DEFAULT_CONFIG,
                  region_rows: int | None = None,
                  kb: int = 16, native: bool = True,
                  split_format: str | None = None) -> TropicalSpMVLayout:
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
                      pad_val=float(FLOAT_INF), native=native,
                      deal=config.planar_deal)
    parts = build_split_schedule(lay, kb=kb, native=native)
    fmt = resolve_tropical_split_format(csr.nnz, config, split_format)
    if fmt == "triples":
        xsort2, triples2 = derive_split_triples(lay, parts)
        parts = dict(parts, xsort2=xsort2, triples2=triples2,
                     planes2=np.zeros((0, 0, S, L), np.int8))
        # pass-1 planes compress the same way (losslessly — free-deal
        # pieces are contiguous runs; io/planar_format.planes_to_triples
        # asserts it): another ~6 B/nnz off the footprint-capped graphs
        from .planar_format import planes_to_triples
        lay.triples = planes_to_triples(lay)
        lay.planes = np.zeros((0, 0, S, L), np.int8)
    parts = compact_window_stream(parts)
    return TropicalSpMVLayout(
        planar=lay, num_rows=lay.num_rows, num_cols=lay.num_cols,
        nnz=lay.nnz, **parts)
