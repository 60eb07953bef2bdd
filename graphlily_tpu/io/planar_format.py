"""Planar-deposit router layout: bucket-binned tile chunks + plane-driven
deposits. The scalable SpMV format for hypersparse graphs.

Why a second router format (see router_format.py for the range/roll one):
page-based A-chunks reach only 128 columns, so on hypersparse graphs the
(page x region) runs shrink to a handful of elements and the deposit count
explodes (pokec stand-in: ~1.3M roll deposits, 700+ unrolled descriptor
slots per grid step). Binning each 1024-col TILE's elements into
sublane = (col>>7)&7 buckets makes the phase-A gather a single ax1
dynamic_gather (the sublane IS the bucket — no gather-composition hazard)
and gives 8x longer region runs at tile reach.

The price is that a region's elements inside a chunk are now 8 PER-SUBLANE
lane ranges instead of one flat run, so deposits can't be a roll: each
deposit ships a precomputed (8,128) int8 PLANE — entry < 0 means "take
source lane (v & 127) of the same sublane", else keep — and the kernel
executes gather + select into the region accumulator. One plane descriptor
moves a whole (tile x region) group (~8 runs) per ~50 ns.

Cursor discipline: per (region, sublane) cursors advance independently;
when a deposit would overflow any sublane past 128 lanes, the accumulator
is flushed FIRST (whole chunks, no splits) and zeroed, so flushed chunks
carry zeros in unused slots (the phase-C one-hot reduce adds 0 at hi=lo=0
— harmless). Phase C itself is IDENTICAL to the roll-router's: static
c_code/c_hi/c_lo streams drive the fused or split one-hot MXU reduce.

Counterpart of the reference's bounded 2-D partitioned SpMV + shuffle
(graphlily/hw/kernel_spmv_impl.h:470-513, hw/shuffle.h), with the crossbar
replaced by static plane schedules. MULADD/ANDOR only (phase C is a dot).
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..config import EngineConfig, DEFAULT_CONFIG
from .matrix import CSRMatrix
from .formatter import util_round_csr_matrix_dim
from .router_format import REGION_ROWS, CHUNK, MAX_REGIONS, _balance_chunks

S = 8
L = 128


@dataclasses.dataclass
class PlanarSpMVLayout:
    """Static streams + schedules for the planar router SpMV (all numpy)."""

    a_r: np.ndarray        # (NSTEPS*CB, 8, 128) int8 : x2 lane of the col
    xperm: np.ndarray      # (NTILES, 8, 8, 128) int8 : x-shuffle planes;
                           #   [t, s_src, d, l] < 0 -> x2[t,d,l] takes source
                           #   lane (v & 127) of x[t, s_src].
                           #   deal="free" layouts: EMPTY (0,8,8,128) — x2 is
                           #   the natural x.reshape(nct,8,128) and a_sub
                           #   carries the chained-gather sublane table
    a_vals: np.ndarray     # (NSTEPS*CB, 8, 128) f32  : values (pad 0)
    a_page: np.ndarray     # (NSTEPS*CB,) int32       : 1024-col tile id
    rg: np.ndarray         # (NSTEPS, RSTEP, 2) int32 : descriptors
                           #   deposit: w1 = k | p<<8 (chunk in step, plane
                           #            ordinal in step)
                           #            w2 = slot | 1<<15          (w2 > 0)
                           #   flush:   w1 = 0
                           #            w2 = slot | q8<<16 | 1<<31 (w2 < 0)
                           #   w2 == 0 -> inactive
    planes: np.ndarray     # (NSTEPS, DMAX, 8, 128) int8: deposit planes in
                           #   per-step deposit-ordinal order (flush/inactive
                           #   slots carry none); v<0 -> take source lane
                           #   (v&127), else keep accumulator
    c_code: np.ndarray     # (NSTEPS*F,) int32 : region per flush (-1 skip)
    c_hi: np.ndarray       # (NSTEPS*F, 8, 128) int8
    c_lo: np.ndarray       # (NSTEPS*F, 8, 128) int8
    num_rows: int
    num_cols: int
    nnz: int
    num_col_tiles: int
    num_regions: int
    region_rows: int
    cb: int
    rstep: int
    f: int
    dmax: int
    nsteps: int
    fill_a: float
    fill_stream: float
    dstep: int = 0         # deposit slots per step (rstep - f)
    num_slots: int = 0     # rotated accumulator slots (scratch height)
    el_slot: np.ndarray | None = None   # (nnz,) original-order nnz -> flat
                                        # a_vals slot (structure/value split:
                                        # re-valuing a cached layout is one
                                        # O(nnz) scatter, no re-simulation)
    el_stream: np.ndarray | None = None  # (nnz,) original-order nnz -> flat
                                         # flush-stream slot (numpy path with
                                         # keep_el_stream=True only; feeds
                                         # the tropical split-pass builder)
    a_sub: np.ndarray | None = None      # deal="free" only: (NSTEPS*CB, 8,
                                         # 128) int8 chained-gather table —
                                         # a_sub[k, s, rho] = source sublane
                                         # of the class-rho column whose
                                         # elements sit in dest sublane s
                                         # (composed-gather rule: one source
                                         # sublane per (chunk, s, rho))
    triples: np.ndarray | None = None    # (NSTEPS, ceil(dstep/128), 8, 128)
                                         # int32 triple-run deposit words
                                         # a0|d0<<7|n<<14 (permc_format.py;
                                         # replaces the 1 KB/piece planes
                                         # stream at 32 B/piece)
    c_end: np.ndarray | None = None      # permc only: (NSTEPS*F, 8, 128)
                                         # int8 run-end acc lane per DEST
                                         # lane (prefix-difference reduce)
    c_beg: np.ndarray | None = None      # permc only: run-start-1 (-1 ok)

    @property
    def mem_bytes(self) -> int:
        return (self.a_r.nbytes + self.xperm.nbytes
                + self.a_vals.nbytes + self.a_page.nbytes
                + self.rg.nbytes + self.planes.nbytes + self.c_code.nbytes
                + self.c_hi.nbytes + self.c_lo.nbytes
                + (self.triples.nbytes if self.triples is not None else 0))


def planes_to_triples(lay) -> np.ndarray:
    """Losslessly compress a planar layout's deposit planes to triple-run
    words: every (piece, sublane) is ONE contiguous source run mapped to
    ONE contiguous accumulator run (the scatter writes src0+off at
    dest0+off), so a 1 KB (8,128) int8 plane collapses to 8 per-sublane
    int32 words `a0 | d0<<7 | n<<14` (32 B/piece — the permc deposit
    format, decoded by ops/router_pallas.py's triples kernels). Asserts
    the run invariant rather than trusting it. Returns
    (nsteps, ceil(dstep/128), 8, 128) int32."""
    nsteps, dmax = lay.planes.shape[:2]
    TP = (lay.dstep + L - 1) // L
    tw = np.zeros((nsteps, TP, S, L), np.int32)
    pv = lay.planes.astype(np.int32)          # < 0 -> take src (pv & 127)
    take = pv < 0
    n_ = take.sum(axis=3)                     # (nsteps, dmax, 8)
    d0 = np.where(n_ > 0, np.argmax(take, axis=3), 0)
    src = pv & 127
    a0 = np.take_along_axis(src, d0[..., None], axis=3)[..., 0]
    a0 = np.where(n_ > 0, a0, 0)
    lane_i = np.arange(L)
    run = (lane_i[None, None, None, :] >= d0[..., None]) & (
        lane_i[None, None, None, :] < (d0 + n_)[..., None])
    assert (take == run).all(), "plane take-mask is not a single run"
    expect = (a0[..., None] + lane_i[None, None, None, :]
              - d0[..., None]) & 127
    assert (np.where(run, src, 0) == np.where(run, expect, 0)).all(), \
        "plane srcs are not contiguous"
    words = (a0 | (d0 << 7) | (n_ << 14)).astype(np.int32)
    assert dmax <= TP * L
    p = np.arange(dmax)
    # two advanced indices around a slice: result dims are (dmax, nsteps, 8)
    tw[:, p >> 7, :, p & 127] = words.transpose(1, 0, 2)
    return tw


def simulate_cursors(dc, dr, dl, nkeys: int):
    """Per-(key, sublane) cursor simulation shared by the planar packer and
    the tropical split-pass builder: deposits run in (dc, dr) order; one that
    would overflow any sublane past 128 lanes is SPLIT at the boundary
    (piece 1 tops the accumulator, a flush drains it, piece 2 restarts at
    lane 0). `dr` doubles as the cursor key (< nkeys)."""
    ed = np.lexsort((dr, dc))
    dc, dr, dl = dc[ed], dr[ed], dl[ed]
    nd_ = len(dc)
    C = np.zeros((nkeys, S), np.int64)
    cycle = np.zeros(nkeys, np.int64)
    d_dest1 = np.zeros((nd_, S), np.int64)
    d_part1 = np.zeros((nd_, S), np.int64)
    d_cyc1 = np.zeros(nd_, np.int64)
    d_cyc2 = np.zeros(nd_, np.int64)
    d_split = np.zeros(nd_, bool)
    for i in range(nd_):
        r = dr[i]
        lens = dl[i]
        Cr = C[r]
        if np.any(Cr + lens > L):
            p1 = np.minimum(lens, L - Cr)
            d_dest1[i] = Cr
            d_part1[i] = p1
            d_cyc1[i] = cycle[r]
            d_split[i] = True
            cycle[r] += 1
            C[r] = lens - p1
            d_cyc2[i] = cycle[r]
        else:
            d_dest1[i] = Cr
            d_part1[i] = lens
            d_cyc1[i] = d_cyc2[i] = cycle[r]
            C[r] = Cr + lens
    import types
    return types.SimpleNamespace(
        ed=ed, dc=dc, dr=dr, dl=dl, dest1=d_dest1, part1=d_part1,
        cyc1=d_cyc1, cyc2=d_cyc2, split=d_split, C=C, cycle=cycle)


def _largest_remainder_quotas(M):
    """Per (chunk, class): partition the 8 dest sublanes among the class's
    (<=8) source columns by D'Hondt allocation — every active column gets 1,
    then each remaining sublane goes to the column with the largest m/q —
    which minimizes the max per-sublane load for the class. M is (nc, 128,
    8) int counts; returns q (same shape, int64, sum over sigma == 8
    wherever the class is nonempty)."""
    act = M > 0
    q = act.astype(np.int64)
    navail = 8 - q.sum(axis=2)
    navail[q.sum(axis=2) == 0] = 0
    for _ in range(7):
        take = navail > 0
        if not take.any():
            break
        score = np.where(act, M / np.maximum(q, 1), -1.0)
        pick = np.argmax(score, axis=2)
        np.put_along_axis(q, pick[:, :, None],
                          np.take_along_axis(q, pick[:, :, None], 2)
                          + take[:, :, None], 2)
        navail -= take
    return q


def _deal_free(rr, cc, vv, order, nnz, ntiles, region_rows):
    """deal="free" front-end: chained-gather chunk/sublane/lane assignment.

    Elements sorted (tile, row, col); chunks = 1024-element windows per
    tile. Dest sublanes are dealt by class quotas (_largest_remainder_quotas)
    rotated per (class, chunk), so a hub column's elements spread across all
    8 sublanes — the fix for the 0.485 flush fill of the bucket-bound deal
    (a hub column's elements were pinned to its snake sublane, skewing the
    per-(region, sublane) cursors; measured p10 fill 0.125 on pokec).
    Composed-gather consistency (CLAUDE.md: sub is indexed by the SOURCE
    lane) holds because the quota sets partition the sublanes per (chunk,
    class): one source sublane per (chunk, dest sublane, class).

    Returns (rr, cc, vv, order, a_chunk, dest_sub, lane, chunk_tile, nca)
    with elements re-sorted to (chunk, dest_sub, lane) order."""
    tile = cc >> 10
    sig = (cc >> 7) & 7
    rho = cc & 127
    tcount = np.bincount(tile, minlength=ntiles)
    cpt0 = (tcount + CHUNK - 1) // CHUNK
    chunk_of = np.zeros(nnz, np.int64)
    sub_of = np.zeros(nnz, np.int64)
    chunk_round = np.zeros(nnz, np.int64)
    # per-round chunk allocation (round 0: rank windows; later rounds: one
    # spill chunk per tile with spilled elements)
    extra_rounds = []
    pend = np.arange(nnz)  # elements to deal this round (row-ordered ids)
    local_chunk = (np.arange(nnz)
                   - np.repeat(np.concatenate([[0], np.cumsum(tcount)[:-1]]),
                               tcount)) // CHUNK if nnz else np.zeros(0,
                                                                      np.int64)
    round_no = 0
    while len(pend):
        assert round_no < 16, "free-deal spill recursion exceeded 16 rounds"
        # chunk ids within this round: (tile, local chunk) for round 0,
        # one extra chunk per tile per spill round
        if round_no == 0:
            rc = local_chunk[pend]
            rcpt = cpt0
        else:
            # spilled elements re-dealt into fresh rank-window chunks of
            # their tile (pend is tile-then-row ordered: a stable subset of
            # the original sort)
            tcnt = np.bincount(tile[pend], minlength=ntiles)
            rcpt = (tcnt + CHUNK - 1) // CHUNK
            tstart = np.concatenate([[0], np.cumsum(tcnt)[:-1]])
            rc = (np.arange(len(pend)) - tstart[tile[pend]]) // CHUNK
        rbase = np.concatenate([[0], np.cumsum(rcpt)])
        ch = rbase[tile[pend]] + rc
        ncr = max(int(rbase[-1]), 1)
        key = (ch * L + rho[pend]) * 8 + sig[pend]
        M = np.bincount(key, minlength=ncr * L * 8).reshape(ncr, L, 8)
        q = _largest_remainder_quotas(M)
        cum = np.cumsum(q, axis=2) - q          # exclusive per class
        # element sequence number within (chunk, class, col), row order
        ord2 = np.argsort(key, kind="stable")
        kk = np.empty(len(pend), np.int64)
        ks = key[ord2]
        newk = np.ones(len(pend), bool)
        if len(pend):
            newk[1:] = ks[1:] != ks[:-1]
        gs = np.nonzero(newk)[0]
        kk[ord2] = np.arange(len(pend)) - np.repeat(
            gs, np.diff(np.concatenate([gs, [len(pend)]])))
        qe = q[ch, rho[pend], sig[pend]]
        start = (5 * rho[pend] + 3 * ch) % 8
        s = (start + cum[ch, rho[pend], sig[pend]] + kk % np.maximum(qe, 1)
             ) % 8
        # sublane capacity: row-tail overflow spills to the next round
        ord3 = np.argsort(ch * 8 + s, kind="stable")
        ks3 = (ch * 8 + s)[ord3]
        newk3 = np.ones(len(pend), bool)
        if len(pend):
            newk3[1:] = ks3[1:] != ks3[:-1]
        gs3 = np.nonzero(newk3)[0]
        lane_r = np.empty(len(pend), np.int64)
        lane_r[ord3] = np.arange(len(pend)) - np.repeat(
            gs3, np.diff(np.concatenate([gs3, [len(pend)]])))
        over = lane_r >= L
        keep = ~over
        chunk_of[pend[keep]] = ch[keep]    # round-local; renumbered below
        sub_of[pend[keep]] = s[keep]
        chunk_round[pend[keep]] = round_no
        extra_rounds.append(rcpt)
        pend = pend[over]
        round_no += 1
    # global chunk renumbering: per tile, round-0 chunks then spill chunks
    cpt_all = (np.stack(extra_rounds, axis=0) if extra_rounds
               else np.zeros((1, ntiles), np.int64))
    cpt_final = cpt_all.sum(axis=0)
    tile_base = np.concatenate([[0], np.cumsum(cpt_final)])
    # offset of round r's chunks within the tile
    roff = np.cumsum(cpt_all, axis=0) - cpt_all   # (rounds, ntiles)
    rb0 = [np.concatenate([[0], np.cumsum(c)]) for c in cpt_all]
    a_chunk = np.zeros(nnz, np.int64)
    for rno in range(len(extra_rounds)):
        m = chunk_round == rno
        if not m.any():
            continue
        # chunk_of holds the round-local id (rbase[tile] + rc): convert to
        # tile-local then to the global id
        loc = chunk_of[m] - rb0[rno][tile[m]]
        a_chunk[m] = tile_base[tile[m]] + roff[rno, tile[m]] + loc
    nca = max(int(tile_base[-1]), 1)
    chunk_tile = np.repeat(np.arange(ntiles), cpt_final).astype(np.int32)
    # final element order: (chunk, dest sublane, row) -> lanes 0..count-1
    ordf = np.lexsort((rr, sub_of, a_chunk))
    rr, cc, vv = rr[ordf], cc[ordf], vv[ordf]
    order = order[ordf]
    a_chunk, dest_sub = a_chunk[ordf], sub_of[ordf]
    ks4 = a_chunk * 8 + dest_sub
    newk4 = np.ones(nnz, bool)
    if nnz:
        newk4[1:] = ks4[1:] != ks4[:-1]
    gs4 = np.nonzero(newk4)[0] if nnz else np.zeros(0, np.int64)
    lane = (np.arange(nnz) - np.repeat(
        gs4, np.diff(np.concatenate([gs4, [nnz]])))) if nnz else \
        np.zeros(0, np.int64)
    assert not nnz or lane.max() < L
    return rr, cc, vv, order, a_chunk, dest_sub, lane, chunk_tile, nca


def choose_planar_region_rows(nrows: int, ncols: int, nnz: int) -> int:
    """Deposits scale as ntiles*nrows/R; the phase-C reduce costs R MACs/nnz
    plus (R/128 + 128) one-hot compare rows per flushed slot-row. The
    phase-ordered kernels made deposits ~10x cheaper (3-7 ns measured), so
    the optimum moved DOWN from the 16384 cap: rh=64 regions measured
    pokec 16.8 -> 14.9 ms and hollywood 45.8 -> 32.5 ms full-scale
    (tools/planar_profile.py rr sweeps, post-v3 kernels)."""
    ntiles = max(ncols // 1024, 1)
    r_opt = (ntiles * nrows * 2.0e8 / max(nnz, 1)) ** 0.5
    r = int(round(r_opt / 128)) * 128
    r_min = ((nrows + MAX_REGIONS - 1) // MAX_REGIONS + 127) // 128 * 128
    return max(min(max(r, 1024), 8192), r_min)


def pack_planar(csr: CSRMatrix, config: EngineConfig = DEFAULT_CONFIG,
                pad_val: float = 0.0, cb: int | None = None,
                region_rows: int | None = None,
                native: bool = True,
                keep_el_stream: bool = False,
                hi_pad: int = 0, deal: str = "bucket") -> PlanarSpMVLayout:
    """`hi_pad`: fill value for unoccupied c_hi slots. The ADD reduce wants 0
    (inert: one-hot adds the zero value at row 0); the tropical split-pass
    builder wants -1 so padding slots are identifiable.

    `pad_val` fills empty A-VALUE slots only (the <x> annihilator: 0 for
    MULADD/ANDOR, FLOAT_INF for the tropical engine's raw-value stream).
    The flush stream's zero-at-flush discipline is independent of it — the
    tropical encoding maps its INF products to the max-identity 0
    (io/tropical_format.py).

    `deal`: "bucket" = the v3 layout (sublane = snake col bucket, single
    phase-A gather through the xperm pre-pass); "free" = the v4 layout
    (chained phase-A gather via a_sub, dest sublanes quota-dealt per class
    — see _deal_free; no xperm)."""
    if deal == "permc":
        if keep_el_stream or hi_pad != 0:
            # the tropical split-pass builder consumes el_stream/hi_pad
            # from the free-deal layout; permc is MULADD/ANDOR only
            deal = "free"
        else:
            from .permc_format import pack_permc
            return pack_permc(csr, config, pad_val=pad_val, cb=cb,
                              region_rows=region_rows, native=native)
    work = csr.copy()
    util_round_csr_matrix_dim(work, 1024, 1024)
    nrows, ncols = work.num_rows, work.num_cols
    if region_rows is None:
        region_rows = choose_planar_region_rows(nrows, ncols, work.nnz)
    assert region_rows % 128 == 0 and 128 <= region_rows <= REGION_ROWS
    nregions = (nrows + region_rows - 1) // region_rows
    if nregions > MAX_REGIONS:
        raise ValueError(
            f"{nrows} rows -> {nregions} regions exceeds the planar router "
            f"limit {MAX_REGIONS}")
    nnz = work.nnz
    rr = work.row_ids().astype(np.int64)
    cc = work.adj_indices[:nnz].astype(np.int64)
    vv = work.adj_data[:nnz].astype(np.float32)
    if native and nnz and not keep_el_stream:
        # the C++ schedule builder produces bit-identical arrays ~20x faster
        # on this 1-vCPU host (tests/test_native_pack.py verifies equality);
        # it returns None when unavailable -> fall through to numpy
        from ..native import planar_pack_native
        nat = planar_pack_native(rr, cc, vv, nrows, ncols, region_rows,
                                 cb or 0, hi_pad=hi_pad, pad_val=pad_val,
                                 deal=deal)
        if nat is not None:
            nca = nat.pop("nca")
            return PlanarSpMVLayout(
                num_rows=nrows, num_cols=ncols, nnz=nnz,
                num_col_tiles=ncols // 1024, region_rows=region_rows,
                fill_a=nnz / max(nca * CHUNK, 1),
                fill_stream=nnz / max(nat["nsteps"] * nat["f"] * CHUNK, 1),
                **nat)
    if deal == "free":
        ntiles_pad = ncols // 1024
        order0 = np.lexsort((cc, rr, cc >> 10))
        (rr, cc, vv, order, a_chunk, bucket, lane, chunk_tile,
         nca) = _deal_free(rr[order0], cc[order0], vv[order0], order0,
                           nnz, ntiles_pad, region_rows)
        xperm = np.zeros((0, S, S, L), np.int8)
        a_r_val = (cc & 127).astype(np.int8)
        return _pack_planar_tail(
            rr, cc, vv, order, a_chunk, bucket, lane, chunk_tile, nca,
            xperm, a_r_val, nrows, ncols, nnz, region_rows, nregions,
            cb, hi_pad, pad_val, keep_el_stream, with_sub=True)
    tile = cc >> 10

    # ---- per-tile column re-layout: balance bucket loads ------------------
    # The element's sublane is its column's bucket, and power-law hub
    # columns make physical buckets wildly imbalanced (measured 29% chunk
    # fill on the googleplus stand-in). Columns are therefore REASSIGNED to
    # (sublane, lane) slots within their tile — degree-sorted snake deal
    # across the 8 sublanes — and a tiny static x-shuffle pre-pass
    # (8 gather+selects per tile) materializes x in that layout at runtime.
    ntiles_pad = ncols // 1024
    deg = np.bincount(cc, minlength=ncols)
    col_mat = np.arange(ncols).reshape(ntiles_pad, 1024)
    dorder = np.argsort(-deg.reshape(ntiles_pad, 1024), axis=1,
                        kind="stable")                     # per-tile desc
    pos = np.empty((ntiles_pad, 1024), np.int64)
    np.put_along_axis(pos, dorder, np.arange(1024)[None, :], axis=1)
    rnd, idx8 = pos // 8, pos % 8
    sub_of_pos = np.where(rnd % 2 == 0, idx8, 7 - idx8)    # snake over subs
    lane_of_pos = rnd
    col_sub = sub_of_pos.reshape(-1)                       # per column
    col_lane = lane_of_pos.reshape(-1)
    bucket = col_sub[cc]

    # x-shuffle planes: for each (tile, src sublane): dest plane (8,128)
    # with bit7 = take, low 7 bits = source lane
    src_sub = ((col_mat % 1024) >> 7)
    src_lane = (col_mat % 128)
    xperm = np.zeros((ntiles_pad, S, S, L), np.int8)
    xperm[col_mat // 1024, src_sub, col_sub.reshape(ntiles_pad, 1024),
          col_lane.reshape(ntiles_pad, 1024)] = (
        src_lane - 128).astype(np.int8)
    if nrows < (1 << 22) and ncols < (1 << 19):
        key = ((tile.astype(np.uint64) << 47)
               | (bucket.astype(np.uint64) << 44)
               | (rr.astype(np.uint64) << 22) | cc.astype(np.uint64))
        order = np.argsort(key, kind="stable")
    else:
        order = np.lexsort((cc, rr, bucket, tile))
    rr, cc, vv = rr[order], cc[order], vv[order]
    tile, bucket = tile[order], bucket[order]

    # ---- chunk/lane assignment: rank within (tile, bucket) ---------------
    grp = (tile << 3) | bucket
    newg = np.ones(nnz, bool)
    if nnz:
        newg[1:] = grp[1:] != grp[:-1]
    gstart = np.nonzero(newg)[0] if nnz else np.zeros(0, np.int64)
    gcount = np.diff(np.concatenate([gstart, [nnz]]))
    rank = np.arange(nnz, dtype=np.int64) - np.repeat(gstart, gcount)
    lane = rank % L
    cit = rank // L                          # chunk-in-tile (per bucket)
    # chunks per tile = max over buckets of ceil(count/128)
    g_tile = (grp[gstart] >> 3) if nnz else np.zeros(0, np.int64)
    ntiles_pad = ncols // 1024
    cpt = np.zeros(ntiles_pad, np.int64)
    if nnz:
        np.maximum.at(cpt, g_tile, (gcount + L - 1) // L)
    tile_base = np.concatenate([[0], np.cumsum(cpt)])
    nca = max(int(tile_base[-1]), 1)
    a_chunk = tile_base[tile] + cit
    chunk_tile = (np.repeat(np.arange(ntiles_pad), cpt).astype(np.int32)
                  if nca > 1 or cpt.sum() else np.zeros(nca, np.int32))
    return _pack_planar_tail(
        rr, cc, vv, order, a_chunk, bucket, lane, chunk_tile, nca,
        xperm, col_lane[cc].astype(np.int8), nrows, ncols, nnz,
        region_rows, nregions, cb, hi_pad, pad_val, keep_el_stream,
        with_sub=False)


def _pack_planar_tail(rr, cc, vv, order, a_chunk, bucket, lane, chunk_tile,
                      nca, xperm, a_r_val, nrows, ncols, nnz, region_rows,
                      nregions, cb, hi_pad, pad_val, keep_el_stream,
                      with_sub):
    """Shared back half of pack_planar: subruns -> deposits -> cursor sim ->
    step balancing -> descriptor/plane/phase-C streams. `bucket` is the
    element's DEST sublane (col bucket for deal="bucket", quota-dealt for
    deal="free"); `a_r_val` the per-element phase-A lane index; `with_sub`
    additionally emits the chained-gather a_sub table from cc."""
    # ---- subruns: contiguous (chunk, sublane, region) ranges -------------
    region = rr // region_rows
    if nnz:
        ns = np.ones(nnz, bool)
        ns[1:] = ((a_chunk[1:] != a_chunk[:-1])
                  | (bucket[1:] != bucket[:-1])
                  | (region[1:] != region[:-1]))
        s_start = np.nonzero(ns)[0]
        s_len = np.diff(np.concatenate([s_start, [nnz]]))
    else:
        s_start = s_len = np.zeros(0, np.int64)
    s_chunk = a_chunk[s_start] if nnz else np.zeros(0, np.int64)
    s_sub = bucket[s_start] if nnz else np.zeros(0, np.int64)
    s_region = region[s_start] if nnz else np.zeros(0, np.int64)
    s_lane0 = lane[s_start] if nnz else np.zeros(0, np.int64)
    nsub = len(s_start)

    # ---- deposits: one per (chunk, region) -------------------------------
    dk = s_chunk * np.int64(nregions) + s_region
    d_order = np.argsort(dk, kind="stable")      # subruns grouped by deposit
    dk_s = dk[d_order]
    ndg = np.ones(nsub, bool)
    if nsub:
        ndg[1:] = dk_s[1:] != dk_s[:-1]
    d_first = np.nonzero(ndg)[0] if nsub else np.zeros(0, np.int64)
    nd = len(d_first)
    d_chunk = dk_s[d_first] // nregions if nd else np.zeros(0, np.int64)
    d_region = dk_s[d_first] % nregions if nd else np.zeros(0, np.int64)
    sub_of_dep = np.repeat(np.arange(nd),
                           np.diff(np.concatenate([d_first, [nsub]])))
    # per-deposit per-sublane lengths
    d_lens = np.zeros((nd, S), np.int64)
    if nsub:
        d_lens[sub_of_dep, s_sub[d_order]] = s_len[d_order]

    # ---- cursor simulation (see simulate_cursors above) -------------------
    # Splitting keeps flushed chunks ~full (no-split flushing measured 50%
    # stream fill on the googleplus stand-in: deposits there are
    # near-chunk-sized, so the accumulator never merged two of them).
    def _simulate(dc, dr, dl):
        return simulate_cursors(dc, dr, dl, nregions)

    # ---- balance chunks across grid steps by EXACT item weight ------------
    # Flushes land in their triggering deposit's step, so rstep (max items
    # per step: the unrolled kernel size AND the plane stream height) and f
    # (max flushes per step: the flush stream width) are both set by the
    # worst step. Pass 1 balances on a heuristic, simulates, and feeds the
    # exact per-chunk item counts (deposit pieces + split flushes) into a
    # second LPT pass.
    if cb is None:
        dpc = nd / max(nca, 1) + 2.0
        cb = int(min(32, max(8, 256 // dpc)))
    nsteps_dep = (nca + cb - 1) // cb
    d_chunk0 = d_chunk                       # pre-balance chunk ids
    if nsteps_dep > 1:
        weight = np.zeros(nca, np.int64)
        np.add.at(weight, d_chunk0, 1)
        weight += np.bincount(a_chunk, minlength=nca) // 512 + 1
        new1 = _balance_chunks(weight, nsteps_dep, cb)
        sim1 = _simulate(new1[d_chunk0], d_region, d_lens)
        items = np.ones(nca, np.int64)
        np.add.at(items, d_chunk0[sim1.ed], np.where(sim1.split, 3, 1))
        new_of_old = _balance_chunks(items, nsteps_dep, cb)
        nca2 = nsteps_dep * cb
        ct = np.zeros(nca2, np.int32)
        ct[new_of_old[:len(chunk_tile)]] = chunk_tile
        chunk_tile = ct
        a_chunk = new_of_old[a_chunk]
        d_chunk = new_of_old[d_chunk0]
    elif len(chunk_tile) < nsteps_dep * cb:
        chunk_tile = np.concatenate(
            [chunk_tile,
             np.zeros(nsteps_dep * cb - len(chunk_tile), np.int32)])

    # deposits execute in (chunk, region) order
    sim = _simulate(d_chunk, d_region, d_lens)
    ed = sim.ed
    d_chunk, d_region, d_lens = sim.dc, sim.dr, sim.dl
    d_dest1, d_part1 = sim.dest1, sim.part1
    d_cyc1, d_cyc2, d_split = sim.cyc1, sim.cyc2, sim.split
    C, cycle = sim.C, sim.cycle
    inv_ed = np.empty(nd, np.int64)
    inv_ed[ed] = np.arange(nd)
    d_step = d_chunk // cb
    drain_regions = np.nonzero(C.any(axis=1))[0]

    # region-chunk (rc) ids: (region, cycle) -> linear
    ncyc = cycle + C.any(axis=1)
    rc_base = np.concatenate([[0], np.cumsum(ncyc)])
    nrc = int(rc_base[-1])

    # ---- descriptor stream layout (phase-ordered, v2) ---------------------
    # Per step the kernel runs ALL deposit pieces (batched under shared
    # any-active guards — one pl.when per descriptor serializes the bodies'
    # latency chains, see io/router_format.py layout v3), THEN all flushes.
    # Each region's cycles rotate through K accumulator slots so a flush
    # never races a same-step deposit of a later cycle; a split deposit's
    # two pieces belong to consecutive cycles and therefore land in
    # different slots.
    n_drain = len(drain_regions)
    drain_per_step = cb + 2
    n_drain_steps = (n_drain + drain_per_step - 1) // drain_per_step
    nsteps = nsteps_dep + n_drain_steps

    # K per region: max distinct cycles touched by one step's deposits + 1
    if nd:
        cyc_span = int(d_cyc2.max()) + 2
        pc_reg = np.concatenate([d_region, d_region[d_split]])
        pc_step = np.concatenate([d_step, d_step[d_split]])
        pc_cyc = np.concatenate([d_cyc1, d_cyc2[d_split]])
        key = ((pc_reg * np.int64(nsteps_dep + 1) + pc_step) * cyc_span
               + pc_cyc)
        uk = np.unique(key)
        urs = uk // cyc_span
        uk2, cnt = np.unique(urs, return_counts=True)
        kmax = np.ones(nregions, np.int64)
        np.maximum.at(kmax, uk2 // np.int64(nsteps_dep + 1), cnt)
        K = kmax + 1
    else:
        K = np.full(nregions, 2, np.int64)
    slot_base = np.concatenate([[0], np.cumsum(K)])
    num_slots = int(slot_base[-1])
    assert num_slots <= 4096, \
        f"rotated accumulator slots exceed the 12-bit field ({num_slots})"

    # deposit pieces in exec order: piece1 of every deposit, then piece2
    # right after for splits (order within the deposit section is free)
    per_dep = np.where(d_split, 2, 1)
    dbase = np.concatenate([[0], np.cumsum(per_dep)[:-1]]) if nd else \
        np.zeros(0, np.int64)
    npc = int(per_dep.sum()) if nd else 0
    pc_step2 = np.zeros(npc, np.int64)
    pc_w1 = np.zeros(npc, np.int64)
    pc_slot = np.zeros(npc, np.int64)
    pc_piece = np.zeros(npc, np.int64)          # 2*dep + piece for planes
    if nd:
        pc_step2[dbase] = d_step
        pc_w1[dbase] = d_chunk % cb
        pc_slot[dbase] = slot_base[d_region] + d_cyc1 % K[d_region]
        pc_piece[dbase] = 2 * np.arange(nd)
        sp = np.nonzero(d_split)[0]
        pc_step2[dbase[sp] + 1] = d_step[sp]
        pc_w1[dbase[sp] + 1] = d_chunk[sp] % cb
        pc_slot[dbase[sp] + 1] = (slot_base[d_region[sp]]
                                  + d_cyc2[sp] % K[d_region[sp]])
        pc_piece[dbase[sp] + 1] = 2 * sp + 1
    dep_counts = (np.bincount(pc_step2, minlength=nsteps)
                  if npc else np.zeros(nsteps, np.int64))
    dstep = max(int(dep_counts.max()) if npc else 0, 1)
    dep_first_of = np.concatenate([[0], np.cumsum(dep_counts)[:-1]])
    p_of = (np.arange(npc) - dep_first_of[pc_step2]) if npc else pc_step2
    dmax = dstep
    pc_w1 = pc_w1 | (p_of << 8)

    # flushes: split flushes in their deposit's step (exec order), drains
    # in trailing steps
    sp = np.nonzero(d_split)[0] if nd else np.zeros(0, np.int64)
    fl_step = np.concatenate([
        d_step[sp],
        nsteps_dep + np.arange(n_drain) // drain_per_step]).astype(np.int64)
    fl_rc = np.concatenate([
        rc_base[d_region[sp]] + d_cyc1[sp],
        rc_base[drain_regions] + cycle[drain_regions]])
    fl_slot = np.concatenate([
        slot_base[d_region[sp]] + d_cyc1[sp] % K[d_region[sp]],
        slot_base[drain_regions]
        + cycle[drain_regions] % K[drain_regions]]) if (
            len(sp) + n_drain) else np.zeros(0, np.int64)
    # fl_step must be non-decreasing for the rank formula: split flushes
    # follow exec order (step-sorted), drains trail
    nf = len(fl_step)
    fl_counts = (np.bincount(fl_step, minlength=nsteps)
                 if nf else np.zeros(nsteps, np.int64))
    f_max = max(int(fl_counts.max()) if nf else 0, 1)
    assert f_max <= 256, f"flush ordinal overflow ({f_max})"
    f = f_max
    fl_first = np.concatenate([[0], np.cumsum(fl_counts)[:-1]])
    q_of = (np.arange(nf) - fl_first[fl_step]) if nf else fl_step

    rstep = dstep + f
    rg = np.zeros((nsteps, rstep, 2), np.int32)
    if npc:
        rg[pc_step2, np.arange(npc) - dep_first_of[pc_step2], 0] = \
            pc_w1.astype(np.int32)
        rg[pc_step2, np.arange(npc) - dep_first_of[pc_step2], 1] = \
            (pc_slot | (1 << 15)).astype(np.int32)
    if nf:
        rg[fl_step, dstep + q_of, 1] = (
            fl_slot | (q_of << 16) | (np.int64(1) << 31)).astype(np.int32)

    # rc -> flush stream position
    c_code = np.full(nsteps * f, -1, np.int32)
    rc_linear = np.zeros(nrc + 1, np.int64)
    if nf:
        rc_linear[fl_rc] = fl_step * f + q_of
        c_code[rc_linear[fl_rc]] = np.searchsorted(
            rc_base, fl_rc, side="right") - 1

    # ---- deposit planes + phase-C streams ---------------------------------
    planes = np.zeros((nsteps, dmax, S, L), np.int8)
    c_hi = np.full((nsteps * f, S, L), hi_pad, np.int8)
    c_lo = np.zeros((nsteps * f, S, L), np.int8)
    if nsub:
        piece_step = np.empty(2 * nd, np.int64)
        piece_slot = np.empty(2 * nd, np.int64)
        piece_step[pc_piece] = pc_step2
        piece_slot[pc_piece] = p_of

        sr_dep = inv_ed[sub_of_dep]              # exec-order deposit ids
        sr_sub = s_sub[d_order]
        sr_len = s_len[d_order]
        sr_lane0 = s_lane0[d_order]
        sr_p1 = np.minimum(d_part1[sr_dep, sr_sub], sr_len)
        sr_dest1 = d_dest1[sr_dep, sr_sub]

        def scatter_planes(lens, src0, dest0, piece_ids):
            keep = lens > 0
            ln, s0, dd = lens[keep], src0[keep], dest0[keep]
            st = piece_step[piece_ids[keep]]
            sl = piece_slot[piece_ids[keep]]
            sb = sr_sub[keep]
            tot = int(ln.sum())
            off = np.arange(tot, dtype=np.int64) - np.repeat(
                np.concatenate([[0], np.cumsum(ln)[:-1]]), ln)
            flat = (np.repeat(st, ln) * (dmax * S * L)
                    + (np.repeat(sl, ln) * S + np.repeat(sb, ln)) * L
                    + np.repeat(dd, ln) + off)
            planes.reshape(-1)[flat] = (
                (np.repeat(s0, ln) + off) - 128).astype(np.int8)

        scatter_planes(sr_p1, sr_lane0, sr_dest1, 2 * sr_dep)
        scatter_planes(sr_len - sr_p1, sr_lane0 + sr_p1,
                       np.zeros(nsub, np.int64), 2 * sr_dep + 1)

        # element stream positions (piece-aware)
        tot = int(sr_len.sum())
        off = np.arange(tot, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(sr_len)[:-1]]), sr_len)
        in1 = off < np.repeat(sr_p1, sr_len)
        pos = np.where(in1, np.repeat(sr_dest1, sr_len) + off,
                       off - np.repeat(sr_p1, sr_len))
        cyc = np.where(in1, np.repeat(d_cyc1[sr_dep], sr_len),
                       np.repeat(d_cyc2[sr_dep], sr_len))
        el_rc = np.repeat(rc_base[d_region[sr_dep]], sr_len) + cyc
        el_stream = (rc_linear[el_rc] * CHUNK
                     + np.repeat(sr_sub, sr_len) * L + pos)
        el_src = np.repeat(s_start[d_order], sr_len) + off
        row_in_reg = (rr[el_src] % region_rows)
        oc, of_ = el_stream // CHUNK, el_stream % CHUNK
        c_hi[oc, of_ // L, of_ % L] = (row_in_reg >> 7).astype(np.int8)
        c_lo[oc, of_ // L, of_ % L] = (row_in_reg & 127).astype(np.int8)
        if keep_el_stream:
            el_stream_orig = np.empty(nnz, np.int64)
            el_stream_orig[order[el_src]] = el_stream

    # ---- A streams --------------------------------------------------------
    ncap = nsteps * cb
    a_r = np.zeros((ncap, S, L), np.int8)
    a_vals = np.full((ncap, S, L), pad_val, np.float32)
    a_page = np.zeros(ncap, np.int32)
    a_r[a_chunk, bucket, lane] = a_r_val
    a_vals[a_chunk, bucket, lane] = vv
    a_page[:len(chunk_tile)] = chunk_tile
    a_sub = None
    if with_sub:
        # chained-gather sublane table: indexed by the SOURCE lane (the
        # composed-gather rule — xp[s, r[s,l]] reads sub at r[s,l]); the
        # quota partition guarantees one source sublane per (chunk, dest
        # sublane, class), so the scatter never writes conflicting values
        a_sub = np.zeros((ncap, S, L), np.int8)
        a_sub[a_chunk, bucket, cc & 127] = ((cc >> 7) & 7).astype(np.int8)
    el_slot = np.empty(nnz, np.int64)
    el_slot[order] = (a_chunk * CHUNK + bucket * L + lane)

    return PlanarSpMVLayout(
        a_r=a_r, xperm=xperm, a_vals=a_vals, a_page=a_page, rg=rg,
        planes=planes,
        c_code=c_code, c_hi=c_hi, c_lo=c_lo,
        num_rows=nrows, num_cols=ncols, nnz=nnz,
        num_col_tiles=ncols // 1024, num_regions=nregions,
        region_rows=region_rows, cb=cb, rstep=rstep, f=f, dmax=dmax,
        nsteps=nsteps, dstep=dstep, num_slots=num_slots,
        fill_a=nnz / max(nca * CHUNK, 1),
        fill_stream=nnz / max(nsteps * f * CHUNK, 1),
        el_slot=el_slot,
        el_stream=(el_stream_orig if keep_el_stream and nnz else None),
        a_sub=a_sub,
    )
