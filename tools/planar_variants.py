#!/usr/bin/env python
"""Host-only evaluation of planar chunk-assignment variants by schedule cost.

The planar SpMV's measured cost model (tools/planar_profile.py, full pokec):
deposits ~119 ns each (scalar-bound), flush reduce ~326 ns (rh=128), phase A
~90 ns/chunk gather+mul, plus streams. Deposit COUNT is the dominant knob.
This script computes, per assignment variant, the deposit/split/chunk counts
and a time estimate — without building the full layout.

Variants:
  rank  (current): within (tile, bucket), lane = rank % 128, chunk = rank//128
        -> each bucket progresses through its own rows independently.
  close : row-ordered greedy close — walk the tile's elements in row order,
        close the chunk when any bucket reaches 128 -> all 8 buckets share
        one row range per chunk (fewer distinct regions per chunk?).
Each is evaluated with and without symmetric degree-sort relabeling.

Usage: python tools/planar_variants.py [graph] [scale]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

DEPOSIT_NS = 119.0
FLUSH_NS = 326.0 + 70.0      # reduce + flush-copy
CHUNK_NS = 90.0              # phase A per chunk
REGION_ROWS = 16384


def eval_assignment(tile, bucket, rr, a_chunk, nca, nregions):
    """Count deposits / splits / flushes for a chunk assignment."""
    region = rr // REGION_ROWS
    # deposits: distinct (chunk, region); subruns: distinct (chunk, bucket,
    # region) contiguous runs — elements arrive (tile,bucket,row)-sorted, so
    # runs == distinct triples as long as element order within a chunk-bucket
    # is row-sorted
    dk = a_chunk * np.int64(nregions) + region
    nd = len(np.unique(dk))
    # flushes ~ region chunk count: ceil(region elements / 1024) (+ splits
    # merge into that); drains = regions present
    reg_elems = np.bincount(region, minlength=nregions)
    nrc = int(np.sum((reg_elems + 1023) // 1024 + (reg_elems > 0) * 0))
    n_drain = int((reg_elems > 0).sum())
    est_ms = (nd * DEPOSIT_NS + (nrc + n_drain) * FLUSH_NS
              + nca * CHUNK_NS) * 1e-6
    return nd, nrc, n_drain, est_ms


def assign_rank(tile, bucket, nnz, ntiles):
    """Current scheme: per (tile,bucket) rank."""
    grp = (tile << 3) | bucket
    order = np.lexsort((np.arange(nnz), grp))  # stable by grp (input already
    # (tile,bucket,row)-sorted, so within grp order = row order)
    g_sorted = grp[order]
    newg = np.ones(nnz, bool)
    newg[1:] = g_sorted[1:] != g_sorted[:-1]
    gstart = np.nonzero(newg)[0]
    gcount = np.diff(np.concatenate([gstart, [nnz]]))
    rank = np.arange(nnz) - np.repeat(gstart, gcount)
    cit = rank // 128
    g_tile = g_sorted[gstart] >> 3
    cpt = np.zeros(ntiles, np.int64)
    np.maximum.at(cpt, g_tile, (gcount + 127) // 128)
    tile_base = np.concatenate([[0], np.cumsum(cpt)])
    a_chunk = np.empty(nnz, np.int64)
    a_chunk[order] = tile_base[g_sorted >> 3] + cit
    return a_chunk, int(tile_base[-1])


def assign_close(tile, bucket, rr, nnz, ntiles):
    """Greedy row-ordered close: elements sorted by (tile, row); a chunk
    closes when any bucket would exceed 128."""
    order = np.lexsort((rr, tile))
    t_s, b_s = tile[order], bucket[order]
    # per-tile walk (vectorized per tile is hard; do a compiled-ish loop
    # over elements in chunks via numpy group trick): simulate per tile
    a_chunk = np.empty(nnz, np.int64)
    nca = 0
    # process tile by tile; per tile: one (8, len) bucket cumsum, then chunk
    # ends found by 8 searchsorteds per chunk (cumsums are nondecreasing)
    tstart = np.searchsorted(t_s, np.arange(ntiles + 1), side="left")
    for t in range(ntiles):
        lo, hi = tstart[t], tstart[t + 1]
        if lo == hi:
            continue
        b = b_s[lo:hi]
        cums = np.cumsum(b[None, :] == np.arange(8)[:, None], axis=1)
        pos = 0
        while pos < hi - lo:
            base = cums[:, pos - 1] if pos else np.zeros(8, np.int64)
            end = min(int(np.searchsorted(cums[k], base[k] + 128,
                                          side="right"))
                      for k in range(8))
            end = max(end, pos + 1)
            a_chunk[order[lo + pos:lo + end]] = nca
            nca += 1
            pos = end
    return a_chunk, nca


def main():
    graph = sys.argv[1] if len(sys.argv) > 1 else "pokec"
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    from graphlily_tpu.io import iccad_standin
    from graphlily_tpu.io.formatter import (util_round_csr_matrix_dim,
                                            symmetric_permute,
                                            degree_sort_permutation)
    csr0 = iccad_standin(graph, scale=scale, seed=1)
    for dsort in (False, True):
        work = csr0.copy()
        if dsort:
            work = symmetric_permute(work, degree_sort_permutation(work))
        util_round_csr_matrix_dim(work, 1024, 1024)
        nnz = work.nnz
        rr = work.row_ids().astype(np.int64)
        cc = work.adj_indices[:nnz].astype(np.int64)
        ntiles = work.num_cols // 1024
        nregions = (work.num_rows + REGION_ROWS - 1) // REGION_ROWS
        tile = cc >> 10

        # bucket = snake-deal sublane (same as pack_planar)
        deg = np.zeros(work.num_cols, np.int64)
        np.add.at(deg, cc, 1)
        dorder = np.argsort(-deg.reshape(ntiles, 1024), axis=1, kind="stable")
        pos = np.empty((ntiles, 1024), np.int64)
        np.put_along_axis(pos, dorder, np.arange(1024)[None, :], axis=1)
        rnd, idx8 = pos // 8, pos % 8
        sub_of_pos = np.where(rnd % 2 == 0, idx8, 7 - idx8)
        bucket = sub_of_pos.reshape(-1)[cc]

        # sort elements by (tile, bucket, row) for rank variant
        key_order = np.lexsort((rr, bucket, tile))
        t2, b2, r2 = tile[key_order], bucket[key_order], rr[key_order]

        t0 = time.perf_counter()
        ch, nca = assign_rank(t2, b2, nnz, ntiles)
        nd, nrc, ndr, est = eval_assignment(t2, b2, r2, ch, nca, nregions)
        print(f"{graph} dsort={dsort} rank : nca={nca} nd={nd} nrc={nrc} "
              f"drains={ndr} est={est:.1f} ms fill={nnz/(nca*1024):.2f} "
              f"({time.perf_counter()-t0:.0f}s)", flush=True)

        t0 = time.perf_counter()
        ch, nca = assign_close(tile, bucket, rr, nnz, ntiles)
        # for eval, need per-element arrays in any order: use original
        nd, nrc, ndr, est = eval_assignment(tile, bucket, rr, ch, nca,
                                            nregions)
        print(f"{graph} dsort={dsort} close: nca={nca} nd={nd} nrc={nrc} "
              f"drains={ndr} est={est:.1f} ms fill={nnz/(nca*1024):.2f} "
              f"({time.perf_counter()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
