#!/usr/bin/env python
"""PERM-C feasibility sim: can the free-deal planar packer guarantee
DISTINCT lo = row & 127 values within every accumulator (region-cycle,
sublane) at acceptable flush fill?

If yes, phase C's (128,128) lo one-hot collapses to ONE hardware gather
through a streamed perm plane and the per-flush VPU build drops ~3x (and
rh can shrink below the MXU dot's 128-row floor, unlocking smaller
region_rows). This sim re-deals sublanes element-wise with full chunk
coupling (claims + A-lane capacity) and compares flush counts/fill against
the same greedy WITHOUT the lo constraint.

Greedy policy per element (exec order: chunk, then region, then row):
  candidates = sublanes where (chunk, s, rho) is unclaimed or claimed by
  this element's sig AND the A-lane count < 128.
  prefer candidates whose current (region, cycle, s) lo-mask misses lo
  and whose cursor < 128; tie-break on lowest cursor (load balance).
  none -> flush the region's accumulator (cycle += 1, new deposit piece).
  still none (claims/A-capacity exhausted) -> spill (deal to a fresh
  spill chunk of the tile, modeled as a deferred element; counted).

Usage: python tools/permc_sim.py [graph] [scale] [region_rows]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

graph = sys.argv[1] if len(sys.argv) > 1 else "pokec"
scale = float(sys.argv[2]) if len(sys.argv) > 2 else 0.0625
rr_arg = int(sys.argv[3]) if len(sys.argv) > 3 else 8192

from graphlily_tpu import EngineConfig
from graphlily_tpu.io import iccad_standin
from graphlily_tpu.io.formatter import util_round_csr_matrix_dim
from graphlily_tpu.io.planar_format import _deal_free, CHUNK
from bench import _prep

S, L = 8, 128
config = EngineConfig(mxu_precision="default")
csr = iccad_standin(graph, scale=scale, seed=1)
work = _prep(csr, config, degree_sort=True)
util_round_csr_matrix_dim(work, 1024, 1024)
nrows, ncols, nnz = work.num_rows, work.num_cols, work.nnz
region_rows = rr_arg
nregions = (nrows + region_rows - 1) // region_rows
print(f"{graph} s{scale}: {nrows} rows {ncols} cols nnz={nnz} "
      f"rr={region_rows} nregions={nregions}", flush=True)

rw = work.row_ids().astype(np.int64)
cc = work.adj_indices[:nnz].astype(np.int64)
vv = work.adj_data[:nnz].astype(np.float32)
ntiles = ncols // 1024

# chunk assignment from the production deal (sublane choice ignored)
t0 = time.time()
order0 = np.lexsort((cc, rw, cc >> 10))
(rw2, cc2, _vv2, _order, a_chunk, _ds, _ln, chunk_tile,
 nca) = _deal_free(rw[order0], cc[order0], vv[order0], order0, nnz,
                   ntiles, region_rows)
print(f"deal_free chunks: nca={nca} ({time.time()-t0:.0f}s)", flush=True)

region = rw2 // region_rows
rho = (cc2 & 127).astype(np.int64)
sig = ((cc2 >> 7) & 7).astype(np.int64)
lo = (rw2 & 127).astype(np.int64)

# exec order: (chunk, region, row)
eo = np.lexsort((rw2, region, a_chunk))
a_chunk, region, rho, sig, lo = (a_chunk[eo], region[eo], rho[eo],
                                 sig[eo], lo[eo])
rowid = rw2[eo]


def simulate(cap: int, depth: int = 1, contiguous: bool = False):
    """cap: max distinct ROWS per (region-cycle, sublane, lo class);
    unlimited copies of an owned row (the kernel's segmented-scan
    pre-reduce merges same-row runs before the perm gathers). cap=0
    disables the constraint (baseline).

    contiguous: a row may only reuse its owned (cycle, sublane) slot while
    it is the LAST row deposited there (one contiguous lane run per row
    per (rc, s)) — what the PERM-C v2 prefix-difference reduce requires
    (seg = P[end] - P[start] represents exactly one run per lo target).

    depth: live cycles per region — a colliding element spills FORWARD
    into cycle c+1..c+depth-1 instead of forcing an early flush (the
    K-rotated accumulator slots already keep several cycles live); cycle
    c flushes only when nothing in the window can take the element."""
    cursor = np.zeros((nregions, depth, S), np.int32)
    lo_owner = np.full((nregions, depth, S, L, max(cap, 1)), -1, np.int64)
    last_row = np.full((nregions, depth, S), -1, np.int64)
    cycles = np.zeros(nregions, np.int64)
    claims = np.full((S, L), -1, np.int8)     # per current chunk
    alane = np.zeros(S, np.int32)             # per current chunk
    cur_chunk = -1
    flush_elems = []                          # elements per drained cycle
    piece_keys = set()                        # distinct planes
    spills = 0
    n = len(a_chunk)
    t0 = time.time()

    def flush(r):
        flush_elems.append(int(cursor[r, 0].sum()))
        cursor[r, :-1] = cursor[r, 1:]
        cursor[r, -1] = 0
        lo_owner[r, :-1] = lo_owner[r, 1:]
        lo_owner[r, -1] = -1
        last_row[r, :-1] = last_row[r, 1:]
        last_row[r, -1] = -1
        cycles[r] += 1

    for i in range(n):
        ch = a_chunk[i]
        if ch != cur_chunk:
            claims.fill(-1)
            alane.fill(0)
            cur_chunk = ch
        r = region[i]
        h = rho[i]
        g = sig[i]
        v = lo[i]
        row = rowid[i]
        for attempt in (0, 1):
            best = (-1, -1)
            best_cur = 1 << 30
            claim_ok = False
            for s in range(S):
                cl = claims[s, h]
                if (cl != -1 and cl != g) or alane[s] >= L:
                    continue
                claim_ok = True
                for d in range(depth):
                    cu = cursor[r, d, s]
                    if cu >= L:
                        continue
                    if cap:
                        own = lo_owner[r, d, s, v]
                        if contiguous:
                            if row in own:
                                if last_row[r, d, s] != row:
                                    continue    # run closed: no reopen
                            elif -1 not in own:
                                continue
                        elif row not in own and -1 not in own:
                            continue
                    # earliest cycle wins; within it, lowest cursor
                    cost = d * 1000 + cu
                    if cost < best_cur:
                        best, best_cur = (d, s), cost
                    break   # earlier cycle always preferred for this s
            d, s = best
            if s >= 0:
                claims[s, h] = g
                alane[s] += 1
                cursor[r, d, s] += 1
                if cap:
                    own = lo_owner[r, d, s, v]
                    if row not in own:
                        own[np.argmax(own == -1)] = row
                    last_row[r, d, s] = row
                piece_keys.add((int(ch) << 40) | (int(r) << 16)
                               | int(cycles[r] + d))
                break
            if attempt == 0 and claim_ok:
                flush(r)
                continue
            spills += 1
            break
        if i and i % 2_000_000 == 0:
            print(f"  {i}/{n} els ({time.time()-t0:.0f}s)", flush=True)
    # drain
    for r in range(nregions):
        for d in range(depth):
            c = int(cursor[r, d].sum())
            if c:
                flush_elems.append(c)
                cycles[r] += 1
    fe = np.array(flush_elems, np.int64)
    placed_n = n - spills
    return dict(flushes=len(fe), fill=placed_n / max(len(fe) * CHUNK, 1),
                fill_p10=float(np.percentile(fe, 10)) / CHUNK if len(fe)
                else 0.0,
                median=float(np.median(fe)) / CHUNK if len(fe) else 0.0,
                pieces=len(piece_keys), spills=spills,
                secs=round(time.time() - t0, 1))


base = simulate(0)
print(f"baseline (cursor-only): {base}", flush=True)
modes = ((1, 1, False), (1, 4, False), (1, 2, True), (1, 4, True),
         (1, 8, True))
for cap, depth, contig in modes:
    perm = simulate(cap, depth, contiguous=contig)
    print(f"perm-c cap={cap} depth={depth} contig={contig}: {perm}",
          flush=True)
    print(f"  flush inflation x{perm['flushes']/max(base['flushes'],1):.3f}"
          f"  piece inflation x{perm['pieces']/max(base['pieces'],1):.3f}",
          flush=True)
