// Native planar-router packer for graphlily_tpu.
//
// Sequential C++ port of io/planar_format.pack_planar (the bucket-binned
// plane-deposit SpMV schedule builder). The numpy packer is fully vectorized
// but allocates dozens of nnz-scale temporaries; on the 1-vCPU benchmark
// host (first-touch ~0.1 GB/s) a 30M-edge graph packs in ~13 minutes. This
// port walks each stage once with preallocated buffers and produces
// BIT-IDENTICAL layouts (tests/test_native_pack.py compares every array).
//
// Counterpart of the reference's host-side formatter role
// (graphlily/io/data_formatter.h), which is likewise native C++ feeding the
// accelerator's static layout.
//
// Protocol (ctypes): two-phase to keep big outputs caller-allocated.
//   h = glt_planar_plan(rows, cols, vals, nnz, nrows, ncols, region_rows,
//                       cb_or_minus1, dims_out[12]) -> handle (0 = fall back)
//   glt_planar_emit(h, a_r, xperm, a_vals, a_page, rg, planes, c_code,
//                   c_hi, c_lo, el_slot)  // also frees the plan
//   glt_planar_abort(h)                   // free without emitting
//
// dims_out: [nsteps, cb, rstep, f, dmax, nregions, nca, ntiles, ncap, nca2]

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <unordered_map>
#include <vector>

namespace {

constexpr int64_t S = 8, L = 128, CHUNK = 1024;

struct PlaneRun {
    int64_t dst;    // flat offset into planes (nsteps, dmax, 8, 128)
    int32_t len;
    int32_t src0;   // first source lane; value written = src0 + k - 128
};

struct PlanarPlan {
    int64_t nnz = 0, ntiles = 0, nregions = 0, region_rows = 0;
    int64_t cb = 0, nsteps = 0, rstep = 0, f = 0, dmax = 0;
    int64_t nca = 0, nca2 = 0, ncap = 0;
    bool deal_free = false;
    // deal="free": per-element a_sub scatter (chained-gather table)
    std::vector<int64_t> e_subidx;
    std::vector<int8_t> e_subval;
    // xperm scatter: one entry per column
    std::vector<int64_t> xp_off;
    std::vector<int8_t> xp_val;
    // per-element (sorted order)
    std::vector<int64_t> e_orig;    // sorted pos -> original nnz index
    std::vector<int64_t> e_slot;    // flat A-stream slot
    std::vector<float> e_val;
    std::vector<int8_t> e_ar;       // col_lane[col] (a_r value)
    std::vector<int64_t> e_stream;  // flat flush-stream position
    std::vector<int16_t> e_rowreg;  // row % region_rows
    // small outputs
    std::vector<int32_t> chunk_tile;          // (nca2,) -> a_page prefix
    std::vector<int64_t> it_pos;              // rg flat slot (step*rstep+slot)
    std::vector<int32_t> it_w1, it_w2;
    std::vector<int64_t> cc_pos;              // c_code positions
    std::vector<int32_t> cc_region;
    std::vector<PlaneRun> plane_runs;
};

// Greedy LPT chunk->step assignment, replicating io/router_format.py
// _balance_chunks exactly (argsort(-weight, stable); heapq pops the
// lexicographically smallest (load, step)). Returns new id per old chunk.
std::vector<int64_t> balance_chunks(const std::vector<int64_t>& weight,
                                    int64_t nsteps, int64_t cb) {
    const int64_t n = (int64_t)weight.size();
    std::vector<int64_t> order(n);
    for (int64_t i = 0; i < n; ++i) order[i] = i;
    std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
        if (weight[a] != weight[b]) return weight[a] > weight[b];
        return a < b;
    });
    using HN = std::pair<int64_t, int64_t>;  // (load, step)
    std::priority_queue<HN, std::vector<HN>, std::greater<HN>> heap;
    for (int64_t s = 0; s < nsteps; ++s) heap.push({0, s});
    std::vector<int64_t> fill(nsteps, 0), out(n);
    for (int64_t k = 0; k < n; ++k) {
        const int64_t ci = order[k];
        auto [w, st] = heap.top();
        heap.pop();
        out[ci] = st * cb + fill[st];
        if (++fill[st] < cb) heap.push({w + weight[ci], st});
    }
    return out;
}

// Per-(region, sublane) cursor simulation, replicating pack_planar's
// _simulate: deposits run in (chunk, region) order; one that would overflow
// any sublane past 128 lanes is split at the boundary (piece1 tops the
// accumulator, a flush drains it, piece2 restarts at lane 0).
struct SimOut {
    std::vector<int64_t> ed;          // exec order (indices into deposits)
    std::vector<std::array<int16_t, 8>> dest1, part1;
    std::vector<int32_t> cyc1, cyc2;
    std::vector<uint8_t> split;
    std::vector<std::array<int16_t, 8>> C;   // final cursors per region
    std::vector<int32_t> cycle;              // final cycle per region
};

SimOut simulate(const std::vector<int64_t>& dc,
                const std::vector<int64_t>& dr,
                const std::vector<std::array<int16_t, 8>>& dl,
                int64_t nregions) {
    const int64_t nd = (int64_t)dc.size();
    SimOut o;
    o.ed.resize(nd);
    for (int64_t i = 0; i < nd; ++i) o.ed[i] = i;
    std::sort(o.ed.begin(), o.ed.end(), [&](int64_t a, int64_t b) {
        if (dc[a] != dc[b]) return dc[a] < dc[b];
        return dr[a] < dr[b];   // (chunk, region) pairs are unique
    });
    o.dest1.resize(nd);
    o.part1.resize(nd);
    o.cyc1.resize(nd);
    o.cyc2.resize(nd);
    o.split.assign(nd, 0);
    o.C.assign(nregions, {});
    o.cycle.assign(nregions, 0);
    for (int64_t k = 0; k < nd; ++k) {
        const int64_t i = o.ed[k];
        const int64_t r = dr[i];
        auto& Cr = o.C[r];
        const auto& lens = dl[i];
        bool over = false;
        for (int s = 0; s < 8; ++s)
            if (Cr[s] + lens[s] > L) { over = true; break; }
        if (over) {
            for (int s = 0; s < 8; ++s) {
                const int16_t p1 = std::min<int16_t>(
                    lens[s], (int16_t)(L - Cr[s]));
                o.dest1[k][s] = Cr[s];
                o.part1[k][s] = p1;
                Cr[s] = lens[s] - p1;
            }
            o.cyc1[k] = o.cycle[r];
            o.split[k] = 1;
            o.cycle[r] += 1;
            o.cyc2[k] = o.cycle[r];
        } else {
            for (int s = 0; s < 8; ++s) {
                o.dest1[k][s] = Cr[s];
                o.part1[k][s] = lens[s];
                Cr[s] = Cr[s] + lens[s];
            }
            o.cyc1[k] = o.cyc2[k] = o.cycle[r];
        }
    }
    return o;
}

std::unordered_map<int64_t, PlanarPlan*>& registry() {
    static std::unordered_map<int64_t, PlanarPlan*> reg;
    return reg;
}
int64_t next_handle() {
    static int64_t h = 0;
    return ++h;
}

int64_t planar_plan_tail(PlanarPlan* P, std::vector<int64_t>& rr_s,
                         std::vector<int64_t>& cc_s,
                         std::vector<int64_t>& e_chunk,
                         std::vector<int16_t>& e_lane,
                         std::vector<int8_t>& e_bsub,
                         std::vector<int32_t>& chunk_tile0,
                         const int8_t* col_lane, int64_t cb_in,
                         int64_t* dims_out) {
    PlanarPlan& p = *P;
    const int64_t nnz = p.nnz, ntiles = p.ntiles, nregions = p.nregions;
    const int64_t region_rows = p.region_rows, nca = p.nca;
    // ---- subruns: contiguous (chunk, sublane, region) ranges -------------
    std::vector<int64_t> s_start, s_chunk, s_region;
    std::vector<int16_t> s_len, s_sub, s_lane0;
    {
        int64_t prev_c = -1, prev_r = -1;
        int32_t prev_b = -1;
        for (int64_t i = 0; i < nnz; ++i) {
            const int64_t reg = rr_s[i] / region_rows;
            const int32_t bk = e_bsub[i];
            if (e_chunk[i] != prev_c || bk != prev_b || reg != prev_r) {
                s_start.push_back(i);
                s_chunk.push_back(e_chunk[i]);
                s_sub.push_back((int16_t)bk);
                s_region.push_back(reg);
                s_lane0.push_back(e_lane[i]);
                s_len.push_back(0);
                prev_c = e_chunk[i];
                prev_b = bk;
                prev_r = reg;
            }
            s_len.back()++;
        }
    }
    const int64_t nsub = (int64_t)s_start.size();

    // ---- deposits: group subruns by (chunk, region) ----------------------
    std::vector<int64_t> d_order(nsub);
    for (int64_t i = 0; i < nsub; ++i) d_order[i] = i;
    std::stable_sort(d_order.begin(), d_order.end(),
                     [&](int64_t a, int64_t b) {
                         const int64_t ka = s_chunk[a] * nregions + s_region[a];
                         const int64_t kb = s_chunk[b] * nregions + s_region[b];
                         return ka < kb;
                     });
    std::vector<int64_t> d_chunk0, d_region;
    std::vector<std::array<int16_t, 8>> d_lens;
    std::vector<int64_t> sub_dep(nsub);   // d_order position -> deposit id
    {
        int64_t prev = -1;
        for (int64_t j = 0; j < nsub; ++j) {
            const int64_t sr = d_order[j];
            const int64_t dk = s_chunk[sr] * nregions + s_region[sr];
            if (dk != prev) {
                d_chunk0.push_back(s_chunk[sr]);
                d_region.push_back(s_region[sr]);
                d_lens.push_back({});
                prev = dk;
            }
            sub_dep[j] = (int64_t)d_chunk0.size() - 1;
            d_lens.back()[s_sub[sr]] = s_len[sr];
        }
    }
    const int64_t nd = (int64_t)d_chunk0.size();

    // ---- cb default + two-pass balance ------------------------------------
    int64_t cb;
    if (cb_in > 0) {
        cb = cb_in;
    } else {
        const double dpc = (double)nd / (double)nca + 2.0;
        cb = (int64_t)std::min(32.0, std::max(8.0, std::floor(256.0 / dpc)));
    }
    p.cb = cb;
    const int64_t nsteps_dep = (nca + cb - 1) / cb;
    std::vector<int64_t> d_chunk = d_chunk0;
    if (nsteps_dep > 1) {
        std::vector<int64_t> weight(nca, 0), elems(nca, 0);
        for (int64_t i = 0; i < nd; ++i) weight[d_chunk0[i]]++;
        for (int64_t i = 0; i < nnz; ++i) elems[e_chunk[i]]++;
        for (int64_t c = 0; c < nca; ++c) weight[c] += elems[c] / 512 + 1;
        auto new1 = balance_chunks(weight, nsteps_dep, cb);
        std::vector<int64_t> dc1(nd);
        for (int64_t i = 0; i < nd; ++i) dc1[i] = new1[d_chunk0[i]];
        SimOut sim1 = simulate(dc1, d_region, d_lens, nregions);
        std::vector<int64_t> items(nca, 1);
        for (int64_t k = 0; k < nd; ++k)
            items[d_chunk0[sim1.ed[k]]] += sim1.split[k] ? 3 : 1;
        auto new_of_old = balance_chunks(items, nsteps_dep, cb);
        p.nca2 = nsteps_dep * cb;
        p.chunk_tile.assign(p.nca2, 0);
        for (int64_t k = 0; k < nca; ++k)
            p.chunk_tile[new_of_old[k]] = chunk_tile0[k];
        for (int64_t i = 0; i < nnz; ++i) e_chunk[i] = new_of_old[e_chunk[i]];
        for (int64_t i = 0; i < nd; ++i) d_chunk[i] = new_of_old[d_chunk0[i]];
    } else {
        p.nca2 = nsteps_dep * cb;
        p.chunk_tile.assign(p.nca2, 0);
        std::copy(chunk_tile0.begin(), chunk_tile0.end(),
                  p.chunk_tile.begin());
    }

    // ---- final simulation --------------------------------------------------
    SimOut sim = simulate(d_chunk, d_region, d_lens, nregions);
    std::vector<int64_t> inv_ed(nd);   // deposit id -> exec position
    for (int64_t k = 0; k < nd; ++k) inv_ed[sim.ed[k]] = k;

    std::vector<int64_t> drain_regions;
    for (int64_t r = 0; r < nregions; ++r) {
        bool any = false;
        for (int s = 0; s < 8; ++s)
            if (sim.C[r][s]) { any = true; break; }
        if (any) drain_regions.push_back(r);
    }
    const int64_t n_drain = (int64_t)drain_regions.size();
    const int64_t drain_per_step = cb + 2;
    const int64_t n_drain_steps =
        (n_drain + drain_per_step - 1) / drain_per_step;
    const int64_t nsteps = nsteps_dep + n_drain_steps;
    p.nsteps = nsteps;

    // region-chunk linear ids
    std::vector<int64_t> rc_base(nregions + 1, 0);
    for (int64_t r = 0; r < nregions; ++r) {
        bool any = false;
        for (int s = 0; s < 8; ++s)
            if (sim.C[r][s]) { any = true; break; }
        rc_base[r + 1] = rc_base[r] + sim.cycle[r] + (any ? 1 : 0);
    }
    const int64_t nrc = rc_base[nregions];

    // ---- K-rotated accumulator slots (phase-ordered stream) --------------
    // mirrors io/planar_format.py: per region, cycles rotate through K
    // slots so one step's flushes can all run after its (guard-batched)
    // deposits; a split's two pieces are consecutive cycles
    std::vector<int64_t> K(nregions, 2);
    if (nd) {
        int64_t cyc_max = 0;
        for (int64_t k = 0; k < nd; ++k)
            cyc_max = std::max<int64_t>(cyc_max, sim.cyc2[k]);
        const int64_t cspan = cyc_max + 2;
        std::vector<int64_t> trip;
        trip.reserve(2 * nd);
        for (int64_t k = 0; k < nd; ++k) {
            const int64_t i = sim.ed[k];
            const int64_t step = d_chunk[i] / cb;
            const int64_t rs = d_region[i] * (nsteps_dep + 1) + step;
            trip.push_back(rs * cspan + sim.cyc1[k]);
            if (sim.split[k]) trip.push_back(rs * cspan + sim.cyc2[k]);
        }
        std::sort(trip.begin(), trip.end());
        trip.erase(std::unique(trip.begin(), trip.end()), trip.end());
        std::vector<int64_t> kmax(nregions, 1);
        for (size_t k = 0; k < trip.size();) {
            const int64_t rs = trip[k] / cspan;
            size_t j = k;
            while (j < trip.size() && trip[j] / cspan == rs) ++j;
            const int64_t r = rs / (nsteps_dep + 1);
            kmax[r] = std::max<int64_t>(kmax[r], (int64_t)(j - k));
            k = j;
        }
        for (int64_t r = 0; r < nregions; ++r) K[r] = kmax[r] + 1;
    }
    std::vector<int64_t> slot_base(nregions + 1, 0);
    for (int64_t r = 0; r < nregions; ++r)
        slot_base[r + 1] = slot_base[r] + K[r];
    const int64_t num_slots = slot_base[nregions];
    if (num_slots > 4096) {
        delete P;
        return 0;
    }

    // ---- descriptor items: deposits first (rank == plane ordinal),
    // flushes at the step tail ----------------------------------------------
    std::vector<int32_t> dep_cnt(nsteps, 0), q_cnt(nsteps, 0);
    // piece id (2*exec_dep [+1]) -> (step, plane ordinal)
    std::vector<int64_t> piece_step(2 * nd, -1), piece_slot(2 * nd, -1);
    std::vector<int64_t> fl_rc, fl_step;   // per flush item
    std::vector<int32_t> fl_q, fl_region, fl_slot12;
    std::vector<int64_t> dp_step, dp_rank;
    std::vector<int32_t> dp_w1, dp_w2;
    dp_step.reserve(2 * nd);
    dp_rank.reserve(2 * nd);
    dp_w1.reserve(2 * nd);
    dp_w2.reserve(2 * nd);
    for (int64_t k = 0; k < nd; ++k) {
        const int64_t i = sim.ed[k];
        const int64_t step = d_chunk[i] / cb;
        const int64_t reg = d_region[i];
        // piece 1
        int64_t pp = dep_cnt[step]++;
        piece_step[2 * k] = step;
        piece_slot[2 * k] = pp;
        dp_step.push_back(step);
        dp_rank.push_back(pp);
        dp_w1.push_back((int32_t)((d_chunk[i] % cb) | (pp << 8)));
        dp_w2.push_back((int32_t)((slot_base[reg] + sim.cyc1[k] % K[reg])
                                  | (1 << 15)));
        if (sim.split[k]) {
            // flush of cycle cyc1 (step tail)
            const int32_t q = q_cnt[step]++;
            fl_rc.push_back(rc_base[reg] + sim.cyc1[k]);
            fl_step.push_back(step);
            fl_q.push_back(q);
            fl_region.push_back((int32_t)reg);
            fl_slot12.push_back(
                (int32_t)(slot_base[reg] + sim.cyc1[k] % K[reg]));
            // piece 2 (next cycle -> different rotated slot)
            pp = dep_cnt[step]++;
            piece_step[2 * k + 1] = step;
            piece_slot[2 * k + 1] = pp;
            dp_step.push_back(step);
            dp_rank.push_back(pp);
            dp_w1.push_back((int32_t)((d_chunk[i] % cb) | (pp << 8)));
            dp_w2.push_back((int32_t)((slot_base[reg]
                                       + sim.cyc2[k] % K[reg]) | (1 << 15)));
        }
    }
    for (int64_t k = 0; k < n_drain; ++k) {
        const int64_t step = nsteps_dep + k / drain_per_step;
        const int64_t reg = drain_regions[k];
        const int32_t q = q_cnt[step]++;
        fl_rc.push_back(rc_base[reg] + sim.cycle[reg]);
        fl_step.push_back(step);
        fl_q.push_back(q);
        fl_region.push_back((int32_t)reg);
        fl_slot12.push_back(
            (int32_t)(slot_base[reg] + sim.cycle[reg] % K[reg]));
    }
    int64_t dstep = 1, f = 1;
    for (int64_t st = 0; st < nsteps; ++st) {
        dstep = std::max<int64_t>(dstep, dep_cnt[st]);
        f = std::max<int64_t>(f, q_cnt[st]);
    }
    if (f > 256) {   // flush ordinal overflow: fall back to the numpy
        delete P;    // packer, whose assert raises the documented error
        return 0;
    }
    const int64_t rstep = dstep + f;
    const int64_t dmax = dstep;
    p.rstep = rstep;
    p.f = f;
    p.dmax = dmax;
    p.ncap = nsteps * cb;

    // finalize rg entries (flush w2 needs the sign bit)
    const int64_t ndp2 = (int64_t)dp_step.size();
    const int64_t nfl0 = (int64_t)fl_rc.size();
    p.it_pos.resize(ndp2 + nfl0);
    p.it_w1.resize(ndp2 + nfl0);
    p.it_w2.resize(ndp2 + nfl0);
    for (int64_t k = 0; k < ndp2; ++k) {
        p.it_pos[k] = dp_step[k] * rstep + dp_rank[k];
        p.it_w1[k] = dp_w1[k];
        p.it_w2[k] = dp_w2[k];
    }
    for (int64_t k = 0; k < nfl0; ++k) {
        p.it_pos[ndp2 + k] = fl_step[k] * rstep + dstep + fl_q[k];
        p.it_w1[ndp2 + k] = 0;
        p.it_w2[ndp2 + k] = (int32_t)(fl_slot12[k]
                                      | ((int64_t)fl_q[k] << 16)
                                      | (int64_t)0x80000000);
    }

    // rc -> flush stream position; c_code entries
    std::vector<int64_t> rc_linear(nrc + 1, 0);
    const int64_t nfl = (int64_t)fl_rc.size();
    p.cc_pos.resize(nfl);
    p.cc_region.resize(nfl);
    for (int64_t k = 0; k < nfl; ++k) {
        const int64_t pos = fl_step[k] * f + fl_q[k];
        rc_linear[fl_rc[k]] = pos;
        p.cc_pos[k] = pos;
        p.cc_region[k] = fl_region[k];
    }

    // ---- deposit planes + element stream positions ------------------------
    p.plane_runs.reserve(nsub * 2);
    p.e_stream.resize(nnz);
    p.e_rowreg.resize(nnz);
    for (int64_t j = 0; j < nsub; ++j) {
        const int64_t sr = d_order[j];
        const int64_t dep = inv_ed[sub_dep[j]];
        const int32_t sub = s_sub[sr];
        const int64_t len = s_len[sr];
        const int64_t lane0 = s_lane0[sr];
        const int64_t p1 =
            std::min<int64_t>(sim.part1[dep][sub], len);
        const int64_t dest1 = sim.dest1[dep][sub];
        if (p1 > 0) {
            const int64_t st = piece_step[2 * dep], sl = piece_slot[2 * dep];
            p.plane_runs.push_back(
                {((st * dmax + sl) * S + sub) * L + dest1, (int32_t)p1,
                 (int32_t)lane0});
        }
        if (len - p1 > 0) {
            const int64_t st = piece_step[2 * dep + 1],
                          sl = piece_slot[2 * dep + 1];
            p.plane_runs.push_back(
                {((st * dmax + sl) * S + sub) * L + 0, (int32_t)(len - p1),
                 (int32_t)(lane0 + p1)});
        }
        const int64_t base1 =
            rc_linear[rc_base[d_region[sub_dep[j]]] + sim.cyc1[dep]];
        const int64_t base2 =
            rc_linear[rc_base[d_region[sub_dep[j]]] + sim.cyc2[dep]];
        const int64_t el0 = s_start[sr];
        for (int64_t off = 0; off < len; ++off) {
            const int64_t pos = (off < p1) ? dest1 + off : off - p1;
            const int64_t base = (off < p1) ? base1 : base2;
            p.e_stream[el0 + off] = base * CHUNK + sub * L + pos;
            p.e_rowreg[el0 + off] = (int16_t)(rr_s[el0 + off] % region_rows);
        }
    }

    // ---- A-stream slots ----------------------------------------------------
    p.e_slot.resize(nnz);
    p.e_ar.resize(nnz);
    for (int64_t i = 0; i < nnz; ++i) {
        const int32_t bk = e_bsub[i];
        p.e_slot[i] = e_chunk[i] * CHUNK + (int64_t)bk * L + e_lane[i];
        p.e_ar[i] = col_lane ? col_lane[cc_s[i]]
                             : (int8_t)(cc_s[i] & 127);
    }

    if (p.deal_free) {
        p.e_subidx.resize(nnz);
        p.e_subval.resize(nnz);
        for (int64_t i = 0; i < nnz; ++i) {
            p.e_subidx[i] = e_chunk[i] * CHUNK + (int64_t)e_bsub[i] * L
                            + (cc_s[i] & 127);
            p.e_subval[i] = (int8_t)((cc_s[i] >> 7) & 7);
        }
    }
    dims_out[0] = nsteps;
    dims_out[1] = cb;
    dims_out[2] = rstep;
    dims_out[3] = f;
    dims_out[4] = dmax;
    dims_out[5] = nregions;
    dims_out[6] = nca;
    dims_out[7] = ntiles;
    dims_out[8] = p.ncap;
    dims_out[9] = p.nca2;
    dims_out[10] = dstep;
    dims_out[11] = num_slots;
    const int64_t h = next_handle();
    registry()[h] = P;
    return h;
}

}  // namespace

extern "C" {

int64_t glt_planar_plan(const int64_t* rr_in, const int64_t* cc_in,
                        const float* vv_in, int64_t nnz, int64_t nrows,
                        int64_t ncols, int64_t region_rows, int64_t cb_in,
                        int64_t* dims_out, int64_t deal_free) {
    if (nnz <= 0 || nrows % 1024 || ncols % 1024 || region_rows % 128)
        return 0;
    const int64_t ntiles = ncols / 1024;
    const int64_t nregions = (nrows + region_rows - 1) / region_rows;

    auto* P = new PlanarPlan();
    PlanarPlan& p = *P;
    p.nnz = nnz;
    p.ntiles = ntiles;
    p.nregions = nregions;
    p.region_rows = region_rows;
    p.deal_free = deal_free != 0;

    if (deal_free) {
        // ---- deal="free" front-end (port of planar_format._deal_free):
        // elements sorted (tile, row, col); dest sublanes quota-dealt per
        // (chunk, class) by D'Hondt with per-(class, chunk) rotation;
        // sublane overflow spills into fresh per-tile chunks ---------------
        // counting sort by tile (CSR order is (row, col)-sorted, so within
        // each tile segment the order is already (row, col))
        std::vector<int64_t> tcnt(ntiles + 1, 0);
        for (int64_t i = 0; i < nnz; ++i) tcnt[(cc_in[i] >> 10) + 1]++;
        for (int64_t t = 0; t < ntiles; ++t) tcnt[t + 1] += tcnt[t];
        p.e_orig.resize(nnz);
        {
            std::vector<int64_t> cur(tcnt.begin(), tcnt.end() - 1);
            for (int64_t i = 0; i < nnz; ++i)
                p.e_orig[cur[cc_in[i] >> 10]++] = i;
        }
        std::vector<int64_t> rr_s(nnz), cc_s(nnz);
        p.e_val.resize(nnz);
        for (int64_t i = 0; i < nnz; ++i) {
            const int64_t o = p.e_orig[i];
            rr_s[i] = rr_in[o];
            cc_s[i] = cc_in[o];
            p.e_val[i] = vv_in[o];
        }
        for (int64_t t = 0; t < ntiles; ++t) {     // re-sort if non-CSR input
            const int64_t lo = tcnt[t], hi = tcnt[t + 1];
            bool ok = true;
            for (int64_t i = lo + 1; i < hi; ++i)
                if (rr_s[i] < rr_s[i - 1] ||
                    (rr_s[i] == rr_s[i - 1] && cc_s[i] < cc_s[i - 1])) {
                    ok = false;
                    break;
                }
            if (ok) continue;
            std::vector<int64_t> seg(hi - lo);
            for (int64_t i = 0; i < hi - lo; ++i) seg[i] = lo + i;
            std::stable_sort(seg.begin(), seg.end(),
                             [&](int64_t a, int64_t b) {
                                 if (rr_s[a] != rr_s[b])
                                     return rr_s[a] < rr_s[b];
                                 return cc_s[a] < cc_s[b];
                             });
            std::vector<int64_t> t64(hi - lo);
            std::vector<float> tf(hi - lo);
            auto perm = [&](std::vector<int64_t>& a) {
                for (int64_t i = 0; i < hi - lo; ++i) t64[i] = a[seg[i]];
                std::copy(t64.begin(), t64.end(), a.begin() + lo);
            };
            perm(rr_s);
            perm(cc_s);
            perm(p.e_orig);
            for (int64_t i = 0; i < hi - lo; ++i) tf[i] = p.e_val[seg[i]];
            std::copy(tf.begin(), tf.end(), p.e_val.begin() + lo);
        }

        // ---- spill rounds ------------------------------------------------
        std::vector<int64_t> e_rchunk(nnz);    // round-local chunk id
        std::vector<int8_t> e_sub(nnz);
        std::vector<int32_t> e_round(nnz, 0);
        std::vector<std::vector<int64_t>> round_cpt;   // per round, per tile
        std::vector<int64_t> pend(nnz);
        for (int64_t i = 0; i < nnz; ++i) pend[i] = i;
        int round_no = 0;
        while (!pend.empty()) {
            if (round_no >= 16) { delete P; return 0; }
            const int64_t np_ = (int64_t)pend.size();
            // chunks: rank windows per tile over pend
            std::vector<int64_t> rcpt(ntiles, 0), rtc(ntiles, 0);
            for (int64_t j = 0; j < np_; ++j) rtc[cc_s[pend[j]] >> 10]++;
            for (int64_t t = 0; t < ntiles; ++t)
                rcpt[t] = (rtc[t] + CHUNK - 1) / CHUNK;
            std::vector<int64_t> rbase(ntiles + 1, 0);
            for (int64_t t = 0; t < ntiles; ++t)
                rbase[t + 1] = rbase[t] + rcpt[t];
            const int64_t ncr = std::max<int64_t>(rbase[ntiles], 1);
            std::vector<int64_t> ch(np_);
            {
                std::vector<int64_t> seen(ntiles, 0);
                for (int64_t j = 0; j < np_; ++j) {
                    const int64_t t = cc_s[pend[j]] >> 10;
                    ch[j] = rbase[t] + seen[t]++ / CHUNK;
                }
            }
            // counts per (chunk, class, sigma) + D'Hondt quotas
            std::vector<int16_t> M(ncr * L * 8, 0);
            for (int64_t j = 0; j < np_; ++j) {
                const int64_t c = cc_s[pend[j]];
                M[(ch[j] * L + (c & 127)) * 8 + ((c >> 7) & 7)]++;
            }
            std::vector<int8_t> q(ncr * L * 8, 0), cum(ncr * L * 8, 0);
            for (int64_t cell = 0; cell < ncr * L; ++cell) {
                const int16_t* m = &M[cell * 8];
                int8_t* qq = &q[cell * 8];
                int navail = 8;
                bool any = false;
                for (int s = 0; s < 8; ++s)
                    if (m[s]) { qq[s] = 1; navail--; any = true; }
                if (!any) continue;
                for (int it = 0; it < 7 && navail > 0; ++it) {
                    int best = 0;
                    double bscore = -1.0;
                    for (int s = 0; s < 8; ++s) {
                        const double sc =
                            m[s] ? (double)m[s] / (double)qq[s] : -1.0;
                        if (sc > bscore) { bscore = sc; best = s; }
                    }
                    qq[best]++;
                    navail--;
                }
                int8_t acc = 0;
                for (int s = 0; s < 8; ++s) {
                    cum[cell * 8 + s] = acc;
                    acc += qq[s];
                }
            }
            // deal + per-(chunk, sublane) capacity check
            std::vector<int32_t> kk(ncr * L * 8, 0);
            std::vector<int16_t> load(ncr * 8, 0);
            std::vector<int64_t> spill;
            for (int64_t j = 0; j < np_; ++j) {
                const int64_t e = pend[j];
                const int64_t c = cc_s[e];
                const int64_t rho = c & 127, sig = (c >> 7) & 7;
                const int64_t cell = ch[j] * L + rho;
                const int32_t k = kk[cell * 8 + sig]++;
                const int8_t qe = q[cell * 8 + sig];
                const int64_t s = (5 * rho + 3 * ch[j]
                                   + cum[cell * 8 + sig]
                                   + k % (qe > 0 ? qe : 1)) % 8;
                if (load[ch[j] * 8 + s] >= L) {
                    spill.push_back(e);
                    continue;
                }
                load[ch[j] * 8 + s]++;
                e_rchunk[e] = ch[j];
                e_sub[e] = (int8_t)s;
                e_round[e] = round_no;
            }
            round_cpt.push_back(std::move(rcpt));
            pend = std::move(spill);
            round_no++;
        }
        // ---- global chunk renumbering (per tile: rounds in order) --------
        const int nrounds = (int)round_cpt.size();
        std::vector<int64_t> cpt(ntiles, 0);
        for (int r = 0; r < nrounds; ++r)
            for (int64_t t = 0; t < ntiles; ++t) cpt[t] += round_cpt[r][t];
        std::vector<int64_t> tile_base(ntiles + 1, 0);
        for (int64_t t = 0; t < ntiles; ++t)
            tile_base[t + 1] = tile_base[t] + cpt[t];
        const int64_t nca = std::max<int64_t>(tile_base[ntiles], 1);
        // round-local bases + per-(round, tile) offsets within the tile
        std::vector<std::vector<int64_t>> rb0(nrounds), roff(nrounds);
        {
            std::vector<int64_t> run(ntiles, 0);
            for (int r = 0; r < nrounds; ++r) {
                rb0[r].assign(ntiles + 1, 0);
                roff[r].assign(ntiles, 0);
                for (int64_t t = 0; t < ntiles; ++t) {
                    rb0[r][t + 1] = rb0[r][t] + round_cpt[r][t];
                    roff[r][t] = run[t];
                    run[t] += round_cpt[r][t];
                }
            }
        }
        std::vector<int64_t> e_chunk(nnz);
        for (int64_t i = 0; i < nnz; ++i) {
            const int64_t t = cc_s[i] >> 10;
            const int r = e_round[i];
            e_chunk[i] = tile_base[t] + roff[r][t]
                         + (e_rchunk[i] - rb0[r][t]);
        }
        // ---- final element order: (chunk, dest sublane, row, prior) ------
        std::vector<int64_t> ordf(nnz);
        for (int64_t i = 0; i < nnz; ++i) ordf[i] = i;
        std::stable_sort(ordf.begin(), ordf.end(),
                         [&](int64_t a, int64_t b) {
                             if (e_chunk[a] != e_chunk[b])
                                 return e_chunk[a] < e_chunk[b];
                             if (e_sub[a] != e_sub[b])
                                 return e_sub[a] < e_sub[b];
                             return rr_s[a] < rr_s[b];
                         });
        {   // apply ordf to every per-element array
            std::vector<int64_t> t64(nnz);
            auto perm = [&](std::vector<int64_t>& a) {
                for (int64_t i = 0; i < nnz; ++i) t64[i] = a[ordf[i]];
                a.swap(t64);
            };
            perm(rr_s);
            perm(cc_s);
            perm(p.e_orig);
            perm(e_chunk);
            std::vector<float> tf(nnz);
            for (int64_t i = 0; i < nnz; ++i) tf[i] = p.e_val[ordf[i]];
            p.e_val.swap(tf);
            std::vector<int8_t> t8(nnz);
            for (int64_t i = 0; i < nnz; ++i) t8[i] = e_sub[ordf[i]];
            e_sub.swap(t8);
        }
        std::vector<int16_t> e_lane(nnz);
        {
            int64_t prev = -1;
            int16_t run = 0;
            for (int64_t i = 0; i < nnz; ++i) {
                const int64_t key = e_chunk[i] * 8 + e_sub[i];
                run = (key == prev) ? (int16_t)(run + 1) : (int16_t)0;
                e_lane[i] = run;
                prev = key;
            }
        }
        std::vector<int32_t> chunk_tile0(nca, 0);
        for (int64_t t = 0; t < ntiles; ++t)
            for (int64_t k = tile_base[t]; k < tile_base[t + 1]; ++k)
                chunk_tile0[k] = (int32_t)t;
        p.nca = nca;
        return planar_plan_tail(P, rr_s, cc_s, e_chunk, e_lane, e_sub,
                                chunk_tile0, nullptr, cb_in, dims_out);
    }

    // ---- per-tile column re-layout (degree snake deal) + xperm -----------
    std::vector<int32_t> deg(ncols, 0);
    for (int64_t i = 0; i < nnz; ++i) deg[cc_in[i]]++;
    std::vector<int8_t> col_sub(ncols), col_lane(ncols);
    {
        std::vector<int32_t> idx(1024), pos(1024);
        p.xp_off.resize(ncols);
        p.xp_val.resize(ncols);
        for (int64_t t = 0; t < ntiles; ++t) {
            const int32_t* d = deg.data() + t * 1024;
            for (int32_t k = 0; k < 1024; ++k) idx[k] = k;
            std::sort(idx.begin(), idx.end(), [&](int32_t a, int32_t b) {
                if (d[a] != d[b]) return d[a] > d[b];
                return a < b;   // == numpy stable argsort of -deg
            });
            for (int32_t k = 0; k < 1024; ++k) pos[idx[k]] = k;
            for (int32_t k = 0; k < 1024; ++k) {
                const int32_t rnd = pos[k] / 8, i8 = pos[k] % 8;
                const int8_t sub = (rnd % 2 == 0) ? (int8_t)i8
                                                  : (int8_t)(7 - i8);
                const int8_t lane = (int8_t)rnd;
                const int64_t col = t * 1024 + k;
                col_sub[col] = sub;
                col_lane[col] = lane;
                const int64_t ssub = k >> 7, slane = k & 127;
                p.xp_off[col] = (((t * S + ssub) * S + sub) * L + lane);
                p.xp_val[col] = (int8_t)(slane - 128);
            }
        }
    }

    // ---- stable sort elements by (tile, bucket, rr, cc) -------------------
    // counting sort on (tile*8 + bucket) is stable; the input is CSR order
    // (sorted by (row, col) for canonical matrices), which makes each
    // segment already (rr, cc)-sorted — verified, re-sorted only if not.
    const int64_t ngrp = ntiles * 8;
    std::vector<int64_t> gcnt(ngrp + 1, 0);
    std::vector<int32_t> ebucket(nnz);
    for (int64_t i = 0; i < nnz; ++i) {
        const int64_t tile = cc_in[i] >> 10;
        const int32_t b = col_sub[cc_in[i]];
        ebucket[i] = (int32_t)(tile * 8 + b);
        gcnt[ebucket[i] + 1]++;
    }
    for (int64_t g = 0; g < ngrp; ++g) gcnt[g + 1] += gcnt[g];
    p.e_orig.resize(nnz);
    {
        std::vector<int64_t> cur(gcnt.begin(), gcnt.end() - 1);
        for (int64_t i = 0; i < nnz; ++i) p.e_orig[cur[ebucket[i]]++] = i;
    }
    std::vector<int64_t> rr_s(nnz), cc_s(nnz);
    p.e_val.resize(nnz);
    for (int64_t i = 0; i < nnz; ++i) {
        const int64_t o = p.e_orig[i];
        rr_s[i] = rr_in[o];
        cc_s[i] = cc_in[o];
        p.e_val[i] = vv_in[o];
    }
    for (int64_t g = 0; g < ngrp; ++g) {
        const int64_t lo = gcnt[g], hi = gcnt[g + 1];
        bool sorted = true;
        for (int64_t i = lo + 1; i < hi; ++i)
            if (rr_s[i] < rr_s[i - 1] ||
                (rr_s[i] == rr_s[i - 1] && cc_s[i] < cc_s[i - 1])) {
                sorted = false;
                break;
            }
        if (sorted) continue;
        std::vector<int64_t> seg(hi - lo);
        for (int64_t i = 0; i < hi - lo; ++i) seg[i] = i;
        std::stable_sort(seg.begin(), seg.end(), [&](int64_t a, int64_t b) {
            if (rr_s[lo + a] != rr_s[lo + b]) return rr_s[lo + a] < rr_s[lo + b];
            return cc_s[lo + a] < cc_s[lo + b];
        });
        std::vector<int64_t> t64(hi - lo);
        std::vector<float> tf(hi - lo);
        auto perm64 = [&](std::vector<int64_t>& a) {
            for (int64_t i = 0; i < hi - lo; ++i) t64[i] = a[lo + seg[i]];
            std::copy(t64.begin(), t64.end(), a.begin() + lo);
        };
        perm64(rr_s);
        perm64(cc_s);
        perm64(p.e_orig);
        for (int64_t i = 0; i < hi - lo; ++i) tf[i] = p.e_val[lo + seg[i]];
        std::copy(tf.begin(), tf.end(), p.e_val.begin() + lo);
    }

    // ---- chunk/lane assignment ------------------------------------------
    std::vector<int64_t> cpt(ntiles, 0);
    for (int64_t g = 0; g < ngrp; ++g) {
        const int64_t cnt = gcnt[g + 1] - gcnt[g];
        if (cnt)
            cpt[g / 8] = std::max(cpt[g / 8], (cnt + L - 1) / L);
    }
    std::vector<int64_t> tile_base(ntiles + 1, 0);
    for (int64_t t = 0; t < ntiles; ++t)
        tile_base[t + 1] = tile_base[t] + cpt[t];
    const int64_t nca = std::max<int64_t>(tile_base[ntiles], 1);
    p.nca = nca;
    std::vector<int64_t> e_chunk(nnz);   // pre-balance A-chunk per element
    std::vector<int16_t> e_lane(nnz);
    for (int64_t g = 0; g < ngrp; ++g) {
        const int64_t lo = gcnt[g], hi = gcnt[g + 1];
        const int64_t base = tile_base[g / 8];
        for (int64_t i = lo; i < hi; ++i) {
            const int64_t rank = i - lo;
            e_chunk[i] = base + rank / L;
            e_lane[i] = (int16_t)(rank % L);
        }
    }
    std::vector<int32_t> chunk_tile0(nca, 0);
    for (int64_t t = 0; t < ntiles; ++t)
        for (int64_t k = tile_base[t]; k < tile_base[t + 1]; ++k)
            chunk_tile0[k] = (int32_t)t;

    std::vector<int8_t> e_bsub(nnz);
    for (int64_t i = 0; i < nnz; ++i) e_bsub[i] = col_sub[cc_s[i]];
    return planar_plan_tail(P, rr_s, cc_s, e_chunk, e_lane, e_bsub,
                            chunk_tile0, col_lane.data(), cb_in, dims_out);
}

void glt_planar_emit(int64_t handle, int8_t* a_r, int8_t* xperm,
                     float* a_vals, int32_t* a_page, int32_t* rg,
                     int8_t* planes, int32_t* c_code, int8_t* c_hi,
                     int8_t* c_lo, int64_t* el_slot, int8_t* a_sub) {
    auto it = registry().find(handle);
    if (it == registry().end()) return;
    PlanarPlan& p = *it->second;
    for (size_t c = 0; c < p.xp_off.size(); ++c)
        xperm[p.xp_off[c]] = p.xp_val[c];
    if (a_sub != nullptr)
        for (int64_t i = 0; i < (int64_t)p.e_subidx.size(); ++i)
            a_sub[p.e_subidx[i]] = p.e_subval[i];
    for (int64_t i = 0; i < p.nnz; ++i) {
        const int64_t slot = p.e_slot[i];
        a_r[slot] = p.e_ar[i];
        a_vals[slot] = p.e_val[i];
        el_slot[p.e_orig[i]] = slot;
        const int64_t sp = p.e_stream[i];
        c_hi[sp] = (int8_t)(p.e_rowreg[i] >> 7);
        c_lo[sp] = (int8_t)(p.e_rowreg[i] & 127);
    }
    for (int64_t i = 0; i < p.nca2; ++i) a_page[i] = p.chunk_tile[i];
    for (size_t k = 0; k < p.it_pos.size(); ++k) {
        rg[p.it_pos[k] * 2] = p.it_w1[k];
        rg[p.it_pos[k] * 2 + 1] = p.it_w2[k];
    }
    for (size_t k = 0; k < p.cc_pos.size(); ++k)
        c_code[p.cc_pos[k]] = p.cc_region[k];
    for (const auto& run : p.plane_runs)
        for (int32_t k = 0; k < run.len; ++k)
            planes[run.dst + k] = (int8_t)(run.src0 + k - 128);
    delete it->second;
    registry().erase(it);
}

void glt_planar_abort(int64_t handle) {
    auto it = registry().find(handle);
    if (it != registry().end()) {
        delete it->second;
        registry().erase(it);
    }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Range/roll router packer: C++ port of io/router_format.pack_router (the
// page-chunk + range-deposit schedule builder). Same two-phase protocol and
// bit-exactness contract as the planar packer above.
// dims_out: [nsteps, cb, rstep, f, nregions, nca, ncap, nca2]
// ---------------------------------------------------------------------------

namespace {

struct RouterPlan {
    int64_t nnz = 0, nregions = 0, region_rows = 0;
    int64_t cb = 0, nsteps = 0, rstep = 0, f = 0;
    int64_t nca = 0, nca2 = 0, ncap = 0;
    // per-element (sorted order)
    std::vector<int64_t> e_orig, e_slot, e_stream;
    std::vector<float> e_val;
    std::vector<int8_t> e_ar;       // col & 127
    std::vector<int16_t> e_rowreg;
    std::vector<int32_t> chunk_page;          // (nca2,)
    std::vector<int64_t> it_pos;
    std::vector<int32_t> it_w1, it_w2;
    std::vector<int64_t> cc_pos;
    std::vector<int32_t> cc_region;
};

std::unordered_map<int64_t, RouterPlan*>& rregistry() {
    static std::unordered_map<int64_t, RouterPlan*> reg;
    return reg;
}

}  // namespace

extern "C" {

int64_t glt_router_plan(const int64_t* rr_in, const int64_t* cc_in,
                        const float* vv_in, int64_t nnz, int64_t nrows,
                        int64_t ncols, int64_t region_rows, int64_t cb,
                        int64_t* dims_out) {
    if (nnz <= 0 || nrows % 1024 || ncols % 1024 || region_rows % 128 ||
        cb <= 0)
        return 0;
    const int64_t nregions = (nrows + region_rows - 1) / region_rows;
    const int64_t npages = ncols / 128;

    auto* P = new RouterPlan();
    RouterPlan& p = *P;
    p.nnz = nnz;
    p.nregions = nregions;
    p.region_rows = region_rows;
    p.cb = cb;

    // ---- stable sort by (page, rr, cc): counting sort on page ------------
    std::vector<int64_t> pcnt(npages + 1, 0);
    for (int64_t i = 0; i < nnz; ++i) pcnt[(cc_in[i] >> 7) + 1]++;
    for (int64_t g = 0; g < npages; ++g) pcnt[g + 1] += pcnt[g];
    p.e_orig.resize(nnz);
    {
        std::vector<int64_t> cur(pcnt.begin(), pcnt.end() - 1);
        for (int64_t i = 0; i < nnz; ++i)
            p.e_orig[cur[cc_in[i] >> 7]++] = i;
    }
    std::vector<int64_t> rr_s(nnz), cc_s(nnz);
    p.e_val.resize(nnz);
    for (int64_t i = 0; i < nnz; ++i) {
        const int64_t o = p.e_orig[i];
        rr_s[i] = rr_in[o];
        cc_s[i] = cc_in[o];
        p.e_val[i] = vv_in[o];
    }
    for (int64_t g = 0; g < npages; ++g) {
        const int64_t lo = pcnt[g], hi = pcnt[g + 1];
        bool sorted = true;
        for (int64_t i = lo + 1; i < hi; ++i)
            if (rr_s[i] < rr_s[i - 1] ||
                (rr_s[i] == rr_s[i - 1] && cc_s[i] < cc_s[i - 1])) {
                sorted = false;
                break;
            }
        if (sorted) continue;
        std::vector<int64_t> seg(hi - lo);
        for (int64_t i = 0; i < hi - lo; ++i) seg[i] = i;
        std::stable_sort(seg.begin(), seg.end(), [&](int64_t a, int64_t b) {
            if (rr_s[lo + a] != rr_s[lo + b]) return rr_s[lo + a] < rr_s[lo + b];
            return cc_s[lo + a] < cc_s[lo + b];
        });
        std::vector<int64_t> t64(hi - lo);
        std::vector<float> tf(hi - lo);
        auto perm64 = [&](std::vector<int64_t>& a) {
            for (int64_t i = 0; i < hi - lo; ++i) t64[i] = a[lo + seg[i]];
            std::copy(t64.begin(), t64.end(), a.begin() + lo);
        };
        perm64(rr_s);
        perm64(cc_s);
        perm64(p.e_orig);
        for (int64_t i = 0; i < hi - lo; ++i) tf[i] = p.e_val[lo + seg[i]];
        std::copy(tf.begin(), tf.end(), p.e_val.begin() + lo);
    }

    // ---- page -> A-chunks (only pages with elements) ----------------------
    std::vector<int64_t> chunk_of_el(nnz);
    std::vector<int16_t> flat_of_el(nnz);
    std::vector<int32_t> chunk_page0;
    std::vector<int64_t> chunk_start;   // element range start per chunk
    for (int64_t g = 0; g < npages; ++g) {
        const int64_t lo = pcnt[g], hi = pcnt[g + 1];
        for (int64_t i = lo; i < hi; ++i) {
            const int64_t rank = i - lo;
            if (rank % CHUNK == 0) {
                chunk_page0.push_back((int32_t)g);
                chunk_start.push_back(i);
            }
            chunk_of_el[i] = (int64_t)chunk_page0.size() - 1;
            flat_of_el[i] = (int16_t)(rank % CHUNK);
        }
    }
    const int64_t nca = std::max<int64_t>((int64_t)chunk_page0.size(), 1);
    p.nca = nca;
    const int64_t nsteps_dep = (nca + cb - 1) / cb;
    p.nca2 = nsteps_dep * cb;

    // ---- balance chunks by descriptor weight; reorder element blocks ------
    std::vector<int64_t> region_of_el(nnz);
    for (int64_t i = 0; i < nnz; ++i)
        region_of_el[i] = rr_s[i] / region_rows;
    p.chunk_page.assign(p.nca2, 0);
    if (nsteps_dep > 1) {
        std::vector<int64_t> weight(nca, 2);
        for (int64_t i = 1; i < nnz; ++i)
            if (chunk_of_el[i] == chunk_of_el[i - 1] &&
                region_of_el[i] != region_of_el[i - 1])
                weight[chunk_of_el[i]]++;
        auto new_of_old = balance_chunks(weight, nsteps_dep, cb);
        for (int64_t k = 0; k < (int64_t)chunk_page0.size(); ++k)
            p.chunk_page[new_of_old[k]] = chunk_page0[k];
        // re-sort elements by (new chunk, flat): old chunks are contiguous
        // element blocks, so this is a block permutation
        std::vector<int64_t> old_of_new(p.nca2, -1);
        for (int64_t k = 0; k < (int64_t)new_of_old.size(); ++k)
            old_of_new[new_of_old[k]] = k;
        std::vector<int64_t> nrr(nnz), ncc(nnz), nor_(nnz), nreg(nnz);
        std::vector<float> nvv(nnz);
        int64_t w = 0;
        std::vector<int64_t> new_chunk_of_el(nnz);
        std::vector<int16_t> new_flat_of_el(nnz);
        for (int64_t nc = 0; nc < p.nca2; ++nc) {
            const int64_t oc = old_of_new[nc];
            if (oc < 0) continue;
            const int64_t lo = chunk_start[oc];
            const int64_t hi = (oc + 1 < (int64_t)chunk_start.size())
                                   ? chunk_start[oc + 1]
                                   : nnz;
            for (int64_t i = lo; i < hi; ++i, ++w) {
                nrr[w] = rr_s[i];
                ncc[w] = cc_s[i];
                nor_[w] = p.e_orig[i];
                nreg[w] = region_of_el[i];
                nvv[w] = p.e_val[i];
                new_chunk_of_el[w] = nc;
                new_flat_of_el[w] = flat_of_el[i];
            }
        }
        rr_s.swap(nrr);
        cc_s.swap(ncc);
        p.e_orig.swap(nor_);
        region_of_el.swap(nreg);
        p.e_val.swap(nvv);
        chunk_of_el.swap(new_chunk_of_el);
        flat_of_el.swap(new_flat_of_el);
    } else {
        std::copy(chunk_page0.begin(), chunk_page0.end(),
                  p.chunk_page.begin());
    }

    // ---- runs of equal region within each chunk + region cursor prefix ----
    struct Piece {
        int64_t chunk, region, src13, dst, cir;
        int32_t len;
    };
    std::vector<Piece> pieces;
    std::vector<int64_t> reg_cum(nregions, 0);     // running region position
    std::vector<int64_t> el_rpos(nnz);             // element region position
    {
        int64_t i = 0;
        while (i < nnz) {
            const int64_t c = chunk_of_el[i], r = region_of_el[i];
            int64_t j = i;
            while (j < nnz && chunk_of_el[j] == c && region_of_el[j] == r) ++j;
            const int64_t len = j - i, S0 = reg_cum[r];
            for (int64_t k = i; k < j; ++k) el_rpos[k] = S0 + (k - i);
            reg_cum[r] += len;
            const int64_t p1 = std::min<int64_t>(len, CHUNK - S0 % CHUNK);
            const int64_t src = flat_of_el[i];
            const int64_t src13 = (c % cb) * CHUNK + src;
            pieces.push_back({c, r, src13, S0 % CHUNK, S0 / CHUNK,
                              (int32_t)p1});
            if (p1 < len)
                pieces.push_back({c, r, src13 + p1, 0, (S0 + p1) / CHUNK,
                                  (int32_t)(len - p1)});
            i = j;
        }
    }

    // region-chunk ids + per-rc final cursors
    std::vector<int64_t> reg_base(nregions + 1, 0);
    for (int64_t r = 0; r < nregions; ++r)
        reg_base[r + 1] = reg_base[r] + (reg_cum[r] + CHUNK - 1) / CHUNK;
    const int64_t nrc = reg_base[nregions];
    std::vector<int64_t> rc_cursor(nrc, 0);
    for (const auto& d : pieces) {
        const int64_t rc = reg_base[d.region] + d.cir;
        rc_cursor[rc] = std::max<int64_t>(rc_cursor[rc], d.dst + d.len);
    }
    std::vector<int64_t> drain_rc;
    for (int64_t rc = 0; rc < nrc; ++rc)
        if (rc_cursor[rc] < CHUNK) drain_rc.push_back(rc);
    const int64_t n_drain = (int64_t)drain_rc.size();
    const int64_t drain_per_step = cb + 2;
    const int64_t n_drain_steps =
        (n_drain + drain_per_step - 1) / drain_per_step;
    int64_t nsteps = nsteps_dep + n_drain_steps;

    // ---- K-rotated accumulator slots (phase-ordered stream, layout v3) ----
    // see io/router_format.py: per region, cycles rotate through K_r
    // accumulator slots so one step's flushes can all run after its
    // deposits (the kernel batches deposits under shared guards for ILP)
    std::vector<int64_t> K(nregions, 2);
    {
        std::vector<int64_t> trip;
        trip.reserve(pieces.size());
        int64_t cir_max = 0;
        for (const auto& d : pieces)
            cir_max = std::max<int64_t>(cir_max, d.cir);
        const int64_t cspan = cir_max + 2;
        for (const auto& d : pieces)
            trip.push_back((d.region * (nsteps_dep + 1) + d.chunk / cb)
                           * cspan + d.cir);
        std::sort(trip.begin(), trip.end());
        trip.erase(std::unique(trip.begin(), trip.end()), trip.end());
        std::vector<int64_t> kmax(nregions, 1);
        for (size_t k = 0; k < trip.size();) {
            const int64_t rs = trip[k] / cspan;
            size_t j = k;
            while (j < trip.size() && trip[j] / cspan == rs) ++j;
            const int64_t r = rs / (nsteps_dep + 1);
            kmax[r] = std::max<int64_t>(kmax[r], (int64_t)(j - k));
            k = j;
        }
        if (!pieces.empty())
            for (int64_t r = 0; r < nregions; ++r) K[r] = kmax[r] + 1;
    }
    std::vector<int64_t> slot_base(nregions + 1, 0);
    for (int64_t r = 0; r < nregions; ++r)
        slot_base[r + 1] = slot_base[r] + K[r];
    const int64_t num_slots = slot_base[nregions];
    if (num_slots > 4096) {
        delete P;
        return 0;
    }

    // ---- descriptor items: deposits in (step, src13) order ----------------
    std::vector<int64_t> ord(pieces.size());
    for (size_t k = 0; k < ord.size(); ++k) ord[k] = (int64_t)k;
    std::sort(ord.begin(), ord.end(), [&](int64_t a, int64_t b) {
        const int64_t sa = pieces[a].chunk / cb, sb = pieces[b].chunk / cb;
        if (sa != sb) return sa < sb;
        return pieces[a].src13 < pieces[b].src13;
    });
    std::vector<int32_t> dep_cnt(nsteps, 0), q_cnt(nsteps, 0);
    std::vector<int64_t> fl_rc, fl_step;
    std::vector<int32_t> fl_q, fl_region, fl_slot, fl_w1;
    std::vector<int64_t> dp_step, dp_rank;
    std::vector<int32_t> dp_w1, dp_w2;
    for (const int64_t k : ord) {
        const Piece& d = pieces[k];
        const int64_t step = d.chunk / cb;
        const int64_t slot = slot_base[d.region] + d.cir % K[d.region];
        dp_step.push_back(step);
        dp_rank.push_back(dep_cnt[step]++);
        // w1 = dst10 | dl7<<10 | ds3<<17 | k8<<20 (precomputed roll
        // amounts; mirrors io/router_format.py exactly)
        const int64_t kk = d.src13 / CHUNK;
        const int64_t src = d.src13 % CHUNK;
        const int64_t delta = ((d.dst - src) % CHUNK + CHUNK) % CHUNK;
        dp_w1.push_back((int32_t)(d.dst | ((delta % 128) << 10)
                                  | ((delta / 128) << 17) | (kk << 20)));
        dp_w2.push_back((int32_t)(slot | ((int64_t)d.len << 16)));
        if (d.dst + d.len == CHUNK) {   // topping deposit -> flush (tail)
            const int32_t q = q_cnt[step]++;
            fl_rc.push_back(reg_base[d.region] + d.cir);
            fl_step.push_back(step);
            fl_q.push_back(q);
            fl_region.push_back((int32_t)d.region);
            fl_slot.push_back((int32_t)slot);
            fl_w1.push_back((int32_t)CHUNK);
        }
    }
    for (int64_t k = 0; k < n_drain; ++k) {
        const int64_t step = nsteps_dep + k / drain_per_step;
        const int64_t rc = drain_rc[k];
        // region of rc: last r with reg_base[r] <= rc
        int64_t r = (int64_t)(std::upper_bound(reg_base.begin(),
                                               reg_base.end(), rc) -
                              reg_base.begin()) - 1;
        const int32_t q = q_cnt[step]++;
        fl_rc.push_back(rc);
        fl_step.push_back(step);
        fl_q.push_back(q);
        fl_region.push_back((int32_t)r);
        fl_slot.push_back(
            (int32_t)(slot_base[r] + (rc - reg_base[r]) % K[r]));
        fl_w1.push_back((int32_t)rc_cursor[rc]);
    }
    int64_t dstep = 1, f = 1;
    for (int64_t st = 0; st < nsteps; ++st) {
        dstep = std::max<int64_t>(dstep, dep_cnt[st]);
        f = std::max<int64_t>(f, q_cnt[st]);
    }
    const int64_t rstep = dstep + f;
    if (f > 256) {
        delete P;
        return 0;
    }
    // pad steps so the flush stream length is a multiple of cb (free
    // reshape into the reduce kernel's batched grid)
    {
        int64_t k = 0;
        for (; k <= cb; ++k)
            if (((nsteps + k) * f) % cb == 0) break;
        if (k > cb) {
            delete P;
            return 0;
        }
        nsteps += k;
    }
    p.nsteps = nsteps;
    p.rstep = rstep;
    p.f = f;
    p.ncap = nsteps * cb;

    const int64_t ndp = (int64_t)dp_step.size();
    const int64_t nfl = (int64_t)fl_rc.size();
    p.it_pos.resize(ndp + nfl);
    p.it_w1.resize(ndp + nfl);
    p.it_w2.resize(ndp + nfl);
    for (int64_t k = 0; k < ndp; ++k) {
        p.it_pos[k] = dp_step[k] * rstep + dp_rank[k];
        p.it_w1[k] = dp_w1[k];
        p.it_w2[k] = dp_w2[k];
    }
    std::vector<int64_t> rc_linear(nrc, 0);
    p.cc_pos.resize(nfl);
    p.cc_region.resize(nfl);
    for (int64_t k = 0; k < nfl; ++k) {
        p.it_pos[ndp + k] = fl_step[k] * rstep + dstep + fl_q[k];
        p.it_w1[ndp + k] = fl_w1[k];
        p.it_w2[ndp + k] = (int32_t)(fl_slot[k] | ((int64_t)fl_q[k] << 16)
                                     | (int64_t)0x80000000);
        const int64_t pos = fl_step[k] * f + fl_q[k];
        rc_linear[fl_rc[k]] = pos;
        p.cc_pos[k] = pos;
        p.cc_region[k] = fl_region[k];
    }

    // ---- per-element stream positions + A-slots ---------------------------
    p.e_stream.resize(nnz);
    p.e_rowreg.resize(nnz);
    p.e_slot.resize(nnz);
    p.e_ar.resize(nnz);
    for (int64_t i = 0; i < nnz; ++i) {
        const int64_t r = region_of_el[i];
        const int64_t rc = reg_base[r] + el_rpos[i] / CHUNK;
        p.e_stream[i] = rc_linear[rc] * CHUNK + el_rpos[i] % CHUNK;
        p.e_rowreg[i] = (int16_t)(rr_s[i] % region_rows);
        p.e_slot[i] = chunk_of_el[i] * CHUNK + flat_of_el[i];
        p.e_ar[i] = (int8_t)(cc_s[i] & 127);
    }

    dims_out[0] = nsteps;
    dims_out[1] = cb;
    dims_out[2] = rstep;
    dims_out[3] = f;
    dims_out[4] = nregions;
    dims_out[5] = nca;
    dims_out[6] = p.ncap;
    dims_out[7] = p.nca2;
    dims_out[8] = dstep;
    dims_out[9] = num_slots;
    const int64_t h = next_handle();
    rregistry()[h] = P;
    return h;
}

void glt_router_emit(int64_t handle, int8_t* a_r, int8_t* a_sub,
                     float* a_vals, int32_t* a_page, int32_t* rg,
                     int32_t* c_code, int8_t* c_hi, int8_t* c_lo,
                     int64_t* el_slot) {
    auto it = rregistry().find(handle);
    if (it == rregistry().end()) return;
    RouterPlan& p = *it->second;
    for (int64_t i = 0; i < p.nnz; ++i) {
        const int64_t slot = p.e_slot[i];
        a_r[slot] = p.e_ar[i];
        a_vals[slot] = p.e_val[i];
        el_slot[p.e_orig[i]] = slot;
        const int64_t sp = p.e_stream[i];
        c_hi[sp] = (int8_t)(p.e_rowreg[i] >> 7);
        c_lo[sp] = (int8_t)(p.e_rowreg[i] & 127);
    }
    for (int64_t c = 0; c < p.nca2; ++c) {
        a_page[c] = p.chunk_page[c] >> 3;
        std::memset(a_sub + c * CHUNK, (int)(p.chunk_page[c] & 7), CHUNK);
    }
    for (size_t k = 0; k < p.it_pos.size(); ++k) {
        rg[p.it_pos[k] * 2] = p.it_w1[k];
        rg[p.it_pos[k] * 2 + 1] = p.it_w2[k];
    }
    for (size_t k = 0; k < p.cc_pos.size(); ++k)
        c_code[p.cc_pos[k]] = p.cc_region[k];
    delete it->second;
    rregistry().erase(it);
}

void glt_router_abort(int64_t handle) {
    auto it = rregistry().find(handle);
    if (it != rregistry().end()) {
        delete it->second;
        rregistry().erase(it);
    }
}

}  // extern "C"
