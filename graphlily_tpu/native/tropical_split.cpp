// Native tropical split-schedule builder for graphlily_tpu.
//
// Sequential C++ port of io/tropical_format.build_split_schedule (the
// window-split + scan-reduce schedules of the scalable tropical engine).
// The numpy builder walks every deposit in a Python loop and runs several
// nnz-scale lexsorts; on the 1-vCPU benchmark host a full-scale graph takes
// minutes. This port walks each stage once with preallocated buffers and
// produces BIT-IDENTICAL arrays (tests/test_native_pack.py compares them).
//
// Counterpart of the reference's host-side formatter role
// (graphlily/io/data_formatter.h) — native C++ feeding a static schedule.
//
// Protocol (ctypes), two-phase like the planar/router packers:
//   h = glt_tsplit_plan(c_code, c_hi, c_lo, nc, R, kb, dims_out[8])
//       -> handle (0 = fall back to numpy)
//   glt_tsplit_emit(h, in_order, rg2, planes2, c_win, sort2, rowids, inv2)
//       // frees the plan; caller prefills rowids=127, c_win=-1, rest zeros
//   glt_tsplit_abort(h)
//
// dims_out: [n_in, nsteps2, rstep2, f2, dmax2, nel, 0, 0]

#include <algorithm>
#include <array>
#include <cstdint>
#include <cstring>
#include <queue>
#include <unordered_map>
#include <vector>

namespace {

constexpr int64_t S = 8, L = 128;

struct TItem {          // one descriptor-stream entry
    int32_t step;
    int32_t slot;
    int32_t w1, w2;
};

struct TSplitPlan {
    int64_t nc = 0, R = 0, kb = 0;
    int64_t n_in = 0, nsteps2 = 0, rstep2 = 0, f2 = 0, dmax2 = 0, nel = 0;
    int64_t dstep2 = 0, num_slots2 = 0;
    const int8_t* c_hi = nullptr;   // borrowed: caller keeps alive until emit
    const int8_t* c_lo = nullptr;
    std::vector<int32_t> in_order;            // (n_in,)
    // elements in sorted (ci, dg, si, rw, li) order, grouped by deposit
    std::vector<int8_t> e_si, e_li, e_dg, e_rw;
    // deposits in that same (= exec) order
    std::vector<int64_t> dep_first;           // element span start per deposit
    std::vector<int32_t> dep_chunk;           // position in in_order
    std::vector<int32_t> dep_key;             // region * R + digit
    std::vector<std::array<int16_t, 8>> d_dest1, d_part1, d_lens;
    std::vector<int32_t> d_cyc1, d_cyc2;
    std::vector<uint8_t> d_split;
    std::vector<int64_t> rc_base;             // (nkeys + 1,)
    std::vector<TItem> items;
    std::vector<int64_t> fl_rc;               // per flush, in emit order
    std::vector<int32_t> fl_step, fl_q, fl_key;
    std::vector<std::array<int32_t, 2>> piece_sp;   // (2*nd,) step, ordinal
};

std::unordered_map<int64_t, TSplitPlan*>& tregistry() {
    static std::unordered_map<int64_t, TSplitPlan*> reg;
    return reg;
}
int64_t tnext_handle() {
    static int64_t h = 1'000'000;   // disjoint from the planar/router pools
    return ++h;
}

}  // namespace

extern "C" {

int64_t glt_tsplit_plan(const int32_t* c_code, const int8_t* c_hi,
                        const int8_t* c_lo, int64_t nc, int64_t R,
                        int64_t kb, int64_t* dims_out) {
    if (nc <= 0 || R <= 0 || R > 512 || kb <= 0 || kb > 256) return 0;
    auto* P = new TSplitPlan();
    TSplitPlan& p = *P;
    p.nc = nc;
    p.R = R;
    p.kb = kb;
    p.c_hi = c_hi;
    p.c_lo = c_lo;

    // ---- in_order: valid chunks, stable counting sort by region ----------
    int64_t max_reg = -1;
    int64_t n_in = 0;
    for (int64_t i = 0; i < nc; ++i)
        if (c_code[i] >= 0) {
            ++n_in;
            if (c_code[i] > max_reg) max_reg = c_code[i];
        }
    if (n_in == 0 || max_reg < 0) { delete P; return 0; }
    const int64_t nregs = max_reg + 1;
    std::vector<int64_t> rcnt(nregs + 1, 0);
    for (int64_t i = 0; i < nc; ++i)
        if (c_code[i] >= 0) ++rcnt[c_code[i] + 1];
    for (int64_t r = 0; r < nregs; ++r) rcnt[r + 1] += rcnt[r];
    p.in_order.resize(n_in);
    {
        std::vector<int64_t> cur(rcnt.begin(), rcnt.end() - 1);
        for (int64_t i = 0; i < nc; ++i)
            if (c_code[i] >= 0) p.in_order[cur[c_code[i]]++] = (int32_t)i;
    }
    p.n_in = n_in;
    p.nsteps2 = std::max<int64_t>((n_in + kb - 1) / kb, 1);

    // ---- elements per chunk, sorted (dg, si, rw, li); deposits ------------
    // iteration is (si, li)-ordered, so a stable sort by (dg, si, rw)
    // preserves li order == np.lexsort((li, rw, si, dg, ci))
    std::vector<int32_t> regions(n_in);
    for (int64_t i = 0; i < n_in; ++i) regions[i] = c_code[p.in_order[i]];

    p.e_si.reserve(n_in * 64);
    struct El { int32_t key; int8_t si, li, dg, rw; };   // key < 128*8*128
    std::vector<El> buf;
    buf.reserve(1024);
    std::vector<int64_t> ci_of_dep;
    for (int64_t ci = 0; ci < n_in; ++ci) {
        const int64_t base = (int64_t)p.in_order[ci] * S * L;
        buf.clear();
        for (int64_t s = 0; s < S; ++s)
            for (int64_t l = 0; l < L; ++l) {
                const int8_t dg = c_hi[base + s * L + l];
                if (dg < 0) continue;
                const int8_t rw = c_lo[base + s * L + l];
                buf.push_back({(int32_t)(((int)dg * 8 + (int)s) * 128 + rw),
                               (int8_t)s, (int8_t)l, dg, rw});
            }
        std::stable_sort(buf.begin(), buf.end(),
                         [](const El& a, const El& b) {
                             return a.key < b.key;
                         });
        int prev_dg = -1;
        for (const El& e : buf) {
            if (e.dg != prev_dg) {
                prev_dg = e.dg;
                p.dep_first.push_back((int64_t)p.e_si.size());
                p.dep_chunk.push_back((int32_t)ci);
                p.dep_key.push_back(regions[ci] * (int32_t)R + e.dg);
                p.d_lens.push_back({});
            }
            p.d_lens.back()[e.si] += 1;
            p.e_si.push_back(e.si);
            p.e_li.push_back(e.li);
            p.e_dg.push_back(e.dg);
            p.e_rw.push_back(e.rw);
        }
    }
    p.nel = (int64_t)p.e_si.size();
    const int64_t nd = (int64_t)p.dep_first.size();
    if (p.nel == 0) { delete P; return 0; }

    // ---- cursor simulation (deposits already in (chunk, key) order) -------
    const int64_t nkeys = nregs * R;
    std::vector<std::array<int16_t, 8>> C(nkeys, std::array<int16_t, 8>{});
    std::vector<int32_t> cycle(nkeys, 0);
    p.d_dest1.resize(nd);
    p.d_part1.resize(nd);
    p.d_cyc1.resize(nd);
    p.d_cyc2.resize(nd);
    p.d_split.assign(nd, 0);
    for (int64_t k = 0; k < nd; ++k) {
        const int64_t r = p.dep_key[k];
        auto& Cr = C[r];
        const auto& lens = p.d_lens[k];
        bool over = false;
        for (int s = 0; s < 8; ++s)
            if (Cr[s] + lens[s] > L) { over = true; break; }
        if (over) {
            for (int s = 0; s < 8; ++s) {
                const int16_t p1 = std::min<int16_t>(
                    lens[s], (int16_t)(L - Cr[s]));
                p.d_dest1[k][s] = Cr[s];
                p.d_part1[k][s] = p1;
                Cr[s] = lens[s] - p1;
            }
            p.d_cyc1[k] = cycle[r];
            p.d_split[k] = 1;
            cycle[r] += 1;
            p.d_cyc2[k] = cycle[r];
        } else {
            for (int s = 0; s < 8; ++s) {
                p.d_dest1[k][s] = Cr[s];
                p.d_part1[k][s] = lens[s];
                Cr[s] = (int16_t)(Cr[s] + lens[s]);
            }
            p.d_cyc1[k] = p.d_cyc2[k] = cycle[r];
        }
    }
    std::vector<uint8_t> has_resid(nkeys, 0);
    for (int64_t r = 0; r < nkeys; ++r)
        for (int s = 0; s < 8; ++s)
            if (C[r][s] > 0) { has_resid[r] = 1; break; }
    p.rc_base.assign(nkeys + 1, 0);
    for (int64_t r = 0; r < nkeys; ++r)
        p.rc_base[r + 1] = p.rc_base[r] + cycle[r] + has_resid[r];

    // ---- phase-ordered emission (K-rotated digit slots) --------------------
    // mirrors io/tropical_format.py: deposits per step first (rank == plane
    // ordinal), flushes at the step tail; a digit's GLOBAL cycle sequence
    // rotates through K slots
    std::vector<int64_t> last_pos(nregs, 0);
    for (int64_t i = 0; i < n_in; ++i) last_pos[regions[i]] = i;
    // per-digit cumulative cycle base across regions
    std::vector<int64_t> basecyc(nkeys, 0);
    for (int64_t r = 1; r < nregs; ++r)
        for (int64_t d = 0; d < R; ++d)
            basecyc[r * R + d] = basecyc[(r - 1) * R + d]
                + cycle[(r - 1) * R + d] + (has_resid[(r - 1) * R + d] ? 1 : 0);

    // ---- staggered flush schedule (mirror of _schedule_flushes) -----------
    // every flush (cycle split or residual drain) may run at any step in
    // [er, dl]: er = the step of the deposit closing its cycle, dl = one
    // step before the first deposit of (digit, gc + K0) reuses the rotated
    // accumulator slot. K0 comes from the unstaggered schedule; the final
    // K is max(K0, recomputed), so the windows stay valid.
    struct PFl { int64_t er, dl, dig, gc, key, rc; };
    std::vector<PFl> pfl;
    std::vector<int64_t> fl_order, fl_stp;   // placement order
    int64_t K;
    {
        auto gcof = [&](int64_t key, int64_t cyc) {
            return basecyc[key] + cyc;
        };
        int64_t gmax = 0;
        for (int64_t k = 0; k < nd; ++k)
            gmax = std::max(gmax, gcof(p.dep_key[k], p.d_cyc2[k]));
        for (int64_t key = 0; key < nkeys; ++key)
            if (has_resid[key])
                gmax = std::max(gmax, gcof(key, cycle[key]));
        const int64_t gspan = gmax + 2;
        auto depth_of = [&](std::vector<int64_t>& trip) {
            std::sort(trip.begin(), trip.end());
            trip.erase(std::unique(trip.begin(), trip.end()), trip.end());
            int64_t kmax = 1;
            for (size_t a = 0; a < trip.size();) {
                const int64_t rs = trip[a] / gspan;
                size_t j = a;
                while (j < trip.size() && trip[j] / gspan == rs) ++j;
                kmax = std::max<int64_t>(kmax, (int64_t)(j - a));
                a = j;
            }
            return kmax + 1;
        };
        auto push_deps = [&](std::vector<int64_t>& trip) {
            for (int64_t k = 0; k < nd; ++k) {
                const int64_t step = p.dep_chunk[k] / p.kb;
                const int64_t dgt = p.dep_key[k] % R;
                trip.push_back((dgt * (p.nsteps2 + 1) + step) * gspan
                               + gcof(p.dep_key[k], p.d_cyc1[k]));
                if (p.d_split[k])
                    trip.push_back((dgt * (p.nsteps2 + 1) + step) * gspan
                                   + gcof(p.dep_key[k], p.d_cyc2[k]));
            }
        };
        std::vector<int64_t> trip;
        trip.reserve(2 * nd + nkeys);
        push_deps(trip);
        for (int64_t key = 0; key < nkeys; ++key)
            if (has_resid[key])
                trip.push_back(((key % R) * (p.nsteps2 + 1)
                                + last_pos[key / R] / p.kb) * gspan
                               + gcof(key, cycle[key]));
        const int64_t K0 = depth_of(trip);

        // first deposit step per (digit, global cycle)
        const int64_t gspan0 = gmax + K0 + 2;
        std::vector<std::pair<int64_t, int64_t>> fd;   // (digkey, step)
        fd.reserve(2 * nd);
        for (int64_t k = 0; k < nd; ++k) {
            const int64_t step = p.dep_chunk[k] / p.kb;
            const int64_t dgt = p.dep_key[k] % R;
            fd.push_back({dgt * gspan0 + gcof(p.dep_key[k], p.d_cyc1[k]),
                          step});
            if (p.d_split[k])
                fd.push_back({dgt * gspan0
                              + gcof(p.dep_key[k], p.d_cyc2[k]), step});
        }
        std::sort(fd.begin(), fd.end());
        fd.erase(std::unique(fd.begin(), fd.end(),
                             [](const std::pair<int64_t, int64_t>& a,
                                const std::pair<int64_t, int64_t>& b) {
                                 return a.first == b.first;
                             }),
                 fd.end());   // keeps the smallest step per digkey

        std::vector<int32_t> er_key(nkeys, 0);
        for (int64_t k = 0; k < nd; ++k) {
            const int32_t step = (int32_t)(p.dep_chunk[k] / p.kb);
            if (step > er_key[p.dep_key[k]]) er_key[p.dep_key[k]] = step;
        }

        for (int64_t k = 0; k < nd; ++k)
            if (p.d_split[k]) {
                const int64_t key = p.dep_key[k];
                pfl.push_back({p.dep_chunk[k] / p.kb, 0, key % R,
                               gcof(key, p.d_cyc1[k]), key,
                               p.rc_base[key] + p.d_cyc1[k]});
            }
        for (int64_t key = 0; key < nkeys; ++key)
            if (has_resid[key])
                pfl.push_back({(int64_t)er_key[key], 0, key % R,
                               gcof(key, cycle[key]), key,
                               p.rc_base[key] + cycle[key]});
        for (auto& f : pfl) {
            const int64_t digkey = f.dig * gspan0 + f.gc + K0;
            auto it = std::lower_bound(
                fd.begin(), fd.end(),
                std::make_pair(digkey, (int64_t)INT64_MIN));
            f.dl = (it != fd.end() && it->first == digkey)
                       ? it->second - 1 : p.nsteps2 - 1;
            if (f.dl < f.er) { delete P; return 0; }   // K0 violated
        }

        // EDF greedy, cap binary-searched: smallest cap whose run never
        // exceeds it (a too-small cap bunches deadline clusters — see
        // io/tropical_format._schedule_flushes)
        const int64_t nfl = (int64_t)pfl.size();
        std::vector<std::vector<int64_t>> by_er(p.nsteps2);
        for (int64_t i = 0; i < nfl; ++i) by_er[pfl[i].er].push_back(i);
        using DT = std::pair<int64_t, std::pair<int64_t, int64_t>>;
        auto run = [&](int64_t cap, bool emit) -> int64_t {
            std::priority_queue<DT, std::vector<DT>, std::greater<DT>> heap;
            int64_t maxload = 0, pos = 0;
            for (int64_t s = 0; s < p.nsteps2; ++s) {
                for (int64_t i : by_er[s])
                    heap.push({pfl[i].dl, {pfl[i].rc, i}});
                int64_t load = 0;
                while (!heap.empty() &&
                       (heap.top().first == s || load < cap)) {
                    if (emit) {
                        fl_order.push_back(heap.top().second.second);
                        fl_stp.push_back(s);
                    }
                    heap.pop();
                    ++pos;
                    ++load;
                }
                maxload = std::max(maxload, load);
            }
            if (pos != nfl) return -1;   // pending left (cannot happen)
            return maxload;
        };
        int64_t lo = std::max<int64_t>((nfl + p.nsteps2 - 1) / p.nsteps2, 1);
        int64_t hi = lo;
        while (true) {
            const int64_t ml = run(hi, false);
            if (ml < 0) { delete P; return 0; }
            if (ml <= hi) break;
            hi *= 2;
        }
        while (lo < hi) {
            const int64_t mid = (lo + hi) / 2;
            const int64_t ml = run(mid, false);
            if (ml >= 0 && ml <= mid) hi = mid;
            else lo = mid + 1;
        }
        fl_order.reserve(nfl);
        fl_stp.reserve(nfl);
        if (run(lo, true) < 0) { delete P; return 0; }

        std::vector<int64_t> trip2;
        trip2.reserve(2 * nd + nfl);
        push_deps(trip2);
        for (size_t j = 0; j < fl_order.size(); ++j) {
            const PFl& f = pfl[fl_order[j]];
            trip2.push_back((f.dig * (p.nsteps2 + 1) + fl_stp[j]) * gspan
                            + f.gc);
        }
        K = std::max(K0, depth_of(trip2));
    }
    if (R * K > 4096) { delete P; return 0; }
    p.num_slots2 = R * K;
    auto slot_of = [&](int64_t key, int64_t cyc) {
        return (key % R) * K + (basecyc[key] + cyc) % K;
    };

    std::vector<int32_t> dep_cnt(p.nsteps2, 0), q_cnt(p.nsteps2, 0);
    p.items.reserve(2 * nd + nd / 4 + 16);
    p.piece_sp.assign(2 * nd, {-1, -1});
    // deposits: exec order, piece2 right after piece1
    for (int64_t k = 0; k < nd; ++k) {
        const int64_t ch = p.dep_chunk[k];
        const int32_t step = (int32_t)(ch / p.kb);
        for (int piece = 0; piece < (p.d_split[k] ? 2 : 1); ++piece) {
            const int32_t pp = dep_cnt[step]++;
            p.piece_sp[2 * k + piece] = {step, pp};
            const int64_t cyc = piece ? p.d_cyc2[k] : p.d_cyc1[k];
            p.items.push_back({step, pp,
                               (int32_t)((ch - (int64_t)step * p.kb)
                                         | (pp << 8)),
                               (int32_t)(slot_of(p.dep_key[k], cyc)
                                         | (1 << 15))});
        }
    }
    // flushes in scheduler placement order (step-ascending)
    for (size_t j = 0; j < fl_order.size(); ++j) {
        const PFl& f = pfl[fl_order[j]];
        const int32_t step = (int32_t)fl_stp[j];
        const int32_t q = q_cnt[step]++;
        const int32_t slot = (int32_t)(f.dig * K + f.gc % K);
        p.items.push_back({step, -1 - q, 0,   // slot fixed after dstep2
                           (int32_t)((uint32_t)slot | ((uint32_t)q << 16)
                                     | 0x80000000u)});
        p.fl_rc.push_back(f.rc);
        p.fl_step.push_back(step);
        p.fl_q.push_back(q);
        p.fl_key.push_back((int32_t)f.key);
    }

    p.dstep2 = 1;
    p.f2 = 1;
    for (int64_t s = 0; s < p.nsteps2; ++s) {
        p.dstep2 = std::max<int64_t>(p.dstep2, dep_cnt[s]);
        p.f2 = std::max<int64_t>(p.f2, q_cnt[s]);
    }
    if (p.f2 > 256) { delete P; return 0; }   // flush ordinal overflow
    p.rstep2 = p.dstep2 + p.f2;
    p.dmax2 = p.dstep2;
    // resolve flush slots (marked -1-q) now that dstep2 is known
    for (auto& it : p.items)
        if (it.slot < 0) it.slot = (int32_t)(p.dstep2 + (-1 - it.slot));

    dims_out[0] = p.n_in;
    dims_out[1] = p.nsteps2;
    dims_out[2] = p.rstep2;
    dims_out[3] = p.f2;
    dims_out[4] = p.dmax2;
    dims_out[5] = p.nel;
    dims_out[6] = p.dstep2;
    dims_out[7] = p.num_slots2;
    const int64_t h = tnext_handle();
    tregistry()[h] = P;
    return h;
}

void glt_tsplit_emit(int64_t handle, int32_t* in_order, int32_t* rg2,
                     int8_t* planes2, int32_t* c_win, int8_t* sort2,
                     int8_t* rowids, int8_t* inv2) {
    auto it = tregistry().find(handle);
    if (it == tregistry().end()) return;
    TSplitPlan& p = *it->second;
    const int64_t nd = (int64_t)p.dep_first.size();
    const int64_t n_out = p.nsteps2 * p.f2;

    for (int64_t i = 0; i < p.n_in; ++i) in_order[i] = p.in_order[i];
    for (const TItem& t : p.items) {
        const int64_t pos = ((int64_t)t.step * p.rstep2 + t.slot) * 2;
        rg2[pos] = t.w1;
        rg2[pos + 1] = t.w2;
    }
    // rc -> out-chunk position; c_win
    const int64_t nrc = p.rc_base.back();
    std::vector<int64_t> rc_linear(nrc + 1, 0);
    for (size_t i = 0; i < p.fl_rc.size(); ++i) {
        const int64_t op = (int64_t)p.fl_step[i] * p.f2 + p.fl_q[i];
        rc_linear[p.fl_rc[i]] = op;
        c_win[op] = p.fl_key[i];
    }

    // ---- per-element destinations + deposit planes ------------------------
    std::vector<int64_t> el_out(p.nel);
    std::vector<int8_t> el_dst(p.nel);
    for (int64_t k = 0; k < nd; ++k) {
        const int64_t e0 = p.dep_first[k];
        const int64_t e1 = (k + 1 < nd) ? p.dep_first[k + 1] : p.nel;
        const int64_t key = p.dep_key[k];
        int16_t rank[8] = {0};
        for (int64_t e = e0; e < e1; ++e) {
            const int s = p.e_si[e];
            const int16_t rk = rank[s]++;
            const bool in1 = rk < p.d_part1[k][s];
            const int32_t dst = in1 ? p.d_dest1[k][s] + rk
                                    : rk - p.d_part1[k][s];
            const int32_t cyc = in1 ? p.d_cyc1[k] : p.d_cyc2[k];
            const auto& sp = p.piece_sp[2 * k + (in1 ? 0 : 1)];
            el_dst[e] = (int8_t)dst;
            el_out[e] = rc_linear[p.rc_base[key] + cyc];
            planes2[(((int64_t)sp[0] * p.dmax2 + sp[1]) * S
                     + s) * L + dst] = (int8_t)(p.e_li[e] - 128);
        }
    }

    // ---- reduce streams: counting sort by (out-chunk, sublane) ------------
    std::vector<int64_t> bcnt(n_out * S + 1, 0);
    for (int64_t e = 0; e < p.nel; ++e)
        ++bcnt[el_out[e] * S + p.e_si[e] + 1];
    for (int64_t b = 0; b < n_out * S; ++b) bcnt[b + 1] += bcnt[b];
    std::vector<int32_t> eorder(p.nel);
    {
        std::vector<int64_t> cur(bcnt.begin(), bcnt.end() - 1);
        for (int64_t e = 0; e < p.nel; ++e)
            eorder[cur[el_out[e] * S + p.e_si[e]]++] = (int32_t)e;
    }
    // within each bucket: stable sort by (rw, el_dst) == the numpy lexsort
    for (int64_t b = 0; b < n_out * S; ++b) {
        const int64_t s0 = bcnt[b], s1 = bcnt[b + 1];
        if (s1 - s0 > 1)
            std::stable_sort(
                eorder.begin() + s0, eorder.begin() + s1,
                [&](int32_t a, int32_t bb) {
                    if (p.e_rw[a] != p.e_rw[bb])
                        return p.e_rw[a] < p.e_rw[bb];
                    return el_dst[a] < el_dst[bb];
                });
        const int64_t out = b / S, si = b % S;
        const int64_t row0 = (out * S + si) * L;
        uint64_t occ[2] = {0, 0};
        int prev_rw = -1;
        for (int64_t j = s0; j < s1; ++j) {
            const int32_t e = eorder[j];
            const int64_t spos = j - s0;
            sort2[row0 + spos] = el_dst[e];
            rowids[row0 + spos] = p.e_rw[e];
            const int d = (int)(uint8_t)el_dst[e];
            occ[d >> 6] |= (1ULL << (d & 63));
            if (p.e_rw[e] != prev_rw) {
                // close the previous run at its last slot
                if (prev_rw >= 0)
                    inv2[row0 + prev_rw] = (int8_t)((j - 1 - s0) - 128);
                prev_rw = p.e_rw[e];
            }
        }
        if (prev_rw >= 0)
            inv2[row0 + prev_rw] = (int8_t)((s1 - 1 - s0) - 128);
        // identity tail: unoccupied source lanes, ascending, from slot cnt
        int64_t tslot = s1 - s0;
        for (int d = 0; d < (int)L; ++d)
            if (!(occ[d >> 6] & (1ULL << (d & 63))))
                sort2[row0 + tslot++] = (int8_t)d;
    }

    delete it->second;
    tregistry().erase(it);
}

void glt_tsplit_abort(int64_t handle) {
    auto it = tregistry().find(handle);
    if (it != tregistry().end()) {
        delete it->second;
        tregistry().erase(it);
    }
}

}  // extern "C"
