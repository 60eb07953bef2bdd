// Native formatter kernels for graphlily_tpu.
//
// C++ counterpart of the reference's host-side data formatter
// (graphlily/io/data_formatter.h csr2cpsr + util_pack_rows): computes the
// chunk assignment (chunk id, sublane, lane) for every nonzero of the
// chunked dual-gather SpMV layout. The Python packer does the same with
// numpy (io/formatter.py pack_csr_chunks); this path is ~10x faster on
// 100M+-edge graphs. Exposed via ctypes (no pybind11 in this environment).
//
// Layout recap (io/formatter.py): nnz are grouped by
// (row window wid = row/128, col tile cid = col/1024), binned within a group
// by sublane class sub = ((col%1024)>>7)%8, and packed 128 per (chunk,
// sublane); a group's chunk count is the max over its 8 classes of
// ceil(count/128).
//
// Build: make -C graphlily_tpu/native   (produces libgraphlily_native.so)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#if defined(_GLIBCXX_PARALLEL)
#include <parallel/algorithm>
#define GLT_SORT __gnu_parallel::sort
#else
#define GLT_SORT std::sort
#endif

namespace {
constexpr int64_t kW = 128, kS = 8, kL = 128, kC = 1024;
constexpr int kIdxBits = 34;  // supports nnz < 2^34; class keys < 2^30
constexpr uint64_t kIdxMask = (1ULL << kIdxBits) - 1;
}  // namespace

extern "C" {

// Assign every nonzero to (chunk_id, sublane, lane).
// rows/cols: nnz coordinates in the padded-dim space; nct = padded_cols/1024.
// Outputs (caller-allocated, length nnz). Returns chunk count (>=1), or -1.
int64_t glt_pack_assign(const uint32_t* rows, const uint32_t* cols,
                        int64_t nnz, int64_t nct,
                        int64_t* chunk_id_out, int32_t* sub_out,
                        int32_t* lane_out) {
    if (nnz < 0 || nct <= 0 || nnz >= (1LL << kIdxBits)) return -1;

    constexpr uint64_t kCkeyLimit = 1ULL << (64 - kIdxBits);
    std::vector<uint64_t> keyed(nnz);
    for (int64_t i = 0; i < nnz; ++i) {
        const uint64_t wid = rows[i] / kW;
        const uint64_t cid = cols[i] / kC;
        const uint64_t sub = ((cols[i] % kC) >> 7) % kS;
        const uint64_t ckey = (wid * (uint64_t)nct + cid) * kS + sub;
        // class key would collide with the packed index bits: refuse (the
        // caller falls back to the int64-safe numpy packer)
        if (ckey >= kCkeyLimit) return -1;
        keyed[i] = (ckey << kIdxBits) | (uint64_t)i;
    }
    GLT_SORT(keyed.begin(), keyed.end());

    // walk sorted order: per class, rank -> (chunk offset rank/128, lane
    // rank%128); per group, chunks = max class need; global chunk ids.
    int64_t nchunk = 0;
    int64_t i = 0;
    while (i < nnz) {
        const uint64_t gkey = (keyed[i] >> kIdxBits) / kS;
        int64_t j = i;
        int64_t max_need = 1;
        while (j < nnz && (keyed[j] >> kIdxBits) / kS == gkey) {
            const uint64_t ck = keyed[j] >> kIdxBits;
            int64_t k2 = j;
            while (k2 < nnz && (keyed[k2] >> kIdxBits) == ck) ++k2;
            const int64_t cnt = k2 - j;
            const int64_t need = (cnt + kL - 1) / kL;
            if (need > max_need) max_need = need;
            const int32_t sub = (int32_t)(ck % kS);
            for (int64_t t = j; t < k2; ++t) {
                const int64_t idx = (int64_t)(keyed[t] & kIdxMask);
                const int64_t rank = t - j;
                chunk_id_out[idx] = nchunk + rank / kL;
                sub_out[idx] = sub;
                lane_out[idx] = (int32_t)(rank % kL);
            }
            j = k2;
        }
        nchunk += max_need;
        i = j;
    }
    return nchunk > 0 ? nchunk : 1;
}

// CSR -> CSC transpose (counting sort), the hot half of io/matrix.csr2csc.
// indptr_out must have num_cols+1 entries.
void glt_csr2csc(const uint32_t* indptr, const uint32_t* indices,
                 const float* data, int64_t num_rows, int64_t num_cols,
                 uint32_t* indptr_out, uint32_t* rows_out, float* data_out) {
    const int64_t nnz = indptr[num_rows];
    std::vector<int64_t> cnt(num_cols + 1, 0);
    for (int64_t i = 0; i < nnz; ++i) cnt[indices[i] + 1]++;
    for (int64_t c = 0; c < num_cols; ++c) cnt[c + 1] += cnt[c];
    for (int64_t c = 0; c <= num_cols; ++c) indptr_out[c] = (uint32_t)cnt[c];
    std::vector<int64_t> cursor(cnt.begin(), cnt.end() - 1);
    for (int64_t r = 0; r < num_rows; ++r) {
        for (uint32_t k = indptr[r]; k < indptr[r + 1]; ++k) {
            const int64_t pos = cursor[indices[k]]++;
            rows_out[pos] = (uint32_t)r;
            data_out[pos] = data[k];
        }
    }
}

}  // extern "C"
