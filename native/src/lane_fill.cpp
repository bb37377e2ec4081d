/* Parallel LaneELL tile fill — native replacement for the numpy scatter
 * fills in hprlp_tpu/ops/lane_ell.py::_schedule_thin_serial /
 * _schedule_lane_ell_serial.
 *
 * The scheduler's per-entry placements (sublane / sub-block / fold
 * position) are computed by hpres_lane_schedule / hpres_lane_pack_thin;
 * turning them into device tiles is pure scattering, but numpy advanced
 * indexing holds the GIL, so the ~5 scatters over nnz-sized index arrays
 * serialized the whole parallel scheduling wrapper (measured ~15 s of a
 * 26 s serial thin schedule at 28M nnz — ~125 s over both matrices of
 * the 113M-nnz giant).  Here: derive lane/rho/r/d from the padded
 * positions on the fly and scatter with a thread pool.  Write races are
 * benign by the scheduling invariants: (sublane, lane) pairs are unique
 * per entry, and (sublane, rho) collisions carry the same column hence
 * the same row-in-window value.
 *
 * Tiles are written DIRECTLY in their final layouts (idx1t and invt
 * transposed), so the numpy transpose+ascontiguousarray passes disappear
 * too.
 */

#include <stdint.h>

#include <algorithm>
#include <atomic>
#include <cstring>
#include <thread>
#include <vector>

#include <sys/mman.h>

namespace {

constexpr int64_t LANES = 128;
constexpr int64_t WINDOW = LANES * LANES;
constexpr int64_t SUBBLOCKS = 8;
constexpr int64_t CHUNK_SUB = SUBBLOCKS * LANES;

/* Hugepage advice for a caller-allocated buffer (page-align inward).
 * Page-zero faulting on the target VMs is single-thread-bound and slow
 * (~130 MB/s measured); THP cuts the fault count 512x and the parallel
 * scatters below fault concurrently. */
void advise_huge(void *p, size_t bytes) {
    const uintptr_t a = ((uintptr_t)p + 4095) & ~(uintptr_t)4095;
    const uintptr_t e = ((uintptr_t)p + bytes) & ~(uintptr_t)4095;
    if (e > a) madvise((void *)a, e - a, MADV_HUGEPAGE);
}

template <typename F>
void parallel_ranges(int64_t n, F f) {
    unsigned hw = std::thread::hardware_concurrency();
    int T = (int)std::min<int64_t>(hw ? hw : 1, 16);
    if (n < (int64_t)1 << 20) T = 1;
    if (T <= 1) {
        f(int64_t(0), n);
        return;
    }
    std::vector<std::thread> pool;
    const int64_t step = (n + T - 1) / T;
    for (int t = 0; t < T; ++t) {
        const int64_t a = t * step, b = std::min(n, a + step);
        if (a >= b) break;
        pool.emplace_back([=] { f(a, b); });
    }
    for (auto &th : pool) th.join();
}

}  // namespace

extern "C" {

/* Pre-fault a buffer in parallel with hugepage advice.  Page-zero
 * faulting on the target VMs runs ~130 MB/s single-threaded but scales
 * with threads (and THP cuts the fault count 512x): the giant ingest
 * preheats the brk heap's working set once through this (see
 * hprlp_tpu/_malloc.py::preheat), after which numpy's multi-GB
 * temporaries reuse already-faulted pages. */
void hprlp_parallel_touch(char *p, int64_t bytes) {
    if (!p || bytes <= 0) return;
    advise_huge(p, (size_t)bytes);
    const int64_t pages = (bytes + 4095) / 4096;
    unsigned hw = std::thread::hardware_concurrency();
    const int T = (int)std::min<int64_t>(
        std::min<unsigned>(hw ? hw : 1, 8),
        std::max<int64_t>(1, pages / 1024));
    std::vector<std::thread> ts;
    for (int t = 0; t < T; ++t) {
        const int64_t a = pages * t / T, b = pages * (t + 1) / T;
        if (a >= b) continue;
        ts.emplace_back([=] {
            for (int64_t i = a; i < b; ++i) p[i * 4096] = 0;
        });
    }
    for (auto &th : ts) th.join();
}

/* Thin (packed) tile fill.
 * rows_p/cols_p/vals: per entry (padded positions, any order).
 * sb_ent: PADDED sub-block id per entry; sub_ent: sublane within the
 * sub-block (sigma*K + q).  gbase_pad: per padded sub-block 128-aligned
 * group base.  n_sb_pad must be a multiple of 8 (chunk padding done by
 * the caller).  Outputs (zeroed by caller except invt, any state):
 *   idx1t (C,128,CHUNK_SUB) int8, idx2 (C,CHUNK_SUB,128) int8,
 *   vals_out (C,CHUNK_SUB,128) f64, invt (C,128,CHUNK_SUB) int8.
 * Returns 0, or -1 when some (sub-block, lane) has no free fold position
 * for the invt default (packer cap violation). */
int64_t hprlp_lane_fill_thin(
    int64_t n, const int64_t *rows_p, const int64_t *cols_p,
    const double *vals, const int64_t *sb_ent, const int32_t *sub_ent,
    const int64_t *gbase_pad, int64_t n_sb_pad, int32_t K,
    int8_t *idx1t, int8_t *idx2, double *vals_out, int8_t *invt) {
    if (n_sb_pad % SUBBLOCKS != 0 || K < 2 || K > 128) return -1;
    const size_t slots = (size_t)n_sb_pad * LANES * LANES;
    advise_huge(idx1t, slots);
    advise_huge(idx2, slots);
    advise_huge(vals_out, slots * sizeof(double));
    advise_huge(invt, slots);

    // 1. Fold-position occupancy per (sub-block, lane): bit q set iff
    //    some entry sits at position q (any stratum).
    // Per-entry placement validation (a scheduler bug must fail the
    // call, not corrupt memory — the Python wrapper then falls back to
    // the numpy fill, whose fancy indexing raises instead).
    std::atomic<int> oob{0};
    parallel_ranges(n, [&](int64_t a, int64_t b) {
        for (int64_t i = a; i < b; ++i) {
            const int64_t sb = sb_ent[i];
            const int64_t d = (rows_p[i] >> 7) - gbase_pad[
                (sb >= 0 && sb < n_sb_pad) ? sb : 0];
            if (sb < 0 || sb >= n_sb_pad || sub_ent[i] < 0
                || sub_ent[i] >= LANES || d < 0 || d >= LANES) {
                oob.store(1, std::memory_order_relaxed);
                return;
            }
        }
    });
    if (oob.load()) return -2;

    std::vector<std::atomic<uint64_t>> occ(2 * n_sb_pad * LANES);
    for (auto &w : occ) w.store(0, std::memory_order_relaxed);
    parallel_ranges(n, [&](int64_t a, int64_t b) {
        for (int64_t i = a; i < b; ++i) {
            const int64_t lane = rows_p[i] & (LANES - 1);
            const int q = (int)(sub_ent[i] % K);
            auto &w = occ[2 * (sb_ent[i] * LANES + lane) + (q >> 6)];
            w.fetch_or(uint64_t(1) << (q & 63), std::memory_order_relaxed);
        }
    });

    // 2. invt defaults: per (sub-block, lane) the first free position.
    std::atomic<int> bad{0};
    parallel_ranges(n_sb_pad, [&](int64_t a, int64_t b) {
        for (int64_t sb = a; sb < b; ++sb) {
            const int64_t c = sb / SUBBLOCKS, j = sb % SUBBLOCKS;
            for (int64_t lane = 0; lane < LANES; ++lane) {
                const uint64_t w0 =
                    occ[2 * (sb * LANES + lane)].load(
                        std::memory_order_relaxed);
                const uint64_t w1 =
                    occ[2 * (sb * LANES + lane) + 1].load(
                        std::memory_order_relaxed);
                // occ bits are only ever set for q < K, so the first
                // clear bit is the first free position (== K iff full).
                int q0;
                if (~w0)
                    q0 = __builtin_ctzll(~w0);
                else if (~w1)
                    q0 = 64 + __builtin_ctzll(~w1);
                else
                    q0 = 128;
                if (q0 >= K) {
                    bad.store(1, std::memory_order_relaxed);
                    q0 = 0;
                }
                std::memset(invt + ((c * LANES + lane) * CHUNK_SUB
                                    + j * LANES),
                            (int)q0, LANES);
            }
        }
    });
    if (bad.load()) return -1;

    // 3. Entry scatter into the final tile layouts.
    parallel_ranges(n, [&](int64_t a, int64_t b) {
        for (int64_t i = a; i < b; ++i) {
            const int64_t row = rows_p[i], col = cols_p[i];
            const int64_t lane = row & (LANES - 1);
            const int64_t rho = col & (LANES - 1);
            const int8_t r = (int8_t)((col % WINDOW) >> 7);
            const int64_t sb = sb_ent[i];
            const int64_t c = sb / SUBBLOCKS;
            const int64_t jj = (sb % SUBBLOCKS) * LANES + sub_ent[i];
            idx1t[(c * LANES + rho) * CHUNK_SUB + jj] = r;
            idx2[(c * CHUNK_SUB + jj) * LANES + lane] = (int8_t)rho;
            vals_out[(c * CHUNK_SUB + jj) * LANES + lane] = vals[i];
            const int64_t d = (row >> 7) - gbase_pad[sb];
            invt[(c * LANES + lane) * CHUNK_SUB
                 + (sb % SUBBLOCKS) * LANES + d] =
                (int8_t)(sub_ent[i] % K);
        }
    });
    return 0;
}

/* Aligned tile fill.  s_ent: global slot sublane per entry (already
 * chunk-padded).  Outputs zeroed by the caller. */
int64_t hprlp_lane_fill_aligned(
    int64_t n, const int64_t *rows_p, const int64_t *cols_p,
    const double *vals, const int64_t *s_ent, int64_t t_pad,
    int8_t *idx1t, int8_t *idx2, double *vals_out) {
    const size_t slots = (size_t)t_pad * LANES;
    advise_huge(idx1t, slots);
    advise_huge(idx2, slots);
    advise_huge(vals_out, slots * sizeof(double));
    std::atomic<int> oob{0};
    parallel_ranges(n, [&](int64_t a, int64_t b) {
        for (int64_t i = a; i < b; ++i)
            if (s_ent[i] < 0 || s_ent[i] >= t_pad) {
                oob.store(1, std::memory_order_relaxed);
                return;
            }
    });
    if (oob.load()) return -2;
    parallel_ranges(n, [&](int64_t a, int64_t b) {
        for (int64_t i = a; i < b; ++i) {
            const int64_t row = rows_p[i], col = cols_p[i];
            const int64_t lane = row & (LANES - 1);
            const int64_t rho = col & (LANES - 1);
            const int8_t r = (int8_t)((col % WINDOW) >> 7);
            const int64_t s = s_ent[i];
            const int64_t c = s / CHUNK_SUB;
            const int64_t jj = s % CHUNK_SUB;
            idx1t[(c * LANES + rho) * CHUNK_SUB + jj] = r;
            idx2[(c * CHUNK_SUB + jj) * LANES + lane] = (int8_t)rho;
            vals_out[(c * CHUNK_SUB + jj) * LANES + lane] = vals[i];
        }
    });
    return 0;
}

}  // extern "C"
