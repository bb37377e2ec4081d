// Multithreaded host scaling for the giant-LP lane-first ingest.
//
// C++ twin of the MATRIX passes of hprlp_tpu/solver/host_scaling.py
// (itself pass-for-pass parity with the device pipeline and the
// reference's src/scaling.cu:88-216, including the quirks: sqrt factors
// clamped at <1e-15 -> 1, column norms measured before the pass's row
// scaling lands, Curtis-Reid on the ORIGINAL values with exp-clamped
// factors).  The numpy implementation walks ~40 gather+reduce passes over
// the nnz arrays single-threaded (measured 26.6 s at 28M nnz, ~250 s at
// 113M); these loops are memory-bound and trivially parallel over
// rows/cols, so this native version runs them on a thread pool in-place.
//
// The VECTOR stages (AL/AU/l/u/c scaling, b/c norm scaling, conceptual-b
// norms) stay in Python: they are O(m+n) numpy one-liners and keeping
// them there preserves the tested code path bit-for-bit.
//
// Summation-order parity: every per-row reduction iterates the row's
// entries in index order, exactly like numpy's add.reduceat /
// maximum.reduceat, so factors agree with the numpy twin to the last few
// ulps (the cross-check test asserts 1e-12 relative).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <mutex>
#include <thread>
#include <vector>

namespace {

template <class F>
void parallel_range(int64_t n, F f) {
    unsigned hw = std::thread::hardware_concurrency();
    int nt = (int)std::min<int64_t>(hw ? hw : 1,
                                    std::max<int64_t>(1, n / 8192));
    nt = std::min(nt, 16);
    if (nt <= 1) {
        f(0, n);
        return;
    }
    std::vector<std::thread> ts;
    int64_t chunk = (n + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
        int64_t lo = t * chunk, hi = std::min<int64_t>(n, lo + chunk);
        if (lo >= hi) break;
        ts.emplace_back([=] { f(lo, hi); });
    }
    for (auto &th : ts) th.join();
}

inline double sqrt_clamped(double x) {
    double s = std::sqrt(x);
    return s < 1e-15 ? 1.0 : s;
}

// t_out[i] = (base_sum[i] - sum_{k in row i} t_other[idx[k]]) / cnt[i],
// 0 for empty rows — one Curtis-Reid half-sweep.
void cr_half_sweep(int64_t m, const int64_t *ptr, const int32_t *idx,
                   const double *base_sum, const double *t_other,
                   double *t_out) {
    parallel_range(m, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
            const int64_t b = ptr[i], e = ptr[i + 1];
            if (b == e) {
                t_out[i] = 0.0;
                continue;
            }
            double s = 0.0;
            for (int64_t k = b; k < e; ++k) s += t_other[idx[k]];
            t_out[i] = (base_sum[i] - s) / (double)(e - b);
        }
    });
}

// Per-row reduce of |vals| with op = max (kind 0) or sum (kind 1).
void row_reduce_abs(int64_t m, const int64_t *ptr, const double *vals,
                    int kind, double *out) {
    parallel_range(m, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
            const int64_t b = ptr[i], e = ptr[i + 1];
            double r = 0.0;
            if (kind == 0) {
                for (int64_t k = b; k < e; ++k)
                    r = std::max(r, std::fabs(vals[k]));
            } else {
                for (int64_t k = b; k < e; ++k) r += std::fabs(vals[k]);
            }
            out[i] = r;
        }
    });
}

// vals[k] *= f_row[row(k)] * f_col[col(k)]  (mode 0: multiply by product;
// mode 1: multiply by 1/(product) — matches numpy's  v *= 1.0/(a*b)).
void scale_entries(int64_t m, const int64_t *ptr, const int32_t *idx,
                   double *vals, const double *f_row, const double *f_col,
                   int mode) {
    parallel_range(m, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
            const double fr = f_row[i];
            for (int64_t k = ptr[i]; k < ptr[i + 1]; ++k) {
                const double p = fr * f_col[idx[k]];
                vals[k] *= (mode == 0) ? p : 1.0 / p;
            }
        }
    });
}

}  // namespace

extern "C" int hprlp_scale_matrix(
    int64_t m, int64_t n,
    const int64_t *a_ptr, const int32_t *a_idx, double *av,
    const int64_t *at_ptr, const int32_t *at_idx, double *atv,
    int use_cr, int use_ruiz, int use_pc,
    int cr_iters, int ruiz_iters,
    double *row_norm, double *col_norm) {
    std::vector<double> t1(m), t2(n);

    for (int64_t i = 0; i < m; ++i) row_norm[i] = 1.0;
    for (int64_t j = 0; j < n; ++j) col_norm[j] = 1.0;

    if (use_cr) {
        // Row/col sums of -log|a| on the ORIGINAL values (constant
        // across sweeps), then cr_iters alternating half-sweeps.
        std::vector<double> rsum(m), csum(n);
        parallel_range(m, [&](int64_t lo, int64_t hi) {
            for (int64_t i = lo; i < hi; ++i) {
                double s = 0.0;
                for (int64_t k = a_ptr[i]; k < a_ptr[i + 1]; ++k)
                    s += -std::log(std::max(std::fabs(av[k]), 1e-300));
                rsum[i] = s;
            }
        });
        parallel_range(n, [&](int64_t lo, int64_t hi) {
            for (int64_t j = lo; j < hi; ++j) {
                double s = 0.0;
                for (int64_t k = at_ptr[j]; k < at_ptr[j + 1]; ++k)
                    s += -std::log(std::max(std::fabs(atv[k]), 1e-300));
                csum[j] = s;
            }
        });
        std::fill(t1.begin(), t1.end(), 0.0);
        std::fill(t2.begin(), t2.end(), 0.0);
        for (int it = 0; it < cr_iters; ++it) {
            cr_half_sweep(m, a_ptr, a_idx, rsum.data(), t2.data(),
                          t1.data());
            cr_half_sweep(n, at_ptr, at_idx, csum.data(), t1.data(),
                          t2.data());
        }
        parallel_range(m, [&](int64_t lo, int64_t hi) {
            for (int64_t i = lo; i < hi; ++i) {
                t1[i] = std::min(std::max(std::exp(t1[i]), 1e-30), 1e30);
                row_norm[i] /= t1[i];
            }
        });
        parallel_range(n, [&](int64_t lo, int64_t hi) {
            for (int64_t j = lo; j < hi; ++j) {
                t2[j] = std::min(std::max(std::exp(t2[j]), 1e-30), 1e30);
                col_norm[j] /= t2[j];
            }
        });
        scale_entries(m, a_ptr, a_idx, av, t1.data(), t2.data(), 0);
        scale_entries(n, at_ptr, at_idx, atv, t2.data(), t1.data(), 0);
    }

    if (use_ruiz) {
        for (int it = 0; it < ruiz_iters; ++it) {
            row_reduce_abs(m, a_ptr, av, 0, t1.data());
            // Column norms from AT BEFORE this pass's row scaling lands
            // (reference ordering, src/scaling.cu:127-144).
            row_reduce_abs(n, at_ptr, atv, 0, t2.data());
            parallel_range(m, [&](int64_t lo, int64_t hi) {
                for (int64_t i = lo; i < hi; ++i) {
                    t1[i] = sqrt_clamped(t1[i]);
                    row_norm[i] *= t1[i];
                }
            });
            parallel_range(n, [&](int64_t lo, int64_t hi) {
                for (int64_t j = lo; j < hi; ++j) {
                    t2[j] = sqrt_clamped(t2[j]);
                    col_norm[j] *= t2[j];
                }
            });
            scale_entries(m, a_ptr, a_idx, av, t1.data(), t2.data(), 1);
            scale_entries(n, at_ptr, at_idx, atv, t2.data(), t1.data(), 1);
        }
    }

    if (use_pc) {
        row_reduce_abs(m, a_ptr, av, 1, t1.data());
        row_reduce_abs(n, at_ptr, atv, 1, t2.data());
        parallel_range(m, [&](int64_t lo, int64_t hi) {
            for (int64_t i = lo; i < hi; ++i) {
                t1[i] = sqrt_clamped(t1[i]);
                row_norm[i] *= t1[i];
            }
        });
        parallel_range(n, [&](int64_t lo, int64_t hi) {
            for (int64_t j = lo; j < hi; ++j) {
                t2[j] = sqrt_clamped(t2[j]);
                col_norm[j] *= t2[j];
            }
        });
        scale_entries(m, a_ptr, a_idx, av, t1.data(), t2.data(), 1);
        scale_entries(n, at_ptr, at_idx, atv, t2.data(), t1.data(), 1);
    }

    return 0;
}

// ---------------------------------------------------------------------------
// Parallel index sort by uint64 key (the schedulers' lexsort replacement).
//
// np.lexsort over the 28M-entry (cell, row, col) triple measured ~14 s of
// the quarter-scale giant ingest; the schedulers only need ANY ascending
// order of the composite int64 key (coordinate triples are unique after
// duplicate summing), so: bucket by the key's top bits (parallel
// histogram + scatter), then std::sort each bucket in parallel.
// ---------------------------------------------------------------------------

#include <cstring>
#include <sys/mman.h>

/* Parallel stable LSD radix sort on (key, idx) pairs, 16-bit digits with
 * trivial-digit skipping.  The range-bucketed path below collapses when
 * keys CLUSTER (the lane schedulers' (cell, row, col) composites put
 * most entries into a handful of value-range buckets, leaving one giant
 * comparison sort: measured 24 s at 113M keys vs ~4 s here).  Stability
 * per pass: threads own contiguous input ranges and the scatter cursors
 * are laid out (digit, thread)-major. */
namespace {

struct KIdx {
    uint64_t key;
    int64_t idx;
};

void radix_sort_pairs(const uint64_t *keys, int64_t n, int64_t *out_idx) {
    constexpr int D = 1 << 16;
    unsigned hw = std::thread::hardware_concurrency();
    const int T = (int)std::min<int64_t>(hw ? hw : 1, 8);
    std::vector<std::pair<int64_t, int64_t>> spans;
    for (int t = 0; t < T; ++t) {
        int64_t lo = n * t / T, hi = n * (t + 1) / T;
        if (lo < hi) spans.emplace_back(lo, hi);
    }
    const int NT = (int)spans.size();

    // mmap + MADV_HUGEPAGE + PARALLEL first touch: page-zero faulting on
    // the target VMs is single-thread-bound (~130 MB/s measured — a
    // std::vector<KIdx>(n) pair cost 25 s at 113M keys); hugepages +
    // 4-thread touch bring the same 3.6 GB to ~0.2 s.  The buffers are
    // CACHED across calls (one mutex-guarded arena): the giant ingest
    // sorts 4+ key sets of the same magnitude, and re-faulting fresh
    // mappings cost ~8 s per call even hugepage-backed.
    static std::mutex arena_mu;
    static KIdx *arena = nullptr;
    static size_t arena_cap = 0;
    const size_t bytes = (size_t)n * sizeof(KIdx);
    // Held for the WHOLE sort: the arena is shared state.  Concurrent
    // sorts (none today — the schedulers sort from the orchestrating
    // thread) would serialize here rather than corrupt.
    std::unique_lock<std::mutex> lk(arena_mu);
    if (arena_cap < 2 * bytes) {
        if (arena) munmap(arena, arena_cap);
        arena_cap = 2 * bytes;
        arena = (KIdx *)mmap(nullptr, arena_cap, PROT_READ | PROT_WRITE,
                             MAP_PRIVATE | MAP_ANONYMOUS, -1, 0);
        if (arena == MAP_FAILED) {
            arena = nullptr;
            arena_cap = 0;
        } else {
            madvise(arena, arena_cap, MADV_HUGEPAGE);
        }
    }
    if (!arena) {
        // Degenerate fallback: comparison sort (no extra memory).
        for (int64_t i = 0; i < n; ++i) out_idx[i] = i;
        std::sort(out_idx, out_idx + n, [&](int64_t x, int64_t y) {
            return keys[x] < keys[y];
        });
        return;
    }
    KIdx *a = arena, *b = arena + n;
    {
        std::vector<std::thread> ts;
        for (int t = 0; t < NT; ++t)
            ts.emplace_back([&, t] {
                // First touch of BOTH buffers on this thread's range
                // (the scatter writes b in digit order — cross-thread —
                // so pre-touch here keeps faulting parallel).
                char *pb = (char *)(b + spans[t].first);
                const size_t span_b =
                    (size_t)(spans[t].second - spans[t].first)
                    * sizeof(KIdx);
                for (size_t o = 0; o < span_b; o += 4096) pb[o] = 0;
                for (int64_t i = spans[t].first; i < spans[t].second; ++i)
                    a[i] = {keys[i], i};
            });
        for (auto &th : ts) th.join();
    }

    KIdx *src = a, *dst = b;
    std::vector<std::vector<int64_t>> hist(NT);
    std::vector<int64_t> cur(NT * (int64_t)D);
    for (int pass = 0; pass < 4; ++pass) {
        const int shift = 16 * pass;
        // Per-thread histogram of this digit on the CURRENT order.
        {
            std::vector<std::thread> ts;
            for (int t = 0; t < NT; ++t)
                ts.emplace_back([&, t, shift] {
                    auto &h = hist[t];
                    h.assign(D, 0);
                    for (int64_t i = spans[t].first; i < spans[t].second;
                         ++i)
                        h[(src[i].key >> shift) & 0xffff]++;
                });
            for (auto &th : ts) th.join();
        }
        // Skip digits where every key agrees (common in the high
        // passes of the schedulers' composites).
        int nz = 0;
        for (int d = 0; d < D && nz <= 1; ++d) {
            int64_t c = 0;
            for (int t = 0; t < NT; ++t) c += hist[t][d];
            if (c) ++nz;
        }
        if (nz <= 1) continue;
        // (digit, thread)-major exclusive prefix -> per-thread cursors.
        int64_t acc = 0;
        for (int d = 0; d < D; ++d)
            for (int t = 0; t < NT; ++t) {
                cur[(int64_t)t * D + d] = acc;
                acc += hist[t][d];
            }
        std::vector<std::thread> ts;
        for (int t = 0; t < NT; ++t)
            ts.emplace_back([&, t, shift] {
                int64_t *c = &cur[(int64_t)t * D];
                for (int64_t i = spans[t].first; i < spans[t].second;
                     ++i) {
                    const KIdx &e = src[i];
                    dst[c[(e.key >> shift) & 0xffff]++] = e;
                }
            });
        for (auto &th : ts) th.join();
        std::swap(src, dst);
    }
    {
        std::vector<std::thread> ts;
        for (int t = 0; t < NT; ++t)
            ts.emplace_back([&, t] {
                for (int64_t i = spans[t].first; i < spans[t].second; ++i)
                    out_idx[i] = src[i].idx;
            });
        for (auto &th : ts) th.join();
    }
    // a/b live in the cached arena — no unmap.
}

}  // namespace

extern "C" int hprlp_sort_index_u64(const uint64_t *keys, int64_t n,
                                    int64_t *out_idx) {
    if (n <= 0) return 0;
    if (n < (1 << 16)) {
        for (int64_t i = 0; i < n; ++i) out_idx[i] = i;
        std::sort(out_idx, out_idx + n, [&](int64_t a, int64_t b) {
            return keys[a] < keys[b];
        });
        return 0;
    }
    if (n >= (int64_t)8'000'000) {
        radix_sort_pairs(keys, n, out_idx);
        return 0;
    }
    uint64_t kmin = keys[0], kmax = keys[0];
    {
        std::vector<uint64_t> mins(16, ~0ull), maxs(16, 0);
        parallel_range(n, [&](int64_t lo, int64_t hi) {
            uint64_t mn = ~0ull, mx = 0;
            for (int64_t i = lo; i < hi; ++i) {
                mn = std::min(mn, keys[i]);
                mx = std::max(mx, keys[i]);
            }
            size_t slot = (size_t)(lo * 16 / (n ? n : 1)) % 16;
            mins[slot] = std::min(mins[slot], mn);
            maxs[slot] = std::max(maxs[slot], mx);
        });
        for (int t = 0; t < 16; ++t) {
            kmin = std::min(kmin, mins[t]);
            kmax = std::max(kmax, maxs[t]);
        }
    }
    const uint64_t range = kmax - kmin;
    int shift = 0;
    const int B_BITS = 11;  // 2048 buckets
    while ((range >> shift) >= (1ull << B_BITS)) ++shift;
    const int64_t n_buckets = (int64_t)(range >> shift) + 1;

    // Histogram (per-thread), exclusive prefix, scatter.
    const int nt = 4;
    std::vector<std::vector<int64_t>> hist(nt);
    std::vector<std::pair<int64_t, int64_t>> spans;
    {
        int64_t chunk = (n + nt - 1) / nt;
        for (int t = 0; t < nt; ++t) {
            int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
            if (lo < hi) spans.emplace_back(lo, hi);
        }
    }
    {
        std::vector<std::thread> ts;
        for (size_t t = 0; t < spans.size(); ++t)
            ts.emplace_back([&, t] {
                auto &h = hist[t];
                h.assign(n_buckets, 0);
                for (int64_t i = spans[t].first; i < spans[t].second; ++i)
                    h[(keys[i] - kmin) >> shift]++;
            });
        for (auto &th : ts) th.join();
    }
    std::vector<int64_t> bstart(n_buckets + 1, 0);
    {
        int64_t acc = 0;
        for (int64_t b = 0; b < n_buckets; ++b) {
            bstart[b] = acc;
            for (size_t t = 0; t < spans.size(); ++t) {
                int64_t c = hist[t][b];
                hist[t][b] = acc;  // becomes the scatter cursor
                acc += c;
            }
        }
        bstart[n_buckets] = acc;
    }
    // Scatter (key, idx) PAIRS into bucket order, then sort each bucket
    // on the contiguous pairs.  The earlier per-bucket std::sort over
    // out_idx compared through keys[a] indirection — random 8-byte reads
    // per comparison dominated the whole sort (measured ~2x slower than
    // this pair layout at 28M keys).
    struct Pair {
        uint64_t key;
        int64_t idx;
    };
    std::vector<Pair> pairs(n);
    {
        std::vector<std::thread> ts;
        for (size_t t = 0; t < spans.size(); ++t)
            ts.emplace_back([&, t] {
                auto &cur = hist[t];
                for (int64_t i = spans[t].first; i < spans[t].second; ++i) {
                    Pair &p = pairs[cur[(keys[i] - kmin) >> shift]++];
                    p.key = keys[i];
                    p.idx = i;
                }
            });
        for (auto &th : ts) th.join();
    }
    // Sort each bucket (work-stealing) and emit indices.
    std::atomic<int64_t> next{0};
    auto worker = [&] {
        while (true) {
            int64_t b = next.fetch_add(1);
            if (b >= n_buckets) break;
            int64_t lo = bstart[b], hi = bstart[b + 1];
            if (hi - lo > 1)
                std::sort(pairs.begin() + lo, pairs.begin() + hi,
                          [](const Pair &a, const Pair &c) {
                              return a.key < c.key;
                          });
            for (int64_t i = lo; i < hi; ++i) out_idx[i] = pairs[i].idx;
        }
    };
    std::vector<std::thread> pool;
    unsigned hw = std::thread::hardware_concurrency();
    for (unsigned t = 0; t < std::min(hw ? hw : 1u, 16u); ++t)
        pool.emplace_back(worker);
    for (auto &th : pool) th.join();
    return 0;
}

/* Parallel permutation gathers for the lane schedulers: out[i] =
 * src[idx[i]].  numpy fancy indexing holds the GIL and runs single-
 * threaded — at giant nnz the three reorder gathers after the schedule
 * sort were a measurable serial slice (round-5 profile: ~2.5 s of a
 * ~10 s thin schedule at 28M nnz on a 4-core host). */
namespace {
template <typename T>
void gather_par(const T *src, const int64_t *idx, int64_t n, T *out) {
    if (n <= 0) return;
    unsigned hw = std::thread::hardware_concurrency();
    unsigned nt = std::min<unsigned>(hw ? hw : 1, 16);
    if (n < (1 << 18) || nt <= 1) {
        for (int64_t i = 0; i < n; ++i) out[i] = src[idx[i]];
        return;
    }
    std::vector<std::thread> ts;
    for (unsigned t = 0; t < nt; ++t) {
        const int64_t lo = n * t / nt, hi = n * (t + 1) / nt;
        ts.emplace_back([=] {
            for (int64_t i = lo; i < hi; ++i) out[i] = src[idx[i]];
        });
    }
    for (auto &th : ts) th.join();
}
}  // namespace

extern "C" void hprlp_gather_i64(const int64_t *src, const int64_t *idx,
                                 int64_t n, int64_t *out) {
    gather_par(src, idx, n, out);
}

extern "C" void hprlp_gather_f64(const double *src, const int64_t *idx,
                                 int64_t n, double *out) {
    gather_par(src, idx, n, out);
}
