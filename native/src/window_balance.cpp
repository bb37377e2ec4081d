/* Window-balancing greedy assignment for the LaneELL layout.
 *
 * The LaneELL kernel's cost is crossbar-gather-bound: total slot sublanes
 * = sum over (x-window, 16384-row block) of the block's MAX per-row entry
 * count in that window, times 128 (ops/lane_ell.py aligned placement).
 * A random column order gives Poisson-tailed per-(row, window) counts
 * (max ~4x the mean), so spreading each row's entries evenly across the
 * windows cuts the kernel time almost proportionally.
 *
 * This greedy assigns items (columns of the matrix being scheduled) to
 * position "cells" (bucket-range x window intersections, so the bucketed
 * ELL layout's contiguity is preserved).  Items are processed in a
 * caller-chosen order (descending nnz = classic LPT); each item picks the
 * candidate cell minimising sum_partners 4^count[partner][window] — the
 * exponential makes the marginal cost approximate min-max balancing.
 *
 * No reference counterpart: the reference's cuSPARSE SpMV is insensitive
 * to column order (SURVEY §2.3); this is TPU-layout-specific work.
 */

#include <stdint.h>
#ifdef __linux__
#include <sys/mman.h>
#endif

#include <cmath>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

/* n_items: items to place (rows of the OTHER matrix's CSR = this space).
 * indptr/partners: CSR adjacency item -> partner ids (n_partners total).
 * order: processing order over items (e.g. descending degree).
 * item_cell_lo/hi: per item, the INCLUSIVE cell-id range it may occupy
 *   (the cells of its bucket).
 * cell_window: per cell, the window id (0..n_windows-1).
 * cell_cap: per cell, remaining capacity; CONSUMED by this call.
 * cell_bias: optional (may be NULL) additive score bias per cell —
 *   spill cells get a huge bias so they are used only when every
 *   unbiased candidate is full.
 * item_cell: out, chosen cell per item.
 * n_sweeps: extra remove-and-reinsert refinement passes (the first
 *   placement is order-dependent; one or two sweeps shave the tail).
 * Returns 0, or -1 if capacities were insufficient (caller bug). */
int64_t hpres_balance_cells(int64_t n_items, const int64_t *indptr,
                            const int32_t *partners, int64_t n_partners,
                            const int64_t *order,
                            const int32_t *item_cell_lo,
                            const int32_t *item_cell_hi,
                            const int32_t *cell_window, int64_t *cell_cap,
                            const double *cell_bias, int64_t n_cells,
                            int32_t n_windows, int32_t n_sweeps,
                            int32_t *item_cell) {
    (void)n_cells;
    // Counts saturate at 250 (a per-(partner, window) count anywhere
    // near it means the balance is hopeless anyway, and the score
    // already saturates at 4^25); uint8 keeps each partner's count row
    // to one or two cache lines.
    std::vector<uint8_t> cnt((size_t)n_partners * n_windows, 0);
#ifdef __linux__
    // The count table is hundreds of MB at 50M+ nnz and accessed by
    // random partner row — transparent hugepages cut the TLB-miss
    // latency that dominates the scoring loop.
    {
        const uintptr_t a = ((uintptr_t)cnt.data() + 4095) & ~(uintptr_t)4095;
        const uintptr_t end = (uintptr_t)(cnt.data() + cnt.size()) & ~(uintptr_t)4095;
        if (end > a) madvise((void *)a, end - a, MADV_HUGEPAGE);
    }
#endif
    // Score per WINDOW first (one contiguous pass over each partner's
    // count row), then scan the candidate cells against the window
    // scores.  The previous cell-major order walked every partner row
    // with stride n_windows per candidate.  The per-count term is
    // 4^min(v, 25) = 2^(2v) built directly in the double's exponent
    // field — branch-free integer ops the compiler vectorizes (a
    // lookup-table gather measured ~2x slower at 52M nnz).  4^count:
    // a steep marginal cost approximates min-max balancing (2^count
    // measured ~25% worse block maxima).
    std::vector<double> wscore(n_windows);
    const auto place = [&](int64_t it) -> bool {
        const int32_t lo = item_cell_lo[it], hi = item_cell_hi[it];
        int32_t best = -1;
        double best_s = 0.0;
        if (hi > lo) {
            for (int32_t w = 0; w < n_windows; ++w) wscore[w] = 0.0;
            for (int64_t e = indptr[it]; e < indptr[it + 1]; ++e) {
                const uint8_t *row =
                    &cnt[(size_t)partners[e] * n_windows];
                for (int32_t w = 0; w < n_windows; ++w) {
                    uint64_t v = row[w];
                    if (v > 25) v = 25;
                    const uint64_t bits = (1023 + 2 * v) << 52;
                    double d;
                    std::memcpy(&d, &bits, sizeof d);
                    wscore[w] += d;
                }
            }
            for (int32_t c = lo; c <= hi; ++c) {
                if (cell_cap[c] <= 0) continue;
                const double s = wscore[cell_window[c]]
                                 + (cell_bias ? cell_bias[c] : 0.0);
                if (best < 0 || s < best_s) {
                    best = c;
                    best_s = s;
                }
            }
        } else if (hi == lo && cell_cap[lo] > 0) {
            best = lo;
        }
        if (best < 0) return false;
        item_cell[it] = best;
        cell_cap[best]--;
        const int32_t w = cell_window[best];
        for (int64_t e = indptr[it]; e < indptr[it + 1]; ++e) {
            uint8_t &v = cnt[(size_t)partners[e] * n_windows + w];
            if (v < 250) v++;
        }
        return true;
    };
    const auto remove = [&](int64_t it) {
        const int32_t c = item_cell[it];
        cell_cap[c]++;
        const int32_t w = cell_window[c];
        for (int64_t e = indptr[it]; e < indptr[it + 1]; ++e) {
            uint8_t &v = cnt[(size_t)partners[e] * n_windows + w];
            if (v > 0) v--;
        }
    };
    // Prefetch the NEXT item's partner rows while scoring the current
    // one: the random row fetches are latency-bound (the scoring math is
    // vectorized and cheap), so overlapping one item ahead nearly
    // doubles throughput on large tables.
    const auto prefetch_item = [&](int64_t it) {
        for (int64_t e = indptr[it]; e < indptr[it + 1]; ++e) {
            const uint8_t *row = &cnt[(size_t)partners[e] * n_windows];
            __builtin_prefetch(row, 0, 1);
            if (n_windows > 64) __builtin_prefetch(row + 64, 0, 1);
        }
    };

    // --- Blocked-parallel mode for LARGE calls (the whole-space window
    // layout: millions of items): scoring is memory-latency-bound on
    // random count-row fetches, so threads score a BLOCK of items
    // against the block-start counts while the commit (cap check +
    // count update, cheap) stays serial in the caller's order.  Scores
    // are stale by at most one block of placements; the refinement
    // sweeps use an exact self-contribution correction for the item's
    // current window.  Deterministic for any thread count (each score
    // reads only block-start state; commit order is fixed).
    // Threshold chosen above every benchmark config's space size (the
    // 10.5M-nnz huge config has 524288 items): those keep the exact
    // serial placement; the parallel mode's placement is ~2-3% worse in
    // chunk count (block-stale scores) and only pays off in the 50M+
    // regime where serial balancing takes minutes.
    const int64_t PAR_MIN_ITEMS = 600000;
    unsigned hw = std::thread::hardware_concurrency();
    const int n_threads = (int)std::min(16u, hw ? hw : 1u);
    if (n_items > PAR_MIN_ITEMS && n_windows > 1 && n_threads > 1) {
        const int64_t B = 2048;
        std::vector<double> scores((size_t)B * n_windows);
        int64_t ramp = 256;  // early blocks small: the heaviest items
                             // place against fresh counts (a full-size
                             // first block scores all-zero counts, ties
                             // everywhere, and clumps)
        const auto score_one = [&](int64_t t, int64_t base) {
            const int64_t it = order[t];
            double *ws = &scores[(size_t)(t - base) * n_windows];
            for (int32_t w = 0; w < n_windows; ++w) ws[w] = 0.0;
            for (int64_t e = indptr[it]; e < indptr[it + 1]; ++e) {
                const uint8_t *row = &cnt[(size_t)partners[e] * n_windows];
                __builtin_prefetch(row, 0, 3);
                if (n_windows > 64) __builtin_prefetch(row + 64, 0, 3);
            }
            for (int64_t e = indptr[it]; e < indptr[it + 1]; ++e) {
                const uint8_t *row = &cnt[(size_t)partners[e] * n_windows];
                for (int32_t w = 0; w < n_windows; ++w) {
                    uint64_t v = row[w];
                    if (v > 25) v = 25;
                    const uint64_t bits = (1023 + 2 * v) << 52;
                    double d;
                    std::memcpy(&d, &bits, sizeof d);
                    ws[w] += d;
                }
            }
        };
        const auto pass = [&](bool sweep) -> bool {
            int64_t bsz = sweep ? B : ramp;
            for (int64_t blk = 0; blk < n_items; blk += bsz,
                         bsz = std::min(B, bsz * 2)) {
                const int64_t end = std::min(n_items, blk + bsz);
                const int64_t span = end - blk;
                std::vector<std::thread> pool;
                const int64_t per = (span + n_threads - 1) / n_threads;
                for (int th = 0; th < n_threads; ++th) {
                    const int64_t a = blk + th * per;
                    const int64_t b = std::min(end, a + per);
                    if (a >= b) break;
                    pool.emplace_back([&, a, b] {
                        for (int64_t t = a; t < b; ++t) score_one(t, blk);
                    });
                }
                for (auto &t : pool) t.join();
                for (int64_t t = blk; t < end; ++t) {
                    const int64_t it = order[t];
                    double *ws = &scores[(size_t)(t - blk) * n_windows];
                    if (sweep) {
                        const int32_t w_cur = cell_window[item_cell[it]];
                        remove(it);
                        // The stored score for w_cur includes this item's
                        // own placement; subtract its marginal terms
                        // (4^(v+1) - 4^v at the post-remove counts).
                        double corr = 0.0;
                        for (int64_t e = indptr[it]; e < indptr[it + 1];
                             ++e) {
                            uint64_t v = cnt[(size_t)partners[e]
                                             * n_windows + w_cur];
                            if (v >= 25) continue;  // saturated: no delta
                            corr += std::ldexp(3.0, 2 * (int)v);
                        }
                        ws[w_cur] -= corr;
                    }
                    const int32_t lo = item_cell_lo[it],
                                  hi = item_cell_hi[it];
                    int32_t best = -1;
                    double best_s = 0.0;
                    // Rotating tie-break: with block-stale scores, ties
                    // are common (every item of the first block sees
                    // zero counts); always taking the lowest cell would
                    // clump them into one window.
                    const int32_t range = hi - lo + 1;
                    const int32_t start = (int32_t)(t % range);
                    for (int32_t k = 0; k < range; ++k) {
                        const int32_t c = lo + (start + k >= range
                                                ? start + k - range
                                                : start + k);
                        if (cell_cap[c] <= 0) continue;
                        const double s = ws[cell_window[c]]
                                         + (cell_bias ? cell_bias[c] : 0.0);
                        if (best < 0 || s < best_s) {
                            best = c;
                            best_s = s;
                        }
                    }
                    if (best < 0) return false;
                    item_cell[it] = best;
                    cell_cap[best]--;
                    const int32_t w = cell_window[best];
                    for (int64_t e = indptr[it]; e < indptr[it + 1]; ++e) {
                        uint8_t &v =
                            cnt[(size_t)partners[e] * n_windows + w];
                        if (v < 250) v++;
                    }
                }
            }
            return true;
        };
        if (!pass(false)) return -1;
        for (int32_t s = 0; s < n_sweeps; ++s)
            if (!pass(true)) return -1;
        return 0;
    }

    for (int64_t t = 0; t < n_items; ++t) {
        if (t + 1 < n_items) prefetch_item(order[t + 1]);
        if (!place(order[t])) return -1;
    }
    for (int32_t s = 0; s < n_sweeps; ++s) {
        for (int64_t t = 0; t < n_items; ++t) {
            if (t + 1 < n_items) prefetch_item(order[t + 1]);
            const int64_t it = order[t];
            remove(it);
            place(it);  // a slot is always free: its own
        }
    }
    return 0;
}

}  // extern "C"
