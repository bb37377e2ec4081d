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

#include <cmath>
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
    std::vector<uint16_t> cnt((size_t)n_partners * n_windows, 0);
    // 4^min(v, 25): exponential marginal cost saturating well below
    // double overflow.
    const auto place = [&](int64_t it) -> bool {
        const int32_t lo = item_cell_lo[it], hi = item_cell_hi[it];
        int32_t best = -1;
        double best_s = 0.0;
        for (int32_t c = lo; c <= hi; ++c) {
            if (cell_cap[c] <= 0) continue;
            const int32_t w = cell_window[c];
            double s = cell_bias ? cell_bias[c] : 0.0;
            for (int64_t e = indptr[it]; e < indptr[it + 1]; ++e) {
                const unsigned v =
                    cnt[(size_t)partners[e] * n_windows + w];
                // 4^count: a steep marginal cost approximates min-max
                // balancing (2^count measured ~25% worse block maxima).
                s += std::ldexp(1.0, v > 25 ? 50 : 2 * (int)v);
            }
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
            uint16_t &v = cnt[(size_t)partners[e] * n_windows + w];
            if (v < 65535) v++;
        }
        return true;
    };
    const auto remove = [&](int64_t it) {
        const int32_t c = item_cell[it];
        cell_cap[c]++;
        const int32_t w = cell_window[c];
        for (int64_t e = indptr[it]; e < indptr[it + 1]; ++e) {
            uint16_t &v = cnt[(size_t)partners[e] * n_windows + w];
            if (v > 0) v--;
        }
    };
    for (int64_t t = 0; t < n_items; ++t)
        if (!place(order[t])) return -1;
    for (int32_t s = 0; s < n_sweeps; ++s) {
        for (int64_t t = 0; t < n_items; ++t) {
            const int64_t it = order[t];
            remove(it);
            place(it);  // a slot is always free: its own
        }
    }
    return 0;
}

}  // extern "C"
