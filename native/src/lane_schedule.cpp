/* LaneELL scheduler — native implementation of
 * hprlp_tpu/ops/lane_ell.py::schedule_lane_ell's inner loop.
 *
 * Assigns each sparse entry a slot sublane such that, per sublane:
 *   - one x-window (col / 16384) only,
 *   - one output group (padded_row / 128) only,
 *   - at most one entry per output row lane (padded_row % 128),
 *   - at most one DISTINCT column per residue class (col % 128); the same
 *     column may repeat (phase-2 gather fans out).
 * Sublanes are emitted per (window, group) block in entry order; the
 * Python wrapper handles chunk padding and tile construction.
 *
 * Two quality passes beyond plain first-fit (the per-block depth lower
 * bound is Konig-style: max(per-lane entry count, per-residue distinct
 * column count); first-fit in lane order measures ~25% above it):
 *   1. Column-grouped first-fit: entries ordered by (column fan-out desc,
 *      column, lane), so a column's lanes share residue slots instead of
 *      burning one per depth.
 *   2. Targeted depth peeling: the aligned placement pays the MAX block
 *      depth per (window, 128-group range) (ops/lane_ell.py), so for each
 *      range, the blocks at the max depth try to empty their top level by
 *      relocating entries into lower depths (with one-level relocation of
 *      a blocking lane entry or residue star); when every max block
 *      sheds a level the range's cost drops by one — repeated to fixpoint.
 * Measured on the 1.3M-nnz bench matrix: A 192 -> 160 sub-blocks
 * (LB 152), AT 249 -> 220 (LB 203).
 *
 * C ABI: caller passes entries SORTED by (window, group) and receives the
 * per-entry sublane index plus per-sublane (gid, wid).
 */

#include <stdint.h>

#include <algorithm>
#include <cstring>
#include <atomic>
#include <thread>
#include <vector>

namespace {

constexpr int64_t LANES = 128;
constexpr int64_t WINDOW = LANES * LANES;

struct Level {
    uint64_t lanes[2] = {0, 0};
    int64_t rescol[LANES];
    uint16_t starcnt[LANES] = {0};
    int32_t nent = 0;
    Level() { std::fill(rescol, rescol + LANES, int64_t(-1)); }
};

struct Block {
    int32_t w = 0, g = 0;
    int64_t first = 0;  // first entry index (input order)
    int32_t n = 0;      // entry count
    int lb = 0;
    std::vector<int8_t> l;     // lane per entry
    std::vector<int16_t> rho;  // residue per entry
    std::vector<int64_t> c;    // padded column per entry
    std::vector<int16_t> depth;
    std::vector<Level> lv;

    bool lane_used(int d, int lane) const {
        return (lv[d].lanes[lane >> 6] >> (lane & 63)) & 1;
    }
    bool fits(int d, int lane, int64_t col, int r) const {
        if (lane_used(d, lane)) return false;
        const int64_t got = lv[d].rescol[r];
        return got < 0 || got == col;
    }
    void put(int d, int e) {
        Level &L = lv[d];
        L.lanes[l[e] >> 6] |= uint64_t(1) << (l[e] & 63);
        L.rescol[rho[e]] = c[e];
        L.starcnt[rho[e]]++;
        L.nent++;
        depth[e] = (int16_t)d;
    }
    void del_entry(int e) {
        Level &L = lv[depth[e]];
        L.lanes[l[e] >> 6] &= ~(uint64_t(1) << (l[e] & 63));
        if (--L.starcnt[rho[e]] == 0) L.rescol[rho[e]] = -1;
        L.nent--;
    }
    void place_first_fit(int e) {
        int d = 0;
        for (;; ++d) {
            if (d == (int)lv.size()) lv.emplace_back();
            if (fits(d, l[e], c[e], rho[e])) {
                put(d, e);
                return;
            }
        }
    }

    /* Try to place entry e at some depth < dmax, allowing one-level
     * relocation of a blocking residue star or lane entry. */
    bool try_move_down(int e, int dmax) {
        const int lane = l[e];
        const int r = rho[e];
        const int64_t col = c[e];
        for (int d = 0; d < dmax; ++d) {
            if (fits(d, lane, col, r)) {
                del_entry(e);
                put(d, e);
                return true;
            }
        }
        std::vector<int> star;
        for (int d = 0; d < dmax; ++d) {
            const bool lane_free = !lane_used(d, lane);
            const int64_t got = lv[d].rescol[r];
            if (lane_free && got >= 0 && got != col) {
                // Relocate the whole (r, got) star out of depth d.
                star.clear();
                for (int i = 0; i < n; ++i)
                    if (depth[i] == d && rho[i] == r) star.push_back(i);
                for (int d2 = 0; d2 < dmax; ++d2) {
                    if (d2 == d) continue;
                    const int64_t g2 = lv[d2].rescol[r];
                    if (g2 >= 0 && g2 != got) continue;
                    bool ok = true;
                    for (int i : star)
                        if (lane_used(d2, l[i])) { ok = false; break; }
                    if (!ok) continue;
                    for (int i : star) {
                        del_entry(i);
                        put(d2, i);
                    }
                    del_entry(e);
                    put(d, e);
                    return true;
                }
            } else if (!lane_free) {
                // Relocate the lane blocker (exactly one per depth).
                const int64_t gr = lv[d].rescol[r];
                if (gr >= 0 && gr != col) continue;
                int e2 = -1;
                for (int i = 0; i < n; ++i)
                    if (depth[i] == d && l[i] == lane) { e2 = i; break; }
                if (e2 < 0) continue;
                for (int d2 = 0; d2 < dmax; ++d2) {
                    if (d2 == d) continue;
                    if (!fits(d2, l[e2], c[e2], rho[e2])) continue;
                    del_entry(e2);
                    put(d2, e2);
                    if (fits(d, lane, col, r)) {
                        del_entry(e);
                        put(d, e);
                        return true;
                    }
                    del_entry(e2);  // undo
                    put(d, e2);
                    break;  // the only way to free this lane at d failed
                }
            }
        }
        return false;
    }

    void drop_empty_levels() {
        int out = 0;
        std::vector<int16_t> remap(lv.size());
        for (int d = 0; d < (int)lv.size(); ++d) {
            remap[d] = (int16_t)out;
            if (lv[d].nent > 0) {
                if (out != d) lv[out] = lv[d];
                ++out;
            }
        }
        lv.resize(out);
        for (int i = 0; i < n; ++i) depth[i] = remap[depth[i]];
    }

    /* Attempt to empty the top level; restores state on failure. */
    bool try_peel() {
        const int D = (int)lv.size();
        if (D <= lb) return false;
        std::vector<int16_t> d_snap = depth;
        std::vector<Level> lv_snap = lv;
        for (int e = 0; e < n; ++e) {
            if (depth[e] != D - 1) continue;
            if (!try_move_down(e, D - 1)) {
                depth.swap(d_snap);
                lv.swap(lv_snap);
                return false;
            }
        }
        lv.pop_back();
        drop_empty_levels();
        return true;
    }
};

}  // namespace

extern "C" {

/* rows_p/cols_p: padded positions, pre-sorted by (col/16384, row/128).
 * out_sub: per-entry global sublane id.
 * out_gid/out_wid: per-sublane group/window (capacity >= returned count).
 * Returns the number of sublanes, or -1 if cap was insufficient. */
int64_t hpres_lane_schedule(int64_t nnz, const int64_t *rows_p,
                            const int64_t *cols_p, int64_t *out_sub,
                            int32_t *out_gid, int32_t *out_wid,
                            int64_t cap) {
    std::vector<Block> blocks;
    // --- split into (window, group) blocks (entries pre-sorted) ---
    for (int64_t e = 0; e < nnz;) {
        const int64_t g = rows_p[e] / LANES;
        const int64_t w = cols_p[e] / WINDOW;
        int64_t b = e;
        while (b < nnz && rows_p[b] / LANES == g && cols_p[b] / WINDOW == w)
            ++b;
        Block blk;
        blk.w = (int32_t)w;
        blk.g = (int32_t)g;
        blk.first = e;
        blk.n = (int32_t)(b - e);
        blk.l.resize(blk.n);
        blk.rho.resize(blk.n);
        blk.c.resize(blk.n);
        blk.depth.assign(blk.n, 0);
        for (int i = 0; i < blk.n; ++i) {
            blk.l[i] = (int8_t)(rows_p[e + i] % LANES);
            blk.c[i] = cols_p[e + i];
            blk.rho[i] = (int16_t)(cols_p[e + i] % LANES);
        }
        blocks.push_back(std::move(blk));
        e = b;
    }

    // --- per block: LB + column-grouped descending-fan-out first-fit ---
    std::vector<int> order, lane_cnt(LANES), fan;
    std::vector<int64_t> pairs;
    for (Block &blk : blocks) {
        // fan-out per entry = #entries sharing its column in this block
        order.resize(blk.n);
        for (int i = 0; i < blk.n; ++i) order[i] = i;
        std::sort(order.begin(), order.end(), [&](int a, int b2) {
            return blk.c[a] < blk.c[b2];
        });
        fan.assign(blk.n, 0);
        for (int i = 0; i < blk.n;) {
            int j = i;
            while (j < blk.n && blk.c[order[j]] == blk.c[order[i]]) ++j;
            for (int k = i; k < j; ++k) fan[order[k]] = j - i;
            i = j;
        }
        std::sort(order.begin(), order.end(), [&](int a, int b2) {
            if (fan[a] != fan[b2]) return fan[a] > fan[b2];
            if (blk.c[a] != blk.c[b2]) return blk.c[a] < blk.c[b2];
            return blk.l[a] < blk.l[b2];
        });
        // LB: max per-lane count / per-residue distinct-column count
        std::fill(lane_cnt.begin(), lane_cnt.end(), 0);
        int lmax = 0;
        for (int i = 0; i < blk.n; ++i)
            lmax = std::max(lmax, ++lane_cnt[(uint8_t)blk.l[i]]);
        pairs.clear();
        for (int i = 0; i < blk.n; ++i)
            pairs.push_back((int64_t)blk.rho[i] << 48 | blk.c[i]);
        std::sort(pairs.begin(), pairs.end());
        pairs.erase(std::unique(pairs.begin(), pairs.end()), pairs.end());
        int rmax = 0;
        for (size_t i = 0; i < pairs.size();) {
            size_t j = i;
            while (j < pairs.size() && (pairs[j] >> 48) == (pairs[i] >> 48))
                ++j;
            rmax = std::max(rmax, (int)(j - i));
            i = j;
        }
        blk.lb = std::max(lmax, rmax);
        for (int i : order) blk.place_first_fit(i);
    }

    // --- targeted peel per (window, 128-group range) ---
    std::vector<Block *> members;
    for (size_t s = 0; s < blocks.size();) {
        const int32_t w = blocks[s].w;
        const int32_t gr = blocks[s].g / (int32_t)LANES;
        size_t t = s;
        members.clear();
        while (t < blocks.size() && blocks[t].w == w
               && blocks[t].g / (int32_t)LANES == gr)
            members.push_back(&blocks[t++]);
        for (;;) {
            int D = 0;
            for (Block *b : members) D = std::max(D, (int)b->lv.size());
            bool at_lb = false;
            for (Block *b : members)
                if ((int)b->lv.size() == D && b->lb >= D) at_lb = true;
            if (at_lb || D <= 1) break;
            bool ok = true;
            for (Block *b : members) {
                if ((int)b->lv.size() != D) continue;
                if (!b->try_peel()) { ok = false; break; }
            }
            if (!ok) break;
        }
        s = t;
    }

    // --- emit sublanes per block in input order ---
    int64_t n_sub = 0;
    for (Block &blk : blocks) {
        const int64_t base = n_sub;
        if (n_sub + (int64_t)blk.lv.size() > cap) return -1;
        for (size_t d = 0; d < blk.lv.size(); ++d) {
            out_gid[n_sub] = blk.g;
            out_wid[n_sub] = blk.w;
            ++n_sub;
        }
        for (int i = 0; i < blk.n; ++i)
            out_sub[blk.first + i] = base + blk.depth[i];
    }
    return n_sub;
}

/* Thin (packed) LaneELL packer — native implementation of
 * hprlp_tpu/ops/lane_ell.py::_pack_thin_py (identical algorithm; the
 * Python fallback and this must produce the same placement).
 *
 * Entries pre-sorted by (window, grange, row, col).  Per (window,
 * 128-group-range) cell, rows in (count desc, row) order place chunks of
 * <= phi entries at one free POSITION q (of K = 128/phi per lane) in the
 * first block that fits; the chunk's entries take distinct strata
 * sigma*K + q subject to the per-(sublane, residue) distinct-column
 * constraint; per-lane used positions are capped at K-1 so an all-zero
 * default position always exists for the kernel's inverse-permutation
 * flush.  Different chunks of one row must land in different blocks (the
 * flush maps each output row to ONE fold position per sub-block).
 *
 * rows_p/cols_p: padded positions.  out_sb/out_sub: per-entry global
 * sub-block id and sublane (sigma*K + q).  out_wid/out_gbase: per
 * sub-block window and 128-aligned group base (capacity cap).  Returns
 * the number of sub-blocks, or -1 if cap was insufficient. */
int64_t hpres_lane_pack_thin(int64_t nnz, const int64_t *rows_p,
                             const int64_t *cols_p, int32_t phi,
                             int64_t *out_sb, int32_t *out_sub,
                             int32_t *out_wid, int64_t *out_gbase,
                             int64_t cap) {
    if (phi < 1 || phi > 8 || (int64_t)LANES % phi != 0) return -1;
    const int K = (int)(LANES / phi);

    struct TBlock {
        std::vector<uint64_t> qfree;   // per lane: K-bit free-position mask
        std::vector<uint8_t> pos_cnt;  // per lane: used positions
        std::vector<uint8_t> strat;    // per (q, l): sigma bitmask
        std::vector<int64_t> rescol;   // per (sublane s, rho): column or -1
        void init(int K_, int phi_) {
            const uint64_t full = (K_ == 64) ? ~uint64_t(0)
                                             : ((uint64_t(1) << K_) - 1);
            qfree.assign(2 * LANES, 0);
            for (int l = 0; l < LANES; ++l) {
                if (K_ <= 64) {
                    qfree[2 * l] = full;
                } else {  // phi == 1, K == 128
                    qfree[2 * l] = ~uint64_t(0);
                    qfree[2 * l + 1] = (K_ == 128)
                        ? ~uint64_t(0)
                        : ((uint64_t(1) << (K_ - 64)) - 1);
                }
            }
            pos_cnt.assign(LANES, 0);
            strat.assign((size_t)K_ * LANES, 0);
            rescol.assign((size_t)LANES * LANES, -1);
        }
    };

    std::vector<TBlock> blocks;   // arena, reused across cells
    std::vector<int64_t> row_starts;
    std::vector<int> row_order;
    std::vector<int32_t> used_b;
    std::vector<int32_t> first_b(LANES);

    int64_t n_sb = 0;
    for (int64_t e = 0; e < nnz;) {
        const int64_t w = cols_p[e] / WINDOW;
        const int64_t gr = rows_p[e] / WINDOW;  // row / 16384 = grange
        int64_t cend = e;
        while (cend < nnz && cols_p[cend] / WINDOW == w
               && rows_p[cend] / WINDOW == gr)
            ++cend;
        const int64_t gbase = gr * LANES;

        // Row runs.
        row_starts.clear();
        row_starts.push_back(e);
        for (int64_t i = e + 1; i < cend; ++i)
            if (rows_p[i] != rows_p[i - 1]) row_starts.push_back(i);
        row_starts.push_back(cend);
        const int n_rows = (int)row_starts.size() - 1;
        row_order.resize(n_rows);
        for (int i = 0; i < n_rows; ++i) row_order[i] = i;
        std::sort(row_order.begin(), row_order.end(), [&](int a, int b) {
            const int64_t ca = row_starts[a + 1] - row_starts[a];
            const int64_t cb = row_starts[b + 1] - row_starts[b];
            if (ca != cb) return ca > cb;
            return rows_p[row_starts[a]] < rows_p[row_starts[b]];
        });

        int n_blk = 0;  // blocks live this cell
        std::fill(first_b.begin(), first_b.end(), 0);

        for (int ri_ = 0; ri_ < n_rows; ++ri_) {
            const int ri = row_order[ri_];
            const int64_t a = row_starts[ri], b = row_starts[ri + 1];
            const int lane = (int)(rows_p[a] % LANES);
            used_b.clear();
            for (int64_t ca = a; ca < b; ca += phi) {
                const int64_t cb = std::min(ca + phi, b);
                bool placed = false;
                for (int bi = first_b[lane]; !placed; ++bi) {
                    if (bi == n_blk) {
                        if (n_sb + n_blk + 1 > cap) return -1;
                        if (n_blk == (int)blocks.size())
                            blocks.emplace_back();
                        blocks[n_blk].init(K, phi);
                        ++n_blk;
                    }
                    TBlock &B = blocks[bi];
                    if (B.pos_cnt[lane] >= K - 1) {
                        if (bi == first_b[lane]) ++first_b[lane];
                        continue;
                    }
                    if (std::find(used_b.begin(), used_b.end(), bi)
                        != used_b.end())
                        continue;
                    // Scan free positions at this lane.
                    uint64_t m0 = B.qfree[2 * lane];
                    uint64_t m1 = B.qfree[2 * lane + 1];
                    while (m0 | m1) {
                        int q;
                        if (m0) {
                            q = __builtin_ctzll(m0);
                        } else {
                            q = 64 + __builtin_ctzll(m1);
                        }
                        // Greedy strata assignment with residue checks.
                        uint8_t smask = B.strat[(size_t)q * LANES + lane];
                        int assign[64];
                        bool ok = true;
                        for (int64_t ei = ca; ei < cb; ++ei) {
                            const int64_t col = cols_p[ei];
                            const int rho = (int)(col % LANES);
                            int found = -1;
                            for (int sg = 0; sg < phi; ++sg) {
                                if ((smask >> sg) & 1) continue;
                                const int s = sg * K + q;
                                const int64_t c0 =
                                    B.rescol[(size_t)s * LANES + rho];
                                if (c0 < 0 || c0 == col) {
                                    found = sg;
                                    break;
                                }
                            }
                            if (found < 0) { ok = false; break; }
                            smask |= (uint8_t)(1 << found);
                            assign[ei - ca] = found;
                        }
                        if (ok) {
                            for (int64_t ei = ca; ei < cb; ++ei) {
                                const int sg = assign[ei - ca];
                                const int s = sg * K + q;
                                const int64_t col = cols_p[ei];
                                B.rescol[(size_t)s * LANES
                                         + (col % LANES)] = col;
                                out_sb[ei] = n_sb + bi;
                                out_sub[ei] = (int32_t)s;
                            }
                            B.strat[(size_t)q * LANES + lane] = smask;
                            if (q < 64)
                                B.qfree[2 * lane] &= ~(uint64_t(1) << q);
                            else
                                B.qfree[2 * lane + 1] &=
                                    ~(uint64_t(1) << (q - 64));
                            B.pos_cnt[lane]++;
                            used_b.push_back(bi);
                            placed = true;
                            break;
                        }
                        if (q < 64)
                            m0 &= ~(uint64_t(1) << q);
                        else
                            m1 &= ~(uint64_t(1) << (q - 64));
                    }
                }
            }
        }
        for (int bi = 0; bi < n_blk; ++bi) {
            out_wid[n_sb + bi] = (int32_t)w;
            out_gbase[n_sb + bi] = gbase;
        }
        n_sb += n_blk;
        e = cend;
    }
    return n_sb;
}

/* Per-(window, row) pair counts for the hybrid router
 * (ops/lane_ell.py::route_cells).  numpy's direct bincount over the
 * w*m_pad+row key space allocates O(n_win * m_pad) int64 — multi-GB at
 * 113M nnz, and the layout chooser evaluates three candidate layouts x
 * two matrices with it (measured 616 s of the banded-giant ingest).
 * Here: window-bucket the entries once, then count rows per window in
 * parallel with a reused per-thread scratch.  Output pairs ascend by
 * (window, row), matching numpy's nonzero() order.  Returns the pair
 * count (always <= n). */
extern "C" int64_t lane_route_counts(
    const int64_t *rows_p, const int64_t *cols_p, int64_t n,
    int64_t m_pad, int64_t window,
    int32_t *out_w, int32_t *out_row, int32_t *out_cnt) {
    if (n <= 0) return 0;
    int64_t n_win = 0;
    std::vector<int64_t> wcnt;
    {
        // First pass: per-window entry counts.
        int64_t maxw = 0;
        for (int64_t i = 0; i < n; ++i)
            maxw = std::max(maxw, cols_p[i] / window);
        n_win = maxw + 1;
        wcnt.assign(n_win + 1, 0);
        for (int64_t i = 0; i < n; ++i) wcnt[cols_p[i] / window + 1]++;
        for (int64_t w = 0; w < n_win; ++w) wcnt[w + 1] += wcnt[w];
    }
    // Scatter row ids into per-window segments.
    std::vector<int32_t> seg(n);
    {
        std::vector<int64_t> cur(wcnt.begin(), wcnt.end() - 1);
        for (int64_t i = 0; i < n; ++i)
            seg[cur[cols_p[i] / window]++] = (int32_t)rows_p[i];
    }
    // Parallel per-window counting with a reused scratch; per-window
    // results buffered, then concatenated in window order.
    struct Pairs {
        std::vector<int32_t> row, cnt;
    };
    std::vector<Pairs> per_w(n_win);
    std::atomic<int64_t> next_w{0};
    unsigned hw = std::thread::hardware_concurrency();
    const int n_threads =
        (int)std::min<int64_t>(std::min(16u, hw ? hw : 1u), n_win);
    auto worker = [&] {
        std::vector<int32_t> scratch(m_pad, 0);
        std::vector<int32_t> touched;
        while (true) {
            const int64_t w = next_w.fetch_add(1);
            if (w >= n_win) break;
            touched.clear();
            for (int64_t e = wcnt[w]; e < wcnt[w + 1]; ++e) {
                const int32_t r = seg[e];
                if (scratch[r]++ == 0) touched.push_back(r);
            }
            std::sort(touched.begin(), touched.end());
            Pairs &p = per_w[w];
            p.row.assign(touched.begin(), touched.end());
            p.cnt.resize(touched.size());
            for (size_t k = 0; k < touched.size(); ++k) {
                p.cnt[k] = scratch[touched[k]];
                scratch[touched[k]] = 0;  // reset for the next window
            }
        }
    };
    if (n_threads > 1) {
        std::vector<std::thread> pool;
        for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
        for (auto &t : pool) t.join();
    } else {
        worker();
    }
    int64_t out = 0;
    for (int64_t w = 0; w < n_win; ++w) {
        const Pairs &p = per_w[w];
        for (size_t k = 0; k < p.row.size(); ++k) {
            out_w[out] = (int32_t)w;
            out_row[out] = p.row[k];
            out_cnt[out] = p.cnt[k];
            ++out;
        }
    }
    return out;
}

}  // extern "C"
