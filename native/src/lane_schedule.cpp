/* LaneELL greedy scheduler — native implementation of
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
 * C ABI: caller passes entries SORTED by (window, group, lane) and
 * receives the per-entry sublane index plus per-sublane (gid, wid).
 */

#include <stdint.h>

#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

/* rows_p/cols_p: padded positions, pre-sorted by (col/16384, row/128).
 * out_sub: per-entry global sublane id.
 * out_gid/out_wid: per-sublane group/window (capacity >= returned count).
 * Returns the number of sublanes, or -1 if cap was insufficient. */
int64_t hpres_lane_schedule(int64_t nnz, const int64_t *rows_p,
                            const int64_t *cols_p, int64_t *out_sub,
                            int32_t *out_gid, int32_t *out_wid,
                            int64_t cap) {
    constexpr int64_t LANES = 128;
    constexpr int64_t WINDOW = LANES * LANES;

    int64_t n_sub = 0;
    int64_t base = 0;
    int64_t cur_w = -1, cur_g = -1;
    // Per-depth state for the current (window, group) block.
    std::vector<std::unordered_map<int32_t, int64_t>> res_used;
    std::vector<uint8_t> lane_used;  // depth * LANES + lane

    for (int64_t e = 0; e < nnz; ++e) {
        const int64_t g = rows_p[e] / LANES;
        const int64_t l = rows_p[e] % LANES;
        const int64_t c = cols_p[e];
        const int64_t w = c / WINDOW;
        const int32_t rho = (int32_t)(c % LANES);
        if (w != cur_w || g != cur_g) {
            cur_w = w;
            cur_g = g;
            base = n_sub;
            res_used.clear();
            lane_used.clear();
        }
        size_t d = 0;
        for (;; ++d) {
            if (d == res_used.size()) {
                res_used.emplace_back();
                lane_used.resize((d + 1) * LANES, 0);
                if (n_sub >= cap) return -1;
                out_gid[n_sub] = (int32_t)g;
                out_wid[n_sub] = (int32_t)w;
                n_sub++;
            }
            if (lane_used[d * LANES + l]) continue;
            auto it = res_used[d].find(rho);
            if (it != res_used[d].end() && it->second != c) continue;
            res_used[d].emplace(rho, c);
            lane_used[d * LANES + l] = 1;
            out_sub[e] = base + (int64_t)d;
            break;
        }
    }
    return n_sub;
}

}  // extern "C"
