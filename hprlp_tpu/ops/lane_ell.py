"""Windowed LaneELL: a TPU-native SpMV layout built around the two Mosaic
primitives that are actually fast on TPU v5e — the 128-wide per-sublane
lane crossbar (`tpu.dynamic_gather` along lanes) and (128, 128) tile
transposes — plus per-chunk window DMA.

Why: XLA's generic gather lowering on TPU runs at ~35M elements/s
(measured on v5e), making gather-based SpMV the solver bottleneck at
scale.  Mosaic's lane gather does a full 128->128 crossbar per sublane,
but ONLY along the minor-most 128 lanes; the sublane variant does not
compile on v5e.  LaneELL routes arbitrary sparse gathers through it:

  x is viewed as x3[w, r, l0] = x[16384 w + 128 r + l0]  (window, row,
  residue).  For an entry (row, col, val):
    window  w  = col // 16384
    in-row  r  = (col % 16384) // 128
    residue l0 = col % 128

  Each slot SUBLANE is assigned one window w and holds <= 128 entries with
  pairwise-distinct residues (the same column may feed many rows: phase-2
  is a gather, so dense columns fan out for free).  The kernel then, per
  128-sublane chunk (all sharing one window):

    WT  = transpose(x3[w])                  (residue-major window tile)
    g0T = lane-gather(WT, idx1T)            pick row-in-window per residue
    g0  = transpose(g0T)                    slot-major again
    g1  = lane-gather(g0, idx2)             route to the output row's lane
    p   = g1 * vals
    per 128-sublane sub-block: a single aligned block add
    y2[gbase : gbase+128] += p.  The scheduler makes this exact by
    ALIGNMENT: a sub-block holds at most one sublane per output group,
    and the depth-k sublane of group g sits at sublane position
    g - gbase of the k-th sub-block of its (window, 128-group range) —
    so no in-kernel segment reduction exists at all (measured 5.6x
    faster than an MXU one-hot segment-sum flush on v5e; the price is
    depth-imbalance padding, ~1.3-1.5x sublanes on the bench matrix).

  Output rows are grouped 128 per group (group = padded_row // 128, lane =
  padded_row % 128); an entry's slot sublane belongs to its row's group.

The scheduler assigns each entry a (window-local) depth sublane; by
König's theorem a perfect schedule needs max(row nnz in window,
distinct-cols-per-residue) depths.  The native scheduler
(native/src/lane_schedule.cpp) runs column-grouped first-fit followed by
TARGETED DEPTH PEELING — the aligned placement pays the max block depth
per (window, 128-group range), so the blocks at each range's max retry
their top level into lower depths with one-level relocations; measured
on the 1.3M-nnz bench matrix this lands within ~5-8%% of the König
bound (A 192 -> 160 sub-blocks, AT 249 -> 220).  Slot overhead
(scheduled slots / nnz) is typically 3-5x with the aligned placement;
the payoff is that every data-movement op in the kernel is a full-width
vector op and the flush has no reduction at all.
"""

from __future__ import annotations

import numpy as np

LANES = 128
WINDOW = LANES * LANES  # x values per window (one (128,128) VMEM tile)
SUBBLOCKS = 8           # 128-sublane sub-blocks per kernel chunk
CHUNK_SUB = SUBBLOCKS * LANES  # slot sublanes per kernel grid step


def _greedy_schedule(rows_s: np.ndarray, cols_s: np.ndarray,
                     sub_out: np.ndarray):
    """Assign each entry (pre-sorted by (window, group)) a sublane.

    Uses the native C++ scheduler when available (identical constraints;
    native/src/lane_schedule.cpp), else a pure-Python fallback.
    Returns (gid_per_sublane, wid_per_sublane) as int64 arrays.
    """
    nnz = len(rows_s)
    try:
        from ..native import get_lib

        lib = get_lib()
    except Exception:
        lib = None
    if lib is not None and nnz:
        cap = nnz + 1
        gid = np.zeros(cap, np.int32)
        wid = np.zeros(cap, np.int32)
        n_sub = lib.hpres_lane_schedule(
            nnz, np.ascontiguousarray(rows_s), np.ascontiguousarray(cols_s),
            sub_out, gid, wid, cap)
        if n_sub >= 0:
            return gid[:n_sub].astype(np.int64), wid[:n_sub].astype(np.int64)

    # Python fallback.
    sublanes_gid: list[int] = []
    sublanes_wid: list[int] = []
    res_used: list[dict] = []
    lane_used: list[np.ndarray] = []
    base = 0
    cur = (-1, -1)
    for e in range(nnz):
        g = rows_s[e] // LANES
        l = rows_s[e] % LANES
        c = cols_s[e]
        w = c // WINDOW
        rho = c % LANES
        if (w, g) != cur:
            base = len(sublanes_gid)
            cur = (w, g)
            res_used = []
            lane_used = []
        d = 0
        while True:
            if d == len(res_used):
                res_used.append({})
                lane_used.append(np.zeros(LANES, bool))
                sublanes_gid.append(int(g))
                sublanes_wid.append(int(w))
            if not lane_used[d][l] and res_used[d].get(rho, c) == c:
                res_used[d][rho] = c
                lane_used[d][l] = True
                sub_out[e] = base + d
                break
            d += 1
    return (np.asarray(sublanes_gid, np.int64),
            np.asarray(sublanes_wid, np.int64))


def schedule_lane_ell(rows_p: np.ndarray, cols_p: np.ndarray,
                      vals: np.ndarray, m_pad: int, n_pad: int,
                      with_cols: bool = False):
    """Schedule entries into windowed LaneELL chunk tiles.

    rows_p/cols_p: PADDED row/col positions per nonzero; vals: values.

    Returns dict with per-chunk tiles (C = number of CHUNK_SUB-sublane
    super-chunks):
      idx1t: (C, 128, CHUNK_SUB) int32 — phase-1 row-in-window, TRANSPOSED
             (lane-major) for the gather on the transposed window;
      idx2:  (C, CHUNK_SUB, 128) int32 — phase-2 source residue per lane;
      vals:  (C, CHUNK_SUB, 128) in the input values' dtype;
      gid:   (C, CHUNK_SUB) int32 — output group per sublane; ALIGNED:
             within sub-block j, gid[j*128 + s] == gbase[c, j] + s;
      gbase: (C, SUBBLOCKS) int32 — first output group per sub-block;
      wid:   (C,) int32 — window per chunk.  (A two-window-slots-per-chunk
             variant — wid per half-chunk, %4 padding — was measured and
             REJECTED: the second window BlockSpec costs ~20% per
             sub-block on v5e, more than the padding it saves on every
             matrix tried; see docs/ROADMAP.md.);
      cols:  (C, CHUNK_SUB, 128) int64 — padded col per slot, -1 empty
             (tests / re-scaling);
      G: m_pad // 128;  n_windows: padded window count.
    """
    G = m_pad // LANES
    n_win = -(-n_pad // WINDOW)

    g_all = (rows_p // LANES).astype(np.int64)
    l_all = (rows_p % LANES).astype(np.int64)
    w_all = (cols_p // WINDOW).astype(np.int64)
    r_all = ((cols_p % WINDOW) // LANES).astype(np.int64)
    rho_all = (cols_p % LANES).astype(np.int64)

    # Sort entries by (window, group) — the global sublane order.
    order = np.lexsort((l_all, g_all, w_all))

    sub_sorted = np.zeros(len(order), np.int64)
    gid_arr, wid_arr = _greedy_schedule(rows_p[order], cols_p[order],
                                        sub_sorted)
    sub_of = np.zeros(len(order), np.int64)  # global sublane per entry
    sub_of[order] = sub_sorted
    T = len(gid_arr)

    # ALIGNED placement: for each (window, 128-aligned group range), emit
    # D = max-group-depth sub-blocks; the depth-k sublane of group g sits
    # at sublane position g - gbase of sub-block k.  The kernel flush is
    # then a single y2[gbase : gbase+128] += p per sub-block — no segment
    # reduction of any kind.  Groups shallower than D leave empty (zero)
    # sublane slots; chunks group SUBBLOCKS consecutive sub-blocks of one
    # window (a window's sub-block count is padded to a multiple).
    # Depth of each sublane within its (w, g) run (sublanes arrive sorted
    # by (w, g); depth = position inside the run).
    depth = np.zeros(T, np.int64)
    if T:
        idx = np.arange(T)
        run_start = idx.copy()
        same = np.zeros(T, bool)
        same[1:] = (gid_arr[1:] == gid_arr[:-1]) & (wid_arr[1:] == wid_arr[:-1])
        run_start[same] = 0
        np.maximum.accumulate(run_start, out=run_start)
        depth = idx - run_start

    grange = gid_arr // LANES
    new_pos = np.zeros(T, np.int64)
    blk_wid: list[int] = []
    blk_gbase: list[int] = []
    if T:
        seg_change = np.nonzero((np.diff(wid_arr) != 0)
                                | (np.diff(grange) != 0))[0] + 1
        bounds = np.concatenate([[0], seg_change, [T]])
        cur_sb = 0
        prev_w = int(wid_arr[0])
        win_first_sb = 0
        for a, b in zip(bounds[:-1], bounds[1:]):
            w = int(wid_arr[a])
            if w != prev_w:
                while (cur_sb - win_first_sb) % SUBBLOCKS != 0:
                    blk_wid.append(prev_w)
                    blk_gbase.append(0)
                    cur_sb += 1
                prev_w = w
                win_first_sb = cur_sb
            D = int(depth[a:b].max()) + 1
            gb = int(grange[a]) * LANES
            new_pos[a:b] = ((cur_sb + depth[a:b]) * LANES
                            + (gid_arr[a:b] - gb))
            blk_wid.extend([w] * D)
            blk_gbase.extend([gb] * D)
            cur_sb += D
        while (cur_sb - win_first_sb) % SUBBLOCKS != 0:
            blk_wid.append(prev_w)
            blk_gbase.append(0)
            cur_sb += 1
    if not blk_wid:  # empty matrix
        blk_wid = [0] * SUBBLOCKS
        blk_gbase = [0] * SUBBLOCKS
    n_sb = len(blk_wid)
    T_pad = n_sb * LANES
    C = n_sb // SUBBLOCKS

    gbase_tile = np.asarray(blk_gbase, np.int64).reshape(C, SUBBLOCKS)
    gid_tile = (gbase_tile[:, :, None]
                + np.arange(LANES)[None, None, :]).reshape(C, CHUNK_SUB)
    wid_tile = np.asarray(blk_wid[::SUBBLOCKS], np.int32)

    idx1 = np.zeros((T_pad, LANES), np.int32)
    idx2 = np.zeros((T_pad, LANES), np.int32)
    # Values keep their own dtype; pack_tiles casts to the solve dtype
    # (storing f32 here would silently truncate f64 solves).
    vtile = np.zeros((T_pad, LANES), np.asarray(vals).dtype)

    # Map each entry's scheduled sublane through the chunk padding.
    # (sub_of is indexed by ORIGINAL entry id, as are rho_all/l_all/...)
    s_ent = new_pos[sub_of]
    idx1[s_ent, rho_all] = r_all.astype(np.int32)
    idx2[s_ent, l_all] = rho_all.astype(np.int32)
    vtile[s_ent, l_all] = vals
    if with_cols:  # per-slot column map: tests / oracles only
        ctile = np.full((T_pad, LANES), -1, np.int64)
        ctile[s_ent, l_all] = cols_p
    else:
        ctile = None

    return {
        "idx1t": np.ascontiguousarray(
            idx1.reshape(C, CHUNK_SUB, LANES).transpose(0, 2, 1)),
        "idx2": idx2.reshape(C, CHUNK_SUB, LANES),
        "vals": vtile.reshape(C, CHUNK_SUB, LANES),
        "cols": (ctile.reshape(C, CHUNK_SUB, LANES)
                 if ctile is not None else None),
        "gid": gid_tile.astype(np.int32),
        "gbase": gbase_tile.astype(np.int32),
        "wid": wid_tile,
        "G": G,
        "n_windows": n_win,
    }


def lane_spmv_reference(tiles: dict, x_pad: np.ndarray) -> np.ndarray:
    """NumPy oracle of the windowed two-phase kernel (for tests)."""
    G = tiles["G"]
    n_win = -(-len(x_pad) // WINDOW)
    if n_win * WINDOW != len(x_pad):
        x_pad = np.concatenate(
            [x_pad, np.zeros(n_win * WINDOW - len(x_pad), x_pad.dtype)])
    x3 = x_pad.reshape(n_win, LANES, LANES)
    C = tiles["idx2"].shape[0]
    # Flush windows are 128-aligned, so padding sublanes may carry group
    # ids past G (their values are zero); accumulate into the rounded-up
    # space and slice.
    g_alloc = -(-max(G, LANES) // LANES) * LANES
    y2 = np.zeros((g_alloc, LANES), x_pad.dtype)
    for c in range(C):
        W = x3[tiles["wid"][c]]
        idx1 = tiles["idx1t"][c].T            # (s, l0): row-in-window
        g0 = W[idx1, np.arange(LANES)[None, :]]    # (CHUNK_SUB, 128)
        g1 = np.take_along_axis(g0, tiles["idx2"][c], axis=1)
        p = g1 * tiles["vals"][c]
        np.add.at(y2, tiles["gid"][c], p)
    return y2[:G].reshape(-1)
