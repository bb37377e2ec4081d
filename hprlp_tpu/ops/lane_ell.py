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


def _window_splits(w_sorted: np.ndarray, n_parts: int):
    """Split a (window-major sorted) entry range into <= n_parts
    contiguous segments that cut ONLY at window boundaries, balanced by
    entry count.  Window-level independence makes this exact: the lane
    scheduler, the thin packer and the per-window chunk padding all
    treat windows independently, so concatenating per-segment tiles is
    BIT-IDENTICAL to the full serial run."""
    n = len(w_sorted)
    if n == 0 or n_parts <= 1:
        return [(0, n)]
    starts = np.concatenate([[0], np.nonzero(np.diff(w_sorted))[0] + 1])
    targets = (np.arange(1, n_parts) * n) // n_parts
    cuts = starts[np.minimum(np.searchsorted(starts, targets),
                             len(starts) - 1)]
    bounds = np.unique(np.concatenate([[0], cuts, [n]]))
    return [(int(a), int(b)) for a, b in zip(bounds[:-1], bounds[1:])
            if b > a]


# Parallel scheduling kicks in above this entry count (the native
# scheduler releases the GIL, so window segments run on real threads).
PARALLEL_SCHED_MIN_NNZ = 2_000_000


def _sort_by_keys(key_cols) -> np.ndarray:
    """argsort by lexicographic (last key most significant), like
    np.lexsort, but via ONE composite-uint64 parallel native sort when
    the ranges fit (np.lexsort over the giant schedulers' 28M-entry
    triples measured ~14 s single-threaded; the native bucket sort runs
    ~1 s).  Falls back to np.lexsort when the composite would overflow
    or the native library is missing.  Key equality ties may be broken
    differently than lexsort's stable order — callers must not depend
    on tie order (the schedulers' triples are unique after duplicate
    summing)."""
    n = len(key_cols[0])
    if n >= PARALLEL_SCHED_MIN_NNZ:
        from ..native import get_lib

        lib = get_lib()
        if lib is not None and hasattr(lib, "hprlp_sort_index_u64"):
            composite = None
            for k in reversed(key_cols):  # most significant first
                k = np.asarray(k)
                kmax = int(k.max()) if len(k) else 0
                kmin = int(k.min()) if len(k) else 0
                if kmin < 0:
                    composite = None
                    break
                span = kmax + 1
                if composite is None:
                    composite = k.astype(np.uint64)
                    limit = span
                else:
                    if limit * span > (1 << 63):
                        composite = None
                        break
                    # In place: the temporaries of `c*span + k` were a
                    # measurable slice of the giant ingest.
                    composite *= np.uint64(span)
                    np.add(composite, k, out=composite,
                           casting="unsafe")
                    limit *= span
            if composite is not None:
                out = np.empty(n, np.int64)
                lib.hprlp_sort_index_u64(
                    np.ascontiguousarray(composite), n, out)
                return out
    return np.lexsort(tuple(key_cols))


def _permute(order: np.ndarray, *arrs):
    """Apply a permutation to several arrays: native parallel gather
    when available and large (numpy fancy indexing holds the GIL —
    ~2.5 s of serial reorders per 28M-nnz thin schedule on a 4-core
    host), numpy otherwise."""
    n = len(order)
    lib = None
    if n >= PARALLEL_SCHED_MIN_NNZ:
        from ..native import get_lib

        lib = get_lib()
        if lib is not None and not hasattr(lib, "hprlp_gather_i64"):
            lib = None
    out = []
    for a in arrs:
        a = np.ascontiguousarray(a)
        if lib is not None and a.dtype == np.int64:
            dst = np.empty(n, np.int64)
            lib.hprlp_gather_i64(a, order, n, dst)
        elif lib is not None and a.dtype == np.float64:
            dst = np.empty(n, np.float64)
            lib.hprlp_gather_f64(a, order, n, dst)
        else:
            dst = a[order]
        out.append(dst)
    return out


def _concat_tiles(parts: list[dict], keys=("idx1t", "idx2", "vals",
                                           "cols", "gid", "gbase", "wid",
                                           "invt")) -> dict:
    out = dict(parts[0])
    for k in keys:
        if out.get(k) is not None:
            out[k] = (parts[0][k] if len(parts) == 1 else
                      np.concatenate([p[k] for p in parts], axis=0))
    return out


def _parallel_windows(fn, w_sorted: np.ndarray, n_entries: int):
    """Run fn(a, b) -> tiles over window-boundary segments in a thread
    pool and concatenate (None when the input is too small to bother)."""
    import os as _os

    if n_entries < PARALLEL_SCHED_MIN_NNZ:
        return None
    n_parts = min(_os.cpu_count() or 1, 16)
    spans = _window_splits(w_sorted, n_parts)
    if len(spans) <= 1:
        return None
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(spans)) as ex:
        parts = list(ex.map(lambda ab: fn(*ab), spans))
    return _concat_tiles(parts)


def schedule_lane_ell(rows_p: np.ndarray, cols_p: np.ndarray,
                      vals: np.ndarray, m_pad: int, n_pad: int,
                      with_cols: bool = False):
    """Parallel wrapper over _schedule_lane_ell_serial: entries are
    sorted (window, group) once, split at window boundaries, scheduled
    per segment on threads, and the tile sets concatenated — exact (see
    _window_splits)."""
    rows_p = np.asarray(rows_p)
    cols_p = np.asarray(cols_p)
    vals = np.asarray(vals)
    g_all = rows_p // LANES
    l_all = rows_p % LANES
    w_all = cols_p // WINDOW
    order = _sort_by_keys((l_all, g_all, w_all))
    rs, cs, vs = _permute(order, rows_p, cols_p, vals)

    def seg(a, b):
        return _schedule_lane_ell_serial(rs[a:b], cs[a:b], vs[a:b],
                                         m_pad, n_pad,
                                         with_cols=with_cols,
                                         presorted=True)

    out = _parallel_windows(seg, cs // WINDOW, len(rs))
    if out is None:
        return _schedule_lane_ell_serial(rs, cs, vs, m_pad, n_pad,
                                         with_cols=with_cols,
                                         presorted=True)
    return out


def _schedule_lane_ell_serial(rows_p: np.ndarray, cols_p: np.ndarray,
                              vals: np.ndarray, m_pad: int, n_pad: int,
                              with_cols: bool = False,
                              presorted: bool = False):
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
    if presorted:
        sub_of = np.zeros(len(rows_p), np.int64)
        gid_arr, wid_arr = _greedy_schedule(rows_p, cols_p, sub_of)
    else:
        order = _sort_by_keys((l_all, g_all, w_all))
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

    tail = {
        "gid": gid_tile.astype(np.int32),
        "gbase": gbase_tile.astype(np.int32),
        "wid": wid_tile,
        "G": G,
        "n_windows": n_win,
    }

    # Map each entry's scheduled sublane through the chunk padding.
    # (sub_of is indexed by ORIGINAL entry id, as are rho_all/l_all/...)
    s_ent = new_pos[sub_of]

    # Native parallel fill (native/src/lane_fill.cpp) — see the thin
    # scheduler's note; the GIL-bound numpy scatters dominate large
    # schedules.
    vals = np.asarray(vals)
    lib = None
    if not with_cols and len(rows_p) >= 200_000 \
            and vals.dtype == np.float64:
        try:
            from ..native import get_lib

            lib = get_lib()
        except Exception:
            lib = None
    if lib is not None and hasattr(lib, "hprlp_lane_fill_aligned"):
        idx1t = np.zeros((C, LANES, CHUNK_SUB), np.int8)
        idx2 = np.zeros((C, CHUNK_SUB, LANES), np.int8)
        vtile = np.zeros((C, CHUNK_SUB, LANES), np.float64)
        rc = lib.hprlp_lane_fill_aligned(
            len(rows_p), np.ascontiguousarray(rows_p),
            np.ascontiguousarray(cols_p), np.ascontiguousarray(vals),
            np.ascontiguousarray(s_ent), T_pad, idx1t, idx2, vtile)
        if rc == 0:
            return {"idx1t": idx1t, "idx2": idx2, "vals": vtile,
                    "cols": None, **tail}

    idx1 = np.zeros((T_pad, LANES), np.int8)
    idx2 = np.zeros((T_pad, LANES), np.int8)
    # Values keep their own dtype; pack_tiles casts to the solve dtype
    # (storing f32 here would silently truncate f64 solves).
    vtile = np.zeros((T_pad, LANES), vals.dtype)

    idx1[s_ent, rho_all] = r_all.astype(np.int8)
    idx2[s_ent, l_all] = rho_all.astype(np.int8)
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
        **tail,
    }


# ---------------------------------------------------------------------------
# Thin-cell (packed) LaneELL: the hybrid kernel's secondary path.
#
# The ALIGNED layout above pays the (window, 128-group range) MAX depth for
# every group in the range, and each sublane serves exactly one group — so a
# GIANT matrix whose nonzeros spread thinly over the (window, grange) grid
# explodes slot padding (measured ~11x at 100M uniform nnz, ~8x on banded
# giants; docs/ROADMAP.md frontier note).  The THIN layout packs sublanes
# from ANY group of the grange into a sub-block and flushes through an
# INVERSE-PERMUTATION lane gather instead of the aligned block add:
#
#   per sub-block j (one window w, one 128-group range at gbase):
#     p    = gathered-and-multiplied products, exactly as aligned (128, 128)
#     f    = p[0:K] + p[K:2K] + ... + p[(phi-1)K:]      (K = 128 / phi)
#     z    = f.T gathered along sublanes: z[l, d] = f[inv[l, d], l]
#     y2[gbase + d, l] += z[d-major].T
#
# Each output row (group offset d, lane l) owns ONE position q in 0..K-1;
# the row's <= phi entries in this (window, sub-block) sit at sublanes
# sigma*K + q (distinct strata sigma) and the fold sums them — so per-(row,
# window) multiplicity up to phi costs NO extra sub-blocks.  Unused (d, l)
# point at a per-lane empty position (all strata zero), so the gather adds
# exact zeros.  The price vs aligned is ~3 extra vector ops per sub-block
# and one int8 inv tile; the payoff is that sub-blocks fill with whatever
# entries the cell has instead of paying group-aligned depth padding.
#
# Scheduling constraints per thin sub-block:
#   * one x-window, one 128-group range (as aligned);
#   * one entry per (stratum, position, lane) slot;
#   * at most one DISTINCT column per (sublane, residue) — phase-1, as
#     aligned;
#   * at most one POSITION per output row (inv maps (d, l) to one q);
#   * at most K-1 used positions per lane (reserve the empty default).
# ---------------------------------------------------------------------------


def _pack_thin_py(rows_s: np.ndarray, cols_s: np.ndarray, phi: int,
                  out_sb: np.ndarray, out_sub: np.ndarray):
    """Pure-Python thin packer (native mirror: hpres_lane_pack_thin).

    rows_s/cols_s: padded positions pre-sorted by (window, grange, row,
    col).  Writes per-entry global sub-block id / sublane (sigma*K + q)
    and returns (sb_wid, sb_gbase) per sub-block.  Deterministic: cells in
    input order; rows by (count desc, row); chunks of <= phi entries in
    col order; first-fit over (sub-block, position, strata)."""
    K = LANES // phi
    n = len(rows_s)
    sb_wid: list[int] = []
    sb_gbase: list[int] = []

    w_all = cols_s // WINDOW
    gr_all = rows_s // (LANES * LANES)
    e = 0
    while e < n:
        w, gr = w_all[e], gr_all[e]
        b_end = e
        while b_end < n and w_all[b_end] == w and gr_all[b_end] == gr:
            b_end += 1
        gbase = int(gr) * LANES

        # Row runs within the cell (sorted by row).
        r_starts = [e]
        for i in range(e + 1, b_end):
            if rows_s[i] != rows_s[i - 1]:
                r_starts.append(i)
        r_starts.append(b_end)
        rows_idx = list(range(len(r_starts) - 1))
        rows_idx.sort(key=lambda ri: (-(r_starts[ri + 1] - r_starts[ri]),
                                      rows_s[r_starts[ri]]))

        base_sb = len(sb_wid)
        blocks: list[dict] = []  # cell-local state

        def new_block():
            blocks.append({
                "pos_used": np.zeros((K, LANES), bool),
                "pos_cnt": np.zeros(LANES, np.int32),
                "strat": np.zeros((K, LANES), np.uint32),  # sigma bitmask
                "rescol": [dict() for _ in range(LANES)],
            })
            sb_wid.append(int(w))
            sb_gbase.append(gbase)

        for ri in rows_idx:
            a, b = r_starts[ri], r_starts[ri + 1]
            lane = int(rows_s[a] % LANES)
            used_b: set[int] = set()
            for ca in range(a, b, phi):
                chunk = range(ca, min(ca + phi, b))
                placed = False
                bi = 0
                while not placed:
                    if bi == len(blocks):
                        new_block()
                    B = blocks[bi]
                    if bi in used_b or B["pos_cnt"][lane] >= K - 1:
                        bi += 1
                        continue
                    for q in range(K):
                        if B["pos_used"][q, lane]:
                            continue
                        smask = int(B["strat"][q, lane])
                        assign = []
                        ok = True
                        for ei in chunk:
                            col = int(cols_s[ei])
                            rho = col % LANES
                            found = -1
                            for sg in range(phi):
                                if (smask >> sg) & 1:
                                    continue
                                s = sg * K + q
                                c0 = B["rescol"][s].get(rho, col)
                                if c0 == col:
                                    found = sg
                                    break
                            if found < 0:
                                ok = False
                                break
                            smask |= 1 << found
                            assign.append((ei, found))
                        if not ok:
                            continue
                        # Commit.
                        for ei, sg in assign:
                            col = int(cols_s[ei])
                            s = sg * K + q
                            B["rescol"][s][col % LANES] = col
                            out_sb[ei] = base_sb + bi
                            out_sub[ei] = s
                        B["pos_used"][q, lane] = True
                        B["strat"][q, lane] = smask
                        B["pos_cnt"][lane] += 1
                        used_b.add(bi)
                        placed = True
                        break
                    if not placed:
                        bi += 1
        e = b_end
    return (np.asarray(sb_wid, np.int32), np.asarray(sb_gbase, np.int64))


def _pack_thin(rows_s: np.ndarray, cols_s: np.ndarray, phi: int):
    """Thin packer dispatch: native C++ when available, Python fallback.
    Returns (out_sb, out_sub, sb_wid, sb_gbase)."""
    n = len(rows_s)
    out_sb = np.zeros(n, np.int64)
    out_sub = np.zeros(n, np.int32)
    try:
        from ..native import get_lib

        lib = get_lib()
    except Exception:
        lib = None
    if lib is not None and n and hasattr(lib, "hpres_lane_pack_thin"):
        cap = n + 8
        wid = np.zeros(cap, np.int32)
        gbase = np.zeros(cap, np.int64)
        n_sb = lib.hpres_lane_pack_thin(
            n, np.ascontiguousarray(rows_s), np.ascontiguousarray(cols_s),
            phi, out_sb, out_sub, wid, gbase, cap)
        if n_sb >= 0:
            return out_sb, out_sub, wid[:n_sb], gbase[:n_sb]
    sb_wid, sb_gbase = _pack_thin_py(rows_s, cols_s, phi, out_sb, out_sub)
    return out_sb, out_sub, sb_wid, sb_gbase


def schedule_thin(rows_p: np.ndarray, cols_p: np.ndarray, vals: np.ndarray,
                  m_pad: int, n_pad: int, phi: int = 4,
                  with_cols: bool = False) -> dict:
    """Parallel wrapper over _schedule_thin_serial (same window-boundary
    segmentation as schedule_lane_ell — exact, see _window_splits)."""
    rows_p = np.asarray(rows_p)
    cols_p = np.asarray(cols_p)
    vals = np.asarray(vals)
    G = m_pad // LANES
    GR = np.int64(max(1, -(-G // LANES)))
    w_all = cols_p // WINDOW
    gr_all = rows_p // (LANES * LANES)
    order = _sort_by_keys((cols_p, rows_p, w_all * GR + gr_all))
    rs, cs, vs = _permute(order, rows_p, cols_p, vals)

    def seg(a, b):
        return _schedule_thin_serial(rs[a:b], cs[a:b], vs[a:b], m_pad,
                                     n_pad, phi=phi, with_cols=with_cols,
                                     presorted=True)

    out = _parallel_windows(seg, cs // WINDOW, len(rs))
    if out is None:
        return _schedule_thin_serial(rs, cs, vs, m_pad, n_pad, phi=phi,
                                     with_cols=with_cols, presorted=True)
    return out


def _schedule_thin_serial(rows_p: np.ndarray, cols_p: np.ndarray,
                          vals: np.ndarray, m_pad: int, n_pad: int,
                          phi: int = 4, with_cols: bool = False,
                          presorted: bool = False) -> dict:
    """Schedule entries into thin (packed) LaneELL chunk tiles.

    Same idx1t/idx2/vals tile formats as schedule_lane_ell; the aligned
    gid alignment is replaced by `invt` (C, 128, CHUNK_SUB) int8 — the
    per-sub-block inverse map invt[c][l, j*128 + d] = source position q
    (into the phi-fold of the sub-block's sublanes) for output row
    (gbase[c, j] + d) * 128 + l."""
    assert LANES % phi == 0 and phi < LANES
    K = LANES // phi
    G = m_pad // LANES
    n_win = -(-n_pad // WINDOW)
    n = len(rows_p)

    if presorted:
        rs, cs, vs = rows_p, cols_p, np.asarray(vals)
    else:
        w_all = cols_p // WINDOW
        gr_all = rows_p // (LANES * LANES)
        order = _sort_by_keys((cols_p, rows_p,
                               w_all * np.int64(max(1, -(-G // LANES)))
                               + gr_all))
        rs = rows_p[order]
        cs = cols_p[order]
        vs = np.asarray(vals)[order]

    out_sb, out_sub, sb_wid, sb_gbase = _pack_thin(rs, cs, phi)
    n_sb = len(sb_wid)
    if n_sb == 0:
        sb_wid = np.zeros(1, np.int32)
        sb_gbase = np.zeros(1, np.int64)
        n_sb = 1

    # Chunk padding: sub-blocks arrive grouped by window (cells are sorted
    # by (w, grange)); pad each window's run to a SUBBLOCKS multiple with
    # filler sub-blocks (zero values => exact zero flush).
    runs = np.nonzero(np.diff(sb_wid))[0] + 1
    starts = np.concatenate([[0], runs, [n_sb]])
    counts = np.diff(starts)
    padded = -(-counts // SUBBLOCKS) * SUBBLOCKS
    offs = np.zeros(len(counts), np.int64)
    np.cumsum(padded[:-1], out=offs[1:])
    run_of_sb = np.repeat(np.arange(len(counts)), counts)
    rank = np.arange(n_sb) - np.repeat(starts[:-1], counts)
    new_sb = offs[run_of_sb] + rank                 # old sb -> padded slot
    n_sb_pad = int(padded.sum())
    C = n_sb_pad // SUBBLOCKS

    # Fillers inherit their run's window (chunk wid must match).
    wid_pad = np.repeat(sb_wid[starts[:-1]], padded).astype(np.int32)
    gbase_pad = np.zeros(n_sb_pad, np.int64)
    gbase_pad[new_sb] = sb_gbase

    tail = {
        "gbase": gbase_pad.reshape(C, SUBBLOCKS).astype(np.int32),
        "wid": wid_pad.reshape(C, SUBBLOCKS)[:, 0].astype(np.int32),
        "phi": phi,
        "G": G,
        "n_windows": n_win,
    }

    # Native parallel fill (native/src/lane_fill.cpp): the numpy fancy
    # scatters below hold the GIL, so they serialized the parallel
    # scheduling wrapper (~15 s of a 26 s serial thin schedule at 28M
    # nnz).  The native path also writes idx1t/invt directly in their
    # transposed layouts.
    lib = None
    if not with_cols and n >= 200_000 and vs.dtype == np.float64:
        try:
            from ..native import get_lib

            lib = get_lib()
        except Exception:
            lib = None
    if lib is not None and hasattr(lib, "hprlp_lane_fill_thin"):
        idx1t = np.zeros((C, LANES, CHUNK_SUB), np.int8)
        idx2 = np.zeros((C, CHUNK_SUB, LANES), np.int8)
        vtile = np.zeros((C, CHUNK_SUB, LANES), np.float64)
        invt = np.empty((C, LANES, CHUNK_SUB), np.int8)
        rc = lib.hprlp_lane_fill_thin(
            n, np.ascontiguousarray(rs), np.ascontiguousarray(cs),
            np.ascontiguousarray(vs),
            np.ascontiguousarray(new_sb[out_sb]),
            np.ascontiguousarray(out_sub, dtype=np.int32),
            np.ascontiguousarray(gbase_pad), n_sb_pad, K,
            idx1t, idx2, vtile, invt)
        if rc == 0:
            return {"idx1t": idx1t, "idx2": idx2, "vals": vtile,
                    "cols": None, "invt": invt, **tail}
        # rc != 0: scheduler invariant violated — the numpy path below
        # re-derives everything and raises on the same condition.

    l_all = (rs % LANES).astype(np.int64)
    r_all = ((cs % WINDOW) // LANES).astype(np.int64)
    rho_all = (cs % LANES).astype(np.int64)
    d_all = (rs // LANES) - gbase_pad[new_sb[out_sb]]
    assert n == 0 or (d_all.min() >= 0 and d_all.max() < LANES)

    T_pad = n_sb_pad * LANES
    s_ent = new_sb[out_sb] * LANES + out_sub
    idx1 = np.zeros((T_pad, LANES), np.int8)
    idx2 = np.zeros((T_pad, LANES), np.int8)
    vtile = np.zeros((T_pad, LANES), vs.dtype)
    idx1[s_ent, rho_all] = r_all.astype(np.int8)
    idx2[s_ent, l_all] = rho_all.astype(np.int8)
    vtile[s_ent, l_all] = vs
    if with_cols:
        ctile = np.full((T_pad, LANES), -1, np.int64)
        ctile[s_ent, l_all] = cs
    else:
        ctile = None

    # inv: default per (sb, lane) = first position with no entry at any
    # stratum (guaranteed by the packer's K-1 cap), entries overwrite.
    occ = np.zeros((n_sb_pad, K, LANES), bool)
    occ[new_sb[out_sb], out_sub % K, l_all] = True
    q_empty = np.argmin(occ, axis=1).astype(np.int8)  # (n_sb_pad, LANES)
    assert not occ.all(axis=1).any(), "thin packer left no empty position"
    inv = np.empty((n_sb_pad, LANES, LANES), np.int8)  # (sb, d, l)
    inv[:] = q_empty[:, None, :]
    inv[new_sb[out_sb], d_all, l_all] = (out_sub % K).astype(np.int8)
    # Tile layout matches idx1t: (C, LANES=l, CHUNK_SUB=j*128+d).
    invt = np.ascontiguousarray(
        inv.reshape(C, SUBBLOCKS * LANES, LANES).transpose(0, 2, 1))

    return {
        "idx1t": np.ascontiguousarray(
            idx1.reshape(C, CHUNK_SUB, LANES).transpose(0, 2, 1)),
        "idx2": idx2.reshape(C, CHUNK_SUB, LANES),
        "vals": vtile.reshape(C, CHUNK_SUB, LANES),
        "cols": (ctile.reshape(C, CHUNK_SUB, LANES)
                 if ctile is not None else None),
        "invt": invt,
        **tail,
    }


def thin_spmv_reference(tiles: dict, x_pad: np.ndarray) -> np.ndarray:
    """NumPy oracle of the thin (packed) kernel (for tests)."""
    G = tiles["G"]
    phi = tiles["phi"]
    K = LANES // phi
    n_win = -(-len(x_pad) // WINDOW)
    if n_win * WINDOW != len(x_pad):
        x_pad = np.concatenate(
            [x_pad, np.zeros(n_win * WINDOW - len(x_pad), x_pad.dtype)])
    x3 = x_pad.reshape(n_win, LANES, LANES)
    C = tiles["idx2"].shape[0]
    g_alloc = -(-max(G, LANES) // LANES) * LANES
    y2 = np.zeros((g_alloc, LANES), x_pad.dtype)
    lanes = np.arange(LANES)
    for c in range(C):
        W = x3[tiles["wid"][c]]
        idx1 = tiles["idx1t"][c].T
        g0 = W[idx1, lanes[None, :]]
        g1 = np.take_along_axis(g0, tiles["idx2"][c], axis=1)
        p = g1 * tiles["vals"][c]
        for j in range(SUBBLOCKS):
            pj = p[j * LANES:(j + 1) * LANES]
            f = pj.reshape(phi, K, LANES).sum(axis=0)
            inv = tiles["invt"][c][:, j * LANES:(j + 1) * LANES]  # (l, d)
            z = f[inv, lanes[:, None]]                            # (l, d)
            gb = tiles["gbase"][c, j]
            y2[gb:gb + LANES] += z.T
    return y2[:G].reshape(-1)


# Thin sub-block time vs aligned: the thin flush adds one lane gather and
# two transposes per sub-block (measured 1.3-1.7x per chunk on v5e;
# benchmarks/prof_kernel_variants.py).  The router only picks thin when
# the sub-block saving clears this factor.
THIN_COST_FACTOR = 1.55


def _route_counts_native(rows_p, cols_p, m_pad: int):
    """Parallel C++ per-(window, row) counting (lane_route_counts) — the
    numpy bincount path below allocates O(n_win * m_pad) int64 (multi-GB
    at 113M nnz; the layout chooser paid 616 s on the banded giant).
    Returns (w, row, cnt) int32 arrays ascending by (w, row), or None."""
    from ..native import get_lib

    lib = get_lib()
    if lib is None or not hasattr(lib, "lane_route_counts"):
        return None
    n = len(rows_p)
    out_w = np.empty(n, np.int32)
    out_row = np.empty(n, np.int32)
    out_cnt = np.empty(n, np.int32)
    n_pairs = lib.lane_route_counts(
        np.ascontiguousarray(rows_p, np.int64),
        np.ascontiguousarray(cols_p, np.int64),
        n, int(m_pad), WINDOW, out_w, out_row, out_cnt)
    if n_pairs < 0:
        return None
    return (out_w[:n_pairs], out_row[:n_pairs].astype(np.int64),
            out_cnt[:n_pairs].astype(np.int64))


def route_cells(rows_p: np.ndarray, cols_p: np.ndarray, m_pad: int,
                phis=(1, 2, 4, 8), factor: float = THIN_COST_FACTOR,
                want_mask: bool = True):
    """Per-(window, grange) cell routing: aligned vs thin, and the fold
    factor phi (one per matrix — the kernel's fold is static).

    Aligned cost per cell = max over its (w, g) blocks of the per-lane
    Konig term (max per-(row, window) entry count — the dominant term; the
    residue term rarely binds after residue balancing and never in the
    thin regime this router arbitrates).  Thin cost = the packing lower
    bound: max(slots, per-row-multiplicity / phi, per-lane slot and
    position capacities).  Returns (thin_entry_mask, phi, stats_dict).

    want_mask=False skips the per-ENTRY products (the thin mask and its
    searchsorted) and returns None for the mask: with the native counter
    this makes a cost-only call allocate nothing of size nnz — the layout
    chooser evaluates three candidate layouts x two matrices per build
    (measured 616 s of the 113M-nnz banded ingest before this)."""
    n = len(rows_p)
    if n == 0:
        return (np.zeros(0, bool) if want_mask else None), phis[0], \
            {"aligned_sb": 0, "thin_sb": 0}
    G = m_pad // LANES
    GR = max(1, -(-G // LANES))

    # Per-(cell, row) counts WITHOUT an entry sort: a cell is a function
    # of (window, row) — cell = w*GR + row//16384 — so the pair key
    # (w, row) enumerates (cell, row) pairs, and its key space n_win *
    # m_pad is small enough to bincount directly (O(nnz) + O(keyspace),
    # vs the previous lexsort's O(nnz log nnz): measured ~25 s -> ~2 s
    # per call at 19.5M nnz).  nonzero() returns keys ascending, which
    # IS (cell, row) order.  Falls back to the sort above ~1e9 keys.
    n_win_touch = int(cols_p.max()) // WINDOW + 1
    keyspace = n_win_touch * m_pad
    # Route to the parallel C++ counter where the numpy bincount's key
    # space would be a large allocation per call (the giant regime —
    # the layout chooser makes six such calls per build); below that
    # the direct bincount is faster.
    native = _route_counts_native(rows_p, cols_p, m_pad) \
        if keyspace > 30_000_000 else None
    w_all = cell_all = None
    if native is None or want_mask:
        w_all = cols_p // WINDOW
        cell_all = w_all * np.int64(GR) + rows_p // (LANES * LANES)
    if native is not None:
        out_w, pair_row, row_cnt = native
        row_cell = out_w.astype(np.int64) * np.int64(GR) \
            + pair_row // (LANES * LANES)
        row_lane = pair_row % LANES
        row_g = pair_row // LANES
    elif keyspace <= 1_000_000_000:
        cnt = np.bincount(w_all * np.int64(m_pad) + rows_p,
                          minlength=keyspace)
        nz = np.nonzero(cnt)[0]
        row_cnt = cnt[nz]
        del cnt
        pair_row = nz % m_pad
        row_cell = (nz // m_pad) * np.int64(GR) \
            + pair_row // (LANES * LANES)
        row_lane = pair_row % LANES
        row_g = pair_row // LANES
    else:
        order = _sort_by_keys((rows_p, cell_all))
        cell_s = cell_all[order]
        rows_s = rows_p[order]
        new_row = np.ones(n, bool)
        new_row[1:] = ((rows_s[1:] != rows_s[:-1])
                       | (cell_s[1:] != cell_s[:-1]))
        row_start = np.nonzero(new_row)[0]
        row_cnt = np.diff(np.append(row_start, n))
        row_cell = cell_s[row_start]
        row_lane = rows_s[row_start] % LANES
        row_g = rows_s[row_start] // LANES

    # Cell runs over rows.
    new_cell = np.ones(len(row_cnt), bool)
    new_cell[1:] = row_cell[1:] != row_cell[:-1]
    cell_start = np.nonzero(new_cell)[0]
    cell_ids = row_cell[cell_start]
    n_cells = len(cell_ids)
    cell_E = np.add.reduceat(row_cnt, cell_start)

    # Aligned: max per-(w,g) block of max row count.  (reduceat/reshape
    # maxes throughout — np.maximum.at is a buffered ufunc, measured
    # ~10x slower on the 70M-pair giant inputs.)
    new_blk = new_cell | np.concatenate(
        [[True], row_g[1:] != row_g[:-1]])
    blk_start = np.nonzero(new_blk)[0]
    blk_max = np.maximum.reduceat(row_cnt, blk_start)
    blk_cell_idx = np.cumsum(new_cell) - 1
    blk_cells = blk_cell_idx[blk_start]  # ascending (cells sorted)
    cell_blk_start = np.concatenate(
        [[0], np.nonzero(np.diff(blk_cells))[0] + 1])
    aligned_sb = np.maximum.reduceat(blk_max, cell_blk_start)

    # Thin terms per phi.
    cell_of_row = np.cumsum(new_cell) - 1
    lane_key = cell_of_row * LANES + row_lane
    cnt_cl = np.bincount(lane_key, weights=row_cnt,
                         minlength=n_cells * LANES).astype(np.int64)
    slots_term = -(-cell_E // (LANES * LANES))
    lane_slot_term = (-(-cnt_cl.reshape(n_cells, LANES) // LANES)) \
        .max(axis=1)

    best = None
    for phi in phis:
        K = LANES // phi
        if K < 2:
            continue
        pos_rows = -(-row_cnt // phi)
        mult_term = np.maximum.reduceat(pos_rows, cell_start)
        pos_cl = np.bincount(lane_key, weights=pos_rows,
                             minlength=n_cells * LANES).astype(np.int64)
        lane_pos_term = (-(-pos_cl.reshape(n_cells, LANES) // (K - 1))) \
            .max(axis=1)
        thin_sb = np.maximum.reduce(
            [slots_term, mult_term, lane_slot_term, lane_pos_term])
        cost = np.minimum(aligned_sb,
                          np.ceil(factor * thin_sb).astype(np.int64))
        total = int(cost.sum())
        if best is None or total < best[0]:
            best = (total, phi, thin_sb)
    total_cost, phi, thin_sb = best

    thin_cells = factor * thin_sb < aligned_sb
    if want_mask:
        # Entry mask: cells sorted by id; map each entry's cell to its
        # index.
        idx = np.searchsorted(cell_ids, cell_all)
        thin_mask = thin_cells[idx]
    else:
        thin_mask = None
    stats = {
        "aligned_sb": int(aligned_sb[~thin_cells].sum()),
        "aligned_sb_if_all": int(aligned_sb.sum()),
        "thin_sb": int(thin_sb[thin_cells].sum()),
        "n_cells": n_cells,
        "n_thin_cells": int(thin_cells.sum()),
        "phi": phi,
        # Total routed cost in ALIGNED-sub-block units (thin sub-blocks
        # weighted by THIN_COST_FACTOR): the layout chooser's metric.
        "total_cost": int(total_cost),
    }
    return thin_mask, phi, stats


def hybrid_cost(rows_p: np.ndarray, cols_p: np.ndarray, m_pad: int) -> int:
    """Routed hybrid-kernel cost of a candidate layout (sub-block units,
    thin weighted by THIN_COST_FACTOR).  The layout chooser compares
    candidate row/col permutations with THIS metric — comparing with the
    aligned-only cost (round 2) made window balancing look like a win on
    banded giants when it actually destroyed the locality the thin
    router exploits (measured 6.4 vs 2.0 slots/nnz at 39M nnz)."""
    if len(rows_p) == 0:
        return 0
    _, _, stats = route_cells(np.asarray(rows_p), np.asarray(cols_p),
                              m_pad, want_mask=False)
    return stats["total_cost"]


def schedule_hybrid(rows_p: np.ndarray, cols_p: np.ndarray,
                    vals: np.ndarray, m_pad: int, n_pad: int,
                    with_cols: bool = False, phis=(1, 2, 4, 8),
                    route=None) -> dict:
    """Route cells and schedule both tile sets.

    Returns {"aligned": tiles | None, "thin": tiles | None, "phi", "G",
    "n_windows", "stats"} — the hybrid SpMV is the sum of the two kernels'
    outputs (either may be absent).  This is the TPU-native answer to the
    giant-LP regime (SURVEY §5.7; the CUDA reference caps out at one GPU's
    memory with CSR, include/structs.h:17-19 — no counterpart).
    route: optional precomputed (thin_mask, phi, stats) in this entry
    order (the layout gate already routed the full matrix)."""
    rows_p = np.asarray(rows_p)
    cols_p = np.asarray(cols_p)
    vals = np.asarray(vals)
    if route is not None:
        thin_mask, phi, stats = route
    else:
        thin_mask, phi, stats = route_cells(rows_p, cols_p, m_pad,
                                            phis=phis)
    aligned = thin = None
    if (~thin_mask).any() or not thin_mask.any():
        aligned = schedule_lane_ell(rows_p[~thin_mask], cols_p[~thin_mask],
                                    vals[~thin_mask], m_pad, n_pad,
                                    with_cols=with_cols)
    if thin_mask.any():
        thin = schedule_thin(rows_p[thin_mask], cols_p[thin_mask],
                             vals[thin_mask], m_pad, n_pad, phi=phi,
                             with_cols=with_cols)
    return {"aligned": aligned, "thin": thin, "phi": phi,
            "G": m_pad // LANES, "n_windows": -(-n_pad // WINDOW),
            "stats": stats}


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
