"""TPU-native sparse-matrix format and kernels (bucketed ELL).

Role parity with the reference's CSR + cuSPARSE SpMV + warp-bucketed fused
kernels (reference: src/preprocess.cu:17-39 row buckets,
src/cuda_kernels/HPR_cuda_kernels.cu:297-427 fused row kernels), redesigned
for TPU/XLA:

  * Rows are grouped into buckets by power-of-two nnz width.  The problem's
    row space is PERMUTED so each bucket owns a contiguous row range; a
    bucket is then a dense (R, W) pair of (vals, cols) tiles with a validity
    mask.  SpMV = gather + multiply + row-reduce per bucket, concatenated —
    static shapes, no scatter, no dynamic control flow, fully fusable by XLA
    and directly expressible as a Pallas kernel per bucket.
  * A and A^T are stored separately (the reference also materialises A^T,
    src/preprocess.cu:80-90); the column space of A is the (permuted, padded)
    row space of A^T and vice versa.
  * Dummy padding rows/cols are REAL problem entities (free constraint rows,
    variables fixed at zero), so every downstream computation is oblivious
    to padding.  See ell_build.build_device_problem.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EllBucket:
    vals: jax.Array  # (R, W) matrix values, zero-padded
    cols: jax.Array  # (R, W) int32 column positions (padded col space), 0-padded
    valid: jax.Array  # (R, W) bool, True on real nonzeros
    row_start: int = dataclasses.field(metadata=dict(static=True))
    width: int = dataclasses.field(metadata=dict(static=True))

    @property
    def nrows(self) -> int:
        return self.vals.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EllMatrix:
    """Bucketed-ELL sparse matrix over padded row/col index spaces.

    `backend` selects the SpMV/SpMM lowering (autotuned per matrix at solve
    start, parity: the reference's fused-kernel autotuner,
    src/main_iterate.cu:517-595):
      - "gather": per-bucket gather + row-reduce (the default; XLA's TPU
        gather lowering is slow — ~35M elem/s on v5e — so this is only
        right for small problems or CPU);
      - "dense":  one MXU matmul against the densified matrix (`dense` must
        be attached).  Wins whenever density is above ~2e-4 and the dense
        matrix fits in HBM;
      - "lane":   the windowed LaneELL Pallas kernel (ops/lane_ell.py,
        ops/pallas_spmv.py) — the TPU-native sparse hot path.
    Changing the backend retraces dependent jits (it is static metadata).
    """

    buckets: Tuple[EllBucket, ...]
    nrows: int = dataclasses.field(metadata=dict(static=True))
    ncols: int = dataclasses.field(metadata=dict(static=True))
    backend: str = dataclasses.field(default="gather",
                                     metadata=dict(static=True))
    # Device mesh for multi-chip solves (set by parallel.sharded).  The
    # lane backend partitions its CHUNK axis over this mesh under
    # shard_map and psums the per-device partial y (SURVEY §2.9/§5.8 —
    # new TPU-native component, no reference counterpart).
    mesh: jax.sharding.Mesh | None = dataclasses.field(
        default=None, metadata=dict(static=True))
    mesh_axis: str = dataclasses.field(default="d",
                                       metadata=dict(static=True))
    dense: jax.Array | None = None  # (nrows, ncols) when backend == "dense"
    # LaneELL tiles (backend == "lane"); see ops/lane_ell.py.  The lane
    # backend is HYBRID: cells (window, 128-group ranges) with dense fill
    # use the ALIGNED tiles (reduction-free flush), thin-fill cells use
    # the PACKED tiles (inverse-permutation flush) — either set may be
    # absent; spmv sums both kernels' outputs.
    lane_idx1t: jax.Array | None = None  # (C, 128, CHUNK_SUB) int8
    lane_idx2: jax.Array | None = None   # (C, CHUNK_SUB, 128) int8
    lane_vals: jax.Array | None = None   # (C, CHUNK_SUB, 128) f32 (hi)
    lane_vals_lo: jax.Array | None = None  # f32 low parts (f64 problems)
    lane_gbase: jax.Array | None = None  # (C*SUBBLOCKS,) int32
    lane_wid: jax.Array | None = None    # (C,) int32
    # Thin (packed) tiles for thin-fill cells (ops/lane_ell.py thin-cell
    # notes; kernel in ops/pallas_spmv.thin_spmv).
    thin_idx1t: jax.Array | None = None
    thin_idx2: jax.Array | None = None
    thin_invt: jax.Array | None = None   # (Ct, 128, CHUNK_SUB) int8
    thin_vals: jax.Array | None = None
    thin_vals_lo: jax.Array | None = None
    thin_gbase: jax.Array | None = None
    thin_wid: jax.Array | None = None
    thin_phi: int = dataclasses.field(default=1,
                                      metadata=dict(static=True))

    @property
    def dtype(self):
        return self.buckets[0].vals.dtype

    @property
    def nnz(self) -> int:
        return sum(int(b.vals.size) for b in self.buckets)


def densify(A: EllMatrix) -> jax.Array:
    """(nrows, ncols) dense matrix from the buckets (device-side)."""
    D = jnp.zeros((A.nrows, A.ncols), A.dtype)
    for b in A.buckets:
        R, W = b.vals.shape
        rows = b.row_start + jax.lax.broadcasted_iota(jnp.int32, (R, W), 0)
        vals = jnp.where(b.valid, b.vals, 0.0)
        D = D.at[rows, b.cols].add(vals)
    return D


def to_coo(A: EllMatrix):
    """Host-side (padded-position) COO of the live entries.

    Row-block parallel (numpy's nonzero/gather release the GIL): output
    order is identical to the serial per-bucket scan — ascending row
    blocks concatenate to the same row-major enumeration.  Measured 42 s
    -> ~12 s on the 113M-nnz giant's two matrices (4-core host)."""
    jobs = []  # (row_start, vals, cols, valid, lo, hi)
    for b in A.buckets:
        v = np.asarray(b.vals)
        c = np.asarray(b.cols)
        mk = np.asarray(b.valid)
        R = v.shape[0]
        n_blk = max(1, min(8, (v.size + (1 << 22) - 1) >> 22))
        step = -(-R // n_blk)
        for lo in range(0, R, step):
            jobs.append((b.row_start, v, c, mk, lo, min(R, lo + step)))
    if not jobs:
        return (np.zeros(0, np.int64),) * 2 + (np.zeros(0),)

    def run(job):
        row_start, v, c, mk, lo, hi = job
        r, k = np.nonzero(mk[lo:hi])
        return (row_start + lo + r, c[lo:hi][r, k], v[lo:hi][r, k])

    if len(jobs) > 1 and sum(j[1].size for j in jobs) > 4_000_000:
        import os as _os
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(min(_os.cpu_count() or 1, 8)) as ex:
            parts = list(ex.map(run, jobs))
    else:
        parts = [run(j) for j in jobs]
    return (np.concatenate([p[0] for p in parts]).astype(np.int64),
            np.concatenate([p[1] for p in parts]).astype(np.int64),
            np.concatenate([p[2] for p in parts]).astype(np.float64))


def _group_windows(w_of_entry: np.ndarray, n_groups: int) -> np.ndarray:
    """Partition windows into n_groups CONTIGUOUS ranges balanced by
    entry count; returns the window-range boundaries (n_groups+1,).
    Deterministic from the (replicated) entry data, so every process of
    a multi-host solve computes the same partition."""
    if len(w_of_entry) == 0:
        return np.zeros(n_groups + 1, np.int64)
    n_win = int(w_of_entry.max()) + 1
    cnt = np.bincount(w_of_entry, minlength=n_win)
    csum = np.concatenate([[0], np.cumsum(cnt)])
    targets = (np.arange(1, n_groups) * csum[-1]) // n_groups
    cuts = np.searchsorted(csum, targets, side="left")
    return np.concatenate([[0], np.clip(cuts, 0, n_win), [n_win]])


def _build_sharded_lane(A: EllMatrix, rows_p, cols_p, vals, dtype,
                        route=None):
    """Mesh-sharded hybrid LaneELL build: each window GROUP (one per
    mesh device) is routed, scheduled and packed independently, and each
    process materialises ONLY the groups of its addressable devices —
    per-host layout time and tile memory drop ~1/N on multi-host solves
    (round-2 gap: the mesh path built the FULL tile set on every host).

    Window-level independence makes the partition exact (ops/lane_ell
    _window_splits); the group axis becomes the chunk-shard axis, each
    group zero-padded to the max group chunk count (padding chunks
    compute exact zeros).  Returns (packed_aligned | None,
    packed_thin | None, phi)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.distributed import global_put
    from .lane_ell import (LANES, SUBBLOCKS, WINDOW, route_cells,
                           schedule_lane_ell, schedule_thin)
    from .pallas_spmv import pack_tiles_np

    mesh = A.mesh
    devs = mesh.devices.reshape(-1)
    n_dev = devs.size
    if route is not None:
        thin_mask, phi = route[0], route[1]
    else:
        thin_mask, phi, _stats = route_cells(rows_p, cols_p, A.nrows)
    w_all = cols_p // WINDOW
    bounds = _group_windows(w_all, n_dev)
    group_of_entry = np.searchsorted(bounds[1:-1], w_all, side="right")

    import jax as _jax

    multi = _jax.process_count() > 1
    mine = [g for g in range(n_dev)
            if not multi or devs[g].process_index == _jax.process_index()]

    def build_group(g):
        sel = group_of_entry == g
        out = {}
        for kind in ("aligned", "thin"):
            mask = sel & (thin_mask if kind == "thin" else ~thin_mask)
            if not mask.any():
                out[kind] = None
                continue
            if kind == "aligned":
                t = schedule_lane_ell(rows_p[mask], cols_p[mask],
                                      vals[mask], A.nrows, A.ncols)
            else:
                t = schedule_thin(rows_p[mask], cols_p[mask], vals[mask],
                                  A.nrows, A.ncols, phi=phi)
            out[kind] = pack_tiles_np(t, dtype)
        return out

    local = {g: build_group(g) for g in mine}

    # Agree on per-group chunk counts (multi-host: one small allgather).
    counts = np.zeros((n_dev, 2), np.int64)
    for g, tiles in local.items():
        for j, kind in enumerate(("aligned", "thin")):
            if tiles[kind] is not None:
                counts[g, j] = tiles[kind]["idx2"].shape[0]
    if multi:
        from jax.experimental import multihost_utils

        counts = np.max(
            multihost_utils.process_allgather(counts), axis=0)
    C_max = counts.max(axis=0)  # (aligned, thin)

    df64 = np.dtype(dtype) == np.float64
    # Per-DEVICE HBM guard (the single-chip guard's mesh analogue): each
    # device holds C_max chunks of each kind.
    import os as _os

    per_slot = 10 if df64 else 6
    per_dev = (int(C_max[0]) * (per_slot)
               + int(C_max[1]) * (per_slot + 1)) * SUBBLOCKS * LANES * LANES
    budget_gb = float(_os.environ.get("HPRLP_LANE_TILE_BUDGET_GB", "5.5"))
    if per_dev > budget_gb * 1e9:
        raise MemoryError(
            f"sharded lane tiles would need ~{per_dev / 1e9:.1f} GB per "
            f"device (> {budget_gb:.1f} GB budget) on a {n_dev}-device "
            f"mesh. Shard over more chips, or raise "
            f"HPRLP_LANE_TILE_BUDGET_GB.")
    shard = NamedSharding(mesh, P(A.mesh_axis))

    def assemble(kind, j):
        Cm = int(C_max[j])
        if Cm == 0:
            return None
        spec = {
            "idx1t": ((Cm, LANES, SUBBLOCKS * LANES), np.int8),
            "idx2": ((Cm, SUBBLOCKS * LANES, LANES), np.int8),
            "vals": ((Cm, SUBBLOCKS * LANES, LANES), np.float32),
            "gbase": ((Cm * SUBBLOCKS,), np.int32),
            "wid": ((Cm,), np.int32),
        }
        if df64:
            spec["vals_lo"] = spec["vals"]
        if kind == "thin":
            spec["invt"] = spec["idx1t"]

        def group_block(key, g):
            shape, dt = spec[key]
            tiles = local[g][kind] if g in local else None
            blk = np.zeros(shape, dt)
            if tiles is not None and tiles.get(key) is not None:
                src = tiles[key]
                blk[:src.shape[0]] = src
            return blk

        out = {}
        for key in spec:
            gshape = (n_dev * spec[key][0][0],) + spec[key][0][1:]
            if multi:
                blk_sz = spec[key][0][0]

                def cb(idx, key=key, blk_sz=blk_sz):
                    g = idx[0].start // blk_sz
                    return group_block(key, g)

                out[key] = _jax.make_array_from_callback(
                    gshape, shard, cb)
            else:
                out[key] = global_put(
                    np.concatenate([group_block(key, g)
                                    for g in range(n_dev)], axis=0),
                    shard)
        if not df64:
            out["vals_lo"] = None
        if kind == "thin":
            out["phi"] = phi
        return out

    packed_a = assemble("aligned", 0)
    packed_t = assemble("thin", 1)

    # Memory accounting for the giant-mesh evidence (BASELINE config 5):
    # bytes of one device's tile shard (C_max-padded) vs the unpadded
    # total (= what a single-device layout of the same routing holds).
    # Read by benchmarks/run.py after a mesh solve.
    def kind_bytes(C, kind):
        if C == 0:
            return 0
        per_chunk = (SUBBLOCKS * LANES * LANES
                     * (2                      # idx1t + idx2 (i8)
                        + (8 if df64 else 4))  # vals (+ vals_lo)
                     + SUBBLOCKS * 4 + 4)      # gbase + wid
        if kind == "thin":
            per_chunk += SUBBLOCKS * LANES * LANES  # invt (i8)
        return C * per_chunk

    unpadded = int(sum(kind_bytes(int(counts[g, j]), kind)
                       for g in range(n_dev)
                       for j, kind in enumerate(("aligned", "thin"))))
    per_device = int(kind_bytes(int(C_max[0]), "aligned")
                     + kind_bytes(int(C_max[1]), "thin"))
    sharded_build_stats_log.append({
        "n_devices": int(n_dev),
        "per_device_tile_bytes": per_device,
        "total_tile_bytes": per_device * int(n_dev),
        "unpadded_tile_bytes": unpadded,
    })
    return packed_a, packed_t, phi


# One entry per _build_sharded_lane call (a mesh solve appends two: A
# then AT).  benchmarks/run.py clears it before a mesh solve and sums
# the entries for the giant-mesh memory evidence (BASELINE config 5:
# per-device tile bytes ~ 1/N of the single-device layout).
sharded_build_stats_log: list = []


def attach_lane(A: EllMatrix, coo=None, route=None) -> EllMatrix:
    """Build and attach hybrid LaneELL tiles (host scheduling round-trip).

    Cells are routed per (window, 128-group range) between the ALIGNED
    layout (dense fill) and the THIN packed layout (thin fill); see
    ops/lane_ell.schedule_hybrid.  When A carries a device mesh, both tile
    sets' chunk axes are padded to a multiple of the mesh size and placed
    chunk-sharded over it; spmv() then runs the kernels under shard_map
    with a psum of the per-device partial y.

    coo: optional (rows_p, cols_p, vals) in PADDED positions — the giant
    lane-first path derives it from its CSR directly (its ELL buckets are
    empty stubs, so to_coo would return nothing).
    route: optional (thin_mask, phi, stats) aligned with coo's entry
    order — the layout gate's full-entry routing, reused so the
    schedulers skip their own route_cells (two more O(nnz) routes)."""
    import os

    from .lane_ell import schedule_hybrid
    from .pallas_spmv import estimate_tile_bytes, pack_tiles

    import sys as _sys
    import time as _time

    _verbose = os.environ.get("HPRLP_LAYOUT_VERBOSE") == "1"
    _t = _time.perf_counter()

    def _tick(label):
        nonlocal _t
        if _verbose:
            print(f"[lane] {label}: {_time.perf_counter() - _t:.1f}s",
                  file=_sys.stderr, flush=True)
        _t = _time.perf_counter()

    if A.mesh is not None:
        # Sharded layout: schedule/pack per window group, per-host only
        # the addressable shards (_build_sharded_lane).
        rows_p, cols_p, vals = coo if coo is not None else to_coo(A)
        packed_a, packed_t, _phi = _build_sharded_lane(
            A, rows_p, cols_p, vals, np.dtype(A.dtype), route=route)
    else:
        rows_p, cols_p, vals = coo if coo is not None else to_coo(A)
        _tick("to_coo")
        hy = schedule_hybrid(rows_p, cols_p, vals, A.nrows, A.ncols,
                             route=route)
        _tick("schedule_hybrid")

        budget_gb = float(os.environ.get("HPRLP_LANE_TILE_BUDGET_GB",
                                         "5.5"))
        total = sum(estimate_tile_bytes(t, A.dtype)
                    for t in (hy["aligned"], hy["thin"]) if t is not None)
        if total > budget_gb * 1e9:
            raise MemoryError(
                f"hybrid lane tiles would need ~{total / 1e9:.1f} GB "
                f"(> {budget_gb:.1f} GB budget). Shard over more chips, "
                f"or raise HPRLP_LANE_TILE_BUDGET_GB.")

        packed_a = (pack_tiles(hy["aligned"], A.ncols, A.dtype)
                    if hy["aligned"] is not None else None)
        packed_t = (pack_tiles(hy["thin"], A.ncols, A.dtype)
                    if hy["thin"] is not None else None)
        _tick("pack+upload")

    kw: dict = dict(backend="lane", dense=None)
    if packed_a is not None:
        kw.update(lane_idx1t=packed_a["idx1t"], lane_idx2=packed_a["idx2"],
                  lane_vals=packed_a["vals"],
                  lane_vals_lo=packed_a["vals_lo"],
                  lane_gbase=packed_a["gbase"], lane_wid=packed_a["wid"])
    else:
        kw.update(lane_idx1t=None, lane_idx2=None, lane_vals=None,
                  lane_vals_lo=None, lane_gbase=None, lane_wid=None)
    if packed_t is not None:
        kw.update(thin_idx1t=packed_t["idx1t"], thin_idx2=packed_t["idx2"],
                  thin_invt=packed_t["invt"], thin_vals=packed_t["vals"],
                  thin_vals_lo=packed_t["vals_lo"],
                  thin_gbase=packed_t["gbase"], thin_wid=packed_t["wid"],
                  thin_phi=packed_t["phi"])
    else:
        kw.update(thin_idx1t=None, thin_idx2=None, thin_invt=None,
                  thin_vals=None, thin_vals_lo=None, thin_gbase=None,
                  thin_wid=None, thin_phi=1)
    return dataclasses.replace(A, **kw)


# Fields cleared whenever a lane tile set would go stale.
_NO_LANE = dict(lane_idx1t=None, lane_idx2=None, lane_vals=None,
                lane_vals_lo=None, lane_gbase=None, lane_wid=None,
                thin_idx1t=None, thin_idx2=None, thin_invt=None,
                thin_vals=None, thin_vals_lo=None, thin_gbase=None,
                thin_wid=None, thin_phi=1)


def with_backend(A: EllMatrix, backend: str) -> EllMatrix:
    """Return A configured for the given SpMV backend."""
    if backend == A.backend:
        return A
    if backend == "dense":
        return dataclasses.replace(A, backend="dense", dense=densify(A))
    if backend == "lane":
        return attach_lane(A)
    return dataclasses.replace(A, backend=backend, dense=None, **_NO_LANE)


def spmv(A: EllMatrix, x: jax.Array) -> jax.Array:
    """y = A @ x.  x: (ncols,) -> y: (nrows,).

    gather backend: each bucket is a dense gather+reduce; buckets cover
    contiguous row ranges in order, so concatenation reassembles y.
    """
    if A.backend == "dense":
        # HIGHEST: full-f32 MXU passes — bf16 default would degrade the
        # iterates and fail the autotuner's merit check anyway.
        return jnp.dot(A.dense, x, preferred_element_type=x.dtype,
                       precision=jax.lax.Precision.HIGHEST)
    if A.backend == "lane":
        from .pallas_spmv import (lane_spmv, lane_spmv_df64, thin_spmv,
                                  thin_spmv_df64)

        # Interpreter mode on CPU backends (tests / virtual meshes).
        interp = jax.default_backend() == "cpu"
        g_real = A.nrows // 128
        df64 = (A.lane_vals_lo is not None
                or A.thin_vals_lo is not None)
        have_a = A.lane_vals is not None
        have_t = A.thin_vals is not None

        def split_x(x_loc):
            # f64 solve: split x into a double-f32 pair, run the
            # compensated kernel, recombine — Mosaic has no f64 and the
            # gather fallback is ~100x slower (round-1 weak spot: 1e-8
            # solves ran at gather speed).
            xh = x_loc.astype(jnp.float32)
            return xh, (x_loc - xh.astype(x_loc.dtype)).astype(jnp.float32)

        def aligned_dev(x_loc, i1t, i2, v, vlo, gbase, wid):
            if not df64:
                return lane_spmv(x_loc, i1t, i2, v, gbase, wid, g_real,
                                 interpret=interp)
            xh, xl = split_x(x_loc)
            yh, yl = lane_spmv_df64(xh, xl, i1t, i2, v, vlo, gbase, wid,
                                    g_real, interpret=interp)
            return yh.astype(x_loc.dtype) + yl.astype(x_loc.dtype)

        def thin_dev(x_loc, i1t, i2, invt, v, vlo, gbase, wid):
            if not df64:
                return thin_spmv(x_loc, i1t, i2, invt, v, gbase, wid,
                                 g_real, A.thin_phi, interpret=interp)
            xh, xl = split_x(x_loc)
            yh, yl = thin_spmv_df64(xh, xl, i1t, i2, invt, v, vlo, gbase,
                                    wid, g_real, A.thin_phi,
                                    interpret=interp)
            return yh.astype(x_loc.dtype) + yl.astype(x_loc.dtype)

        if A.mesh is None:
            y = None
            if have_a:
                y = aligned_dev(x, A.lane_idx1t, A.lane_idx2, A.lane_vals,
                                A.lane_vals_lo, A.lane_gbase, A.lane_wid)
            if have_t:
                yt = thin_dev(x, A.thin_idx1t, A.thin_idx2, A.thin_invt,
                              A.thin_vals, A.thin_vals_lo, A.thin_gbase,
                              A.thin_wid)
                y = yt if y is None else y + yt
            return y
        # Multi-chip: each device runs the kernels over ITS chunk shards
        # against the replicated x, producing a partial y; one psum over
        # ICI completes the SpMV.  (nnz-partition — any device may touch
        # any output row, the psum makes that free.)
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        ax = A.mesh_axis
        zero = jnp.zeros((0,), jnp.float32)
        args: list = []
        specs: list = [P()]
        if have_a:
            args += [A.lane_idx1t, A.lane_idx2, A.lane_vals,
                     A.lane_vals_lo if df64 else zero, A.lane_gbase,
                     A.lane_wid]
            specs += [P(ax)] * 6
        if have_t:
            args += [A.thin_idx1t, A.thin_idx2, A.thin_invt, A.thin_vals,
                     A.thin_vals_lo if df64 else zero, A.thin_gbase,
                     A.thin_wid]
            specs += [P(ax)] * 7

        def body(x_loc, *tiles):
            i = 0
            y_part = None
            if have_a:
                i1t, i2, v, vlo, gbase, wid = tiles[0:6]
                i = 6
                y_part = aligned_dev(x_loc, i1t, i2, v,
                                     vlo if df64 else None, gbase, wid)
            if have_t:
                i1t, i2, invt, v, vlo, gbase, wid = tiles[i:i + 7]
                yt = thin_dev(x_loc, i1t, i2, invt, v,
                              vlo if df64 else None, gbase, wid)
                y_part = yt if y_part is None else y_part + yt
            return jax.lax.psum(y_part, ax)

        return shard_map(
            body, mesh=A.mesh,
            in_specs=tuple(specs),
            out_specs=P(),
            check_vma=False)(x, *args)
    parts = [jnp.sum(b.vals * x[b.cols], axis=1) for b in A.buckets]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts)


def spmv_pair(A: EllMatrix, xp):
    """y = A @ x on an (hi, lo) double-f32 pair, returning a pair.

    The f64 hot loop keeps its iterates as pairs (ops/df64.py); the lane
    backend feeds them straight into the compensated kernel with no
    f64 round-trip.  Other backends fall back to the f64 spmv."""
    if (A.backend == "lane" and A.mesh is None
            and (A.lane_vals_lo is not None
                 or A.thin_vals_lo is not None)):
        from .pallas_spmv import lane_spmv_df64, thin_spmv_df64

        interp = jax.default_backend() == "cpu"
        g_real = A.nrows // 128
        yp = None
        if A.lane_vals_lo is not None:
            yp = lane_spmv_df64(xp[0], xp[1], A.lane_idx1t, A.lane_idx2,
                                A.lane_vals, A.lane_vals_lo, A.lane_gbase,
                                A.lane_wid, g_real, interpret=interp)
        if A.thin_vals_lo is not None:
            yt = thin_spmv_df64(xp[0], xp[1], A.thin_idx1t, A.thin_idx2,
                                A.thin_invt, A.thin_vals, A.thin_vals_lo,
                                A.thin_gbase, A.thin_wid, g_real,
                                A.thin_phi, interpret=interp)
            if yp is None:
                yp = yt
            else:
                from . import df64 as dd

                yp = dd.add(yp, yt)
        return yp
    from . import df64 as dd

    return dd.from64(spmv(A, dd.to64(xp)))


def spmm(A: EllMatrix, X: jax.Array) -> jax.Array:
    """Y = A @ X for batched solves.  X: (ncols, B) -> Y: (nrows, B).

    TPU-native replacement for the reference's cuSPARSE SpMM batched path
    (reference: src/batched_solver.cu:428-477).
    """
    if A.backend == "dense":
        return jnp.dot(A.dense, X, preferred_element_type=X.dtype,
                       precision=jax.lax.Precision.HIGHEST)
    parts = [
        jnp.einsum("rw,rwb->rb", b.vals, X[b.cols],
                   preferred_element_type=X.dtype)
        for b in A.buckets
    ]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def row_inf_norms(A: EllMatrix) -> jax.Array:
    """Per-row max |a_ij| (padding is zero so it never wins)."""
    return jnp.concatenate([jnp.max(jnp.abs(b.vals), axis=1) for b in A.buckets])


def row_one_norms(A: EllMatrix) -> jax.Array:
    """Per-row sum |a_ij|."""
    return jnp.concatenate([jnp.sum(jnp.abs(b.vals), axis=1) for b in A.buckets])


def row_counts(A: EllMatrix) -> jax.Array:
    """Per-row number of structural nonzeros."""
    return jnp.concatenate(
        [jnp.sum(b.valid, axis=1).astype(jnp.int32) for b in A.buckets])


def scale_rows(A: EllMatrix, s: jax.Array) -> EllMatrix:
    """Return A with row i multiplied by s[i].  s: (nrows,).
    Any attached dense copy is dropped (it would go stale)."""
    buckets = tuple(
        dataclasses.replace(
            b, vals=b.vals * s[b.row_start:b.row_start + b.nrows, None])
        for b in A.buckets)
    return dataclasses.replace(A, buckets=buckets, backend="gather",
                               dense=None, **_NO_LANE)


def scale_cols(A: EllMatrix, s: jax.Array) -> EllMatrix:
    """Return A with column j multiplied by s[j].  s: (ncols,).
    Any attached dense copy is dropped (it would go stale)."""
    buckets = tuple(
        dataclasses.replace(b, vals=b.vals * s[b.cols]) for b in A.buckets)
    return dataclasses.replace(A, buckets=buckets, backend="gather",
                               dense=None, **_NO_LANE)


def row_masked_mean(A: EllMatrix, per_entry_fn) -> jax.Array:
    """Per-row mean of per_entry_fn(vals, cols) over valid entries; 0 for
    empty rows (reference: src/scaling.cu:5-31 Curtis-Reid row update)."""
    outs = []
    for b in A.buckets:
        t = jnp.where(b.valid, per_entry_fn(b.vals, b.cols), 0.0)
        cnt = jnp.sum(b.valid, axis=1).astype(t.dtype)
        outs.append(jnp.where(cnt > 0, jnp.sum(t, axis=1) / jnp.maximum(cnt, 1), 0.0))
    return jnp.concatenate(outs) if len(outs) > 1 else outs[0]


# ---------------------------------------------------------------------------
# Host-side construction
# ---------------------------------------------------------------------------

def _next_pow2(x: int) -> int:
    return 1 << max(0, int(x - 1).bit_length()) if x > 1 else 1


def plan_entry_total(entry, row_multiple: int) -> int:
    """Padded position count of a plan entry.

    Entries are (width, rows) — padded to row_multiple — or
    (width, rows, total) with an explicit position count (window-major
    layouts use overrides to align window boundaries)."""
    if len(entry) == 3:
        return int(entry[2])
    return -(-max(len(entry[1]), 1) // row_multiple) * row_multiple


def plan_buckets(nnz_per_row: np.ndarray, min_width: int,
                 min_bucket_rows: int,
                 locality_key: np.ndarray | None = None
                 ) -> list[tuple[int, np.ndarray]]:
    """Assign each row a power-of-two ELL width and group rows by width.

    Groups smaller than min_bucket_rows are merged into the next wider
    group (analogous in spirit to the reference's short/medium row split,
    src/preprocess.cu:17-39, generalised to geometric widths).
    Returns [(width, row_indices)] with widths ascending; row order within
    a bucket preserves original order, or follows locality_key when given
    (rows with nearby keys land in the same 128-row LaneELL group, so
    structured matrices touch fewer x-windows per group).
    """
    nnz_per_row = np.asarray(nnz_per_row)
    widths = np.maximum(min_width,
                        np.exp2(np.ceil(np.log2(np.maximum(nnz_per_row, 1)))).astype(np.int64))
    uniq = np.unique(widths)
    if locality_key is None:
        groups = [(int(w), np.nonzero(widths == w)[0]) for w in uniq]
    else:
        locality_key = np.asarray(locality_key)
        groups = []
        for w in uniq:
            rows = np.nonzero(widths == w)[0]
            groups.append((int(w),
                           rows[np.argsort(locality_key[rows],
                                           kind="stable")]))
    # Merge small groups upward.
    def resort(rows):
        if locality_key is None:
            return np.sort(rows)
        return rows[np.argsort(locality_key[rows], kind="stable")]

    merged: list[tuple[int, np.ndarray]] = []
    carry = None
    for i, (w, rows) in enumerate(groups):
        if carry is not None:
            rows = resort(np.concatenate([carry, rows]))
            carry = None
        if len(rows) < min_bucket_rows and i + 1 < len(groups):
            carry = rows
        else:
            merged.append((w, rows))
    if carry is not None:
        # Everything was small: single bucket at the largest width seen.
        if merged:
            w, rows = merged[-1]
            merged[-1] = (w, resort(np.concatenate([rows, carry])))
        else:
            merged = [(int(uniq[-1]), carry)]
    return merged


def build_ell_from_csr(indptr: np.ndarray, indices: np.ndarray,
                       data: np.ndarray, bucket_plan, col_pos: np.ndarray,
                       nrows_padded: int, ncols_padded: int,
                       row_multiple: int, dtype,
                       upload: bool = True) -> tuple[EllMatrix, np.ndarray]:
    """Build an EllMatrix from host CSR arrays.

    bucket_plan: output of plan_buckets over this matrix's rows.
    col_pos: map original column id -> padded column position.
    Returns (matrix, row_pos) where row_pos maps original row id -> padded
    row position.  Bucket row counts are padded to row_multiple; a final
    all-dummy bucket absorbs the remaining padding up to nrows_padded.
    upload=False keeps the buckets as HOST numpy arrays (the giant
    lane-first path reads them once for lane scheduling and never ships
    the ELL to the device — only the lane tiles go over the link).
    """
    indptr = np.asarray(indptr)
    indices = np.asarray(indices)
    data = np.asarray(data)
    n_orig = len(indptr) - 1
    row_pos = np.full(n_orig, -1, dtype=np.int64)

    host: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    meta: list[tuple[int, int]] = []  # (row_start, width)
    cursor = 0
    for entry in bucket_plan:
        w, rows = entry[0], entry[1]
        r_real = len(rows)
        r_total = plan_entry_total(entry, row_multiple)
        if r_total == 0:
            continue
        vals = np.zeros((r_total, w), dtype=dtype)
        cols = np.zeros((r_total, w), dtype=np.int32)
        valid = np.zeros((r_total, w), dtype=bool)
        if r_real:
            row_pos[rows] = cursor + np.arange(r_real)
            if data.size:
                starts = indptr[rows]
                counts = indptr[rows + 1] - starts
                offs = np.arange(w)
                mask = offs[None, :] < counts[:, None]
                idx = np.where(mask, starts[:, None] + offs[None, :], 0)
                vals[:r_real] = np.where(mask, data[idx], 0.0)
                cols[:r_real] = np.where(mask, col_pos[indices[idx]], 0)
                valid[:r_real] = mask
        host.append((vals, cols, valid))
        meta.append((cursor, int(w)))
        cursor += r_total

    if cursor > nrows_padded:
        raise ValueError(f"bucket padding overflow: {cursor} > {nrows_padded}")
    if cursor < nrows_padded:
        pad = nrows_padded - cursor
        w = 4
        host.append((np.zeros((pad, w), dtype=dtype),
                     np.zeros((pad, w), dtype=np.int32),
                     np.zeros((pad, w), dtype=bool)))
        meta.append((cursor, w))

    # ONE batched transfer for every bucket array: per-call device_put
    # overhead dominates layout time at scale (measured ~27 ms/call x
    # 300+ calls at 10.5M nnz; batching cuts it ~6x).
    dev = jax.device_put(host) if upload else host
    buckets = [EllBucket(vals=v, cols=c, valid=mk, row_start=rs, width=w)
               for (v, c, mk), (rs, w) in zip(dev, meta)]
    mat = EllMatrix(buckets=tuple(buckets), nrows=nrows_padded,
                    ncols=ncols_padded)
    return mat, row_pos


def padded_size(real_rows_after_bucket_pad: int, vec_multiple: int) -> int:
    return -(-max(real_rows_after_bucket_pad, 1) // vec_multiple) * vec_multiple


def bucketed_row_total(bucket_plan, row_multiple: int) -> int:
    return sum(plan_entry_total(e, row_multiple) for e in bucket_plan)
