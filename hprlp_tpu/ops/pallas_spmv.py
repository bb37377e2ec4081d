"""Pallas TPU kernel for windowed LaneELL SpMV (format + scheduling in
ops/lane_ell.py).

Per grid step ("super-chunk" of CHUNK_SUB = 512 slot sublanes, one
x-window each, scalar-prefetched so only the windows a chunk needs are
DMA'd):

    WT  = transpose(x3[wid[c]])            (128, 128) residue-major window
    g0T = lane-gather(WT, idx1T[c])        row-in-window per residue
    g1  = lane-gather(transpose(g0T), idx2[c])   route to output row lane
    per 128-sublane sub-block j:
        y2[gbase[c,j] : gbase[c,j]+128, :] += g1_j * vals[c,j]

The flush needs no reduction because the scheduler ALIGNS sublanes to
output rows: sub-block j holds at most one sublane per group, with the
sublane for group g at position g - gbase (ops/lane_ell.py).  Every op in
the kernel is a full-width vector op; nothing is serial and nothing runs
on the MXU.

Role parity: the reference's fused warp-bucketed SpMV kernels (reference:
src/cuda_kernels/HPR_cuda_kernels.cu:297-427) — redesigned around the TPU
vector unit's lane crossbar rather than warp shuffles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lane_ell import CHUNK_SUB, LANES, SUBBLOCKS, WINDOW


def _lane_kernel(wid_ref, gbase_ref, x3_ref, i1t_ref, i2_ref, v_ref,
                 y2_ref, p_ref):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        y2_ref[:] = jnp.zeros_like(y2_ref)

    # The lane crossbar is 128 wide, so gathers run per 128-sublane
    # sub-block; the super-chunk still amortises grid-step and DMA
    # overheads 4x.  Index tiles stream as int8 (all values < 128) and
    # widen in VMEM (less HBM traffic).  Products land in the p scratch
    # first and flush in a second loop — interleaving the gathers with
    # the dynamic-index accumulator writes serialises the pipeline
    # (measured 3x slower fused).
    wt = x3_ref[0].T                                       # (128, 128)
    for j in range(SUBBLOCKS):
        sl = slice(j * LANES, (j + 1) * LANES)
        g0t = jnp.take_along_axis(wt, i1t_ref[0][:, sl].astype(jnp.int32),
                                  axis=1)
        g1 = jnp.take_along_axis(g0t.T, i2_ref[0][sl, :].astype(jnp.int32),
                                 axis=1)
        p_ref[sl, :] = g1 * v_ref[0][sl, :]
    for j in range(SUBBLOCKS):
        gb = gbase_ref[c * SUBBLOCKS + j]
        y2_ref[pl.ds(gb, LANES), :] += p_ref[j * LANES:(j + 1) * LANES, :]


@functools.partial(jax.jit, static_argnames=("g_real", "interpret"))
def lane_spmv(x_pad: jax.Array, idx1t: jax.Array, idx2: jax.Array,
              vals: jax.Array, gbase: jax.Array, wid: jax.Array,
              g_real: int, interpret: bool = False) -> jax.Array:
    """y = A @ x using windowed LaneELL tiles.

    x_pad: (n_pad,); idx1t: (C, 128, CHUNK_SUB); idx2/vals:
    (C, CHUNK_SUB, 128); gbase: (C*SUBBLOCKS,) int32 (128-aligned flush
    bases); wid: (C,) int32.  g_real: m_pad // 128.
    Returns y: (g_real * 128,).
    """
    C = idx2.shape[0]
    n_pad = x_pad.shape[0]
    n_win = -(-n_pad // WINDOW)
    if n_win * WINDOW != n_pad:
        x_pad = jnp.pad(x_pad, (0, n_win * WINDOW - n_pad))
    x3 = x_pad.reshape(n_win, LANES, LANES)
    # Flush windows are 128-aligned, so the accumulator rounds the group
    # count up to a 128 multiple (the tail slice is dropped on return).
    g_alloc = -(-max(g_real, LANES) // LANES) * LANES

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, LANES, LANES),
                         lambda c, wid, gb: (wid[c], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES, CHUNK_SUB),
                         lambda c, wid, gb: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK_SUB, LANES),
                         lambda c, wid, gb: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK_SUB, LANES),
                         lambda c, wid, gb: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g_alloc, LANES),
                               lambda c, wid, gb: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((CHUNK_SUB, LANES), x_pad.dtype)],
    )
    # Everything in the kernel (and its index maps) is 32-bit; trace the
    # whole pallas_call with x64 off so neither jnp index helpers nor the
    # index-map literals introduce int64, which Mosaic rejects (f64
    # solves enable x64 globally).
    with jax.enable_x64(False):
        y2 = pl.pallas_call(
            _lane_kernel,
            grid_spec=grid_spec,
            interpret=interpret,
            out_shape=jax.ShapeDtypeStruct((g_alloc, LANES), x_pad.dtype),
        )(wid, gbase, x3, idx1t, idx2, vals)
    return y2[:g_real].reshape(-1)


def _lane_kernel_df64(wid_ref, gbase_ref, x3h_ref, x3l_ref, i1t_ref,
                      i2_ref, vh_ref, vl_ref, y2h_ref, y2l_ref, ph_ref,
                      pl_ref):
    """Double-f32 ("df64") variant: every operand is an (hi, lo) f32 pair
    and the accumulation is compensated, giving ~2^-48 relative accuracy
    — the TPU has no native f64 (Mosaic refuses it outright), so this is
    the fast high-precision SpMV (SURVEY §7.0 design stance / §7.2 hard
    part 1).  Products use Dekker splitting for the exact x_hi*v_hi error
    term; the flush runs TwoSum into the (y2h, y2l) accumulator pair."""
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        y2h_ref[:] = jnp.zeros_like(y2h_ref)
        y2l_ref[:] = jnp.zeros_like(y2l_ref)

    SPLIT = jnp.float32(4097.0)  # 2^12 + 1: Dekker split for f32
    wth = x3h_ref[0].T
    wtl = x3l_ref[0].T
    for j in range(SUBBLOCKS):
        sl = slice(j * LANES, (j + 1) * LANES)
        i1 = i1t_ref[0][:, sl].astype(jnp.int32)
        i2 = i2_ref[0][sl, :].astype(jnp.int32)
        xh = jnp.take_along_axis(jnp.take_along_axis(wth, i1, axis=1).T,
                                 i2, axis=1)
        xl = jnp.take_along_axis(jnp.take_along_axis(wtl, i1, axis=1).T,
                                 i2, axis=1)
        vh = vh_ref[0][sl, :]
        vl = vl_ref[0][sl, :]
        # TwoProd(xh, vh) via Dekker splitting (no exact-fma primitive).
        p = xh * vh
        cx = xh * SPLIT
        xh_hi = cx - (cx - xh)
        xh_lo = xh - xh_hi
        cv = vh * SPLIT
        vh_hi = cv - (cv - vh)
        vh_lo = vh - vh_hi
        err = ((xh_hi * vh_hi - p) + xh_hi * vh_lo + xh_lo * vh_hi) \
            + xh_lo * vh_lo
        ph_ref[sl, :] = p
        pl_ref[sl, :] = err + xh * vl + xl * vh
    for j in range(SUBBLOCKS):
        gb = gbase_ref[c * SUBBLOCKS + j]
        sl = slice(j * LANES, (j + 1) * LANES)
        acc_h = y2h_ref[pl.ds(gb, LANES), :]
        p = ph_ref[sl, :]
        # TwoSum(acc_h, p): exact error of the high-part add.
        s = acc_h + p
        bb = s - acc_h
        e = (acc_h - (s - bb)) + (p - bb)
        y2h_ref[pl.ds(gb, LANES), :] = s
        y2l_ref[pl.ds(gb, LANES), :] += e + pl_ref[sl, :]


@functools.partial(jax.jit, static_argnames=("g_real", "interpret"))
def lane_spmv_df64(xh: jax.Array, xl: jax.Array, idx1t, idx2, vals_hi,
                   vals_lo, gbase, wid, g_real: int,
                   interpret: bool = False):
    """(y_hi, y_lo) = A @ (xh + xl) in double-f32, same tiles as
    lane_spmv plus the values' low parts."""
    C = idx2.shape[0]
    n_pad = xh.shape[0]
    n_win = -(-n_pad // WINDOW)
    if n_win * WINDOW != n_pad:
        pad = n_win * WINDOW - n_pad
        xh = jnp.pad(xh, (0, pad))
        xl = jnp.pad(xl, (0, pad))
    x3h = xh.reshape(n_win, LANES, LANES)
    x3l = xl.reshape(n_win, LANES, LANES)
    g_alloc = -(-max(g_real, LANES) // LANES) * LANES

    win_spec = pl.BlockSpec((1, LANES, LANES),
                            lambda c, wid, gb: (wid[c], 0, 0),
                            memory_space=pltpu.VMEM)
    tile_spec_t = pl.BlockSpec((1, LANES, CHUNK_SUB),
                               lambda c, wid, gb: (c, 0, 0),
                               memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec((1, CHUNK_SUB, LANES),
                             lambda c, wid, gb: (c, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((g_alloc, LANES), lambda c, wid, gb: (0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(C,),
        in_specs=[win_spec, win_spec, tile_spec_t, tile_spec, tile_spec,
                  tile_spec],
        out_specs=(out_spec, out_spec),
        scratch_shapes=[pltpu.VMEM((CHUNK_SUB, LANES), jnp.float32),
                        pltpu.VMEM((CHUNK_SUB, LANES), jnp.float32)],
    )
    with jax.enable_x64(False):
        y2h, y2l = pl.pallas_call(
            _lane_kernel_df64,
            grid_spec=grid_spec,
            interpret=interpret,
            out_shape=(jax.ShapeDtypeStruct((g_alloc, LANES), jnp.float32),
                       jax.ShapeDtypeStruct((g_alloc, LANES), jnp.float32)),
        )(wid, gbase, x3h, x3l, idx1t, idx2, vals_hi, vals_lo)
    return y2h[:g_real].reshape(-1), y2l[:g_real].reshape(-1)


def _make_thin_kernel(phi: int):
    """Thin (packed) LaneELL kernel: same two-phase gather as the aligned
    kernel, but the flush is an inverse-permutation lane gather over the
    phi-fold of the sub-block's sublanes (ops/lane_ell.py thin-cell notes):

        f       = sum of the phi sublane strata            (K, 128)
        z[l, d] = f[inv[l, d], l]                          (lane gather)
        y2[gbase + d, :] += z.T

    so sublanes pack entries from ANY group of the 128-group range at any
    per-row multiplicity <= phi — no group-aligned depth padding."""
    K = LANES // phi

    def _kernel(wid_ref, gbase_ref, x3_ref, i1t_ref, i2_ref, inv_ref,
                v_ref, y2_ref, p_ref):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            y2_ref[:] = jnp.zeros_like(y2_ref)

        wt = x3_ref[0].T
        for j in range(SUBBLOCKS):
            sl = slice(j * LANES, (j + 1) * LANES)
            g0t = jnp.take_along_axis(
                wt, i1t_ref[0][:, sl].astype(jnp.int32), axis=1)
            g1 = jnp.take_along_axis(
                g0t.T, i2_ref[0][sl, :].astype(jnp.int32), axis=1)
            p_ref[sl, :] = g1 * v_ref[0][sl, :]
        for j in range(SUBBLOCKS):
            gb = gbase_ref[c * SUBBLOCKS + j]
            pj = p_ref[j * LANES:(j + 1) * LANES, :]
            if phi == 1:
                src = pj
            else:
                f = pj[0:K, :]
                for sg in range(1, phi):
                    f = f + pj[sg * K:(sg + 1) * K, :]
                src = jnp.concatenate([f] * phi, axis=0)
            inv = inv_ref[0][:, j * LANES:(j + 1) * LANES].astype(jnp.int32)
            z = jnp.take_along_axis(src.T, inv, axis=1)      # (l, d)
            y2_ref[pl.ds(gb, LANES), :] += z.T

    return _kernel


@functools.partial(jax.jit, static_argnames=("g_real", "phi", "interpret"))
def thin_spmv(x_pad: jax.Array, idx1t: jax.Array, idx2: jax.Array,
              invt: jax.Array, vals: jax.Array, gbase: jax.Array,
              wid: jax.Array, g_real: int, phi: int,
              interpret: bool = False) -> jax.Array:
    """y = A_thin @ x using thin (packed) LaneELL tiles.

    Same tile shapes as lane_spmv plus invt: (C, 128, CHUNK_SUB) int8 —
    the per-sub-block (lane, group-offset) -> fold-position map."""
    C = idx2.shape[0]
    n_pad = x_pad.shape[0]
    n_win = -(-n_pad // WINDOW)
    if n_win * WINDOW != n_pad:
        x_pad = jnp.pad(x_pad, (0, n_win * WINDOW - n_pad))
    x3 = x_pad.reshape(n_win, LANES, LANES)
    g_alloc = -(-max(g_real, LANES) // LANES) * LANES

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, LANES, LANES),
                         lambda c, wid, gb: (wid[c], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES, CHUNK_SUB),
                         lambda c, wid, gb: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK_SUB, LANES),
                         lambda c, wid, gb: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES, CHUNK_SUB),
                         lambda c, wid, gb: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK_SUB, LANES),
                         lambda c, wid, gb: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g_alloc, LANES),
                               lambda c, wid, gb: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((CHUNK_SUB, LANES), x_pad.dtype)],
    )
    with jax.enable_x64(False):
        y2 = pl.pallas_call(
            _make_thin_kernel(phi),
            grid_spec=grid_spec,
            interpret=interpret,
            out_shape=jax.ShapeDtypeStruct((g_alloc, LANES), x_pad.dtype),
        )(wid, gbase, x3, idx1t, idx2, invt, vals)
    return y2[:g_real].reshape(-1)


def _make_thin_kernel_df64(phi: int):
    """Double-f32 thin kernel: compensated products (as the aligned df64
    kernel), TwoSum fold across the phi strata, then the inverse-
    permutation flush TwoSums into the (y2h, y2l) accumulator pair."""
    K = LANES // phi

    def _kernel(wid_ref, gbase_ref, x3h_ref, x3l_ref, i1t_ref, i2_ref,
                inv_ref, vh_ref, vl_ref, y2h_ref, y2l_ref, ph_ref, pl_ref):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            y2h_ref[:] = jnp.zeros_like(y2h_ref)
            y2l_ref[:] = jnp.zeros_like(y2l_ref)

        SPLIT = jnp.float32(4097.0)
        wth = x3h_ref[0].T
        wtl = x3l_ref[0].T
        for j in range(SUBBLOCKS):
            sl = slice(j * LANES, (j + 1) * LANES)
            i1 = i1t_ref[0][:, sl].astype(jnp.int32)
            i2 = i2_ref[0][sl, :].astype(jnp.int32)
            xh = jnp.take_along_axis(
                jnp.take_along_axis(wth, i1, axis=1).T, i2, axis=1)
            xl = jnp.take_along_axis(
                jnp.take_along_axis(wtl, i1, axis=1).T, i2, axis=1)
            vh = vh_ref[0][sl, :]
            vl = vl_ref[0][sl, :]
            p = xh * vh
            cx = xh * SPLIT
            xh_hi = cx - (cx - xh)
            xh_lo = xh - xh_hi
            cv = vh * SPLIT
            vh_hi = cv - (cv - vh)
            vh_lo = vh - vh_hi
            err = ((xh_hi * vh_hi - p) + xh_hi * vh_lo + xh_lo * vh_hi) \
                + xh_lo * vh_lo
            ph_ref[sl, :] = p
            pl_ref[sl, :] = err + xh * vl + xl * vh
        for j in range(SUBBLOCKS):
            gb = gbase_ref[c * SUBBLOCKS + j]
            pjh = ph_ref[j * LANES:(j + 1) * LANES, :]
            pjl = pl_ref[j * LANES:(j + 1) * LANES, :]
            if phi == 1:
                srch, srcl = pjh, pjl
            else:
                fh = pjh[0:K, :]
                fl = pjl[0:K, :]
                for sg in range(1, phi):
                    b = pjh[sg * K:(sg + 1) * K, :]
                    s = fh + b
                    bb = s - fh
                    e = (fh - (s - bb)) + (b - bb)
                    fh = s
                    fl = fl + e + pjl[sg * K:(sg + 1) * K, :]
                srch = jnp.concatenate([fh] * phi, axis=0)
                srcl = jnp.concatenate([fl] * phi, axis=0)
            inv = inv_ref[0][:, j * LANES:(j + 1) * LANES].astype(jnp.int32)
            zh = jnp.take_along_axis(srch.T, inv, axis=1).T   # (d, l)
            zl = jnp.take_along_axis(srcl.T, inv, axis=1).T
            acc_h = y2h_ref[pl.ds(gb, LANES), :]
            s = acc_h + zh
            bb = s - acc_h
            e = (acc_h - (s - bb)) + (zh - bb)
            y2h_ref[pl.ds(gb, LANES), :] = s
            y2l_ref[pl.ds(gb, LANES), :] += e + zl

    return _kernel


@functools.partial(jax.jit, static_argnames=("g_real", "phi", "interpret"))
def thin_spmv_df64(xh: jax.Array, xl: jax.Array, idx1t, idx2, invt,
                   vals_hi, vals_lo, gbase, wid, g_real: int, phi: int,
                   interpret: bool = False):
    """(y_hi, y_lo) = A_thin @ (xh + xl) in double-f32 on thin tiles."""
    C = idx2.shape[0]
    n_pad = xh.shape[0]
    n_win = -(-n_pad // WINDOW)
    if n_win * WINDOW != n_pad:
        pad = n_win * WINDOW - n_pad
        xh = jnp.pad(xh, (0, pad))
        xl = jnp.pad(xl, (0, pad))
    x3h = xh.reshape(n_win, LANES, LANES)
    x3l = xl.reshape(n_win, LANES, LANES)
    g_alloc = -(-max(g_real, LANES) // LANES) * LANES

    win_spec = pl.BlockSpec((1, LANES, LANES),
                            lambda c, wid, gb: (wid[c], 0, 0),
                            memory_space=pltpu.VMEM)
    tile_spec_t = pl.BlockSpec((1, LANES, CHUNK_SUB),
                               lambda c, wid, gb: (c, 0, 0),
                               memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec((1, CHUNK_SUB, LANES),
                             lambda c, wid, gb: (c, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((g_alloc, LANES), lambda c, wid, gb: (0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(C,),
        in_specs=[win_spec, win_spec, tile_spec_t, tile_spec, tile_spec_t,
                  tile_spec, tile_spec],
        out_specs=(out_spec, out_spec),
        scratch_shapes=[pltpu.VMEM((CHUNK_SUB, LANES), jnp.float32),
                        pltpu.VMEM((CHUNK_SUB, LANES), jnp.float32)],
    )
    with jax.enable_x64(False):
        y2h, y2l = pl.pallas_call(
            _make_thin_kernel_df64(phi),
            grid_spec=grid_spec,
            interpret=interpret,
            out_shape=(jax.ShapeDtypeStruct((g_alloc, LANES), jnp.float32),
                       jax.ShapeDtypeStruct((g_alloc, LANES), jnp.float32)),
        )(wid, gbase, x3h, x3l, idx1t, idx2, invt, vals_hi, vals_lo)
    return y2h[:g_real].reshape(-1), y2l[:g_real].reshape(-1)


def pack_tiles_np(tiles: dict, dtype) -> dict:
    """Host-side packing stage of pack_tiles: cast scheduler output to
    the device tile dtypes (int8 indices, f32/df64 values) WITHOUT
    uploading.  The mesh-sharded giant path packs per window-group and
    uploads shard-wise (ops/sparse.attach_lane)."""
    gbase = tiles["gbase"].astype(np.int64)           # (C, SUBBLOCKS)
    G = tiles["G"]
    g_alloc = -(-max(G, LANES) // LANES) * LANES
    if gbase.size and (gbase.min() < 0
                       or gbase.max() + LANES > g_alloc):
        raise AssertionError("lane scheduler emitted an out-of-range gbase")
    out = {
        "idx1t": np.ascontiguousarray(
            tiles["idx1t"].astype(np.int8, copy=False)),
        "idx2": np.ascontiguousarray(
            tiles["idx2"].astype(np.int8, copy=False)),
        "gbase": np.ascontiguousarray(
            gbase.reshape(-1).astype(np.int32)),
        "wid": np.asarray(tiles["wid"]),
        "G": G,
    }
    if np.dtype(dtype) == np.float64:
        v64 = tiles["vals"].astype(np.float64)
        vh = v64.astype(np.float32)
        out["vals"] = vh
        out["vals_lo"] = (v64 - vh).astype(np.float32)
    else:
        out["vals"] = tiles["vals"].astype(np.dtype(dtype))
        out["vals_lo"] = None
    if tiles.get("invt") is not None:  # thin (packed) tiles
        out["invt"] = np.asarray(tiles["invt"])
        out["phi"] = tiles["phi"]
    return out


def pack_tiles(tiles: dict, n_pad: int, dtype) -> dict:
    """Upload scheduler output as device tiles for lane_spmv.

    f64 problems get DOUBLE-F32 value tiles (hi = f32 rounding, lo = the
    f32 residual) consumed by lane_spmv_df64 — Mosaic has no f64, and the
    compensated kernel keeps ~2^-48 relative accuracy."""

    # HBM guard: the ALIGNED layout pays the (window, 128-group-range)
    # max depth for every group, so a giant matrix whose nnz spread
    # THINLY over many windows x granges (e.g. 100M uniform-random
    # entries -> ~11x slot padding, ~6.6 GB of tiles per matrix) can
    # exceed HBM — and a mid-transfer device OOM can take the whole TPU
    # worker down on some platforms.  Fail here with a clear message
    # instead; the autotuner falls back to another backend.  Structured
    # matrices (the realistic giant case) have dense cells and low
    # padding.  Override with HPRLP_LANE_TILE_BUDGET_GB.
    import os

    budget_gb = float(os.environ.get("HPRLP_LANE_TILE_BUDGET_GB", "5.5"))
    est = estimate_tile_bytes(tiles, dtype)
    if est > budget_gb * 1e9:
        raise MemoryError(
            f"lane tiles would need ~{est / 1e9:.1f} GB "
            f"(> {budget_gb:.1f} GB budget): the matrix's nnz spread too "
            f"thinly over the (window, group-range) grid for the aligned "
            f"layout ({tiles['vals'].size / 1e6:.0f}M slots). Shard over "
            f"more chips, or raise HPRLP_LANE_TILE_BUDGET_GB.")

    host = pack_tiles_np(tiles, dtype)
    out = {k: (jnp.asarray(v)
               if isinstance(v, np.ndarray) else v)
           for k, v in host.items()}
    return out


def estimate_tile_bytes(tiles: dict, dtype) -> int:
    """Device bytes a tile set will occupy once packed (HBM budgeting)."""
    per_slot = 6 if np.dtype(dtype) != np.float64 else 10
    if tiles.get("invt") is not None:
        per_slot += 1
    return tiles["vals"].size * per_slot
