"""Pallas TPU kernel for windowed LaneELL SpMV (format + scheduling in
ops/lane_ell.py).

Per grid step ("super-chunk" of CHUNK_SUB = 512 slot sublanes, one
x-window each, scalar-prefetched so only the windows a chunk needs are
DMA'd):

    WT  = transpose(x3[wid[c]])            (128, 128) residue-major window
    g0T = lane-gather(WT, idx1T[c])        row-in-window per residue
    g1  = lane-gather(transpose(g0T), idx2[c])   route to output row lane
    p   = g1 * vals[c]
    per 128-sublane sub-block j: one MXU segment-sum
        local = R @ p_j   with  R[d, s] = [rank[s] == d],
        rank[s] = gid[s] - gbase[c, j]  (precomputed, < 128 by the
        scheduler's group-span bound), then a single
        y2[gbase : gbase+128, :] += local  VMEM read-modify-write.

Every data-movement op is a full-width vector op and the flush is one
matmul + one 128-row add per sub-block — nothing is serial per group.

Role parity: the reference's fused warp-bucketed SpMV kernels (reference:
src/cuda_kernels/HPR_cuda_kernels.cu:297-427) — redesigned around the TPU
vector unit's lane crossbar + MXU segment sums rather than warp shuffles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lane_ell import CHUNK_SUB, LANES, SUBBLOCKS, WINDOW

# y2 is flushed in 128-group windows, so its VMEM accumulator must hold at
# least 128 groups; smaller outputs are padded up and sliced at the end.
MIN_GROUPS = LANES


def _lane_kernel(wid_ref, gbase_ref, x3_ref, i1t_ref, i2_ref, v_ref,
                 rank_ref, y2_ref, p_ref):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        y2_ref[:] = jnp.zeros_like(y2_ref)

    # The lane crossbar is 128 wide, so gathers run per 128-sublane
    # sub-block; the super-chunk still amortises grid-step and DMA
    # overheads 4x.  Index tiles stream as int8 (all values < 128) and
    # widen in VMEM (less HBM traffic).
    wt = x3_ref[0].T                                       # (128, 128)
    for j in range(SUBBLOCKS):
        sl = slice(j * LANES, (j + 1) * LANES)
        g0t = jnp.take_along_axis(wt, i1t_ref[0][:, sl].astype(jnp.int32),
                                  axis=1)
        g1 = jnp.take_along_axis(g0t.T, i2_ref[0][sl, :].astype(jnp.int32),
                                 axis=1)
        p_ref[sl, :] = g1 * v_ref[0][sl, :]

    d_iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    for j in range(SUBBLOCKS):
        # Segment sum on the MXU: R[d, s] = (rank[s] == d); rank is the
        # group offset from this sub-block's gbase, < 128 by construction.
        rank = rank_ref[0, 0:1, j * LANES:(j + 1) * LANES]  # (1, 128)
        R = (d_iota == rank).astype(p_ref.dtype)
        local = jnp.dot(R, p_ref[j * LANES:(j + 1) * LANES, :],
                        preferred_element_type=p_ref.dtype,
                        precision=jax.lax.Precision.HIGHEST)
        gb = gbase_ref[c * SUBBLOCKS + j]
        y2_ref[pl.ds(gb, LANES), :] += local


@functools.partial(jax.jit, static_argnames=("g_real", "interpret"))
def lane_spmv(x_pad: jax.Array, idx1t: jax.Array, idx2: jax.Array,
              vals: jax.Array, rank: jax.Array, gbase: jax.Array,
              wid: jax.Array, g_real: int,
              interpret: bool = False) -> jax.Array:
    """y = A @ x using windowed LaneELL tiles.

    x_pad: (n_pad,); idx1t: (C, 128, CHUNK_SUB); idx2/vals:
    (C, CHUNK_SUB, 128); rank: (C, 8, CHUNK_SUB) int32 (row 0 = group
    offset from the sub-block's gbase per sublane); gbase:
    (C*SUBBLOCKS,) int32 clamped so gbase+128 <= g_alloc; wid: (C,) int32.
    g_real: m_pad // 128.  Returns y: (g_real * 128,).
    """
    C = idx2.shape[0]
    n_pad = x_pad.shape[0]
    n_win = -(-n_pad // WINDOW)
    if n_win * WINDOW != n_pad:
        x_pad = jnp.pad(x_pad, (0, n_win * WINDOW - n_pad))
    x3 = x_pad.reshape(n_win, LANES, LANES)
    g_alloc = max(g_real, MIN_GROUPS)

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
            pl.BlockSpec((1, 8, CHUNK_SUB),
                         lambda c, wid, gb: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g_alloc, LANES),
                               lambda c, wid, gb: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((CHUNK_SUB, LANES), x_pad.dtype)],
    )
    y2 = pl.pallas_call(
        _lane_kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((g_alloc, LANES), x_pad.dtype),
    )(wid, gbase, x3, idx1t, idx2, vals, rank)
    return y2[:g_real].reshape(-1)


def pack_tiles(tiles: dict, n_pad: int, dtype) -> dict:
    """Upload scheduler output as device tiles for lane_spmv: rank is the
    per-sublane group offset from its sub-block's gbase; gbase is clamped
    so every 128-group flush window fits inside the y2 allocation."""
    gid = tiles["gid"].reshape(-1, SUBBLOCKS, LANES)  # (C, j, s)
    C = gid.shape[0]
    G = tiles["G"]
    g_alloc = max(G, MIN_GROUPS)

    gbase = tiles["gbase"].astype(np.int64)           # (C, SUBBLOCKS)
    gb_clamped = np.minimum(gbase, g_alloc - MIN_GROUPS)
    rank = gid - gb_clamped[:, :, None]               # (C, j, s) in [0,128)
    if rank.size and (rank.min() < 0 or rank.max() >= LANES):
        raise AssertionError("lane scheduler violated the group-span bound")

    rank_tile = np.zeros((C, 8, CHUNK_SUB), np.int32)
    rank_tile[:, 0, :] = rank.reshape(C, CHUNK_SUB)

    return {
        "idx1t": jnp.asarray(tiles["idx1t"].astype(np.int8)),
        "idx2": jnp.asarray(tiles["idx2"].astype(np.int8)),
        "vals": jnp.asarray(tiles["vals"].astype(np.dtype(dtype))),
        "rank": jnp.asarray(rank_tile),
        "gbase": jnp.asarray(gb_clamped.reshape(-1).astype(np.int32)),
        "wid": jnp.asarray(tiles["wid"]),
        "G": G,
    }
