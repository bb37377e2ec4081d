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
    y2 = pl.pallas_call(
        _lane_kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((g_alloc, LANES), x_pad.dtype),
    )(wid, gbase, x3, idx1t, idx2, vals)
    return y2[:g_real].reshape(-1)


def pack_tiles(tiles: dict, n_pad: int, dtype) -> dict:
    """Upload scheduler output as device tiles for lane_spmv."""
    gbase = tiles["gbase"].astype(np.int64)           # (C, SUBBLOCKS)
    G = tiles["G"]
    g_alloc = -(-max(G, LANES) // LANES) * LANES
    if gbase.size and (gbase.min() < 0
                       or gbase.max() + LANES > g_alloc):
        raise AssertionError("lane scheduler emitted an out-of-range gbase")

    return {
        "idx1t": jnp.asarray(tiles["idx1t"].astype(np.int8)),
        "idx2": jnp.asarray(tiles["idx2"].astype(np.int8)),
        "vals": jnp.asarray(tiles["vals"].astype(np.dtype(dtype))),
        "gbase": jnp.asarray(gbase.reshape(-1).astype(np.int32)),
        "wid": jnp.asarray(tiles["wid"]),
        "G": G,
    }
