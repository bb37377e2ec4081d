"""Pallas TPU kernel for windowed LaneELL SpMV (format + scheduling in
ops/lane_ell.py).

Per 128-sublane chunk (one x-window each, scalar-prefetched so only the
windows a chunk needs are DMA'd):

    WT  = transpose(x3[wid[c]])            (128, 128) residue-major window
    g0T = lane-gather(WT, idx1T[c])        row-in-window per residue
    g1  = lane-gather(transpose(g0T), idx2[c])   route to output row lane
    p   = g1 * vals[c]
    serial segment-flush of p's sublane rows into the VMEM-resident
    accumulator y2 (sublanes arrive sorted by output group, so one
    read-modify-write per group run).

Every data-movement op is a full-width vector op; the only serial part is
the per-sublane flush loop (128 iterations/chunk).

Role parity: the reference's fused warp-bucketed SpMV kernels (reference:
src/cuda_kernels/HPR_cuda_kernels.cu:297-427) — redesigned around the TPU
vector unit's lane crossbar rather than warp shuffles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
WINDOW = LANES * LANES


def _lane_kernel(wid_ref, gid_ref, x3_ref, i1t_ref, i2_ref, v_ref, y2_ref):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        y2_ref[:] = jnp.zeros_like(y2_ref)

    wt = x3_ref[0].T                                   # (128 l0, 128 r)
    g0t = jnp.take_along_axis(wt, i1t_ref[0], axis=1)  # (l0, s)
    g1 = jnp.take_along_axis(g0t.T, i2_ref[0], axis=1)  # (s, l)
    p = g1 * v_ref[0]

    # Serial segment flush: sublanes are sorted by group id.  gid is a
    # scalar-prefetch array (C*128,), flat index c*128 + s.
    base = c * LANES

    def body(s, carry):
        acc, cur = carry
        g = gid_ref[base + s]
        row = jax.lax.dynamic_slice_in_dim(p, s, 1, axis=0)
        same = g == cur

        @pl.when(jnp.logical_not(same))
        def _():
            y2_ref[pl.ds(cur, 1), :] += acc

        acc = jnp.where(same, acc + row, row)
        return acc, g

    first = jax.lax.dynamic_slice_in_dim(p, 0, 1, axis=0)
    acc, cur = jax.lax.fori_loop(
        1, LANES, body, (first, gid_ref[base]))
    y2_ref[pl.ds(cur, 1), :] += acc


@functools.partial(jax.jit, static_argnames=("g_real", "interpret"))
def lane_spmv(x_pad: jax.Array, idx1t: jax.Array, idx2: jax.Array,
              vals: jax.Array, gid: jax.Array, wid: jax.Array,
              g_real: int, interpret: bool = False) -> jax.Array:
    """y = A @ x using windowed LaneELL tiles.

    x_pad: (n_pad,); idx1t/idx2/vals: (C, 128, 128); gid: (C, 128);
    wid: (C,) int32.  g_real: m_pad // 128.  Returns y: (m_pad,).
    """
    C = idx2.shape[0]
    n_pad = x_pad.shape[0]
    n_win = -(-n_pad // WINDOW)
    if n_win * WINDOW != n_pad:
        x_pad = jnp.pad(x_pad, (0, n_win * WINDOW - n_pad))
    x3 = x_pad.reshape(n_win, LANES, LANES)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, LANES, LANES),
                         lambda c, wid, gid: (wid[c], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES, LANES), lambda c, wid, gid: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES, LANES), lambda c, wid, gid: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES, LANES), lambda c, wid, gid: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g_real, LANES), lambda c, wid, gid: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    y2 = pl.pallas_call(
        _lane_kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((g_real, LANES), x_pad.dtype),
    )(wid, gid.reshape(-1), x3, idx1t, idx2, vals)
    return y2.reshape(-1)


def pack_tiles(tiles: dict, n_pad: int, dtype) -> dict:
    """Upload scheduler output as device tiles for lane_spmv."""
    import numpy as np

    return {
        "idx1t": jnp.asarray(tiles["idx1t"]),
        "idx2": jnp.asarray(tiles["idx2"]),
        "vals": jnp.asarray(tiles["vals"].astype(np.dtype(dtype))),
        "gid": jnp.asarray(tiles["gid"]),
        "wid": jnp.asarray(tiles["wid"]),
        "G": tiles["G"],
    }
