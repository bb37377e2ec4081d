"""Ablate the CURRENT aligned LaneELL kernel to locate the roofline gap.

The hot loop measures ~126 us per SpMV pair on the 1.3M-nnz bench LP
(52 chunks total) vs a ~55 us HBM-bandwidth bound for the tile bytes —
the elementwise halves are already free (profiled round 4: one fori_loop
dispatch costs the same with and without them).  This script times
ablated kernel bodies to attribute the in-kernel cost:

  full      — production kernel (2 crossbar gathers + scratch + flush)
  one_gather— only the idx1t gather (g1 = g0t.T * vals)
  no_gather — no gathers (p = wt * vals): DMA + multiply + flush
  no_flush  — gathers kept, flush replaced by a static accumulate
  dma_only  — body reduces each input tile with one cheap op (DMA floor)

Timing cancels the fixed relay dispatch overhead by differencing K=50 vs
K=150 in-jit repetitions.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       os.path.expanduser("~/.cache/jax_tpu"))
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import functools

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import make_problem
from hprlp_tpu.ops.device_problem import build_device_problem_giant
from hprlp_tpu.ops.lane_ell import CHUNK_SUB, LANES, SUBBLOCKS, WINDOW


def make_kernel(variant):
    def kern(wid_ref, gbase_ref, x3_ref, i1t_ref, i2_ref, v_ref,
             y2_ref, p_ref):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            y2_ref[:] = jnp.zeros_like(y2_ref)

        if variant == "dma_only":
            # Touch each tile once with the cheapest full-width op.
            y2_ref[0:LANES, :] += (x3_ref[0]
                                   + v_ref[0][:LANES, :]
                                   + i1t_ref[0][:, :LANES].astype(
                                       jnp.float32)
                                   + i2_ref[0][:LANES, :].astype(
                                       jnp.float32))
            return

        wt = x3_ref[0].T
        for j in range(SUBBLOCKS):
            sl = slice(j * LANES, (j + 1) * LANES)
            if variant == "no_gather":
                p_ref[sl, :] = wt * v_ref[0][sl, :]
            elif variant == "one_gather":
                g0t = jnp.take_along_axis(
                    wt, i1t_ref[0][:, sl].astype(jnp.int32), axis=1)
                p_ref[sl, :] = g0t.T * v_ref[0][sl, :]
            else:
                g0t = jnp.take_along_axis(
                    wt, i1t_ref[0][:, sl].astype(jnp.int32), axis=1)
                g1 = jnp.take_along_axis(
                    g0t.T, i2_ref[0][sl, :].astype(jnp.int32), axis=1)
                p_ref[sl, :] = g1 * v_ref[0][sl, :]
        for j in range(SUBBLOCKS):
            if variant == "no_flush":
                y2_ref[0:LANES, :] += p_ref[j * LANES:(j + 1) * LANES, :]
            else:
                gb = gbase_ref[c * SUBBLOCKS + j]
                y2_ref[pl.ds(gb, LANES), :] += \
                    p_ref[j * LANES:(j + 1) * LANES, :]

    return kern


@functools.partial(jax.jit, static_argnames=("g_real", "variant", "K"))
def spmv_loop(x_pad, idx1t, idx2, vals, gbase, wid, g_real, variant, K):
    C = idx2.shape[0]
    n_pad = x_pad.shape[0]
    n_win = -(-n_pad // WINDOW)
    if n_win * WINDOW != n_pad:
        x_pad = jnp.pad(x_pad, (0, n_win * WINDOW - n_pad))
    g_alloc = -(-max(g_real, LANES) // LANES) * LANES

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, LANES, LANES), lambda c, w, g: (w[c], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES, CHUNK_SUB), lambda c, w, g: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK_SUB, LANES), lambda c, w, g: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK_SUB, LANES), lambda c, w, g: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g_alloc, LANES), lambda c, w, g: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((CHUNK_SUB, LANES), x_pad.dtype)],
    )
    call = pl.pallas_call(
        make_kernel(variant), grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g_alloc, LANES), x_pad.dtype))

    def body(x, _):
        x3 = (x * 1.0).reshape(n_win, LANES, LANES)
        y2 = call(wid, gbase, x3, idx1t, idx2, vals)
        return x * (1.0 + y2[0, 0] * 1e-30), ()

    x, _ = jax.lax.scan(body, x_pad, None, length=K)
    return x


def main():
    problem = make_problem()
    lp, maps, scal, _s = build_device_problem_giant(problem)
    jax.block_until_ready(lp.c)
    for name, A in (("A", lp.A), ("AT", lp.AT)):
        if A.lane_idx2 is None:
            continue
        C = A.lane_idx2.shape[0]
        tile_mb = (A.lane_idx1t.size + A.lane_idx2.size
                   + A.lane_vals.size * 4) / 1e6
        x = jnp.ones(A.ncols, jnp.float32)
        args = (x, A.lane_idx1t, A.lane_idx2, A.lane_vals, A.lane_gbase,
                A.lane_wid, A.nrows // 128)
        print(f"--- {name}: C={C} chunks, tiles {tile_mb:.1f} MB, "
              f"bw-bound {tile_mb / 819e3 * 1e6:.1f} us", flush=True)
        for variant in ("dma_only", "no_gather", "one_gather", "no_flush",
                        "full"):
            def run(K):
                out = spmv_loop(*args, variant, K)
                return float(out[0])

            run(200)
            run(1000)
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                run(200)
                t200 = time.perf_counter() - t0
                t0 = time.perf_counter()
                run(1000)
                t1000 = time.perf_counter() - t0
                best = min(best, t1000 - t200)
            print(f"{variant:10s}: {best / 800 * 1e6:8.1f} us/SpMV "
                  f"({best / 800 / C * 1e9:6.0f} ns/chunk)", flush=True)


if __name__ == "__main__":
    main()
