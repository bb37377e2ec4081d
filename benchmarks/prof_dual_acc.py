"""Measure: single y2 accumulator (production) vs dual accumulators
(even/odd sub-blocks flush to separate VMEM buffers, summed by XLA after
the kernel).  Dynamic-base RMWs to ONE ref serialise; two refs give
Mosaic two independent chains."""

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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import make_problem
from hprlp_tpu.ops.device_problem import build_device_problem
from hprlp_tpu.ops.lane_ell import CHUNK_SUB, LANES, SUBBLOCKS, WINDOW
from hprlp_tpu.ops.sparse import with_backend
from hprlp_tpu.solver.scaling import scale_problem


def make_kernel(n_acc):
    def kern(wid_ref, gbase_ref, x3_ref, i1t_ref, i2_ref, v_ref, *refs):
        y2_refs = refs[:n_acc]
        p_ref = refs[n_acc]
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            for r in y2_refs:
                r[:] = jnp.zeros_like(r)

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
            y2_refs[j % n_acc][pl.ds(gb, LANES), :] += \
                p_ref[j * LANES:(j + 1) * LANES, :]

    return kern


@functools.partial(jax.jit, static_argnames=("g_real", "n_acc", "K"))
def spmv_loop(x_pad, idx1t, idx2, vals, gbase, wid, g_real, n_acc, K):
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
            pl.BlockSpec((1, LANES, LANES), lambda c, w, g: (w[c], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES, CHUNK_SUB), lambda c, w, g: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK_SUB, LANES), lambda c, w, g: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK_SUB, LANES), lambda c, w, g: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((g_alloc, LANES), lambda c, w, g: (0, 0),
                         memory_space=pltpu.VMEM) for _ in range(n_acc)),
        scratch_shapes=[pltpu.VMEM((CHUNK_SUB, LANES), x_pad.dtype)],
    )
    call = pl.pallas_call(
        make_kernel(n_acc), grid_spec=grid_spec,
        out_shape=tuple(jax.ShapeDtypeStruct((g_alloc, LANES), x_pad.dtype)
                        for _ in range(n_acc)))

    def body(x, _):
        outs = call(wid, gbase, x3 * (1.0 + x[0] * 1e-30), idx1t, idx2,
                    vals)
        y2 = outs[0]
        for o in outs[1:]:
            y2 = y2 + o
        return x * (1.0 + y2[0, 0] * 1e-30), ()

    x, _ = jax.lax.scan(body, x_pad, None, length=K)
    return x


def main():
    problem = make_problem()
    lp_raw, _ = build_device_problem(problem)
    lp, _ = scale_problem(lp_raw)
    A = with_backend(lp.A, "lane")
    x = jnp.ones(A.ncols, jnp.float32)
    args = (x, A.lane_idx1t, A.lane_idx2, A.lane_vals, A.lane_gbase,
            A.lane_wid, A.nrows // 128)

    for n_acc in (1, 2, 4):
        def run(K):
            return float(spmv_loop(*args, n_acc, K)[0])

        run(50)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run(50)
            t50 = time.perf_counter() - t0
            t0 = time.perf_counter()
            run(150)
            t150 = time.perf_counter() - t0
            best = min(best, t150 - t50)
        print(f"n_acc={n_acc}: {best / 100 * 1e6:8.1f} us/SpMV",
              flush=True)


if __name__ == "__main__":
    main()
