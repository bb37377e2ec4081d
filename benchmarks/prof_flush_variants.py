"""Measure flush strategies for the aligned LaneELL kernel.

PROFILE_r04_fusion.md located the roofline gap in-kernel: the 8
dynamic-offset `y2[ds(gb)] +=` flushes per chunk cost ~+20 us/SpMV (AT)
over the no-flush ablation.  Consecutive sub-blocks of one (window,
grange) cell share the SAME gbase (depth runs), so their flushes form a
read-modify-write chain on one 128-row region — candidate fix: merge
equal-gbase runs into static VMEM adds and flush once per run.

Variants:
  full       — production flush (8 dynamic accumulates)
  merge_all  — tree-sum all 8 sub-blocks + ONE dynamic flush (numerically
               wrong on mixed chunks; the ceiling for run merging)
  runmerge   — exact: carry f across equal-gbase sub-blocks (scalar
               compare from the prefetched gbase tile), pl.when-flush at
               run boundaries; flush count = distinct gbases per chunk

Usage: python benchmarks/prof_flush_variants.py
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

        wt = x3_ref[0].T
        for j in range(SUBBLOCKS):
            sl = slice(j * LANES, (j + 1) * LANES)
            g0t = jnp.take_along_axis(
                wt, i1t_ref[0][:, sl].astype(jnp.int32), axis=1)
            g1 = jnp.take_along_axis(
                g0t.T, i2_ref[0][sl, :].astype(jnp.int32), axis=1)
            p_ref[sl, :] = g1 * v_ref[0][sl, :]

        if variant == "full":
            for j in range(SUBBLOCKS):
                gb = gbase_ref[c * SUBBLOCKS + j]
                y2_ref[pl.ds(gb, LANES), :] += \
                    p_ref[j * LANES:(j + 1) * LANES, :]
        elif variant == "merge_all":
            f = p_ref[0:LANES, :]
            for j in range(1, SUBBLOCKS):
                f = f + p_ref[j * LANES:(j + 1) * LANES, :]
            gb = gbase_ref[c * SUBBLOCKS]
            y2_ref[pl.ds(gb, LANES), :] += f
        elif variant == "runmerge":
            f = p_ref[0:LANES, :]
            gb_prev = gbase_ref[c * SUBBLOCKS]
            for j in range(1, SUBBLOCKS):
                gb = gbase_ref[c * SUBBLOCKS + j]
                same = gb == gb_prev

                @pl.when(jnp.logical_not(same))
                def _(f=f, gb_prev=gb_prev):
                    y2_ref[pl.ds(gb_prev, LANES), :] += f

                f = f * same.astype(f.dtype) \
                    + p_ref[j * LANES:(j + 1) * LANES, :]
                gb_prev = gb
            y2_ref[pl.ds(gb_prev, LANES), :] += f
        else:
            raise ValueError(variant)

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
        gb = np.asarray(A.lane_gbase).reshape(C, SUBBLOCKS)
        runs = 1 + (np.diff(gb, axis=1) != 0).sum(axis=1)
        tile_mb = (A.lane_idx1t.size + A.lane_idx2.size
                   + A.lane_vals.size * 4) / 1e6
        x = jnp.ones(A.ncols, jnp.float32)
        args = (x, A.lane_idx1t, A.lane_idx2, A.lane_vals, A.lane_gbase,
                A.lane_wid, A.nrows // 128)
        print(f"--- {name}: C={C} chunks, tiles {tile_mb:.1f} MB, "
              f"distinct-gbase runs/chunk mean={runs.mean():.2f} "
              f"max={runs.max()}", flush=True)

        # Correctness check (runmerge must equal full exactly).
        y_full = spmv_loop(*args, "full", 1)
        y_rm = spmv_loop(*args, "runmerge", 1)
        ok = bool(jnp.array_equal(y_full, y_rm))
        print(f"runmerge exactness vs full: {ok}", flush=True)

        for variant in ("full", "merge_all", "runmerge"):
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
