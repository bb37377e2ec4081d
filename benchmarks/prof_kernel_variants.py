"""Bisect the lane-SpMV kernel cost on the TPU by timing ablated variants.

Variants (some intentionally WRONG numerically — timing only):
  full      — production kernel
  mm_high   — segment-sum matmul at Precision.HIGH (bf16x3) instead of HIGHEST
  mm_def    — Precision.DEFAULT (single-pass bf16; lossy)
  static_fl — matmul kept, flush to a STATIC y2 row window (tests dynamic ds)
  no_mm     — flush p directly (no segment-sum matmul)
  no_gather — skip both crossbar gathers (p = wt-slice * vals)
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
from hprlp_tpu.ops.device_problem import build_device_problem
from hprlp_tpu.ops.lane_ell import CHUNK_SUB, LANES, SUBBLOCKS, WINDOW
from hprlp_tpu.ops.sparse import with_backend
from hprlp_tpu.solver.scaling import scale_problem


def make_kernel(variant):
    def kern(wid_ref, gbase_ref, x3_ref, i1t_ref, i2_ref, v_ref, rank_ref,
             Rt_ref, y2_ref, p_ref):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            y2_ref[:] = jnp.zeros_like(y2_ref)

        wt = x3_ref[0].T
        for j in range(SUBBLOCKS):
            sl = slice(j * LANES, (j + 1) * LANES)
            if variant == "no_gather":
                p_ref[sl, :] = wt * v_ref[0][sl, :]
            else:
                g0t = jnp.take_along_axis(
                    wt, i1t_ref[0][:, sl].astype(jnp.int32), axis=1)
                g1 = jnp.take_along_axis(
                    g0t.T, i2_ref[0][sl, :].astype(jnp.int32), axis=1)
                p_ref[sl, :] = g1 * v_ref[0][sl, :]

        if variant == "mm_fused":
            # One (128, 512) @ (512, 128) segment-sum for the whole chunk
            # (rank vs the chunk's first gbase; numerically wrong when
            # sub-blocks differ in gbase -- timing only).
            d_iota5 = jax.lax.broadcasted_iota(jnp.int32,
                                               (LANES, CHUNK_SUB), 0)
            rank_all = rank_ref[0, 0:1, :]
            R = (d_iota5 == rank_all).astype(p_ref.dtype)
            local = jnp.dot(R, p_ref[:, :],
                            preferred_element_type=p_ref.dtype,
                            precision=jax.lax.Precision.HIGHEST)
            gb = gbase_ref[c * SUBBLOCKS]
            y2_ref[pl.ds(gb, LANES), :] += local
            return

        d_iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
        prec = {"mm_def": jax.lax.Precision.DEFAULT}.get(
            variant, jax.lax.Precision.HIGHEST)
        for j in range(SUBBLOCKS):
            pj = p_ref[j * LANES:(j + 1) * LANES, :]
            gb = gbase_ref[c * SUBBLOCKS + j]
            if variant == "no_mm":
                y2_ref[pl.ds(gb, LANES), :] += pj
                continue
            rank = rank_ref[0, 0:1, j * LANES:(j + 1) * LANES]
            if variant == "mm_hi1":
                # single lossy bf16 pass (timing floor for 1-pass MXU)
                Rb = (d_iota == rank).astype(jnp.bfloat16)
                local = jnp.dot(Rb, pj.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
            elif variant == "mm_precomp":
                # R shipped from host as bf16 tiles (no in-kernel build)
                Rb = Rt_ref[0, :, j * LANES:(j + 1) * LANES]
                hi = pj.astype(jnp.bfloat16)
                lo = (pj - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                local = (jnp.dot(Rb, hi, preferred_element_type=jnp.float32)
                         + jnp.dot(Rb, lo,
                                   preferred_element_type=jnp.float32))
            elif variant == "mm_split":
                # One-hot R is exact in bf16; split p into two bf16 terms
                # (hi + lo ~ p to f32 precision) and run two native-rate
                # bf16 MXU passes with f32 accumulation.
                Rb = (d_iota == rank).astype(jnp.bfloat16)
                hi = pj.astype(jnp.bfloat16)
                lo = (pj - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                local = (jnp.dot(Rb, hi, preferred_element_type=jnp.float32)
                         + jnp.dot(Rb, lo,
                                   preferred_element_type=jnp.float32))
            else:
                R = (d_iota == rank).astype(p_ref.dtype)
                local = jnp.dot(R, pj, preferred_element_type=p_ref.dtype,
                                precision=prec)
            if variant == "static_fl":
                y2_ref[0:LANES, :] += local
            else:
                y2_ref[pl.ds(gb, LANES), :] += local

    return kern


@functools.partial(jax.jit, static_argnames=("g_real", "variant", "K"))
def spmv_loop(x_pad, idx1t, idx2, vals, rank, gbase, wid, Rtiles, g_real,
              variant, K):
    C = idx2.shape[0]
    n_pad = x_pad.shape[0]
    n_win = -(-n_pad // WINDOW)
    if n_win * WINDOW != n_pad:
        x_pad = jnp.pad(x_pad, (0, n_win * WINDOW - n_pad))
    x3 = x_pad.reshape(n_win, LANES, LANES)
    g_alloc = max(g_real, LANES)

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
            pl.BlockSpec((1, 8, CHUNK_SUB), lambda c, w, g: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES, CHUNK_SUB), lambda c, w, g: (c, 0, 0),
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
        y2 = call(wid, gbase, x3 * (1.0 + x[0] * 1e-30), idx1t, idx2, vals,
                  rank, Rtiles)
        return x * (1.0 + y2[0, 0] * 1e-30), ()

    x, _ = jax.lax.scan(body, x_pad, None, length=K)
    return x


def main():
    problem = make_problem()
    lp_raw, _ = build_device_problem(problem)
    lp, _ = scale_problem(lp_raw)
    import dataclasses
    A = with_backend(lp.A, "lane")
    x = jnp.ones(A.ncols, jnp.float32)
    rank_np = np.asarray(A.lane_rank)[:, 0, :]           # (C, 512)
    C = rank_np.shape[0]
    Rtiles_np = (rank_np[:, None, :] ==
                 np.arange(LANES)[None, :, None]).astype(np.float32)
    Rtiles = jnp.asarray(Rtiles_np.astype(jnp.bfloat16))  # (C, 128, 512)
    args = (x, A.lane_idx1t, A.lane_idx2, A.lane_vals, A.lane_rank,
            A.lane_gbase, A.lane_wid, Rtiles, A.nrows // 128)

    for variant in ("mm_fused", "mm_hi1", "mm_precomp", "full"):
        def run(K):
            out = spmv_loop(*args, variant, K)
            return float(out[0])

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
        print(f"{variant:10s}: {best / 100 * 1e6:8.1f} us/SpMV", flush=True)


if __name__ == "__main__":
    main()
