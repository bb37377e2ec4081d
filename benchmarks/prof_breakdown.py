"""Measure the per-iteration time breakdown of the hot loop on the TPU:
lane-SpMV pair vs elementwise/overhead remainder, plus tile statistics.

Timing protocol per the axon-relay rules: loop inside one jit with a data
dependency, force a host fetch, and difference two loop lengths to cancel
the constant dispatch cost.
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

from bench import make_problem
from hprlp_tpu.ops.device_problem import build_device_problem
from hprlp_tpu.ops.sparse import spmv, with_backend
from hprlp_tpu.solver.chunk import init_state, run_chunk
from hprlp_tpu.solver.scaling import scale_problem


def timed(fn, *args):
    out = fn(*args)
    float(jnp.ravel(out)[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.ravel(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best


@functools.partial(jax.jit, static_argnames=("K",))
def pair_loop(lp, x0, K: int):
    def body(x, _):
        y = spmv(lp.A, x)
        x2 = spmv(lp.AT, y)
        return x2, ()

    x, _ = jax.lax.scan(body, x0, None, length=K)
    return x


@functools.partial(jax.jit, static_argnames=("K", "which"))
def single_loop(lp, x0, K: int, which: str):
    A = lp.A if which == "A" else lp.AT
    n_in = A.ncols

    def body(x, _):
        y = spmv(A, x)
        # Cheap data dependency back to the input space.
        return x * (1.0 + y[0] * 1e-30), ()

    x, _ = jax.lax.scan(body, x0, None, length=K)
    return x


def main():
    problem = make_problem()
    lp_raw, _ = build_device_problem(problem)
    lp, scal = scale_problem(lp_raw)
    import dataclasses
    lp = dataclasses.replace(lp, A=with_backend(lp.A, "lane"),
                             AT=with_backend(lp.AT, "lane"))

    for name, M in (("A", lp.A), ("AT", lp.AT)):
        C = M.lane_idx2.shape[0]
        slots = C * M.lane_idx2.shape[1]
        bytes_tiles = (M.lane_idx1t.size + M.lane_idx2.size
                       + M.lane_vals.size * 4)
        print(f"{name}: nnz={M.nnz} chunks={C} slot_sublanes={slots} "
              f"slot_overhead={slots * 128 / max(M.nnz, 1):.2f}x "
              f"tile_bytes={bytes_tiles / 1e6:.1f}MB "
              f"",
              flush=True)

    xA = jnp.ones(lp.A.ncols, lp.c.dtype)

    # 1000-iteration differencing: the axon relay adds ~27 ms of noisy
    # per-dispatch latency, so short loops (50/150) are swamped by it.
    tp50 = timed(pair_loop, lp, xA, 500)
    tp150 = timed(pair_loop, lp, xA, 1500)
    pair_us = (tp150 - tp50) / 1000 * 1e6
    print(f"SpMV pair (A then AT): {pair_us:.1f} us/iter "
          f"(t500={tp50 * 1e3:.1f}ms t1500={tp150 * 1e3:.1f}ms)", flush=True)

    tA50 = timed(single_loop, lp, xA, 500, "A")
    tA150 = timed(single_loop, lp, xA, 1500, "A")
    print(f"SpMV A alone:  {(tA150 - tA50) / 1000 * 1e6:.1f} us", flush=True)
    xAT = jnp.ones(lp.AT.ncols, lp.c.dtype)
    tT50 = timed(single_loop, lp, xAT, 500, "AT")
    tT150 = timed(single_loop, lp, xAT, 1500, "AT")
    print(f"SpMV AT alone: {(tT150 - tT50) / 1000 * 1e6:.1f} us", flush=True)

    # Full production chunk at two lengths.
    state = init_state(lp)
    sigma = jnp.asarray(1.0, lp.c.dtype)
    lam = jnp.asarray(4.0, lp.c.dtype)
    flag = jnp.asarray(False)

    def chunk_t(n):
        st, m = run_chunk(lp, scal, state, sigma, lam, flag,
                          jnp.asarray(n, jnp.int32))
        return m["nrm_Rp"]

    c50 = timed(chunk_t, 500)
    c150 = timed(chunk_t, 1500)
    it_us = (c150 - c50) / 1000 * 1e6
    print(f"chunk marginal: {it_us:.1f} us/iter  -> elementwise+overhead "
          f"remainder = {it_us - pair_us:.1f} us", flush=True)
    print(f"chunk(1500) total: {c150 * 1e3:.1f} ms -> "
          f"{1500 / c150:.0f} it/s incl dispatch", flush=True)


if __name__ == "__main__":
    main()
