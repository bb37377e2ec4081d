"""Benchmark: steady-state HPR-LP iterations/second on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The workload is a fixed synthetic LP (seeded, ~20 nnz/row) in the
HBM-resident regime, solved through the production path: bucketed-ELL
layout -> scaling -> power method -> SpMV backend autotune (gather /
dense-MXU / windowed-LaneELL Pallas) -> the device-resident superchunk
(N_CHUNKS jitted 150-iteration chunks with on-device restart/sigma and
stopping per dispatch), i.e. exactly what a quiet solve() executes
(reference hot loop parity: src/HPRLP.cu:178-310; solver/loop.py:316).

Timing forces a host fetch per superchunk; the measured per-iteration
time therefore INCLUDES the host dispatch overhead amortised over
N_CHUNKS * check_iter iterations, like a real solve.  (On the
axon-tunnelled dev TPU that dispatch costs ~27 ms per call; on
directly-attached hardware it is microseconds.)

vs_baseline is measured against BASELINE_ITERS_PER_SEC, a provisional
estimate of the reference HPR-LP-C hot loop on an A100 for this size
(BASELINE.json publishes no numbers; SURVEY.md §6): two cuSPARSE SpMVs of
1.3M nnz plus vector work per iteration ~= 0.25 ms.
"""

import json
import time

import numpy as np
import scipy.sparse as sp

M, N, NNZ_PER_ROW, SEED = 65536, 131072, 20, 0
CHUNK_ITERS = 150
N_CHUNKS = 128  # chunks per superchunk dispatch (production quiet-solve
                # size; the device while_loop exits at the first converged
                # checkpoint, so a big dispatch never overshoots)
REPEATS = 3
BASELINE_ITERS_PER_SEC = 4000.0  # provisional A100 estimate for this size


def make_problem():
    from hprlp_tpu.problem import LpProblem

    rng = np.random.default_rng(SEED)
    rows = np.repeat(np.arange(M), NNZ_PER_ROW)
    cols = rng.integers(0, N, size=M * NNZ_PER_ROW)
    vals = rng.normal(size=M * NNZ_PER_ROW)
    A = sp.coo_matrix((vals, (rows, cols)), shape=(M, N)).tocsr()
    A.sum_duplicates()
    x_feas = rng.uniform(-1.0, 1.0, N)
    Ax = A @ x_feas
    return LpProblem.from_arrays(
        A, Ax - 1.0, Ax + 1.0, x_feas - 2.0, x_feas + 2.0,
        rng.normal(size=N))


def main():
    import os

    import jax

    # Persistent compile cache: first-time compiles through a remote-compile
    # TPU tunnel take minutes; cached runs are seconds.
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.expanduser("~/.cache/jax_tpu"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    import jax.numpy as jnp

    from hprlp_tpu.ops.device_problem import build_device_problem
    from hprlp_tpu.solver.autotune import autotune_backends
    from hprlp_tpu.solver.chunk import init_state, initial_metrics, run_chunk
    from hprlp_tpu.solver.device_loop import init_restart_dev, run_superchunk
    from hprlp_tpu.solver.power_iteration import power_method
    from hprlp_tpu.solver.scaling import scale_problem

    problem = make_problem()
    lp_raw, _ = build_device_problem(problem)
    lp, scal = scale_problem(lp_raw)
    lam = jnp.maximum(power_method(lp) * 1.01, 1e-12)
    state = init_state(lp)
    sigma = jnp.asarray(1.0, lp.c.dtype)
    n_iters = jnp.asarray(CHUNK_ITERS, jnp.int32)
    flag = jnp.asarray(False)

    probe_args = (scal, state, sigma, lam, flag, n_iters)
    lp = autotune_backends(run_chunk, lp, probe_args, verbose=False)

    # The production quiet-solve dispatch: one superchunk = N_CHUNKS
    # device-resident chunks with on-device restart/sigma/stopping
    # (solver/loop.py:316-330).  stop_tol=0 so the synthetic LP never
    # converges mid-dispatch and every superchunk runs all N_CHUNKS.
    dtype = lp.c.dtype
    rd = init_restart_dev(1.0, dtype)
    m_prev = initial_metrics(lp, scal, state)
    obj_c = jnp.asarray(0.0, dtype)

    def superchunk(state, rd, sigma, lam, m_prev, it):
        return run_superchunk(lp, scal, state, rd, sigma, lam, m_prev,
                              it, obj_c, 0.0, N_CHUNKS, CHUNK_ITERS)

    # Warm-up: compile + one superchunk.  A host fetch forces real
    # completion (block_until_ready can return early on experimental PJRT
    # platforms).
    it = 0
    state, rd, sigma, lam, m_prev, stacked, k_done = superchunk(
        state, rd, sigma, lam, m_prev, it)
    it += int(k_done) * CHUNK_ITERS
    float(stacked["nrm_Rp"][-1])

    t0 = time.perf_counter()
    done = 0
    for _ in range(REPEATS):
        state, rd, sigma, lam, m_prev, stacked, k_done = superchunk(
            state, rd, sigma, lam, m_prev, it)
        float(stacked["nrm_Rp"][-1])
        done += int(k_done) * CHUNK_ITERS
        it += int(k_done) * CHUNK_ITERS
    dt = time.perf_counter() - t0

    its_per_sec = done / dt

    # --- Roofline accounting (SURVEY §6 measurement protocol) ---
    # Bytes ACTUALLY touched per iteration, from the attached tile
    # arrays (incl. all padding), so the perf claim is anchored to the
    # chip's HBM bandwidth rather than only the provisional A100
    # baseline.  Per iteration = one SpMV(A^T) + one SpMV(A) + the
    # elementwise halves.
    def spmv_bytes(A):
        b = 0
        for arr in (A.lane_idx1t, A.lane_idx2, A.lane_vals,
                    A.lane_vals_lo, A.thin_idx1t, A.thin_idx2,
                    A.thin_invt, A.thin_vals, A.thin_vals_lo):
            if arr is not None:
                b += arr.size * arr.dtype.itemsize
        if A.backend == "lane":
            # One (128,128) x-window DMA per chunk; y2 accumulates in
            # VMEM and writes HBM once.
            n_chunks = sum(int(t.shape[0]) for t in
                           (A.lane_idx2, A.thin_idx2) if t is not None)
            b += n_chunks * 128 * 128 * 4
            b += A.nrows * 4
            b += A.ncols * 4  # x read once into the window view
        elif A.backend == "dense":
            b += A.nrows * A.ncols * A.dense.dtype.itemsize \
                + (A.nrows + A.ncols) * 4
        else:  # gather
            for bk in A.buckets:
                b += bk.vals.size * (4 + 4) + bk.nrows * 4
        return b

    # Elementwise halves (x/z then y): reads {x, ATy, c, l, u, last_x}
    # + writes {x, x_hat} = 8 n-vectors; reads {y, Ax, AL, AU, last_y}
    # + writes {y, y_hat} = 7 m-vectors (solver/chunk.py update
    # equations; XLA fuses the intermediates).
    itemsize = jnp.dtype(lp.c.dtype).itemsize
    vec_bytes = 8 * lp.A.ncols * itemsize + 7 * lp.A.nrows * itemsize
    bytes_per_iter = spmv_bytes(lp.AT) + spmv_bytes(lp.A) + vec_bytes
    achieved_gbps = bytes_per_iter * its_per_sec / 1e9

    # Chip HBM bandwidth by device kind (public specs).
    kind = jax.devices()[0].device_kind.lower()
    hbm_gbps = 819.0  # v5e default
    for pat, bw in (("v5p", 2765.0), ("v5 lite", 819.0), ("v5e", 819.0),
                    ("v6e", 1640.0), ("v6 lite", 1640.0), ("v4", 1228.0),
                    ("cpu", 100.0)):
        if pat in kind:
            hbm_gbps = bw
            break

    print(json.dumps({
        "metric": (f"hpr_iterations_per_sec[m={M},n={N},"
                   f"nnz={problem.nnz},backend={lp.A.backend}]"),
        "value": round(its_per_sec, 1),
        "unit": "iter/s",
        "vs_baseline": round(its_per_sec / BASELINE_ITERS_PER_SEC, 3),
        "bytes_per_iter": int(bytes_per_iter),
        "achieved_gbps": round(achieved_gbps, 1),
        "roofline_frac": round(achieved_gbps / hbm_gbps, 3),
        "device_kind": kind,
    }))


if __name__ == "__main__":
    main()
