"""Benchmark: steady-state HPR-LP iterations/second on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The workload is a fixed synthetic LP (seeded, ~20 nnz/row) in the
HBM-resident regime, solved through the production path: bucketed-ELL
layout -> scaling -> power method -> SpMV backend autotune (gather /
dense-MXU / windowed-LaneELL Pallas) -> jitted 150-iteration chunks, i.e.
exactly what solve() executes per checkpoint (reference hot loop parity:
src/HPRLP.cu:178-310).

Timing forces a host fetch per chunk; the measured per-iteration time
therefore INCLUDES the host dispatch overhead amortised over check_iter
iterations, like a real solve.  (On the axon-tunnelled dev TPU that
dispatch costs ~27 ms per call; on directly-attached hardware it is
microseconds.)

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
REPEATS = 5
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
    from hprlp_tpu.solver.chunk import init_state, run_chunk
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

    # Warm-up: compile + one chunk.  A host fetch per chunk forces real
    # completion (block_until_ready can return early on experimental PJRT
    # platforms).
    state, metrics = run_chunk(lp, scal, state, sigma, lam, flag, n_iters)
    float(metrics["nrm_Rp"])

    t0 = time.perf_counter()
    for _ in range(REPEATS):
        state, metrics = run_chunk(lp, scal, state, sigma, lam, flag,
                                   n_iters)
        float(metrics["nrm_Rp"])
    dt = time.perf_counter() - t0

    its_per_sec = REPEATS * CHUNK_ITERS / dt
    print(json.dumps({
        "metric": (f"hpr_iterations_per_sec[m={M},n={N},"
                   f"nnz={problem.nnz},backend={lp.A.backend}]"),
        "value": round(its_per_sec, 1),
        "unit": "iter/s",
        "vs_baseline": round(its_per_sec / BASELINE_ITERS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
