"""Benchmark: steady-state HPR-LP iterations/second on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The workload is a fixed synthetic LP (seeded, ~20 nnz/row) in the
HBM-resident regime, solved through the production lane-first path:
host scaling (solver/host_scaling.py) -> hybrid LaneELL tile packing +
single upload (ops/device_problem.build_device_problem_giant) -> power
method -> the device-resident superchunk (N_CHUNKS jitted 150-iteration
chunks with on-device restart/sigma and stopping per dispatch), i.e.
exactly what a quiet solve() of a lane-regime LP executes (reference hot
loop parity: src/HPRLP.cu:178-310; solver/loop.py).

COLD-START BUDGET (round-4 requirement): the whole run must fit the
driver's capture window from an empty compile cache.  The lane-first
ingest keeps the distinct compiled programs down to three (power-method
loop, initial metrics, superchunk) — no gather-ELL build, no staged
device-scaling jits, no autotune probe compiles.  As insurance, the
first timed superchunk's measured rate is kept as a provisional result
and SIGTERM/SIGINT print it as the final JSON line before exiting, so
even a truncated run records a real measurement.

Timing forces a host fetch per superchunk; the measured per-iteration
time therefore INCLUDES the host dispatch overhead amortised over
N_CHUNKS * check_iter iterations, like a real solve.  (On the
axon-tunnelled dev TPU that dispatch costs ~27 ms per call; on
directly-attached hardware it is microseconds.)

vs_baseline is a bandwidth model of the reference hot loop at this size
(BASELINE.json publishes no numbers; see reference_model_its_per_sec):
two cuSPARSE CSR SpMVs + the fused update's vector traffic at A100
HBM bandwidth.
"""

import json
import os
import signal
import sys
import time

import numpy as np
import scipy.sparse as sp

M = int(os.environ.get("HPRLP_BENCH_M", 65536))
N = int(os.environ.get("HPRLP_BENCH_N", 131072))
NNZ_PER_ROW, SEED = 20, 0
CHUNK_ITERS = 150
# chunks per superchunk dispatch (production quiet-solve size; the device
# while_loop exits at the first converged checkpoint, so a big dispatch
# never overshoots)
N_CHUNKS = int(os.environ.get("HPRLP_BENCH_CHUNKS", 128))
REPEATS = 3

_provisional: dict = {}


def _emit(payload: dict) -> None:
    print(json.dumps(payload), flush=True)


def _on_term(signum, frame):
    # Driver window expired mid-run: report the provisional (real,
    # measured) number instead of nothing.
    if _provisional:
        _emit(_provisional)
    sys.exit(0 if _provisional else 1)


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


def chip_hbm_gbps():
    """(hbm_gbps, device_kind) for the attached chip (public specs)."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    hbm_gbps = 819.0  # v5e default
    for pat, bw in (("v5p", 2765.0), ("v5 lite", 819.0),
                    ("v5e", 819.0), ("v6e", 1640.0),
                    ("v6 lite", 1640.0), ("v4", 1228.0),
                    ("cpu", 100.0)):
        if pat in kind:
            hbm_gbps = bw
            break
    return hbm_gbps, kind


def model_bytes_per_iter(nnz: int, m: int, n: int,
                         itemsize: int = 4) -> int:
    """IDEAL per-iteration HBM traffic of the hot loop at the given
    element size (4 = f32, 8 = f64/df64 pairs): two SpMVs (vals + i32
    col indices + gathered x + y/rowptr) plus the elementwise halves'
    vector traffic (8 n-vectors + 7 m-vectors; solver/chunk.py).  Ideal
    = no tile padding, so roofline fractions derived from it are
    conservative lower bounds (bench.py's in-process roofline() measures
    the ACTUAL attached tile bytes instead)."""
    spmv_bytes = 2 * (nnz * (itemsize + 4) + nnz * itemsize
                      + (m + n) * itemsize)
    vec_bytes = (8 * n + 7 * m) * itemsize
    return spmv_bytes + vec_bytes


def reference_model_its_per_sec(nnz: int, m: int, n: int) -> float:
    """Bandwidth model of the reference hot loop (HPR_cuda_kernels.cu:
    297-427 fused kernels; BASELINE.md grounding): per iteration, two
    CSR SpMVs (vals f64 + col idx i32 + row ptr, x gather, y write) and
    the fused proximal updates' vector traffic (~8 n-vectors + 7
    m-vectors, f64), at A100-80GB HBM2e effective bandwidth (~1.6 TB/s
    of the 1935 GB/s peak, the usual ~80% achievable)."""
    spmv_bytes = 2 * (nnz * (8 + 4)     # vals + col indices
                      + nnz * 8         # gathered x (worst-case unique)
                      + (m + n) * 8)    # y write + row ptrs
    vec_bytes = (8 * n + 7 * m) * 8
    a100_eff_gbps = 1600.0
    return a100_eff_gbps * 1e9 / (spmv_bytes + vec_bytes)


def main():
    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)
    t_start = time.perf_counter()

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

    from hprlp_tpu.ops.device_problem import build_device_problem_giant
    from hprlp_tpu.solver.chunk import init_state, initial_metrics
    from hprlp_tpu.solver.device_loop import init_restart_dev, run_superchunk
    from hprlp_tpu.solver.power_iteration import power_method

    def phase(name, t0):
        print(f"[bench] {name}: {time.perf_counter() - t0:.1f} s "
              f"(t+{time.perf_counter() - t_start:.1f})", file=sys.stderr,
              flush=True)

    t0 = time.perf_counter()
    problem = make_problem()
    phase("make_problem", t0)

    # Lane-first ingest: host scaling + hybrid LaneELL tiles, ONE upload.
    # Backend is pinned to "lane" — the autotuner's choice for this
    # regime on every measurement since round 2 — so the bench compiles
    # no gather/dense probe programs (round-3 cold-start fix).
    t0 = time.perf_counter()
    lp, maps, scal, _scale_s = build_device_problem_giant(problem)
    jax.block_until_ready(lp.c)
    phase("lane_first_ingest", t0)

    dtype = lp.c.dtype
    t0 = time.perf_counter()
    lam = jnp.maximum(power_method(lp) * 1.01, 1e-12)
    lam = jnp.asarray(float(lam), dtype)  # host fetch = compile fence
    phase("power_method", t0)

    state = init_state(lp)
    sigma = jnp.asarray(1.0, dtype)
    rd = init_restart_dev(1.0, dtype)
    m_prev = initial_metrics(lp, scal, state)
    obj_c = jnp.asarray(0.0, dtype)

    best_pt = {"x_bar": state.x_bar, "y_bar": state.y_bar, "sigma": sigma}

    def superchunk(state, rd, sigma, lam, m_prev, it):
        # stop_tol=0 so the synthetic LP never converges mid-dispatch and
        # every superchunk runs all N_CHUNKS.  stall_patience=0: the
        # bench measures raw steady-state iteration cost.
        nonlocal best_pt
        out = run_superchunk(lp, scal, state, rd, sigma, lam, m_prev,
                             it, obj_c, 0.0, N_CHUNKS, CHUNK_ITERS, 0,
                             best_pt)
        best_pt = out[7]
        return out[:7]

    # Warm-up: compile + one superchunk.  A host fetch forces real
    # completion (block_until_ready can return early on experimental PJRT
    # platforms).
    t0 = time.perf_counter()
    it = 0
    state, rd, sigma, lam, m_prev, stacked, k_done = superchunk(
        state, rd, sigma, lam, m_prev, it)
    it += int(k_done) * CHUNK_ITERS
    float(stacked["nrm_Rp"][-1])
    phase("superchunk_compile+warmup", t0)

    def roofline(its_per_sec):
        # --- Roofline accounting (SURVEY §6 measurement protocol) ---
        # Bytes ACTUALLY touched per iteration, from the attached tile
        # arrays (incl. all padding), so the perf claim is anchored to
        # the chip's HBM bandwidth rather than only the reference model.
        def spmv_bytes(A):
            b = 0
            for arr in (A.lane_idx1t, A.lane_idx2, A.lane_vals,
                        A.lane_vals_lo, A.thin_idx1t, A.thin_idx2,
                        A.thin_invt, A.thin_vals, A.thin_vals_lo):
                if arr is not None:
                    b += arr.size * arr.dtype.itemsize
            # One (128,128) x-window DMA per chunk; y2 accumulates in
            # VMEM and writes HBM once.
            n_chunks = sum(int(t.shape[0]) for t in
                           (A.lane_idx2, A.thin_idx2) if t is not None)
            b += n_chunks * 128 * 128 * 4
            b += A.nrows * 4
            b += A.ncols * 4  # x read once into the window view
            return b

        # Elementwise halves (x/z then y): reads {x, ATy, c, l, u,
        # last_x} + writes {x, x_hat} = 8 n-vectors; reads {y, Ax, AL,
        # AU, last_y} + writes {y, y_hat} = 7 m-vectors (solver/chunk.py
        # update equations; XLA fuses the intermediates).
        itemsize = jnp.dtype(dtype).itemsize
        vec_bytes = 8 * lp.A.ncols * itemsize + 7 * lp.A.nrows * itemsize
        bytes_per_iter = spmv_bytes(lp.AT) + spmv_bytes(lp.A) + vec_bytes
        achieved_gbps = bytes_per_iter * its_per_sec / 1e9

        hbm_gbps, kind = chip_hbm_gbps()
        return bytes_per_iter, achieved_gbps, hbm_gbps, kind

    baseline = reference_model_its_per_sec(problem.nnz, M, N)

    def payload(its_per_sec, provisional=False):
        bytes_per_iter, achieved_gbps, hbm_gbps, kind = roofline(its_per_sec)
        d = {
            "metric": (f"hpr_iterations_per_sec[m={M},n={N},"
                       f"nnz={problem.nnz},backend={lp.A.backend}]"),
            "value": round(its_per_sec, 1),
            "unit": "iter/s",
            "vs_baseline": round(its_per_sec / baseline, 3),
            "baseline_model_its_per_sec": round(baseline, 1),
            "bytes_per_iter": int(bytes_per_iter),
            "achieved_gbps": round(achieved_gbps, 1),
            "roofline_frac": round(achieved_gbps / hbm_gbps, 3),
            "device_kind": kind,
            # The north-star target is ONE v5p chip (BASELINE.json); the
            # attached dev chip is usually a v5e (819 GB/s vs v5p's
            # 2765).  The hot loop is memory-bound (roofline_frac
            # above), so the v5p projection scales by bandwidth.
            "vs_baseline_v5p_projected": round(
                its_per_sec * (2765.0 / hbm_gbps) / baseline, 3)
            if "v5p" not in kind else round(its_per_sec / baseline, 3),
        }
        if provisional:
            d["provisional"] = True
        return d

    done = 0
    t_timed = time.perf_counter()
    for rep in range(REPEATS):
        t0 = time.perf_counter()
        state, rd, sigma, lam, m_prev, stacked, k_done = superchunk(
            state, rd, sigma, lam, m_prev, it)
        float(stacked["nrm_Rp"][-1])
        done += int(k_done) * CHUNK_ITERS
        it += int(k_done) * CHUNK_ITERS
        if rep == 0:
            _provisional.update(payload(
                int(k_done) * CHUNK_ITERS / (time.perf_counter() - t0),
                provisional=True))
    dt = time.perf_counter() - t_timed

    _emit(payload(done / dt))


if __name__ == "__main__":
    main()
