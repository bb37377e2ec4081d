"""Profile the giant-LP ingest pipeline: per-phase wall time of
build_device_problem + attach_lane (the round-2 scale bottleneck — at
52M nnz layout measured ~110 s against a 14 s solve).

Usage:  JAX_PLATFORMS=cpu python benchmarks/prof_layout.py [nnz_millions]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import scipy.sparse as sp


def banded_lp(m, n, nnz_per_row, halfwidth, seed=0):
    from hprlp_tpu.problem import LpProblem

    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(m), nnz_per_row)
    center = (rows * (n / m)).astype(np.int64)
    cols = (center + rng.integers(-halfwidth, halfwidth + 1,
                                  size=m * nnz_per_row)) % n
    vals = rng.normal(size=m * nnz_per_row)
    A = sp.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsr()
    A.sum_duplicates()
    x_feas = rng.uniform(-1.0, 1.0, n)
    Ax = A @ x_feas
    return LpProblem.from_arrays(A, Ax - 1.0, Ax + 1.0, x_feas - 2.0,
                                 x_feas + 2.0, rng.normal(size=n))


def main():
    nnz_m = float(sys.argv[1]) if len(sys.argv) > 1 else 20
    uniform = "--uniform" in sys.argv
    scale = nnz_m / 75.0
    m = int(1572864 * scale ** 0.5) // 256 * 256
    n = 2 * m
    k = 48
    t0 = time.perf_counter()
    if uniform:
        rng = np.random.default_rng(5)
        rows = np.repeat(np.arange(m), k)
        cols = rng.integers(0, n, size=m * k)
        vals = rng.normal(size=m * k)
        A = sp.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsr()
        A.sum_duplicates()
        from hprlp_tpu.problem import LpProblem

        x_feas = rng.uniform(-1.0, 1.0, n)
        Ax = A @ x_feas
        prob = LpProblem.from_arrays(A, Ax - 1.0, Ax + 1.0, x_feas - 2.0,
                                     x_feas + 2.0, rng.normal(size=n))
    else:
        prob = banded_lp(m, n, k, 16384, 5)
    print(f"problem: m={m} n={n} nnz={prob.nnz/1e6:.1f}M "
          f"({'uniform' if uniform else 'banded'}) "
          f"gen={time.perf_counter()-t0:.1f}s", flush=True)

    from hprlp_tpu.ops.device_problem import build_device_problem
    from hprlp_tpu.ops import sparse as S

    t0 = time.perf_counter()
    dev, maps = build_device_problem(prob)
    t_build = time.perf_counter() - t0
    print(f"build_device_problem: {t_build:.1f}s", flush=True)

    from hprlp_tpu.ops.lane_ell import schedule_hybrid
    from hprlp_tpu.ops.pallas_spmv import estimate_tile_bytes, pack_tiles

    for name, M in (("A", dev.A), ("AT", dev.AT)):
        t0 = time.perf_counter()
        rows_p, cols_p, vals = S.to_coo(M)
        t_coo = time.perf_counter() - t0
        t0 = time.perf_counter()
        hy = schedule_hybrid(rows_p, cols_p, vals, M.nrows, M.ncols)
        t_sched = time.perf_counter() - t0
        tot_bytes = sum(estimate_tile_bytes(t, np.float32)
                        for t in (hy["aligned"], hy["thin"])
                        if t is not None)
        slots = sum(t["vals"].size for t in (hy["aligned"], hy["thin"])
                    if t is not None)
        t0 = time.perf_counter()
        for t in (hy["aligned"], hy["thin"]):
            if t is not None:
                pack_tiles(t, M.ncols, np.float32)
        t_pack = time.perf_counter() - t0
        print(f"{name}: to_coo={t_coo:.1f}s schedule={t_sched:.1f}s "
              f"pack={t_pack:.1f}s slots/nnz={slots/len(rows_p):.2f} "
              f"tile_bytes={tot_bytes/1e9:.2f}GB stats={hy['stats']}", flush=True)


if __name__ == "__main__":
    main()
