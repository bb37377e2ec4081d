"""Presolve-at-scale proof: run hpres on a generated 10M+-nnz structured LP
inside the 60 s default budget and publish per-explorer stats.

Parity target: the reference runs PSLP with a 60 s default budget
(third_party/PSLP/src/core/Presolver.c:90, pslp_integration.cpp:232-234)
and keeps per-explorer time stats (PSLP_stats.h:46-56).  This harness is
the SURVEY item-7 artifact: reduction %, wall time, and the hpres_report
per-explorer breakdown at Mittelmann-class nnz.

Usage:
    python benchmarks/prof_presolve_scale.py [--scale 1.0] [--budget 60]

Writes benchmarks/report_presolve_scale.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Benchmark entry point: allocator tuning is explicit opt-in here
# (hprlp_tpu/_malloc.py — brk-heap mallopt + THP, restored at exit).
from hprlp_tpu._malloc import tune_malloc  # noqa: E402

tune_malloc(thp=True)

from hprlp_tpu.problem import LpProblem          # noqa: E402
from hprlp_tpu.presolve import presolve_problem  # noqa: E402

INF = float("inf")


def structured_lp(scale: float = 1.0, seed: int = 7) -> LpProblem:
    """A production-planning-shaped LP with deliberately presolvable
    structure at ~10.6M nnz (scale=1):

    - core block: E dense-ish equality/inequality rows x ~18 nnz (the
      irreducible bulk),
    - S singleton capacity rows (singleton-row explorer),
    - D doubleton equalities chaining consecutive variables (doubleton
      substitution),
    - P parallel duplicates of core rows with a scalar multiple
      (parallel-row explorer),
    - F fixed columns (l == u) scattered through the core (fixed-col),
    - empty + implied-free singleton columns at the tail.
    """
    rng = np.random.default_rng(seed)
    E = int(500_000 * scale)   # core rows
    d = 18                     # nnz per core row
    S = int(200_000 * scale)   # singleton rows
    D = int(200_000 * scale)   # doubleton equality rows
    P = int(50_000 * scale)    # parallel duplicate rows
    F = int(50_000 * scale)    # fixed columns
    # Disjoint column ranges keep the instance FEASIBLE by construction:
    # core/singleton/fixed structure lives in [0, n_core); doubleton
    # equalities get dedicated column pairs in [n_core, n) so a fixed
    # column can never contradict an equality chain.
    n_core = int(600_000 * scale)
    n = n_core + 2 * D

    rows = []
    cols = []
    vals = []
    AL = []
    AU = []

    # Core block: rows 0..E-1, random columns, two-sided ranges.
    core_cols = rng.integers(0, n_core, size=(E, d), dtype=np.int64)
    core_vals = rng.uniform(-2.0, 2.0, size=(E, d))
    core_vals[np.abs(core_vals) < 0.1] = 0.5
    rows.append(np.repeat(np.arange(E, dtype=np.int64), d))
    cols.append(core_cols.ravel())
    vals.append(core_vals.ravel())
    lo = rng.uniform(-5.0, 0.0, size=E)
    AL.append(lo)
    AU.append(lo + rng.uniform(0.0, 10.0, size=E))

    # Singleton rows: one entry each on a random core column => becomes a
    # bound.  AU >= 2.5 so even a fixed column (|val*fv| <= 2) satisfies it.
    r0 = E
    scols = rng.integers(0, n_core, size=S, dtype=np.int64)
    rows.append(np.arange(r0, r0 + S, dtype=np.int64))
    cols.append(scols)
    vals.append(rng.uniform(0.5, 2.0, size=S))
    AL.append(np.full(S, -INF))
    AU.append(rng.uniform(2.5, 8.0, size=S))

    # Doubleton equalities over dedicated column pairs (never fixed).
    r0 += S
    base = n_core + 2 * np.arange(D, dtype=np.int64)
    rows.append(np.repeat(np.arange(r0, r0 + D, dtype=np.int64), 2))
    dcols = np.stack([base, base + 1], axis=1).ravel()
    cols.append(dcols)
    dvals = np.stack([np.ones(D), -rng.uniform(0.5, 1.5, size=D)],
                     axis=1).ravel()
    vals.append(dvals)
    beq = rng.uniform(-1.0, 1.0, size=D)
    AL.append(beq)
    AU.append(beq.copy())

    # Parallel rows: duplicates of the first P core rows scaled by alpha.
    r0 += D
    alpha = 2.0
    rows.append(np.repeat(np.arange(r0, r0 + P, dtype=np.int64), d))
    cols.append(core_cols[:P].ravel())
    vals.append(alpha * core_vals[:P].ravel())
    AL.append(alpha * lo[:P])
    AU.append(alpha * (lo[:P] + 3.0))   # tighter than the original

    m = r0 + P
    A = sp.csr_matrix(
        (np.concatenate(vals),
         (np.concatenate(rows), np.concatenate(cols))),
        shape=(m, n))
    A.sum_duplicates()

    l = np.full(n, -10.0)
    u = np.full(n, 10.0)
    fixed = rng.choice(n_core, size=F, replace=False)
    fv = rng.uniform(-1.0, 1.0, size=F)
    l[fixed] = fv
    u[fixed] = fv
    c = rng.uniform(-1.0, 1.0, size=n)

    return LpProblem(A=A, AL=np.concatenate(AL), AU=np.concatenate(AU),
                     l=l, u=u, c=c, name="presolve_scale")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--budget", type=float, default=60.0)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "report_presolve_scale.json"))
    args = ap.parse_args()

    t0 = time.perf_counter()
    prob = structured_lp(args.scale)
    gen_s = time.perf_counter() - t0
    nnz0 = prob.A.nnz
    print(f"generated m={prob.A.shape[0]} n={prob.A.shape[1]} "
          f"nnz={nnz0} in {gen_s:.1f} s")

    t0 = time.perf_counter()
    status, reduced, handle = presolve_problem(prob, max_time=args.budget)
    wall = time.perf_counter() - t0
    assert status == "OK", status

    stats = handle.stats()
    report = handle.report()
    nnz1 = reduced.A.nnz if reduced is not None else 0
    out = {
        "scale": args.scale,
        "m": prob.A.shape[0], "n": prob.A.shape[1], "nnz": int(nnz0),
        "reduced_m": int(reduced.A.shape[0]),
        "reduced_n": int(reduced.A.shape[1]),
        "reduced_nnz": int(nnz1),
        "nnz_reduction_pct": round(100.0 * (1 - nnz1 / nnz0), 2),
        "rows_reduction_pct": round(
            100.0 * (1 - reduced.A.shape[0] / prob.A.shape[0]), 2),
        "wall_s": round(wall, 2),
        "budget_s": args.budget,
        "within_budget": wall <= args.budget,
        "stats": stats,
        "explorer_report": report,
        "generate_s": round(gen_s, 2),
    }
    print(json.dumps(out, indent=2))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"written to {args.out}")


if __name__ == "__main__":
    main()
