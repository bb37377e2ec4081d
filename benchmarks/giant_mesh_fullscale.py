"""Full-scale giant x mesh evidence run (BASELINE config 5).

Builds the FULL 113M-nnz banded giant chunk-sharded over an 8-device
mesh (virtual CPU devices here; the same code path drives real chips),
records the ingest phase times and the per-device tile memory, and
EXECUTES a short run_chunk on the sharded program to prove the
full-scale SPMD solve runs and to measure its per-iteration wall.

Why not solve to OPTIMAL at this scale on the CPU mesh: the lane kernel
runs in the Pallas INTERPRETER on CPU backends (python-per-sub-block; a
single 113M-nnz SpMV measures minutes), so a 1050-iteration convergence
run is an interpreter benchmark, not a framework measurement.  The
convergence evidence for the SAME path comes from (a) the
banded_giant_mesh8 config at the largest interpreter-feasible scale
(benchmarks/report_giant_mesh_full.json, OPTIMAL) and (b) the single-
chip 113M-nnz OPTIMAL on real TPU hardware
(benchmarks/report_giant_lanefirst.json).

Usage:
  PYTHONPATH= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python benchmarks/giant_mesh_fullscale.py [scale] [out.json]
"""

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), os.pardir))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("HPRLP_GIANT_LANE_FIRST_NNZ", "1000000")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "report_giant_mesh_fullscale.json")

    from run import banded_lp

    from hprlp_tpu.ops import sparse as S
    from hprlp_tpu.ops.device_problem import build_device_problem_giant
    from hprlp_tpu.parallel.sharded import make_mesh
    from hprlp_tpu.solver.chunk import init_state, initial_metrics, run_chunk

    n_dev = len(jax.devices())
    mm = max(int(1572864 * scale) // (256 * n_dev) * 256 * n_dev,
             256 * n_dev)
    t0 = time.perf_counter()
    prob = banded_lp(mm, 2 * mm, 72, 16384, 5)
    t_gen = time.perf_counter() - t0
    print(f"instance: m={prob.m} n={prob.n} nnz={prob.nnz} "
          f"({t_gen:.1f} s to generate)", flush=True)

    mesh = make_mesh(n_dev)
    S.sharded_build_stats_log.clear()
    t0 = time.perf_counter()
    lp, maps, scal, host_scale_s = build_device_problem_giant(
        prob, dtype=jnp.float32, mesh=mesh)
    jax.block_until_ready(lp.c)
    ingest_s = time.perf_counter() - t0

    entries = S.sharded_build_stats_log
    per_dev = sum(e["per_device_tile_bytes"] for e in entries)
    unpadded = sum(e["unpadded_tile_bytes"] for e in entries)

    # Execute the sharded program: 4 iterations + a residual check.
    state = init_state(lp)
    m0 = initial_metrics(lp, scal, state)
    t0 = time.perf_counter()
    state, m = run_chunk(lp, scal, state, jnp.asarray(1.0, lp.c.dtype),
                        jnp.asarray(4.0, lp.c.dtype), jnp.asarray(False),
                        jnp.asarray(4, jnp.int32))
    nrm_rp = float(m["nrm_Rp"])
    exec_s = time.perf_counter() - t0

    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    rec = {
        "scale": scale,
        "n_devices": n_dev,
        "m": prob.m, "n": prob.n, "nnz": prob.nnz,
        "ingest_wall_s": round(ingest_s, 1),
        "host_scale_s": round(host_scale_s, 1),
        "mesh_per_device_tile_bytes": per_dev,
        "mesh_total_tile_bytes": sum(e["total_tile_bytes"]
                                     for e in entries),
        "mesh_unpadded_tile_bytes": unpadded,
        "mesh_per_device_frac_of_single": (per_dev / unpadded
                                           if unpadded else 0.0),
        "sharded_exec_iters": 4,
        "sharded_exec_wall_s": round(exec_s, 1),
        "nrm_Rp_after_4_iters": nrm_rp,
        "process_peak_rss_gb": round(rss_gb, 1),
        "backend": jax.default_backend(),
        "note": ("virtual CPU mesh: the lane kernel runs in the Pallas "
                 "interpreter here, so convergence runs are bounded "
                 "(see module docstring); this record is the full-scale "
                 "ingest + per-device memory + sharded-execution "
                 "evidence"),
    }
    print(json.dumps(rec, indent=1), flush=True)
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=2)
    print(f"written to {out_path}", flush=True)


if __name__ == "__main__":
    main()
