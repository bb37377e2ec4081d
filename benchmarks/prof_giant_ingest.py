"""Phase-profile the giant lane-first ingest (build_device_problem_giant)
on the banded-giant benchmark family at a chosen scale.

Usage: HPRLP_LAYOUT_VERBOSE=1 python benchmarks/prof_giant_ingest.py [scale]
  scale 1.0 = the 113M-nnz banded_giant_1e-4 config (benchmarks/run.py).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("HPRLP_LAYOUT_VERBOSE", "1")

import numpy as np


def main():
    s = float(sys.argv[1]) if len(sys.argv) > 1 else 0.25
    uniform = "--uniform" in sys.argv
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from run import banded_lp, random_lp

    # Same allocator tuning as the benchmark runner (explicit opt-in).
    from hprlp_tpu._malloc import tune_malloc

    tune_malloc(thp=True)

    t0 = time.perf_counter()
    if uniform:
        m = max(int(786432 * s) // 256 * 256, 256)
        prob = random_lp(m, 2 * m, 128, 6)
    else:
        m = max(int(1572864 * s) // 256 * 256, 256)
        prob = banded_lp(m, 2 * m, 72, 16384, 5)
    print(f"problem: m={m} nnz={prob.nnz/1e6:.1f}M "
          f"{'uniform' if uniform else 'banded'} "
          f"gen={time.perf_counter()-t0:.1f}s", flush=True)

    import jax

    from hprlp_tpu.ops.device_problem import build_device_problem_giant

    t0 = time.perf_counter()
    lp, maps, scal, scale_s = build_device_problem_giant(prob)
    jax.block_until_ready(lp.c)
    total = time.perf_counter() - t0
    slots = sum(int(a.size) // 128 for a in
                (lp.A.lane_idx2, lp.A.thin_idx2, lp.AT.lane_idx2,
                 lp.AT.thin_idx2) if a is not None)
    print(f"TOTAL ingest: {total:.1f}s (host_scale {scale_s:.1f}s) "
          f"slots/nnz={slots * 128 / (2 * prob.nnz):.2f}", flush=True)


if __name__ == "__main__":
    main()
