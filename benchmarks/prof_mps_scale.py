"""MPS-reader-at-scale profile: parse a generated multi-hundred-MB MPS
file with both readers (native C++ and pure-Python fallback).

Parity target: MPS parsing of large files is one of the reference's three
hot loops (SURVEY 3.2; reference: src/mps_reader.cpp:977 readqps_from_file
with capacity heuristics sized from the file, :222-256).  This harness is
the measurement: MB/s and nnz/s per reader on a free-format file, plus the
gzip path.

Usage:
    python benchmarks/prof_mps_scale.py [--nnz 10000000] [--skip-python]

Writes benchmarks/report_mps_scale.json.
"""
from __future__ import annotations

import argparse
import gzip
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Benchmark entry point: allocator tuning is explicit opt-in here
# (hprlp_tpu/_malloc.py — brk-heap mallopt + THP, restored at exit).
from hprlp_tpu._malloc import tune_malloc  # noqa: E402

tune_malloc(thp=True)

from hprlp_tpu.io import mps as pymps              # noqa: E402
from hprlp_tpu.io import native_mps                # noqa: E402


def write_big_mps(path: str, m: int, n: int, nnz_per_col: int,
                  seed: int = 3) -> dict:
    """Write a free-format MPS file column-major (COLUMNS requires all
    entries of a column contiguous).  Text assembly is vectorised with
    numpy char ops; one f.write per ~1M-line block."""
    rng = np.random.default_rng(seed)
    t0 = time.perf_counter()
    with open(path, "w") as f:
        f.write("NAME          BIGGEN\nROWS\n")
        # Row cards: N obj + m L rows (1M-line blocks).
        f.write(" N  COST\n")
        ridx = np.arange(m)
        for a in range(0, m, 1 << 20):
            b = min(m, a + (1 << 20))
            block = "\n".join(" L  R%d" % i for i in ridx[a:b])
            f.write(block + "\n")
        f.write("COLUMNS\n")
        for a in range(0, n, 1 << 18):
            b = min(n, a + (1 << 18))
            k = b - a
            cols = np.repeat(np.arange(a, b), nnz_per_col)
            rows = rng.integers(0, m, size=k * nnz_per_col)
            vals = rng.uniform(-4.0, 4.0, size=k * nnz_per_col)
            lines = [
                "    C%d  R%d  %.6f" % (c, r, v)
                for c, r, v in zip(cols, rows, vals)
            ]
            # one obj entry per column
            lines += ["    C%d  COST  %.6f" % (c, v) for c, v in zip(
                np.arange(a, b), rng.uniform(-1, 1, size=k))]
            f.write("\n".join(lines) + "\n")
        f.write("RHS\n")
        for a in range(0, m, 1 << 19):
            b = min(m, a + (1 << 19))
            vals = rng.uniform(0.0, 50.0, size=b - a)
            f.write("\n".join(
                "    RHS  R%d  %.4f" % (i, v)
                for i, v in zip(range(a, b), vals)) + "\n")
        f.write("BOUNDS\n")
        # a sample of explicit bounds (defaults cover the rest)
        for j in range(0, n, max(1, n // 100_000)):
            f.write(" UP BND  C%d  10.0\n" % j)
        f.write("ENDATA\n")
    return {"write_s": round(time.perf_counter() - t0, 2),
            "bytes": os.path.getsize(path)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nnz", type=int, default=10_000_000)
    ap.add_argument("--skip-python", action="store_true",
                    help="skip the pure-Python reader (slow at 10M nnz)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "report_mps_scale.json"))
    args = ap.parse_args()

    nnz_per_col = 10
    n = args.nnz // (nnz_per_col + 1)   # +1 objective entry per column
    m = max(2, n // 2)

    out: dict = {}
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "big.mps")
        out["generate"] = write_big_mps(path, m, n, nnz_per_col)
        mb = out["generate"]["bytes"] / 1e6
        print(f"wrote {mb:.0f} MB MPS (m={m} n={n}) "
              f"in {out['generate']['write_s']} s")

        t0 = time.perf_counter()
        prob = native_mps.read_mps_native(path)
        dt = time.perf_counter() - t0
        out["native"] = {
            "parse_s": round(dt, 2), "mb_per_s": round(mb / dt, 1),
            "nnz": int(prob.nnz), "nnz_per_s": round(prob.nnz / dt / 1e6, 2),
            "host_cpus": os.cpu_count(),
        }
        print("native:", out["native"])

        # Warm repeat (page cache + faulted arenas): the parallel
        # COLUMNS path's steady-state rate.
        t0 = time.perf_counter()
        native_mps.read_mps_native(path)
        dt = time.perf_counter() - t0
        out["native_warm"] = {"parse_s": round(dt, 2),
                              "mb_per_s": round(mb / dt, 1)}
        print("native warm:", out["native_warm"])

        # gzip path (zlib stream decode, reference: mps_reader.cpp:24-58)
        gz = path + ".gz"
        with open(path, "rb") as fi, gzip.open(gz, "wb", 1) as fo:
            while True:
                chunk = fi.read(1 << 24)
                if not chunk:
                    break
                fo.write(chunk)
        t0 = time.perf_counter()
        prob_gz = native_mps.read_mps_native(gz)
        dt = time.perf_counter() - t0
        assert prob_gz.nnz == prob.nnz
        out["native_gzip"] = {"parse_s": round(dt, 2),
                              "mb_per_s": round(mb / dt, 1)}
        print("native gzip:", out["native_gzip"])

        if not args.skip_python:
            t0 = time.perf_counter()
            prob_py = pymps.read_mps(path)
            dt = time.perf_counter() - t0
            assert prob_py.nnz == prob.nnz, (prob_py.nnz, prob.nnz)
            out["python"] = {
                "parse_s": round(dt, 2), "mb_per_s": round(mb / dt, 1),
                "native_speedup": round(dt / out["native"]["parse_s"], 1),
            }
            print("python:", out["python"])

    print(json.dumps(out, indent=2))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"written to {args.out}")


if __name__ == "__main__":
    main()
