"""Measure the NATIVE lane scheduler's quality on the bench matrices.

Reports, for A and AT of the bench problem (and optionally --huge):
  - sub-blocks emitted (sum over (window, grange) of max block depth),
  - the Konig-style lower bound on that sum,
  - chunk count after per-window %8 padding (what the kernel pays),
  - scheduler wall time.

Used to evaluate scheduler changes (native/src/lane_schedule.cpp)
without a TPU in the loop.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from hprlp_tpu.native import get_lib
from hprlp_tpu.ops.device_problem import build_device_problem
from hprlp_tpu.ops.lane_ell import LANES, SUBBLOCKS, WINDOW
from hprlp_tpu.ops.sparse import to_coo

def measure(name, M):
    rows_p, cols_p, _ = to_coo(M)
    g = rows_p // LANES
    l = (rows_p % LANES).astype(np.int64)
    w = cols_p // WINDOW
    order = np.lexsort((l, g, w))
    rows_s = np.ascontiguousarray(rows_p[order])
    cols_s = np.ascontiguousarray(cols_p[order])
    nnz = len(order)

    lib = get_lib()
    cap = nnz + 1
    sub = np.zeros(nnz, np.int64)
    gid = np.zeros(cap, np.int32)
    wid = np.zeros(cap, np.int32)
    t0 = time.time()
    n_sub = lib.hpres_lane_schedule(nnz, rows_s, cols_s, sub, gid, wid, cap)
    dt = time.time() - t0
    assert n_sub > 0
    gid, wid = gid[:n_sub].astype(np.int64), wid[:n_sub].astype(np.int64)

    #

    # Validate the schedule constraints per sublane.
    key = sub  # global sublane per sorted entry
    ok_lane = len(np.unique(key * 128 + rows_s % LANES)) == nnz
    rho = cols_s % LANES
    pairs = np.unique(np.stack([key, rho, cols_s], 1), axis=0)
    ok_res = len(np.unique(pairs[:, 0] * 128 + pairs[:, 1])) == len(pairs)
    assert ok_lane and ok_res, (ok_lane, ok_res)

    # Sub-block accounting: per (w, grange) the aligned layout pays the
    # max per-(w,g) depth; per window, chunks pad sub-blocks to %8.
    GG = int(g.max()) + 1
    NW = int(w.max()) + 1
    n_gr = -(-GG // LANES)
    # depth of each sublane within its (w, gid) run
    runs = np.zeros(n_sub, np.int64)
    if n_sub:
        same = np.zeros(n_sub, bool)
        same[1:] = (gid[1:] == gid[:-1]) & (wid[1:] == wid[:-1])
        idx = np.arange(n_sub)
        start = idx.copy()
        start[same] = 0
        np.maximum.accumulate(start, out=start)
        runs = idx - start
    dw = np.zeros((NW, GG), np.int64)
    np.maximum.at(dw, (wid, gid), runs + 1)

    # Konig LB per (w,g) block
    lbw = np.zeros((NW, GG), np.int64)
    uniq_wgl, cnt = np.unique(w * GG * 128 + g * 128 + l,
                              return_counts=True)
    np.maximum.at(lbw, ((uniq_wgl // (GG * 128)), (uniq_wgl // 128) % GG),
                  cnt)
    pr = np.unique(np.stack([w, g, cols_p % LANES, cols_p], 1), axis=0)
    uniq_wgr, cntr = np.unique(pr[:, 0] * GG * 128 + pr[:, 1] * 128
                               + pr[:, 2], return_counts=True)
    np.maximum.at(lbw, ((uniq_wgr // (GG * 128)), (uniq_wgr // 128) % GG),
                  cntr)

    def range_max(x):
        pad = n_gr * LANES - GG
        x2 = np.hstack([x, np.zeros((NW, pad), np.int64)])
        return x2.reshape(NW, n_gr, LANES).max(axis=2).sum()

    sb = int(range_max(dw))
    lb = int(range_max(lbw))
    # chunk padding: per window, pad sub-blocks to a multiple of SUBBLOCKS
    per_win = np.zeros(NW, np.int64)
    pad = n_gr * LANES - GG
    dw2 = np.hstack([dw, np.zeros((NW, pad), np.int64)])
    per_win = dw2.reshape(NW, n_gr, LANES).max(axis=2).sum(axis=1)
    chunks = int((-(-per_win // SUBBLOCKS)).sum())
    lb2 = np.hstack([lbw, np.zeros((NW, pad), np.int64)])
    lb_win = lb2.reshape(NW, n_gr, LANES).max(axis=2).sum(axis=1)
    lb_chunks = int((-(-lb_win // SUBBLOCKS)).sum())
    print(f"{name}: sub-blocks={sb} (LB {lb})  chunks={chunks} "
          f"(LB {lb_chunks})  sublanes={n_sub}  [{dt:.1f}s]")
    return sb, lb, chunks

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--huge", action="store_true")
    args = ap.parse_args()
    if args.huge:
        import bench

        bench.M, bench.N = 262144, 524288
    from bench import make_problem

    problem = make_problem()
    lp, _ = build_device_problem(problem)
    measure("A", lp.A)
    measure("AT", lp.AT)

if __name__ == "__main__":
    main()
