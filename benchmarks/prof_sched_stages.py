"""Stage-time schedule_hybrid on the banded-giant family: route_cells,
the native thin pack, the aligned schedule, and the numpy tile fills.

Usage: python benchmarks/prof_sched_stages.py [scale]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def t(label, f):
    t0 = time.perf_counter()
    out = f()
    print(f"  {label}: {time.perf_counter() - t0:.2f}s", flush=True)
    return out


def main():
    s = float(sys.argv[1]) if len(sys.argv) > 1 else 0.25
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from run import banded_lp

    from hprlp_tpu.ops.device_problem import build_device_problem
    from hprlp_tpu.ops import sparse as S
    from hprlp_tpu.ops import lane_ell as L

    m = max(int(1572864 * s) // 256 * 256, 256)
    prob = banded_lp(m, 2 * m, 72, 16384, 5)
    print(f"problem: m={m} nnz={prob.nnz/1e6:.1f}M", flush=True)

    lp_host, maps = build_device_problem(prob, upload=False)
    for name, M in (("A", lp_host.A),):
        rows_p, cols_p, vals = t("to_coo", lambda: S.to_coo(M))
        m_pad, n_pad = M.nrows, M.ncols

        thin_mask, phi, stats = t(
            "route_cells(mask)",
            lambda: L.route_cells(rows_p, cols_p, m_pad))
        print(f"  phi={phi} thin_frac={thin_mask.mean():.3f} "
              f"stats={stats}", flush=True)

        tm = thin_mask
        rs_t, cs_t, vs_t = rows_p[tm], cols_p[tm], vals[tm]
        rs_a, cs_a, vs_a = rows_p[~tm], cols_p[~tm], vals[~tm]

        # Thin path stages (serial, presorted path).
        G = m_pad // 128
        GR = np.int64(max(1, -(-G // 128)))
        w_all = cs_t // L.WINDOW
        gr_all = rs_t // (128 * 128)
        order = t("thin _sort_by_keys",
                  lambda: L._sort_by_keys(
                      (cs_t, rs_t, w_all * GR + gr_all)))
        rs_s, cs_s, vs_s = rs_t[order], cs_t[order], vs_t[order]
        res = t("thin _pack_thin (native)",
                lambda: L._pack_thin(rs_s, cs_s, phi))
        out_sb, out_sub, sb_wid, sb_gbase = res
        print(f"  thin sub-blocks: {len(sb_wid)}", flush=True)
        tiles_t = t("schedule_thin TOTAL (parallel wrapper)",
                    lambda: L.schedule_thin(rs_t, cs_t, vs_t, m_pad,
                                            n_pad, phi=phi))
        if len(rs_a):
            tiles_a = t("schedule_lane_ell TOTAL",
                        lambda: L.schedule_lane_ell(rs_a, cs_a, vs_a,
                                                    m_pad, n_pad))
        from hprlp_tpu.ops.pallas_spmv import pack_tiles_np

        t("pack_tiles_np(thin)",
          lambda: pack_tiles_np(tiles_t, np.float32))


if __name__ == "__main__":
    main()
