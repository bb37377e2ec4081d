"""Windowed LaneELL scheduling + Pallas kernel (interpret mode) tests."""

import numpy as np
import pytest
import scipy.sparse as sp
import jax.numpy as jnp

from hprlp_tpu.ops.lane_ell import (LANES, WINDOW, lane_spmv_reference,
                                    schedule_lane_ell)
from hprlp_tpu.ops.pallas_spmv import lane_spmv, pack_tiles


def _random_coo(seed, m, n, density):
    rng = np.random.default_rng(seed)
    A = sp.random(m, n, density=density, random_state=rng,
                  data_rvs=lambda s: rng.normal(size=s)).tocoo()
    return A, rng


def _check(A, m_pad, n_pad, interpret=True):
    tiles = schedule_lane_ell(A.row.astype(np.int64), A.col.astype(np.int64),
                              A.data, m_pad, n_pad)
    rng = np.random.default_rng(0)
    x = rng.normal(size=n_pad).astype(np.float32)
    y_ref = np.zeros(m_pad, np.float32)
    y_ref[:A.shape[0]] = (A.tocsr() @ x[:A.shape[1]]).astype(np.float32)
    scale = max(1.0, float(np.abs(y_ref).max()))

    # NumPy oracle of the kernel.
    y_np = lane_spmv_reference(tiles, x)
    np.testing.assert_allclose(y_np, y_ref, atol=1e-5 * scale)

    # Pallas kernel in interpreter mode.
    packed = pack_tiles(tiles, n_pad, np.float32)
    y = np.asarray(lane_spmv(jnp.asarray(x), packed["idx1t"], packed["idx2"],
                             packed["vals"], packed["gbase"],
                             packed["wid"], packed["G"],
                             interpret=interpret))
    np.testing.assert_allclose(y, y_ref, atol=1e-5 * scale)
    return tiles


class TestScheduler:
    def test_per_sublane_invariants(self):
        A, _ = _random_coo(3, 700, 900, 0.02)
        tiles = schedule_lane_ell(A.row.astype(np.int64),
                                  A.col.astype(np.int64), A.data, 768, 1024,
                                  with_cols=True)
        C = tiles["idx2"].shape[0]
        for c in range(C):
            cols = tiles["cols"][c]
            idx2 = tiles["idx2"][c]
            for s in range(LANES):
                live = cols[s] >= 0
                if not live.any():
                    continue
                cs = cols[s][live]
                # All live entries in a sublane come from this chunk's window.
                assert np.all(cs // WINDOW == tiles["wid"][c])
                # One distinct column per residue class per sublane.
                res = cs % LANES
                by_res = {}
                for r, cc in zip(res, cs):
                    assert by_res.setdefault(r, cc) == cc
                # Phase-2 index points at the column's residue lane.
                assert np.array_equal(idx2[s][live].astype(np.int64), res)

    def test_gid_aligned_within_subblocks(self):
        # Aligned layout: sub-block j covers groups [gbase, gbase+128) with
        # the sublane for group g at position g - gbase.
        A, _ = _random_coo(4, 1000, 3000, 0.01)
        tiles = schedule_lane_ell(A.row.astype(np.int64),
                                  A.col.astype(np.int64), A.data, 1024, 3072)
        C = tiles["idx2"].shape[0]
        for c in range(C):
            gid = tiles["gid"][c].reshape(-1, 128)
            for j in range(gid.shape[0]):
                gb = tiles["gbase"][c, j]
                assert np.array_equal(gid[j], gb + np.arange(128))

    def test_slot_overhead_reasonable(self):
        A, _ = _random_coo(5, 2000, 4000, 0.005)
        tiles = schedule_lane_ell(A.row.astype(np.int64),
                                  A.col.astype(np.int64), A.data, 2048, 4096)
        slots = tiles["idx2"].shape[0] * 16384
        assert slots <= 6 * A.nnz + 5 * 16384


class TestKernel:
    def test_random_single_window(self):
        A, _ = _random_coo(1, 900, 1100, 0.01)
        _check(A, 1024, 1280)

    def test_random_multi_window(self):
        A, _ = _random_coo(2, 900, 40000, 0.001)
        _check(A, 1024, 40960)

    def test_dense_column_fanout(self):
        A, _ = _random_coo(2, 600, 800, 0.01)
        A = A.tocsr().tolil()
        A[:, 5] = 1.5
        _check(A.tocoo(), 640, 896)

    def test_unbalanced_rows(self):
        rng = np.random.default_rng(7)
        rows = rng.integers(0, 100, 5000)
        cols = rng.integers(0, 2000, 5000)
        vals = rng.normal(size=5000)
        A = sp.coo_matrix((vals, (rows, cols)), shape=(1000, 2000))
        A.sum_duplicates()
        _check(A, 1024, 2048)

    def test_tiny(self):
        A = sp.coo_matrix(
            (np.array([1.0, 2.0, 3.0]),
             (np.array([0, 0, 1]), np.array([0, 1, 0]))), shape=(130, 130))
        _check(A, 256, 256)


class TestDf64Kernel:
    """Double-f32 lane SpMV (lane_spmv_df64): compensated products and
    accumulation must beat plain f32 by many orders of magnitude — the
    fast path for f64 solves (Mosaic has no f64)."""

    def test_df64_accuracy(self):
        from hprlp_tpu.ops.pallas_spmv import lane_spmv_df64

        rng = np.random.default_rng(3)
        A, _ = _random_coo(3, 900, 1100, 0.01)
        tiles = schedule_lane_ell(A.row.astype(np.int64),
                                  A.col.astype(np.int64), A.data,
                                  1024, 1280)
        packed = pack_tiles(tiles, 1280, np.float64)
        x64 = rng.normal(size=1280)
        xh = x64.astype(np.float32)
        xl = (x64 - xh.astype(np.float64)).astype(np.float32)
        yh, yl = lane_spmv_df64(jnp.asarray(xh), jnp.asarray(xl),
                                packed["idx1t"], packed["idx2"],
                                packed["vals"], packed["vals_lo"],
                                packed["gbase"], packed["wid"],
                                packed["G"], interpret=True)
        y = np.asarray(yh, np.float64) + np.asarray(yl, np.float64)
        y_ref = np.zeros(1024)
        y_ref[:900] = A.tocsr() @ x64[:1100]
        scale = max(1.0, np.abs(y_ref).max())
        err = np.abs(y - y_ref).max() / scale
        assert err < 1e-13, err

        # Plain f32 on the same problem is orders of magnitude worse.
        packed32 = pack_tiles(tiles, 1280, np.float32)
        from hprlp_tpu.ops.pallas_spmv import lane_spmv
        y32 = np.asarray(lane_spmv(jnp.asarray(xh), packed32["idx1t"],
                                   packed32["idx2"], packed32["vals"],
                                   packed32["gbase"], packed32["wid"],
                                   packed32["G"], interpret=True),
                         np.float64)
        err32 = np.abs(y32 - y_ref).max() / scale
        assert err32 > 10 * err

    def test_f64_solve_uses_lane_via_spmv(self):
        # spmv() dispatch: an f64 EllMatrix with lane backend routes to
        # the df64 kernel and matches the gather backend to ~1e-12.
        import scipy.sparse as sp

        from hprlp_tpu.ops.device_problem import build_device_problem
        from hprlp_tpu.ops.sparse import spmv, with_backend
        from hprlp_tpu.problem import LpProblem

        rng = np.random.default_rng(5)
        A = sp.random(300, 400, density=0.03, random_state=rng,
                      data_rvs=lambda k: rng.normal(size=k)).tocsr()
        x0 = rng.uniform(-1, 1, 400)
        prob = LpProblem.from_arrays(A, A @ x0 - 1, A @ x0 + 1,
                                     x0 - 1, x0 + 1, rng.normal(size=400))
        lp, _ = build_device_problem(prob, dtype=np.float64)
        x = jnp.asarray(rng.normal(size=lp.A.ncols), jnp.float64)
        y_gather = np.asarray(spmv(lp.A, x))
        A_lane = with_backend(lp.A, "lane")
        assert (A_lane.lane_vals_lo is not None
                or A_lane.thin_vals_lo is not None)
        y_lane = np.asarray(spmv(A_lane, x))
        scale = max(1.0, np.abs(y_gather).max())
        assert np.abs(y_lane - y_gather).max() / scale < 1e-12


class TestDf64Chunk:
    """The f64 middle-iteration loop runs in double-f32 pairs on TPU
    (solver/chunk.py::_df64_middle_iters + ops/df64.py).  On CPU the path
    is gated OFF for production (native f64 is faster AND XLA:CPU codegen
    reassociates through the error-free transformations), so equivalence
    is checked EAGERLY (jax.disable_jit): op-by-op dispatch rounds every
    f32 op exactly, which is also what the TPU backend's compiler does."""

    def test_df64_middle_iters_matches_f64(self):
        import dataclasses

        import jax

        from hprlp_tpu.ops.device_problem import build_device_problem
        from hprlp_tpu.ops.sparse import with_backend
        from hprlp_tpu.problem import LpProblem
        from hprlp_tpu.solver.chunk import (_df64_chunk_iters,
                                            _halpern_factors, _x_half,
                                            _y_half)
        from hprlp_tpu.solver.scaling import scale_problem

        prev = jax.config.jax_enable_x64
        jax.config.update("jax_enable_x64", True)
        try:
            rng = np.random.default_rng(7)
            A = sp.random(200, 300, density=0.04, random_state=rng,
                          data_rvs=lambda k: rng.normal(size=k)).tocsr()
            x0 = rng.uniform(-1, 1, 300)
            prob = LpProblem.from_arrays(A, A @ x0 - 1, A @ x0 + 1,
                                         x0 - 1, x0 + 1,
                                         rng.normal(size=300))
            lp, _ = build_device_problem(prob, dtype=np.float64)
            lp, scal = scale_problem(lp)
            lp_lane = dataclasses.replace(lp, A=with_backend(lp.A, "lane"),
                                          AT=with_backend(lp.AT, "lane"))
            assert (lp_lane.A.lane_vals_lo is not None
                    or lp_lane.A.thin_vals_lo is not None)

            sigma = jnp.asarray(1.3, jnp.float64)
            lam_sigma = jnp.asarray(2.1 * 1.3, jnp.float64)
            x1 = jnp.asarray(rng.normal(size=lp.n) * 0.1)
            y1 = jnp.asarray(rng.normal(size=lp.m) * 0.1)
            last_x = jnp.zeros(lp.n)
            last_y = jnp.zeros(lp.m)
            inner = jnp.asarray(1, jnp.int32)
            # 10 iterations keep the property (changing Halpern
            # factors, both compensated kernels, pair-carry propagation)
            # while the interpret-mode kernel stays ~3x cheaper than the
            # round-3 length (the suite's slowest test at 76 s).
            n_iters = jnp.asarray(10, jnp.int32)

            # Plain f64 reference: the full chunk (first check-style,
            # middle stretch, final check-style) = n_iters iterations.
            x, y = x1, y1
            for k in range(int(n_iters)):
                f1, f2 = _halpern_factors(inner, jnp.float64)
                x, x_hat, x_bar, z_tmp = _x_half(lp, x, y, last_x, sigma,
                                                 f1, f2)
                y, y_bar, _ = _y_half(lp, y, x_hat, last_y, lam_sigma,
                                      f1, f2)
                inner = inner + 1
            z_bar = (x_bar - z_tmp) / sigma

            with jax.disable_jit():
                (x_df, y_df, xb_df, yb_df, zb_df, _yobj, _x2, _y2,
                 _xb1, _yb1, inner_df) = _df64_chunk_iters(
                    lp_lane, x1, y1, last_x, last_y, sigma, lam_sigma,
                    jnp.asarray(1, jnp.int32), n_iters)

            assert int(inner_df) == int(inner)
            for name, a, b in (("x", x, x_df), ("y", y, y_df),
                               ("x_bar", x_bar, xb_df),
                               ("y_bar", y_bar, yb_df),
                               ("z_bar", z_bar, zb_df)):
                a, b = np.asarray(a), np.asarray(b)
                scale = max(1.0, np.abs(a).max())
                assert np.abs(a - b).max() / scale < 1e-11, name
        finally:
            jax.config.update("jax_enable_x64", prev)


class TestSchedulerPeel:
    """Stress the native scheduler's quality passes (column-grouped
    first-fit + targeted depth peeling, native/src/lane_schedule.cpp):
    adversarial structures that force relocation chains, star moves,
    failed peels (state restore), and empty-level compaction — the
    schedule must stay exact and within the aligned-cost envelope."""

    def _exact_and_bounded(self, A, m_pad, n_pad):
        tiles = _check(A.tocoo(), m_pad, n_pad)  # oracle + kernel exact
        # Quality envelope: scheduled sub-blocks within 2x the Konig
        # bound summed per (window, group) — loose, but catches a
        # catastrophic peel/restore bug that duplicates levels.
        Acsr = A.tocsr()
        rows, cols = Acsr.nonzero()
        g = rows // LANES
        w = cols // WINDOW
        l = rows % LANES
        rho = cols % LANES
        lb = 0
        import collections
        per_wg_lane = collections.Counter(zip(w, g, l))
        per_wg_rho = collections.Counter(
            (wi, gi, r) for (wi, gi, r, c) in
            set(zip(w, g, rho, cols)))
        wg_lane_max = collections.Counter()
        wg_rho_max = collections.Counter()
        for (wi, gi, _), v in per_wg_lane.items():
            wg_lane_max[(wi, gi)] = max(wg_lane_max[(wi, gi)], v)
        for (wi, gi, _), v in per_wg_rho.items():
            wg_rho_max[(wi, gi)] = max(wg_rho_max[(wi, gi)], v)
        for k in set(wg_lane_max) | set(wg_rho_max):
            lb += max(wg_lane_max[k], wg_rho_max[k])
        n_sub = tiles["idx2"].shape[0] * tiles["idx2"].shape[1] // LANES
        assert n_sub <= 2 * lb + 8 * max(1, len(set(w))), (n_sub, lb)

    def test_dense_column_stars_across_granges(self):
        # A few very dense columns (large stars) + background noise:
        # star relocation during peeling must keep exactness.
        rng = np.random.default_rng(11)
        m, n = 2000, 20000
        rows = [rng.integers(0, m, 6000)]
        cols = [rng.integers(0, n, 6000)]
        for c in (3, 131, 16384 + 3):  # share residue classes
            rows.append(rng.choice(m, 400, replace=False))
            cols.append(np.full(400, c))
        A = sp.coo_matrix(
            (np.ones(sum(len(r) for r in rows)),
             (np.concatenate(rows), np.concatenate(cols))), shape=(m, n))
        A.sum_duplicates()
        self._exact_and_bounded(A, 2048, 20480)

    def test_skewed_depths_one_grange(self):
        # One deep group per grange (forces peel attempts that must fail
        # at the Konig bound) + shallow neighbours.
        rng = np.random.default_rng(12)
        rows = [rng.integers(0, 2048, 4000)]
        cols = [rng.integers(0, 4096, 4000)]
        # row 0: 40 entries in one window -> depth 40 spike
        rows.append(np.zeros(40, np.int64))
        cols.append(rng.choice(4096, 40, replace=False))
        A = sp.coo_matrix(
            (np.ones(4040),
             (np.concatenate(rows), np.concatenate(cols))),
            shape=(2048, 4096))
        A.sum_duplicates()
        self._exact_and_bounded(A, 2048, 4096)

    def test_residue_collision_heavy(self):
        # All columns congruent mod 128: maximal residue pressure, so
        # depths are set by distinct-cols-per-residue; relocations can
        # only move whole stars.
        rng = np.random.default_rng(13)
        ncols_used = 30
        cols = (rng.integers(0, ncols_used, 3000) * LANES + 5)
        rows = rng.integers(0, 1024, 3000)
        A = sp.coo_matrix((np.ones(3000), (rows, cols)),
                          shape=(1024, ncols_used * LANES + 6))
        A.sum_duplicates()
        self._exact_and_bounded(A, 1024, 4096)


class TestThin:
    """Thin (packed) LaneELL path: the hybrid kernel's secondary layout
    for thin-fill (window, group-range) cells (giant-LP regime; see
    ops/lane_ell.py thin-cell notes).  No reference counterpart — the
    CUDA reference caps at one GPU's memory (include/structs.h:17-19)."""

    def _check_thin(self, A, m_pad, n_pad, phi, interpret=True):
        from hprlp_tpu.ops.lane_ell import schedule_thin, thin_spmv_reference
        from hprlp_tpu.ops.pallas_spmv import pack_tiles, thin_spmv

        tiles = schedule_thin(A.row.astype(np.int64),
                              A.col.astype(np.int64), A.data, m_pad, n_pad,
                              phi=phi, with_cols=True)
        rng = np.random.default_rng(0)
        x = rng.normal(size=n_pad).astype(np.float32)
        y_ref = np.zeros(m_pad, np.float32)
        y_ref[:A.shape[0]] = (A.tocsr() @ x[:A.shape[1]]).astype(np.float32)
        scale = max(1.0, float(np.abs(y_ref).max()))
        y_np = thin_spmv_reference(tiles, x)
        np.testing.assert_allclose(y_np, y_ref, atol=1e-5 * scale)
        packed = pack_tiles(tiles, n_pad, np.float32)
        y = np.asarray(thin_spmv(jnp.asarray(x), packed["idx1t"],
                                 packed["idx2"], packed["invt"],
                                 packed["vals"], packed["gbase"],
                                 packed["wid"], packed["G"],
                                 packed["phi"], interpret=interpret))
        np.testing.assert_allclose(y, y_ref, atol=1e-5 * scale)
        return tiles

    def test_random_all_phis(self):
        A, _ = _random_coo(21, 900, 1100, 0.01)
        for phi in (1, 2, 4, 8):
            self._check_thin(A, 1024, 1280, phi)

    def test_multi_window_multi_grange(self):
        A, _ = _random_coo(22, 40000, 40000, 0.0002)
        self._check_thin(A, 40960, 40960, 4)

    def test_high_multiplicity_rows(self):
        # Rows with many entries in ONE window: per-(row, window)
        # multiplicity above phi must spill to extra sub-blocks exactly.
        rng = np.random.default_rng(23)
        rows = np.repeat(np.arange(64), 40)          # 40 entries per row
        cols = rng.integers(0, 2000, len(rows))
        A = sp.coo_matrix((rng.normal(size=len(rows)), (rows, cols)),
                          shape=(256, 2048))
        A.sum_duplicates()
        for phi in (1, 4):
            self._check_thin(A, 256, 2048, phi)

    def test_dense_column_fanout_thin(self):
        A, _ = _random_coo(24, 600, 800, 0.005)
        A = A.tocsr().tolil()
        A[:, 7] = 2.5                                 # residue-7 star
        self._check_thin(A.tocoo(), 640, 896, 4)

    def test_thin_packing_invariants(self):
        from hprlp_tpu.ops.lane_ell import LANES, WINDOW, schedule_thin

        A, _ = _random_coo(25, 2000, 4000, 0.004)
        phi = 4
        K = LANES // phi
        tiles = schedule_thin(A.row.astype(np.int64),
                              A.col.astype(np.int64), A.data, 2048, 4096,
                              phi=phi, with_cols=True)
        C = tiles["idx2"].shape[0]
        for c in range(C):
            cols = tiles["cols"][c]
            invt = tiles["invt"][c]
            for j in range(8):
                sb_cols = cols[j * 128:(j + 1) * 128]
                gb = tiles["gbase"][c, j]
                live = sb_cols >= 0
                if not live.any():
                    continue
                # One window per chunk.
                assert np.all(sb_cols[live] // WINDOW == tiles["wid"][c])
                # Per (sublane, residue): one distinct column.
                for s in range(128):
                    lv = live[s]
                    if not lv.any():
                        continue
                    cs = sb_cols[s][lv]
                    by_res = {}
                    for r, cc in zip(cs % LANES, cs):
                        assert by_res.setdefault(r, cc) == cc
                # inv consistency: every occupied fold position (q, l) is
                # referenced by exactly one output row d (its entries
                # flush together); positions referenced by NO entry (the
                # per-lane default) must be all-zero across strata so the
                # gather adds exact zeros.
                inv = invt[:, j * 128:(j + 1) * 128]  # (l, d)
                vals = tiles["vals"][c][j * 128:(j + 1) * 128]
                for l in range(128):
                    for q in range(K):
                        strata = [sg * K + q for sg in range(phi)]
                        occupied = any(live[s, l] for s in strata)
                        ds = np.nonzero(inv[l] == q)[0]
                        if occupied:
                            assert len(ds) == 1, (c, j, l, q, ds)
                        else:
                            assert np.all(vals[strata, l] == 0)

    def test_thin_df64_accuracy(self):
        from hprlp_tpu.ops.lane_ell import schedule_thin
        from hprlp_tpu.ops.pallas_spmv import pack_tiles, thin_spmv_df64

        rng = np.random.default_rng(26)
        A, _ = _random_coo(26, 900, 1100, 0.01)
        tiles = schedule_thin(A.row.astype(np.int64),
                              A.col.astype(np.int64), A.data, 1024, 1280,
                              phi=4)
        packed = pack_tiles(tiles, 1280, np.float64)
        x64 = rng.normal(size=1280)
        xh = x64.astype(np.float32)
        xl = (x64 - xh.astype(np.float64)).astype(np.float32)
        yh, yl = thin_spmv_df64(jnp.asarray(xh), jnp.asarray(xl),
                                packed["idx1t"], packed["idx2"],
                                packed["invt"], packed["vals"],
                                packed["vals_lo"], packed["gbase"],
                                packed["wid"], packed["G"], packed["phi"],
                                interpret=True)
        y = np.asarray(yh, np.float64) + np.asarray(yl, np.float64)
        y_ref = np.zeros(1024)
        y_ref[:900] = A.tocsr() @ x64[:1100]
        scale = max(1.0, np.abs(y_ref).max())
        assert np.abs(y - y_ref).max() / scale < 1e-13

    def test_hybrid_via_spmv(self):
        # End-to-end: with_backend("lane") routes cells between aligned
        # and thin tile sets; spmv must match the gather backend.
        from hprlp_tpu.ops.device_problem import build_device_problem
        from hprlp_tpu.ops.sparse import spmv, with_backend
        from hprlp_tpu.problem import LpProblem

        rng = np.random.default_rng(27)
        # Mixed structure: a dense-fill stripe (aligned territory) plus a
        # thin uniform background (thin territory).
        rows = [rng.integers(0, 256, 20000)]          # dense stripe
        cols = [rng.integers(0, 2000, 20000)]
        rows.append(rng.integers(256, 4000, 3000))    # thin background
        cols.append(rng.integers(0, 30000, 3000))
        A = sp.coo_matrix(
            (rng.normal(size=23000),
             (np.concatenate(rows), np.concatenate(cols))),
            shape=(4000, 30000)).tocsr()
        A.sum_duplicates()
        x0 = rng.uniform(-1, 1, 30000)
        prob = LpProblem.from_arrays(A, A @ x0 - 1, A @ x0 + 1, x0 - 1,
                                     x0 + 1, rng.normal(size=30000))
        lp, _ = build_device_problem(prob)
        x = jnp.asarray(rng.normal(size=lp.A.ncols), jnp.float32)
        y_gather = np.asarray(spmv(lp.A, x))
        A_lane = with_backend(lp.A, "lane")
        y_lane = np.asarray(spmv(A_lane, x))
        scale = max(1.0, np.abs(y_gather).max())
        assert np.abs(y_lane - y_gather).max() / scale < 1e-4

    def test_native_packer_matches_python(self):
        # The C++ thin packer (native/src/lane_schedule.cpp::
        # hpres_lane_pack_thin) mirrors _pack_thin_py exactly.
        from hprlp_tpu.native import get_lib
        from hprlp_tpu.ops.lane_ell import WINDOW, _pack_thin_py

        lib = get_lib()
        if lib is None or not hasattr(lib, "hpres_lane_pack_thin"):
            pytest.skip("native library unavailable")
        for seed, (m, n, dens) in enumerate(
                [(900, 1100, 0.01), (700, 40000, 0.0008),
                 (256, 2048, 0.04)]):
            A, _ = _random_coo(seed, m, n, dens)
            rows = A.row.astype(np.int64)
            cols = A.col.astype(np.int64)
            gr = rows // WINDOW
            w = cols // WINDOW
            order = np.lexsort((cols, rows,
                                w * np.int64(1 + gr.max()) + gr))
            rs, cs = rows[order], cols[order]
            for phi in (1, 2, 4, 8):
                sb_n = np.zeros(len(rs), np.int64)
                sub_n = np.zeros(len(rs), np.int32)
                cap = len(rs) + 8
                wid_n = np.zeros(cap, np.int32)
                gb_n = np.zeros(cap, np.int64)
                nsb = lib.hpres_lane_pack_thin(len(rs), rs, cs, phi,
                                               sb_n, sub_n, wid_n, gb_n,
                                               cap)
                sb_p = np.zeros(len(rs), np.int64)
                sub_p = np.zeros(len(rs), np.int32)
                widp, gbp = _pack_thin_py(rs, cs, phi, sb_p, sub_p)
                assert nsb == len(widp), (seed, phi)
                assert np.array_equal(sb_n, sb_p), (seed, phi)
                assert np.array_equal(sub_n, sub_p), (seed, phi)
                assert np.array_equal(wid_n[:nsb], widp)
                assert np.array_equal(gb_n[:nsb], gbp)

    def test_thin_beats_aligned_on_thin_fill(self):
        # The router's reason to exist: on a banded giant-family pattern
        # (per-(row, window) multiplicity ~16-32, ramped depth) the thin
        # layout must need well under the aligned sub-block count AND
        # pack near the slot optimum.  (Measured at this shape: aligned
        # 64 sub-blocks -> hybrid 36, slots/nnz 1.5.)
        from hprlp_tpu.ops.lane_ell import schedule_hybrid

        rng = np.random.default_rng(28)
        m, n, k, hw = 16384, 32768, 32, 8192
        rows = np.repeat(np.arange(m, dtype=np.int64), k)
        center = (rows * (n / m)).astype(np.int64)
        cols = (center + rng.integers(-hw, hw + 1, size=m * k)) % n
        hy = schedule_hybrid(rows, cols, rng.normal(size=m * k), m, n)
        stats = hy["stats"]
        assert stats["n_thin_cells"] > 0
        total_sb = stats["thin_sb"] + stats["aligned_sb"]
        assert total_sb * 1.5 < stats["aligned_sb_if_all"], stats
        # Actual packed tiles stay near the routing estimate.
        assert hy["thin"]["vals"].size <= 1.8 * (m * k), stats


def test_aligned_lane_cost_is_lower_bound_and_tight():
    """_aligned_lane_cost (the layout chooser's estimator) must lower-
    bound the actual scheduled sub-block count and be reasonably tight
    on a dense-fill matrix."""
    import scipy.sparse as sp

    from hprlp_tpu.ops.device_problem import (_aligned_lane_cost,
                                              build_device_problem)
    from hprlp_tpu.ops.lane_ell import LANES, WINDOW
    from hprlp_tpu.ops.sparse import to_coo
    from hprlp_tpu.problem import LpProblem

    rng = np.random.default_rng(5)
    m, n, k = 2048, 4096, 12
    rows = np.repeat(np.arange(m), k)
    cols = rng.integers(0, n, size=m * k)
    vals = rng.normal(size=m * k)
    A = sp.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsr()
    A.sum_duplicates()
    prob = LpProblem.from_arrays(A, -np.ones(m), np.ones(m),
                                 np.zeros(n), np.ones(n), np.ones(n))
    lp, maps = build_device_problem(prob)

    rows_p, cols_p, _ = to_coo(lp.A)
    # Recover positions-by-original-id arrays from the built layout.
    est = _aligned_lane_cost(A.indptr, A.indices, maps.row_pos,
                             maps.col_pos)

    # Actual sub-blocks from the shipped tiles: non-filler sub-blocks of
    # a (w, grange) carry gbase aligned to that grange.
    g = rows_p // LANES
    w = cols_p // WINDOW
    sub = np.zeros(len(rows_p), np.int64)
    from hprlp_tpu.ops.lane_ell import schedule_lane_ell
    tiles = schedule_lane_ell(rows_p, cols_p, np.ones(len(rows_p)),
                              lp.A.nrows, lp.A.ncols)
    # count real (non-filler) sub-blocks: fillers have no entries; count
    # distinct (chunk, sub-block) pairs holding at least one value != 0
    C = tiles["vals"].shape[0]
    nz = np.abs(tiles["vals"]).reshape(C * 8, 128, 128).sum(axis=(1, 2))
    actual = int((nz > 0).sum())
    assert est <= actual
    assert actual <= est * 1.6, (est, actual)  # tight on dense fill


def test_route_counts_native_matches_bincount():
    """The C++ lane_route_counts path only auto-activates above a 100M
    keyspace, so no end-to-end test reaches it; exercise it directly
    (it has no size gate) against the numpy bincount reference."""
    from hprlp_tpu.native import get_lib
    from hprlp_tpu.ops.lane_ell import _route_counts_native

    if get_lib() is None:
        pytest.skip("native library not built")

    rng = np.random.default_rng(7)
    for m_pad, ncol, n in ((256, 3 * WINDOW, 5000), (128, WINDOW, 1),
                           (16384, 5 * WINDOW + 17, 20000)):
        rows_p = rng.integers(0, m_pad, size=n).astype(np.int64)
        cols_p = rng.integers(0, ncol, size=n).astype(np.int64)
        out = _route_counts_native(rows_p, cols_p, m_pad)
        assert out is not None
        w_n, row_n, cnt_n = out

        n_win = int(cols_p.max()) // WINDOW + 1
        cnt = np.bincount((cols_p // WINDOW) * np.int64(m_pad) + rows_p,
                          minlength=n_win * m_pad)
        nz = np.nonzero(cnt)[0]
        np.testing.assert_array_equal(w_n, (nz // m_pad).astype(np.int32))
        np.testing.assert_array_equal(row_n, nz % m_pad)
        np.testing.assert_array_equal(cnt_n, cnt[nz])


def test_native_tile_fill_matches_numpy_fill():
    """The native parallel tile fill (lane_fill.cpp) activates above
    200k entries with f64 values and with_cols=False; the numpy scatter
    fill runs otherwise.  Schedule the same >=200k-entry matrix both
    ways (with_cols=True forces the numpy path) and require IDENTICAL
    tiles — aligned and thin."""
    from hprlp_tpu.native import get_lib
    from hprlp_tpu.ops.lane_ell import schedule_lane_ell, schedule_thin

    if get_lib() is None or not hasattr(get_lib(), "hprlp_lane_fill_thin"):
        pytest.skip("native library not built")

    rng = np.random.default_rng(11)
    n = 260_000
    m_pad, n_pad = 4096, 2 * WINDOW
    rows_p = rng.integers(0, m_pad, size=n).astype(np.int64)
    cols_p = rng.integers(0, n_pad, size=n).astype(np.int64)
    # Dedup (row, col) pairs: the schedulers assume summed duplicates.
    key = rows_p * np.int64(n_pad) + cols_p
    _, idx = np.unique(key, return_index=True)
    rows_p, cols_p = rows_p[idx], cols_p[idx]
    vals = rng.normal(size=len(rows_p))
    assert len(rows_p) >= 200_000

    for sched, kw in ((schedule_lane_ell, {}), (schedule_thin,
                                                {"phi": 4})):
        t_nat = sched(rows_p, cols_p, vals, m_pad, n_pad, **kw)
        t_py = sched(rows_p, cols_p, vals, m_pad, n_pad,
                     with_cols=True, **kw)
        assert t_py["cols"] is not None  # numpy path ran
        for k in ("idx1t", "idx2", "invt"):
            if t_py.get(k) is None:
                assert t_nat.get(k) is None
                continue
            np.testing.assert_array_equal(t_nat[k], t_py[k], err_msg=k)
        np.testing.assert_array_equal(t_nat["vals"],
                                      t_py["vals"].astype(np.float64))
