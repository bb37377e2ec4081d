"""Unit tests for the bucketed-ELL sparse format."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from hprlp_tpu.ops.device_problem import build_device_problem, to_dense
from hprlp_tpu.ops.sparse import (plan_buckets, row_counts, row_inf_norms,
                                  row_one_norms, scale_cols, scale_rows,
                                  spmm, spmv)
from hprlp_tpu.problem import LpProblem

from conftest import random_lp


def _random_csr(seed, m=50, n=70, density=0.15):
    rng = np.random.default_rng(seed)
    return sp.random(m, n, density=density, random_state=rng,
                     data_rvs=lambda k: rng.normal(size=k)).tocsr()


def _lp_of(A):
    m, n = A.shape
    return LpProblem.from_arrays(A, -np.ones(m), np.ones(m),
                                 np.zeros(n), np.ones(n), np.ones(n))


def test_plan_buckets_covers_all_rows():
    nnz = np.array([0, 1, 3, 5, 17, 100, 4, 4, 2])
    plan = plan_buckets(nnz, min_width=4, min_bucket_rows=2)
    all_rows = np.sort(np.concatenate([rows for _, rows in plan]))
    assert np.array_equal(all_rows, np.arange(len(nnz)))
    for w, rows in plan:
        assert np.all(nnz[rows] <= w)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_build_roundtrip_dense(seed):
    A = _random_csr(seed, m=30, n=40)
    lp, maps = build_device_problem(_lp_of(A), dtype=jnp.float64,
                                    vec_multiple=8)
    D = to_dense(lp.A)
    DT = to_dense(lp.AT)
    # Padded dense equals original at the (row_pos, col_pos) submatrix.
    ref = A.toarray()
    np.testing.assert_allclose(D[np.ix_(maps.row_pos, maps.col_pos)], ref)
    np.testing.assert_allclose(DT[np.ix_(maps.col_pos, maps.row_pos)], ref.T)
    # And zero everywhere rows/cols are padding.
    mask_r = np.ones(lp.m, bool)
    mask_r[maps.row_pos] = False
    assert np.all(D[mask_r] == 0)


@pytest.mark.parametrize("seed", [3, 4])
def test_spmv_matches_scipy(seed):
    A = _random_csr(seed, m=123, n=87, density=0.2)
    lp, maps = build_device_problem(_lp_of(A), dtype=jnp.float64,
                                    vec_multiple=8)
    rng = np.random.default_rng(seed)
    x = rng.normal(size=A.shape[1])
    x_pad = np.zeros(lp.n)
    x_pad[maps.col_pos] = x
    y = np.asarray(spmv(lp.A, jnp.asarray(x_pad)))
    np.testing.assert_allclose(y[maps.row_pos], A @ x, rtol=1e-12, atol=1e-12)

    yv = rng.normal(size=A.shape[0])
    y_pad = np.zeros(lp.m)
    y_pad[maps.row_pos] = yv
    z = np.asarray(spmv(lp.AT, jnp.asarray(y_pad)))
    np.testing.assert_allclose(z[maps.col_pos], A.T @ yv, rtol=1e-12,
                               atol=1e-12)


def test_spmm_matches_scipy():
    A = _random_csr(7, m=40, n=30)
    lp, maps = build_device_problem(_lp_of(A), dtype=jnp.float64,
                                    vec_multiple=8)
    rng = np.random.default_rng(7)
    X = rng.normal(size=(A.shape[1], 5))
    X_pad = np.zeros((lp.n, 5))
    X_pad[maps.col_pos] = X
    Y = np.asarray(spmm(lp.A, jnp.asarray(X_pad)))
    np.testing.assert_allclose(Y[maps.row_pos], A @ X, rtol=1e-12, atol=1e-12)


def test_row_norms_and_counts():
    A = _random_csr(9, m=25, n=25)
    lp, maps = build_device_problem(_lp_of(A), dtype=jnp.float64,
                                    vec_multiple=8)
    inf_n = np.asarray(row_inf_norms(lp.A))[maps.row_pos]
    one_n = np.asarray(row_one_norms(lp.A))[maps.row_pos]
    cnt = np.asarray(row_counts(lp.A))[maps.row_pos]
    ref = np.abs(A.toarray())
    np.testing.assert_allclose(inf_n, ref.max(axis=1), rtol=1e-12)
    np.testing.assert_allclose(one_n, ref.sum(axis=1), rtol=1e-12)
    np.testing.assert_array_equal(cnt, (ref > 0).sum(axis=1))


def test_scaling_ops():
    A = _random_csr(11, m=20, n=20)
    lp, maps = build_device_problem(_lp_of(A), dtype=jnp.float64,
                                    vec_multiple=8)
    rng = np.random.default_rng(11)
    r = jnp.asarray(rng.uniform(0.5, 2.0, lp.m))
    c = jnp.asarray(rng.uniform(0.5, 2.0, lp.n))
    S = to_dense(scale_cols(scale_rows(lp.A, r), c))
    ref = np.diag(np.asarray(r)) @ to_dense(lp.A) @ np.diag(np.asarray(c))
    np.testing.assert_allclose(S, ref, rtol=1e-12, atol=1e-12)


class TestWindowMajorLayout:
    """Invariants of the window-major LaneELL layout
    (device_problem._layout_windows): positions valid and unique, width
    buckets preserved, window boundaries aligned, SpMV exact."""

    def _mk(self, seed, m, n, nnz_per_row):
        import scipy.sparse as sp

        from hprlp_tpu.problem import LpProblem

        rng = np.random.default_rng(seed)
        rows = np.repeat(np.arange(m), nnz_per_row)
        cols = rng.integers(0, n, size=m * nnz_per_row)
        vals = rng.normal(size=m * nnz_per_row)
        A = sp.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsr()
        A.sum_duplicates()
        x = rng.uniform(-1, 1, n)
        return LpProblem.from_arrays(A, A @ x - 1, A @ x + 1, x - 2,
                                     x + 2, rng.normal(size=n))

    @pytest.mark.parametrize("row_multiple", [8, 24])
    def test_multiwindow_layout_invariants(self, row_multiple):
        from hprlp_tpu.ops.device_problem import build_device_problem
        from hprlp_tpu.ops.lane_ell import WINDOW
        from hprlp_tpu.ops.sparse import spmv

        # n spans 3+ windows; m spans 2+ (WINDOW = 16384).
        prob = self._mk(5, 2 * WINDOW + 1000, 3 * WINDOW + 500, 6)
        lp, maps = build_device_problem(prob, row_multiple=row_multiple)
        for pos, size in ((maps.row_pos, lp.A.nrows),
                          (maps.col_pos, lp.A.ncols)):
            assert pos.min() >= 0 and pos.max() < size
            assert len(np.unique(pos)) == len(pos)
        # Bucket widths still fit every member's nnz.
        for M, nnz_per in ((lp.A, np.diff(prob.A.indptr)),
                           (lp.AT, np.diff(prob.A.T.tocsr().indptr))):
            for b in M.buckets:
                counts = np.asarray(b.valid).sum(axis=1)
                assert counts.max() <= b.width
        # SpMV exact against scipy through the maps.
        rng = np.random.default_rng(0)
        x = rng.normal(size=prob.n)
        xp = np.zeros(lp.A.ncols)
        xp[maps.col_pos] = x
        y = np.asarray(spmv(lp.A, jnp.asarray(xp, jnp.float32)))
        ref = prob.A @ x
        scale = np.abs(ref).max()
        assert np.abs(y[maps.row_pos] - ref).max() / scale < 1e-5
        yv = rng.normal(size=prob.m)
        yp = np.zeros(lp.AT.ncols)
        yp[maps.row_pos] = yv
        z = np.asarray(spmv(lp.AT, jnp.asarray(yp, jnp.float32)))
        refT = prob.A.T @ yv
        scale = np.abs(refT).max()
        assert np.abs(z[maps.col_pos] - refT).max() / scale < 1e-5

    def test_shard_multiple_divisibility_kept_on_mesh_layout(self):
        """row_multiple > 8 (mesh layouts) keeps every bucket's padded
        row count divisible by row_multiple."""
        from hprlp_tpu.ops.device_problem import build_device_problem
        from hprlp_tpu.ops.lane_ell import WINDOW

        prob = self._mk(6, WINDOW + 700, 2 * WINDOW + 300, 5)
        lp, _ = build_device_problem(prob, row_multiple=16)
        for M in (lp.A, lp.AT):
            for b in M.buckets:
                assert b.nrows % 16 == 0 or b.row_start + b.nrows == M.nrows


def test_skewed_degree_layout_overhead():
    """Power-law row/column degrees (realistic LPs) must not blow up the
    LaneELL schedule: slot overhead stays bounded and SpMV stays exact."""
    import scipy.sparse as sp

    from hprlp_tpu.ops.device_problem import build_device_problem
    from hprlp_tpu.ops.lane_ell import WINDOW, schedule_lane_ell
    from hprlp_tpu.ops.sparse import spmv, to_coo
    from hprlp_tpu.problem import LpProblem

    rng = np.random.default_rng(11)
    m, n = 3000, 2 * WINDOW + 500
    # Zipf-ish degrees: most rows tiny, a few hundreds wide.
    deg = np.minimum((rng.zipf(1.7, m) * 3), 400)
    rows = np.repeat(np.arange(m), deg)
    cols = rng.integers(0, n, size=len(rows))
    A = sp.coo_matrix((rng.normal(size=len(rows)), (rows, cols)),
                      shape=(m, n)).tocsr()
    A.sum_duplicates()
    x0 = rng.uniform(-1, 1, n)
    prob = LpProblem.from_arrays(A, A @ x0 - 1, A @ x0 + 1, x0 - 2,
                                 x0 + 2, rng.normal(size=n))
    lp, maps = build_device_problem(prob)
    r, c, v = to_coo(lp.A)
    t = schedule_lane_ell(r, c, v, lp.A.nrows, lp.A.ncols)
    slots = t["idx2"].shape[0] * 16384
    assert slots <= 12 * A.nnz + 6 * 16384, (slots, A.nnz)
    x = rng.normal(size=n)
    xp = np.zeros(lp.A.ncols)
    xp[maps.col_pos] = x
    y = np.asarray(spmv(lp.A, jnp.asarray(xp, jnp.float32)))
    ref = A @ x
    scale = max(1.0, np.abs(ref).max())
    assert np.abs(y[maps.row_pos] - ref).max() / scale < 1e-5
