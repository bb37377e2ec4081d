"""Batched shared-A solver tests (parity surface: reference
src/batched_solver.cu solve_batched + bindings solve_batched)."""

import numpy as np
import pytest
import scipy.sparse as sp
from scipy.optimize import linprog

from hprlp_tpu import Parameters, solve_batched

TOL = 1e-4


def quiet(**kw):
    return Parameters(verbose=False, **kw)


def reference_solve(A, AL, AU, l, u, c):
    """SciPy linprog oracle for one member (two-sided rows split)."""
    A = sp.csr_matrix(A)
    rows_ub = []
    b_ub = []
    rows_eq = []
    b_eq = []
    for i in range(A.shape[0]):
        ai = A.getrow(i).toarray().ravel()
        if AL[i] == AU[i]:
            rows_eq.append(ai)
            b_eq.append(AL[i])
            continue
        if np.isfinite(AU[i]):
            rows_ub.append(ai)
            b_ub.append(AU[i])
        if np.isfinite(AL[i]):
            rows_ub.append(-ai)
            b_ub.append(-AL[i])
    res = linprog(c,
                  A_ub=np.array(rows_ub) if rows_ub else None,
                  b_ub=np.array(b_ub) if b_ub else None,
                  A_eq=np.array(rows_eq) if rows_eq else None,
                  b_eq=np.array(b_eq) if b_eq else None,
                  bounds=list(zip(l, u)), method="highs")
    return res


class TestBatched:
    def test_demo_lp_batch_of_scaled_copies(self):
        """B copies of the 2x2 demo LP with scaled costs: member k minimises
        k+1 times the base objective, so obj_k = (k+1) * -26.4."""
        A = np.array([[1.0, 2.0], [3.0, 1.0]])
        B = 4
        scale = np.arange(1, B + 1, dtype=float)
        C = np.outer([-3.0, -5.0], scale)
        AL = np.full((2, B), -np.inf)
        AU = np.tile(np.array([10.0, 12.0])[:, None], (1, B))
        l = np.zeros((2, B))
        u = np.full((2, B), np.inf)
        out = solve_batched(A, C, AL, AU, l, u, params=quiet())
        assert out.batch_size == B
        assert all(s == "OPTIMAL" for s in out.status)
        for k in range(B):
            assert out.primal_obj[k] == pytest.approx(-26.4 * (k + 1),
                                                      rel=1e-2)
            np.testing.assert_allclose(out.x[:, k], [2.8, 3.6], atol=0.05)

    def test_batch_vs_linprog_random(self):
        rng = np.random.default_rng(7)
        m, n, B = 12, 18, 5
        A = sp.random(m, n, density=0.4, random_state=rng,
                      data_rvs=lambda k: rng.normal(size=k)).tocsr()
        C = rng.normal(size=(n, B))
        x0 = rng.uniform(-1, 1, size=(n, B))
        Ax = A @ x0
        AL = Ax - rng.uniform(0.2, 1.5, size=(m, B))
        AU = Ax + rng.uniform(0.2, 1.5, size=(m, B))
        l = x0 - rng.uniform(0.5, 2.0, size=(n, B))
        u = x0 + rng.uniform(0.5, 2.0, size=(n, B))
        out = solve_batched(A, C, AL, AU, l, u,
                            params=quiet(stop_tol=1e-6))
        for k in range(B):
            ref = reference_solve(A, AL[:, k], AU[:, k], l[:, k], u[:, k],
                                  C[:, k])
            assert ref.status == 0
            assert out.status[k] == "OPTIMAL"
            assert out.primal_obj[k] == pytest.approx(
                ref.fun, rel=1e-3, abs=1e-3)

    def test_obj_constants(self):
        A = np.array([[1.0]])
        C = np.array([[1.0, 1.0]])
        AL = np.array([[0.0, 0.0]])
        AU = np.array([[np.inf, np.inf]])
        l = np.array([[2.0, 3.0]])
        u = np.array([[np.inf, np.inf]])
        out = solve_batched(A, C, AL, AU, l, u,
                            obj_constants=np.array([10.0, -10.0]),
                            params=quiet())
        assert out.primal_obj[0] == pytest.approx(12.0, abs=1e-2)
        assert out.primal_obj[1] == pytest.approx(-7.0, abs=1e-2)

    def test_shape_validation(self):
        A = np.eye(2)
        with pytest.raises(ValueError):
            solve_batched(A, np.zeros((2, 3)), np.zeros((2, 2)),
                          np.zeros((2, 3)), np.zeros((2, 3)),
                          np.zeros((2, 3)), params=quiet())

    def test_infeasible_bounds_raise(self):
        A = np.eye(1)
        with pytest.raises(ValueError):
            solve_batched(A, np.ones((1, 2)), np.ones((1, 2)),
                          -np.ones((1, 2)), np.zeros((1, 2)),
                          np.ones((1, 2)), params=quiet())

    def test_iter_limit_status(self):
        rng = np.random.default_rng(3)
        m, n, B = 8, 10, 2
        A = sp.random(m, n, density=0.5, random_state=rng).tocsr()
        x0 = rng.uniform(-1, 1, size=(n, B))
        Ax = A @ x0
        out = solve_batched(A, rng.normal(size=(n, B)),
                            Ax - 0.5, Ax + 0.5, x0 - 1, x0 + 1,
                            params=quiet(max_iter=4, stop_tol=1e-14))
        assert all(s in ("ITER_LIMIT", "OPTIMAL") for s in out.status)
        assert any(s == "ITER_LIMIT" for s in out.status)
