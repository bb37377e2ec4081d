"""Native library tests: C++ MPS reader vs Python golden reader, and the
C++ presolver (reductions, postsolve exactness, KKT of recovered duals)."""

import gzip
import os

import numpy as np
import pytest
import scipy.sparse as sp

from hprlp_tpu.io.mps import read_mps
from hprlp_tpu.io.native_mps import is_available as mps_native_available
from hprlp_tpu.io.native_mps import read_mps_native
from hprlp_tpu.presolve import (is_available as presolve_available,
                                presolve_problem)
from hprlp_tpu.problem import LpProblem

pytestmark = pytest.mark.skipif(
    not (mps_native_available() and presolve_available()),
    reason="native library not built")


# ---------------------------------------------------------------------------
# MPS reader: native vs Python golden
# ---------------------------------------------------------------------------

SAMPLES = {
    "basic": """\
NAME          T1
ROWS
 N  OBJ
 L  C1
 G  C2
 E  C3
COLUMNS
    X1        OBJ       1.5        C1        1.0
    X1        C2        2.0        C3        1.0
    X2        OBJ       -2.0       C1        3.0
    X2        C3        -1.0
RHS
    R         C1        10.0       C2        2.0
    R         C3        4.0
BOUNDS
 UP B         X1        8.0
 MI B         X2
ENDATA
""",
    "ranges": """\
NAME
ROWS
 N  OBJ
 L  CL
 G  CG
 E  CE1
 E  CE2
COLUMNS
    X         OBJ       1.0        CL        1.0
    X         CG        1.0        CE1       1.0
    X         CE2       1.0
RHS
    R         CL        5.0        CG        1.0
    R         CE1       3.0        CE2       3.0
RANGES
    RNG       CL        4.0        CG        2.0
    RNG       CE1       1.5        CE2       -1.5
ENDATA
""",
    "objsense_max": """\
NAME
OBJSENSE
    MAX
ROWS
 N  OBJ
 L  C1
COLUMNS
    X1        OBJ       3.0        C1        1.0
RHS
    R         C1        7.0
ENDATA
""",
    "dups_and_markers": """\
* comment line
NAME          DUP
ROWS
 N  OBJ
 L  C1
COLUMNS
    MARKER1   'MARKER'  'INTORG'
    X1        C1        1.0        C1        2.0
    X1        OBJ       1.0
    MARKER2   'MARKER'  'INTEND'
    X2        C1        4.0        OBJ       0.5
RHS
    R         C1        9.0
BOUNDS
 UP B         X2        -3.0
ENDATA
""",
    "obj_rhs_constant": """\
NAME
ROWS
 N  OBJ
 G  C1
COLUMNS
    X1        OBJ       2.0        C1        1.0
RHS
    R         OBJ       5.0        C1        1.0
ENDATA
""",
}


def _write(tmp_path, text, name="t.mps"):
    p = os.path.join(str(tmp_path), name)
    with open(p, "w") as f:
        f.write(text)
    return p


def assert_problems_equal(a: LpProblem, b: LpProblem):
    assert a.m == b.m and a.n == b.n and a.nnz == b.nnz
    np.testing.assert_array_equal(a.A.indptr, b.A.indptr)
    np.testing.assert_array_equal(a.A.indices, b.A.indices)
    np.testing.assert_allclose(a.A.data, b.A.data, rtol=0, atol=0)
    for f in ("AL", "AU", "l", "u", "c"):
        np.testing.assert_allclose(getattr(a, f), getattr(b, f))
    assert a.obj_constant == b.obj_constant
    assert a.objective_sense == b.objective_sense


@pytest.mark.parametrize("key", sorted(SAMPLES))
def test_native_matches_python(tmp_path, key):
    p = _write(tmp_path, SAMPLES[key])
    assert_problems_equal(read_mps_native(p), read_mps(p))


def test_native_gzip(tmp_path):
    p = os.path.join(str(tmp_path), "t.mps.gz")
    with gzip.open(p, "wt") as f:
        f.write(SAMPLES["basic"])
    plain = _write(tmp_path, SAMPLES["basic"])
    assert_problems_equal(read_mps_native(p), read_mps(plain))


def test_native_demo_file():
    prob = read_mps_native("data/model.mps")
    gold = read_mps("data/model.mps")
    assert_problems_equal(prob, gold)


def test_native_missing_file():
    with pytest.raises(ValueError):
        read_mps_native("/nonexistent/x.mps")


def test_native_quadobj(tmp_path):
    txt = SAMPLES["basic"].replace("ENDATA", "QUADOBJ\n    X1 X1 2.0\nENDATA")
    p = _write(tmp_path, txt)
    with pytest.raises(ValueError):
        read_mps_native(p)
    prob = read_mps_native(p, ignore_quadobj=True)
    assert prob.n == 2


# ---------------------------------------------------------------------------
# Presolver
# ---------------------------------------------------------------------------

def _pp(A, AL, AU, l, u, c):
    return LpProblem.from_arrays(sp.csr_matrix(np.asarray(A, float)),
                                 AL, AU, l, u, c)


def _check_postsolve(problem, reduced, handle, tol=1e-7):
    """Solve the reduced problem exactly with linprog, postsolve, check the
    original-space KKT of (x, y, z)."""
    from tests.test_batched import reference_solve

    if reduced.n > 0:
        ref = reference_solve(reduced.A, reduced.AL, reduced.AU, reduced.l,
                              reduced.u, reduced.c)
        assert ref.status == 0
        x_red = ref.x
        # linprog marginals: eqlin/ineqlin give duals; easier to recover
        # via our solver — instead use the HPR solver on the reduced LP.
        from hprlp_tpu.params import Parameters
        from hprlp_tpu.solver.loop import solve_problem

        res = solve_problem(reduced, Parameters(verbose=False,
                                                stop_tol=1e-9,
                                                use_presolve=False))
        x_red, y_red, z_red = res.x, res.y, res.z
    else:
        x_red = np.zeros(0)
        y_red = np.zeros(0)
        z_red = np.zeros(0)
    x, y, z = handle.postsolve(x_red, y_red, z_red)
    m = problem.kkt_error(x, y, z)
    assert m["kkt"] < tol, m
    return x, y, z, m


class TestPresolveReductions:
    def test_singleton_row_becomes_bound(self):
        # Row 1:  x0 <= 4  is a singleton -> becomes a variable bound.
        # The optimal face is {x0 + x1 = 10, 0 <= x0 <= 4}; only the
        # objective is unique.  Postsolve KKT must hold including the
        # removed row's recovered dual.
        prob = _pp([[1.0, 1.0], [1.0, 0.0]],
                   [-np.inf, -np.inf], [10.0, 4.0],
                   [0.0, 0.0], [np.inf, np.inf], [-1.0, -1.0])
        status, red, h = presolve_problem(prob)
        assert status == "OK"
        assert red.m <= 1  # singleton row removed
        x, y, z, m = _check_postsolve(prob, red, h, tol=1e-5)
        assert prob.c @ x == pytest.approx(-10.0, abs=1e-4)
        assert x[0] <= 4.0 + 1e-6

    def test_fixed_col_substitution(self):
        prob = _pp([[2.0, 1.0]], [-np.inf], [8.0],
                   [3.0, 0.0], [3.0, np.inf], [1.0, -1.0])
        status, red, h = presolve_problem(prob)
        assert status == "OK"
        # x0 fixed at 3 shifts the row to x1 <= 2; the then-singleton row
        # becomes a bound and the empty column resolves at its upper bound:
        # the whole problem presolves away.
        assert red.n == 0
        x, y, z, m = _check_postsolve(prob, red, h, tol=1e-6)
        np.testing.assert_allclose(x, [3.0, 2.0])

    def test_free_singleton_col(self):
        # x1 free, appears only in row 0 (equality-ish through cost push).
        prob = _pp([[1.0, 1.0], [1.0, 0.0]],
                   [2.0, -np.inf], [2.0, 5.0],
                   [0.0, -np.inf], [np.inf, np.inf], [1.0, 2.0])
        status, red, h = presolve_problem(prob)
        assert status == "OK"
        # x1 substituted out, row 0 removed.
        assert red.n <= 1 and red.m <= 1
        x, y, z, m = _check_postsolve(prob, red, h, tol=1e-5)
        assert x[0] + x[1] == pytest.approx(2.0, abs=1e-5)

    def test_empty_col_cost_sign(self):
        prob = _pp([[1.0, 0.0]], [-np.inf], [5.0],
                   [0.0, -1.0], [np.inf, 7.0], [1.0, -2.0])
        status, red, h = presolve_problem(prob)
        assert status == "OK"
        x, y, z, m = _check_postsolve(prob, red, h, tol=1e-5)
        assert x[1] == pytest.approx(7.0)  # c < 0 -> upper bound
        assert z[1] == pytest.approx(-2.0)

    def test_parallel_rows_merged(self):
        prob = _pp([[1.0, 2.0], [2.0, 4.0], [1.0, 0.0]],
                   [-np.inf, -np.inf, 0.0], [10.0, 12.0, 4.0],
                   [0.0, 0.0], [np.inf, np.inf], [-1.0, -1.0])
        status, red, h = presolve_problem(prob)
        assert status == "OK"
        st = h.stats()
        assert st["rows_removed"] >= 1  # one of the parallel pair
        _check_postsolve(prob, red, h, tol=1e-5)

    def test_forcing_row(self):
        # Row 0: x0 + x1 >= 2 with u = (1, 1): maxact == AL -> both forced up.
        prob = _pp([[1.0, 1.0]], [2.0], [np.inf],
                   [0.0, 0.0], [1.0, 1.0], [3.0, 5.0])
        status, red, h = presolve_problem(prob)
        assert status == "OK"
        assert red.n == 0 and red.m == 0
        x, y, z, m = _check_postsolve(prob, red, h, tol=1e-6)
        np.testing.assert_allclose(x, [1.0, 1.0])
        # Dual: y >= max(c_k / a_k) keeps z signs valid at upper bounds.
        assert y[0] >= 5.0 - 1e-9

    def test_infeasible_detection(self):
        prob = _pp([[1.0]], [5.0], [np.inf], [0.0], [2.0], [1.0])
        status, red, h = presolve_problem(prob)
        assert status == "INFEASIBLE"

    def test_unbounded_detection(self):
        # Empty col with negative cost and infinite upper bound.
        prob = _pp([[1.0, 0.0]], [-np.inf], [5.0],
                   [0.0, 0.0], [np.inf, np.inf], [1.0, -1.0])
        status, red, h = presolve_problem(prob)
        assert status == "UNBOUNDED"


class TestPresolveEquivalence:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_random_lp_same_optimum(self, seed):
        from tests.conftest import random_lp
        from tests.test_batched import reference_solve

        prob = random_lp(seed, m=25, n=35, density=0.25)
        status, red, h = presolve_problem(prob)
        assert status == "OK"
        ref = reference_solve(prob.A, prob.AL, prob.AU, prob.l, prob.u,
                              prob.c)
        assert ref.status == 0
        x, y, z, m = _check_postsolve(prob, red, h, tol=2e-5)
        assert prob.c @ x == pytest.approx(ref.fun, rel=1e-4, abs=1e-4)

    def test_end_to_end_model_solve_with_presolve(self):
        """Full pipeline through Model.solve (presolve on by default)."""
        from hprlp_tpu import Model, Parameters

        A = sp.csr_matrix(np.array([[1.0, 2.0], [3.0, 1.0], [1.0, 0.0]]))
        prob = LpProblem.from_arrays(
            A, [-np.inf, -np.inf, 0.0], [10.0, 12.0, 100.0],
            [0.0, 0.0], [np.inf, np.inf], [-3.0, -5.0])
        res = Model(prob).solve(Parameters(verbose=False))
        assert res.status == "OPTIMAL"
        assert res.primal_obj == pytest.approx(-26.4, abs=1e-2)
        np.testing.assert_allclose(res.x, [2.8, 3.6], atol=0.02)

    def test_presolve_off_matches_on(self):
        from hprlp_tpu import Model, Parameters
        from tests.conftest import random_lp

        prob = random_lp(11, m=20, n=30, density=0.3)
        r_on = Model(prob).solve(Parameters(verbose=False, stop_tol=1e-6))
        r_off = Model(prob).solve(Parameters(verbose=False, stop_tol=1e-6,
                                             use_presolve=False))
        assert r_on.status == r_off.status == "OPTIMAL"
        assert r_on.primal_obj == pytest.approx(r_off.primal_obj, rel=1e-3,
                                                abs=1e-3)


class TestDoubletonEq:
    def test_substitution_and_duals(self):
        # Row 0: x0 + x1 = 4 (doubleton eq); row 1: x0 + x2 <= 5.
        prob = _pp([[1.0, 1.0, 0.0], [1.0, 0.0, 1.0]],
                   [4.0, -np.inf], [4.0, 5.0],
                   [0.0, 0.0, 0.0], [np.inf, np.inf, np.inf],
                   [1.0, 2.0, -1.0])
        status, red, h = presolve_problem(prob)
        assert status == "OK"
        st = h.stats()
        assert st["rows_removed"] >= 1 and st["cols_removed"] >= 1
        x, y, z, m = _check_postsolve(prob, red, h, tol=1e-5)
        assert x[0] + x[1] == pytest.approx(4.0, abs=1e-6)

    def test_bound_translation(self):
        # x1 in [1, 3] translates through 2 x0 + x1 = 10 to x0 in [3.5, 4.5].
        prob = _pp([[2.0, 1.0], [1.0, 0.0]],
                   [10.0, -np.inf], [10.0, 100.0],
                   [-np.inf, 1.0], [np.inf, 3.0], [1.0, 0.5])
        status, red, h = presolve_problem(prob)
        assert status == "OK"
        x, y, z, m = _check_postsolve(prob, red, h, tol=1e-5)
        assert 1.0 - 1e-6 <= x[1] <= 3.0 + 1e-6
        assert 2 * x[0] + x[1] == pytest.approx(10.0, abs=1e-6)

    @pytest.mark.parametrize("seed", [10, 11, 12])
    def test_random_with_equalities(self, seed):
        from tests.conftest import random_lp
        from tests.test_batched import reference_solve

        prob = random_lp(seed, m=30, n=40, density=0.15)
        # random_lp already mixes equality rows (kind==3).
        ref = reference_solve(prob.A, prob.AL, prob.AU, prob.l, prob.u,
                              prob.c)
        status, red, h = presolve_problem(prob)
        if ref.status == 3:
            # Genuinely unbounded instance: the presolver may detect it.
            assert status in ("OK", "UNBOUNDED")
            return
        assert ref.status == 0
        assert status == "OK"
        x, y, z, m = _check_postsolve(prob, red, h, tol=2e-5)
        assert prob.c @ x == pytest.approx(ref.fun, rel=1e-4, abs=1e-4)


class TestParallelCols:
    def test_merge_and_split(self):
        # x1's column = 2 * x0's column, costs in the same ratio.
        prob = _pp([[1.0, 2.0, 1.0], [2.0, 4.0, 0.0]],
                   [-np.inf, -np.inf], [10.0, 12.0],
                   [0.0, 0.0, 0.0], [4.0, 3.0, np.inf],
                   [-1.0, -2.0, -5.0])
        status, red, h = presolve_problem(prob)
        assert status == "OK"
        assert h.stats()["cols_removed"] >= 1
        x, y, z, m = _check_postsolve(prob, red, h, tol=1e-5)
        assert 0.0 - 1e-8 <= x[0] <= 4.0 + 1e-8
        assert 0.0 - 1e-8 <= x[1] <= 3.0 + 1e-8

    def test_negative_ratio(self):
        prob = _pp([[1.0, -1.0], [1.0, -1.0]],
                   [-np.inf, -np.inf], [5.0, 5.0],
                   [0.0, -2.0], [3.0, 2.0], [1.0, -1.0])
        status, red, h = presolve_problem(prob)
        assert status == "OK"
        x, y, z, m = _check_postsolve(prob, red, h, tol=1e-5)

    def test_cost_mismatch_not_merged(self):
        # Same sparsity ratio but costs break the ratio -> no merge.
        A = [[1.0, 2.0], [3.0, 6.0]]
        prob = _pp(A, [-np.inf, -np.inf], [4.0, 13.0],
                   [0.0, 0.0], [10.0, 10.0], [-1.0, -5.0])
        status, red, h = presolve_problem(prob)
        assert status == "OK"
        x, y, z, m = _check_postsolve(prob, red, h, tol=1e-5)


class TestPrimalPropagation:
    def test_implied_fixing(self):
        # Row: x0 + x1 <= 2 with l = (1, 1): slack forces both to their
        # lower bounds.
        prob = _pp([[1.0, 1.0]], [-np.inf], [2.0],
                   [1.0, 1.0], [5.0, 5.0], [-1.0, -2.0])
        status, red, h = presolve_problem(prob)
        assert status == "OK"
        assert red.n == 0  # everything fixed
        x, y, z, m = _check_postsolve(prob, red, h, tol=1e-6)
        np.testing.assert_allclose(x, [1.0, 1.0])

    def test_propagation_infeasible(self):
        # x0 + x1 <= 1 with l = (1, 1): rest_min forces iu < l.
        prob = _pp([[1.0, 1.0]], [-np.inf], [1.0],
                   [1.0, 1.0], [5.0, 5.0], [1.0, 1.0])
        status, red, h = presolve_problem(prob)
        assert status == "INFEASIBLE"


class TestImpliedFreeSingleton:
    def test_implied_free_substituted(self):
        # x1 in [0, 10] appears only in row 0: x0 + x1 = 4 with x0 in
        # [0, 3]: implied x1 in [1, 4] subset of [0, 10] -> implied free.
        prob = _pp([[1.0, 1.0], [1.0, 0.0]],
                   [4.0, 0.0], [4.0, 3.0],
                   [0.0, 0.0], [3.0, 10.0], [1.0, 2.0])
        status, red, h = presolve_problem(prob)
        assert status == "OK"
        st = h.stats()
        assert st["cols_removed"] >= 1
        x, y, z, m = _check_postsolve(prob, red, h, tol=1e-5)
        assert x[0] + x[1] == pytest.approx(4.0, abs=1e-6)
        assert 0.0 - 1e-6 <= x[1] <= 10.0 + 1e-6

    def test_one_sided_goes_eq_to_ineq(self):
        # Implied range [1, 4] covers x1's lower bound but NOT its upper
        # bound [0, 2]: the full substitution is invalid, but the one-sided
        # eq->ineq conversion still removes x1 (the equality becomes
        # x0 >= 2, enforcing x1 <= 2 through the equation).
        prob = _pp([[1.0, 1.0]],
                   [4.0], [4.0],
                   [0.0, 0.0], [3.0, 2.0], [1.0, 2.0])
        status, red, h = presolve_problem(prob)
        assert status == "OK"
        x, y, z, m = _check_postsolve(prob, red, h, tol=1e-5)
        assert x[1] <= 2.0 + 1e-6
        assert x[0] + x[1] == pytest.approx(4.0, abs=1e-6)


class TestEqToIneq:
    """One-sided implied-free singleton columns in equality rows relax the
    equality to an inequality (parity: PSLP process_colston_eq +
    EQ_TO_INEQ postsolve, src/explorers/StonCols.c:34-222,
    src/core/Postsolver.c:476-480)."""

    def test_lower_bound_survives(self):
        # x1 in [0, inf) only in row 0: x0 + x1 = 2, x0 in [-3, 3] implies
        # x1 in [-1, 5]: free from above only.  Conversion: x0 <= 2.
        # Optimum of min(-x0 + x1): x0 = 2, x1 = 0, y0 = -1, z1 = 2.
        prob = _pp([[1.0, 1.0], [1.0, 0.0]],
                   [2.0, -3.0], [2.0, 3.0],
                   [-np.inf, 0.0], [np.inf, np.inf], [-1.0, 1.0])
        status, red, h = presolve_problem(prob, debug_checks=True)
        assert status == "OK"
        assert h.stats()["cols_removed"] >= 1
        x, y, z, m = _check_postsolve(prob, red, h, tol=1e-5)
        assert x[0] == pytest.approx(2.0, abs=1e-5)
        assert x[1] == pytest.approx(0.0, abs=1e-5)
        assert y[0] == pytest.approx(-1.0, abs=1e-4)
        assert z[1] == pytest.approx(2.0, abs=1e-4)

    def test_upper_bound_survives(self):
        # x1 in (-inf, 1] only in row 0: same row implies x1 in [-1, 5]:
        # free from below only.  Conversion: x0 >= 1 (from (2-x0) <= 1).
        prob = _pp([[1.0, 1.0], [1.0, 0.0]],
                   [2.0, -3.0], [2.0, 3.0],
                   [-np.inf, -np.inf], [np.inf, 1.0], [1.0, -1.0])
        status, red, h = presolve_problem(prob, debug_checks=True)
        assert status == "OK"
        assert h.stats()["cols_removed"] >= 1
        x, y, z, m = _check_postsolve(prob, red, h, tol=1e-5)
        # min x0 - x1 = min x0 - (2 - x0) = 2 x0 - 2 over x0 >= 1: x0 = 1.
        assert x[0] == pytest.approx(1.0, abs=1e-5)
        assert x[1] == pytest.approx(1.0, abs=1e-5)

    def test_negative_coefficient(self):
        # a_01 = -2: x0 - 2 x1 = 2 with x1 in [0, inf), x0 in [-3, 3]
        # implies x1 = (x0 - 2)/2 in [-2.5, 0.5]: free from above only.
        # Conversion: x0 - 2*0 >= ... sign flip: AL = 2, AU = inf.
        prob = _pp([[1.0, -2.0], [1.0, 0.0]],
                   [2.0, -3.0], [2.0, 3.0],
                   [-np.inf, 0.0], [np.inf, np.inf], [1.0, 1.0])
        status, red, h = presolve_problem(prob, debug_checks=True)
        assert status == "OK"
        assert h.stats()["cols_removed"] >= 1
        x, y, z, m = _check_postsolve(prob, red, h, tol=1e-5)
        # min x0 + x1 with x1 = (x0-2)/2 >= 0 -> x0 >= 2 -> x0 = 2, x1 = 0.
        assert x[0] == pytest.approx(2.0, abs=1e-5)
        assert x[1] == pytest.approx(0.0, abs=1e-5)

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_random_equality_singletons_duals(self, seed):
        # Random LPs seeded with slack-like singleton columns in equality
        # rows, one-sided bounds: postsolve duals must satisfy original
        # KKT under debug_checks.
        from tests.test_batched import reference_solve

        rng = np.random.default_rng(seed)
        m, n = 12, 18
        A = sp.random(m, n, density=0.4, random_state=rng,
                      data_rvs=lambda k: rng.uniform(0.5, 2.0, k)).tocsr()
        A = A + sp.eye(m, n)  # no empty rows/cols in the core block
        # Append singleton slack columns with one-sided bounds on EQ rows.
        n_slack = 6
        S = sp.lil_matrix((m, n_slack))
        for t in range(n_slack):
            S[t % m, t] = rng.choice([-1.5, 1.0, 2.0])
        A_full = sp.hstack([A.tocsc(), S.tocsc()]).tocsr()
        x_feas = rng.uniform(0.0, 1.0, n + n_slack)
        b = A_full @ x_feas
        AL = b.copy()
        AU = b.copy()
        l = np.full(n + n_slack, -5.0)
        u = np.full(n + n_slack, 6.0)
        # One-sided wide bounds on the slack cols so exactly one side is
        # implied free.
        l[n:] = x_feas[n:] - 100.0
        u[n:] = np.inf
        c = rng.normal(size=n + n_slack)
        prob = LpProblem.from_arrays(A_full, AL, AU, l, u, c)
        ref = reference_solve(prob.A, prob.AL, prob.AU, prob.l, prob.u,
                              prob.c)
        if ref.status != 0:
            pytest.skip("degenerate random instance")
        status, red, h = presolve_problem(prob, debug_checks=True)
        assert status == "OK"
        x, y, z, m_ = _check_postsolve(prob, red, h, tol=2e-5)
        assert prob.c @ x == pytest.approx(ref.fun, rel=1e-4, abs=1e-4)


class TestBoundChangeInstall:
    """Primal propagation now INSTALLS implied bounds with BoundChange
    postsolve records (parity: PSLP BOUND_CHANGE_THE_ROW +
    retrieve_bound_change, src/core/Postsolver.c:350-414)."""

    def test_free_var_gets_bounded_then_dual_exact(self):
        # x1 is free; row 0 (x0 + x1 <= 4, x0 in [0,1]) implies x1 <= 4.
        # With c = (1, -1) the LP pushes x1 to the IMPLIED bound, whose
        # multiplier must be transferred to row 0 in postsolve.
        prob = _pp([[1.0, 1.0], [1.0, 0.0]],
                   [-np.inf, 0.0], [4.0, 1.0],
                   [0.0, -np.inf], [1.0, np.inf], [1.0, -1.0])
        status, red, h = presolve_problem(prob, debug_checks=True)
        assert status == "OK"
        x, y, z, m = _check_postsolve(prob, red, h, tol=1e-5)
        # Optimum: x0 = 0, x1 = 4, obj = -4; row 0 tight with dual -1.
        assert x[1] == pytest.approx(4.0, abs=1e-5)
        assert prob.c @ x == pytest.approx(-4.0, abs=1e-5)

    def test_unbounded_free_var_detected(self):
        # min x1 s.t. x0 - x1 >= -1 (so x1 <= x0 + 1, no lower bound on
        # x1): unbounded below — the presolver must detect it.
        prob = _pp([[1.0, -1.0]],
                   [-1.0], [np.inf],
                   [0.0, -np.inf], [2.0, np.inf], [0.0, 1.0])
        status, red, h = presolve_problem(prob, debug_checks=True)
        assert status == "UNBOUNDED"

    def test_install_lower_bound_from_ge_row(self):
        # Row 0: x0 + x1 >= 3 with x0 in [0, 1] implies x1 >= 2 (installed
        # lower bound on a free variable); c = (0, 1) drives x1 down onto
        # the IMPLIED bound, whose multiplier postsolve transfers to row 0.
        prob = _pp([[1.0, 1.0], [1.0, 0.0]],
                   [3.0, 0.0], [np.inf, 1.0],
                   [0.0, -np.inf], [1.0, np.inf], [0.0, 1.0])
        status, red, h = presolve_problem(prob, debug_checks=True)
        assert status == "OK"
        x, y, z, m = _check_postsolve(prob, red, h, tol=1e-5)
        # Optimum: x0 = 1, x1 = 2, obj = 2.
        assert prob.c @ x == pytest.approx(2.0, abs=1e-5)

    @pytest.mark.parametrize("seed", [15, 20, 27, 39, 55])
    def test_random_lp_with_free_vars_duals(self, seed):
        """Random LPs with some free/one-sided variables: presolve with
        debug_checks on, exact dual recovery through BoundChange replay."""
        from tests.conftest import random_lp
        from tests.test_batched import reference_solve

        rng = np.random.default_rng(seed)
        prob = random_lp(seed, m=25, n=35, density=0.3)
        l = prob.l.copy()
        u = prob.u.copy()
        # Free a third of the variables (drop both bounds), one-side
        # another third.
        idx = rng.permutation(prob.n)
        l[idx[:12]] = -np.inf
        u[idx[:12]] = np.inf
        u[idx[12:23]] = np.inf
        prob2 = LpProblem.from_arrays(prob.A, prob.AL, prob.AU, l, u,
                                      prob.c)
        ref = reference_solve(prob2.A, prob2.AL, prob2.AU, prob2.l,
                              prob2.u, prob2.c)
        if ref.status != 0:
            pytest.skip("randomly generated LP unbounded/infeasible")
        status, red, h = presolve_problem(prob2, debug_checks=True)
        assert status == "OK"
        x, y, z, m = _check_postsolve(prob2, red, h, tol=2e-5)
        assert prob2.c @ x == pytest.approx(ref.fun, rel=1e-4, abs=1e-4)


class TestDebugChecker:
    def test_debug_mode_passes_on_random(self):
        from tests.conftest import random_lp

        for seed in range(5):
            prob = random_lp(seed, m=30, n=40, density=0.2)
            status, red, h = presolve_problem(prob, debug_checks=True)
            assert status in ("OK", "INFEASIBLE", "UNBOUNDED")

    def test_time_budget_respected(self):
        from tests.conftest import random_lp
        import time

        prob = random_lp(3, m=200, n=300, density=0.05)
        t0 = time.time()
        status, red, h = presolve_problem(prob, max_time=0.001)
        # A microscopic budget must still return a valid (possibly
        # unreduced) problem quickly.
        assert time.time() - t0 < 10.0
        assert status in ("OK", "INFEASIBLE", "UNBOUNDED")


class TestFixColInf:
    """Zero-cost columns with zero locks on an infinite bound side are
    'fixed at infinity': rows through them are deleted with zero duals and
    postsolve recovers the least-extreme feasible value (parity: PSLP
    FIXED_COL_INF, src/explorers/Simple_dual_fix.c:78-106)."""

    def test_negative_inf_direction(self):
        # min x0 s.t. x0 - x1 >= 1, x0 in [0, 10], x1 free with c1 = 0:
        # x1's only row has AU = inf so down-locks are 0 -> fix x1 -> -inf,
        # row deleted; x0 then fixes at its lower bound 0.
        prob = _pp([[1.0, -1.0]], [1.0], [np.inf],
                   [0.0, -np.inf], [10.0, np.inf], [1.0, 0.0])
        status, red, h = presolve_problem(prob, debug_checks=True)
        assert status == "OK"
        assert red.n == 0 and red.m == 0
        x, y, z, m = _check_postsolve(prob, red, h, tol=1e-9)
        assert x[0] == pytest.approx(0.0)
        # Least-extreme recovery: x0 - x1 = 1 tight -> x1 = -1.
        assert x[1] == pytest.approx(-1.0)
        assert y[0] == pytest.approx(0.0)
        assert z[1] == pytest.approx(0.0)

    def test_positive_inf_direction(self):
        # min -x0 s.t. x0 + x1 <= 5, x0 in [0, 2], x1 in [0, inf) c1 = 0:
        # x1's row has AL = -inf -> up-locks 0 -> fix x1 -> +inf, row
        # deleted; x0 empty-col fixes at u = 2 (c0 < 0).
        prob = _pp([[1.0, 1.0]], [-np.inf], [5.0],
                   [0.0, 0.0], [2.0, np.inf], [-1.0, 0.0])
        status, red, h = presolve_problem(prob, debug_checks=True)
        assert status == "OK"
        assert red.n == 0
        x, y, z, m = _check_postsolve(prob, red, h, tol=1e-9)
        assert x[0] == pytest.approx(2.0)
        # x1 >= l = 0 and x0 + x1 <= 5 -> least-extreme = max(0, ...) = 0
        # from its own bound (the row imposes x1 <= 3, not a lower req).
        assert 0.0 <= x[1] <= 3.0 + 1e-9
        assert prob.AU[0] - (x[0] + x[1]) >= -1e-9

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_random_with_free_zero_cost_cols(self, seed):
        from tests.test_batched import reference_solve

        rng = np.random.default_rng(seed)
        m, n = 10, 14
        A = (sp.random(m, n, density=0.4, random_state=rng,
                       data_rvs=lambda k: rng.uniform(0.5, 2.0, k))
             + sp.eye(m, n)).tocsr()
        x_feas = rng.uniform(0.0, 1.0, n)
        b = A @ x_feas
        AL = b - rng.uniform(0.1, 1.0, m)
        AU = np.full(m, np.inf)  # one-sided rows: slack-like cols get locks 0
        l = np.full(n, -2.0)
        u = np.full(n, 3.0)
        c = np.abs(rng.normal(size=n)) + 0.1
        # Two zero-cost columns, one-sided bounds, appearing in >= 1 row.
        c[3] = 0.0
        u[3] = np.inf
        c[7] = 0.0
        u[7] = np.inf
        prob = LpProblem.from_arrays(sp.csr_matrix(A), AL, AU, l, u, c)
        ref = reference_solve(prob.A, prob.AL, prob.AU, prob.l, prob.u,
                              prob.c)
        if ref.status != 0:
            pytest.skip("degenerate random instance")
        status, red, h = presolve_problem(prob, debug_checks=True)
        assert status == "OK"
        x, y, z, m_ = _check_postsolve(prob, red, h, tol=2e-5)
        assert prob.c @ x == pytest.approx(ref.fun, rel=1e-4, abs=1e-4)


class TestReductionCompositions:
    """Adversarial presolve compositions: instances designed so MANY
    reduction types fire on overlapping rows/columns (eq->ineq feeding
    singleton rows, FixColInf deleting rows touched by earlier fixes,
    parallel rows among equalities, doubletons) — the typed reverse-replay
    must stay dual-consistent through every interleaving."""

    @pytest.mark.parametrize("seed", list(range(8)))
    def test_kitchen_sink_lp(self, seed):
        from tests.test_batched import reference_solve

        rng = np.random.default_rng(seed)
        m_core, n_core = 14, 18
        A = (sp.random(m_core, n_core, density=0.35, random_state=rng,
                       data_rvs=lambda k: rng.uniform(0.5, 2.0, k))
             + sp.eye(m_core, n_core)).tolil()
        x_feas = rng.uniform(0.0, 1.0, n_core)
        b = A @ x_feas
        AL = list(b.copy())
        AU = list(b.copy())
        kinds = rng.integers(0, 3, m_core)
        for i in range(m_core):
            if kinds[i] == 1:
                AU[i] = np.inf
            elif kinds[i] == 2:
                AL[i] -= rng.uniform(0.5, 2.0)
                AU[i] += rng.uniform(0.5, 2.0)
        l = list(x_feas - rng.uniform(0.2, 2.0, n_core))
        u = list(x_feas + rng.uniform(0.2, 2.0, n_core))
        c = list(rng.normal(size=n_core))

        rows = A.rows  # lil internals appended below via hstack/vstack
        A = A.tocsc().tolil()

        extra_cols = []
        # (a) one-sided slack singletons on EQUALITY rows (eq->ineq).
        for t in range(3):
            i = int(rng.integers(0, m_core))
            AL[i] = AU[i] = float(b[i])  # force equality
            col = np.zeros(m_core)
            col[i] = rng.choice([-1.0, 1.5])
            extra_cols.append(col)
            l.append(x_feas.mean() - 50.0)
            u.append(np.inf)
            c.append(rng.normal())
        # (b) zero-cost free-ish columns with zero locks (FixColInf).
        for t in range(2):
            i = int(rng.integers(0, m_core))
            if AL[i] == AU[i]:
                AU[i] = np.inf  # keep one side open so locks are zero
            col = np.zeros(m_core)
            col[i] = 1.0 if np.isinf(AU[i]) else -1.0
            extra_cols.append(col)
            l.append(-np.inf)
            u.append(np.inf)
            c.append(0.0)
        # (c) duplicate (parallel) rows.
        A_full = sp.hstack([A.tocsc()] +
                           [sp.csc_matrix(cx.reshape(-1, 1))
                            for cx in extra_cols]).tocsr()
        dup_of = int(rng.integers(0, m_core))
        dup_row = A_full[dup_of].multiply(2.0)
        A_full = sp.vstack([A_full, dup_row]).tocsr()
        AL.append(2.0 * AL[dup_of] if np.isfinite(AL[dup_of]) else -np.inf)
        AU.append(2.0 * AU[dup_of] if np.isfinite(AU[dup_of]) else np.inf)

        prob = LpProblem.from_arrays(A_full, AL, AU, l, u, c)
        ref = reference_solve(prob.A, prob.AL, prob.AU, prob.l, prob.u,
                              prob.c)
        if ref.status != 0:
            pytest.skip("generated instance infeasible/unbounded")
        status, red, h = presolve_problem(prob, debug_checks=True)
        assert status == "OK"
        x, y, z, m_ = _check_postsolve(prob, red, h, tol=5e-5)
        assert prob.c @ x == pytest.approx(ref.fun, rel=1e-4, abs=1e-4)

    def test_rectangular_parallel_cols_debug_ok(self):
        """Regression: the checker validated ParallelCol's merged-away
        COLUMN index (r.i) against m, spuriously aborting presolve on
        wide problems (round-2 review finding)."""
        n = 10
        A = np.zeros((2, n))
        A[:, 7] = [1.0, 2.0]
        A[:, 8] = [2.0, 4.0]  # parallel to col 7, s = 2
        A[0, :5] = 0.5
        c = np.full(n, 1.0)
        c[8] = 2.0  # c8 = s * c7: mergeable
        prob = _pp(A, [-np.inf] * 2, [10.0, 12.0],
                   [0.0] * n, [1.0] * n, c)
        status, red, h = presolve_problem(prob, debug_checks=True)
        assert status == "OK"
        assert h.stats()["cols_removed"] >= 1
        _check_postsolve(prob, red, h, tol=1e-6)

    def test_tall_parallel_rows_debug_ok(self):
        """Symmetric regression: ParallelRow's removed ROW index (r.j)
        was validated against n."""
        m = 10
        A = np.zeros((m, 2))
        A[7] = [1.0, 2.0]
        A[8] = [2.0, 4.0]  # parallel to row 7
        for i in range(5):
            A[i] = [0.3 + 0.1 * i, 0.7]
        prob = _pp(A, [-np.inf] * m,
                   [10.0] * 7 + [10.0, 12.0, 10.0],
                   [0.0, 0.0], [5.0, 5.0], [-1.0, -1.0])
        status, red, h = presolve_problem(prob, debug_checks=True)
        assert status == "OK"
        assert h.stats()["rows_removed"] >= 1
        _check_postsolve(prob, red, h, tol=1e-6)
