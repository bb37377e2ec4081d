"""Tests for the algebraic modeling layer (parity surface:
reference bindings/python/hprlp/modeling.py)."""

import numpy as np
import pytest

from hprlp_tpu.modeling import (ConstraintSense, LinearExpression,
                                ModelBuilder, TwoSidedConstraint, between,
                                maximize, minimize)
from hprlp_tpu.params import Parameters


def quiet():
    return Parameters(verbose=False)


class TestExpressions:
    def test_variable_arithmetic(self):
        m = ModelBuilder()
        x, y = m.add_variables(2)
        e = 2 * x - y / 2 + 3
        assert e.get_coefficient(x.index) == 2.0
        assert e.get_coefficient(y.index) == -0.5
        assert e.constant == 3.0

    def test_expression_combination(self):
        m = ModelBuilder()
        x, y, z = m.add_variables(3)
        e = (x + y) - (y - z) + 1 - 1
        assert e.get_coefficient(x.index) == 1.0
        assert e.get_coefficient(y.index) == 0.0
        assert e.get_coefficient(z.index) == 1.0
        assert e.constant == 0.0

    def test_rsub_rmul(self):
        m = ModelBuilder()
        x = m.add_variable()
        e = 10 - 3 * x
        assert e.constant == 10.0
        assert e.get_coefficient(x.index) == -3.0

    def test_scalar_mult_only(self):
        m = ModelBuilder()
        x, y = m.add_variables(2)
        with pytest.raises(TypeError):
            (x + y) * (x + y)


class TestConstraints:
    def test_le_constant_folding(self):
        m = ModelBuilder()
        x = m.add_variable()
        con = x + 5 <= 12
        assert con.sense == ConstraintSense.LE
        assert con.upper == 7.0
        assert con.lower == -np.inf

    def test_ge_eq(self):
        m = ModelBuilder()
        x = m.add_variable()
        ge = x >= 3
        eq = 2 * x == 4
        assert (ge.lower, ge.upper) == (3.0, np.inf)
        assert (eq.lower, eq.upper) == (4.0, 4.0)

    def test_between(self):
        m = ModelBuilder()
        x, y = m.add_variables(2)
        con = between(1, x + y + 2, 5)
        assert isinstance(con, TwoSidedConstraint)
        assert con.lower == -1.0
        assert con.upper == 3.0

    def test_chained_range(self):
        m = ModelBuilder()
        x = m.add_variable()
        con = (x >= 1) <= 4
        assert isinstance(con, TwoSidedConstraint)
        assert (con.lower, con.upper) == (1.0, 4.0)


class TestSolve:
    def test_demo_lp(self):
        """The repo-wide 2x2 ground truth (reference: data/model.mps)."""
        m = ModelBuilder("minimize")
        x = m.add_variable(name="x")
        y = m.add_variable(name="y")
        m.set_objective(-3 * x - 5 * y)
        m.add_constraint(x + 2 * y <= 10)
        m.add_constraint(3 * x + y <= 12)
        res = m.solve(quiet())
        assert res.status == "OPTIMAL"
        assert res.primal_obj == pytest.approx(-26.4, abs=1e-2)
        assert x.value == pytest.approx(2.8, abs=1e-2)
        assert y.value == pytest.approx(3.6, abs=1e-2)
        assert m.get_objective_value() == pytest.approx(-26.4, abs=1e-2)

    def test_maximize(self):
        m = ModelBuilder("maximize")
        x = m.add_variable(upper_bound=4.0)
        y = m.add_variable(upper_bound=3.0)
        m.set_objective(2 * x + y + 1)
        m.add_constraint(x + y <= 5)
        res = m.solve(quiet())
        assert res.status == "OPTIMAL"
        # max 2x + y + 1 with x<=4, y<=3, x+y<=5 -> x=4, y=1, obj=10.
        assert res.primal_obj == pytest.approx(10.0, abs=1e-2)
        assert x.value == pytest.approx(4.0, abs=1e-2)

    def test_minimize_helper(self):
        m = ModelBuilder()
        x = m.add_variable()
        mb = minimize(x)
        v = mb.add_variable(lower_bound=2.0)
        mb.set_objective(v)
        res = mb.solve(quiet())
        assert res.status == "OPTIMAL"
        assert res.primal_obj == pytest.approx(2.0, abs=1e-3)

    def test_range_constraint_solve(self):
        m = ModelBuilder("minimize")
        x = m.add_variable(lower_bound=-np.inf)
        m.set_objective(x)
        m.add_constraint(between(2, x, 8))
        res = m.solve(quiet())
        assert res.primal_obj == pytest.approx(2.0, abs=1e-3)

    def test_unsolved_raises(self):
        m = ModelBuilder()
        m.add_variable()
        with pytest.raises(RuntimeError):
            m.get_objective_value()
