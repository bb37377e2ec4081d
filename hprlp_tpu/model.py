"""User-facing Model API (parity: bindings/python/hprlp — Model,
module-level solve/solve_mps, reference: bindings/python/hprlp/model.py,
solver.py)."""

from __future__ import annotations

from typing import Optional

import numpy as np

from .io.mps import read_mps
from .params import Parameters
from .problem import LpProblem
from .results import Results
from .solver.loop import solve_problem


class Model:
    """An LP model: created from arrays, scipy sparse matrices, or MPS files.

    Parity surface with the reference Python binding's Model
    (bindings/python/hprlp/model.py): from_arrays / from_mps / solve,
    context-manager support.  There is no manual free — memory is managed
    by JAX.
    """

    def __init__(self, problem: LpProblem):
        self._problem = problem

    @property
    def problem(self) -> LpProblem:
        return self._problem

    @property
    def m(self) -> int:
        return self._problem.m

    @property
    def n(self) -> int:
        return self._problem.n

    @property
    def nnz(self) -> int:
        return self._problem.nnz

    @classmethod
    def from_arrays(cls, A, AL, AU, l, u, c, obj_constant: float = 0.0
                    ) -> "Model":
        return cls(LpProblem.from_arrays(A, AL, AU, l, u, c, obj_constant))

    @classmethod
    def from_mps(cls, path: str, **kw) -> "Model":
        return cls(read_mps(path, **kw))

    def solve(self, parameters: Optional[Parameters] = None) -> Results:
        res = solve_problem(self._problem, parameters)
        return _apply_sense(res, self._problem.objective_sense)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def solve(A, AL, AU, l, u, c, parameters: Optional[Parameters] = None,
          obj_constant: float = 0.0) -> Results:
    """One-shot solve from arrays (parity: hprlp.solve,
    bindings/python/hprlp/solver.py:242)."""
    return Model.from_arrays(A, AL, AU, l, u, c, obj_constant).solve(parameters)


def solve_mps(path: str, parameters: Optional[Parameters] = None,
              **reader_kw) -> Results:
    """One-shot solve from an MPS file (parity: hprlp.solve_mps)."""
    return Model.from_mps(path, **reader_kw).solve(parameters)


def _apply_sense(res: Results, sense: int) -> Results:
    """Report objectives in the problem's original sense.  For OBJSENSE MAX
    problems (converted to min internally) the true objective is the
    negation of the minimised one."""
    if sense == -1:
        res.primal_obj = -res.primal_obj
        res.dual_obj = -res.dual_obj
    return res
