"""hprlp_tpu — a TPU-native Halpern Peaceman-Rachford LP solver.

From-scratch JAX/XLA/Pallas reimplementation of the capabilities of the
HPR-LP-C reference solver (PolyU-IOR/HPR-LP-C), designed TPU-first:
bucketed-ELL sparse kernels, jit-compiled iteration chunks (the CUDA-Graph
analogue), device meshes for multi-chip scaling.

Standard form (reference: include/HPRLP.h:57-62):
    minimize    c'x        s.t.   AL <= A x <= AU,   l <= x <= u
"""

from .params import Parameters
from .problem import LpProblem
from .results import BatchedResults, Results
from .io.mps import read_mps
from .model import Model, solve, solve_mps
from .modeling import (Constraint, LinearExpression, ModelBuilder, Sense,
                       TwoSidedConstraint, Variable, between, maximize,
                       minimize)
from .solver.loop import solve_problem
from .solver.batched import solve_batched

__version__ = "0.1.0"

__all__ = [
    "Parameters", "LpProblem", "Results", "BatchedResults", "Model",
    "read_mps", "solve", "solve_mps", "solve_problem", "solve_batched",
    "ModelBuilder", "Variable", "LinearExpression", "Constraint",
    "TwoSidedConstraint", "between", "minimize", "maximize", "Sense",
    "__version__",
]
