"""hprlp_tpu — a TPU-native Halpern Peaceman-Rachford LP solver.

From-scratch JAX/XLA/Pallas reimplementation of the capabilities of the
HPR-LP-C reference solver (PolyU-IOR/HPR-LP-C), designed TPU-first:
bucketed-ELL sparse kernels, jit-compiled iteration chunks (the CUDA-Graph
analogue), device meshes for multi-chip scaling.

Standard form (reference: include/HPRLP.h:57-62):
    minimize    c'x        s.t.   AL <= A x <= AU,   l <= x <= u
"""

import os as _os


def _enable_compile_cache():
    """Persistent XLA compile cache, on by default.

    Every cold process pays tens of seconds to minutes of chunk/scaling
    compiles (minutes through a remote-TPU tunnel); the cache turns repeat
    solves into seconds.  Respects an existing user configuration
    (JAX_COMPILATION_CACHE_DIR / jax.config) and can be disabled with
    HPRLP_TPU_NO_COMPILE_CACHE=1.
    """
    if _os.environ.get("HPRLP_TPU_NO_COMPILE_CACHE"):
        return
    import jax

    if jax.config.jax_compilation_cache_dir:  # user already configured it
        return
    cache = _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                            _os.path.expanduser("~/.cache/jax_tpu"))
    try:
        _os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except OSError:
        pass  # unwritable cache dir: run uncached


_enable_compile_cache()

# Allocator tuning is OPT-IN (host-global THP policy + process mallopt;
# see _malloc.py).  Importing the library never touches /sys or malloc
# state; entry points that own the process (bench, CLI) call tune_malloc().
if _os.environ.get("HPRLP_MALLOC_TUNE") == "1":
    from ._malloc import tune_malloc as _tune_malloc

    _tune_malloc()

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
