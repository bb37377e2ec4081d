"""Solver parameters.

API parity with the reference HPRLP_parameters (reference:
include/structs.h:25-40) plus TPU-specific knobs (precision, sharding).
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass
class Parameters:
    """User-facing solver parameters.

    Fields shared with the reference solver (include/structs.h:25-40):
      max_iter, stop_tol, time_limit, device_number, check_iter,
      use_CR_scaling, use_Ruiz_scaling, use_Pock_Chambolle_scaling,
      use_bc_scaling, use_presolve.

    TPU-native additions:
      precision: "auto" | "f32" | "f64".  "auto" picks f64 on CPU backends
        and f32 on TPU.  TPUs have no native f64 but XLA emulates it:
        "f64" is the high-accuracy mode (validated to 1e-8 KKT on TPU,
        where f32 typically stalls around 1e-4..1e-6); "f32" is the fast
        mode (LaneELL/dense MXU backends) for 1e-4-grade solves.
      spmv_backend: "auto" | "gather" | "dense" ("xla" = alias of
        "gather").  Analogue of the reference's fused-kernel autotuner
        (src/main_iterate.cu:517-595): "auto" benchmarks the backends on
        the actual matrix at solve start (timed full chunks, >= 5% speedup
        + merit-within-1% eligibility) and keeps the fastest; "gather" is
        the bucketed-ELL gather+reduce; "dense" runs SpMV as one MXU
        matmul against the densified matrix (small/medium problems).
      mesh_shape: optional number of devices for a 1-D sharded solve; None
        runs single-device.
    """

    max_iter: int = 2**31 - 1
    stop_tol: float = 1e-4
    time_limit: float = 3600.0
    device_number: int = 0
    check_iter: int = 150
    # Parity with CUSPARSE_spmv=false / autotune_verbose=false defaults.
    spmv_backend: str = "auto"
    autotune_verbose: bool = False

    # Scaling controllers (reference defaults: all true, structs.h:34-39).
    use_CR_scaling: bool = True
    use_Ruiz_scaling: bool = True
    use_Pock_Chambolle_scaling: bool = True
    use_bc_scaling: bool = True
    use_presolve: bool = True

    # TPU-native knobs.
    precision: str = "auto"
    mesh_shape: Optional[int] = None
    verbose: bool = True

    def validate(self) -> None:
        if self.precision not in ("auto", "f32", "f64"):
            raise ValueError(f"invalid precision: {self.precision!r}")
        if self.spmv_backend == "xla":
            self.spmv_backend = "gather"
        if self.spmv_backend not in ("auto", "gather", "dense", "lane"):
            raise ValueError(f"invalid spmv_backend: {self.spmv_backend!r}")
        if self.check_iter <= 1:
            raise ValueError("check_iter must be > 1")
        if self.stop_tol <= 0:
            raise ValueError("stop_tol must be positive")
