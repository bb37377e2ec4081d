"""Native (C++) MPS reader binding.

The fast path for large files (role parity: the reference's reader is
C++, src/mps_reader.cpp); semantics are identical to the pure-Python
reader in io/mps.py, which doubles as the golden reference in tests.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ..native import get_lib
from ..problem import LpProblem


def is_available() -> bool:
    return get_lib() is not None


def read_mps_native(path: str, apply_objsense: bool = True,
                    ignore_quadobj: bool = False,
                    mps_format: str = "free") -> LpProblem:
    """Read an MPS/MPS.gz file via the native reader.

    mps_format: "free" (default) or "fixed" (column-position cards that
    permit spaces in names; reference read_card_fixed,
    src/mps_reader.cpp:360-483).

    Raises RuntimeError if the native library is unavailable and
    ValueError on parse errors (same exception surface as io.mps).
    """
    if mps_format not in ("free", "fixed"):
        raise ValueError(f"mps_format must be 'free' or 'fixed', "
                         f"got {mps_format!r}")
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable; use io.mps.read_mps")
    h = lib.hpmps_read_ex(path.encode(), 1 if ignore_quadobj else 0,
                          1 if mps_format == "fixed" else 0)
    try:
        st = lib.hpmps_status(h)
        if st != 0:
            raise ValueError(lib.hpmps_error(h).decode() or
                             f"failed to read {path}")
        m = lib.hpmps_m(h)
        n = lib.hpmps_n(h)
        nnz = lib.hpmps_nnz(h)
        Ap = np.zeros(m + 1, np.int64)
        Ai = np.zeros(max(nnz, 1), np.int32)
        Ax = np.zeros(max(nnz, 1), np.float64)
        AL = np.zeros(max(m, 1), np.float64)
        AU = np.zeros(max(m, 1), np.float64)
        l = np.zeros(max(n, 1), np.float64)
        u = np.zeros(max(n, 1), np.float64)
        c = np.zeros(max(n, 1), np.float64)
        lib.hpmps_get(h, Ap, Ai, Ax, AL, AU, l, u, c)
        obj_constant = lib.hpmps_obj_constant(h)
        sense = lib.hpmps_objsense(h)
        name = lib.hpmps_name(h).decode()
        if not apply_objsense and sense == -1:
            # Native reader always applies MAX; undo on request.
            c = -c[:n]
            obj_constant = -obj_constant
            sense = 1
        A = sp.csr_matrix((Ax[:nnz], Ai[:nnz], Ap), shape=(m, n))
        return LpProblem.from_arrays(
            A, AL[:m], AU[:m], l[:n], u[:n], c[:n],
            obj_constant=obj_constant, name=name, objective_sense=sense)
    finally:
        lib.hpmps_free(h)
