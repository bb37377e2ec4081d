"""Host (numpy) twin of the device scaling pipeline, for the giant-LP
lane-first ingest path.

At 100M+ nnz the device pipeline is the wrong tool on a single chip: the
staged scaling jits run on the GATHER ELL backend (~35M gathered
elements/s on v5e) and the scaled matrix then has to round-trip back to
the host for lane scheduling (attach_lane's to_coo), which on a
remote-relay link costs minutes each way.  Host scaling computes the same
factors in a few seconds of numpy (memory-bandwidth passes over the CSR),
so the matrix is uploaded exactly once — as lane tiles.

Pass-for-pass parity with solver/scaling.py::scale_matrix/_scale_vectors
(itself parity with reference src/scaling.cu:88-216 incl. quirks: sqrt
factors clamped at <1e-15 -> 1, column norms measured before the pass's
row scaling lands, CR on the ORIGINAL values with exp-clamped factors).
tests/test_solver.py asserts host-vs-device factor agreement.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import scipy.sparse as sp

from ..constants import CURTIS_REID_ITERS, RUIZ_ITERS


@dataclasses.dataclass
class HostScaling:
    """Numpy counterpart of solver.scaling.ScalingInfo (original index
    space, not padded)."""

    row_norm: np.ndarray  # (m,) accumulated row divisors
    col_norm: np.ndarray  # (n,)
    b_scale: float
    c_scale: float
    norm_b: float
    norm_c: float
    norm_b_org: float
    norm_c_org: float


def _conceptual_b(AL: np.ndarray, AU: np.ndarray) -> np.ndarray:
    a = np.where(np.isinf(AL), 0.0, np.abs(AL))
    b = np.where(np.isinf(AU), 0.0, np.abs(AU))
    return np.maximum(a, b)


def _sqrt_clamped(norms: np.ndarray) -> np.ndarray:
    s = np.sqrt(norms)
    return np.where(s < 1e-15, 1.0, s)


def _row_reduce(indptr: np.ndarray, per_entry: np.ndarray, op) -> np.ndarray:
    """Per-row reduce of a per-entry array; 0 for empty rows.

    reduceat only at NON-EMPTY row starts: segments between consecutive
    non-empty starts then contain exactly that row's entries.  (Clipping
    indptr at size-1 instead would map trailing empty rows onto the last
    entry, splitting the final non-empty row's segment and dropping its
    last element from the sum.)
    """
    m = len(indptr) - 1
    out = np.zeros(m, per_entry.dtype)
    lens = np.diff(indptr)
    nz = lens > 0
    if per_entry.size and nz.any():
        out[nz] = op.reduceat(per_entry, indptr[:-1][nz])
    return out


def _scale_matrix_native(m, n, a_ptr, a_cols, av, at_ptr, at_cols, atv,
                         use_cr, use_ruiz, use_pc):
    """Run the matrix scaling passes in the parallel C++ implementation
    (native/src/hpscale.cpp; summation-order parity with the numpy code
    below).  av/atv are scaled IN PLACE.  Returns (row_norm, col_norm)
    or None when the native library is unavailable."""
    from ..native import get_lib

    lib = get_lib()
    if lib is None or not hasattr(lib, "hprlp_scale_matrix"):
        return None
    row_norm = np.empty(m, np.float64)
    col_norm = np.empty(n, np.float64)
    lib.hprlp_scale_matrix(
        m, n,
        np.ascontiguousarray(a_ptr, np.int64),
        np.ascontiguousarray(a_cols, np.int32), av,
        np.ascontiguousarray(at_ptr, np.int64),
        np.ascontiguousarray(at_cols, np.int32), atv,
        int(use_cr), int(use_ruiz), int(use_pc),
        CURTIS_REID_ITERS, RUIZ_ITERS, row_norm, col_norm)
    return row_norm, col_norm


# Below this nnz the ctypes marshalling outweighs the parallel win and
# the numpy path is the better-tested oracle.
NATIVE_SCALE_MIN_NNZ = 500_000


def host_scale(A: sp.csr_matrix, AT: sp.csr_matrix, AL, AU, l, u, c,
               use_cr: bool = True, use_ruiz: bool = True,
               use_pc: bool = True, use_bc: bool = True,
               force_native: bool | None = None):
    """Scale the problem on the host.

    A and AT are CSR with float64 data (A is NOT modified in place).
    Returns (A_data_scaled, AT_data_scaled, AL', AU', l', u', c',
    HostScaling).  A_scaled = diag(1/row_norm) A diag(1/col_norm), same
    contract as scale_matrix.

    The O(nnz) matrix passes route to the parallel C++ implementation
    above NATIVE_SCALE_MIN_NNZ (force_native=True/False overrides; the
    numpy passes below remain the oracle the native code is tested
    against).
    """
    m, n = A.shape
    av = A.data.astype(np.float64, copy=True)
    atv = AT.data.astype(np.float64, copy=True)
    a_cols = A.indices          # (nnz,) col of each A entry
    at_cols = AT.indices        # (nnz,) row of each AT entry
    a_ptr = A.indptr
    at_ptr = AT.indptr
    row_norm = np.ones(m)
    col_norm = np.ones(n)

    use_native = (force_native if force_native is not None
                  else len(av) >= NATIVE_SCALE_MIN_NNZ)
    if use_native:
        native = _scale_matrix_native(m, n, a_ptr, a_cols, av, at_ptr,
                                      at_cols, atv, use_cr, use_ruiz,
                                      use_pc)
        if native is not None:
            row_norm, col_norm = native
            use_cr = use_ruiz = use_pc = False  # matrix passes done

    if use_cr:
        # 20 alternating log-least-squares sweeps on the ORIGINAL values:
        #   t1_i = mean_j(-log|a_ij| - t2_j),  t2_j = mean_i(-log|a_ij| - t1_i)
        # The -log|a| row/col means are constant across sweeps.
        nlog_a = -np.log(np.maximum(np.abs(av), 1e-300))
        nlog_at = -np.log(np.maximum(np.abs(atv), 1e-300))
        rcnt = np.maximum(np.diff(a_ptr), 1)
        ccnt = np.maximum(np.diff(at_ptr), 1)
        rsum_log = _row_reduce(a_ptr, nlog_a, np.add)
        csum_log = _row_reduce(at_ptr, nlog_at, np.add)
        t1 = np.zeros(m)
        t2 = np.zeros(n)
        for _ in range(CURTIS_REID_ITERS):
            t1 = (rsum_log - _row_reduce(a_ptr, t2[a_cols], np.add)) / rcnt
            t1[np.diff(a_ptr) == 0] = 0.0
            t2 = (csum_log - _row_reduce(at_ptr, t1[at_cols], np.add)) / ccnt
            t2[np.diff(at_ptr) == 0] = 0.0
        t1 = np.clip(np.exp(t1), 1e-30, 1e30)
        t2 = np.clip(np.exp(t2), 1e-30, 1e30)
        row_norm /= t1
        col_norm /= t2
        av *= np.repeat(t1, np.diff(a_ptr)) * t2[a_cols]
        atv *= np.repeat(t2, np.diff(at_ptr)) * t1[at_cols]

    if use_ruiz:
        for _ in range(RUIZ_ITERS):
            t1 = _sqrt_clamped(_row_reduce(a_ptr, np.abs(av), np.maximum))
            row_norm *= t1
            # Column norms measured before this pass's row scaling lands
            # (reference ordering, src/scaling.cu:127-144).
            t2 = _sqrt_clamped(_row_reduce(at_ptr, np.abs(atv), np.maximum))
            col_norm *= t2
            av *= 1.0 / (np.repeat(t1, np.diff(a_ptr)) * t2[a_cols])
            atv *= 1.0 / (np.repeat(t2, np.diff(at_ptr)) * t1[at_cols])

    if use_pc:
        t1 = _sqrt_clamped(_row_reduce(a_ptr, np.abs(av), np.add))
        row_norm *= t1
        t2 = _sqrt_clamped(_row_reduce(at_ptr, np.abs(atv), np.add))
        col_norm *= t2
        av *= 1.0 / (np.repeat(t1, np.diff(a_ptr)) * t2[a_cols])
        atv *= 1.0 / (np.repeat(t2, np.diff(at_ptr)) * t1[at_cols])

    AL = np.asarray(AL, np.float64)
    AU = np.asarray(AU, np.float64)
    l = np.asarray(l, np.float64)
    u = np.asarray(u, np.float64)
    c = np.asarray(c, np.float64)

    norm_b_org = 1.0 + float(np.linalg.norm(_conceptual_b(AL, AU)))
    norm_c_org = 1.0 + float(np.linalg.norm(c))

    AL = AL / row_norm
    AU = AU / row_norm
    c = c / col_norm
    l = l * col_norm
    u = u * col_norm

    if use_bc:
        b_scale = 1.0 + float(np.linalg.norm(_conceptual_b(AL, AU)))
        c_scale = 1.0 + float(np.linalg.norm(c))
        AL = AL / b_scale
        AU = AU / b_scale
        l = l / b_scale
        u = u / b_scale
        c = c / c_scale
    else:
        b_scale = 1.0
        c_scale = 1.0

    norm_b = float(np.linalg.norm(_conceptual_b(AL, AU)))
    norm_c = float(np.linalg.norm(c))

    info = HostScaling(row_norm=row_norm, col_norm=col_norm,
                       b_scale=b_scale, c_scale=c_scale,
                       norm_b=norm_b, norm_c=norm_c,
                       norm_b_org=norm_b_org, norm_c_org=norm_c_org)
    return av, atv, AL, AU, l, u, c, info
