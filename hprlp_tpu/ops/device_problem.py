"""Device-resident LP problem: padded, permuted, bucketed.

This is the TPU analogue of the reference's copy_lpinfo_to_device +
allocate_memory (reference: src/preprocess.cu:66-256): the CSR problem is
re-laid-out for the hardware once at model-upload time.

Padding rows are free constraints (AL=-inf, AU=+inf): their dual iterate is
identically zero.  Padding columns are variables fixed at zero (l=u=0, c=0):
their primal iterate and dual residual are identically zero.  Hence the
padded problem is equivalent to the original and no masks are needed in the
hot loop.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from .. import constants
from ..problem import LpProblem
from .sparse import (EllMatrix, build_ell_from_csr, bucketed_row_total,
                     padded_size, plan_buckets, plan_entry_total)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LpDevice:
    """Padded LP data on device (parity: LP_info_gpu, include/structs.h:243-252)."""

    A: EllMatrix
    AT: EllMatrix
    AL: jax.Array  # (m_pad,)
    AU: jax.Array
    c: jax.Array  # (n_pad,)
    l: jax.Array
    u: jax.Array

    @property
    def m(self) -> int:
        return self.A.nrows

    @property
    def n(self) -> int:
        return self.A.ncols


@dataclasses.dataclass(frozen=True)
class HostMaps:
    """Host-side bookkeeping to translate between original and padded spaces."""

    row_pos: np.ndarray  # (m_orig,) -> padded row index
    col_pos: np.ndarray  # (n_orig,) -> padded col index
    m_orig: int
    n_orig: int
    obj_constant: float
    objective_sense: int
    # Precomputed hybrid routing from the thin-dominance gate, valid
    # only when the gate fired (positions unchanged afterwards): per
    # matrix a (thin_mask, phi) pair over CSR entry order, reused by
    # attach_lane so schedule_hybrid skips its own full route_cells.
    route_A: tuple | None = None
    route_AT: tuple | None = None


# Above this nnz the thin-dominance gate may skip the window-balance
# candidate and the residue pass (aligned-layout-only optimisations) —
# aligned with solver.loop.GIANT_LANE_FIRST_NNZ's regime.
THIN_SKIP_MIN_NNZ = 20_000_000


def build_device_problem(problem: LpProblem, dtype=jnp.float32,
                         row_multiple: int = 8,
                         vec_multiple: int = constants.VECTOR_PAD_MULTIPLE,
                         min_width: int = constants.MIN_ELL_WIDTH,
                         min_bucket_rows: int = constants.MIN_BUCKET_ROWS,
                         upload: bool = True,
                         AT_csr=None,
                         build_ell: bool = True,
                         ) -> tuple[LpDevice, HostMaps]:
    """Lay out an LpProblem for the device.

    row_multiple also controls shardability: pass n_devices*8 (or more) to
    make every bucket's row count divisible by the mesh size.
    upload=False keeps every array on the host (numpy) — used by the giant
    lane-first path (build_device_problem_giant), which ships only lane
    tiles to the device.
    AT_csr: precomputed A.T.tocsr() (the giant path already built it for
    host scaling — a second 113M-nnz scipy transpose costs ~10 s).
    build_ell=False skips the ELL bucket materialisation entirely and
    returns matrices with EMPTY buckets (positions/vectors only): the
    giant path's sole bucket consumer was to_coo, which re-derived what
    the caller's CSR already holds — ~2 GB of padded slot fill per
    matrix for nothing.
    """
    import os as _os
    import sys as _sys
    import time as _time

    _verbose = _os.environ.get("HPRLP_LAYOUT_VERBOSE") == "1"
    _t0 = _time.perf_counter()

    def _tick(label):
        nonlocal _t0
        if _verbose:
            print(f"[layout] {label}: {_time.perf_counter() - _t0:.1f}s",
                  file=_sys.stderr, flush=True)
        _t0 = _time.perf_counter()

    A = problem.A.tocsr()
    A.sum_duplicates()
    if AT_csr is not None:
        AT = AT_csr
    else:
        AT = A.T.tocsr()
        AT.sum_duplicates()
    m, n = A.shape
    _tick("csr/transpose")

    row_nnz = np.diff(A.indptr)
    col_nnz = np.diff(AT.indptr)

    def locality_key(indptr, indices):
        """MEDIAN partner index per row — rows with nearby keys are
        packed into the same 128-row LaneELL group / 16384-position
        window, so structured matrices touch few x-windows per group.
        Median, not mean: a row with two far-apart support clusters
        (periodic wraparound, a few global couplings) gets a key INSIDE
        one of its clusters instead of in the empty middle — a
        mean-keyed sort scattered such rows over every window and
        exploded the (window, grange) cell count (measured 15992 vs
        ~500 cells on the 75M banded-giant family).  CSR canonical form
        keeps indices sorted per row, so the median is O(1) per row."""
        cnt = np.diff(indptr)
        mid = indptr[:-1] + cnt // 2
        key = indices[np.minimum(mid, max(len(indices) - 1, 0))] \
            .astype(np.float64) if len(indices) else np.zeros(len(cnt))
        return np.where(cnt > 0, key, 0.0)

    key_A = locality_key(A.indptr, A.indices)
    key_AT = locality_key(AT.indptr, AT.indices)
    plan_A = plan_buckets(row_nnz, min_width, min_bucket_rows, key_A)
    plan_AT = plan_buckets(col_nnz, min_width, min_bucket_rows, key_AT)

    # Window-balance both spaces for the LaneELL kernel: the kernel's cost
    # is sum over (window, 16384-row block) of the block's max per-row
    # count, so spreading each row's entries evenly across the OTHER
    # space's windows cuts scheduled sublanes (and kernel time) by the
    # Poisson max/mean ratio (~2-3x on random matrices).  The plan is
    # rebuilt window-major (sub-buckets per width x window), so every
    # item may land in any window.
    #
    # BUT spreading is the WRONG move when the (window, group-range) grid
    # is much larger than nnz can fill (giant matrices, or structured
    # ones whose locality the spread would destroy): every touched cell
    # pays the aligned layout's grange-max depth, so thin fill explodes
    # slot padding (measured 11x at 100M uniform nnz — tiles would not
    # fit HBM).  Both layouts are cheap to SCORE exactly (the per-lane
    # depth term of the aligned cost), so compute both and keep the
    # cheaper pair.
    _tick("plan_buckets")
    # Third candidate: LOCALITY-major windows (banded giants — see
    # _locality_major_plan).  Built only when its precondition holds and
    # a choice is actually available.
    plan_A_loc = _locality_major_plan(plan_A, key_A, row_multiple)
    plan_AT_loc = _locality_major_plan(plan_AT, key_AT, row_multiple)
    have_loc = plan_A_loc is not None and plan_AT_loc is not None

    from .lane_ell import route_cells

    # Giant inputs: score candidates on a STRIDE SAMPLE of entries
    # (identical stride for every candidate, so the comparison stays
    # apples-to-apples).  The routed cost is a sum of per-cell maxima
    # — sampling deflates every candidate's maxima alike, preserving
    # the ranking; measured choices unchanged on the giant families
    # at cap 16M (round 3, ~190 s -> ~30 s at 113M) and again at 4M
    # (round 4: banded loc=winner, uniform bal=winner at both caps).
    CHOOSER_SAMPLE_CAP = 4_000_000
    nnz_tot = len(A.indices)
    stride = max(1, nnz_tot // CHOOSER_SAMPLE_CAP)
    row_of_a = col_of_a = col_of_at = row_of_at = None

    def sample_ids():
        # Hoist the O(nnz) sample extraction OUT of pair_cost: the
        # original/partner ids of the sampled entries are candidate-
        # independent, so each candidate pays only O(sample) gathers
        # (a per-candidate np.repeat built a full nnz-sized row map
        # three times per matrix — ~0.9 GB each at 113M nnz).
        nonlocal row_of_a, col_of_a, col_of_at, row_of_at
        if row_of_a is not None:
            return
        ids = np.arange(0, nnz_tot, stride)
        rep = np.repeat(np.arange(m, dtype=np.int64), np.diff(A.indptr))
        row_of_a = rep[ids]          # original row of each A sample
        del rep
        col_of_a = A.indices[ids]    # original col of each A sample
        rep = np.repeat(np.arange(n, dtype=np.int64), np.diff(AT.indptr))
        col_of_at = rep[ids]
        del rep
        row_of_at = AT.indices[ids]

    def pair_cost(pa, pat):
        # Routed HYBRID cost (aligned vs thin per cell) — the metric
        # the kernel actually pays.  Round 2 compared the aligned
        # cost only, which made window balancing look profitable on
        # banded giants when it actually destroyed the band locality
        # that lets the thin router pack at ~1.3 slots/nnz.  Returns
        # (total_cost, aligned_cost_share_numerator) — the aligned part
        # drives the thin-dominance gate below.
        sample_ids()
        rp = _positions_from_plan(pa, m, row_multiple)
        cp = _positions_from_plan(pat, n, row_multiple)
        m_pad_a = padded_size(bucketed_row_total(pa, row_multiple),
                              vec_multiple)
        n_pad_a = padded_size(bucketed_row_total(pat, row_multiple),
                              vec_multiple)
        _, _, sA = route_cells(rp[row_of_a], cp[col_of_a], m_pad_a,
                               want_mask=False)
        _, _, sAT = route_cells(cp[col_of_at], rp[row_of_at], n_pad_a,
                                want_mask=False)
        return (sA["total_cost"] + sAT["total_cost"],
                sA["aligned_sb"] + sAT["aligned_sb"],
                sA["phi"], sAT["phi"])

    # Thin-dominance gate (giant inputs): the window-balance candidate
    # and the residue pass only improve ALIGNED-routed cells — window
    # balancing spreads per-(window, block) depth and residue balancing
    # spreads residue collisions, both aligned-layout constraints; the
    # thin packer measures ~1.4% over its own lower bound regardless.
    # When the plain/loc winner routes (nearly) everything thin (banded
    # giants: 100% thin), skip BUILDING the balanced candidate and the
    # residue pass — 47.8 s + 70.2 s of the 113M-nnz ingest, measured.
    # Uniform giants route ~99% aligned and keep the full search.
    # Note the gate fires on BOTH measured giant families: banded (loc
    # routes 100% thin at 1.34 slots/nnz — balance passes are pure
    # waste) and uniform (loc+thin packs 1.51 slots/nnz vs the balanced
    # layout's 2.00 aligned; the ~17% kernel-model regression is dwarfed
    # by the skipped passes — round-3 uniform giant wall was 1511 s of
    # which 14 s solve).  HPRLP_GIANT_FULL_BALANCE=1 restores the full
    # three-candidate search + residue pass.
    skip_balance = False
    route_A = route_AT = None
    cost_plain = cost_loc = None
    if (nnz_tot >= THIN_SKIP_MIN_NNZ and row_multiple <= 8
            and _os.environ.get("HPRLP_GIANT_FULL_BALANCE") != "1"):
        cost_plain, _, phiA_p, phiAT_p = pair_cost(plan_A, plan_AT)
        if have_loc:
            cost_loc, _, phiA_l, phiAT_l = pair_cost(plan_A_loc,
                                                     plan_AT_loc)
        else:
            cost_loc, phiA_l, phiAT_l = cost_plain + 1, phiA_p, phiAT_p
        # The thin/aligned SHARE must come from a FULL-entry route: the
        # sampled costs above deflate per-cell density, which flips thin
        # cells to aligned routing (a cell with one sampled entry per
        # block always routes aligned) and inflated the aligned share
        # ~30x on the banded giant.  The native counter keeps this
        # ~O(nnz) pass cheap against the 118 s it can skip.
        wpa, wpat = ((plan_A_loc, plan_AT_loc)
                     if have_loc and cost_loc < cost_plain
                     else (plan_A, plan_AT))
        rp = _positions_from_plan(wpa, m, row_multiple)
        cp = _positions_from_plan(wpat, n, row_multiple)
        m_pad_w = padded_size(bucketed_row_total(wpa, row_multiple),
                              vec_multiple)
        n_pad_w = padded_size(bucketed_row_total(wpat, row_multiple),
                              vec_multiple)
        # want_mask=True: when the gate fires the winner's positions are
        # FINAL, so this full route IS the hybrid routing — stash it and
        # attach_lane skips its own route_cells (two more full-entry
        # routes at 113M nnz otherwise).  The fold factor comes from the
        # SAMPLED winner (phis are pinned, so the full route skips the
        # 4-phi term loop — it runs over ~nnz (window, row) pairs on
        # uniform giants, ~30 s of the gate before this).
        loc_won = have_loc and cost_loc < cost_plain
        phis_A = ((phiA_l,) if loc_won else (phiA_p,))
        phis_AT = ((phiAT_l,) if loc_won else (phiAT_p,))
        mask_A, phi_A, sA = route_cells(
            np.repeat(rp, np.diff(A.indptr)), cp[A.indices], m_pad_w,
            phis=phis_A)
        mask_AT, phi_AT, sAT = route_cells(
            np.repeat(cp, np.diff(AT.indptr)), rp[AT.indices], n_pad_w,
            phis=phis_AT)
        w_al = sA["aligned_sb"] + sAT["aligned_sb"]
        w_cost = sA["total_cost"] + sAT["total_cost"]
        # TOTAL-TIME decision (round-5): skipping the balance passes
        # trades at most the modeled solve-cost difference for the
        # balance passes' wall time.  The generous saving BOUND below
        # assumes balancing could eliminate the routed cost entirely
        # (it cannot — measured best case ~35% sub-block reduction);
        # the balance estimate is per-entry, calibrated mid-range
        # between the banded (1.0 us/nnz) and uniform (12 us/nnz)
        # round-4 measurements.  Expected solve length defaults to
        # 2000 iterations (HPRLP_LAYOUT_EXPECTED_ITERS overrides, e.g.
        # for repeated warm-started re-solves of one model).
        SUBBLOCK_S = 0.3e-6        # measured pair kernel us/sub-block
        BAL_S_PER_NNZ = 5e-6
        exp_iters = float(_os.environ.get(
            "HPRLP_LAYOUT_EXPECTED_ITERS", "2000"))
        saving_bound_s = w_cost * SUBBLOCK_S * exp_iters
        balance_est_s = nnz_tot * BAL_S_PER_NNZ
        thin_dominant = w_al < 0.2 * max(w_cost, 1)
        if thin_dominant or balance_est_s > saving_bound_s:
            skip_balance = True
            route_A = (mask_A, phi_A, sA)
            route_AT = (mask_AT, phi_AT, sAT)
            if _verbose:
                why = ("thin-dominant" if thin_dominant
                       else "balance cost exceeds solve-saving bound")
                print(f"[layout] {why} (aligned {w_al} / {w_cost}; "
                      f"balance est {balance_est_s:.0f} s > saving "
                      f"bound {saving_bound_s:.0f} s at "
                      f"{exp_iters:.0f} iters): skipping window/"
                      f"residue balance", file=_sys.stderr, flush=True)

    if skip_balance:
        plan_A_bal, plan_AT_bal = plan_A, plan_AT
    else:
        plan_A_bal = _layout_windows(plan_A, A.indptr, A.indices, n,
                                     row_multiple)
        plan_AT_bal = _layout_windows(plan_AT, AT.indptr, AT.indices, m,
                                      row_multiple)
    _tick("window_balance")
    if (plan_A_bal is not plan_A or plan_AT_bal is not plan_AT
            or have_loc):
        # Sequential on purpose: evaluating the three candidates on
        # threads was measured SLOWER on a 4-core host (each pair_cost
        # is memory-bandwidth-bound over nnz-sized temporaries; parallel
        # copies thrash the cache).
        cost_bal = (pair_cost(plan_A_bal, plan_AT_bal)[0]
                    if not skip_balance else None)
        if cost_plain is None:
            cost_plain = pair_cost(plan_A, plan_AT)[0]
            cost_loc = (pair_cost(plan_A_loc, plan_AT_loc)[0] if have_loc
                        else cost_plain + 1)
        if _verbose:
            print(f"[layout] chooser: bal={cost_bal} plain={cost_plain} "
                  f"loc={cost_loc}", file=_sys.stderr, flush=True)
        _tick("layout_chooser")
        # Prefer the balanced layout on ties (residue balancing composes
        # better with it; measured equal-or-better everywhere dense).
        best_other = min(cost_plain, cost_loc)
        if cost_bal is not None and cost_bal <= best_other * 1.1:
            plan_A, plan_AT = plan_A_bal, plan_AT_bal
        elif have_loc and cost_loc < cost_plain:
            plan_A, plan_AT = plan_A_loc, plan_AT_loc
    else:
        plan_A, plan_AT = plan_A_bal, plan_AT_bal

    # Residue pass: with windows balanced, the binding LaneELL constraint
    # becomes residue collisions (distinct columns sharing pos%128 within
    # an output group need separate depths).  Permute members WITHIN their
    # 128-position block so each group's columns spread across residue
    # classes.  Blocks never change, so the n-pass can use the m-blocks
    # and vice versa without circularity.  Skipped with the balanced
    # candidate on thin-dominant giants (see the gate above): residue
    # collisions are an aligned-layout constraint.
    if not skip_balance:
        row_pos_prov = _positions_from_plan(plan_A, m, row_multiple)
        plan_AT = _balance_plan_residues(plan_AT, AT.indptr, AT.indices,
                                         row_pos_prov, row_multiple)
        col_pos_prov = _positions_from_plan(plan_AT, n, row_multiple)
        plan_A = _balance_plan_residues(plan_A, A.indptr, A.indices,
                                        col_pos_prov, row_multiple)
    _tick("residue_balance")

    m_pad = padded_size(bucketed_row_total(plan_A, row_multiple), vec_multiple)
    n_pad = padded_size(bucketed_row_total(plan_AT, row_multiple), vec_multiple)

    # Column positions come from the OTHER matrix's bucket plan, so build
    # row positions first with identity column maps, then rebuild cols.
    # Cheaper: compute positions directly from the plans.
    row_pos = _positions_from_plan(plan_A, m, row_multiple)
    col_pos = _positions_from_plan(plan_AT, n, row_multiple)

    np_dtype = np.dtype(dtype)
    if build_ell:
        A_ell, row_pos2 = build_ell_from_csr(
            A.indptr, A.indices, A.data, plan_A, col_pos, m_pad, n_pad,
            row_multiple, np_dtype, upload=upload)
        AT_ell, col_pos2 = build_ell_from_csr(
            AT.indptr, AT.indices, AT.data, plan_AT, row_pos, n_pad, m_pad,
            row_multiple, np_dtype, upload=upload)
        assert np.array_equal(row_pos, row_pos2)
        assert np.array_equal(col_pos, col_pos2)
    else:
        def empty_ell(nr, nc):
            from .sparse import EllBucket, EllMatrix

            b = EllBucket(vals=np.zeros((0, 1), np_dtype),
                          cols=np.zeros((0, 1), np.int32),
                          valid=np.zeros((0, 1), bool),
                          row_start=0, width=1)
            return EllMatrix(buckets=(b,), nrows=nr, ncols=nc)

        A_ell = empty_ell(m_pad, n_pad)
        AT_ell = empty_ell(n_pad, m_pad)
    _tick("ell_build")

    def scatter_vec(vals, pos, size, fill):
        out = np.full(size, fill, dtype=np.float64)
        out[pos] = vals
        out = out.astype(np_dtype)
        return jnp.asarray(out) if upload else out

    AL = scatter_vec(problem.AL, row_pos, m_pad, -np.inf)
    AU = scatter_vec(problem.AU, row_pos, m_pad, np.inf)
    c = scatter_vec(problem.c, col_pos, n_pad, 0.0)
    l = scatter_vec(problem.l, col_pos, n_pad, 0.0)
    u = scatter_vec(problem.u, col_pos, n_pad, 0.0)

    dev = LpDevice(A=A_ell, AT=AT_ell, AL=AL, AU=AU, c=c, l=l, u=u)
    maps = HostMaps(row_pos=row_pos, col_pos=col_pos, m_orig=m, n_orig=n,
                    obj_constant=float(problem.obj_constant),
                    objective_sense=problem.objective_sense,
                    route_A=route_A, route_AT=route_AT)
    return dev, maps


def build_device_problem_giant(problem: LpProblem, dtype=jnp.float32,
                               use_cr: bool = True, use_ruiz: bool = True,
                               use_pc: bool = True, use_bc: bool = True,
                               mesh=None):
    """Giant-LP lane-first ingest: host scaling, single upload.

    The standard pipeline at 100M+ nnz ships the matrix over the
    host<->device link three times (unscaled ELL up, scaled ELL down for
    lane scheduling, lane tiles up) and runs ~50 scaling passes on the
    slow gather backend.  This path instead:

      1. scales the CSR on the HOST (solver/host_scaling.py — numpy twin
         of the device pipeline, factor parity tested),
      2. runs the normal layout passes with upload=False (host buckets),
      3. schedules/packs hybrid LaneELL tiles from the host buckets and
         uploads ONLY the tiles + padded vectors,
      4. replaces the ELL buckets with empty device stubs (backend is
         pinned to "lane"; autotune skips on the stub's nnz=0).

    mesh: a jax.sharding.Mesh composes the giant ingest with multi-chip
    solves (BASELINE config 5: >100M nnz on N devices/hosts): the tiles
    are scheduled/packed PER WINDOW GROUP and uploaded chunk-sharded
    (ops/sparse._build_sharded_lane — each process materialises only its
    addressable shards), and the vectors/scaling factors are placed
    replicated over the mesh.  Per-device tile memory is ~1/N of the
    single-chip layout.

    Returns (LpDevice[lane], HostMaps, ScalingInfo).  Raises (MemoryError
    etc.) are the caller's fallback signal — loop.py degrades to the
    standard path.  Measured effect: see benchmarks/report_giant*.json
    (SURVEY 5.7 giant-scale, no reference counterpart).
    """
    import os as _os
    import sys as _sys
    import time as _time

    from ..parallel.distributed import global_put
    from ..solver.host_scaling import host_scale
    from ..solver.scaling import ScalingInfo
    from .sparse import EllBucket, attach_lane

    _verbose = _os.environ.get("HPRLP_LAYOUT_VERBOSE") == "1"
    _t = _time.perf_counter()

    def _tick(label):
        nonlocal _t
        if _verbose:
            print(f"[giant] {label}: {_time.perf_counter() - _t:.1f}s",
                  file=_sys.stderr, flush=True)
        _t = _time.perf_counter()

    np_dtype = np.dtype(dtype)
    # Pre-fault the working set once (parallel, hugepage-advised) when
    # the brk tuning is active: first-touch faulting of fresh multi-GB
    # numpy temporaries otherwise dominates the ingest on the target VMs
    # (~130 MB/s single-threaded; the first matrix's passes measured
    # 2-3x the second's from this alone).  ~120 B/nnz covers the COO
    # triples, sort keys, masks and tile buffers.
    from .._malloc import preheat

    preheat(min(problem.nnz * 120, 24 << 30))
    _tick("preheat")
    A = problem.A.tocsr()
    A.sum_duplicates()
    AT = A.T.tocsr()
    AT.sum_duplicates()
    m, n = A.shape
    _tick("csr/transpose")
    t0 = _time.perf_counter()

    av, atv, AL_s, AU_s, l_s, u_s, c_s, info = host_scale(
        A, AT, problem.AL, problem.AU, problem.l, problem.u, problem.c,
        use_cr=use_cr, use_ruiz=use_ruiz, use_pc=use_pc, use_bc=use_bc)
    scale_s = _time.perf_counter() - t0
    _tick("host_scale")

    scaled = LpProblem(
        A=sp.csr_matrix((av, A.indices, A.indptr), shape=(m, n)),
        AL=AL_s, AU=AU_s, l=l_s, u=u_s, c=c_s,
        obj_constant=problem.obj_constant,
        objective_sense=problem.objective_sense, name=problem.name)
    # build_ell=False: the only consumer of the host ELL buckets was
    # attach_lane's to_coo — the COO is derived directly from the scaled
    # CSR + position maps below, skipping ~2 GB of padded slot fill per
    # matrix and the second 113M-nnz transpose (AT_csr).
    lp_host, maps = build_device_problem(
        scaled, dtype=dtype, upload=False, build_ell=False,
        AT_csr=sp.csr_matrix((atv, AT.indices, AT.indptr), shape=(n, m)))
    _tick("layout")

    # Lane tiles upload inside attach_lane; the COO (padded positions)
    # comes straight from the CSR.  With a mesh stamped on the matrix,
    # attach_lane routes to the chunk-sharded builder and uploads each
    # device's window group only.
    mesh_kw = {} if mesh is None else {"mesh": mesh, "mesh_axis": "d"}
    coo_A = (np.repeat(maps.row_pos, np.diff(A.indptr)),
             maps.col_pos[A.indices], av)
    A_lane = attach_lane(dataclasses.replace(lp_host.A, **mesh_kw),
                         coo=coo_A, route=maps.route_A)
    del coo_A
    _tick("attach_lane(A)")
    coo_AT = (np.repeat(maps.col_pos, np.diff(AT.indptr)),
              maps.row_pos[AT.indices], atv)
    AT_lane = attach_lane(dataclasses.replace(lp_host.AT, **mesh_kw),
                          coo=coo_AT, route=maps.route_AT)
    del coo_AT
    _tick("attach_lane(AT)")

    if mesh is None:
        rep = None
        put = jnp.asarray
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        put = lambda v: global_put(np.asarray(v), rep)  # noqa: E731

    def stubbed(mat: EllMatrix) -> EllMatrix:
        def zput(shape, dt):
            z = np.zeros(shape, dt)
            return jnp.asarray(z) if rep is None else global_put(z, rep)

        stub = EllBucket(vals=zput((0, 1), np_dtype),
                         cols=zput((0, 1), np.int32),
                         valid=zput((0, 1), bool),
                         row_start=0, width=1)
        return dataclasses.replace(mat, buckets=(stub,))

    dev = LpDevice(A=stubbed(A_lane), AT=stubbed(AT_lane),
                   AL=put(lp_host.AL), AU=put(lp_host.AU),
                   c=put(lp_host.c), l=put(lp_host.l),
                   u=put(lp_host.u))

    m_pad, n_pad = dev.A.nrows, dev.A.ncols
    rn = np.ones(m_pad, np.float64)
    rn[maps.row_pos] = info.row_norm
    cn = np.ones(n_pad, np.float64)
    cn[maps.col_pos] = info.col_norm
    scal = ScalingInfo(
        row_norm=put(rn.astype(np_dtype)), col_norm=put(cn.astype(np_dtype)),
        b_scale=put(np.asarray(info.b_scale, np_dtype)),
        c_scale=put(np.asarray(info.c_scale, np_dtype)),
        norm_b=put(np.asarray(info.norm_b, np_dtype)),
        norm_c=put(np.asarray(info.norm_c, np_dtype)),
        norm_b_org=put(np.asarray(info.norm_b_org, np_dtype)),
        norm_c_org=put(np.asarray(info.norm_c_org, np_dtype)))
    dev_scale_s = scale_s  # host-scaling wall, reported as scaling_time
    return dev, maps, scal, dev_scale_s


def _aligned_lane_cost(indptr, indices, row_pos, col_pos) -> int:
    """Lower-bound aligned-layout sub-block count for one matrix under
    candidate row/col positions: sum over (x-window, 128-group range) of
    the range's max per-(window, group, lane) entry count.  This is the
    per-lane depth term of the scheduler's Konig bound (the residue term
    is ignored: it rarely binds after the residue-balance pass and the
    lane term dominates the thin-fill regime this estimate arbitrates)."""
    from .lane_ell import LANES, WINDOW

    rows_p = np.repeat(row_pos, np.diff(indptr))
    cols_p = col_pos[indices]
    g = rows_p // LANES
    lane = rows_p % LANES
    w = cols_p // WINDOW
    G = int(g.max()) + 1 if len(g) else 1
    key = (w * G + g) * LANES + lane
    uk, cnt = np.unique(key, return_counts=True)
    cell = uk // LANES  # (w, g), sorted
    starts = np.concatenate([[0], np.nonzero(np.diff(cell))[0] + 1])
    cell_max = np.maximum.reduceat(cnt, starts)
    cells = cell[starts]
    n_gr = -(-G // LANES)
    wg = (cells // G) * n_gr + (cells % G) // LANES  # (w, grange), sorted
    starts2 = np.concatenate([[0], np.nonzero(np.diff(wg))[0] + 1])
    return int(np.maximum.reduceat(cell_max, starts2).sum())


def _locality_major_plan(plan, key: np.ndarray, row_multiple: int):
    """Rebuild a bucket plan LOCALITY-major: rows sorted by `key` (mean
    partner position) are cut into WINDOW-sized position segments, with
    width sub-buckets inside each segment (exact sizes, so segments stay
    window-aligned with no fillers).

    Width-major bucketing (the default plan) CONCATENATES the width
    groups, so each 16384-position window mixes rows from the whole
    matrix — on a banded giant that touches nearly every (window,
    group-range) cell and the hybrid router can't win (measured 5.2
    slots/nnz at 75M nnz vs ~1.3 with this plan).  Only valid when
    row_multiple divides WINDOW segments trivially (single-chip
    layouts); mesh layouts keep the rounded plans."""
    from .lane_ell import WINDOW

    if row_multiple > 8:
        return None
    n_rows = sum(len(e[1]) for e in plan)
    if n_rows <= WINDOW:
        return None
    rows_all = np.concatenate([np.asarray(e[1]) for e in plan])
    width_all = np.concatenate(
        [np.full(len(e[1]), e[0], np.int64) for e in plan])
    o = np.argsort(key[rows_all], kind="stable")
    rows_s = rows_all[o]
    width_s = width_all[o]
    new_plan = []
    for a in range(0, n_rows, WINDOW):
        b = min(a + WINDOW, n_rows)
        seg_rows = rows_s[a:b]
        seg_w = width_s[a:b]
        for w in np.unique(seg_w):
            members = seg_rows[seg_w == w]
            new_plan.append((int(w), members, len(members)))
    return new_plan


def _layout_windows(plan, indptr, indices, n_partners: int,
                    row_multiple: int):
    """Window-major layout: assign every item to ANY 16384-position
    LaneELL window (greedy exponential-penalty balance over partner
    counts, native/src/window_balance.cpp), then rebuild the plan as
    window-major sub-buckets — per window, the width buckets ascending,
    each padded to row_multiple, with a filler entry closing every
    non-final window exactly at a WINDOW boundary.

    The kernel's sublane count is sum over (window, 16384-row block) of
    the block's max per-row count; free assignment measures ~35% below
    the earlier within-bucket-range balancing on the bench matrix (the
    bucket-range restriction, not capacity, was the binding constraint).
    Falls back to the input plan when the native library is missing, the
    space fits in one window, or row_multiple does not divide WINDOW.
    """
    from .lane_ell import WINDOW

    try:
        from ..native import get_lib

        lib = get_lib()
    except Exception:
        lib = None
    total = sum(plan_entry_total(e, row_multiple) for e in plan)
    if lib is None or total <= WINDOW or WINDOW % row_multiple != 0:
        return plan

    n_items = len(indptr) - 1
    n_buckets = len(plan)
    # Sub-buckets are EXACT-sized on single-chip layouts (row_multiple
    # <= 8): a spilled extra window multiplies the (window, block) pairs
    # the kernel pays max-depth for, so spaces that divide evenly into
    # windows must get zero spill.  Mesh layouts keep row_multiple
    # rounding (shard divisibility) and pay the reserve.
    exact = row_multiple <= 8
    reserve = 0 if exact else n_buckets * row_multiple
    if reserve >= WINDOW // 2:
        # Degenerate mesh layout (huge row_multiple x many buckets):
        # window-major packing would blow up the window count — keep the
        # plain layout.
        return plan
    n_full = max(1, n_items // WINDOW)  # windows that must be used anyway
    n_win = n_full
    while n_win * (WINDOW - reserve) < n_items:
        n_win += 1
    caps = np.full(n_win, WINDOW - reserve, np.int64)
    # Spill windows (beyond the minimum count) carry a huge score bias:
    # spreading counts across MORE windows than necessary INCREASES the
    # sum-of-block-max cost, so they should absorb only the capacity
    # overflow (the lowest-degree items, placed last).
    bias = np.zeros(n_win, np.float64)
    bias[n_full:] = 1e300

    deg = np.diff(indptr).astype(np.int64)
    order = np.argsort(-deg, kind="stable").astype(np.int64)
    item_lo = np.zeros(n_items, np.int32)
    item_hi = np.full(n_items, n_win - 1, np.int32)
    item_cell = np.zeros(n_items, np.int32)
    rc = lib.hpres_balance_cells(
        n_items, np.ascontiguousarray(indptr, dtype=np.int64),
        np.ascontiguousarray(indices, dtype=np.int32), n_partners,
        np.ascontiguousarray(order), item_lo, item_hi,
        np.arange(n_win, dtype=np.int32), caps, bias, n_win, n_win, 2,
        item_cell)
    if rc != 0:
        return plan

    # Group each bucket's rows by assigned window in ONE sort per bucket
    # (a per-window scan of every bucket is O(n_win * total_rows) —
    # quadratic at scale: 2M items over 128 windows measured ~35 s).
    per_window: list[list[tuple]] = [[] for _ in range(n_win)]
    for entry in plan:
        w, rows = entry[0], entry[1]
        if not len(rows):
            continue
        cells = item_cell[rows]
        o = np.argsort(cells, kind="stable")
        rs, cs = rows[o], cells[o]
        bnd = np.nonzero(np.diff(cs))[0] + 1
        starts = np.concatenate([[0], bnd])
        ends = np.concatenate([bnd, [len(rs)]])
        for a, b in zip(starts, ends):
            per_window[int(cs[a])].append((w, rs[a:b]))

    new_plan = []
    cursor = 0
    for v in range(n_win):
        win_start = cursor
        for w, members in per_window[v]:
            if exact:
                new_plan.append((w, members, len(members)))
                cursor += len(members)
            else:
                new_plan.append((w, members))
                cursor += plan_entry_total((w, members), row_multiple)
        used = cursor - win_start
        if used > WINDOW:
            return plan  # capacity accounting failed: keep the safe path
        if v < n_win - 1 and used < WINDOW:
            new_plan.append((plan[0][0], np.zeros(0, np.int64),
                             WINDOW - used))
            cursor += WINDOW - used
    return new_plan


def _balance_plan_residues(plan, indptr, indices, partner_pos: np.ndarray,
                           row_multiple: int):
    """Permute bucket members within their 128-position block so the
    partner groups (partner_pos // 128) they touch spread across residue
    classes (pos % 128) — the LaneELL phase-1 constraint is one DISTINCT
    column per (sublane, residue), so collisions cost extra depth
    sublanes (ops/lane_ell.py).  Native greedy per window; identity on
    fallback."""
    from .lane_ell import LANES, WINDOW

    try:
        from ..native import get_lib

        lib = get_lib()
    except Exception:
        lib = None
    n_items = len(indptr) - 1
    if lib is None or n_items <= LANES:
        return plan

    # Dedup adjacency item -> partner blocks (a column repeated in the
    # same group costs nothing: phase-2 fans out).
    indptr = np.asarray(indptr, np.int64)
    indices = np.asarray(indices)
    n_blocks = int(partner_pos.max() // LANES) + 1 if len(partner_pos) else 1
    item_of = np.repeat(np.arange(n_items, dtype=np.int64),
                        np.diff(indptr))
    pair = np.unique(item_of * n_blocks + partner_pos[indices] // LANES)
    d_item = pair // n_blocks
    d_blk = (pair % n_blocks).astype(np.int32)
    d_indptr = np.zeros(n_items + 1, np.int64)
    np.cumsum(np.bincount(d_item, minlength=n_items), out=d_indptr[1:])

    # Provisional positions; runs = member ranges clipped to (bucket,
    # 128-block) so the permutation never crosses a block or bucket.
    pos = np.zeros(n_items, np.int64)
    bucket_of = np.zeros(n_items, np.int64)
    cursor = 0
    for bi, entry in enumerate(plan):
        rows = entry[1]
        pos[rows] = cursor + np.arange(len(rows))
        bucket_of[rows] = bi
        cursor += plan_entry_total(entry, row_multiple)
    items_sorted = np.argsort(pos)
    pos_sorted = pos[items_sorted]
    run_id = np.zeros(n_items, np.int64)
    if n_items > 1:
        bsort = bucket_of[items_sorted]
        brk = ((pos_sorted[1:] // LANES != pos_sorted[:-1] // LANES)
               | (np.diff(pos_sorted) != 1)
               | (bsort[1:] != bsort[:-1]))
        run_id[1:] = np.cumsum(brk)

    new_pos = pos.copy()
    win_sorted = pos_sorted // WINDOW
    w_starts = np.concatenate(
        [[0], np.nonzero(np.diff(win_sorted))[0] + 1, [n_items]])

    def balance_window(a, b):
        sub = items_sorted[a:b]          # items of this window, pos order
        k = b - a
        if k <= 1:
            return
        # Cells = the k member positions; window field = residue class.
        cell_res = (pos_sorted[a:b] % LANES).astype(np.int32)
        cell_cap = np.ones(k, np.int64)
        # Item candidate range = its run (contiguous in this ordering).
        rid = run_id[a:b] - run_id[a]
        first = np.full(rid[-1] + 1, k, np.int64)
        np.minimum.at(first, rid, np.arange(k))
        last = np.zeros(rid[-1] + 1, np.int64)
        np.maximum.at(last, rid, np.arange(k))
        item_lo = first[rid].astype(np.int32)
        item_hi = last[rid].astype(np.int32)
        # Local adjacency slices (vectorized ragged gather).
        cnts = (d_indptr[sub + 1] - d_indptr[sub])
        l_indptr = np.zeros(k + 1, np.int64)
        np.cumsum(cnts, out=l_indptr[1:])
        total = int(l_indptr[-1])
        if total:
            within = np.arange(total) - np.repeat(l_indptr[:-1], cnts)
            gather = np.repeat(d_indptr[sub], cnts) + within
            l_blk = np.ascontiguousarray(d_blk[gather])
        else:
            l_blk = np.zeros(0, np.int32)
        order = np.argsort(-cnts, kind="stable").astype(np.int64)
        item_cell = np.zeros(k, np.int32)
        rc = lib.hpres_balance_cells(
            k, l_indptr, l_blk, n_blocks, order, item_lo, item_hi,
            cell_res, cell_cap, np.zeros(k, np.float64), k, LANES, 2,
            item_cell)
        if rc != 0:
            return
        new_pos[sub] = pos_sorted[a:b][item_cell]

    # Windows are independent (disjoint item/position sets) and the
    # native call releases the GIL (ctypes), so run them across a small
    # thread pool — the residue pass dominates big-problem layout time
    # (~9 s native at 10.5M nnz single-threaded).
    spans = [(int(a), int(b))
             for a, b in zip(w_starts[:-1], w_starts[1:]) if b - a > 1]
    if len(spans) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(8, len(spans))) as ex:
            list(ex.map(lambda ab: balance_window(*ab), spans))
    else:
        for a, b in spans:
            balance_window(a, b)

    order_of = np.argsort(new_pos)
    rank = np.zeros(n_items, np.int64)
    rank[order_of] = np.arange(n_items)
    return [(e[0], e[1][np.argsort(rank[e[1]], kind="stable")], *e[2:])
            for e in plan]


def _positions_from_plan(plan, n_orig: int, row_multiple: int) -> np.ndarray:
    pos = np.full(n_orig, -1, dtype=np.int64)
    cursor = 0
    for entry in plan:
        rows = entry[1]
        pos[rows] = cursor + np.arange(len(rows))
        cursor += plan_entry_total(entry, row_multiple)
    return pos


def to_dense(A: EllMatrix) -> np.ndarray:
    """Densify (testing only)."""
    out = np.zeros((A.nrows, A.ncols))
    for b in A.buckets:
        vals = np.asarray(b.vals)
        cols = np.asarray(b.cols)
        valid = np.asarray(b.valid)
        for r in range(vals.shape[0]):
            for k in range(vals.shape[1]):
                if valid[r, k]:
                    out[b.row_start + r, cols[r, k]] += vals[r, k]
    return out
