"""Host orchestration of the solve (parity: HPRLP_main_solve,
reference: src/HPRLP.cu:116-310, restart/sigma logic src/main_iterate.cu:
312-420).

The host only sees ~15 scalars per chunk boundary; all vector work happens
inside the jitted chunk (chunk.py).  Chunk boundaries reproduce the
reference's schedule: every check_iter iterations (restart + stopping) plus
the log-spaced print steps (utils.cu:100-102 step()).
"""

from __future__ import annotations

import dataclasses
import math
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.device_problem import HostMaps, LpDevice, build_device_problem
from ..params import Parameters
from ..problem import LpProblem
from ..results import Results
from .chunk import (SolverState, init_state, initial_metrics, run_chunk,
                    unscale_solution)
from .power_iteration import power_method
from .scaling import ScalingInfo, scale_problem

# Above this nnz a single-device TPU solve ingests lane-first (host
# scaling + single tile upload; ops/device_problem.build_device_problem_
# giant).  Aligned with autotune.AUTOTUNE_LANE_DIRECT_NNZ: in this regime
# the lane kernel is always chosen, so the gather ELL would be built,
# shipped and scaled only to be thrown away.  Env override for tests.
GIANT_LANE_FIRST_NNZ = int(os.environ.get("HPRLP_GIANT_LANE_FIRST_NNZ",
                                          20_000_000))


@dataclasses.dataclass
class Residuals:
    """Parity: HPRLP_residuals (reference: include/structs.h:255-263)."""

    err_Rp: float = math.inf
    err_Rd: float = math.inf
    primal_obj: float = 0.0
    dual_obj: float = 0.0
    rel_gap: float = math.inf
    kkt: float = math.inf


def _print_step(it: int) -> int:
    """Log-spaced print cadence (reference: src/utils.cu:100-102)."""
    if it <= 0:
        return 10
    return max(10, 10 ** int(math.floor(math.log10(it))) // 10)




def _derive_residuals(metrics: dict, scal_host: dict, obj_constant: float,
                      is_iter0: bool) -> Residuals:
    obj_scale = scal_host["b_scale"] * scal_host["c_scale"]
    r = Residuals()
    r.primal_obj = obj_scale * metrics["dot_c_xbar"] + obj_constant
    r.dual_obj = obj_scale * (metrics["dot_yobj_ybar"]
                              + metrics["dot_xbar_zbar"]) + obj_constant
    r.rel_gap = abs(r.primal_obj - r.dual_obj) / (
        1.0 + abs(r.primal_obj) + abs(r.dual_obj))
    r.err_Rd = scal_host["c_scale"] * metrics["nrm_Rd"] / scal_host["norm_c_org"]
    r.err_Rp = scal_host["b_scale"] * metrics["nrm_Rp"] / scal_host["norm_b_org"]
    if is_iter0:
        r.err_Rp = max(r.err_Rp, scal_host["b_scale"] * metrics["nrm_lu_viol"])
    r.kkt = max(r.err_Rd, r.err_Rp, r.rel_gap)
    return r


def resolve_dtype(params: Parameters):
    backend = jax.default_backend()
    if params.precision == "f64":
        if not jax.config.jax_enable_x64:
            jax.config.update("jax_enable_x64", True)
        return jnp.float64
    if params.precision == "f32":
        if jax.config.jax_enable_x64 and backend != "cpu":
            # A prior f64 solve flipped x64 on globally; 64-bit index
            # types then poison f32 jits on TPU backends.
            jax.config.update("jax_enable_x64", False)
        return jnp.float32
    # auto: f64 on CPU backends when available, f32 on accelerators.
    if backend == "cpu":
        if not jax.config.jax_enable_x64:
            jax.config.update("jax_enable_x64", True)
        return jnp.float64
    if jax.config.jax_enable_x64:
        jax.config.update("jax_enable_x64", False)
    return jnp.float32


def _route_precision(params: Parameters, backend: str) -> str:
    """Resolve precision="auto" to a concrete mode for this backend:
    below 1e-5 on accelerators plain f32 stalls, so route to the
    refinement driver with df64 STAGES (refine.py, stage precision
    "f64"): stage 0 is exactly the direct compensated-pair solve (which
    beat classic f32-stage mixed on every instance measured —
    assignment128 1e-8: f64 1350 iters / 0.27 s vs mixed 13350 iters /
    27.9 s), and instances where the pair representation's ~2^-48 cap
    floors the direct solve at ~1e-6 KKT (degenerate transport-family
    LPs, round-5 measurement) hand over to zoomed residual stages that
    reset the noise scale and certify the true KKT in host f64.
    precision="f64" (direct) and "mixed" (f32 stages) remain available
    explicitly."""
    if params.precision == "auto" and backend != "cpu" \
            and params.stop_tol < 1e-5:
        return "mixed"
    return params.precision


def giant_regime(problem: LpProblem) -> bool:
    """True when a solve of this problem would take the giant lane-first
    ingest path (used by the presolve layer to overlap presolve with the
    optimistic ingest of the ORIGINAL problem)."""
    return (problem.nnz >= GIANT_LANE_FIRST_NNZ
            and (jax.default_backend() != "cpu"
                 or "HPRLP_GIANT_LANE_FIRST_NNZ" in os.environ))


def build_giant_ingest(problem: LpProblem, params: Parameters):
    """Build the giant lane-first ingest for `problem` under `params`.

    Returns (lp, maps, scal, host_scale_s, wall_s) or raises — the
    caller owns the fallback (loop.py degrades to the standard pipeline;
    model.py's overlap discards a failed optimistic ingest)."""
    import copy
    import time as _time

    from ..ops.device_problem import build_device_problem_giant

    t0 = _time.perf_counter()
    params = copy.copy(params)
    params.precision = _route_precision(params, jax.default_backend())
    if params.precision == "mixed":
        # Mixed-precision giants run through the refine driver's two
        # solves — the optimistic single-ingest would not be reused.
        raise ValueError("mixed-precision solve: no single giant ingest")
    # resolve_dtype may flip the global x64 flag; restore it here — the
    # subsequent solve_problem() call does its own scoped flip (the
    # ingest's device arrays keep their concrete dtype either way).
    prior_x64 = bool(jax.config.jax_enable_x64)
    try:
        dtype = resolve_dtype(params)
        mesh = None
        if params.mesh_shape:
            from ..parallel.sharded import make_mesh

            mesh = make_mesh(params.mesh_shape)
        lp, maps, scal, host_scale_s = build_device_problem_giant(
            problem, dtype=dtype,
            use_cr=params.use_CR_scaling,
            use_ruiz=params.use_Ruiz_scaling,
            use_pc=params.use_Pock_Chambolle_scaling,
            use_bc=params.use_bc_scaling,
            mesh=mesh)
        return lp, maps, scal, host_scale_s, _time.perf_counter() - t0
    finally:
        if bool(jax.config.jax_enable_x64) != prior_x64:
            jax.config.update("jax_enable_x64", prior_x64)


def solve_problem(problem: LpProblem, params: Parameters | None = None,
                  _device_data=None, x0=None, y0=None,
                  sigma0=None, _giant_ingest=None) -> Results:
    """Full solve: upload -> scale -> power method -> HPR loop -> unscale.

    Parity: solve() + HPRLP_main_solve() (reference: src/HPRLP.cu:116-310,
    :493-524) minus presolve (handled by the caller / presolve package).

    x0/y0: optional warm-start primal/dual points in the ORIGINAL space
    (a capability the reference lacks; SURVEY §7 design stance — the
    functional chunk design makes it free).

    The jax_enable_x64 flag is solve-scoped: resolve_dtype may flip the
    process-global flag to match the requested precision, and it is
    restored on return so unrelated user JAX code keeps its semantics.
    """
    params = params or Parameters()
    params.validate()
    precision = _route_precision(params, jax.default_backend())
    if precision != params.precision:
        # The resolved precision must reach resolve_dtype (a dead local
        # here would silently leave "auto" -> f32 on accelerators).
        import copy

        was_auto = params.precision == "auto"
        params = copy.copy(params)
        params.precision = precision
        if precision == "mixed" and was_auto:
            # Auto-routed refinement runs df64 stages (see
            # _route_precision); explicit precision="mixed" keeps the
            # classic f32 stages.
            params.refine_stage_precision = "f64"
    if precision == "mixed" and _device_data is None:
        from .refine import solve_refined

        return solve_refined(problem, params, x0=x0, y0=y0)

    prior_x64 = bool(jax.config.jax_enable_x64)
    try:
        return _solve_problem_impl(problem, params, _device_data, x0, y0,
                                   sigma0, _giant_ingest)
    finally:
        if bool(jax.config.jax_enable_x64) != prior_x64:
            jax.config.update("jax_enable_x64", prior_x64)


def _solve_problem_impl(problem: LpProblem, params: Parameters | None,
                        _device_data, x0, y0, sigma0=None,
                        _giant_ingest=None) -> Results:
    params = params or Parameters()
    params.validate()
    dtype = resolve_dtype(params)
    log = print if params.verbose else (lambda *a, **k: None)

    out = Results()

    t_setup = time.perf_counter()
    lp = scal = None
    on_accel = (jax.default_backend() != "cpu"
                # env override also unlocks CPU (interpret-mode lane)
                # so tests can drive this path on a CPU backend
                or "HPRLP_GIANT_LANE_FIRST_NNZ" in os.environ)
    # f64 solves on TPU take the lane-first HOST-SCALED ingest at ANY
    # size, not just the giant regime: the device scaling pipeline runs
    # through XLA's TPU f64 emulation, whose fused elementwise chains
    # are only ~1e-11 accurate — that perturbs the SCALED PROBLEM DATA
    # itself, and on degenerate structured LPs (staircase/transport
    # families at 1e-8) the perturbed problem's HPR dynamics entered a
    # restart limit cycle that the exact-f64 problem escapes (round-4
    # finding: CPU converged in 2.1k iterations, every TPU variant —
    # any backend, any chunk arithmetic — cycled forever on identical
    # trajectories).  Host scaling is the tested numpy/C++ twin with
    # exact f64 factors; the lane tiles carry (hi, lo) value pairs, so
    # no precision is lost at upload either.
    is_giant = on_accel and (problem.nnz >= GIANT_LANE_FIRST_NNZ
                             or (dtype == jnp.float64
                                 and params.spmv_backend in ("auto",
                                                             "lane")))
    if _device_data is None and _giant_ingest is not None:
        # Pre-built ingest (model.py overlapped it with presolve); its
        # wall ran concurrently but is reported in the same phases the
        # serial path would use.
        lp, maps, scal, host_scale_s, ingest_wall = _giant_ingest
        out.scaling_time = host_scale_s
        # Shift t_setup so the generic accounting below reports the
        # ingest's own wall as setup_time (minus scaling, as usual).
        t_setup = time.perf_counter() - ingest_wall
        log(f"[giant] lane-first ingest (overlapped with presolve): "
            f"{ingest_wall:.2f} s")
    elif _device_data is None:
        if is_giant:
            # Giant lane-first ingest: host scaling + single tile upload
            # (ops/device_problem.build_device_problem_giant); with
            # mesh_shape the tiles go up CHUNK-SHARDED over the mesh
            # (per-device window groups — BASELINE config 5 at full
            # scale).  Any failure (tile budget, lowering) degrades to
            # the standard pipeline below.
            from ..ops.device_problem import build_device_problem_giant

            mesh = None
            if params.mesh_shape:
                from ..parallel.sharded import make_mesh

                mesh = make_mesh(params.mesh_shape)
            try:
                lp, maps, scal, host_scale_s = build_device_problem_giant(
                    problem, dtype=dtype,
                    use_cr=params.use_CR_scaling,
                    use_ruiz=params.use_Ruiz_scaling,
                    use_pc=params.use_Pock_Chambolle_scaling,
                    use_bc=params.use_bc_scaling,
                    mesh=mesh)
                out.scaling_time = host_scale_s
                log(f"[giant] lane-first ingest: host scaling "
                    f"{host_scale_s:.2f} s, tiles uploaded"
                    + (f" chunk-sharded over {params.mesh_shape} devices"
                       if mesh is not None else ""))
            except Exception as e:
                print(f"[hprlp_tpu] giant lane-first ingest failed "
                      f"({type(e).__name__}: {e}); using the standard "
                      f"pipeline", flush=True)
                lp = scal = None
        if lp is None and params.mesh_shape:
            # Multi-chip: row-block-shard A/A^T over a 1-D mesh (GSPMD);
            # the same jitted chunks then run SPMD with XLA collectives.
            from ..parallel.sharded import make_mesh, shard_problem

            n_dev = params.mesh_shape
            lp_raw, maps = build_device_problem(
                problem, dtype=dtype, row_multiple=8 * n_dev,
                vec_multiple=256 * n_dev)
            lp_raw = shard_problem(lp_raw, make_mesh(n_dev))
        elif lp is None:
            lp_raw, maps = build_device_problem(problem, dtype=dtype)
    else:
        lp_raw, maps = _device_data
    jax.block_until_ready((lp or lp_raw).c)
    out.setup_time = time.perf_counter() - t_setup
    if scal is not None:
        # Giant lane-first path: host scaling ran inside the t_setup
        # window and is already reported as scaling_time — don't count
        # the same seconds in both phases.
        out.setup_time = max(0.0, out.setup_time - out.scaling_time)
    log(f"Setup (layout and upload) time = {out.setup_time:.2f} seconds")

    if scal is None:
        t_scale = time.perf_counter()
        lp, scal = scale_problem(lp_raw,
                                 use_cr=params.use_CR_scaling,
                                 use_ruiz=params.use_Ruiz_scaling,
                                 use_pc=params.use_Pock_Chambolle_scaling,
                                 use_bc=params.use_bc_scaling)
        # The unscaled device matrices are dead from here on; dropping the
        # local reference lets JAX free them (gigabytes at 100M nnz — the
        # caller keeps its own reference when it passed _device_data in).
        del lp_raw
        out.scaling_time = time.perf_counter() - t_scale
    scal_host = {k: float(getattr(scal, k)) for k in
                 ("b_scale", "c_scale", "norm_b", "norm_c",
                  "norm_b_org", "norm_c_org")}
    log(f"Scaling time = {out.scaling_time:.2f} seconds")

    if sigma0 is not None:
        # Warm restart: resume sigma adaptation from a prior solve of the
        # SAME problem (the scaling pipeline is deterministic, so scaled
        # sigmas transfer between solves).
        sigma = float(sigma0)
    elif scal_host["norm_b"] > 1e-8 and scal_host["norm_c"] > 1e-8:
        sigma = scal_host["norm_b"] / scal_host["norm_c"]
    else:
        sigma = 1.0

    state = init_state(lp)
    if x0 is not None or y0 is not None:
        # Map warm-start points into the padded, scaled space (inverse of
        # unscale_solution: x_scaled = x * col_norm / b_scale).
        if x0 is not None:
            xp = np.zeros(lp.n)
            xp[maps.col_pos] = np.asarray(x0, np.float64)
            xs = jnp.asarray(xp, dtype) * scal.col_norm / scal.b_scale
            state = dataclasses.replace(state, x=xs, last_x=xs, x_bar=xs)
        if y0 is not None:
            yp = np.zeros(lp.m)
            yp[maps.row_pos] = np.asarray(y0, np.float64)
            ys = jnp.asarray(yp, dtype) * scal.row_norm / scal.c_scale
            state = dataclasses.replace(state, y=ys, last_y=ys, y_bar=ys)

    # SpMV backend selection BEFORE the power method, so the power
    # iterations also run on the fast backend (reference autotuner
    # analogue, src/main_iterate.cu:517-595).
    t_tune = time.perf_counter()
    if params.spmv_backend == "auto":
        from .autotune import autotune_backends

        # Probes run 20 iterations, not a full check_iter chunk: n_iters
        # is a traced argument, so the SAME compiled chunk serves probes
        # and production, and 20 iterations rank backends just as well
        # (a full-length gather probe costs seconds on large problems).
        # lambda_max is a placeholder during probing (merit comparison
        # only — all candidates see the same value).
        probe_args = (scal, state, jnp.asarray(sigma, dtype),
                      jnp.asarray(4.0, dtype), jnp.asarray(False),
                      jnp.asarray(min(20, params.check_iter), jnp.int32))
        lp = autotune_backends(run_chunk, lp, probe_args,
                               verbose=params.autotune_verbose)
    elif params.spmv_backend in ("dense", "lane"):
        from ..ops.sparse import with_backend

        b = params.spmv_backend
        lp = dataclasses.replace(lp, A=with_backend(lp.A, b),
                                 AT=with_backend(lp.AT, b))
    out.autotune_time = time.perf_counter() - t_tune

    t_pm = time.perf_counter()
    # Floor guards the degenerate all-zero-A case (zero-constraint LPs):
    # lambda_max = 0 would make the y-update divide 0/0.
    lambda_max = max(float(power_method(lp)) * 1.01, 1e-12)
    out.power_time = time.perf_counter() - t_pm
    log(f"ESTIMATING MAXIMUM EIGENVALUE time = {out.power_time:.2f} seconds")

    from .device_loop import init_restart_dev, run_superchunk

    obj_constant = maps.obj_constant
    obj_c_dev = jnp.asarray(obj_constant, dtype)
    rd = init_restart_dev(sigma, dtype)
    sigma_dev = jnp.asarray(sigma, dtype)
    lam_dev = jnp.asarray(lambda_max, dtype)
    check = params.check_iter

    metrics_prev = initial_metrics(lp, scal, state)
    # Stall-recovery best point, threaded across dispatches (always
    # constructed here so every dispatch shares ONE compiled trace).
    best_pt = {"x_bar": state.x_bar, "y_bar": state.y_bar,
               "sigma": sigma_dev}

    # Pre-compile the production superchunk variant OUTSIDE the algorithm
    # clock: the reference's loop contains no compilation (CUDA graphs are
    # captured in setup, src/HPRLP.cu:99-114), so ours belongs to setup
    # too.  The AOT result is discarded but populates the persistent
    # compile cache, so the first in-loop dispatch deserialises instead
    # of compiling (measured: an f64 16-chunk superchunk compile costs
    # ~8-15 s through the remote-compile tunnel and was polluting
    # solve_time).  Without a persistent cache the AOT compile would be
    # pure double work — skip it.
    if jax.config.jax_compilation_cache_dir:
        n_main = 1 if params.verbose else 128
        n_main = max(1, min(n_main,
                            (params.max_iter + check - 1) // check))
        try:
            run_superchunk.lower(
                lp, scal, state, rd, sigma_dev, lam_dev, metrics_prev, 0,
                obj_c_dev, params.stop_tol, n_main, check,
                int(params.stall_recovery or 0), best_pt).compile()
        except Exception:
            pass  # compile inside the loop instead (correct, slower)

    # --- algorithm clock starts here, AFTER backend autotune, the power
    # method and superchunk compilation (reference: src/HPRLP.cu:141-167
    # setup vs :178 loop — probe/compile time belongs to setup, not the
    # per-iteration story) ---
    t_alg = time.perf_counter()
    elapsed = lambda: time.perf_counter() - t_alg

    first = {1e-4: True, 1e-6: True, 1e-8: True}
    it = 0
    log(" iter     errRp        errRd         p_obj            d_obj"
        "          gap         sigma       time")

    def host_res(m_host, at_it):
        return _derive_residuals(m_host, scal_host, obj_constant, at_it == 0)

    def finish(status, at_it, res, sigma_val, restarts):
        out.status = status
        out.spmv_backend = lp.A.backend
        out.iter = at_it
        out.gap = res.rel_gap
        out.residuals = res.kkt
        out.primal_obj = res.primal_obj
        out.dual_obj = res.dual_obj
        out.time = elapsed()
        out.restarts = restarts
        out.stall_recoveries = stall_events
        out.sigma_final = float(sigma_val)
        if out.time4 == 0.0 and first[1e-4]:
            out.iter4, out.time4 = out.iter, out.time
        if out.time6 == 0.0 and first[1e-6]:
            out.iter6, out.time6 = out.iter, out.time
        if out.time8 == 0.0 and first[1e-8]:
            out.iter8, out.time8 = out.iter, out.time
        from ..parallel.distributed import host_fetch

        x_s, y_s, z_s = (host_fetch(v)
                         for v in unscale_solution(scal, state))
        out.x = np.asarray(x_s, np.float64)[maps.col_pos]
        out.y = np.asarray(y_s, np.float64)[maps.row_pos]
        out.z = np.asarray(z_s, np.float64)[maps.col_pos]
        log(f"\n=== Solution Summary ===\nStatus: {out.status}\n"
            f"Iterations: {out.iter}\nTime: {out.time:.2f} seconds\n"
            f"Primal Objective: {out.primal_obj:.12e}\n"
            f"Residual: {out.residuals:.2e}\n")
        return out

    def milestones(res, at_it, at_time):
        for tol, (attr_i, attr_t) in ((1e-4, ("iter4", "time4")),
                                      (1e-6, ("iter6", "time6")),
                                      (1e-8, ("iter8", "time8"))):
            if first[tol] and res.kkt < tol:
                setattr(out, attr_i, at_it)
                setattr(out, attr_t, at_time)
                first[tol] = False
                log(f"Residual < {tol:.0e} at iter = {at_it}")

    # Iteration-0 bookkeeping.
    stall_events = 0
    m0 = {k: float(v) for k, v in jax.device_get(metrics_prev).items()}
    res = host_res(m0, 0)
    log(f"{0:5d}    {res.err_Rp:.2e}    {res.err_Rd:.2e}    "
        f"{res.primal_obj:+.6e}    {res.dual_obj:+.6e}    "
        f"{res.rel_gap:.2e}    {sigma:.2e}      {elapsed():.2f}")
    milestones(res, 0, elapsed())
    if res.kkt < params.stop_tol:
        return finish("OPTIMAL", 0, res, sigma, 0)

    restarts = 0
    best_kkt = res.kkt
    best_kkt_it = 0
    while True:
        # Super-chunk size: the device loop exits AT the first converged
        # checkpoint (on-device stopping), so a full-size dispatch can
        # never overshoot convergence — quiet solves always use the
        # maximum (ONE compiled superchunk variant, fewest dispatches;
        # the while_loop body compiles once regardless of the bound, and
        # each dispatch through a relay-attached TPU costs a fixed
        # ~0.1 s, so 128 chunks amortise it to <1 us/iteration: measured
        # 6147 -> 7207 it/s on the 1.3M-nnz bench vs 16 chunks).
        # Verbose solves use single chunks for per-checkpoint printing.
        # Time-limit granularity becomes one dispatch (<= 19200
        # iterations), checked between dispatches as before.
        n_chunks = 1 if params.verbose else 128
        n_chunks = max(1, min(n_chunks,
                              (params.max_iter - it + check - 1) // check))

        t_disp = time.perf_counter()
        (state, rd, sigma_dev, lam_dev, metrics_prev, stacked, k_done,
         best_pt) = run_superchunk(lp, scal, state, rd, sigma_dev,
                                   lam_dev, metrics_prev, it, obj_c_dev,
                                   params.stop_tol, n_chunks, check,
                                   int(params.stall_recovery or 0),
                                   best_pt)
        k_done = int(k_done)
        stacked = {k: np.asarray(v, np.float64)
                   for k, v in jax.device_get(stacked).items()}
        t_done = time.perf_counter()

        for k in range(k_done):
            it += check
            # Time attribution within the dispatch: linear interpolation.
            t_k = (t_disp - t_alg) + (t_done - t_disp) * (k + 1) / k_done
            m_k = {key: stacked[key][k] for key in stacked}
            res = host_res(m_k, it)
            sigma = float(stacked["sigma"][k])
            restarts += int(stacked["flag"][k])
            stall_events += int(stacked["stall"][k])
            milestones(res, it, t_k)
            if params.verbose and (it % _print_step(it) == 0
                                   or res.kkt < params.stop_tol):
                log(f"{it:5d}    {res.err_Rp:.2e}    {res.err_Rd:.2e}    "
                    f"{res.primal_obj:+.6e}    {res.dual_obj:+.6e}    "
                    f"{res.rel_gap:.2e}    {sigma:.2e}      {t_k:.2f}")

        # Stopping uses the LAST chunk's state (what `state` holds).
        if res.kkt < params.stop_tol:
            return finish("OPTIMAL", it, res, sigma, restarts)
        if it >= params.max_iter:
            return finish("ITER_LIMIT", it, res, sigma, restarts)
        if elapsed() > params.time_limit:
            return finish("TIME_LIMIT", it, res, sigma, restarts)
        if params.stall_window is not None:
            # Opt-in stall detection (used by the mixed-precision
            # refinement driver: f32 plateaus below its round-off floor
            # should hand over to the next refinement stage, not burn
            # iterations until ITER_LIMIT).
            if res.kkt < 0.9 * best_kkt:
                best_kkt, best_kkt_it = res.kkt, it
            elif it - best_kkt_it > params.stall_window:
                return finish("STALLED", it, res, sigma, restarts)
