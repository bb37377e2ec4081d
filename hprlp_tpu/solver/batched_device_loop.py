"""Device-resident batched restart/sigma control: many chunks per dispatch.

Vectorised port of solver/device_loop.py to the batched shared-A path:
the per-member restart decisions, sigma re-estimation, lambda
self-correction, and per-member stopping (active masks) all run inside
one jit as a lax.while_loop over iteration chunks, so ONE dispatch
advances K * check_iter iterations for every live member (round-1 gap:
the batched path paid a host round-trip per checkpoint; reference parity
target: src/batched_solver.cu:1017-1084, which syncs every iteration —
this design is strictly more device-resident).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from .batched import run_batched_chunk
from .device_loop import METRIC_KEYS


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BatchedRestartDev:
    """Per-member device restart state (parity: BatchedRestartHost,
    reference: src/batched_solver.cu:103-120).  Every field is (B,)."""

    first_restart: jax.Array  # bool
    last_gap: jax.Array
    current_gap: jax.Array
    save_gap: jax.Array
    best_gap: jax.Array
    best_sigma: jax.Array
    inner: jax.Array
    times: jax.Array  # int32


def init_batched_restart_dev(sigma, dtype) -> BatchedRestartDev:
    B = sigma.shape[0]
    inf = jnp.full(B, jnp.inf, dtype)
    return BatchedRestartDev(
        first_restart=jnp.ones(B, bool),
        last_gap=inf, current_gap=inf, save_gap=inf, best_gap=inf,
        best_sigma=jnp.asarray(sigma, dtype),
        inner=jnp.zeros(B, dtype),
        times=jnp.zeros(B, jnp.int32))


def _vec_m_norm_dev(sigma, lam, dot, dy2, dx2):
    """(B,)-vector M-norm with per-member lambda self-correction."""
    dot2 = 2.0 * dot
    w = sigma * lam * dy2 + dx2 / sigma + dot2
    neg = w < 0
    lam_fix = jnp.where(neg & (sigma * dy2 > 0),
                        -(dot2 + dx2 / sigma)
                        / jnp.maximum(sigma * dy2, 1e-300) * 1.05, lam)
    norm = jnp.where(neg,
                     jnp.sqrt(jnp.maximum(-(dot2 + dx2 / sigma) * 0.05, 0.0)),
                     jnp.sqrt(jnp.maximum(w, 0.0)))
    return norm, lam_fix


def _bresiduals_dev(m, b_scale, c_scale, norm_b_org, norm_c_org,
                    obj_constants, is_iter0):
    obj_scale = b_scale * c_scale
    p_obj = obj_scale * m["dot_c_xbar"] + obj_constants
    d_obj = obj_scale * (m["dot_yobj_ybar"] + m["dot_xbar_zbar"]) \
        + obj_constants
    rel_gap = jnp.abs(p_obj - d_obj) / (1.0 + jnp.abs(p_obj)
                                        + jnp.abs(d_obj))
    err_Rd = c_scale * m["nrm_Rd"] / norm_c_org
    err_Rp = b_scale * m["nrm_Rp"] / norm_b_org
    err_Rp = jnp.where(is_iter0,
                       jnp.maximum(err_Rp, b_scale * m["nrm_lu_viol"]),
                       err_Rp)
    return err_Rp, err_Rd, rel_gap


def _bdecide(rd: BatchedRestartDev, sigma, lam, active, m_prev, b_scale,
             c_scale, norm_b_org, norm_c_org, obj_constants, it,
             check_iter, dtype):
    """Vectorised check_restart + update_sigma (reference
    src/batched_solver.cu:667-762 semantics, as in solver/batched.py)."""
    err_Rp, err_Rd, rel_gap = _bresiduals_dev(
        m_prev, b_scale, c_scale, norm_b_org, norm_c_org, obj_constants,
        it == 0)
    cg, lam = jax.lax.cond(
        it > 0,
        lambda: _vec_m_norm_dev(sigma, lam, m_prev["gap_dot"],
                                m_prev["gap_dy2"], m_prev["gap_dx2"]),
        lambda: (rd.current_gap, lam))

    fr = rd.first_restart & (it >= check_iter) & active
    est = jnp.logical_not(rd.first_restart) & active
    cg_est = jnp.where(cg < 0, 1e-6, cg)
    sufficient = est & (cg_est <= 0.2 * rd.last_gap)
    necessary = est & (cg_est <= 0.6 * rd.last_gap) & (cg_est > rd.save_gap)
    long_r = est & (rd.inner >= 0.2 * it)
    flag = fr | sufficient | necessary | long_r

    better = est & (rd.best_gap > cg_est)
    best_gap = jnp.where(fr, cg, jnp.where(better, cg_est, rd.best_gap))
    best_sigma = jnp.where(fr | better, sigma, rd.best_sigma)
    save_gap = jnp.where(est, cg_est, rd.save_gap)
    current_gap = jnp.where(est, cg_est, cg)

    # Sigma chain in f32 (see device_loop._decide_and_update rationale).
    f32 = jnp.float32
    pm, dm = m_prev["move_x"], m_prev["move_y"]
    ok = (pm > 1e-16) & (dm > 1e-16) & (pm < 1e12) & (dm < 1e12)
    ratio = ((pm / jnp.maximum(dm, 1e-300)) / jnp.sqrt(lam)).astype(f32)
    fact = jnp.exp((-0.05 * (current_gap
                             / jnp.maximum(best_gap, 1e-300))).astype(f32))
    temp1 = jnp.maximum(jnp.minimum(err_Rd, err_Rp),
                        jnp.minimum(rel_gap, current_gap))
    sigma_cand = jnp.exp(
        fact * jnp.log(jnp.maximum(ratio, 1e-30))
        + (1 - fact) * jnp.log(jnp.maximum(best_sigma.astype(f32), 1e-30)))
    ratio_inf = jnp.where(err_Rp > 0, err_Rd / jnp.maximum(err_Rp, 1e-300),
                          1.0).astype(f32)
    kappa = jnp.where(
        temp1 > 9e-10, jnp.asarray(1.0, f32),
        jnp.where(temp1 > 5e-10,
                  jnp.clip(jnp.sqrt(ratio_inf), 1e-2, 100.0),
                  jnp.clip(ratio_inf, 1e-2, 100.0)))
    sigma_new = jnp.where(flag,
                          jnp.where(ok, (kappa * sigma_cand).astype(dtype),
                                    jnp.asarray(1.0, dtype)),
                          sigma)

    # All members pass the first-restart boundary together (parity with
    # solver/batched.py; converged members are frozen anyway).
    clear_fr = jnp.any(fr)
    rd_new = BatchedRestartDev(
        first_restart=jnp.where(clear_fr,
                                jnp.zeros_like(rd.first_restart),
                                rd.first_restart),
        last_gap=rd.last_gap,
        current_gap=current_gap,
        save_gap=jnp.where(flag, jnp.inf, save_gap),
        best_gap=best_gap,
        best_sigma=best_sigma,
        inner=jnp.where(flag, 0.0, rd.inner),
        times=rd.times + flag.astype(jnp.int32))
    return rd_new, sigma_new, lam, flag, (err_Rp, err_Rd, rel_gap)


@functools.partial(jax.jit, static_argnames=("n_chunks", "check_iter"))
def run_batched_superchunk(lp, row_norm, col_norm, state,
                           rd: BatchedRestartDev, sigma, lam, active,
                           metrics_prev, it0, b_scale, c_scale,
                           norm_b_org, norm_c_org, obj_constants,
                           stop_tol, n_chunks: int, check_iter: int):
    """Advance up to n_chunks * check_iter iterations with on-device
    per-member restarts, sigma updates, and stopping: a member whose
    relative KKT drops below stop_tol is frozen (active=False) at that
    chunk boundary; the loop exits early once every member is frozen.

    Returns (state, rd, sigma, lam, active, m_last, stacked, k_done):
    stacked[k] carries each chunk's per-member metric vectors plus
    sigma/flag/active for host bookkeeping.
    """
    dtype = lp.c.dtype
    B = sigma.shape[0]
    stop_tol = jnp.asarray(stop_tol, dtype)
    buf = {k: jnp.zeros((n_chunks, B), dtype) for k in METRIC_KEYS}
    buf["sigma"] = jnp.zeros((n_chunks, B), dtype)
    buf["flag"] = jnp.zeros((n_chunks, B), dtype)
    buf["active"] = jnp.zeros((n_chunks, B), dtype)

    def cond(carry):
        _, _, _, _, active, _, _, k, _ = carry
        return (k < n_chunks) & jnp.any(active)

    def body(carry):
        state, rd, sigma, lam, active, m_prev, it, k, buf = carry
        rd, sigma, lam, flag, _ = _bdecide(
            rd, sigma, lam, active, m_prev, b_scale, c_scale, norm_b_org,
            norm_c_org, obj_constants, it, check_iter, dtype)
        state, m = run_batched_chunk(lp, row_norm, col_norm, state, sigma,
                                     lam, flag, active,
                                     jnp.asarray(check_iter, jnp.int32))
        lg, lam = _vec_m_norm_dev(sigma, lam, m["fs_dot"], m["fs_dy2"],
                                  m["fs_dx2"])
        rd = dataclasses.replace(
            rd,
            last_gap=jnp.where(flag, lg, rd.last_gap),
            inner=rd.inner + jnp.where(active, float(check_iter), 0.0))
        it = it + check_iter
        buf = dict(buf)
        for key in METRIC_KEYS:
            buf[key] = buf[key].at[k].set(m[key].astype(dtype))
        buf["sigma"] = buf["sigma"].at[k].set(sigma)
        buf["flag"] = buf["flag"].at[k].set(flag.astype(dtype))
        buf["active"] = buf["active"].at[k].set(active.astype(dtype))
        # Per-member stopping on the NEW boundary.
        err_Rp, err_Rd, rel_gap = _bresiduals_dev(
            m, b_scale, c_scale, norm_b_org, norm_c_org, obj_constants,
            False)
        kkt = jnp.maximum(jnp.maximum(err_Rp, err_Rd), rel_gap)
        active = active & (kkt >= stop_tol)
        return (state, rd, sigma, lam, active, m, it, k + 1, buf)

    init = (state, rd, sigma, lam, active, metrics_prev,
            jnp.asarray(it0, jnp.int32), jnp.asarray(0, jnp.int32), buf)
    state, rd, sigma, lam, active, m_last, _, k_done, buf = \
        jax.lax.while_loop(cond, body, init)
    return state, rd, sigma, lam, active, m_last, buf, k_done
