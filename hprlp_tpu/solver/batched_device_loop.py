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
from .device_loop import (METRIC_KEYS, _m_norm_dev, _residuals_core,
                          _sigma_chain)


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


# The M-norm, residual, and sigma-chain math is SHARED with the single-LP
# device loop (device_loop._m_norm_dev/_residuals_core/_sigma_chain): all
# three are elementwise jnp, so they apply to (B,) vectors unchanged.
# (Round-2 review: the batched copies had silently drifted from two
# single-path fixes — the best_sigma fallback on degenerate movement and
# the restart-gated lambda update; sharing removes the drift channel.)
_bresiduals_dev = _residuals_core


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
        lambda: _m_norm_dev(sigma, lam, m_prev["gap_dot"],
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

    # Shared sigma chain (device_loop._sigma_chain), including the
    # best_sigma fallback on degenerate movement — the batched path
    # previously kept the reference's 1.0-reset, which destroys f32
    # solves of vertex-pinned members (see the shared comment).
    sigma_new = _sigma_chain(m_prev, lam, current_gap, best_gap, best_sigma,
                             err_Rp, err_Rd, rel_gap, sigma, flag, dtype)

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
        lg, lam_fix = _m_norm_dev(sigma, lam, m["fs_dot"], m["fs_dy2"],
                                  m["fs_dx2"])
        # Gate BOTH outputs on the restart flag, like the single-LP body
        # (device_loop.run_superchunk): a non-restart boundary must not
        # inflate lambda from the stale fs_* parts.
        lam = jnp.where(flag, lam_fix, lam)
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
