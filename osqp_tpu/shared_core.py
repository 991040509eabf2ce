"""Shared-structure batched solver — the MPC/scenario headline path.

All problems share one P and A (only q, l, u and starts vary). Consequences
exploited here (BASELINE.md "factorization cached across batch"):

  * ONE Ruiz equilibration and ONE KKT factorization/inverse for the whole
    batch (vs per-lane (B,n,n) factors);
  * a single shared rho_vec, adapted from aggregate residuals, so a rho
    update refactorizes one matrix;
  * the fused Pallas kernel (ops/shared_iter.py) iterates groups of G
    problems with full-row GEMMs — MXU utilization G/128 instead of 1/128;
  * all residual/termination math is shared-A batched einsums.

Constraint-type classification (loose/eq for rho boosting) aggregates across
the batch: a row is loose/eq only if it is so in every lane.

Scaling note: the cost normalization c is computed from the batch-max |q̄|
column norms (a representative for the whole batch). Any consistent (D, E, c)
yields correct unscaled residuals, so termination remains exact per lane.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from . import constants as C
from .linalg import chol_factor, with_precision
from .scaling import _limit_scaling
from .types import DynParams, SolveOutput

_DIV_GUARD = 1e-10

#: Mixed-precision phase switch: drop from bf16 to f32 chunks once the
#: fastest still-running lane is within this factor of its termination
#: tolerance (bf16 iteration noise would otherwise block convergence).
_LOWP_SWITCH_RATIO = 10.0
#: ... or once a chunk improves the global closeness ratio by less than
#: this fraction (bf16 plateau reached before the switch ratio — e.g. very
#: tight eps targets).
_LOWP_STALL_FRAC = 0.95


# ---------------------------------------------------------------------------
# Shared scaling (modified Ruiz on shared P, A; batch-max q for cost norm)
# ---------------------------------------------------------------------------

class SharedScaling(NamedTuple):
    D: jnp.ndarray     # (n,)
    E: jnp.ndarray     # (m,)
    c: jnp.ndarray     # scalar
    Dinv: jnp.ndarray
    Einv: jnp.ndarray
    cinv: jnp.ndarray


def shared_ruiz(P, A, q_absmax, n_iters):
    """Equilibrate shared (P, A); ``q_absmax`` is max over the batch of |q|."""
    dtype = P.dtype
    n = P.shape[0]
    m = A.shape[0]
    one = jnp.ones((), dtype)

    def body(_, carry):
        P, A, qm, D, E, c = carry
        p_col = jnp.max(jnp.abs(P), axis=0)
        a_col = jnp.max(jnp.abs(A), axis=0) if m else jnp.zeros((n,), dtype)
        dd = 1.0 / jnp.sqrt(_limit_scaling(jnp.maximum(p_col, a_col)))
        de = (1.0 / jnp.sqrt(_limit_scaling(jnp.max(jnp.abs(A), axis=1)))
              if m else jnp.zeros((0,), dtype))
        P = (dd[:, None] * P) * dd[None, :]
        A = (de[:, None] * A) * dd[None, :]
        qm = dd * qm
        D = D * dd
        E = E * de
        gamma = 1.0 / _limit_scaling(
            jnp.maximum(jnp.mean(jnp.max(jnp.abs(P), axis=0)),
                        jnp.max(qm) if n else 0.0))
        return P * gamma, A, qm * gamma, D, E, c * gamma

    P, A, _, D, E, c = lax.fori_loop(
        0, n_iters, body,
        (P, A, q_absmax, jnp.ones((n,), dtype), jnp.ones((m,), dtype), one))
    scal = SharedScaling(D=D, E=E, c=c, Dinv=1.0 / D, Einv=1.0 / E,
                         cinv=1.0 / c)
    return P, A, scal


# ---------------------------------------------------------------------------
# Shared-A batched residuals / termination / certificates
# ---------------------------------------------------------------------------

def _row_norm(M):  # (B, k) -> (B,) inf-norm per row
    if M.shape[1] == 0:
        return jnp.zeros((M.shape[0],), M.dtype)
    return jnp.max(jnp.abs(M), axis=1)


class BRes(NamedTuple):
    pri_res: jnp.ndarray
    dua_res: jnp.ndarray
    pri_norm: jnp.ndarray
    dua_norm: jnp.ndarray


def shared_residuals(P, A, qb, scal, dyn, x, y, z) -> BRes:
    st = dyn.scaled_termination.astype(bool)
    Einv = jnp.where(st, jnp.ones_like(scal.Einv), scal.Einv)
    Dinv = jnp.where(st, jnp.ones_like(scal.Dinv), scal.Dinv)
    cinv = jnp.where(st, jnp.ones_like(scal.cinv), scal.cinv)

    Ax = x @ A.T          # (B, m)
    Px = x @ P            # P symmetric
    Aty = y @ A           # (B, n)

    pri_res = _row_norm(Einv * (Ax - z))
    pri_norm = jnp.maximum(_row_norm(Einv * Ax), _row_norm(Einv * z))
    dua_res = cinv * _row_norm(Dinv * (Px + qb + Aty))
    dua_norm = cinv * jnp.maximum(
        jnp.maximum(_row_norm(Dinv * Px), _row_norm(Dinv * Aty)),
        _row_norm(Dinv * qb))
    return BRes(pri_res, dua_res, pri_norm, dua_norm)


def shared_primal_inf(A, lb, ub, scal, dy_bar, eps):
    dtype = dy_bar.dtype
    dy = scal.cinv * scal.E * dy_bar
    nrm = _row_norm(dy)
    s = 1.0 / jnp.maximum(nrm, _DIV_GUARD)[:, None]
    dyn_ = dy * s
    At_dy = scal.Dinv * ((scal.Einv * dyn_) @ A)
    cond_mat = _row_norm(At_dy) <= eps
    u = scal.Einv * ub
    l = scal.Einv * lb
    u_inf = u >= C.INFTY_THRESH
    l_inf = l <= -C.INFTY_THRESH
    dyp = jnp.maximum(dyn_, 0.0)
    dym = jnp.minimum(dyn_, 0.0)
    bound_ok = jnp.all(
        jnp.where(u_inf, dyp <= eps, True)
        & jnp.where(l_inf, -dym <= eps, True), axis=1)
    lhs = jnp.sum(jnp.where(u_inf, 0.0, u * dyp)
                  + jnp.where(l_inf, 0.0, l * dym), axis=1)
    detected = (nrm > eps) & cond_mat & bound_ok & (lhs < -eps)
    return detected, dyn_


def shared_dual_inf(P, A, qb, lb, ub, scal, dx_bar, eps):
    dx = scal.D * dx_bar
    nrm = _row_norm(dx)
    s = 1.0 / jnp.maximum(nrm, _DIV_GUARD)[:, None]
    dxn = dx * s
    dxn_bar = dx_bar * s
    P_dx = scal.cinv * scal.Dinv * (dxn_bar @ P)
    cond_P = _row_norm(P_dx) <= eps
    q_u = scal.cinv * scal.Dinv * qb
    cond_q = jnp.sum(q_u * dxn, axis=1) < -eps
    A_dx = scal.Einv * (dxn_bar @ A.T)
    u = scal.Einv * ub
    l = scal.Einv * lb
    u_inf = u >= C.INFTY_THRESH
    l_inf = l <= -C.INFTY_THRESH
    cond_A = jnp.all(jnp.where(u_inf, True, A_dx <= eps)
                     & jnp.where(l_inf, True, A_dx >= -eps), axis=1)
    detected = (nrm > eps) & cond_P & cond_q & cond_A
    return detected, dxn


def shared_check(P, A, qb, lb, ub, scal, dyn, x, y, z, dx, dy,
                 eps_factor, accurate: bool):
    res = shared_residuals(P, A, qb, scal, dyn, x, y, z)
    eps_abs = dyn.eps_abs * eps_factor
    eps_rel = dyn.eps_rel * eps_factor
    solved = ((res.pri_res <= eps_abs + eps_rel * res.pri_norm)
              & (res.dua_res <= eps_abs + eps_rel * res.dua_norm))
    prim, _ = shared_primal_inf(A, lb, ub, scal, dy,
                                dyn.eps_prim_inf * eps_factor)
    dual, _ = shared_dual_inf(P, A, qb, lb, ub, scal, dx,
                              dyn.eps_dual_inf * eps_factor)
    bad = (jnp.isnan(res.pri_res) | jnp.isnan(res.dua_res)
           | (res.pri_res > C.OSQP_INFTY) | (res.dua_res > C.OSQP_INFTY))
    s_solved = C.SOLVED if accurate else C.SOLVED_INACCURATE
    s_pinf = C.PRIMAL_INFEASIBLE if accurate else C.PRIMAL_INFEASIBLE_INACCURATE
    s_dinf = C.DUAL_INFEASIBLE if accurate else C.DUAL_INFEASIBLE_INACCURATE
    status = jnp.where(
        bad, C.NON_CONVEX,
        jnp.where(solved, s_solved,
                  jnp.where(prim, s_pinf,
                            jnp.where(dual, s_dinf, C.RUNNING))))
    return status.astype(jnp.int32), res


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------

class FactorCache(NamedTuple):
    """Persistent KKT factor state carried across prepared re-solves.

    Mirrors the reference's C-workspace economics: ``update!``/``solve!``
    cycles mutate one workspace whose factorization and adaptively-tuned rho
    persist (src/interface.jl:408-440). ``Rinv`` is the shared reduced-KKT
    inverse at ``rho_vec``; a prepared solve reuses it when the rho vector
    implied by the current bounds classification matches, else refactorizes
    once in-jit."""
    Rinv: jnp.ndarray      # (n, n)
    rho_vec: jnp.ndarray   # (m,)
    rho_inv: jnp.ndarray   # (m,)
    rho_bar: jnp.ndarray   # scalar


def _init_factor(P, A, sigma, loose, eq, factor0, rho_dyn):
    """Initial (rho_vec, rho_inv, Rinv, rho_bar) for a solve.

    With ``factor0`` given, rho comes from the cache and ``Rinv`` is reused
    when the rho vector (from the CURRENT loose/eq classification) matches
    the cached one bit-for-bit; otherwise one refactorization runs in-jit
    (bounds reclassification or a caller rho override)."""
    if factor0 is None:
        rho0 = jnp.clip(jnp.asarray(rho_dyn, P.dtype), C.RHO_MIN, C.RHO_MAX)
        rho_vec, rho_inv = _shared_rho_vec(loose, eq, rho0)
        return rho_vec, rho_inv, _shared_inverse(P, A, sigma, rho_vec), rho0
    rho0 = jnp.clip(jnp.asarray(factor0.rho_bar, P.dtype),
                    C.RHO_MIN, C.RHO_MAX)
    rho_vec, rho_inv = _shared_rho_vec(loose, eq, rho0)
    same = (factor0.rho_vec.shape == rho_vec.shape) and True
    reuse = jnp.all(rho_vec == factor0.rho_vec) if same else jnp.bool_(False)
    Rinv = lax.cond(
        reuse,
        lambda _: factor0.Rinv,
        lambda _: _shared_inverse(P, A, sigma, rho_vec), None)
    return rho_vec, rho_inv, Rinv, rho0


class SCarry(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    x_prev: jnp.ndarray
    y_prev: jnp.ndarray
    Rinv: jnp.ndarray       # (n, n) shared
    rho_vec: jnp.ndarray    # (m,) shared
    rho_inv: jnp.ndarray
    rho_bar: jnp.ndarray    # scalar
    it: jnp.ndarray
    status: jnp.ndarray     # (B,)
    iters: jnp.ndarray
    pri_res: jnp.ndarray
    dua_res: jnp.ndarray
    rho_estimate: jnp.ndarray  # scalar
    rho_updates: jnp.ndarray   # scalar int32
    # --- lane-compaction state (warm-re-solve tail fix): live lanes are
    # packed into a prefix at chunk boundaries; the kernel skips whole
    # finished groups. Per-lane data rides in the carry because it is
    # permuted along with the iterates.
    qb: jnp.ndarray         # (B, n) permuted per-lane cost
    lb: jnp.ndarray         # (B, m)
    ub: jnp.ndarray         # (B, m)
    order: jnp.ndarray      # (B,) int32: slot -> original lane index
    nlive: jnp.ndarray      # scalar int32: live lanes (packed prefix size)
    # --- mixed-precision state (``lowp`` mode): chunks run the iteration
    # matmuls in bf16 until ``fine`` flips, then full f32. ``last_ratio``
    # is the best (smallest) global residual-closeness ratio seen so far,
    # for the stall detector.
    fine: jnp.ndarray       # scalar bool: full-precision phase reached
    last_ratio: jnp.ndarray  # scalar dtype
    # shared-rho ping-pong back-off (same rule as core.Carry — a direction
    # reversal doubles the gap to the next permitted update; automatic
    # interval mode only, dyn.rho_backoff)
    rho_dir: jnp.ndarray    # scalar int32
    rho_gap: jnp.ndarray    # scalar int32
    next_rho: jnp.ndarray   # scalar int32


def _shared_rho_vec(loose, eq, rho_bar):
    rho_bar = jnp.clip(rho_bar, C.RHO_MIN, C.RHO_MAX)
    rho_eq = jnp.clip(C.RHO_EQ_OVER_RHO_INEQ * rho_bar, C.RHO_MIN, C.RHO_MAX)
    rv = jnp.where(loose, C.RHO_MIN, jnp.where(eq, rho_eq, rho_bar))
    return rv, 1.0 / rv


def _shared_R(P, A, sigma, rho_vec):
    n = P.shape[0]
    R = P + sigma * jnp.eye(n, dtype=P.dtype)
    if A.shape[0] > 0:
        R = R + (A.T * rho_vec[None, :]) @ A
    return 0.5 * (R + R.T)


def _chol_inverse(R):
    L = chol_factor(R)
    eye = jnp.eye(R.shape[0], dtype=R.dtype)
    w = lax.linalg.triangular_solve(L, eye, left_side=True, lower=True)
    return lax.linalg.triangular_solve(L, w, left_side=True, lower=True,
                                       transpose_a=True)


def _shared_inverse(P, A, sigma, rho_vec):
    return _chol_inverse(_shared_R(P, A, sigma, rho_vec))


#: NEGATIVE RESULT (round 5, kept as a record): Newton–Schulz warm
#: refactorization from the previous inverse — pure MXU GEMMs replacing
#: the exact path's two sequential n×n triangular solves — was measured a
#: LOSS on the headline workload both ways it can be gated. Gated at
#: machine-epsilon backward error it always falls back (the NS fixed
#: point floors at ~kappa(R)*eps) and pays NS + exact = 1.55× slower;
#: gated at the kappa floor (2e-2 rms) the accepted inexact inverse
#: degrades iterate quality and adds ~40% more ADMM iterations
#: (125 → 176 mean, clock-normalized A/B on chip). The refactorization
#: epochs' triangular-solve latency is real, but the cure is fewer
#: refactors (the ping-pong back-off), not a cheaper inexact inverse.

@with_precision
def solve_batch_shared(P, A, qb, lb, ub, scal: SharedScaling, dyn: DynParams,
                       x0, y0, z0, group: int = 128,
                       interpret: bool = False,
                       axis_name=None, factor0: FactorCache = None,
                       with_factor: bool = False,
                       lowp: bool = False,
                       tf32: bool = False) -> SolveOutput:
    """Batched solve with shared (scaled) P, A. Per-lane qb/lb/ub are scaled;
    x0/y0/z0 are scaled starts.

    ``axis_name``: under shard_map over the batch axis, the cross-lane
    reductions (loop continuation, aggregate rho, constraint classification)
    become psum-based so all devices take identical decisions.

    ``factor0``/``with_factor``: prepared-workspace mode — start from a
    cached :class:`FactorCache` and/or return the final one so the caller
    can carry the adapted factor into the next re-solve.

    ``lowp`` (``Settings.mixed_precision``): start with bf16 iteration
    matmuls (single-pass MXU rate) and switch to full f32 chunks once any
    lane is within ``_LOWP_SWITCH_RATIO`` of terminating or the bf16
    plateau is reached. Termination residuals are always computed in f32
    from the actual iterates, so a low-precision chunk can never declare a
    lane Solved spuriously; infeasibility certificates are deferred to the
    full-precision phase (δx/δy of a bf16 chunk are noise-contaminated).

    ``tf32`` (``Settings.matmul_precision="tensorfloat32"``): run the leg
    kernels with bf16x3 split products (~4e-6/product — convergence is
    normally unaffected and iteration counts match f32), with the SAME
    stall detector as ``lowp`` as a safety net: a leg that fails to
    improve the closeness ratio (a tf32 noise plateau — seen on
    eq-boosted-rho problems, where the plateau also biases the scale-free
    rho estimate into the no-trigger band) switches the remaining legs to
    full f32, so every lane the f32 engine solves decisively stays Solved
    (convergence-marginal lanes may move between the marginal statuses,
    as under any trajectory perturbation). ``lowp`` supersedes ``tf32``
    when both are set (the bf16 phase ladder already ends at full f32)."""
    from .ops.shared_iter import admm_iterate_shared

    tf32 = tf32 and not lowp  # mixed_precision supersedes (see docstring)
    dtype = P.dtype
    B, n = x0.shape
    m = y0.shape[1]

    # aggregated constraint classification (global across devices when
    # shard_map'd, so every device builds the identical rho_vec/factor)
    loose_b = (lb <= -C.INFTY_THRESH) & (ub >= C.INFTY_THRESH)
    eq_b = (~loose_b) & (ub - lb < C.RHO_TOL)
    loose = jnp.all(loose_b, axis=0)
    eq = jnp.all(eq_b, axis=0) & ~loose
    if axis_name is not None:
        ndev = lax.psum(jnp.ones((), jnp.int32), axis_name)
        loose = lax.psum(loose.astype(jnp.int32), axis_name) == ndev
        eq = (lax.psum(eq.astype(jnp.int32), axis_name) == ndev) & ~loose

    rho_vec, rho_inv, Rinv0, rho0 = _init_factor(
        P, A, dyn.sigma, loose, eq, factor0, dyn.rho_bar)

    chunk = jnp.maximum(dyn.check_termination, 1)
    rho_int = jnp.maximum(
        jnp.round(jnp.maximum(dyn.adaptive_rho_interval, 1) / chunk), 1
    ).astype(jnp.int32) * chunk

    inf0 = jnp.full((B,), jnp.inf, dtype)
    carry0 = SCarry(
        x=x0, y=y0, z=z0, x_prev=x0, y_prev=y0, Rinv=Rinv0,
        rho_vec=rho_vec, rho_inv=rho_inv, rho_bar=rho0,
        it=jnp.int32(0),
        status=jnp.full((B,), C.RUNNING, jnp.int32),
        iters=jnp.zeros((B,), jnp.int32),
        pri_res=inf0, dua_res=inf0,
        rho_estimate=rho0, rho_updates=jnp.int32(0),
        qb=qb, lb=lb, ub=ub,
        order=jnp.arange(B, dtype=jnp.int32),
        nlive=jnp.int32(B),
        fine=jnp.asarray(not (lowp or tf32)),
        last_ratio=jnp.asarray(jnp.inf, dtype),
        rho_dir=jnp.asarray(dyn.rho_dir0, jnp.int32),
        rho_gap=jnp.where(jnp.asarray(dyn.rho_gap0, jnp.int32) > 0,
                          jnp.asarray(dyn.rho_gap0, jnp.int32),
                          jnp.asarray(rho_int, jnp.int32)),
        next_rho=jnp.asarray(dyn.next_rho0, jnp.int32),
    )

    G = min(group, B)
    compact = B >= 2 * G  # pointless below two groups

    def _gany(v):
        # global any() across the (possibly device-split) batch
        if axis_name is None:
            return jnp.any(v)
        return lax.psum(jnp.any(v).astype(jnp.int32), axis_name) > 0

    def _gsum(v):
        if axis_name is None:
            return jnp.sum(v)
        return lax.psum(jnp.sum(v), axis_name)

    def cond_fun(c: SCarry):
        return _gany(c.status == C.RUNNING) & (c.it < dyn.max_iter)

    def body_fun(c: SCarry, leg_tf32: bool = False) -> SCarry:
        live = c.status == C.RUNNING
        lx = live[:, None]
        live_groups = (c.nlive + (G - 1)) // G if compact else None

        if lowp:
            # bf16/mixed mode: iterate in check_termination-sized chunks
            # with the lightweight iteration kernel; classification happens
            # in f32 XLA (an f32 in-kernel check can't run on bf16 state).
            K = jnp.minimum(chunk, dyn.max_iter - c.it)

            def _kern(lp: bool):
                return admm_iterate_shared(
                    c.Rinv, A, c.rho_vec, c.rho_inv, c.qb, c.lb, c.ub,
                    c.x, c.y, c.z, dyn.sigma, dyn.alpha, K, group=group,
                    interpret=interpret, live_groups=live_groups, lowp=lp)

            x_new, y_new, z_new, xp, yp = lax.cond(
                c.fine, lambda _: _kern(False), lambda _: _kern(True), None)

            x_new = jnp.where(lx, x_new, c.x)
            y_new = jnp.where(lx, y_new, c.y)
            z_new = jnp.where(lx, z_new, c.z)
            # chunk-window certificate deltas: snapshot the start of
            # every 4th chunk (see core.solve_scaled body_fun for the f32
            # cancellation rationale and the 4x-window margin)
            snapb = (c.it % (chunk * 4) == 0)
            x_prev = jnp.where(lx & snapb, c.x, c.x_prev)
            y_prev = jnp.where(lx & snapb, c.y, c.y_prev)

            it = c.it + K
            dx = x_new - x_prev
            dy = y_new - y_prev

            status_new, res = shared_check(
                P, A, c.qb, c.lb, c.ub, scal, dyn, x_new, y_new, z_new,
                dx, dy, jnp.asarray(1.0, dtype), accurate=True)
            check_on = dyn.check_termination > 0
            status = jnp.where(live & check_on, status_new, c.status)
            # bf16 phase: Solved (f32-verified residuals) and Non_convex
            # (NaN breakdown) may be declared; infeasibility certificates
            # wait for the full-precision phase — the stall detector
            # guarantees genuinely infeasible batches reach it.
            benign = ((status_new == C.SOLVED) | (status_new == C.RUNNING)
                      | (status_new == C.NON_CONVEX))
            status = jnp.where(c.fine | benign, status, c.status)
        else:
            # full-precision mode: run a whole leg (up to the next
            # rho-adaptation boundary) in ONE kernel invocation with
            # in-kernel classification every check_termination iterations —
            # same iterates, same check iterations, ~rho_interval/chunk
            # fewer XLA epochs than the chunked design.
            K = jnp.minimum(rho_int - c.it % rho_int, dyn.max_iter - c.it)
            from .ops.solve_kernel import admm_solve_shared

            st = dyn.scaled_termination.astype(bool)
            Einv_eff = jnp.where(st, jnp.ones_like(scal.Einv), scal.Einv)
            Dinv_eff = jnp.where(st, jnp.ones_like(scal.Dinv), scal.Dinv)
            cinv_eff = jnp.where(st, jnp.ones_like(scal.cinv), scal.cinv)

            # leg precision is STATIC per loop (the tf32 fallback runs
            # as a second while_loop over the f32 body — a per-leg
            # lax.cond between two Mosaic kernels measurably serializes
            # dispatch on the relayed runtime)
            (xk, yk, zk, xpk, ypk, st_k, it_k, pri_k, dua_k, prn_k,
             dun_k) = admm_solve_shared(
                c.Rinv, P, A, c.rho_vec, c.rho_inv, Einv_eff, Dinv_eff,
                cinv_eff, c.qb, c.lb, c.ub, c.x, c.y, c.z,
                dyn.sigma, dyn.alpha, K, dyn.check_termination,
                dyn.eps_abs, dyn.eps_rel, scal=scal,
                eps_pinf=dyn.eps_prim_inf, eps_dinf=dyn.eps_dual_inf,
                status0=c.status, it0=c.it, live_groups=live_groups,
                group=group, interpret=interpret, tf32=leg_tf32)

            x_new = jnp.where(lx, xk, c.x)
            y_new = jnp.where(lx, yk, c.y)
            z_new = jnp.where(lx, zk, c.z)
            x_prev = jnp.where(lx, xpk, c.x_prev)
            y_prev = jnp.where(lx, ypk, c.y_prev)
            it = c.it + K
            status = jnp.where(live, st_k, c.status)
            iters_k = it_k

            def _res_from_kernel(_):
                return BRes(pri_k, dua_k, prn_k, dun_k)

            def _res_from_xla(_):
                # check_termination == 0: the kernel never computed
                # residuals — the rho estimate still needs them
                return shared_residuals(P, A, c.qb, scal, dyn, x_new,
                                        y_new, z_new)

            res = lax.cond(dyn.check_termination > 0, _res_from_kernel,
                           _res_from_xla, None)

        if lowp:
            iters = jnp.where(live & (status != C.RUNNING), it, c.iters)
        else:
            iters = jnp.where(live & (status != C.RUNNING), iters_k,
                              c.iters)

        do_rho = (dyn.adaptive_rho != 0) & (it % rho_int == 0)

        def adapt(_):
            still = status == C.RUNNING
            pri_rel = res.pri_res / jnp.maximum(res.pri_norm, _DIV_GUARD)
            dua_rel = jnp.maximum(
                res.dua_res / jnp.maximum(res.dua_norm, _DIV_GUARD),
                _DIV_GUARD)
            est_lane = jnp.clip(c.rho_bar * jnp.sqrt(pri_rel / dua_rel),
                                C.RHO_MIN, C.RHO_MAX)
            est_lane = jnp.where(jnp.isfinite(est_lane), est_lane, c.rho_bar)
            # aggregate: geometric mean over still-running lanes (global
            # across devices when sharded)
            w = still.astype(dtype)
            cnt = jnp.maximum(_gsum(w), 1.0)
            est = jnp.exp(_gsum(w * jnp.log(est_lane)) / cnt)
            est = jnp.clip(est, C.RHO_MIN, C.RHO_MAX)
            # no lanes still running -> geometric mean over an empty set
            # would report exp(0)=1; keep the rho actually in use instead
            est = jnp.where(_gany(still), est, c.rho_bar)
            trig = (_gany(still)
                    & ((dyn.rho_backoff == 0) | (it >= c.next_rho))
                    & ((est > c.rho_bar * dyn.adaptive_rho_tolerance)
                       | (est < c.rho_bar / dyn.adaptive_rho_tolerance)))

            def refactor(_):
                rv, ri = _shared_rho_vec(loose, eq, est)
                return (est, rv, ri,
                        _shared_inverse(P, A, dyn.sigma, rv),
                        c.rho_updates + 1)

            def keep(_):
                return (c.rho_bar, c.rho_vec, c.rho_inv, c.Rinv,
                        c.rho_updates)

            rb, rv, ri, Ri, ru = lax.cond(trig, refactor, keep, None)
            # ping-pong back-off (see SCarry; identical on every device —
            # est/trig are psum-aggregated, so the schedule stays in
            # lockstep under shard_map)
            backoff = trig & (dyn.rho_backoff != 0)
            dir_new = jnp.where(est > c.rho_bar, jnp.int32(1),
                                jnp.int32(-1))
            reversal = (dir_new * c.rho_dir) < 0
            gap2 = jnp.where(
                backoff,
                jnp.where(reversal,
                          jnp.minimum(c.rho_gap * 2, jnp.int32(1 << 24)),
                          c.rho_gap),
                c.rho_gap)
            next2 = jnp.where(backoff, it + gap2, c.next_rho)
            dir2 = jnp.where(trig, dir_new, c.rho_dir)
            return rb, rv, ri, Ri, ru, est, dir2, gap2, next2

        def no_adapt(_):
            return (c.rho_bar, c.rho_vec, c.rho_inv, c.Rinv, c.rho_updates,
                    c.rho_estimate, c.rho_dir, c.rho_gap, c.next_rho)

        (rho_bar2, rho_vec2, rho_inv2, Rinv2, rho_upd2, rho_est2,
         rho_dir2, rho_gap2, next_rho2) = lax.cond(
            do_rho, adapt, no_adapt, None)

        if lowp or leg_tf32:
            # precision-phase switch: closeness ratio of the fastest
            # still-running lane (global across devices when sharded)
            den_p = jnp.maximum(dyn.eps_abs + dyn.eps_rel * res.pri_norm,
                                _DIV_GUARD)
            den_d = jnp.maximum(dyn.eps_abs + dyn.eps_rel * res.dua_norm,
                                _DIV_GUARD)
            ratio = jnp.maximum(res.pri_res / den_p, res.dua_res / den_d)
            ratio = jnp.where(status == C.RUNNING, ratio,
                              jnp.asarray(jnp.inf, dtype))
            rmin = jnp.min(ratio)
            if axis_name is not None:
                rmin = lax.pmin(rmin, axis_name)
            near = rmin < _LOWP_SWITCH_RATIO
            stalled = rmin > _LOWP_STALL_FRAC * c.last_ratio
            if lowp:
                fine2 = c.fine | near | stalled
            else:
                # tf32 legs CAN converge to eps (unlike bf16 chunks), so
                # only a genuine plateau forces the f32 fallback
                fine2 = c.fine | stalled
            last_ratio2 = jnp.minimum(rmin, c.last_ratio)
        else:
            fine2 = c.fine
            last_ratio2 = c.last_ratio

        nxt = SCarry(
            x=x_new, y=y_new, z=z_new, x_prev=x_prev, y_prev=y_prev,
            Rinv=Rinv2, rho_vec=rho_vec2, rho_inv=rho_inv2, rho_bar=rho_bar2,
            it=it, status=status, iters=iters,
            pri_res=jnp.where(live, res.pri_res, c.pri_res),
            dua_res=jnp.where(live, res.dua_res, c.dua_res),
            rho_estimate=jnp.where(do_rho, rho_est2, c.rho_estimate),
            rho_updates=rho_upd2,
            qb=c.qb, lb=c.lb, ub=c.ub, order=c.order, nlive=c.nlive,
            fine=fine2, last_ratio=last_ratio2,
            rho_dir=rho_dir2, rho_gap=rho_gap2, next_rho=next_rho2,
        )
        if not compact:
            return nxt

        # ---- pack live lanes into the prefix (stable: preserves relative
        # order so already-packed prefixes barely move). The pack itself is
        # not free (argsort + 13 gathers over the whole batch ≈ 2 kernel
        # chunks of work), so it only runs when it unlocks at least one
        # more skippable group — early chunks with few finished lanes pay
        # nothing. ----
        dead = status != C.RUNNING
        nlive_now = jnp.sum(~dead).astype(jnp.int32)
        cur_groups = (c.nlive + (G - 1)) // G
        new_groups = (nlive_now + (G - 1)) // G
        # nlive_now > 0: when the whole batch just finished (the common
        # warm re-solve case — every lane converges at the same check),
        # the loop exits anyway and a pack here is pure waste (argsort +
        # 13 gathers, ~0.3 ms/step inside a rollout)
        worth_packing = (new_groups < cur_groups) & (nlive_now > 0)

        def pack(t: SCarry) -> SCarry:
            perm = jnp.argsort(dead, stable=True)

            def _take(v):
                return jnp.take(v, perm, axis=0)

            return t._replace(
                x=_take(t.x), y=_take(t.y), z=_take(t.z),
                x_prev=_take(t.x_prev), y_prev=_take(t.y_prev),
                status=_take(t.status), iters=_take(t.iters),
                pri_res=_take(t.pri_res), dua_res=_take(t.dua_res),
                qb=_take(t.qb), lb=_take(t.lb), ub=_take(t.ub),
                order=_take(t.order), nlive=nlive_now,
            )

        return lax.cond(worth_packing, pack, lambda t: t, nxt)

    if tf32:
        # phase 1: tf32 legs until done OR the stall detector latches
        # ``fine``; phase 2: full-f32 legs for whatever remains. Statically
        # two loop bodies — no runtime kernel selection on the hot path.
        mid = lax.while_loop(
            lambda c: cond_fun(c) & jnp.logical_not(c.fine),
            lambda c: body_fun(c, leg_tf32=True), carry0)
        final = lax.while_loop(cond_fun, body_fun, mid)
    else:
        final = lax.while_loop(cond_fun, body_fun, carry0)

    if compact:
        # restore original lane order: order[slot] = original index —
        # skipped entirely (lax.cond) when no pack ever fired, so the
        # all-lanes-finish-together warm path pays nothing for compaction
        iota = jnp.arange(B, dtype=jnp.int32)

        def _unscatter(t: SCarry) -> SCarry:
            def _scatter(v):
                return jnp.zeros_like(v).at[t.order].set(v)

            return t._replace(
                x=_scatter(t.x), y=_scatter(t.y), z=_scatter(t.z),
                x_prev=_scatter(t.x_prev), y_prev=_scatter(t.y_prev),
                status=_scatter(t.status), iters=_scatter(t.iters),
                pri_res=_scatter(t.pri_res), dua_res=_scatter(t.dua_res),
                order=iota,
            )

        final = lax.cond(jnp.any(final.order != iota), _unscatter,
                         lambda t: t, final)
        final = final._replace(qb=qb, lb=lb, ub=ub)

    # ---- finalize ----
    hit_max = final.status == C.RUNNING
    dx = final.x - final.x_prev
    dy = final.y - final.y_prev

    # the max_iter re-checks only matter for lanes that ran out of
    # iterations — skip their batched matmuls entirely on the hot
    # all-solved path (the common warm re-solve case). Two passes, as the
    # C core does after its loop: one ACCURATE check at the final iterate
    # (the leg kernel's in-kernel checks land only on check_termination
    # multiples, so a lane converging between the last multiple and
    # max_iter is classified here), then the 10x-loosened approximate
    # check for the inaccurate statuses.
    def _final(_):
        st_a, rs_a = shared_check(
            P, A, qb, lb, ub, scal, dyn, final.x, final.y, final.z, dx, dy,
            jnp.asarray(1.0, dtype), accurate=True)
        st_x, rs_x = shared_check(
            P, A, qb, lb, ub, scal, dyn, final.x, final.y, final.z, dx, dy,
            jnp.asarray(C.INACCURATE_EPS_FACTOR, dtype), accurate=False)
        return (st_a, rs_a.pri_res, rs_a.dua_res,
                st_x, rs_x.pri_res, rs_x.dua_res)

    def _no_final(_):
        run = jnp.full_like(final.status, C.RUNNING)
        return (run, final.pri_res, final.dua_res,
                run, final.pri_res, final.dua_res)

    (acc_status, acc_pri, acc_dua, approx_status, approx_pri,
     approx_dua) = lax.cond(_gany(hit_max), _final, _no_final, None)
    check_on = dyn.check_termination > 0
    acc_hit = check_on & (acc_status != C.RUNNING)
    allow = check_on & (dyn.final_approx != 0)
    status = jnp.where(
        hit_max,
        jnp.where(acc_hit, acc_status,
                  jnp.where(allow & (approx_status != C.RUNNING),
                            approx_status, C.MAX_ITER_REACHED)),
        final.status).astype(jnp.int32)
    iters = jnp.where(hit_max, final.it, final.iters)
    pri_res = jnp.where(hit_max,
                        jnp.where(acc_hit, acc_pri, approx_pri),
                        final.pri_res)
    dua_res = jnp.where(hit_max,
                        jnp.where(acc_hit, acc_dua, approx_dua),
                        final.dua_res)

    x = scal.D * final.x
    y = scal.cinv * scal.E * final.y
    z = scal.Einv * final.z

    # certificate extraction costs four batched matmuls — only pay when
    # some lane was actually classified infeasible
    inf_any = _gany((status == C.PRIMAL_INFEASIBLE)
                    | (status == C.PRIMAL_INFEASIBLE_INACCURATE)
                    | (status == C.DUAL_INFEASIBLE)
                    | (status == C.DUAL_INFEASIBLE_INACCURATE))

    def _certs(_):
        _, pc = shared_primal_inf(A, lb, ub, scal, dy, dyn.eps_prim_inf)
        _, dc = shared_dual_inf(P, A, qb, lb, ub, scal, dx,
                                dyn.eps_dual_inf)
        return pc, dc

    prim_cert, dual_cert = lax.cond(
        inf_any, _certs, lambda _: (jnp.zeros_like(final.y),
                                    jnp.zeros_like(final.x)), None)

    obj = scal.cinv * (0.5 * jnp.sum(final.x * (final.x @ P), axis=1)
                       + jnp.sum(qb * final.x, axis=1))
    nan = jnp.asarray(jnp.nan, dtype)
    obj = jnp.where(status == C.NON_CONVEX, nan, obj)
    obj = jnp.where((status == C.PRIMAL_INFEASIBLE)
                    | (status == C.PRIMAL_INFEASIBLE_INACCURATE),
                    jnp.asarray(jnp.inf, dtype), obj)
    obj = jnp.where((status == C.DUAL_INFEASIBLE)
                    | (status == C.DUAL_INFEASIBLE_INACCURATE),
                    jnp.asarray(-jnp.inf, dtype), obj)

    B_ = final.x.shape[0]
    out = SolveOutput(
        x=x, y=y, z=z, status=status, iter=iters,
        pri_res=pri_res, dua_res=dua_res, obj_val=obj,
        prim_cert=prim_cert, dual_cert=dual_cert,
        rho_updates=jnp.broadcast_to(final.rho_updates, (B_,)),
        rho_estimate=jnp.broadcast_to(final.rho_estimate, (B_,)),
        xbar=final.x, ybar=final.y, zbar=final.z,
        rho_dir=final.rho_dir, rho_gap=final.rho_gap,
        next_rho=final.next_rho,
    )
    if with_factor:
        return out, FactorCache(Rinv=final.Rinv, rho_vec=final.rho_vec,
                                rho_inv=final.rho_inv, rho_bar=final.rho_bar)
    return out


@with_precision
def solve_batch_shared_fixed(P, A, qb, lb, ub, scal: SharedScaling,
                             dyn: DynParams, x0, y0, z0, group: int = 128,
                             interpret: bool = False,
                             axis_name=None, factor0: FactorCache = None,
                             with_factor: bool = False,
                             tf32: bool = False) -> SolveOutput:
    """Fixed-rho shared-structure solve: the ENTIRE loop runs in one Pallas
    kernel (ops/solve_kernel.py) with full in-kernel classification every
    check_termination iterations (residual convergence, primal/dual
    infeasibility, NaN breakdown) and per-lane freezing. Used when
    adaptive_rho is off (no mid-solve refactorization).

    ``tf32`` caveat: this single-invocation path has no driver between
    legs, so it runs the WHOLE solve at the requested precision with no
    stall fallback — a problem whose f32 fixed-rho solve converges only
    marginally above the tf32 noise floor can end Max_iter_reached here
    where the f32 engine would (slowly) solve. The adaptive engine
    (the default) detects the plateau and falls back to f32 legs; use it,
    or full f32, for eq-heavy/marginal problems at fixed rho."""
    from .ops.solve_kernel import admm_solve_shared

    dtype = P.dtype
    B = x0.shape[0]

    loose_b = (lb <= -C.INFTY_THRESH) & (ub >= C.INFTY_THRESH)
    eq_b = (~loose_b) & (ub - lb < C.RHO_TOL)
    loose = jnp.all(loose_b, axis=0)
    eq = jnp.all(eq_b, axis=0) & ~loose
    if axis_name is not None:
        ndev = lax.psum(jnp.ones((), jnp.int32), axis_name)
        loose = lax.psum(loose.astype(jnp.int32), axis_name) == ndev
        eq = (lax.psum(eq.astype(jnp.int32), axis_name) == ndev) & ~loose
    rho_vec, rho_inv, Rinv, rho0 = _init_factor(
        P, A, dyn.sigma, loose, eq, factor0, dyn.rho_bar)

    st = dyn.scaled_termination.astype(bool)
    Einv_eff = jnp.where(st, jnp.ones_like(scal.Einv), scal.Einv)
    Dinv_eff = jnp.where(st, jnp.ones_like(scal.Dinv), scal.Dinv)
    cinv_eff = jnp.where(st, jnp.ones_like(scal.cinv), scal.cinv)

    (x, y, z, xp, yp, status_acc, iters, pri_k, dua_k, _prn_k,
     _dun_k) = admm_solve_shared(
        Rinv, P, A, rho_vec, rho_inv, Einv_eff, Dinv_eff, cinv_eff,
        qb, lb, ub, x0, y0, z0, dyn.sigma, dyn.alpha,
        dyn.max_iter, dyn.check_termination, dyn.eps_abs, dyn.eps_rel,
        scal=scal, eps_pinf=dyn.eps_prim_inf, eps_dinf=dyn.eps_dual_inf,
        group=group, interpret=interpret, tf32=tf32)

    # finalize identically to the epoch engine: the kernel classified each
    # lane at its check iterations (incl. infeasibility/NaN); lanes still
    # RUNNING hit max_iter -> approximate check
    dx = x - xp
    dy = y - yp
    hit_max = status_acc == C.RUNNING

    def _gany(v):
        if axis_name is None:
            return jnp.any(v)
        return lax.psum(jnp.any(v).astype(jnp.int32), axis_name) > 0

    def _final(_):
        st_a, rs_a = shared_check(
            P, A, qb, lb, ub, scal, dyn, x, y, z, dx, dy,
            jnp.asarray(1.0, dtype), accurate=True)
        st_x, rs_x = shared_check(
            P, A, qb, lb, ub, scal, dyn, x, y, z, dx, dy,
            jnp.asarray(C.INACCURATE_EPS_FACTOR, dtype), accurate=False)
        return (st_a, rs_a.pri_res, rs_a.dua_res,
                st_x, rs_x.pri_res, rs_x.dua_res)

    def _no_final(_):
        run = jnp.full_like(status_acc, C.RUNNING)
        return run, pri_k, dua_k, run, pri_k, dua_k

    (acc_status, acc_pri, acc_dua, approx_status, approx_pri,
     approx_dua) = lax.cond(_gany(hit_max), _final, _no_final, None)
    check_on = dyn.check_termination > 0
    acc_hit = check_on & (acc_status != C.RUNNING)
    allow = check_on & (dyn.final_approx != 0)
    status = jnp.where(
        hit_max,
        jnp.where(acc_hit, acc_status,
                  jnp.where(allow & (approx_status != C.RUNNING),
                            approx_status, C.MAX_ITER_REACHED)),
        status_acc).astype(jnp.int32)
    pri_res = jnp.where(hit_max,
                        jnp.where(acc_hit, acc_pri, approx_pri), pri_k)
    dua_res = jnp.where(hit_max,
                        jnp.where(acc_hit, acc_dua, approx_dua), dua_k)

    xu = scal.D * x
    yu = scal.cinv * scal.E * y
    zu = scal.Einv * z
    inf_any = _gany((status == C.PRIMAL_INFEASIBLE)
                    | (status == C.PRIMAL_INFEASIBLE_INACCURATE)
                    | (status == C.DUAL_INFEASIBLE)
                    | (status == C.DUAL_INFEASIBLE_INACCURATE))

    def _certs(_):
        _, pc = shared_primal_inf(A, lb, ub, scal, dy, dyn.eps_prim_inf)
        _, dc = shared_dual_inf(P, A, qb, lb, ub, scal, dx,
                                dyn.eps_dual_inf)
        return pc, dc

    prim_cert, dual_cert = lax.cond(
        inf_any, _certs, lambda _: (jnp.zeros_like(y), jnp.zeros_like(x)),
        None)
    obj = scal.cinv * (0.5 * jnp.sum(x * (x @ P), axis=1)
                       + jnp.sum(qb * x, axis=1))
    nan = jnp.asarray(jnp.nan, dtype)
    obj = jnp.where(status == C.NON_CONVEX, nan, obj)
    obj = jnp.where((status == C.PRIMAL_INFEASIBLE)
                    | (status == C.PRIMAL_INFEASIBLE_INACCURATE),
                    jnp.asarray(jnp.inf, dtype), obj)
    obj = jnp.where((status == C.DUAL_INFEASIBLE)
                    | (status == C.DUAL_INFEASIBLE_INACCURATE),
                    jnp.asarray(-jnp.inf, dtype), obj)

    out = SolveOutput(
        x=xu, y=yu, z=zu, status=status, iter=iters,
        pri_res=pri_res, dua_res=dua_res, obj_val=obj,
        prim_cert=prim_cert, dual_cert=dual_cert,
        rho_updates=jnp.zeros((B,), jnp.int32),
        rho_estimate=jnp.broadcast_to(rho0, (B,)),
        xbar=x, ybar=y, zbar=z,
        rho_dir=jnp.int32(0), rho_gap=jnp.int32(0), next_rho=jnp.int32(0),
    )
    if with_factor:
        # fixed rho: the factor does not evolve during the solve
        return out, FactorCache(Rinv=Rinv, rho_vec=rho_vec,
                                rho_inv=rho_inv, rho_bar=rho0)
    return out


def solve_shared(P, A, q, l, u, dyn: DynParams, scaling_iters,
                 x0, y0, group: int = 128, interpret: bool = False,
                 adaptive: bool = True, axis_name=None,
                 lowp: bool = False, tf32: bool = False) -> SolveOutput:
    """One-shot shared-structure solve: scale shared data once, solve batch.

    P (n,n), A (m,n) shared; q (B,n), l/u (B,m) per-lane; x0/y0 unscaled.
    ``adaptive=False`` selects the single-kernel fixed-rho path.

    ``lowp`` (mixed precision) applies to the adaptive epoch engine only;
    the fixed-rho single-kernel path keeps its one precision for the whole
    in-kernel loop (per-chunk phase switching needs the epoch driver)."""
    dtype = P.dtype
    l = jnp.clip(l, -C.OSQP_INFTY, C.OSQP_INFTY)
    u = jnp.clip(u, -C.OSQP_INFTY, C.OSQP_INFTY)
    q_absmax = jnp.max(jnp.abs(q), axis=0)
    if axis_name is not None:
        q_absmax = lax.pmax(q_absmax, axis_name)
    Pb, Ab, scal = shared_ruiz(P, A, q_absmax, scaling_iters)
    qb = scal.c * scal.D * q
    lb = scal.E * l
    ub = scal.E * u
    xb = scal.Dinv * x0
    yb = scal.c * scal.Einv * y0
    zb = xb @ Ab.T
    if not adaptive:
        return solve_batch_shared_fixed(Pb, Ab, qb, lb, ub, scal, dyn,
                                        xb, yb, zb, group=group,
                                        interpret=interpret,
                                        axis_name=axis_name, tf32=tf32)
    return solve_batch_shared(Pb, Ab, qb, lb, ub, scal, dyn, xb, yb, zb,
                              group=group, interpret=interpret,
                              axis_name=axis_name, lowp=lowp, tf32=tf32)
