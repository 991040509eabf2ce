"""Natively-batched ADMM solve loop — the TPU throughput engine.

``jax.vmap(solve)`` is correct but has a fatal performance flaw: vmapping a
``lax.while_loop`` turns every internal ``lax.cond`` into a ``select`` that
executes BOTH branches, so the adaptive-rho refactorization (a batched
Cholesky) would run every iteration instead of every ``adaptive_rho_interval``
iterations. This module instead runs ONE while_loop over the whole batch with
a *scalar* iteration counter: all lanes advance in lockstep, finished lanes
are frozen by masking, and the rho-refactor branch is a genuine ``lax.cond``
on the scalar ``it % interval == 0`` — the Cholesky runs ~1/interval as often.

All per-lane math (residuals, termination, certificates) reuses the
single-problem functions from :mod:`osqp_tpu.core` via ``jax.vmap`` — no
control flow inside them, so vmap is free.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from . import constants as C
from .core import (ResInfo, build_rho_vec, constraint_masks,
                   dual_infeasibility, primal_infeasibility, residual_norms,
                   scale_problem, termination_status)
from .linalg import with_precision
from .types import DynParams, QPData, ScalingData, SolveOutput

_DIV_GUARD = 1e-10


def _bmm(A, x, prec=None):
    """(B,m,n) @ (B,n) -> (B,m)."""
    return jnp.einsum("bmn,bn->bm", A, x, precision=prec)


def _bmm_t(A, v, prec=None):
    """(B,m,n)^T @ (B,m) -> (B,n)."""
    return jnp.einsum("bmn,bm->bn", A, v, precision=prec)


def _batched_chol(P, A, sigma, rho_vec):
    n = P.shape[-1]
    R = P + sigma * jnp.eye(n, dtype=P.dtype)[None]
    R = R + jnp.einsum("bmn,bm,bmk->bnk", A, rho_vec, A)
    R = 0.5 * (R + jnp.swapaxes(R, -1, -2))
    return lax.linalg.cholesky(R, symmetrize_input=False)


def _batched_factor(P, A, sigma, rho_vec, kkt_mode: str):
    """Factor the reduced KKT for the whole batch.

    ``chol``: Cholesky factor, applied by two batched triangular solves.
    ``inverse``: explicit R⁻¹ (computed through the Cholesky factor), applied
    by ONE batched mat-vec per iteration. Triangular solves are sequential in
    n and run far from TPU peak; the GEMV is a single MXU pass. R is
    regularized (σ + ρ AᵀA), so κ(R) is controlled and the inverse apply is
    accurate to ~κ·eps — well inside the eps=1e-3 MPC regime this path
    serves (f64 conformance runs use chol).
    """
    L = _batched_chol(P, A, sigma, rho_vec)
    if kkt_mode == "chol":
        return L
    n = P.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=P.dtype), L.shape)
    w = lax.linalg.triangular_solve(L, eye, left_side=True, lower=True,
                                    transpose_a=False)
    Rinv = lax.linalg.triangular_solve(L, w, left_side=True, lower=True,
                                       transpose_a=True)
    return Rinv


def _batched_kkt_apply(F, b, kkt_mode: str, prec=None):
    if kkt_mode == "inverse":
        return jnp.einsum("bnk,bk->bn", F, b, precision=prec)
    w = lax.linalg.triangular_solve(F, b[..., None], left_side=True,
                                    lower=True, transpose_a=False)
    x = lax.linalg.triangular_solve(F, w, left_side=True,
                                    lower=True, transpose_a=True)
    return x[..., 0]


class BCarry(NamedTuple):
    x: jnp.ndarray        # (B, n)
    y: jnp.ndarray        # (B, m)
    z: jnp.ndarray        # (B, m)
    x_prev: jnp.ndarray
    y_prev: jnp.ndarray
    L: jnp.ndarray        # (B, n, n)
    rho_vec: jnp.ndarray  # (B, m)
    rho_inv: jnp.ndarray
    rho_bar: jnp.ndarray  # (B,)
    it: jnp.ndarray       # scalar int32 — lockstep iteration counter
    status: jnp.ndarray   # (B,) int32
    iters: jnp.ndarray    # (B,) int32: per-lane iteration of termination
    pri_res: jnp.ndarray  # (B,)
    dua_res: jnp.ndarray
    rho_estimate: jnp.ndarray
    rho_updates: jnp.ndarray  # (B,) int32
    # per-lane ping-pong back-off for automatic-mode rho adaptation (same
    # rule as core.Carry.rho_dir/rho_gap/next_rho — direction reversals
    # double the per-lane gap to the next permitted update; active only
    # when dyn.rho_backoff is set, i.e. adaptive_rho_interval was left auto)
    rho_dir: jnp.ndarray      # (B,) int32
    rho_gap: jnp.ndarray      # (B,) int32
    next_rho: jnp.ndarray     # (B,) int32
    # tensorfloat32 stall fallback (scalar, whole-batch — mirrors the
    # shared engine's detector: latch ``fine`` when the best live lane's
    # residual-to-threshold ratio stops improving at a check boundary)
    fine: Any = True
    last_ratio: Any = float("inf")


@with_precision
def solve_batch_scaled(sdata: QPData, scal: ScalingData, dyn: DynParams,
                       x0, y0, z0, kkt_mode: str = "inverse",
                       tf32: bool = False) -> SolveOutput:
    """Batched ADMM on pre-scaled stacked data (leading axis B on all leaves
    of ``sdata``/``scal`` and on the starts).

    ``tf32=True`` (Settings.matmul_precision on the per-lane engine): the
    per-iteration batched products — the KKT apply GEMM included on the
    "inverse" path — run at XLA Precision.HIGH (3-pass bf16 splits, f32
    accumulation) with the same stall-detected full-f32 fallback as the
    shared engine; factorization/termination/certificates stay f32."""
    dtype = sdata.P.dtype
    B, n = x0.shape
    m = y0.shape[1]

    loose, eq = constraint_masks(sdata.l, sdata.u)  # (B, m) elementwise
    rho0 = jnp.clip(jnp.broadcast_to(dyn.rho_bar, (B,)).astype(dtype),
                    C.RHO_MIN, C.RHO_MAX)
    rho_vec, rho_inv = build_rho_vec(loose, eq, rho0[:, None])
    L0 = _batched_factor(sdata.P, sdata.A, dyn.sigma, rho_vec, kkt_mode)

    inf0 = jnp.full((B,), jnp.inf, dtype)
    carry0 = BCarry(
        x=x0, y=y0, z=z0, x_prev=x0, y_prev=y0, L=L0,
        rho_vec=rho_vec, rho_inv=rho_inv, rho_bar=rho0,
        it=jnp.int32(0),
        status=jnp.full((B,), C.RUNNING, jnp.int32),
        iters=jnp.zeros((B,), jnp.int32),
        pri_res=inf0, dua_res=inf0,
        rho_estimate=rho0,
        rho_updates=jnp.zeros((B,), jnp.int32),
        rho_dir=jnp.broadcast_to(
            jnp.asarray(dyn.rho_dir0, jnp.int32), (B,)),
        rho_gap=jnp.broadcast_to(jnp.where(
            jnp.asarray(dyn.rho_gap0, jnp.int32) > 0,
            jnp.asarray(dyn.rho_gap0, jnp.int32),
            jnp.maximum(dyn.adaptive_rho_interval, 1).astype(jnp.int32)),
            (B,)),
        next_rho=jnp.broadcast_to(
            jnp.asarray(dyn.next_rho0, jnp.int32), (B,)),
        fine=jnp.asarray(not tf32),
        last_ratio=jnp.asarray(jnp.inf, dtype),
    )

    check_t = jnp.maximum(dyn.check_termination, 1)
    rho_int = jnp.maximum(dyn.adaptive_rho_interval, 1)

    v_res = jax.vmap(
        lambda sd, sc, x, y, z: residual_norms(sd, sc, dyn, x, y, z))
    v_check = jax.vmap(
        lambda sd, sc, x, y, z, dx, dy: termination_status(
            sd, sc, dyn, x, y, z, dx, dy,
            jnp.asarray(1.0, dtype), accurate=True))
    v_check_approx = jax.vmap(
        lambda sd, sc, x, y, z, dx, dy: termination_status(
            sd, sc, dyn, x, y, z, dx, dy,
            jnp.asarray(C.INACCURATE_EPS_FACTOR, dtype), accurate=False))

    def cond_fun(c: BCarry):
        return jnp.any(c.status == C.RUNNING) & (c.it < dyn.max_iter)

    def body_fun(c: BCarry, leg_tf32: bool = False) -> BCarry:
        live = c.status == C.RUNNING  # (B,)
        lx = live[:, None]
        prec = lax.Precision.HIGH if leg_tf32 else None

        # ---- one batched ADMM step ----
        rhs = dyn.sigma * c.x - sdata.q + _bmm_t(sdata.A,
                                                 c.rho_vec * c.z - c.y,
                                                 prec)
        xt = _batched_kkt_apply(c.L, rhs, kkt_mode, prec)
        zt = _bmm(sdata.A, xt, prec)
        x_new = dyn.alpha * xt + (1.0 - dyn.alpha) * c.x
        v = dyn.alpha * zt + (1.0 - dyn.alpha) * c.z + c.rho_inv * c.y
        z_new = jnp.clip(v, sdata.l, sdata.u)
        y_new = c.rho_vec * (v - z_new)

        # freeze finished lanes
        x_new = jnp.where(lx, x_new, c.x)
        z_new = jnp.where(lx, z_new, c.z)
        y_new = jnp.where(lx, y_new, c.y)

        it = c.it + 1
        do_check = (dyn.check_termination > 0) & (it % check_t == 0)
        do_rho = (dyn.adaptive_rho != 0) & (it % rho_int == 0)

        # certificate deltas over the CHECK WINDOW (snapshot below) — the
        # per-iteration δ cancels catastrophically at f32 and infeasibility
        # certificates never fire; see core.solve_scaled body_fun
        dx = x_new - c.x_prev
        dy = y_new - c.y_prev

        def with_res(_):
            def checked(_):
                st, res = v_check(sdata, scal, x_new, y_new, z_new, dx, dy)
                return st, res
            def unchecked(_):
                res = v_res(sdata, scal, x_new, y_new, z_new)
                return jnp.full((B,), C.RUNNING, jnp.int32), res
            return lax.cond(do_check, checked, unchecked, None)

        def without_res(_):
            dummy = ResInfo(c.pri_res, c.dua_res,
                            jnp.ones((B,), dtype), jnp.ones((B,), dtype))
            return jnp.full((B,), C.RUNNING, jnp.int32), dummy

        status_new, res = lax.cond(do_check | do_rho, with_res,
                                   without_res, None)
        status = jnp.where(live, status_new, c.status)
        iters = jnp.where(live & (status != C.RUNNING), it, c.iters)
        # window snapshot only for lanes STILL running (a detected lane
        # keeps its pre-check snapshot so the certificate extraction in
        # _finalize sees the detection window)
        snap = (live & do_check & (status == C.RUNNING)
                & (it % (check_t * 4) == 0))[:, None]
        x_prev = jnp.where(snap, x_new, c.x_prev)
        y_prev = jnp.where(snap, y_new, c.y_prev)

        # ---- adaptive rho: scalar cond → Cholesky only at interval ----
        def adapt(_):
            pri_rel = res.pri_res / jnp.maximum(res.pri_norm, _DIV_GUARD)
            dua_rel = res.dua_res / jnp.maximum(res.dua_norm, _DIV_GUARD)
            ratio = pri_rel / jnp.maximum(dua_rel, _DIV_GUARD)
            est = jnp.clip(c.rho_bar * jnp.sqrt(ratio), C.RHO_MIN, C.RHO_MAX)
            est = jnp.where(jnp.isfinite(est), est, c.rho_bar)
            trig = (live & (status == C.RUNNING)
                    & ((dyn.rho_backoff == 0) | (it >= c.next_rho))
                    & ((est > c.rho_bar * dyn.adaptive_rho_tolerance)
                       | (est < c.rho_bar / dyn.adaptive_rho_tolerance)))
            # per-lane ping-pong back-off (see BCarry)
            backoff = trig & (dyn.rho_backoff != 0)
            dir_new = jnp.where(est > c.rho_bar, jnp.int32(1), jnp.int32(-1))
            reversal = (dir_new * c.rho_dir) < 0
            gap2 = jnp.where(
                backoff,
                jnp.where(reversal,
                          jnp.minimum(c.rho_gap * 2, jnp.int32(1 << 24)),
                          c.rho_gap),
                c.rho_gap)
            next2 = jnp.where(backoff, it + gap2, c.next_rho)
            dir2 = jnp.where(trig, dir_new, c.rho_dir)

            def refactor(_):
                rb = jnp.where(trig, est, c.rho_bar)
                rv, ri = build_rho_vec(loose, eq, rb[:, None])
                rv = jnp.where(trig[:, None], rv, c.rho_vec)
                ri = jnp.where(trig[:, None], ri, c.rho_inv)
                Lnew = _batched_factor(sdata.P, sdata.A, dyn.sigma, rv,
                                       kkt_mode)
                Lnew = jnp.where(trig[:, None, None], Lnew, c.L)
                return rb, rv, ri, Lnew, c.rho_updates + trig.astype(jnp.int32)

            def keep(_):
                return (c.rho_bar, c.rho_vec, c.rho_inv, c.L, c.rho_updates)

            rb, rv, ri, Ln, ru = lax.cond(jnp.any(trig), refactor, keep, None)
            return rb, rv, ri, Ln, ru, est, dir2, gap2, next2

        def no_adapt(_):
            return (c.rho_bar, c.rho_vec, c.rho_inv, c.L, c.rho_updates,
                    c.rho_estimate, c.rho_dir, c.rho_gap, c.next_rho)

        (rho_bar2, rho_vec2, rho_inv2, L2, rho_upd2, rho_est2,
         rho_dir2, rho_gap2, next_rho2) = lax.cond(
            do_rho, adapt, no_adapt, None)

        track = do_check | do_rho

        if leg_tf32:
            # stall detector: best live lane's residual-to-threshold ratio
            den_p = jnp.maximum(dyn.eps_abs + dyn.eps_rel * res.pri_norm,
                                _DIV_GUARD)
            den_d = jnp.maximum(dyn.eps_abs + dyn.eps_rel * res.dua_norm,
                                _DIV_GUARD)
            ratio = jnp.maximum(res.pri_res / den_p, res.dua_res / den_d)
            ratio = jnp.where(status == C.RUNNING, ratio,
                              jnp.asarray(jnp.inf, dtype))
            rmin = jnp.min(ratio)
            stalled = do_check & (rmin > 0.95 * c.last_ratio)
            fine2 = c.fine | stalled
            last_ratio2 = jnp.where(do_check,
                                    jnp.minimum(rmin, c.last_ratio),
                                    c.last_ratio)
        else:
            fine2 = c.fine
            last_ratio2 = c.last_ratio

        return BCarry(
            x=x_new, y=y_new, z=z_new, x_prev=x_prev, y_prev=y_prev, L=L2,
            rho_vec=rho_vec2, rho_inv=rho_inv2, rho_bar=rho_bar2, it=it,
            status=status, iters=iters,
            pri_res=jnp.where(track & live, res.pri_res, c.pri_res),
            dua_res=jnp.where(track & live, res.dua_res, c.dua_res),
            rho_estimate=jnp.where(do_rho & live, rho_est2, c.rho_estimate),
            rho_updates=rho_upd2,
            rho_dir=rho_dir2, rho_gap=rho_gap2, next_rho=next_rho2,
            fine=fine2, last_ratio=last_ratio2,
        )

    if tf32:
        # phase 1: tf32 until done or stalled; phase 2: full f32 remainder
        mid = lax.while_loop(
            lambda c: cond_fun(c) & jnp.logical_not(c.fine),
            lambda c: body_fun(c, leg_tf32=True), carry0)
        final = lax.while_loop(cond_fun, body_fun, mid)
    else:
        final = lax.while_loop(cond_fun, body_fun, carry0)
    return _finalize(sdata, scal, dyn, final, v_check_approx)


def _finalize(sdata, scal, dyn, final: BCarry, v_check_approx) -> SolveOutput:
    """Shared post-loop packaging: approximate check at max_iter, unscaling,
    certificates, objective/status conventions."""
    dtype = final.x.dtype
    # ---- lanes still RUNNING hit max_iter → approximate check ----
    hit_max = final.status == C.RUNNING
    dx = final.x - final.x_prev
    dy = final.y - final.y_prev
    approx_status, approx_res = v_check_approx(
        sdata, scal, final.x, final.y, final.z, dx, dy)
    allow = (dyn.check_termination > 0) & (dyn.final_approx != 0)
    status = jnp.where(
        hit_max,
        jnp.where(allow & (approx_status != C.RUNNING),
                  approx_status, C.MAX_ITER_REACHED),
        final.status).astype(jnp.int32)
    iters = jnp.where(hit_max, final.it, final.iters)
    pri_res = jnp.where(hit_max, approx_res.pri_res, final.pri_res)
    dua_res = jnp.where(hit_max, approx_res.dua_res, final.dua_res)

    # ---- unscale, certificates, objective ----
    x = scal.D * final.x
    y = scal.cinv[:, None] * scal.E * final.y
    z = scal.Einv * final.z

    _, prim_cert = jax.vmap(
        lambda sd, sc, d: primal_infeasibility(sd, sc, d, dyn.eps_prim_inf)
    )(sdata, scal, dy)
    _, dual_cert = jax.vmap(
        lambda sd, sc, d: dual_infeasibility(sd, sc, d, dyn.eps_dual_inf)
    )(sdata, scal, dx)

    obj = scal.cinv * (0.5 * jnp.einsum("bn,bn->b", final.x,
                                        jnp.einsum("bnk,bk->bn", sdata.P,
                                                   final.x))
                       + jnp.einsum("bn,bn->b", sdata.q, final.x))
    nan = jnp.asarray(jnp.nan, dtype)
    obj = jnp.where(status == C.NON_CONVEX, nan, obj)
    obj = jnp.where((status == C.PRIMAL_INFEASIBLE)
                    | (status == C.PRIMAL_INFEASIBLE_INACCURATE),
                    jnp.asarray(jnp.inf, dtype), obj)
    obj = jnp.where((status == C.DUAL_INFEASIBLE)
                    | (status == C.DUAL_INFEASIBLE_INACCURATE),
                    jnp.asarray(-jnp.inf, dtype), obj)

    return SolveOutput(
        x=x, y=y, z=z, status=status, iter=iters,
        pri_res=pri_res, dua_res=dua_res, obj_val=obj,
        prim_cert=prim_cert, dual_cert=dual_cert,
        rho_updates=final.rho_updates, rho_estimate=final.rho_estimate,
        xbar=final.x, ybar=final.y, zbar=final.z,
        rho_dir=final.rho_dir, rho_gap=final.rho_gap,
        next_rho=final.next_rho,
    )


@with_precision
def solve_batch_fused(sdata: QPData, scal: ScalingData, dyn: DynParams,
                      x0, y0, z0, interpret: bool = False) -> SolveOutput:
    """Batched ADMM with the fused Pallas iteration kernel.

    Each outer epoch runs ``check_termination`` iterations entirely in VMEM
    (ops/fused_iter.py), then checks termination / adapts rho at the chunk
    boundary — the same cadence as the C core's check_termination-strided
    checks. The adaptive-rho interval is rounded to a multiple of the chunk.
    Inverse KKT mode only.
    """
    from .ops.fused_iter import admm_iterate

    dtype = sdata.P.dtype
    B, n = x0.shape
    m = y0.shape[1]

    loose, eq = constraint_masks(sdata.l, sdata.u)
    rho0 = jnp.clip(jnp.broadcast_to(dyn.rho_bar, (B,)).astype(dtype),
                    C.RHO_MIN, C.RHO_MAX)
    rho_vec, rho_inv = build_rho_vec(loose, eq, rho0[:, None])
    L0 = _batched_factor(sdata.P, sdata.A, dyn.sigma, rho_vec, "inverse")

    chunk = jnp.maximum(dyn.check_termination, 1)
    # rho interval rounded to a whole number of chunks
    rho_int = jnp.maximum(
        jnp.round(jnp.maximum(dyn.adaptive_rho_interval, 1) / chunk), 1
    ).astype(jnp.int32) * chunk

    v_check = jax.vmap(
        lambda sd, sc, x, y, z, dx, dy: termination_status(
            sd, sc, dyn, x, y, z, dx, dy,
            jnp.asarray(1.0, dtype), accurate=True))
    v_check_approx = jax.vmap(
        lambda sd, sc, x, y, z, dx, dy: termination_status(
            sd, sc, dyn, x, y, z, dx, dy,
            jnp.asarray(C.INACCURATE_EPS_FACTOR, dtype), accurate=False))

    inf0 = jnp.full((B,), jnp.inf, dtype)
    carry0 = BCarry(
        x=x0, y=y0, z=z0, x_prev=x0, y_prev=y0, L=L0,
        rho_vec=rho_vec, rho_inv=rho_inv, rho_bar=rho0,
        it=jnp.int32(0),
        status=jnp.full((B,), C.RUNNING, jnp.int32),
        iters=jnp.zeros((B,), jnp.int32),
        pri_res=inf0, dua_res=inf0,
        rho_estimate=rho0,
        rho_updates=jnp.zeros((B,), jnp.int32),
        rho_dir=jnp.broadcast_to(
            jnp.asarray(dyn.rho_dir0, jnp.int32), (B,)),
        rho_gap=jnp.broadcast_to(jnp.where(
            jnp.asarray(dyn.rho_gap0, jnp.int32) > 0,
            jnp.asarray(dyn.rho_gap0, jnp.int32),
            jnp.maximum(dyn.adaptive_rho_interval, 1).astype(jnp.int32)),
            (B,)),
        next_rho=jnp.broadcast_to(
            jnp.asarray(dyn.next_rho0, jnp.int32), (B,)),
    )

    def cond_fun(c: BCarry):
        return jnp.any(c.status == C.RUNNING) & (c.it < dyn.max_iter)

    def body_fun(c: BCarry) -> BCarry:
        live = c.status == C.RUNNING
        lx = live[:, None]
        K = jnp.minimum(chunk, dyn.max_iter - c.it)

        x_new, y_new, z_new, xp, yp = admm_iterate(
            c.L, sdata.A, sdata.q, sdata.l, sdata.u,
            c.rho_vec, c.rho_inv, c.x, c.y, c.z,
            dyn.sigma, dyn.alpha, K, interpret=interpret)

        # freeze finished lanes
        x_new = jnp.where(lx, x_new, c.x)
        y_new = jnp.where(lx, y_new, c.y)
        z_new = jnp.where(lx, z_new, c.z)
        # check-window certificate deltas (chunk boundary == check here):
        # snapshot the start of every 4th chunk (see core body_fun for the
        # f32 cancellation rationale and the 4x-window margin)
        snapb = (c.it % (chunk * 4) == 0)
        x_prev = jnp.where(lx & snapb, c.x, c.x_prev)
        y_prev = jnp.where(lx & snapb, c.y, c.y_prev)

        it = c.it + K
        dx = x_new - x_prev
        dy = y_new - y_prev

        status_new, res = v_check(sdata, scal, x_new, y_new, z_new, dx, dy)
        check_on = dyn.check_termination > 0
        status = jnp.where(live & check_on, status_new, c.status)
        iters = jnp.where(live & (status != C.RUNNING), it, c.iters)

        do_rho = (dyn.adaptive_rho != 0) & (it % rho_int == 0)

        def adapt(_):
            pri_rel = res.pri_res / jnp.maximum(res.pri_norm, _DIV_GUARD)
            dua_rel = res.dua_res / jnp.maximum(res.dua_norm, _DIV_GUARD)
            ratio = pri_rel / jnp.maximum(dua_rel, _DIV_GUARD)
            est = jnp.clip(c.rho_bar * jnp.sqrt(ratio), C.RHO_MIN, C.RHO_MAX)
            est = jnp.where(jnp.isfinite(est), est, c.rho_bar)
            trig = (live & (status == C.RUNNING)
                    & ((dyn.rho_backoff == 0) | (it >= c.next_rho))
                    & ((est > c.rho_bar * dyn.adaptive_rho_tolerance)
                       | (est < c.rho_bar / dyn.adaptive_rho_tolerance)))
            # per-lane ping-pong back-off (see BCarry)
            backoff = trig & (dyn.rho_backoff != 0)
            dir_new = jnp.where(est > c.rho_bar, jnp.int32(1), jnp.int32(-1))
            reversal = (dir_new * c.rho_dir) < 0
            gap2 = jnp.where(
                backoff,
                jnp.where(reversal,
                          jnp.minimum(c.rho_gap * 2, jnp.int32(1 << 24)),
                          c.rho_gap),
                c.rho_gap)
            next2 = jnp.where(backoff, it + gap2, c.next_rho)
            dir2 = jnp.where(trig, dir_new, c.rho_dir)

            def refactor(_):
                rb = jnp.where(trig, est, c.rho_bar)
                rv, ri = build_rho_vec(loose, eq, rb[:, None])
                rv = jnp.where(trig[:, None], rv, c.rho_vec)
                ri = jnp.where(trig[:, None], ri, c.rho_inv)
                Lnew = _batched_factor(sdata.P, sdata.A, dyn.sigma, rv,
                                       "inverse")
                Lnew = jnp.where(trig[:, None, None], Lnew, c.L)
                return rb, rv, ri, Lnew, c.rho_updates + trig.astype(jnp.int32)

            def keep(_):
                return (c.rho_bar, c.rho_vec, c.rho_inv, c.L, c.rho_updates)

            rb, rv, ri, Ln, ru = lax.cond(jnp.any(trig), refactor, keep, None)
            return rb, rv, ri, Ln, ru, est, dir2, gap2, next2

        def no_adapt(_):
            return (c.rho_bar, c.rho_vec, c.rho_inv, c.L, c.rho_updates,
                    c.rho_estimate, c.rho_dir, c.rho_gap, c.next_rho)

        (rho_bar2, rho_vec2, rho_inv2, L2, rho_upd2, rho_est2,
         rho_dir2, rho_gap2, next_rho2) = lax.cond(
            do_rho, adapt, no_adapt, None)

        return BCarry(
            x=x_new, y=y_new, z=z_new, x_prev=x_prev, y_prev=y_prev, L=L2,
            rho_vec=rho_vec2, rho_inv=rho_inv2, rho_bar=rho_bar2, it=it,
            status=status, iters=iters,
            pri_res=jnp.where(live, res.pri_res, c.pri_res),
            dua_res=jnp.where(live, res.dua_res, c.dua_res),
            rho_estimate=jnp.where(do_rho & live, rho_est2, c.rho_estimate),
            rho_updates=rho_upd2,
            rho_dir=rho_dir2, rho_gap=rho_gap2, next_rho=next_rho2,
        )

    final = lax.while_loop(cond_fun, body_fun, carry0)
    return _finalize(sdata, scal, dyn, final, v_check_approx)


def merge_polish(out: SolveOutput, pol) -> SolveOutput:
    """Merge a vmapped polish result into a batched SolveOutput per the C
    core's acceptance rule (only lanes that Solved and strictly improved)."""
    solved = out.status == C.SOLVED
    ok = pol.success & solved
    okc = ok[:, None]
    return out._replace(
        x=jnp.where(okc, pol.x, out.x),
        y=jnp.where(okc, pol.y, out.y),
        z=jnp.where(okc, pol.z, out.z),
        obj_val=jnp.where(ok, pol.obj_val, out.obj_val),
        pri_res=jnp.where(ok, pol.pri_res, out.pri_res),
        dua_res=jnp.where(ok, pol.dua_res, out.dua_res),
        status_polish=jnp.where(solved, jnp.where(ok, 1, -1), 0)
        .astype(jnp.int32),
    )


def solve_batch(data: QPData, dyn: DynParams, scaling_iters, x0, y0,
                kkt_mode: str = "inverse", do_polish: bool = False,
                delta=1e-6, refine_iters=3,
                tf32: bool = False) -> SolveOutput:
    """Scale (vmapped Ruiz) + batched solve (+ optional in-jit polish reusing
    the same scaled data — no second equilibration pass). All data leaves have
    leading B.

    ``kkt_mode``: "inverse" (default) / "chol" use the XLA loop;
    "fused" uses the Pallas multi-iteration kernel (TPU; interpreted
    elsewhere)."""
    sdata, scal = jax.vmap(lambda d: scale_problem(d, scaling_iters))(data)
    xb = scal.Dinv * x0
    yb = scal.c[:, None] * scal.Einv * y0
    zb = _bmm(sdata.A, xb)
    if kkt_mode == "fused":
        interpret = jax.default_backend() not in ("tpu", "axon")
        out = solve_batch_fused(sdata, scal, dyn, xb, yb, zb,
                                interpret=interpret)
    else:
        out = solve_batch_scaled(sdata, scal, dyn, xb, yb, zb, kkt_mode,
                                 tf32=tf32)
    if do_polish:
        from .polish import polish as _polish_fn
        pol = jax.vmap(
            lambda sd, sc, ybar, pr, du: _polish_fn(
                sd, sc, dyn, delta, refine_iters, ybar, pr, du)
        )(sdata, scal, out.ybar, out.pri_res, out.dua_res)
        out = merge_polish(out, pol)
    return out
