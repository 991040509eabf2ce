"""Independent interior-point oracle for conformance testing.

VERDICT round-1 item #1/"Weak #3": the differential oracle (`npref.py`)
shares algorithmic DNA with the JAX/C++ ADMM engines, so a shared
misreading of the OSQP contract could pass fuzz.  Real OSQP-C cannot be
vendored here (zero network egress; `pip install osqp` fails on DNS — see
CONFORMANCE.md), so this module provides the next-best thing: a
**high-accuracy primal-dual interior-point QP solver** built only on
NumPy/LAPACK, from the textbook Mehrotra predictor-corrector recipe
(Nocedal & Wright ch. 16; Vandenberghe's QP lecture notes).  It shares *no*
code, no scaling heuristics, no rho logic and no termination machinery with
the ADMM engines — an entirely different algorithm family — and converges
to ~1e-9 KKT accuracy, an order tighter than any ADMM tolerance used in the
tests, so disagreement beyond eps localises the bug on the ADMM side.

Problem form matches the reference contract (OSQP.jl README.md:27-37):

    min 0.5 x'Px + q'x   s.t.  l <= Ax <= u

with equality rows expressed as ``l_i == u_i`` and one-sided rows via
+-inf.  Equality rows have no strict interior under a barrier-pair
split, so they are kept first-class: ``A_eq x = b`` rows enter the Newton
system as a saddle-point block with free multipliers, while inequality
rows get the usual slack/barrier pairs.  Optimality conditions
(z = Ax, y the row multiplier):

    Px + q + A'y = 0
    y_i free                                  on equality rows
    y = lam_u - lam_l,  lam_l, lam_u >= 0     elsewhere
    lam_l .* (z - l) = 0,   lam_u .* (u - z) = 0   (finite bounds only)

The dual sign convention matches OSQP: ``y_i > 0`` when the upper bound is
active, ``y_i < 0`` at the lower bound (reference test/basic.jl:43-49
asserts y*=[5/3,0,4/3,0,0] for the canonical QP, which this solver must and
does reproduce — see tests/test_oracle.py).

Scope: the oracle reports ``"optimal"`` or ``"failed"`` (no convergence).
Primal/dual *infeasibility* conformance is handled elsewhere by direct
Farkas-certificate verification in NumPy (tests/test_infeasibility.py,
tests/test_fuzz.py), which is already oracle-free mathematics.
"""

from __future__ import annotations

import numpy as np
import scipy.linalg as sla

# Bounds beyond this magnitude are treated as absent (reference
# OSQP_INFTY = 1e30, src/constants.jl:5; anything clipped there is "inf").
_INF = 1e29
# l == u within this tolerance -> equality row (saddle-point treatment).
_EQ_TOL = 1e-12


class OracleResult:
    """Plain result record: x, y, obj, status, iterations, kkt residual."""

    def __init__(self, x, y, obj, status, iters, kkt_res):
        self.x = x
        self.y = y
        self.obj = obj
        self.status = status
        self.iters = iters
        self.kkt_res = kkt_res

    def __repr__(self):  # pragma: no cover - debugging aid
        return (f"OracleResult(status={self.status!r}, obj={self.obj:.6g}, "
                f"iters={self.iters}, kkt={self.kkt_res:.2e})")


def _kkt_residual(P, q, A, l, u, x, y):
    """Max-norm KKT violation of (x, y) for the OSQP problem form."""
    z = A @ x if A.shape[0] else np.zeros(0)
    stat = np.max(np.abs(P @ x + q + (A.T @ y if A.shape[0] else 0.0)),
                  initial=0.0)
    if not A.shape[0]:
        return stat
    pfeas = np.max(np.maximum(l - z, 0.0) + np.maximum(z - u, 0.0),
                   initial=0.0)
    # complementarity: y+ pairs with u, y- with l
    yp, ym = np.maximum(y, 0.0), np.maximum(-y, 0.0)
    comp_u = np.abs(yp * np.where(u < _INF, u - z, 0.0))
    comp_l = np.abs(ym * np.where(l > -_INF, z - l, 0.0))
    # dual feasibility wrt missing bounds: no push against an absent bound
    bad_u = np.where(u >= _INF, yp, 0.0)
    bad_l = np.where(l <= -_INF, ym, 0.0)
    return max(stat, pfeas,
               np.max(comp_u, initial=0.0), np.max(comp_l, initial=0.0),
               np.max(bad_u, initial=0.0), np.max(bad_l, initial=0.0))


def solve_qp_ipm(P, q, A, l, u, tol=1e-9, max_iter=200):
    """Solve the OSQP-form QP to high accuracy; returns :class:`OracleResult`.

    Mehrotra predictor-corrector.  Inequality rows are eliminated into a
    barrier weight ``W = diag(lam_l/sl + lam_u/su)``; equality rows stay as
    a saddle-point block, giving the per-iteration Newton system

        [ P + Ai' W Ai    Ae' ] [dx ]   [ r1 ]
        [ Ae             -d I ] [dye] = [ r2 ]

    factorized densely (LU) with tiny dual regularisation ``d``.
    """
    P = np.asarray(P, float)
    q = np.asarray(q, float)
    A = np.asarray(A, float).reshape(-1, P.shape[0])
    n = P.shape[0]
    m = A.shape[0]
    l = np.asarray(l, float).reshape(m) if m else np.zeros(0)
    u = np.asarray(u, float).reshape(m) if m else np.zeros(0)

    if m == 0:
        # Unconstrained: direct solve (reference test/unconstrained.jl).
        try:
            x = sla.solve(P + 1e-12 * np.eye(n), -q, assume_a="pos")
        except np.linalg.LinAlgError:
            return OracleResult(np.full(n, np.nan), np.zeros(0), np.nan,
                                "failed", 0, np.inf)
        obj = 0.5 * x @ P @ x + q @ x
        res = np.max(np.abs(P @ x + q), initial=0.0)
        status = "optimal" if res <= max(tol, 1e-8) * (1 + np.abs(obj)) \
            else "failed"
        return OracleResult(x, np.zeros(0), obj, status, 0, res)

    is_eq = (l > -_INF) & (u < _INF) & (u - l <= _EQ_TOL)
    has_l = (l > -_INF) & ~is_eq
    has_u = (u < _INF) & ~is_eq
    free_row = ~has_l & ~has_u & ~is_eq
    # Finite sentinels for absent bounds: every use below is masked by
    # has_l/has_u, but inf * 0 = nan would still poison the arithmetic.
    lf = np.where(has_l, l, 0.0)
    uf = np.where(has_u, u, 0.0)

    eq_idx = np.flatnonzero(is_eq)
    Ae = A[eq_idx]
    be = 0.5 * (l[eq_idx] + u[eq_idx])
    me = len(eq_idx)

    # Interior start: z strictly inside the finite inequality bounds.
    x = np.zeros(n)
    z = A @ x
    span = np.where(has_l & has_u, np.maximum(u - l, 1e-3), 1.0)
    z = np.where(has_l & has_u,
                 np.clip(z, lf + 0.1 * span, uf - 0.1 * span), z)
    z = np.where(has_l & ~has_u, np.maximum(z, lf + 1.0), z)
    z = np.where(~has_l & has_u, np.minimum(z, uf - 1.0), z)
    z[eq_idx] = be
    sl = np.where(has_l, np.maximum(z - lf, 1.0), 1.0)
    su = np.where(has_u, np.maximum(uf - z, 1.0), 1.0)
    ll = np.where(has_l, 1.0, 0.0)  # lam_l
    lu = np.where(has_u, 1.0, 0.0)  # lam_u
    ye = np.zeros(me)               # free equality multipliers

    nb = int(np.sum(has_l) + np.sum(has_u))  # number of barrier pairs
    if nb == 0 and me == 0:
        # All rows free: equivalent to unconstrained in x with y = 0.
        r = solve_qp_ipm(P, q, np.zeros((0, n)), np.zeros(0), np.zeros(0),
                         tol=tol)
        return OracleResult(r.x, np.zeros(m), r.obj, r.status, r.iters,
                            r.kkt_res)

    def _full_y():
        y = lu - ll
        y[eq_idx] = ye
        return y

    best = None
    it = 0
    for it in range(1, max_iter + 1):
        y = _full_y()
        rd = P @ x + q + A.T @ y                        # stationarity
        rp = A @ x - z                                  # z-definition (ineq)
        rpe = Ae @ x - be if me else np.zeros(0)        # equality residual
        mu = ((ll @ sl + lu @ su) / nb) if nb else 0.0

        kkt = _kkt_residual(P, q, A, l, u, x, y)
        scale = 1.0 + max(np.max(np.abs(q), initial=0.0),
                          np.max(np.abs(z), initial=0.0))
        if kkt <= tol * scale:
            break
        if best is None or kkt < best[0]:
            best = (kkt, x.copy(), y.copy())

        # Barrier weight per inequality row; free rows get a tiny weight so
        # the (2,2) block stays invertible and y_free -> 0.
        w = np.where(has_l, ll / np.maximum(sl, 1e-300), 0.0) \
            + np.where(has_u, lu / np.maximum(su, 1e-300), 0.0)
        w = np.where(free_row, 1e-10, w)
        w = np.where(is_eq, 0.0, w)

        def _solve_newton(sig_mu, dll_aff=None, dlu_aff=None,
                          dsl_aff=None, dsu_aff=None):
            # Complementarity targets (with optional Mehrotra correction).
            tl = sig_mu - ll * sl
            tu = sig_mu - lu * su
            if dll_aff is not None:
                tl = tl - dll_aff * dsl_aff
                tu = tu - dlu_aff * dsu_aff
            tl = np.where(has_l, tl, 0.0)
            tu = np.where(has_u, tu, 0.0)
            g = np.where(has_l, (tl - ll * (z - lf - sl)) /
                         np.maximum(sl, 1e-300), 0.0) \
                - np.where(has_u, (tu - lu * (uf - z - su)) /
                           np.maximum(su, 1e-300), 0.0)
            # Inequality elimination: W dz - dy = g,  A dx - dz = -rp
            #   => contribution A'(g - W rp) and H += A' W A.
            H = P + A.T @ (w[:, None] * A)
            r1 = -rd + A.T @ (g - w * rp)
            if me:
                K = np.zeros((n + me, n + me))
                K[:n, :n] = H
                K[:n, n:] = Ae.T
                K[n:, :n] = Ae
                K[n:, n:] = -1e-12 * np.eye(me)
                rhs = np.concatenate([r1, -rpe])
                try:
                    sol = sla.lu_solve(sla.lu_factor(K), rhs)
                except (np.linalg.LinAlgError, ValueError):
                    return None
                dx, dye = sol[:n], sol[n:]
            else:
                reg = 1e-12
                while True:
                    try:
                        F = sla.cho_factor(H + reg * np.eye(n), lower=True)
                        break
                    except np.linalg.LinAlgError:
                        reg *= 100.0
                        if reg > 1e2:
                            return None
                dx = sla.cho_solve(F, r1)
                dye = np.zeros(0)
            dz = A @ dx + rp
            if me:
                dz[eq_idx] = 0.0  # z pinned at be on equality rows
            dy_in = w * dz - g
            dll = np.where(has_l,
                           (tl - ll * (z - lf - sl) - ll * dz) /
                           np.maximum(sl, 1e-300), 0.0)
            dlu = np.where(has_u,
                           (tu - lu * (uf - z - su) + lu * dz) /
                           np.maximum(su, 1e-300), 0.0)
            dsl = np.where(has_l, dz + (z - lf - sl), 0.0)
            dsu = np.where(has_u, -dz + (uf - z - su), 0.0)
            del dy_in
            return dx, dz, dye, dll, dlu, dsl, dsu

        aff = _solve_newton(0.0)
        if aff is None:
            break
        dxa, dza, dyea, dlla, dlua, dsla, dsua = aff

        def _step_len(v, dv, mask):
            dv = np.where(mask, dv, 0.0)
            neg = dv < 0
            if not np.any(neg):
                return 1.0
            return min(1.0, float(np.min(-v[neg] / dv[neg])))

        if nb:
            ap = min(_step_len(sl, dsla, has_l), _step_len(su, dsua, has_u))
            ad = min(_step_len(ll, dlla, has_l), _step_len(lu, dlua, has_u))
            a_aff = min(ap, ad)
            mu_aff = ((ll + a_aff * dlla) @ (sl + a_aff * dsla)
                      + (lu + a_aff * dlua) @ (su + a_aff * dsua)) / nb
            sigma = (max(mu_aff, 0.0) / max(mu, 1e-300)) ** 3
        else:
            sigma = 0.0

        cor = _solve_newton(sigma * mu, dlla, dlua, dsla, dsua)
        if cor is None:
            break
        dx, dz, dye, dll, dlu, dsl, dsu = cor

        if nb:
            ap = min(_step_len(sl, dsl, has_l), _step_len(su, dsu, has_u))
            ad = min(_step_len(ll, dll, has_l), _step_len(lu, dlu, has_u))
            step = 0.99 * min(ap, ad)
        else:
            step = 1.0
        if step < 1e-14:
            break
        x = x + step * dx
        z = z + step * dz
        if me:
            z[eq_idx] = be
            ye = ye + step * dye
        sl = np.where(has_l, sl + step * dsl, sl)
        su = np.where(has_u, su + step * dsu, su)
        ll = np.where(has_l, np.maximum(ll + step * dll, 1e-300), ll)
        lu = np.where(has_u, np.maximum(lu + step * dlu, 1e-300), lu)

    y = _full_y()
    kkt = _kkt_residual(P, q, A, l, u, x, y)
    if best is not None and best[0] < kkt:
        kkt, x, y = best[0], best[1], best[2]
    obj = 0.5 * x @ P @ x + q @ x
    scale = 1.0 + max(np.max(np.abs(q), initial=0.0),
                      np.max(np.abs(A @ x), initial=0.0) if m else 0.0)
    status = "optimal" if kkt <= max(tol, 1e-7) * scale else "failed"
    return OracleResult(x, y, obj, status, it, kkt)
