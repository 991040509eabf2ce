"""Single-core NumPy reference ADMM solver.

Plays two roles (SURVEY.md §4 "differential testing" pattern):

1. **Oracle** for differential tests: the same algorithm as
   :mod:`osqp_tpu.core`, written independently in NumPy/LAPACK — chip vs
   CPU-reference comparisons replace the reference repo's Gurobi/Mosek
   fixtures.
2. **Live baseline** for ``bench.py``: a single-threaded dense ADMM QP solve
   on the host CPU is the closest same-machine stand-in for the OSQP C
   single-core path (BASELINE.md's ">10x OSQP-C single-core" target), since
   the C library itself is not vendored here.

Algorithm identical to core.py: Ruiz scaling, reduced-KKT Cholesky,
alpha-relaxed ADMM, rho adaptation, residual termination.
"""

from __future__ import annotations

import numpy as np
import scipy.linalg as sla

from .. import constants as C


def _limit(v):
    v = np.where(v < C.MIN_SCALING, 1.0, v)
    return np.minimum(v, C.MAX_SCALING)


def solve_np(P, q, A, l, u, rho=0.1, sigma=1e-6, alpha=1.6,
             eps_abs=1e-3, eps_rel=1e-3, max_iter=4000,
             check_termination=25, scaling=10, adaptive_rho=True,
             adaptive_rho_interval=100, adaptive_rho_tolerance=5.0,
             x0=None, y0=None):
    """Returns (x, y, iters, status_str). ``x0, y0`` warm-start (unscaled)."""
    P = np.asarray(P, float).copy()
    q = np.asarray(q, float).copy()
    A = np.asarray(A, float).copy()
    l = np.clip(np.asarray(l, float), -C.OSQP_INFTY, C.OSQP_INFTY)
    u = np.clip(np.asarray(u, float), -C.OSQP_INFTY, C.OSQP_INFTY)
    n = P.shape[0]
    m = A.shape[0]

    # Ruiz
    D = np.ones(n)
    E = np.ones(m)
    c = 1.0
    for _ in range(scaling):
        dnorm = np.maximum(
            np.max(np.abs(P), axis=0, initial=0.0),
            np.max(np.abs(A), axis=0, initial=0.0) if m else 0.0)
        dd = 1.0 / np.sqrt(_limit(dnorm))
        de = (1.0 / np.sqrt(_limit(np.max(np.abs(A), axis=1))) if m
              else np.zeros(0))
        P = (dd[:, None] * P) * dd[None, :]
        q = dd * q
        if m:
            A = (de[:, None] * A) * dd[None, :]
            l, u = de * l, de * u
        D *= dd
        E *= de
        gam = 1.0 / _limit(max(np.mean(np.max(np.abs(P), axis=0, initial=0.0)),
                               np.max(np.abs(q), initial=0.0)))
        P *= gam
        q *= gam
        c *= gam

    loose = (l <= -C.INFTY_THRESH) & (u >= C.INFTY_THRESH)
    eq = (~loose) & (u - l < C.RHO_TOL)

    def rho_vec_of(r):
        r = np.clip(r, C.RHO_MIN, C.RHO_MAX)
        return np.where(loose, C.RHO_MIN,
                        np.where(eq, np.clip(1e3 * r, C.RHO_MIN, C.RHO_MAX), r))

    rho_bar = rho
    rho_vec = rho_vec_of(rho_bar)

    def factor(rv):
        R = P + sigma * np.eye(n)
        if m:
            R = R + (A.T * rv) @ A
        return sla.cho_factor(R, lower=True)

    F = factor(rho_vec)
    Dinv, Einv, cinv = 1.0 / D, 1.0 / E, 1.0 / c
    if x0 is not None:
        x = Dinv * np.asarray(x0, float)
    else:
        x = np.zeros(n)
    if y0 is not None:
        y = c * Einv * np.asarray(y0, float)
    else:
        y = np.zeros(m)
    z = A @ x if m else np.zeros(0)

    def residuals(x, y, z):
        Ax = A @ x if m else np.zeros(0)
        Px = P @ x
        Aty = A.T @ y if m else np.zeros(n)
        pri = np.max(np.abs(Einv * (Ax - z)), initial=0.0)
        prn = max(np.max(np.abs(Einv * Ax), initial=0.0),
                  np.max(np.abs(Einv * z), initial=0.0))
        dua = cinv * np.max(np.abs(Dinv * (Px + q + Aty)), initial=0.0)
        dun = cinv * max(np.max(np.abs(Dinv * Px), initial=0.0),
                         np.max(np.abs(Dinv * Aty), initial=0.0),
                         np.max(np.abs(Dinv * q), initial=0.0))
        return pri, prn, dua, dun

    status = "Max_iter_reached"
    it = 0
    for it in range(1, max_iter + 1):
        rhs = sigma * x - q + (A.T @ (rho_vec * z - y) if m else 0.0)
        xt = sla.cho_solve(F, rhs)
        zt = A @ xt if m else z
        x = alpha * xt + (1 - alpha) * x
        if m:
            v = alpha * zt + (1 - alpha) * z + y / rho_vec
            z_new = np.clip(v, l, u)
            y = rho_vec * (v - z_new)
            z = z_new
        if check_termination and it % check_termination == 0:
            pri, prn, dua, dun = residuals(x, y, z)
            if (pri <= eps_abs + eps_rel * prn
                    and dua <= eps_abs + eps_rel * dun):
                status = "Solved"
                break
        if adaptive_rho and it % adaptive_rho_interval == 0:
            pri, prn, dua, dun = residuals(x, y, z)
            est = rho_bar * np.sqrt((pri / max(prn, 1e-10))
                                    / max(dua / max(dun, 1e-10), 1e-10))
            est = float(np.clip(est, C.RHO_MIN, C.RHO_MAX))
            if (est > rho_bar * adaptive_rho_tolerance
                    or est < rho_bar / adaptive_rho_tolerance):
                rho_bar = est
                rho_vec = rho_vec_of(rho_bar)
                F = factor(rho_vec)
    return D * x, cinv * E * y, it, status
