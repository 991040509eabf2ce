"""Solution polishing.

TPU-native re-implementation of the C core's polish step (observable contract:
reference ``Settings`` delta/polish/polish_refine_iter — src/types.jl:126-128,
``status_polish`` in CInfo — types.jl:88, and behaviors asserted in
/root/reference/test/polishing.jl:15-93).

Algorithm: guess the active set from the sign of the dual iterate (y<0 → lower
bound active, y>0 → upper), solve the equality-constrained QP restricted to the
guessed active rows through a delta-regularized KKT system, then run
``polish_refine_iter`` steps of iterative refinement against the unregularized
system. Accept iff both polished residuals strictly improve on the ADMM ones.

TPU twist: the active set has data-dependent size, so instead of gathering
active rows (dynamic shapes break XLA), the reduced system is formed with a
row mask: M = diag(mask)·Ā and the (n+m) KKT
    [P̄+δI   Mᵀ ] [x]   [-q̄     ]
    [M    -δI∘mask − I∘(1−mask)] [y] = [mask∘b]
is solved via its n×n Schur complement  R = P̄ + δI + δ⁻¹MᵀM  (dense Cholesky,
MXU-friendly, fixed shapes, vmappable).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from .linalg import cg_solve, chol_factor, chol_solve, sym, with_precision
from .core import residual_norms
from .types import DynParams, QPData, ScalingData


class PolishOutput(NamedTuple):
    x: jnp.ndarray        # unscaled polished primal
    y: jnp.ndarray        # unscaled polished dual
    z: jnp.ndarray        # unscaled polished slack
    obj_val: jnp.ndarray
    pri_res: jnp.ndarray
    dua_res: jnp.ndarray
    success: jnp.ndarray  # bool: both residuals strictly improved


#: Active-set refinement rounds inside polish (round-4). Round 0 guesses
#: from the dual iterate's sign (the C core's rule); each later round makes
#: ONE single-row pivot from the POLISHED solution (drop the worst
#: wrong-signed active row, else add the most violated inactive row) and
#: re-solves. One-shot y-sign guessing fails when ADMM terminates at an
#: eps-feasible iterate whose duals mis-classify even one row: a single
#: spurious active row makes the delta-regularized equality system
#: inconsistent and the "polished" point lands on a wrong face (measured on
#: the LP family's warm update-re-solve: obj_err 1.4e-3 reported as polish
#: SUCCESS under the old acceptance; one pivot recovers the exact vertex at
#: 4e-9 and the worst wrong-signed dual is unmissable at ~1e3).
_POLISH_ROUNDS = 4


@with_precision
def polish(sdata: QPData, scal: ScalingData, dyn: DynParams,
           delta, refine_iters, ybar,
           admm_pri_res, admm_dua_res,
           indirect: bool = False) -> PolishOutput:
    """Polish the (scaled) ADMM solution; the active set is guessed from the
    sign of the dual iterate ``ybar`` and refined for ``_POLISH_ROUNDS-1``
    repair rounds (see above).

    ``indirect=True`` solves the reduced polish system matrix-free with
    Jacobi-preconditioned CG (the large-sparse path, where no dense factor
    exists); requires operator P/A with ``diag``/``sqT`` companions."""
    P, q, A, l, u = sdata
    dtype = q.dtype
    n = q.shape[0]
    m = l.shape[0]
    delta = jnp.asarray(delta, dtype)
    rhs1 = -q

    def solve_with_set(low, upp):
        """Masked-active-set KKT solve + iterative refinement at the given
        classification; returns the polished (x, y)."""
        mask = (low | upp).astype(dtype)                      # (m,)
        b = jnp.where(low, l, jnp.where(upp, u, 0.0))         # (m,)

        def t(v):
            # A^T(mask o v) — the masked-active-rows transpose product
            return A.T @ (mask * v)

        if indirect:
            def R_matvec(v):
                out = P @ v + delta * v
                if m > 0:
                    out = out + t(mask * (A @ v)) / delta
                return out
            d = P.diag + delta
            if m > 0:
                d = d + (A.sqT @ mask) / delta
            M_inv = 1.0 / d

            def solve_R(r):
                return cg_solve(R_matvec, r, jnp.zeros_like(r),
                                jnp.asarray(1e-10, dtype), 400,
                                M_inv_diag=M_inv)
        else:
            Ma = mask[:, None] * A if m > 0 else A
            R = P + delta * jnp.eye(n, dtype=dtype)
            if m > 0:
                R = R + (Ma.T @ Ma) / delta
            Lp = chol_factor(sym(R))

            def solve_R(r):
                return chol_solve(Lp, r)

        rhs2 = mask * b

        def solve_reg(r1, r2):
            dx = solve_R(r1 + t(r2) / delta)
            dy = mask * ((A @ dx) - r2) / delta + (1.0 - mask) * r2
            return dx, dy

        x0, y0 = solve_reg(rhs1, rhs2)

        def refine(_, xy):
            x, y = xy
            r1 = rhs1 - (P @ x + t(y))
            r2 = rhs2 - (mask * (A @ x) + (1.0 - mask) * y)
            dx, dy = solve_reg(r1, r2)
            return x + dx, y + dy

        return lax.fori_loop(0, refine_iters, refine, (x0, y0))

    low = ybar < 0.0
    upp = ybar > 0.0
    x, y = solve_with_set(low, upp)

    # Repair/acceptance tolerance floor scales with the COMPUTE dtype
    # (round-4 advisor): hard-coded 1e-8 is f64-scale; at f32 the dual
    # noise on weakly-active rows (~1e-6..1e-7) exceeds it and triggered
    # spurious pivots / sign_ok rejections. 1000*eps keeps f64 at the
    # measured 1e-8 while lifting f32 to ~1.2e-4.
    _tol0 = max(1e-8, 1000.0 * float(jnp.finfo(dtype).eps))

    def repair(low, upp, x, y):
        """Single-row active-set pivot from the polished point: drop the
        WORST wrong-signed active row, else add the MOST violated inactive
        row. One row per round — bulk repair was measured to cascade (a
        single spurious row makes the delta-regularized equality system
        inconsistent, smearing small violations over every row; repairing
        them all at once diverges, the classic one-at-a-time pivot
        converges immediately)."""
        idx = jnp.arange(m)
        Ax = A @ x
        stol = _tol0 * (1.0 + jnp.max(jnp.abs(y)))
        ftol = _tol0 * (1.0 + jnp.maximum(jnp.max(jnp.abs(Ax)),
                                          jnp.max(jnp.abs(y))))
        neg_inf = jnp.asarray(-jnp.inf, dtype)
        ws = (jnp.where(low, jnp.maximum(y, 0.0), 0.0)
              + jnp.where(upp, jnp.maximum(-y, 0.0), 0.0))
        inact = ~(low | upp)
        viol_l = jnp.where(inact, l - Ax, neg_inf)
        viol_u = jnp.where(inact, Ax - u, neg_inf)
        viol = jnp.maximum(viol_l, viol_u)
        do_drop = jnp.max(ws) > stol
        do_add = (~do_drop) & (jnp.max(viol) > ftol)
        kd = jnp.argmax(ws)
        ka = jnp.argmax(viol)
        hot_d = idx == kd
        hot_a = idx == ka
        add_low = viol_l[ka] >= viol_u[ka]
        low2 = jnp.where(do_drop, low & ~hot_d,
                         jnp.where(do_add & add_low, low | hot_a, low))
        upp2 = jnp.where(do_drop, upp & ~hot_d,
                         jnp.where(do_add & ~add_low, upp | hot_a, upp))
        return low2, upp2, do_drop | do_add

    if m > 0:
        # Repair rounds as ONE while_loop (round-4 advisor): the unrolled
        # Python loop traced _POLISH_ROUNDS-1 extra full solve_with_set
        # instances (each a fresh n x n factorization on the direct path)
        # into every polish — ~4x the trace/compile footprint even when
        # round 0 is already correct. The loop exits as soon as a round
        # makes no pivot, so the common case runs the body zero times.
        def _cond(st):
            k, _, _, _, _, cont = st
            return cont & (k < _POLISH_ROUNDS - 1)

        def _body(st):
            k, low, upp, x, y, _ = st
            low2, upp2, changed = repair(low, upp, x, y)
            x2, y2 = lax.cond(
                changed,
                lambda args: solve_with_set(args[0], args[1]),
                lambda args: (x, y), (low2, upp2))
            return k + 1, low2, upp2, x2, y2, changed

        _, low, upp, x, y, _ = lax.while_loop(
            _cond, _body,
            (jnp.int32(0), low, upp, x, y, jnp.asarray(True)))

    z = jnp.clip(A @ x, l, u)
    res = residual_norms(sdata, scal, dyn, x, y, z)
    finite = (jnp.all(jnp.isfinite(x)) & jnp.all(jnp.isfinite(y))
              & jnp.isfinite(res.pri_res) & jnp.isfinite(res.dua_res))
    # Acceptance: each residual must strictly improve on the ADMM one OR be
    # essentially exact (the old escape hatch required improvement on only
    # one axis when the other ADMM residual was ~0 — measured to accept a
    # wrong-face polish on the LP update cell), AND the polished duals must
    # be sign-consistent with the final active set (low-active y <= 0,
    # upper-active y >= 0 — a wrong set betrays itself by dual signs).
    tiny = jnp.asarray(1e-10 if dtype == jnp.float64 else 1e-6, dtype)
    better_p = res.pri_res < jnp.maximum(admm_pri_res, tiny)
    better_d = res.dua_res < jnp.maximum(admm_dua_res, tiny)
    if m > 0:
        stol = _tol0 * (1.0 + jnp.max(jnp.abs(y)))
        sign_ok = (jnp.all(jnp.where(low, y <= stol, True))
                   & jnp.all(jnp.where(upp, y >= -stol, True)))
    else:
        sign_ok = jnp.asarray(True)
    success = finite & better_p & better_d & sign_ok

    obj = scal.cinv * (0.5 * jnp.dot(x, P @ x) + jnp.dot(q, x))
    return PolishOutput(
        x=scal.D * x,
        y=scal.cinv * scal.E * y,
        z=scal.Einv * z,
        obj_val=obj,
        pri_res=res.pri_res,
        dua_res=res.dua_res,
        success=success,
    )
