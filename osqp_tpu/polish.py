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


@with_precision
def polish(sdata: QPData, scal: ScalingData, dyn: DynParams,
           delta, refine_iters, ybar,
           admm_pri_res, admm_dua_res,
           indirect: bool = False) -> PolishOutput:
    """Polish the (scaled) ADMM solution; the active set is guessed from the
    sign of the dual iterate ``ybar``.

    ``indirect=True`` solves the reduced polish system matrix-free with
    Jacobi-preconditioned CG (the large-sparse path, where no dense factor
    exists); requires operator P/A with ``diag``/``sqT`` companions."""
    P, q, A, l, u = sdata
    dtype = q.dtype
    n = q.shape[0]
    m = l.shape[0]
    delta = jnp.asarray(delta, dtype)

    low = ybar < 0.0
    upp = ybar > 0.0
    mask = (low | upp).astype(dtype)                      # (m,)
    b = jnp.where(low, l, jnp.where(upp, u, 0.0))         # (m,)

    def t(v):
        """Āᵀ(mask∘v) — the masked-active-rows transpose product."""
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

    rhs1 = -q
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

    x, y = lax.fori_loop(0, refine_iters, refine, (x0, y0))

    z = jnp.clip(A @ x, l, u)
    res = residual_norms(sdata, scal, dyn, x, y, z)
    finite = (jnp.all(jnp.isfinite(x)) & jnp.all(jnp.isfinite(y))
              & jnp.isfinite(res.pri_res) & jnp.isfinite(res.dua_res))
    # Accept iff both residuals strictly improve — with the escape hatch for
    # an ADMM residual that is already (near-)exactly zero, where strict
    # improvement on that axis is impossible (C core polish success check).
    tiny = 1e-10
    better_p = res.pri_res < admm_pri_res
    better_d = res.dua_res < admm_dua_res
    success = finite & ((better_p & better_d)
                        | (better_p & (admm_dua_res < tiny))
                        | (better_d & (admm_pri_res < tiny)))

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
