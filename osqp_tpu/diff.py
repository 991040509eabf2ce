"""Differentiable QP solve (implicit differentiation through the KKT system).

A TPU-native capability beyond the reference's surface (the reference wrapper
— /root/reference/src/interface.jl — exposes no derivatives): treat the QP

    x*(P, q, A, l, u) = argmin 0.5 x'Px + q'x   s.t.  l <= Ax <= u

as a differentiable function of its data, so a solve can sit inside
``jax.grad`` / ``jax.vmap`` / ``jax.jit`` pipelines (learned MPC cost tuning,
end-to-end control, OptNet-style QP layers).

Method (adjoint / OptNet-style implicit differentiation): at a non-degenerate
solution the active constraints G = mask∘A behave as equalities, and (x*, y*)
satisfy the equality-constrained KKT conditions

    P x* + q + Gᵀ y*_act = 0,      G x* = b_act .

Given cotangents (x̄, ȳ), one linear solve with the (symmetric) KKT matrix

    S = [P  Gᵀ]
        [G   0]          S [d_x; d_ν] = [x̄; mask∘ȳ]

yields every data gradient:

    q̄ = -d_x
    P̄ = -sym(d_x x*ᵀ)                       (symmetrized, matching P ∈ Sⁿ)
    Ā = -(d_ν x*ᵀ + (mask∘y*) d_xᵀ)         (rows of inactive constraints: 0)
    ū_i = d_ν,i  on upper-active rows,  l̄_i = d_ν,i  on lower-active rows.

TPU twist (same as polish.py): the active set has data-dependent size, so S is
never gathered. It is solved in fixed shape through the delta-regularized
masked Schur complement R = P + δI + MᵀM/δ (M = mask∘A, dense Cholesky,
MXU-friendly, vmappable) followed by iterative refinement against the exact,
unregularized S — the identical numerical device polish.py uses for the
reduced polish KKT.

Caveats (standard for implicit QP differentiation):
- Gradients are exact only at non-degenerate solutions (strict
  complementarity + LICQ on the active rows). At degenerate points the
  regularized solve returns a particular (least-squares-flavored) element of
  the Clarke subdifferential.
- The active set is read off the sign of y* — exact for the ADMM iterates,
  whose inactive dual coordinates are identically zero by construction
  (y = rho∘(v - clip(v)) vanishes when v is strictly inside [l, u]).
- Gradients are NaN-poisoned when the forward status is not Solved /
  Solved_inaccurate, so silent use of garbage gradients is impossible.
- Solve to tight tolerances (f64, eps ~1e-9) when validating against finite
  differences; at eps=1e-3 the forward error dominates the FD stencil.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import constants as C
from .core import dyn_from_settings, solve as core_solve
from .linalg import chol_factor, chol_solve, sym, with_precision
from .settings import Settings
from .types import QPData


def _kkt_adjoint_solve(P, A, mask, xbar, ybar_act, delta, refine_iters):
    """Solve S [d_x; d_nu] = [xbar; ybar_act] with S the masked KKT matrix
    [P Gᵀ; G 0], G = mask∘A, in fixed shape: delta-regularized Schur
    complement + ``refine_iters`` steps of iterative refinement against the
    exact system. Inactive coordinates of d_nu are pinned to zero."""
    dtype = xbar.dtype
    n = P.shape[0]
    m = A.shape[0]
    delta = jnp.asarray(delta, dtype)

    def t(v):
        return A.T @ (mask * v)

    eye = jnp.eye(n, dtype=dtype)
    if m > 0:
        Ma = mask[:, None] * A
        R = P + delta * eye + (Ma.T @ Ma) / delta
    else:
        R = P + delta * eye
    L = chol_factor(sym(R))
    # explicit inverse (one n-rhs triangular-solve pair) so the refinement
    # loop's solves become plain matmuls: under vmap, batched triangular
    # solves serialize per column on TPU and the 1+refine_iters of them
    # dominated the whole adjoint (measured 455 ms/step at B=4096, n=128 —
    # the same trade the batched engines' "inverse" kkt_mode makes). The
    # refinement against the exact, unregularized KKT absorbs the
    # inverse's extra rounding exactly as it absorbs delta's.
    Rinv = chol_solve(L, eye)

    rhs1 = xbar
    rhs2 = mask * ybar_act if m > 0 else ybar_act

    def solve_reg(r1, r2):
        dx = Rinv @ (r1 + (t(r2) / delta if m > 0 else 0.0))
        if m > 0:
            dnu = mask * ((A @ dx) - r2) / delta
        else:
            dnu = r2
        return dx, dnu

    dx, dnu = solve_reg(rhs1, rhs2)

    def refine(_, carry):
        x, nu = carry
        r1 = rhs1 - (P @ x + (t(nu) if m > 0 else 0.0))
        r2 = rhs2 - (mask * (A @ x) if m > 0 else nu)
        ex, enu = solve_reg(r1, r2)
        return x + ex, nu + enu

    dx, dnu = jax.lax.fori_loop(0, refine_iters, refine, (dx, dnu))
    return dx, dnu


def make_qp_layer(settings: Settings | None = None, *,
                  delta: float = 1e-6, refine_iters: int = 8,
                  **overrides):
    """Build a differentiable solve ``fn(P, q, A, l, u) -> (x, y)``.

    ``settings``/``overrides`` configure the forward ADMM solve (tight eps
    recommended — see module docstring). ``delta``/``refine_iters`` control
    the adjoint KKT solve's regularization + refinement. The returned
    function composes with ``jax.jit``, ``jax.grad``, ``jax.vmap``.
    """
    base = settings if settings is not None else Settings(verbose=False)
    if overrides:
        base = base.replace(**overrides)
    dtype = base.resolve_dtype()
    scaling_iters = int(base.scaling)
    linsys = "indirect" if base.linsys_solver == C.INDIRECT_SOLVER else "direct"

    def _forward(P, q, A, l, u):
        data = QPData(P=jnp.asarray(P, dtype), q=jnp.asarray(q, dtype),
                      A=jnp.asarray(A, dtype), l=jnp.asarray(l, dtype),
                      u=jnp.asarray(u, dtype))
        dyn = dyn_from_settings(base, dtype)
        out = core_solve(data, dyn, scaling_iters, linsys=linsys)
        return out.x, out.y, out.status

    @jax.custom_vjp
    def qp_solve(P, q, A, l, u):
        x, y, _ = _forward(P, q, A, l, u)
        return x, y

    def fwd(P, q, A, l, u):
        x, y, status = _forward(P, q, A, l, u)
        Pd = jnp.asarray(P, dtype)
        Ad = jnp.asarray(A, dtype)
        return (x, y), (Pd, Ad, x, y, status)

    @with_precision
    def bwd(res, cots):
        Pd, Ad, x, y, status = res
        xbar, ybar = cots
        xbar = jnp.asarray(xbar, dtype)
        ybar = jnp.asarray(ybar, dtype)
        m = Ad.shape[0]

        low = y < 0.0
        upp = y > 0.0
        mask = (low | upp).astype(dtype)

        dx, dnu = _kkt_adjoint_solve(Pd, Ad, mask, xbar, mask * ybar,
                                     delta, refine_iters)

        ok = (status == C.SOLVED) | (status == C.SOLVED_INACCURATE)
        poison = jnp.where(ok, jnp.asarray(1.0, dtype),
                           jnp.asarray(jnp.nan, dtype))
        dx = dx * poison
        dnu = dnu * poison

        q_bar = -dx
        P_bar = -sym(jnp.outer(dx, x))
        if m > 0:
            A_bar = -(jnp.outer(dnu, x) + jnp.outer(mask * y, dx))
            l_bar = jnp.where(low, dnu, 0.0)
            u_bar = jnp.where(upp, dnu, 0.0)
        else:
            A_bar = jnp.zeros_like(Ad)
            l_bar = jnp.zeros((m,), dtype)
            u_bar = jnp.zeros((m,), dtype)
        return P_bar, q_bar, A_bar, l_bar, u_bar

    qp_solve.defvjp(fwd, bwd)
    return qp_solve


@functools.lru_cache(maxsize=64)
def _default_layer(key):
    settings, delta, refine_iters = key
    return make_qp_layer(Settings(**dict(settings)), delta=delta,
                         refine_iters=refine_iters)


def solve_qp(P, q, A, l, u, settings: Settings | None = None, *,
             delta: float = 1e-6, refine_iters: int = 8, **overrides):
    """One-shot differentiable solve: returns ``(x, y)``; gradients flow to
    every data argument. Layers are cached by settings value, so repeated
    calls with the same configuration reuse one ``custom_vjp`` function (and
    its jit cache when called under ``jax.jit``)."""
    base = settings if settings is not None else Settings(verbose=False)
    if overrides:
        base = base.replace(**overrides)
    key = (tuple(sorted(base.asdict().items())), delta, refine_iters)
    try:
        layer = _default_layer(key)
    except TypeError:  # unhashable setting value — build uncached
        layer = make_qp_layer(base, delta=delta, refine_iters=refine_iters)
    return layer(P, q, A, l, u)


def make_batched_qp_layer(settings: Settings | None = None, *,
                          delta: float = 1e-6, refine_iters: int = 8,
                          **overrides):
    """Differentiable SHARED-STRUCTURE batched solve
    ``fn(P, A, q, l, u) -> (x, y)`` for learned-MPC training: one P (n,n)
    and A (m,n) shared across the batch, per-lane q (B,n) / l,u (B,m).

    The forward pass runs the shared-structure engine (one Ruiz
    equilibration + one KKT factorization + the fused Pallas iteration
    kernels — the same path as ``BatchedSolver(kkt_mode="shared")``), so a
    training step pays batched-engine throughput rather than B per-lane
    factorizations of a vmapped :func:`make_qp_layer`.

    The backward pass is the same masked-KKT adjoint as
    :func:`make_qp_layer`, vmapped over lanes (each lane has its own
    active set, hence its own delta-regularized Schur factor — one batched
    (B,n,n) Cholesky, the cost of one polish pass). Because P and A are
    SHARED, their cotangents accumulate over the batch:

        P̄ = -Σ_b sym(d_x,b x*_bᵀ),   Ā = -Σ_b (d_ν,b x*_bᵀ + (m∘y*_b) d_x,bᵀ)

    while q̄/l̄/ū stay per-lane. Non-Solved lanes NaN-poison only their own
    lane's q̄/l̄/ū — and, through the shared sums, P̄/Ā (loudly, by design:
    a training step must not silently average over garbage gradients).
    Composes with ``jax.jit``/``jax.grad``; statuses follow the forward
    engine exactly (it IS the forward engine)."""
    import jax as _jax

    base = settings if settings is not None else Settings(verbose=False)
    if overrides:
        base = base.replace(**overrides)
    dtype = base.resolve_dtype()
    scaling_iters = int(base.scaling)

    def _forward(P, A, q, l, u):
        from .batch import _pick_group
        from .shared_core import solve_shared
        B, n = q.shape
        m = l.shape[-1]
        interpret = _jax.default_backend() not in ("tpu", "axon")
        group = _pick_group(B, n, m, jnp.dtype(dtype).itemsize, interpret)
        out = solve_shared(
            jnp.asarray(P, dtype), jnp.asarray(A, dtype),
            jnp.asarray(q, dtype), jnp.asarray(l, dtype),
            jnp.asarray(u, dtype),
            dyn_from_settings(base, dtype), jnp.int32(scaling_iters),
            jnp.zeros((B, n), dtype), jnp.zeros((B, m), dtype),
            group=group, interpret=interpret,
            adaptive=bool(base.adaptive_rho),
            lowp=bool(base.mixed_precision), tf32=base.tf32())
        return out.x, out.y, out.status

    @_jax.custom_vjp
    def qp_solve(P, A, q, l, u):
        x, y, _ = _forward(P, A, q, l, u)
        return x, y

    def fwd(P, A, q, l, u):
        x, y, status = _forward(P, A, q, l, u)
        return (x, y), (jnp.asarray(P, dtype), jnp.asarray(A, dtype),
                        x, y, status)

    @with_precision
    def bwd(res, cots):
        Pd, Ad, x, y, status = res
        xbar, ybar = (jnp.asarray(v, dtype) for v in cots)
        m = Ad.shape[0]

        low = y < 0.0
        upp = y > 0.0
        mask = (low | upp).astype(dtype)

        dx, dnu = _jax.vmap(
            lambda mk, xb, yb: _kkt_adjoint_solve(
                Pd, Ad, mk, xb, yb, delta, refine_iters)
        )(mask, xbar, mask * ybar)

        ok = (status == C.SOLVED) | (status == C.SOLVED_INACCURATE)
        poison = jnp.where(ok, jnp.asarray(1.0, dtype),
                           jnp.asarray(jnp.nan, dtype))[:, None]
        dx = dx * poison
        dnu = dnu * poison

        q_bar = -dx
        # shared-operator cotangents: sum of per-lane outer products, as
        # batched GEMMs (B-contracted) rather than B explicit outers
        P_bar = -sym(dx.T @ x)
        if m > 0:
            A_bar = -(dnu.T @ x + (mask * y).T @ dx)
            l_bar = jnp.where(low, dnu, 0.0)
            u_bar = jnp.where(upp, dnu, 0.0)
        else:
            A_bar = jnp.zeros_like(Ad)
            l_bar = jnp.zeros_like(y)
            u_bar = jnp.zeros_like(y)
        return P_bar, A_bar, q_bar, l_bar, u_bar

    qp_solve.defvjp(fwd, bwd)
    return qp_solve
