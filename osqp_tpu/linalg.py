"""Small linear-algebra helpers shared by the solver core.

All helpers are shape-polymorphic over empty dimensions (m = 0 unconstrained
problems — reference test/unconstrained.jl) and jit/vmap-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

#: Default matmul precision for all solver linear algebra. On TPU, XLA's
#: default f32 matmul runs in bfloat16 passes (~8-bit mantissa) — enough to
#: destroy Cholesky/triangular-solve accuracy and stall ADMM convergence.
#: "float32" (HIGHEST) uses full-precision passes. Overridable for
#: experiments via set_matmul_precision("tensorfloat32").
_MATMUL_PRECISION = "float32"


def set_matmul_precision(p: str) -> None:
    global _MATMUL_PRECISION
    _MATMUL_PRECISION = p


def precision_scope():
    """Context manager pinning matmul precision; enter during tracing."""
    return jax.default_matmul_precision(_MATMUL_PRECISION)


def with_precision(fn):
    """Decorator: trace ``fn`` under the solver's matmul precision."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with precision_scope():
            return fn(*args, **kwargs)

    return wrapper


def inf_norm(v):
    """∞-norm that returns 0 for empty vectors (m = 0 problems)."""
    if v.size == 0:
        return jnp.zeros((), dtype=v.dtype)
    return jnp.max(jnp.abs(v))


def sym(M):
    """Symmetrize (guards tiny asymmetry from user input / scaling rounding)."""
    return 0.5 * (M + M.T)


def chol_factor(R):
    """Lower-triangular Cholesky factor; NaN-filled if R is not PD."""
    return lax.linalg.cholesky(R, symmetrize_input=True)


def chol_solve(L, b):
    """Solve R x = b given L = chol(R). Works for b of shape (n,) or (n, k)."""
    vec = b.ndim == 1
    if vec:
        b = b[:, None]
    w = lax.linalg.triangular_solve(
        L, b, left_side=True, lower=True, transpose_a=False)
    x = lax.linalg.triangular_solve(
        L, w, left_side=True, lower=True, transpose_a=True)
    return x[:, 0] if vec else x


def reduced_kkt(P, A, sigma, rho_vec):
    """Form the reduced KKT matrix R = P + sigma*I + Aᵀ diag(rho) A.

    This is the n×n positive-definite reduction of the quasi-definite KKT
    system [P+σI, Aᵀ; A, -diag(ρ)⁻¹] the C core factorizes with QDLDL
    (SURVEY.md §2.2). On TPU the dense reduction feeds the MXU: one Cholesky
    per (re)factorization, two triangular solves per ADMM iteration.
    """
    n = P.shape[0]
    R = P + sigma * jnp.eye(n, dtype=P.dtype)
    if A.shape[0] > 0:
        R = R + (A.T * rho_vec[None, :]) @ A
    return sym(R)


def _block_jacobi_apply(Lb, r):
    """Apply the block-Jacobi preconditioner given per-block Cholesky
    factors ``Lb`` (nb, bs, bs): pad r to nb*bs, batched forward/backward
    triangular solves (one MXU-friendly batched op pair), cut back to n."""
    nb, bs = Lb.shape[0], Lb.shape[1]
    n = r.shape[0]
    rp = jnp.pad(r, (0, nb * bs - n)).reshape(nb, bs, 1)
    w = lax.linalg.triangular_solve(Lb, rp, left_side=True, lower=True)
    z = lax.linalg.triangular_solve(Lb, w, left_side=True, lower=True,
                                    transpose_a=True)
    return z.reshape(nb * bs)[:n]


def cg_solve(matvec, b, x0, tol, max_iter, M_inv_diag=None):
    """Preconditioned conjugate gradient for the indirect KKT path.

    Solves R x = b with R given implicitly by ``matvec``. The optional
    preconditioner ``M_inv_diag`` is either a (n,) vector (Jacobi — the
    sparse/matrix-free path) or a (nb, bs, bs) stack of block-Cholesky
    factors (block-Jacobi — the dense indirect path; see
    ``core._kkt_precompute``). Fixed-iteration-bound ``lax.while_loop`` —
    compile-friendly, batched under vmap.
    """
    dtype = b.dtype

    def precond(r):
        if M_inv_diag is None:
            return r
        if M_inv_diag.ndim == 3:
            return _block_jacobi_apply(M_inv_diag, r)
        return M_inv_diag * r

    r0 = b - matvec(x0)
    z0 = precond(r0)
    p0 = z0
    rz0 = jnp.dot(r0, z0)
    bnorm = jnp.maximum(inf_norm(b), jnp.asarray(1e-30, dtype))

    def cond(state):
        k, _, r, _, _ = state
        return (k < max_iter) & (inf_norm(r) > tol * bnorm) \
            & jnp.isfinite(inf_norm(r))

    def body(state):
        k, x, r, p, rz = state
        Ap = matvec(p)
        denom = jnp.dot(p, Ap)
        alpha = rz / jnp.where(denom == 0, jnp.asarray(1.0, dtype), denom)
        x_new = x + alpha * p
        r_new = r - alpha * Ap
        z = precond(r_new)
        rz_new = jnp.dot(r_new, z)
        beta = rz_new / jnp.where(rz == 0, jnp.asarray(1.0, dtype), rz)
        p_new = z + beta * p
        # f32 breakdown guard: if the step went non-finite (singular
        # preconditioner block, denom underflow at float32 — observed on
        # the chip as a spurious divergence -> Non_convex on a convex
        # problem), keep the last finite iterate; the outer ADMM absorbs
        # one inexact KKT solve.
        ok = jnp.all(jnp.isfinite(x_new))
        x_new = jnp.where(ok, x_new, x)
        r_new = jnp.where(ok, r_new, jnp.zeros_like(r))  # exits the loop
        return k + 1, x_new, r_new, p_new, rz_new

    _, x, _, _, _ = lax.while_loop(cond, body, (jnp.int32(0), x0, r0, p0, rz0))
    return x
