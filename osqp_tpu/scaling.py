"""Modified Ruiz equilibration.

TPU-native implementation of the C core's ``scale_data`` (observable through the
``scaling`` setting — reference src/types.jl:114, Workspace temp vectors
D_temp/D_temp_A/E_temp at types.jl:205-207, and the scaled_termination setting).

Algorithm (OSQP paper §5.1, modified Ruiz): iterate ``scaling`` times on the
KKT-form matrix M = [P Aᵀ; A 0]:
  δd_j = 1/sqrt(max(‖P̄[:,j]‖∞, ‖Ā[:,j]‖∞)),  δe_i = 1/sqrt(‖Ā[i,:]‖∞)
followed by a cost normalization c *= 1/max(mean_j ‖P̄[:,j]‖∞, ‖q̄‖∞).
Norms are guarded by limit_scaling: values < MIN_SCALING (1e-4) map to 1 (no
scaling), values > MAX_SCALING (1e4) are clamped.

Scaled problem: P̄ = c·D P D, q̄ = c·D q, Ā = E A D, l̄ = E l, ū = E u.
Unscaling: x = D x̄, y = c⁻¹ E ȳ, z = E⁻¹ z̄.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .constants import MAX_SCALING, MIN_SCALING
from .types import QPData, ScalingData


def _limit_scaling(v):
    """C core limit_scaling: tiny norms → 1 (leave unscaled), huge → clamp."""
    v = jnp.where(v < MIN_SCALING, 1.0, v)
    return jnp.minimum(v, MAX_SCALING)


def ruiz_equilibrate(data: QPData, n_iters) -> tuple[QPData, ScalingData]:
    """Equilibrate ``data``; ``n_iters`` may be a traced int (0 = identity)."""
    P, q, A, l, u = data
    dtype = P.dtype
    n = P.shape[1]
    m = A.shape[0]
    one = jnp.ones((), dtype)

    def body(_, carry):
        P, q, A, l, u, D, E, c = carry
        # Column norms of the KKT-form matrix
        p_col = jnp.max(jnp.abs(P), axis=0) if n > 0 else jnp.zeros((0,), dtype)
        a_col = jnp.max(jnp.abs(A), axis=0) if m > 0 else jnp.zeros((n,), dtype)
        d_norm = jnp.maximum(p_col, a_col)
        delta_d = 1.0 / jnp.sqrt(_limit_scaling(d_norm))
        if m > 0:
            e_norm = jnp.max(jnp.abs(A), axis=1)
            delta_e = 1.0 / jnp.sqrt(_limit_scaling(e_norm))
        else:
            delta_e = jnp.zeros((0,), dtype)
        # Apply this round's scaling
        P = (delta_d[:, None] * P) * delta_d[None, :]
        q = delta_d * q
        A = (delta_e[:, None] * A) * delta_d[None, :]
        l = delta_e * l
        u = delta_e * u
        D = D * delta_d
        E = E * delta_e
        # Cost normalization
        p_col2 = jnp.max(jnp.abs(P), axis=0)
        avg_p = jnp.mean(p_col2) if n > 0 else jnp.zeros((), dtype)
        q_norm = jnp.max(jnp.abs(q)) if n > 0 else jnp.zeros((), dtype)
        gamma = 1.0 / _limit_scaling(jnp.maximum(avg_p, q_norm))
        P = gamma * P
        q = gamma * q
        c = c * gamma
        return P, q, A, l, u, D, E, c

    D0 = jnp.ones((n,), dtype)
    E0 = jnp.ones((m,), dtype)
    init = (P, q, A, l, u, D0, E0, one)
    P, q, A, l, u, D, E, c = lax.fori_loop(0, n_iters, body, init)

    scal = ScalingData(D=D, E=E, c=c, Dinv=1.0 / D, Einv=1.0 / E, cinv=1.0 / c)
    return QPData(P=P, q=q, A=A, l=l, u=u), scal


def identity_scaling(n: int, m: int, dtype) -> ScalingData:
    one = jnp.ones((), dtype)
    return ScalingData(
        D=jnp.ones((n,), dtype), E=jnp.ones((m,), dtype), c=one,
        Dinv=jnp.ones((n,), dtype), Einv=jnp.ones((m,), dtype), cinv=one,
    )
