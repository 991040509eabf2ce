"""Fused multi-iteration ADMM Pallas kernel.

The XLA while_loop executes one ADMM iteration per step, so per-problem
operands (R⁻¹: n², A: m·n) stream from HBM every iteration — the dominant
cost once the KKT apply is a single GEMV. This kernel runs K iterations per
``pallas_call`` with everything resident in VMEM: per grid step (one problem
of the batch) it loads R⁻¹, A and the vectors once, then loops K times on
chip. HBM traffic drops by ~K (default K = check_termination = 25).

Iteration math is identical to :func:`osqp_tpu.batch_core.solve_batch_scaled`
(inverse KKT mode): the outer driver still performs termination checks,
adaptive rho and refactorization between kernel calls, at chunk boundaries —
exactly the cadence the C core uses (checks every check_termination iters).

VMEM budget per problem: (n² + 2·m·n + O(n+m)) · 4 bytes — for n=128, m=256
about 320 KB, comfortably inside the ~16 MB/core VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _iterate_kernel(scalars_ref,  # SMEM: [sigma, alpha, K]
                    rinv_ref, a_ref, q_ref, l_ref, u_ref,
                    rho_ref, rho_inv_ref, x0_ref, y0_ref, z0_ref,
                    x_ref, y_ref, z_ref, xp_ref, yp_ref):
    sigma = scalars_ref[0]
    alpha = scalars_ref[1]
    K = scalars_ref[2].astype(jnp.int32)

    Rinv = rinv_ref[0]      # (n, n)
    A = a_ref[0]            # (m, n)
    q = q_ref[0]            # (1, n) row vector
    lb = l_ref[0]           # (1, m)
    ub = u_ref[0]
    rho = rho_ref[0]
    rho_inv = rho_inv_ref[0]

    pt = q.dtype  # accumulate in the working dtype (f32 on TPU)

    def step(carry):
        x, y, z = carry
        # rhs = sigma x - q + Aᵀ(rho∘z - y);  Aᵀv as (1,m)·(m,n) on the MXU
        w = rho * z - y
        rhs = sigma * x - q + jnp.dot(w, A, preferred_element_type=pt)
        # x̃ = R⁻¹ rhs (R⁻¹ symmetric, so row-vector form is exact)
        xt = jnp.dot(rhs, Rinv, preferred_element_type=pt)
        # z̃ = A x̃ via dot_general contracting x̃'s lane dim with A's lane dim
        zt = lax.dot_general(xt, A, (((1,), (1,)), ((), ())),
                             preferred_element_type=pt)
        x_new = alpha * xt + (1.0 - alpha) * x
        v = alpha * zt + (1.0 - alpha) * z + rho_inv * y
        z_new = jnp.clip(v, lb, ub)
        y_new = rho * (v - z_new)
        return x_new, y_new, z_new

    x0 = x0_ref[0]
    y0 = y0_ref[0]
    z0 = z0_ref[0]
    # K-1 iterations, snapshot, final iteration (for the δx/δy sequences the
    # infeasibility checks need)
    xp, yp, zp = lax.while_loop(
        lambda c: c[0] < K - 1,
        lambda c: (c[0] + 1,) + step(c[1:]),
        (jnp.int32(0), x0, y0, z0))[1:]
    x, y, z = step((xp, yp, zp))

    xp_ref[0] = xp
    yp_ref[0] = yp
    x_ref[0] = x
    y_ref[0] = y
    z_ref[0] = z


@functools.partial(jax.jit, static_argnames=("interpret",))
def admm_iterate(Rinv, A, q, l, u, rho_vec, rho_inv, x, y, z,
                 sigma, alpha, K, interpret: bool = False):
    """Run K ADMM iterations for every problem in the batch.

    Shapes: Rinv (B,n,n), A (B,m,n), q/x (B,n), l/u/rho/y/z (B,m).
    Returns (x, y, z, x_prev, y_prev) after K iterations.
    """
    B, n = x.shape
    m = y.shape[1]
    dtype = x.dtype

    scalars = jnp.stack([jnp.asarray(sigma, dtype),
                         jnp.asarray(alpha, dtype),
                         jnp.asarray(K, dtype)])

    # index maps receive (grid_idx, scalar_prefetch_ref) with
    # PrefetchScalarGridSpec — hence the trailing *_
    def vec_spec(dim):
        return pl.BlockSpec((1, 1, dim), lambda b, *_: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    def mat_spec(r, c):
        return pl.BlockSpec((1, r, c), lambda b, *_: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            mat_spec(n, n),            # Rinv
            mat_spec(m, n),            # A
            vec_spec(n),               # q
            vec_spec(m), vec_spec(m),  # l, u
            vec_spec(m), vec_spec(m),  # rho, rho_inv
            vec_spec(n), vec_spec(m), vec_spec(m),  # x, y, z
        ],
        out_specs=[
            vec_spec(n), vec_spec(m), vec_spec(m),  # x, y, z
            vec_spec(n), vec_spec(m),               # x_prev, y_prev
        ],
    )

    r3 = lambda v: v[:, None, :]
    out = pl.pallas_call(
        _iterate_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, n), dtype),
            jax.ShapeDtypeStruct((B, 1, m), dtype),
            jax.ShapeDtypeStruct((B, 1, m), dtype),
            jax.ShapeDtypeStruct((B, 1, n), dtype),
            jax.ShapeDtypeStruct((B, 1, m), dtype),
        ],
        interpret=interpret,
    )(scalars, Rinv[:, :, :], A, r3(q), r3(l), r3(u),
      r3(rho_vec), r3(rho_inv), r3(x), r3(y), r3(z))
    xo, yo, zo, xpo, ypo = (o[:, 0, :] for o in out)
    return xo, yo, zo, xpo, ypo
