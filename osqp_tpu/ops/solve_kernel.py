"""Full-solve Pallas kernel for shared-structure batches (fixed rho).

The epoch design (ops/shared_iter.py driven by shared_core) leaves the
termination checks and loop control in XLA, paying per-epoch overhead. When
rho is fixed (``adaptive_rho=False`` — the common deployed-MPC configuration,
since rho is tuned offline), there is no refactorization mid-solve and the
ENTIRE solve can run in one kernel invocation: iterate, check residuals every
``check_every`` iterations in-kernel, freeze converged lanes, exit when the
group is done.

Residuals are computed exactly as the XLA engine does (unscaled via
Einv/Dinv/cinv unless scaled_termination), so trajectories and iteration
counts match the epoch engine bit-for-bit for solved lanes. Infeasible lanes
do not terminate early in-kernel (the δy/δx tests run post-hoc outside) —
they cost max_iter iterations and are then classified by the driver.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(scal_ref,  # SMEM: [sigma, alpha, max_iter, check_every,
            #          eps_abs, eps_rel, cinv, scaled_term]
            rinv_ref, rat_ref, p_ref, a_ref, at_ref, rho_ref, rho_inv_ref,
            einv_ref, dinv_ref, q_ref, l_ref, u_ref,
            x0_ref, y0_ref, z0_ref,
            x_ref, y_ref, z_ref, xp_ref, yp_ref, done_ref, iters_ref):
    sigma = scal_ref[0]
    alpha = scal_ref[1]
    max_iter = scal_ref[2].astype(jnp.int32)
    check_every = scal_ref[3].astype(jnp.int32)
    eps_abs = scal_ref[4]
    eps_rel = scal_ref[5]
    cinv = scal_ref[6]

    Rinv_a = rinv_ref[:]     # αR⁻¹, pre-scaled — see shared_iter kernel
    RAt_a = rat_ref[:]       # αR⁻¹Aᵀ, pre-scaled
    P = p_ref[:]
    A = a_ref[:]
    At = at_ref[:]           # still used by the in-kernel residual check
    rho = rho_ref[:]
    rho_inv = rho_inv_ref[:]
    Einv = einv_ref[:]       # (1, m) — ones when scaled_termination
    Dinv = dinv_ref[:]       # (1, n)
    q = q_ref[:]
    lb = l_ref[:]
    ub = u_ref[:]
    pt = q.dtype
    beta = 1.0 - alpha

    def rowmax(M):  # (G, k) -> (G, 1)
        return jnp.max(jnp.abs(M), axis=1, keepdims=True)

    # done/iters live in the OUTPUT refs and are mutated under @pl.when
    # (vector-typed lax.cond carries fail Mosaic's scf.if legalization);
    # the loop carry holds only vectors + a scalar all-done flag.
    done_ref[:] = jnp.zeros_like(done_ref)
    iters_ref[:] = jnp.zeros_like(iters_ref)

    def body(carry):
        # carry duals are ρ-scaled (t = ρ⁻¹y) — see shared_iter kernel
        it, _, x, t, z, xp, tp = carry
        live = done_ref[:] == 0  # (G, 1)

        w = rho * (z - t)
        rhs = sigma * x - q + jnp.dot(w, A, preferred_element_type=pt)
        # two sibling products off one rhs (serial chain of 2, not 3)
        xt_a = jnp.dot(rhs, Rinv_a, preferred_element_type=pt)
        zt_a = jnp.dot(rhs, RAt_a, preferred_element_type=pt)
        x_new = xt_a + beta * x
        v = zt_a + beta * z + t
        z_new = jnp.clip(v, lb, ub)
        t_new = v - z_new

        xp = jnp.where(live, x, xp)
        tp = jnp.where(live, t, tp)
        x = jnp.where(live, x_new, x)
        t = jnp.where(live, t_new, t)
        z = jnp.where(live, z_new, z)
        it = it + 1

        do_check = (check_every > 0) & (it % jnp.maximum(check_every, 1) == 0)

        @pl.when(do_check)
        def _():
            y = rho * t
            Ax = jnp.dot(x, At, preferred_element_type=pt)
            Px = jnp.dot(x, P, preferred_element_type=pt)
            Aty = jnp.dot(y, A, preferred_element_type=pt)
            pri = rowmax(Einv * (Ax - z))
            prn = jnp.maximum(rowmax(Einv * Ax), rowmax(Einv * z))
            dua = cinv * rowmax(Dinv * (Px + q + Aty))
            dun = cinv * jnp.maximum(
                jnp.maximum(rowmax(Dinv * Px), rowmax(Dinv * Aty)),
                rowmax(Dinv * q))
            solved = ((pri <= eps_abs + eps_rel * prn)
                      & (dua <= eps_abs + eps_rel * dun))
            prev_done = done_ref[:] != 0
            newly = solved & jnp.logical_not(prev_done)
            iters_ref[:] = jnp.where(newly, it, iters_ref[:])
            done_ref[:] = (prev_done | solved).astype(jnp.int32)

        alldone = jnp.all(done_ref[:] != 0)
        return it, alldone, x, t, z, xp, tp

    def cond(carry):
        it, alldone, *_ = carry
        return (it < max_iter) & jnp.logical_not(alldone)

    t0 = rho_inv * y0_ref[:]
    it, _, x, t, z, xp, tp = lax.while_loop(
        cond, body,
        (jnp.int32(0), jnp.asarray(False),
         x0_ref[:], t0, z0_ref[:], x0_ref[:], t0))

    # non-converged lanes ran to the final iteration count
    iters_ref[:] = jnp.where(done_ref[:] != 0, iters_ref[:], it)
    x_ref[:] = x
    y_ref[:] = rho * t
    z_ref[:] = z
    xp_ref[:] = xp
    yp_ref[:] = rho * tp


@functools.partial(jax.jit, static_argnames=("group", "interpret"))
def admm_solve_shared(Rinv, P, A, rho_vec, rho_inv, Einv, Dinv, cinv,
                      q, l, u, x, y, z, sigma, alpha, max_iter, check_every,
                      eps_abs, eps_rel, group: int = 128,
                      interpret: bool = False):
    """Full fixed-rho solve for a shared-structure batch.

    Returns (x, y, z, x_prev, y_prev, done_int, iters), all with leading B;
    ``done_int`` is 1 for lanes whose residual check passed.
    """
    B, n = x.shape
    m = y.shape[1]
    dtype = x.dtype
    G = min(group, B)
    if B % G != 0:
        raise ValueError(f"batch {B} must be a multiple of group {G}")

    scalars = jnp.stack([
        jnp.asarray(sigma, dtype), jnp.asarray(alpha, dtype),
        jnp.asarray(max_iter, dtype), jnp.asarray(check_every, dtype),
        jnp.asarray(eps_abs, dtype), jnp.asarray(eps_rel, dtype),
        jnp.asarray(cinv, dtype), jnp.asarray(0.0, dtype)])

    shared2 = lambda r, c: pl.BlockSpec((r, c), lambda g, *_: (0, 0),
                                        memory_space=pltpu.VMEM)
    batched = lambda c: pl.BlockSpec((G, c), lambda g, *_: (g, 0),
                                     memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // G,),
        in_specs=[
            shared2(n, n),                 # Rinv
            shared2(n, m),                 # RAt = Rinv @ At
            shared2(n, n),                 # P
            shared2(m, n),                 # A
            shared2(n, m),                 # At
            shared2(1, m), shared2(1, m),  # rho, rho_inv
            shared2(1, m), shared2(1, n),  # Einv, Dinv
            batched(n),                    # q
            batched(m), batched(m),        # l, u
            batched(n), batched(m), batched(m),  # x, y, z
        ],
        out_specs=[
            batched(n), batched(m), batched(m),  # x, y, z
            batched(n), batched(m),              # x_prev, y_prev
            pl.BlockSpec((G, 1), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),  # done
            pl.BlockSpec((G, 1), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),  # iters
        ],
    )

    # α folded into both operators — saves two per-iteration multiplies in
    # the kernel (see shared_iter)
    alpha_c = jnp.asarray(alpha, dtype)
    RAt = alpha_c * jnp.dot(Rinv, A.T, precision=lax.Precision.HIGHEST,
                            preferred_element_type=dtype)
    Rinv = alpha_c * Rinv
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, n), dtype),
            jax.ShapeDtypeStruct((B, m), dtype),
            jax.ShapeDtypeStruct((B, m), dtype),
            jax.ShapeDtypeStruct((B, n), dtype),
            jax.ShapeDtypeStruct((B, m), dtype),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        interpret=interpret,
    )(scalars, Rinv, RAt, P, A, A.T, rho_vec[None, :], rho_inv[None, :],
      Einv[None, :], Dinv[None, :], q, l, u, x, y, z)
    x_o, y_o, z_o, xp_o, yp_o, done_o, iters_o = out
    return x_o, y_o, z_o, xp_o, yp_o, done_o[:, 0], iters_o[:, 0]
