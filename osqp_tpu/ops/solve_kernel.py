"""Full-solve Pallas kernel for shared-structure batches.

The epoch design (ops/shared_iter.py driven by shared_core) leaves the
termination checks and loop control in XLA, paying per-epoch overhead. This
kernel runs a whole *leg* of the solve in one invocation: iterate, run the
COMPLETE termination classification in-kernel every ``check_every``
iterations — residual convergence, primal/dual infeasibility certificates'
detection tests, and NaN/overflow breakdown — freeze classified lanes, and
exit when the group is done.

Two callers (shared_core):

* ``solve_batch_shared_fixed`` (adaptive_rho off): the entire solve is one
  invocation;
* ``solve_batch_shared`` (adaptive rho): each leg spans up to the next
  rho-adaptation boundary (``adaptive_rho_interval`` iterations); the driver
  adapts/refactors between legs. Checks land on exactly the same iterates at
  exactly the same iteration numbers as the chunked epoch engine, so
  statuses and iteration counts are preserved.

Residuals and the infeasibility tests are computed exactly as the XLA
engine's shared_check does (unscaled via Einv/Dinv/cinv unless
scaled_termination; certificates always tested under the true scaling), so
trajectories, statuses, and iteration counts match the epoch engine for
every lane class.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C
from .shared_iter import dot3, split_bf16

_DIV_GUARD = 1e-10


def _kernel(scal_ref,  # SMEM: [sigma, alpha, max_iter, check_every,
            #          eps_abs, eps_rel, cinv_eff, eps_pinf, eps_dinf,
            #          cinv_raw, live_groups, it0]
            rinv_ref, rat_ref, p_ref, a_ref, at_ref, rho_ref, rho_inv_ref,
            einv_ref, dinv_ref, d_raw_ref, e_raw_ref, einv_raw_ref,
            dinv_raw_ref, q_ref, l_ref, u_ref,
            x0_ref, y0_ref, z0_ref, status0_ref,
            x_ref, y_ref, z_ref, xp_ref, yp_ref, stats_ref,
            tf32: bool = False):
    sigma = scal_ref[0]
    alpha = scal_ref[1]
    max_iter = scal_ref[2].astype(jnp.int32)
    check_every = scal_ref[3].astype(jnp.int32)
    eps_abs = scal_ref[4]
    eps_rel = scal_ref[5]
    cinv = scal_ref[6]          # effective (ones when scaled_termination)
    eps_pinf = scal_ref[7]
    eps_dinf = scal_ref[8]
    cinv_raw = scal_ref[9]
    live_groups = scal_ref[10].astype(jnp.int32)
    it0 = scal_ref[11].astype(jnp.int32)  # global iteration offset (legs)
    g = pl.program_id(0)

    @pl.when(g < live_groups)
    def _run():
        Rinv_a = rinv_ref[:]     # αR⁻¹, pre-scaled — see shared_iter kernel
        RAt_a = rat_ref[:]       # αR⁻¹Aᵀ, pre-scaled
        P = p_ref[:]
        A = a_ref[:]
        At = at_ref[:]
        rho = rho_ref[:]
        rho_inv = rho_inv_ref[:]
        Einv = einv_ref[:]       # (1, m) — effective (ones when scaled_term)
        Dinv = dinv_ref[:]       # (1, n)
        D_r = d_raw_ref[:]       # true scalings for the infeasibility tests
        E_r = e_raw_ref[:]
        Einv_r = einv_raw_ref[:]
        Dinv_r = dinv_raw_ref[:]
        q = q_ref[:]
        lb = l_ref[:]
        ub = u_ref[:]
        pt = q.dtype
        beta = 1.0 - alpha
        if tf32:
            # tensorfloat32 iteration products (see shared_iter.split_bf16):
            # loop-invariant operators split once; the classification block
            # below keeps full-precision dots — statuses never depend on
            # the reduced-precision path.
            A_s, Rinv_s, RAt_s = (split_bf16(A), split_bf16(Rinv_a),
                                  split_bf16(RAt_a))

        def rowmax(M):  # (G, k) -> (G, 1)
            return jnp.max(jnp.abs(M), axis=1, keepdims=True)

        # per-lane status/iters/residuals live in ONE packed (G, 8) f32
        # OUTPUT ref (columns: status, iters, pri, dua, prn, dun, 0, 0),
        # mutated under @pl.when — vector-typed lax.cond carries fail
        # Mosaic's scf.if legalization, and separate (G, 1) refs each pad
        # their minor dim to a full 128-lane tile, wasting ~1.3 MB of
        # scoped VMEM. Status codes and iteration counts are exact in f32.
        G_ = q.shape[0]
        inf_f = jnp.asarray(jnp.inf, pt)
        zcol = jnp.zeros((G_, 1), pt)
        stats_ref[:] = jnp.concatenate(
            [status0_ref[:], zcol, jnp.full((G_, 1), inf_f),
             jnp.full((G_, 1), inf_f), zcol, zcol, zcol, zcol], axis=1)

        def body(carry):
            it, _, x, t, z, xp, tp = carry
            live = stats_ref[:][:, 0:1] == C.RUNNING  # (G, 1)

            w = rho * (z - t)
            if tf32:
                rhs = sigma * x - q + dot3(split_bf16(w), A_s, pt)
                r_s = split_bf16(rhs)
                xt_a = dot3(r_s, Rinv_s, pt)
                zt_a = dot3(r_s, RAt_s, pt)
            else:
                rhs = sigma * x - q + jnp.dot(w, A,
                                              preferred_element_type=pt)
                # two sibling products off one rhs (chain of 2, not 3)
                xt_a = jnp.dot(rhs, Rinv_a, preferred_element_type=pt)
                zt_a = jnp.dot(rhs, RAt_a, preferred_element_type=pt)
            x_new = xt_a + beta * x
            v = zt_a + beta * z + t
            z_new = jnp.clip(v, lb, ub)
            t_new = v - z_new

            x = jnp.where(live, x_new, x)
            t = jnp.where(live, t_new, t)
            z = jnp.where(live, z_new, z)
            it = it + 1

            do_check = ((check_every > 0)
                        & ((it0 + it) % jnp.maximum(check_every, 1) == 0))

            @pl.when(do_check)
            def _():
                # The classification runs once per check_every iterations,
                # but its temporaries would otherwise dominate the kernel's
                # scoped-VMEM peak (the iterate body alone fits at the
                # auto-picked G; the full-group check pushed ~3 MB over the
                # 16 MB limit). Process the group in static sub-slices so
                # the check temps are (G/S, ·) and their lifetimes
                # serialize; results write disjoint ref slices.
                S = 4 if G_ % 4 == 0 and G_ >= 32 else 1
                H = G_ // S
                for si in range(S):
                    sl = slice(si * H, (si + 1) * H)
                    xs, ts, zs = x[sl], t[sl], z[sl]
                    xps, tps = xp[sl], tp[sl]
                    qs, lbs, ubs = q[sl], lb[sl], ub[sl]
                    # unscaled bounds + infinity masks, recomputed per
                    # slice (hoisting them G-wide kept ~1.5 MB live across
                    # the whole kernel and blew the scoped-VMEM budget)
                    u_uss = Einv_r * ubs
                    l_uss = Einv_r * lbs
                    u_infs = u_uss >= C.INFTY_THRESH
                    l_infs = l_uss <= -C.INFTY_THRESH
                    ys = rho * ts
                    # --- residual convergence (effective scalings) ---
                    Ax = jnp.dot(xs, At, preferred_element_type=pt)
                    Px = jnp.dot(xs, P, preferred_element_type=pt)
                    Aty = jnp.dot(ys, A, preferred_element_type=pt)
                    pri = rowmax(Einv * (Ax - zs))
                    prn = jnp.maximum(rowmax(Einv * Ax), rowmax(Einv * zs))
                    dua = cinv * rowmax(Dinv * (Px + qs + Aty))
                    dun = cinv * jnp.maximum(
                        jnp.maximum(rowmax(Dinv * Px), rowmax(Dinv * Aty)),
                        rowmax(Dinv * qs))
                    solved = ((pri <= eps_abs + eps_rel * prn)
                              & (dua <= eps_abs + eps_rel * dun))
                    bad = (jnp.isnan(pri) | jnp.isnan(dua)
                           | (pri > C.OSQP_INFTY) | (dua > C.OSQP_INFTY))

                    # --- primal infeasibility test on δy (true scalings)
                    dy = cinv_raw * E_r * rho * (ts - tps)
                    p_nrm = rowmax(dy)
                    p_s = 1.0 / jnp.maximum(p_nrm, _DIV_GUARD)
                    dyn_ = dy * p_s
                    At_dy = Dinv_r * jnp.dot(Einv_r * dyn_, A,
                                             preferred_element_type=pt)
                    dyp = jnp.maximum(dyn_, 0.0)
                    dym = jnp.minimum(dyn_, 0.0)
                    # NB plain logical ops, not bool-valued where():
                    # Mosaic rejects the i8->i1 trunc a bool select emits
                    bound_ok = jnp.min(
                        ((jnp.logical_not(u_infs) | (dyp <= eps_pinf))
                         & (jnp.logical_not(l_infs)
                            | (-dym <= eps_pinf))).astype(pt),
                        axis=1, keepdims=True) > 0.5
                    lhs = jnp.sum(jnp.where(u_infs, 0.0, u_uss * dyp)
                                  + jnp.where(l_infs, 0.0, l_uss * dym),
                                  axis=1, keepdims=True)
                    prim = ((p_nrm > eps_pinf)
                            & (rowmax(At_dy) <= eps_pinf)
                            & bound_ok & (lhs < -eps_pinf))

                    # --- dual infeasibility test on δx (true scalings) ---
                    dx_bar = xs - xps
                    dx = D_r * dx_bar
                    d_nrm = rowmax(dx)
                    d_s = 1.0 / jnp.maximum(d_nrm, _DIV_GUARD)
                    dxn = dx * d_s
                    dxn_bar = dx_bar * d_s
                    P_dx = cinv_raw * Dinv_r * jnp.dot(
                        dxn_bar, P, preferred_element_type=pt)
                    q_u = cinv_raw * Dinv_r * qs
                    cond_q = (jnp.sum(q_u * dxn, axis=1, keepdims=True)
                              < -eps_dinf)
                    A_dx = Einv_r * jnp.dot(dxn_bar, At,
                                            preferred_element_type=pt)
                    cond_A = jnp.min(
                        ((u_infs | (A_dx <= eps_dinf))
                         & (l_infs | (A_dx >= -eps_dinf))).astype(pt),
                        axis=1, keepdims=True) > 0.5
                    dual = ((d_nrm > eps_dinf)
                            & (rowmax(P_dx) <= eps_dinf) & cond_q & cond_A)

                    # status codes as pt-typed scalars: a where() whose
                    # branches are BOTH python floats promotes to f64 under
                    # x64, and Mosaic rejects f64 inside the kernel
                    c_ncvx = jnp.asarray(C.NON_CONVEX, pt)
                    c_sol = jnp.asarray(C.SOLVED, pt)
                    c_pinf = jnp.asarray(C.PRIMAL_INFEASIBLE, pt)
                    c_dinf = jnp.asarray(C.DUAL_INFEASIBLE, pt)
                    c_run = jnp.asarray(C.RUNNING, pt)
                    st_new = jnp.where(
                        bad, c_ncvx,
                        jnp.where(solved, c_sol,
                                  jnp.where(prim, c_pinf,
                                            jnp.where(dual, c_dinf,
                                                      c_run))))
                    old = stats_ref[sl]                       # (H, 8)
                    was_live = old[:, 0:1] == C.RUNNING
                    newly = was_live & (st_new != C.RUNNING)
                    itf = (it0 + it).astype(pt)
                    stats_ref[sl] = jnp.concatenate([
                        jnp.where(was_live, st_new.astype(pt), old[:, 0:1]),
                        jnp.where(newly, itf, old[:, 1:2]),
                        jnp.where(was_live, pri, old[:, 2:3]),
                        jnp.where(was_live, dua, old[:, 3:4]),
                        jnp.where(was_live, prn, old[:, 4:5]),
                        jnp.where(was_live, dun, old[:, 5:6]),
                        old[:, 6:8]], axis=1)

            # certificate-delta snapshot at CHECKS only (xp/tp hold the
            # last check's iterate): the per-iteration delta cancels
            # catastrophically at f32 and the in-kernel infeasibility
            # tests never fire — see core.solve_scaled body_fun. The
            # classification above reads the PRE-update xp/tp (the window).
            still = stats_ref[:][:, 0:1] == C.RUNNING  # post-check status
            do_snap = do_check & (
                ((it0 + it) % jnp.maximum(4 * check_every, 1)) == 0)
            upd = jnp.logical_and(still, do_snap)
            xp = jnp.where(upd, x, xp)
            tp = jnp.where(upd, t, tp)

            # NB numeric min-reduction, not jnp.all: Mosaic's reduce_and
            # proxy lowers through f64 under x64 and rejects the scalar
            alldone = jnp.min(jnp.abs(stats_ref[:][:, 0:1])) > 0.5
            return it, alldone, x, t, z, xp, tp

        def cond(carry):
            it, alldone, *_ = carry
            return (it < max_iter) & jnp.logical_not(alldone)

        t0 = rho_inv * y0_ref[:]
        it, _, x, t, z, xp, tp = lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.min(jnp.abs(status0_ref[:])) > 0.5,
             x0_ref[:], t0, z0_ref[:], x0_ref[:], t0))

        # non-classified lanes ran to the final iteration count
        fin = stats_ref[:]
        done = fin[:, 0:1] != C.RUNNING
        stats_ref[:] = jnp.concatenate(
            [fin[:, 0:1],
             jnp.where(done, fin[:, 1:2], (it0 + it).astype(pt)),
             fin[:, 2:8]], axis=1)
        x_ref[:] = x
        y_ref[:] = rho * t
        z_ref[:] = z
        xp_ref[:] = xp
        yp_ref[:] = rho * tp

    @pl.when(g >= live_groups)
    def _skip():
        x_ref[:] = x0_ref[:]
        y_ref[:] = y0_ref[:]
        z_ref[:] = z0_ref[:]
        xp_ref[:] = x0_ref[:]
        yp_ref[:] = y0_ref[:]
        Gs = x0_ref.shape[0]
        zc = jnp.zeros((Gs, 1), x0_ref.dtype)
        stats_ref[:] = jnp.concatenate(
            [status0_ref[:], zc, zc, zc, zc, zc, zc, zc], axis=1)


@functools.partial(jax.jit, static_argnames=("group", "interpret",
                                               "tf32"))
def admm_solve_shared(Rinv, P, A, rho_vec, rho_inv, Einv, Dinv, cinv,
                      q, l, u, x, y, z, sigma, alpha, max_iter, check_every,
                      eps_abs, eps_rel, scal=None, eps_pinf=1e-4,
                      eps_dinf=1e-4, status0=None, it0=0, live_groups=None,
                      group: int = 128, interpret: bool = False,
                      tf32: bool = False):
    """One fully-classified solve leg for a shared-structure batch.

    Runs up to ``max_iter`` in-kernel iterations starting from global
    iteration ``it0``; every ``check_every`` global iterations each lane is
    classified (Solved / Primal_infeasible / Dual_infeasible / Non_convex /
    still running) with the same math as shared_core.shared_check, and
    classified lanes freeze.

    ``scal`` supplies the TRUE scaling vectors (D, E, Dinv, Einv, cinv) for
    the infeasibility tests (Einv/Dinv/cinv args are the effective,
    possibly-identity, termination scalings). ``status0`` carries lane
    statuses across legs; ``live_groups`` skips whole trailing groups (lane
    compaction).

    Returns (x, y, z, x_prev, y_prev, status, iters, pri_res, dua_res,
    pri_norm, dua_norm), all with leading B.
    """
    B, n = x.shape
    m = y.shape[1]
    dtype = x.dtype
    G = min(group, B)
    if B % G != 0:
        raise ValueError(f"batch {B} must be a multiple of group {G}")
    if live_groups is None:
        live_groups = B // G
    if status0 is None:
        status0 = jnp.full((B,), C.RUNNING, jnp.int32)
    if scal is None:
        D_r, E_r = jnp.ones((n,), dtype), jnp.ones((m,), dtype)
        Dinv_r, Einv_r = D_r, E_r
        cinv_r = jnp.ones((), dtype)
    else:
        D_r, E_r = scal.D, scal.E
        Dinv_r, Einv_r = scal.Dinv, scal.Einv
        cinv_r = scal.cinv

    scalars = jnp.stack([
        jnp.asarray(sigma, dtype), jnp.asarray(alpha, dtype),
        jnp.asarray(max_iter, dtype), jnp.asarray(check_every, dtype),
        jnp.asarray(eps_abs, dtype), jnp.asarray(eps_rel, dtype),
        jnp.asarray(cinv, dtype), jnp.asarray(eps_pinf, dtype),
        jnp.asarray(eps_dinf, dtype), jnp.asarray(cinv_r, dtype),
        jnp.asarray(live_groups, dtype), jnp.asarray(it0, dtype)])

    shared2 = lambda r, c: pl.BlockSpec((r, c), lambda g, *_: (0, 0),
                                        memory_space=pltpu.VMEM)
    batched = lambda c: pl.BlockSpec((G, c), lambda g, *_: (g, 0),
                                     memory_space=pltpu.VMEM)
    lane1 = lambda c=1: pl.BlockSpec((G, c), lambda g, *_: (g, 0),
                                     memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // G,),
        in_specs=[
            shared2(n, n),                 # αR⁻¹
            shared2(n, m),                 # αR⁻¹Aᵀ
            shared2(n, n),                 # P
            shared2(m, n),                 # A
            shared2(n, m),                 # At
            shared2(1, m), shared2(1, m),  # rho, rho_inv
            shared2(1, m), shared2(1, n),  # Einv_eff, Dinv_eff
            shared2(1, n), shared2(1, m),  # D_raw, E_raw
            shared2(1, m), shared2(1, n),  # Einv_raw, Dinv_raw
            batched(n),                    # q
            batched(m), batched(m),        # l, u
            batched(n), batched(m), batched(m),  # x, y, z
            lane1(),                       # status0
        ],
        out_specs=[
            batched(n), batched(m), batched(m),  # x, y, z
            batched(n), batched(m),              # x_prev, y_prev
            lane1(8),  # packed stats: status, iters, pri, dua, prn, dun
        ],
    )

    # α folded into both operators — saves two per-iteration multiplies in
    # the kernel (see shared_iter)
    alpha_c = jnp.asarray(alpha, dtype)
    RAt = alpha_c * jnp.dot(Rinv, A.T, precision=lax.Precision.HIGHEST,
                            preferred_element_type=dtype)
    Rinv = alpha_c * Rinv
    out = pl.pallas_call(
        functools.partial(_kernel, tf32=tf32),
        grid_spec=grid_spec,
        # the full classification block's temporaries push the scoped-VMEM
        # stack past the default 16 MB accounting at G=512 even though the
        # sliced check's true peak fits; raise the cap to the hardware
        # budget and let Mosaic place it
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        out_shape=[
            jax.ShapeDtypeStruct((B, n), dtype),
            jax.ShapeDtypeStruct((B, m), dtype),
            jax.ShapeDtypeStruct((B, m), dtype),
            jax.ShapeDtypeStruct((B, n), dtype),
            jax.ShapeDtypeStruct((B, m), dtype),
            jax.ShapeDtypeStruct((B, 8), dtype),
        ],
        interpret=interpret,
    )(scalars, Rinv, RAt, P, A, A.T, rho_vec[None, :], rho_inv[None, :],
      Einv[None, :], Dinv[None, :], D_r[None, :], E_r[None, :],
      Einv_r[None, :], Dinv_r[None, :], q, l, u, x, y, z,
      status0[:, None].astype(dtype))
    x_o, y_o, z_o, xp_o, yp_o, stats = out
    return (x_o, y_o, z_o, xp_o, yp_o,
            stats[:, 0].astype(jnp.int32), stats[:, 1].astype(jnp.int32),
            stats[:, 2], stats[:, 3], stats[:, 4], stats[:, 5])
