"""Batched QP solving — the TPU throughput front-end.

The reference solves one QP per C workspace, serially. On TPU the headline
workload (BASELINE.md: 1k-QP MPC batches) is thousands of same-structure QPs
solved as ONE compiled program: ``jax.vmap`` over stacked problem data (each
lane runs the identical control flow of :mod:`osqp_tpu.core`), sharded across
a device mesh along the batch axis (SURVEY.md §2.3 "Batch parallelism" row).

Per-problem termination inside the shared ``lax.while_loop`` is handled by
JAX's while-loop batching rule: finished lanes are masked, the program stops
when every lane is done.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .batch_core import merge_polish as _merge_polish
from .batch_core import solve_batch as _batched_solve_impl
from .core import dyn_from_settings, scale_problem
from .polish import polish as _polish_fn
from .settings import Settings
from .shared_core import (
    FactorCache,
    shared_ruiz as _shared_ruiz,
    solve_batch_shared as _shared_adaptive_impl,
    solve_batch_shared_fixed as _shared_fixed_impl,
    solve_shared as _shared_solve_impl,
)
from .types import QPData, SolveOutput

from . import constants as _C


def _batched_polish(data: QPData, dyn, scaling_iters, delta, refine,
                    out: SolveOutput) -> SolveOutput:
    """Standalone vmapped active-set polish (used after the shared-structure
    engine, whose internal scaling is the shared-Ruiz variant). The per-lane
    re-equilibration here differs from the shared scaling only by positive
    diagonal factors, and polish consumes ``out.ybar`` solely through its
    SIGN (active-set guess), so the mismatch is harmless. The per-lane
    batched engines polish inside :func:`osqp_tpu.batch_core.solve_batch`
    instead, reusing the solve's own scaled data."""
    sdata, scal = jax.vmap(lambda d: scale_problem(d, scaling_iters))(data)
    pol = jax.vmap(
        lambda sd, sc, yb, pr, du: _polish_fn(
            sd, sc, dyn, delta, refine, yb, pr, du)
    )(sdata, scal, out.ybar, out.pri_res, out.dua_res)
    return _merge_polish(out, pol)


_polish_batch_jit = jax.jit(_batched_polish)


def _sanitize_starts(x0, y0):
    """Per-lane cold start for non-finite warm starts: feeding a NaN-filled
    result (an infeasible lane) back as x0/y0 — the natural MPC loop —
    must not poison subsequent solves of that lane."""
    finite = (jnp.isfinite(x0).all(axis=-1, keepdims=True)
              & jnp.isfinite(y0).all(axis=-1, keepdims=True))
    return jnp.where(finite, x0, 0.0), jnp.where(finite, y0, 0.0)


def _nanfill(out: SolveOutput) -> SolveOutput:
    """Reference solution convention (src/interface.jl:184-210): x/y/z are
    NaN-filled when no solution is present (infeasible / non-convex /
    time-limit before any result); the certificates carry the rays. Applied
    at the API boundary only — internal consumers (rollout scan, chunked
    time-limit driver, polish) keep the raw iterates."""
    from .types import solution_present
    present = solution_present(out.status)[:, None]
    nan = jnp.asarray(jnp.nan, out.x.dtype)
    return out._replace(
        x=jnp.where(present, out.x, nan),
        y=jnp.where(present, out.y, nan),
        z=jnp.where(present, out.z, nan))


def _pick_group(B_local, n, m, itemsize=4, interpret=False):
    """Kernel group size: largest power of two ≤ 512 that divides the
    (per-device) batch and fits the shared-iter kernel's VMEM working set.

    Measured on v5e (n=128, m=256, B=4096): G=512 runs the iteration
    kernel at ~83% MFU(f32) vs ~71% at G=128.

    The scoped-VMEM model is calibrated against Mosaic's actual allocation
    reports on v5e (16 MB limit): usage ≈ shared operators (R⁻¹, A, R⁻¹Aᵀ:
    (n²+2mn)·4 B) + G·(8n+24m)·4 B for blocks/carries/temps. Anchors:
    (n=256,m=512,G=256) reports 16.01 MB (fails), G=128 fits;
    (n=512,m=1024,G=128) reports 19.78 MB (fails), G=64 fits;
    (n=128,m=256,G=512) fits at a predicted 15.0 MB."""
    per_lane = (8 * n + 24 * m) * itemsize
    shared = (n * n + 2 * m * n) * itemsize
    cap = max(8, int((15.5e6 - shared) // max(per_lane, 1)))
    g = 512
    while g > cap:
        g //= 2
    while g > 1 and B_local % g != 0:
        g //= 2
    if g >= 8 or interpret:
        return max(g, 1)
    # Mosaic requires the sublane block dim divisible by 8 OR equal to the
    # full array dim — for batches with fewer than three factors of two,
    # one whole-array group is the only valid tiling
    if B_local <= cap:
        return B_local
    raise ValueError(
        f"batch size {B_local} has no valid TPU kernel tiling at this "
        f"problem size (needs a power-of-two group >= 8, or the whole "
        f"batch within the ~{cap}-lane VMEM budget) — pad the batch to a "
        f"multiple of 8")


def _prepare_impl(Pm, A, q_absmax, scaling_iters):
    """Jitted prepare: shared Ruiz on (P, A) with a representative |q|."""
    return _shared_ruiz(Pm, A, q_absmax, scaling_iters)


_prepare_jit = jax.jit(_prepare_impl)


def _prepared_solve_impl(Pb, Ab, scal, q, l, u, x0, y0, dyn,
                         factor0: FactorCache, group: int, interpret: bool,
                         adaptive: bool, lowp: bool = False,
                         tf32: bool = False):
    """Jitted prepared re-solve: scale per-lane vectors with the cached
    (D, E, c), start from the cached factor, return (out, updated factor)."""
    from . import constants as C_
    l = jnp.clip(l, -C_.OSQP_INFTY, C_.OSQP_INFTY)
    u = jnp.clip(u, -C_.OSQP_INFTY, C_.OSQP_INFTY)
    qb = scal.c * scal.D * q
    lb = scal.E * l
    ub = scal.E * u
    x0, y0 = _sanitize_starts(x0, y0)
    xb = scal.Dinv * x0
    yb = scal.c * scal.Einv * y0
    zb = xb @ Ab.T
    if adaptive:
        return _shared_adaptive_impl(
            Pb, Ab, qb, lb, ub, scal, dyn, xb, yb, zb, group=group,
            interpret=interpret, factor0=factor0, with_factor=True,
            lowp=lowp, tf32=tf32)
    return _shared_fixed_impl(Pb, Ab, qb, lb, ub, scal, dyn, xb, yb, zb,
                              group=group, interpret=interpret,
                              factor0=factor0, with_factor=True, tf32=tf32)


_prepared_solve_jit = jax.jit(
    _prepared_solve_impl,
    static_argnames=("group", "interpret", "adaptive", "lowp", "tf32"))


def _rollout_impl(Pb, Ab, scal, q0, l0, u0, x0, y0, dyn,
                  factor0: FactorCache, step_fn, n_steps: int,
                  keep_xs: bool, group: int, interpret: bool,
                  adaptive: bool, lowp: bool, tf32: bool = False):
    """Jitted closed-loop rollout: lax.scan over prepared re-solves with
    warm starts and the KKT factor carried step to step."""

    def body(carry, k):
        q, l, u, x, y, factor = carry
        out, fac = _prepared_solve_impl(
            Pb, Ab, scal, q, l, u, x, y, dyn, factor, group=group,
            interpret=interpret, adaptive=adaptive, lowp=lowp, tf32=tf32)
        q2, l2, u2 = step_fn(out.x, (q, l, u), k)
        per_step = dict(status=out.status, iter=out.iter,
                        obj_val=out.obj_val)
        if keep_xs:
            per_step["xs"] = out.x
        return (q2, l2, u2, out.x, out.y, fac), per_step

    (qf, lf, uf, xf, yf, fac), stacked = lax.scan(
        body, (q0, l0, u0, x0, y0, factor0),
        jnp.arange(n_steps, dtype=jnp.int32))
    return stacked, (xf, yf), fac


_rollout_jit = jax.jit(
    _rollout_impl,
    static_argnames=("step_fn", "n_steps", "keep_xs", "group", "interpret",
                     "adaptive", "lowp", "tf32"))


def _vmapped_solve(data: QPData, dyn, scaling_iters, x0, y0,
                   kkt_mode: str = "inverse", do_polish: bool = False,
                   delta=1e-6, refine_iters=3,
                   tf32: bool = False) -> SolveOutput:
    """Batched solve. Implemented by the natively-batched engine
    (:mod:`osqp_tpu.batch_core`), NOT ``vmap(solve)`` — vmapping the
    while_loop would execute both branches of the adaptive-rho ``lax.cond``,
    running the batched Cholesky refactorization every iteration."""
    return _batched_solve_impl(data, dyn, scaling_iters, x0, y0, kkt_mode,
                               do_polish, delta, refine_iters, tf32=tf32)


class BatchedSolver:
    """Solve a batch of same-shape QPs in one XLA program.

    Example::

        solver = BatchedSolver(settings=Settings(eps_abs=1e-3, eps_rel=1e-3))
        out = solver.solve(P, q, A, l, u)       # leading batch axis on all
        out.x          # (B, n) solutions
        out.status     # (B,) status codes (osqp_tpu.constants)

    With ``mesh`` given, inputs/outputs are sharded along the batch axis over
    the mesh's ``axis_name`` — scaling across chips with zero collectives
    (embarrassingly parallel).
    """

    def __init__(self, settings: Optional[Settings] = None,
                 mesh: Optional[Mesh] = None, axis_name: str = "b",
                 kkt_mode: str = "inverse", profile: bool = False):
        """``kkt_mode``: "inverse" (default — explicit R⁻¹, one batched GEMV
        per iteration, the fast path for the eps~1e-3 MPC regime) or "chol"
        (triangular solves; use for high-accuracy f64 conformance runs).

        ``profile=True`` records each solve's synced wall time in
        ``last_solve_time`` (the batched analogue of CInfo solve_time);
        off by default because the sync breaks async dispatch pipelining."""
        self.settings = settings or Settings()
        self.mesh = mesh
        self.axis_name = axis_name
        self.kkt_mode = kkt_mode
        self.profile = bool(profile)
        self.last_solve_time = 0.0
        if mesh is not None:
            # batch axis sharded on every stacked leaf; dyn scalars replicated
            def shard(ndim):
                return NamedSharding(
                    mesh, P(*([axis_name] + [None] * (ndim - 1))))
            in_shardings = (
                QPData(P=shard(3), q=shard(2), A=shard(3),
                       l=shard(2), u=shard(2)),
                None, None, shard(2), shard(2), None, None)
            self._jit = jax.jit(_vmapped_solve, in_shardings=in_shardings,
                                static_argnames=("kkt_mode", "do_polish",
                                                 "tf32"))
        else:
            self._jit = jax.jit(_vmapped_solve,
                                static_argnames=("kkt_mode", "do_polish",
                                                 "tf32"))
        self._shared_jit = jax.jit(
            lambda P, A, q, l, u, dyn, sc, x0, y0, group, interpret, adaptive,
            lowp, tf32:
            _shared_solve_impl(P, A, q, l, u, dyn, sc, x0, y0,
                               group=group, interpret=interpret,
                               adaptive=adaptive, lowp=lowp, tf32=tf32),
            static_argnames=("group", "interpret", "adaptive", "lowp",
                             "tf32"))

    def update_settings(self, **kwargs):
        """Post-construction settings update (reference interface.jl:442-670
        semantics, completing the engine-parity surface): validates against
        UPDATABLE_SETTINGS. All updatable settings are traced parameters
        (``DynParams``), so no recompilation is triggered; a ``rho`` change
        flows into the next solve's parameter bundle. On a prepared
        workspace the carried factor's adaptively-tuned rho normally wins
        (persistent-workspace semantics), so a ``rho`` update additionally
        resets the carried ``rho_bar`` and zeroes the cached rho vector —
        the next :meth:`solve_prepared` refactors in-jit at the new rho,
        matching the reference's osqp_update_rho refactorization
        (interface.jl:540-556)."""
        self.settings.update_inplace(**kwargs)
        if "rho" in kwargs and hasattr(self, "_prep"):
            f = self._prep["factor"]
            dtype = self.settings.resolve_dtype()
            self._prep["factor"] = f._replace(
                rho_bar=jnp.asarray(float(kwargs["rho"]), dtype),
                rho_vec=jnp.zeros_like(f.rho_vec),
                rho_inv=jnp.zeros_like(f.rho_inv))

    def solve(self, Pm, q, A, l, u, x0=None, y0=None,
              rho0=None) -> SolveOutput:
        """Solve the batch. ``Pm``/``A`` may be (n,n)/(m,n) shared or
        (B,n,n)/(B,m,n) stacked; q (B,n); l/u (B,m); optional unscaled
        warm starts x0 (B,n), y0 (B,m). Returns a batched SolveOutput.

        ``rho0``: initial rho for this solve, overriding ``settings.rho``.
        In the reference, the C workspace's adaptively-tuned rho persists
        across update!/solve! cycles (src/interface.jl:408-440 mutates the
        same workspace); for the stateless batched API, pass the previous
        solve's ``out.rho_estimate`` here to get the same warm-re-solve
        economics (fewer rho refactorizations + fewer iterations)."""
        import time as _time
        _t0 = _time.perf_counter()
        s = self.settings
        dtype = s.resolve_dtype()
        Pm = jnp.asarray(Pm, dtype)
        q = jnp.asarray(q, dtype)
        A = jnp.asarray(A, dtype)
        l = jnp.asarray(l, dtype)
        u = jnp.asarray(u, dtype)
        B, n = q.shape
        m = l.shape[-1]
        x0 = jnp.zeros((B, n), dtype) if x0 is None else jnp.asarray(x0, dtype)
        y0 = jnp.zeros((B, m), dtype) if y0 is None else jnp.asarray(y0, dtype)
        x0, y0 = _sanitize_starts(x0, y0)
        dyn = dyn_from_settings(s, dtype)
        if rho0 is not None:
            rho0 = np.median(np.asarray(rho0)) if np.ndim(rho0) else rho0
            dyn = dyn._replace(rho_bar=jnp.asarray(float(rho0), dtype))
        if s.time_limit and s.time_limit > 0:
            out = self._solve_time_limited(Pm, q, A, l, u, x0, y0, dyn,
                                           dtype)
        else:
            out = self._dispatch(Pm, q, A, l, u, x0, y0, dyn, dtype,
                                 do_polish=bool(s.polish))
            if s.polish and self.kkt_mode == "shared":
                out = self._apply_polish(Pm, A, q, l, u, dyn, dtype, out)
            out = _nanfill(out)
        if self.profile:
            # wall-clock of the whole batch solve (the batched analogue of
            # CInfo solve_time, types.jl:93; per-lane time = this / B).
            # Opt-in because the sync breaks async dispatch pipelining
            # (bench.py's slope method depends on it).
            jax.block_until_ready(out.x)
            self.last_solve_time = _time.perf_counter() - _t0
        return out

    # ------------------------------------------------------------------
    # Prepared-workspace mode (persistent factor across re-solves)
    # ------------------------------------------------------------------
    def prepare(self, Pm, A, q=None):
        """Set up a persistent shared workspace for repeated re-solves.

        Mirrors the reference's setup!-once / update!+solve! persistent C
        workspace (src/interface.jl:408-440): Ruiz equilibration of the
        shared (P, A) runs ONCE here, and the KKT factorization plus the
        adaptively-tuned rho persist across :meth:`solve_prepared` calls —
        a warm MPC re-solve pays only for its iterations.

        ``q`` (optional, (B, n) or (n,)): representative cost(s) for the
        cost-normalization term of the scaling. Any consistent scaling is
        valid for later q's (termination uses unscaled residuals); passing a
        typical q just matches the one-shot path's conditioning exactly.

        Requires ``kkt_mode='shared'``. Returns ``self``."""
        if self.kkt_mode != "shared":
            raise ValueError("prepare() requires kkt_mode='shared'")
        s = self.settings
        dtype = s.resolve_dtype()
        Pm = jnp.asarray(Pm, dtype)
        A = jnp.asarray(A, dtype)
        if Pm.ndim != 2 or A.ndim != 2:
            raise ValueError("prepare() takes one shared P (n,n) and A (m,n)")
        n = Pm.shape[0]
        m = A.shape[0]
        if q is None:
            q_absmax = jnp.ones((n,), dtype)
        else:
            q_absmax = jnp.max(jnp.abs(jnp.atleast_2d(
                jnp.asarray(q, dtype))), axis=0)
        Pb, Ab, scal = _prepare_jit(Pm, A, q_absmax, jnp.int32(s.scaling))
        # rho_vec=0 never matches a real rho vector, so the first prepared
        # solve computes the factor in-jit; later solves reuse/evolve it
        self._prep = {
            "P": Pm, "A": A, "Pb": Pb, "Ab": Ab, "scal": scal,
            "factor": FactorCache(
                Rinv=jnp.zeros((n, n), dtype),
                rho_vec=jnp.zeros((m,), dtype),
                rho_inv=jnp.zeros((m,), dtype),
                rho_bar=jnp.asarray(s.rho, dtype)),
        }
        return self

    def solve_prepared(self, q, l, u, x0=None, y0=None,
                       rho0=None) -> SolveOutput:
        """Re-solve the prepared workspace with new per-lane (q, l, u).

        The cached scaling and KKT factor are reused; the factor adapted
        during this solve (rho refactorizations) is carried into the next
        call — the reference's persistent-workspace warm economics. Pass
        ``x0``/``y0`` (unscaled) to warm-start; ``rho0`` overrides the
        carried rho (forcing one in-jit refactorization if it differs)."""
        if not hasattr(self, "_prep"):
            raise RuntimeError("call prepare(P, A) first")
        s = self.settings
        dtype = s.resolve_dtype()
        p = self._prep
        q = jnp.asarray(q, dtype)
        l = jnp.asarray(l, dtype)
        u = jnp.asarray(u, dtype)
        B, n = q.shape
        m = l.shape[-1]
        x0 = jnp.zeros((B, n), dtype) if x0 is None else jnp.asarray(x0, dtype)
        y0 = jnp.zeros((B, m), dtype) if y0 is None else jnp.asarray(y0, dtype)
        dyn = dyn_from_settings(s, dtype)
        factor = p["factor"]
        if rho0 is not None:
            rho0 = np.median(np.asarray(rho0)) if np.ndim(rho0) else rho0
            factor = factor._replace(rho_bar=jnp.asarray(float(rho0), dtype))
        interpret = jax.default_backend() not in ("tpu", "axon")
        group = _pick_group(B, n, m, jnp.dtype(dtype).itemsize, interpret)
        out, fac = _prepared_solve_jit(
            p["Pb"], p["Ab"], p["scal"], q, l, u, x0, y0, dyn, factor,
            group=group, interpret=interpret,
            adaptive=bool(s.adaptive_rho),
            lowp=bool(s.mixed_precision), tf32=s.tf32())
        p["factor"] = fac
        if s.polish:
            out = self._apply_polish(p["P"], p["A"], q, l, u, dyn, dtype, out)
        return _nanfill(out)

    def solve_rollout(self, q0, l0, u0, step_fn, n_steps: int,
                      x0=None, y0=None, keep_xs: bool = False):
        """Closed-loop receding-horizon rollout, entirely on device.

        Runs ``n_steps`` prepared re-solves as ONE compiled program
        (``lax.scan``): step k solves the batch at data ``(q_k, l_k, u_k)``,
        then ``q_{k+1}, l_{k+1}, u_{k+1} = step_fn(x_k, (q_k, l_k, u_k), k)``
        with ``x_k`` the step's (unscaled, per-lane) solutions. Warm starts
        and the adapted KKT factor carry from step to step, so no host
        round-trip separates control steps — the dispatch/transfer latency
        that dominates per-step serving cost is paid once per rollout.

        ``step_fn`` must be jax-traceable (it runs inside jit) and return
        arrays of the same shapes. Returns a dict with per-step stacked
        ``status``/``iter``/``obj_val`` (shape (n_steps, B)), the final
        ``x``/``y`` (B, n)/(B, m), and ``xs`` (n_steps, B, n) when
        ``keep_xs``. Polish is not applied inside rollouts (polish the
        final iterate separately if needed). Requires :meth:`prepare`.

        Sizing note for relayed runtimes that cap single-dispatch wall
        time: the whole rollout is one dispatch — keep
        ``n_steps × per-solve time`` under the cap."""
        if not hasattr(self, "_prep"):
            raise RuntimeError("call prepare(P, A) first")
        s = self.settings
        dtype = s.resolve_dtype()
        p = self._prep
        q0 = jnp.asarray(q0, dtype)
        l0 = jnp.asarray(l0, dtype)
        u0 = jnp.asarray(u0, dtype)
        B, n = q0.shape
        m = l0.shape[-1]
        x0 = jnp.zeros((B, n), dtype) if x0 is None \
            else jnp.asarray(x0, dtype)
        y0 = jnp.zeros((B, m), dtype) if y0 is None \
            else jnp.asarray(y0, dtype)
        dyn = dyn_from_settings(s, dtype)
        interpret = jax.default_backend() not in ("tpu", "axon")
        group = _pick_group(B, n, m, jnp.dtype(dtype).itemsize, interpret)
        outs, (xf, yf), fac = _rollout_jit(
            p["Pb"], p["Ab"], p["scal"], q0, l0, u0, x0, y0, dyn,
            p["factor"], step_fn=step_fn, n_steps=int(n_steps),
            keep_xs=bool(keep_xs), group=group, interpret=interpret,
            adaptive=bool(s.adaptive_rho), lowp=bool(s.mixed_precision),
            tf32=s.tf32())
        p["factor"] = fac
        outs = dict(outs)
        outs["x"] = xf
        outs["y"] = yf
        return outs

    def _dispatch(self, Pm, q, A, l, u, x0, y0, dyn, dtype,
                  do_polish: bool) -> SolveOutput:
        """One jitted batched solve (no host control flow)."""
        s = self.settings
        B, n = q.shape
        m = l.shape[-1]
        if self.kkt_mode == "shared":
            if Pm.ndim != 2 or A.ndim != 2:
                raise ValueError(
                    "kkt_mode='shared' requires one shared P (n,n) and "
                    "A (m,n) for the whole batch")
            interpret = jax.default_backend() not in ("tpu", "axon")
            if self.mesh is not None:
                # multi-chip shared mode: shard_map over the batch axis —
                # every device runs the shared pipeline on its local lanes
                # (P/A replicated). With fixed rho the devices are fully
                # independent; with adaptive rho the loop continuation and
                # rho aggregation become psum collectives (axis_name passed
                # into the engine) so every device decides identically.
                ndev = self.mesh.devices.size
                if B % ndev != 0:
                    raise ValueError(
                        f"batch {B} must be divisible by mesh size {ndev}")
                group = _pick_group(B // ndev, n, m,
                                    jnp.dtype(dtype).itemsize, interpret)
                from jax.sharding import PartitionSpec as PS
                from jax import shard_map

                bspec = PS(self.axis_name)
                rspec = PS()
                fn = shard_map(
                    lambda Pm_, A_, q_, l_, u_, x0_, y0_:
                    _shared_solve_impl(Pm_, A_, q_, l_, u_, dyn,
                                       jnp.int32(s.scaling), x0_, y0_,
                                       group=group, interpret=interpret,
                                       adaptive=bool(s.adaptive_rho),
                                       axis_name=self.axis_name,
                                       lowp=bool(s.mixed_precision),
                                       tf32=s.tf32()),
                    mesh=self.mesh,
                    in_specs=(rspec, rspec, bspec, bspec, bspec,
                              bspec, bspec),
                    out_specs=SolveOutput(
                        x=bspec, y=bspec, z=bspec, status=bspec, iter=bspec,
                        pri_res=bspec, dua_res=bspec, obj_val=bspec,
                        prim_cert=bspec, dual_cert=bspec,
                        rho_updates=bspec, rho_estimate=bspec,
                        xbar=bspec, ybar=bspec, zbar=bspec,
                        status_polish=rspec, rho_dir=rspec, rho_gap=rspec,
                        next_rho=rspec),
                    check_vma=False)
                out = jax.jit(fn)(Pm, A, q, l, u, x0, y0)
            else:
                group = _pick_group(B, n, m, jnp.dtype(dtype).itemsize,
                                    interpret)
                out = self._shared_jit(Pm, A, q, l, u, dyn,
                                       jnp.int32(s.scaling), x0, y0,
                                       group, interpret, bool(s.adaptive_rho),
                                       bool(s.mixed_precision), s.tf32())
        else:
            if Pm.ndim == 2:  # shared P / A broadcast across the batch
                Pm = jnp.broadcast_to(Pm, (B, n, n))
            if A.ndim == 2:
                A = jnp.broadcast_to(A, (B, m, n))
            data = QPData(P=Pm, q=q, A=A, l=l, u=u)
            # polish runs inside the same jit, on the solve's own scaled data
            out = self._jit(data, dyn, jnp.int32(s.scaling), x0, y0,
                            self.kkt_mode, do_polish,
                            jnp.asarray(s.delta, dtype),
                            jnp.int32(s.polish_refine_iter),
                            s.tf32())
        return out

    def _apply_polish(self, Pm, A, q, l, u, dyn, dtype, out) -> SolveOutput:
        """Separate polish pass (shared engine / post-time-limit): per-lane
        scaling; see _batched_polish docstring for why this is consistent."""
        s = self.settings
        B, n = q.shape
        m = l.shape[-1]
        if Pm.ndim == 2:
            Pm = jnp.broadcast_to(Pm, (B, n, n))
        if A.ndim == 2:
            A = jnp.broadcast_to(A, (B, m, n))
        data = QPData(P=Pm, q=q, A=A, l=l, u=u)
        return _polish_batch_jit(
            data, dyn, jnp.int32(s.scaling),
            jnp.asarray(s.delta, dtype),
            jnp.int32(s.polish_refine_iter), out)

    def _solve_time_limited(self, Pm, q, A, l, u, x0, y0, dyn,
                            dtype) -> SolveOutput:
        """Chunked host driver for ``time_limit`` on the batched paths
        (VERDICT round-1 item #6; reference contract constants.jl:17-18):
        run jitted chunks of iterations, check the wall clock between
        chunks, and mark lanes still running at expiry Time_limit_reached.
        KeyboardInterrupt between chunks maps to Interrupted, mirroring the
        single-problem driver (interface._solve_time_limited).

        Chunk boundaries re-enter ADMM by warm start (z re-derived as Ax),
        so per-lane iteration counts can differ slightly from an unchunked
        run; statuses and solutions are unaffected."""
        import time as _time

        s = self.settings
        C_ = _C
        max_iter = int(s.max_iter)
        chunk = s.check_termination if s.check_termination > 0 else 25
        chunk = max(int(chunk) * 8, 100)
        start = _time.perf_counter()

        total = 0
        # committed per-lane results (frozen as lanes finish)
        done = None
        out_acc = None
        iters_acc = None
        xw, yw = x0, y0
        status_val = None
        resume = None
        try:
            while total < max_iter:
                this = min(chunk, max_iter - total)
                is_final = total + this >= max_iter
                dyn_c = dyn._replace(
                    max_iter=jnp.int32(this),
                    final_approx=jnp.int32(1 if is_final else 0))
                if resume is not None:
                    # resume the (per-lane) rho back-off state so the damped
                    # schedule persists across chunks (round-4 advisor fix);
                    # next_rho is absolute within the chunk's lockstep
                    # counter — rebase by the chunk length just run
                    dyn_c = dyn_c._replace(
                        rho_dir0=resume[0], rho_gap0=resume[1],
                        next_rho0=resume[2])
                out = self._dispatch(Pm, q, A, l, u, xw, yw, dyn_c, dtype,
                                     do_polish=False)
                resume = (out.rho_dir, out.rho_gap,
                          jnp.maximum(out.next_rho - this, 0))
                jax.block_until_ready(out.x)
                st = np.asarray(out.status)
                it = np.asarray(out.iter)
                if out_acc is None:
                    out_acc = out
                    done = np.zeros(st.shape, bool)
                    iters_acc = np.zeros(st.shape, np.int64)
                newly = (~done) & (st != C_.RUNNING)                     & (st != C_.MAX_ITER_REACHED)
                iters_acc = np.where(done, iters_acc,
                                     total + it.astype(np.int64))
                # freeze newly finished lanes into the accumulator
                sel = jnp.asarray(newly | done)
                selc = sel[:, None]
                out_acc = out_acc._replace(
                    x=jnp.where(selc, out_acc.x, out.x),
                    y=jnp.where(selc, out_acc.y, out.y),
                    z=jnp.where(selc, out_acc.z, out.z),
                    status=jnp.where(sel, out_acc.status, out.status),
                    pri_res=jnp.where(sel, out_acc.pri_res, out.pri_res),
                    dua_res=jnp.where(sel, out_acc.dua_res, out.dua_res),
                    obj_val=jnp.where(sel, out_acc.obj_val, out.obj_val),
                    prim_cert=jnp.where(selc, out_acc.prim_cert,
                                        out.prim_cert),
                    dual_cert=jnp.where(selc, out_acc.dual_cert,
                                        out.dual_cert),
                    xbar=jnp.where(selc, out_acc.xbar, out.xbar),
                    ybar=jnp.where(selc, out_acc.ybar, out.ybar),
                    zbar=jnp.where(selc, out_acc.zbar, out.zbar),
                )
                # where a lane was already done keep its committed status
                st_eff = np.where(done, np.asarray(out_acc.status), st)
                done = done | newly
                total += this
                if np.all(done) or is_final:
                    # statuses for non-done lanes come from the final
                    # chunk's classification (incl. approximate statuses)
                    out_acc = out_acc._replace(
                        status=jnp.asarray(st_eff, jnp.int32))
                    break
                if (_time.perf_counter() - start) > s.time_limit:
                    status_val = C_.TIME_LIMIT_REACHED
                    break
                xw, yw = out.x, out.y
        except KeyboardInterrupt:
            if out_acc is None:
                raise
            status_val = C_.INTERRUPTED
        if status_val is not None:
            st_final = np.where(done, np.asarray(out_acc.status), status_val)
            out_acc = out_acc._replace(status=jnp.asarray(st_final, jnp.int32))
        out_acc = out_acc._replace(iter=jnp.asarray(iters_acc, jnp.int32))
        if s.polish:
            out_acc = self._apply_polish(Pm, A, q, l, u, dyn, dtype, out_acc)
        return _nanfill(out_acc)


def solve_batch(Pm, q, A, l, u, settings: Optional[Settings] = None,
                mesh: Optional[Mesh] = None, x0=None, y0=None) -> SolveOutput:
    """One-shot functional batched solve (convenience wrapper)."""
    return BatchedSolver(settings=settings, mesh=mesh).solve(
        Pm, q, A, l, u, x0=x0, y0=y0)


def pad_problems(problems, dtype=float):
    """Pad a list of differently-sized QPs into one stacked batch.

    ``problems`` is a sequence of (P, q, A, l, u) tuples with varying (n, m).
    Variables are padded with a unit-diagonal quadratic block (so the padded
    coordinates decouple and solve to 0); constraints are padded with loose
    rows. Returns ``(P, q, A, l, u, sizes)`` stacked to the max dims, with
    ``sizes`` the original (n_i, m_i) for unpadding solutions:

        Pb, qb, Ab, lb, ub, sizes = pad_problems(problems)
        out = BatchedSolver(...).solve(Pb, qb, Ab, lb, ub)
        x_i = out.x[i, :sizes[i][0]]
    """
    import numpy as _np

    n_max = max(_np.asarray(p[0]).shape[0] for p in problems)
    m_max = max(_np.asarray(p[2]).shape[0] for p in problems)
    B = len(problems)
    Pb = _np.zeros((B, n_max, n_max), dtype)
    qb = _np.zeros((B, n_max), dtype)
    Ab = _np.zeros((B, m_max, n_max), dtype)
    lb = _np.full((B, m_max), -_np.inf, dtype)
    ub = _np.full((B, m_max), _np.inf, dtype)
    sizes = []
    for i, (P, q, A, l, u) in enumerate(problems):
        P = _np.asarray(P)
        A = _np.asarray(A)
        n_i, m_i = P.shape[0], A.shape[0]
        Pb[i, :n_i, :n_i] = P
        # decouple padded coordinates (unit diagonal => x_pad = 0)
        for j in range(n_i, n_max):
            Pb[i, j, j] = 1.0
        qb[i, :n_i] = _np.asarray(q)
        Ab[i, :m_i, :n_i] = A
        lb[i, :m_i] = _np.asarray(l)
        ub[i, :m_i] = _np.asarray(u)
        sizes.append((n_i, m_i))
    return Pb, qb, Ab, lb, ub, sizes
