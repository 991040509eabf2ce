"""Low-level solver API: the ``Model`` lifecycle layer.

TPU-native analogue of the reference's layer 2 (``/root/reference/src/
interface.jl``): ``setup!`` (:35-162), ``solve!`` (:164-217), ``update!``
(:235-440), ``update_settings!`` (:442-670), ``warm_start!`` (:672-732),
``dimensions`` (:740). Instead of marshaling into a C workspace, the Model
holds device-resident scaled problem data + a cached KKT factorization
(``FactorState``) and invokes cached jit-compiled executables — the TPU
analogue of the reference's zero-allocation re-solve contract
(test/MOI_wrapper.jl:341-342): repeated solves never re-trace or re-compile.
"""

from __future__ import annotations

import time
import jax
import jax.numpy as jnp
import numpy as np

from . import constants as C
from .core import (dyn_from_settings, init_factor, resolve_cg_cap,
                   scale_problem, solve_scaled)
from .linalg import chol_factor
from .polish import polish as _polish_fn
from .settings import Settings
from .sparse import csc_from_matrix, symmetric_from_triu
from .types import Info, QPData, Results

__version__ = "0.1.0"


# ---------------------------------------------------------------------------
# Cached jitted executables (shared across Model instances; jax.jit caches by
# shape/dtype so each problem size compiles exactly once per process).
# ---------------------------------------------------------------------------

@jax.jit
def _scale_jit(data: QPData, scaling_iters):
    return scale_problem(data, scaling_iters)


_factor_jit = jax.jit(init_factor, static_argnames=("indirect",))


@jax.jit
def _convexity_nan(Pbar, sigma):
    n = Pbar.shape[0]
    L = chol_factor(Pbar + sigma * jnp.eye(n, dtype=Pbar.dtype))
    return jnp.any(jnp.isnan(L))


_solve_jit = jax.jit(solve_scaled,
                     static_argnames=("linsys", "verbose", "tf32"))
_polish_jit = jax.jit(_polish_fn)


@jax.jit
def _rescale_P(P, D, c):
    return (c * D[:, None]) * P * D[None, :]


@jax.jit
def _rescale_A(A, D, E):
    return (E[:, None] * A) * D[None, :]


def version() -> str:
    """Analogue of OSQP.version (interface.jl:219-221)."""
    return f"osqp-tpu {__version__}"


#: First chunk boundary of the plain-solve chunk schedule (doubling after:
#: 250, 500, 1000, ...). Chunking buys two things the reference gets from
#: running the loop in C on the host: SIGINT -> :Interrupted between chunks
#: (constants.jl:17 — a jitted while_loop cannot observe signals), and the
#: polish-rescue checkpoints (see Model._solve_chunked). Chunk-resume state
#: threading (DynParams.rho_dir0/rho_gap0/next_rho0/rho_est0) keeps the
#: trajectory bit-identical to an unchunked solve.
_CHUNK0 = 250

_I32_MEMO: dict = {}


def _i32(v: int):
    """Memoized jnp.int32 constants — each fresh scalar put is a host->device
    transfer (~0.1-0.5 ms through the axon tunnel); the geometric chunk
    schedule reuses a handful of values."""
    a = _I32_MEMO.get(v)
    if a is None:
        a = jnp.int32(v)
        if len(_I32_MEMO) > 4096:
            _I32_MEMO.clear()
        _I32_MEMO[v] = a
    return a


class Model:
    """Solver model: setup once, solve/update repeatedly.

    Mirrors ``OSQP.Model`` (interface.jl:18-28). No finalizer needed — device
    buffers are GC-managed by JAX.
    """

    def __init__(self):
        self._is_setup = False

    # ------------------------------------------------------------------ setup
    def setup(self, P=None, q=None, A=None, l=None, u=None, **settings):
        """Problem ingestion + scaling + factorization.

        Dimension inference/validation mirrors interface.jl:45-99; triu(P)
        enforcement :101-104; ±OSQP_INFTY clipping :106-108. Raises on
        non-convex P + sigma (the C core's setup failure — test/non_convex.jl
        :13-21).
        """
        t0 = time.perf_counter()
        self.settings = Settings.from_kwargs(**settings)
        dtype = self.settings.resolve_dtype()
        self._linsys = ("indirect" if self.settings.linsys_solver
                        == C.INDIRECT_SOLVER else "direct")

        # --- dimension inference (interface.jl:45-99) ---
        if P is None:
            if q is not None:
                n = len(q)
            elif A is not None:
                n = np.asarray(A).shape[1] if not hasattr(A, "shape") else A.shape[1]
            else:
                raise ValueError("The problem does not have any variables!")
        else:
            n = P.shape[0]

        m = 0 if A is None else A.shape[0]

        if (A is None and (l is not None or u is not None)) or \
           (A is not None and (l is None and u is None)):
            raise ValueError("A must be supplied together with l and u")
        if A is not None and l is None:
            l = -np.inf * np.ones(m)
        if A is not None and u is None:
            u = np.inf * np.ones(m)

        if P is None:
            P = np.zeros((n, n))
        if q is None:
            q = np.zeros(n)
        if A is None:
            A = np.zeros((0, n))
            l = np.zeros(0)
            u = np.zeros(0)

        q = np.asarray(q, dtype=np.float64).ravel()
        l = np.asarray(l, dtype=np.float64).ravel()
        u = np.asarray(u, dtype=np.float64).ravel()
        if q.shape[0] != n:
            raise ValueError("Incorrect dimension of q")
        if l.shape[0] != m:
            raise ValueError("Incorrect dimensions of l")
        if u.shape[0] != m:
            raise ValueError("Incorrect dimensions of u")

        # --- CSC patterns for the in-place update contract ---
        self._P_pat = csc_from_matrix(P, triu=True)
        self._A_pat = csc_from_matrix(A, triu=False)
        if self._P_pat.shape != (n, n):
            raise ValueError("P must be square")
        if self._A_pat.shape[1] != n:
            raise ValueError("Incorrect dimensions of A")

        self.n, self.m = int(n), int(m)
        self._dtype = dtype
        self._q_np = q
        self._l_np = np.maximum(l, -C.OSQP_INFTY)
        self._u_np = np.minimum(u, C.OSQP_INFTY)
        if np.any(self._l_np > self._u_np):
            raise ValueError("l must be lower than or equal to u")

        self._push_data()
        self._reset_start()
        self._update_time = 0.0
        self._setup_time = time.perf_counter() - t0
        self._is_setup = True
        return self

    @staticmethod
    def _masks_changed(l_old, u_old, l_new, u_new) -> bool:
        def masks(lb, ub):
            loose = (lb <= -C.INFTY_THRESH) & (ub >= C.INFTY_THRESH)
            eq = (~loose) & (ub - lb < C.RHO_TOL)
            return loose, eq
        lo, eo = masks(l_old, u_old)
        ln, en = masks(l_new, u_new)
        return bool(np.any(lo != ln) or np.any(eo != en))

    def _dense_P(self) -> np.ndarray:
        return symmetric_from_triu(self._P_pat.to_dense())

    def _push_data(self) -> None:
        """(Re)build device-side scaled data + factorization from host state."""
        dtype = self._dtype
        data = QPData(
            P=jnp.asarray(self._dense_P(), dtype),
            q=jnp.asarray(self._q_np, dtype),
            A=jnp.asarray(self._A_pat.to_dense(), dtype),
            l=jnp.asarray(self._l_np, dtype),
            u=jnp.asarray(self._u_np, dtype),
        )
        sdata, scal = _scale_jit(data, jnp.int32(self.settings.scaling))
        sigma = jnp.asarray(self.settings.sigma, dtype)
        if bool(_convexity_nan(sdata.P, sigma)):
            raise ValueError(
                "Error in setup: P + sigma*I is not positive definite "
                "(the problem is non-convex)")
        self._sdata = sdata
        self._scal = scal
        self._fs = _factor_jit(sdata, sigma,
                               jnp.asarray(self.settings.rho, dtype),
                               indirect=self._linsys == "indirect")

    def _reset_start(self) -> None:
        dtype = self._dtype
        self._xbar = jnp.zeros((self.n,), dtype)
        self._ybar = jnp.zeros((self.m,), dtype)
        self._zbar = jnp.zeros((self.m,), dtype)

    def clean(self):
        """Release the workspace (reference ``OSQP.clean!``,
        interface.jl:223-233). The functional engine holds no foreign
        resources — the device arrays are dropped for the GC — but the
        lifecycle contract is preserved: after ``clean()`` the model is
        empty and ``solve()`` errors until the next ``setup()``."""
        for attr in ("_sdata", "_scal", "_fs", "_xbar", "_ybar", "_zbar",
                     "_q_np", "_l_np", "_u_np"):
            if hasattr(self, attr):
                delattr(self, attr)
        self._is_setup = False
        return self

    # ------------------------------------------------------------------ solve
    def solve(self) -> Results:
        """Run ADMM (+ optional polish); package Results with the reference's
        NaN/certificate conventions (interface.jl:184-214)."""
        if not self._is_setup:
            raise RuntimeError(
                "You are trying to solve an empty model. Please setup the "
                "model before calling solve().")
        t0 = time.perf_counter()
        s = self.settings
        dyn = dyn_from_settings(s, self._dtype)
        if self._linsys == "indirect":
            dyn = resolve_cg_cap(dyn, s, self.n)

        if s.warm_start:
            x0, y0, z0 = self._xbar, self._ybar, self._zbar
        else:
            x0 = jnp.zeros((self.n,), self._dtype)
            y0 = jnp.zeros((self.m,), self._dtype)
            z0 = jnp.zeros((self.m,), self._dtype)

        if s.verbose:
            self._print_header()
        rescue_pol = None
        self._rescue_time = 0.0
        if s.time_limit and s.time_limit > 0:
            out, fs, status_val = self._solve_time_limited(dyn, x0, y0, z0)
        else:
            out, fs, status_val, rescue_pol = self._solve_chunked(
                dyn, x0, y0, z0)
        self._fs = fs
        solve_time = time.perf_counter() - t0 - self._rescue_time

        status = Info.status_from_val(status_val)

        # ---- polish (host-gated on Solved, like the C core) ----
        polish_time = self._rescue_time
        status_polish = 0
        pol = None
        if rescue_pol is not None:
            # crossover rescue already produced a verified polished solution
            pol = rescue_pol
            status_polish = 1
        elif s.polish and status == "Solved":
            tp = time.perf_counter()
            pol = _polish_jit(
                self._sdata, self._scal, dyn,
                jnp.asarray(s.delta, self._dtype),
                jnp.int32(s.polish_refine_iter),
                out.ybar, out.pri_res, out.dua_res)
            jax.block_until_ready(pol.x)
            polish_time += time.perf_counter() - tp
            status_polish = 1 if bool(pol.success) else -1

        # ---- warm-start state for the next solve ----
        self._xbar, self._ybar, self._zbar = out.xbar, out.ybar, out.zbar

        # ---- package ----
        use_pol = status_polish == 1
        xs = np.asarray(pol.x if use_pol else out.x, dtype=np.float64)
        ys = np.asarray(pol.y if use_pol else out.y, dtype=np.float64)
        obj = float(pol.obj_val if use_pol else out.obj_val)
        pri_res = float(pol.pri_res if use_pol else out.pri_res)
        dua_res = float(pol.dua_res if use_pol else out.dua_res)

        info = Info(
            iter=int(out.iter),
            status=status,
            status_val=status_val,
            status_polish=status_polish,
            obj_val=obj,
            pri_res=pri_res,
            dua_res=dua_res,
            setup_time=self._setup_time,
            solve_time=solve_time,
            update_time=self._update_time,
            polish_time=polish_time,
            run_time=self._update_time + solve_time + polish_time,
            rho_updates=int(out.rho_updates),
            rho_estimate=float(out.rho_estimate),
        )
        self._update_time = 0.0

        if s.verbose:
            self._print_summary(info)

        nan_n = np.full(self.n, np.nan)
        nan_m = np.full(self.m, np.nan)
        if status in C.SOLUTION_PRESENT:
            res = Results(x=xs, y=ys, info=info,
                          prim_inf_cert=nan_m.copy(), dual_inf_cert=nan_n.copy())
        else:
            prim_cert = nan_m.copy()
            dual_cert = nan_n.copy()
            if status in ("Primal_infeasible", "Primal_infeasible_inaccurate"):
                prim_cert = np.asarray(out.prim_cert, dtype=np.float64)
            elif status in ("Dual_infeasible", "Dual_infeasible_inaccurate"):
                dual_cert = np.asarray(out.dual_cert, dtype=np.float64)
            res = Results(x=nan_n.copy(), y=nan_m.copy(), info=info,
                          prim_inf_cert=prim_cert, dual_inf_cert=dual_cert)
        if status == "Non_convex":
            res.info.obj_val = float("nan")
        return res

    def _solve_chunked(self, dyn, x0, y0, z0):
        """Plain-solve driver: runs the jitted loop in doubling chunks
        (250, 500, 1000, ... — state threading keeps the trajectory
        bit-identical to one unchunked while_loop). Two host-side behaviors
        live at the chunk boundaries:

        * **SIGINT -> Interrupted** (reference constants.jl:17): a
          KeyboardInterrupt between chunks returns the status instead of
          propagating — the C core checks the signal flag inside its loop;
          a jitted while_loop can't, so the boundary is the check point.
        * **Polish rescue (crossover finish; documented TPU-native
          extension).** ADMM's tail on problems without strong convexity
          (pure LPs above all) is sublinear: residuals ~1e-3 after 40k
          iterations while the active set has long been correct. When the
          iteration is *projected to miss* the remaining budget (linear
          extrapolation of the residual-to-threshold ratio across the last
          chunk), and the user enabled ``polish``, attempt the active-set
          polish early; accept ONLY if the polish reports success AND the
          polished solution satisfies the REQUESTED eps_abs/eps_rel
          termination criteria (verified on the host in f64 on unscaled
          data). The returned status is then Solved with status_polish=1 —
          a solution-quality-truthful status: the returned point meets the
          exact contract "Solved at requested eps" (test/basic.jl:134-172)
          that the plain iteration could not reach in budget. With
          ``polish=False`` (the reference default) behavior is exactly the
          reference's. Gated off when check_termination == 0 (reference:
          run exactly max_iter) or scaled_termination is set.

        Returns (out, fs, status_val, rescue_pol-or-None).
        """
        s = self.settings
        max_iter = int(s.max_iter)
        rescue_on = (bool(s.polish) and s.check_termination > 0
                     and not s.scaled_termination)
        total = 0
        rho_updates = 0
        fs = self._fs
        out = None
        status_val = C.UNSOLVED
        hist = None          # (iters, residual-to-threshold ratio)
        try:
            while True:
                upto = min(max_iter, max(_CHUNK0, 2 * total))
                is_final = upto >= max_iter
                dyn_c = dyn._replace(
                    start_iter=_i32(total), max_iter=_i32(upto),
                    final_approx=_i32(1 if is_final else 0))
                if out is not None:
                    dyn_c = dyn_c._replace(
                        rho_dir0=out.rho_dir, rho_gap0=out.rho_gap,
                        next_rho0=out.next_rho, rho_est0=out.rho_estimate)
                out, fs = _solve_jit(self._sdata, self._scal, dyn_c,
                                     x0, y0, z0, fs, linsys=self._linsys,
                                     verbose=bool(s.verbose),
                                     tf32=s.tf32())
                jax.block_until_ready(out.x)
                total = int(out.iter)
                rho_updates += int(out.rho_updates)
                status_val = int(out.status)
                if status_val not in (C.MAX_ITER_REACHED, C.RUNNING):
                    break
                done = total >= max_iter
                if rescue_on:
                    meas = self._host_measure(
                        np.asarray(out.x, np.float64),
                        np.asarray(out.y, np.float64),
                        np.asarray(out.z, np.float64))
                    attempt = done
                    if hist is not None and not done and np.isfinite(meas):
                        prev_it, prev_meas = hist
                        span = max(total - prev_it, 1)
                        f = prev_meas / max(meas, 1e-300)
                        if f <= 1.0:
                            attempt = True    # stalled or regressing
                        else:
                            projected = span * np.log(max(meas, 1.0)) \
                                / np.log(f)
                            attempt = projected > (max_iter - total)
                    hist = (total, meas)
                    if attempt and np.isfinite(meas) and meas > 1.0:
                        pol = self._try_rescue(dyn, out)
                        if pol is not None:
                            out = out._replace(
                                iter=jnp.int32(total),
                                rho_updates=jnp.int32(rho_updates))
                            return out, fs, C.SOLVED, pol
                if done:
                    break
                x0, y0, z0 = out.xbar, out.ybar, out.zbar
        except KeyboardInterrupt:
            # SIGINT between chunks: the reference's :Interrupted status
            # (constants.jl:17). With no chunk finished yet, re-raise.
            if out is None:
                raise
            status_val = C.INTERRUPTED
            total = int(out.iter)
        out = out._replace(iter=jnp.int32(total),
                           rho_updates=jnp.int32(rho_updates))
        return out, fs, status_val, None

    def _host_measure(self, x, y, z) -> float:
        """max(pri_res/threshold, dua_res/threshold) at the requested
        eps_abs/eps_rel, in f64 on unscaled host data. <= 1.0 means the
        point satisfies the termination criteria."""
        s = self.settings
        P = self._dense_P()
        A = self._A_pat.to_dense()
        q = self._q_np
        Px = P @ x
        dua = np.max(np.abs(Px + q + (A.T @ y if self.m else 0.0)), initial=0.0)
        dua_n = max(np.max(np.abs(Px), initial=0.0),
                    np.max(np.abs(q), initial=0.0))
        if self.m:
            Ax = A @ x
            Aty = A.T @ y
            pri = np.max(np.abs(Ax - z), initial=0.0)
            pri_n = max(np.max(np.abs(Ax), initial=0.0),
                        np.max(np.abs(z), initial=0.0))
            dua_n = max(dua_n, np.max(np.abs(Aty), initial=0.0))
        else:
            pri, pri_n = 0.0, 0.0
        tp = s.eps_abs + s.eps_rel * pri_n
        td = s.eps_abs + s.eps_rel * dua_n
        return max(pri / max(tp, 1e-300), dua / max(td, 1e-300))

    def _try_rescue(self, dyn, out):
        """Attempt the crossover polish at a chunk boundary; returns the
        PolishOutput iff polish succeeds AND the polished point meets the
        requested termination criteria (host-verified in f64)."""
        s = self.settings
        tp = time.perf_counter()
        pol = _polish_jit(
            self._sdata, self._scal, dyn,
            jnp.asarray(s.delta, self._dtype),
            jnp.int32(s.polish_refine_iter),
            out.ybar, out.pri_res, out.dua_res)
        jax.block_until_ready(pol.x)
        accepted = False
        if bool(pol.success):
            meas = self._host_measure(
                np.asarray(pol.x, np.float64),
                np.asarray(pol.y, np.float64),
                np.asarray(pol.z, np.float64))
            accepted = bool(np.isfinite(meas) and meas <= 1.0)
        self._rescue_time += time.perf_counter() - tp
        return pol if accepted else None

    def _solve_time_limited(self, dyn, x0, y0, z0):
        """Chunked host driver for time_limit (C core checks the clock inside
        its iteration loop — test/basic.jl:210-240; here the host checks
        between jitted chunks). Returns (out, fs, status_val)."""
        s = self.settings
        chunk = s.check_termination if s.check_termination > 0 else 25
        chunk = max(10, min(int(chunk), 1000))
        start = time.perf_counter()
        total = 0
        rho_updates = 0
        fs = self._fs
        out = None
        try:
            while True:
                this_chunk = min(chunk, s.max_iter - total)
                is_final = total + this_chunk >= s.max_iter
                # the iteration counter is GLOBAL across chunks so the
                # check_termination / adaptive_rho_interval cadence matches
                # an unchunked solve
                dyn_c = dyn._replace(
                    start_iter=jnp.int32(total),
                    max_iter=jnp.int32(total + this_chunk),
                    final_approx=jnp.int32(1 if is_final else 0))
                if out is not None:
                    # resume the rho-adaptation state so the chunked
                    # trajectory matches an unchunked solve (round-4 advisor)
                    dyn_c = dyn_c._replace(
                        rho_dir0=out.rho_dir, rho_gap0=out.rho_gap,
                        next_rho0=out.next_rho, rho_est0=out.rho_estimate)
                out, fs = _solve_jit(self._sdata, self._scal, dyn_c, x0, y0,
                                     z0, fs, linsys=self._linsys,
                                     verbose=bool(s.verbose),
                                     tf32=s.tf32())
                jax.block_until_ready(out.x)
                total = int(out.iter)
                rho_updates += int(out.rho_updates)
                status_val = int(out.status)
                timed_out = (time.perf_counter() - start) > s.time_limit
                if status_val not in (C.MAX_ITER_REACHED, C.RUNNING):
                    break
                if total >= s.max_iter:
                    break
                if timed_out:
                    status_val = C.TIME_LIMIT_REACHED
                    break
                x0, y0, z0 = out.xbar, out.ybar, out.zbar
        except KeyboardInterrupt:
            # SIGINT between chunks: the reference's :Interrupted status
            # (constants.jl:17). With no chunk finished yet, report Unsolved.
            if out is None:
                raise
            status_val = C.INTERRUPTED
        out = out._replace(iter=jnp.int32(total),
                           rho_updates=jnp.int32(rho_updates))
        return out, fs, status_val

    # ----------------------------------------------------------------- update
    def update(self, q=None, l=None, u=None, Px=None, Px_idx=None,
               Ax=None, Ax_idx=None):
        """In-place data update (interface.jl:235-440): value-only P/A updates
        against the immutable setup sparsity pattern; bounds clipped to
        ±OSQP_INFTY; scaling matrices from setup are reused (no
        re-equilibration, matching the C core); P/A updates refactorize."""
        self._check_setup()
        t0 = time.perf_counter()
        dtype = self._dtype
        refactor = False
        rho_refresh = False

        if q is not None:
            q = np.asarray(q, dtype=np.float64).ravel()
            if q.shape[0] != self.n:
                raise ValueError(f"q must have length n = {self.n}")
            self._q_np = q
        if l is not None:
            l = np.asarray(l, dtype=np.float64).ravel()
            if l.shape[0] != self.m:
                raise ValueError(f"l must have length m = {self.m}")
        if u is not None:
            u = np.asarray(u, dtype=np.float64).ravel()
            if u.shape[0] != self.m:
                raise ValueError(f"u must have length m = {self.m}")
        new_l = np.maximum(l, -C.OSQP_INFTY) if l is not None else self._l_np
        new_u = np.minimum(u, C.OSQP_INFTY) if u is not None else self._u_np
        if (l is not None) or (u is not None):
            if np.any(new_l > new_u):
                raise ValueError("l must be lower than or equal to u")
            # refactorize only if a row's loose/ineq/eq classification flips
            # (C core update_rho_vec semantics; classification is on SCALED
            # bounds)
            E = np.asarray(self._scal.E, dtype=np.float64)
            rho_refresh = self._masks_changed(E * self._l_np, E * self._u_np,
                                              E * new_l, E * new_u)
            self._l_np = new_l
            self._u_np = new_u

        if Px is not None:
            self._P_pat.update_values(Px, Px_idx, name="P")
            refactor = True
        elif Px_idx is not None:
            raise ValueError("Px must be supplied together with Px_idx")
        if Ax is not None:
            self._A_pat.update_values(Ax, Ax_idx, name="A")
            refactor = True
        elif Ax_idx is not None:
            raise ValueError("Ax must be supplied together with Ax_idx")

        # Re-scale changed pieces with the *setup* scaling (C semantics).
        scal = self._scal
        sdata = self._sdata
        if q is not None:
            sdata = sdata._replace(
                q=scal.c * scal.D * jnp.asarray(self._q_np, dtype))
        if (l is not None) or (u is not None):
            sdata = sdata._replace(
                l=scal.E * jnp.asarray(self._l_np, dtype),
                u=scal.E * jnp.asarray(self._u_np, dtype))
        if Px is not None:
            sdata = sdata._replace(
                P=_rescale_P(jnp.asarray(self._dense_P(), dtype),
                             scal.D, scal.c))
        if Ax is not None:
            sdata = sdata._replace(
                A=_rescale_A(jnp.asarray(self._A_pat.to_dense(), dtype),
                             scal.D, scal.E))
        self._sdata = sdata

        if refactor or rho_refresh:
            # P/A change → refactorization reusing the pattern (C core
            # osqp_update_P/A); bounds change → rho_vec refresh (constraint
            # types may flip loose/ineq/eq) + refactor.
            sigma = jnp.asarray(self.settings.sigma, dtype)
            if refactor and bool(_convexity_nan(sdata.P, sigma)):
                raise ValueError(
                    "Error in update: P + sigma*I is not positive definite")
            self._fs = _factor_jit(sdata, sigma, self._fs.rho_bar,
                                   indirect=self._linsys == "indirect")
        self._update_time += time.perf_counter() - t0

    def update_settings(self, **kwargs):
        """Post-setup settings update (interface.jl:442-670): validates
        against UPDATABLE_SETTINGS; a rho change rebuilds rho_vec and
        refactorizes (osqp_update_rho)."""
        self._check_setup()
        if not kwargs:
            return
        old_rho = self.settings.rho
        self.settings.update_inplace(**kwargs)
        if "rho" in kwargs and self.settings.rho != old_rho:
            sigma = jnp.asarray(self.settings.sigma, self._dtype)
            self._fs = _factor_jit(self._sdata, sigma,
                                   jnp.asarray(self.settings.rho, self._dtype),
                                   indirect=self._linsys == "indirect")

    # ------------------------------------------------------------- warm start
    def warm_start(self, x=None, y=None):
        """Warm-start semantics of osqp_warm_start{,_x,_y}
        (interface.jl:672-732): providing only x zeroes the stored y and vice
        versa (modcaches.jl:195-196 note). Iterates are stored scaled."""
        self._check_setup()
        dtype = self._dtype
        scal = self._scal
        if x is None and y is None:
            raise ValueError("Unrecognized warm-start input: pass x and/or y")
        if x is not None:
            x = np.asarray(x, dtype=np.float64).ravel()
            if x.shape[0] != self.n:
                raise ValueError(f"Wrong dimension for variable x ({self.n})")
            if not np.isfinite(x).all():
                # a NaN-filled result (infeasible/non-convex solve) fed back
                # as a warm start would poison every subsequent solve; the
                # reference never hits this because its warm start comes
                # from the internal C workspace, not the NaN-filled
                # results — treat non-finite starts as cold
                x = np.zeros_like(x)
            self._xbar = scal.Dinv * jnp.asarray(x, dtype)
        else:
            self._xbar = jnp.zeros((self.n,), dtype)
        if y is not None:
            y = np.asarray(y, dtype=np.float64).ravel()
            if y.shape[0] != self.m:
                raise ValueError(f"Wrong dimension for variable y ({self.m})")
            if not np.isfinite(y).all():
                y = np.zeros_like(y)
            self._ybar = scal.c * scal.Einv * jnp.asarray(y, dtype)
        else:
            self._ybar = jnp.zeros((self.m,), dtype)
        self._zbar = self._sdata.A @ self._xbar

    def _print_header(self) -> None:
        """Pre-solve verbose header + iteration-log column names (the
        reference C core prints this block before iterating; column format
        matches native/solver.cpp)."""
        s = self.settings
        print(f"osqp-tpu {__version__}: n = {self.n}, m = {self.m}, "
              f"linsys = {self._linsys}, dtype = {np.dtype(self._dtype).name}")
        print(f"rho = {s.rho:.2e}, sigma = {s.sigma:.2e}, "
              f"alpha = {s.alpha:.2f}, eps_abs = {s.eps_abs:.1e}, "
              f"eps_rel = {s.eps_rel:.1e}, max_iter = {s.max_iter}")
        print(f"{'iter':>6s}  {'objective':>12s}  {'pri_res':>9s}  "
              f"{'dua_res':>9s}  {'rho':>9s}")

    def _print_summary(self, info: Info) -> None:
        """Verbose solve summary (the reference's C-side iteration log —
        types.jl:129 verbose setting — reported as a host-side block here;
        under jit there is no per-iteration host hook without callbacks)."""
        s = self.settings
        print(f"osqp-tpu {__version__}: "
              f"n = {self.n}, m = {self.m}, "
              f"linsys = {self._linsys}, dtype = {np.dtype(self._dtype).name}")
        print(f"  eps_abs = {s.eps_abs:.1e}, eps_rel = {s.eps_rel:.1e}, "
              f"rho = {s.rho:.2e} (adaptive: {s.adaptive_rho})")
        print(f"  status: {info.status}   iters: {info.iter}   "
              f"rho_updates: {info.rho_updates}")
        print(f"  obj: {info.obj_val:.6e}   pri_res: {info.pri_res:.2e}   "
              f"dua_res: {info.dua_res:.2e}")
        print(f"  setup: {info.setup_time*1e3:.1f} ms   "
              f"solve: {info.solve_time*1e3:.1f} ms   "
              f"polish: {info.polish_time*1e3:.1f} ms "
              f"(status_polish: {info.status_polish})")

    # ------------------------------------------------------- checkpoint/resume
    def get_state(self) -> dict:
        """Snapshot the solver state (SURVEY.md §5 checkpoint/resume: the
        whole workspace is a pytree, so serialization is trivial — unlike the
        reference, whose only resume mechanism is warm starting)."""
        self._check_setup()
        return {
            "xbar": np.asarray(self._xbar),
            "ybar": np.asarray(self._ybar),
            "zbar": np.asarray(self._zbar),
            "rho_bar": float(self._fs.rho_bar),
            "settings": self.settings.asdict(),
        }

    def set_state(self, state: dict) -> None:
        """Restore a snapshot taken by :meth:`get_state` (problem data must
        already be set up identically)."""
        self._check_setup()
        dtype = self._dtype
        self._xbar = jnp.asarray(state["xbar"], dtype)
        self._ybar = jnp.asarray(state["ybar"], dtype)
        self._zbar = jnp.asarray(state["zbar"], dtype)
        rho = float(state["rho_bar"])
        if abs(rho - float(self._fs.rho_bar)) > 0:
            sigma = jnp.asarray(self.settings.sigma, dtype)
            self._fs = _factor_jit(self._sdata, sigma,
                                   jnp.asarray(rho, dtype),
                                   indirect=self._linsys == "indirect")

    def save_state(self, path: str) -> None:
        """Write the solver state snapshot to ``path`` (.npz)."""
        self._check_setup()
        st = self.get_state()
        np.savez(path, xbar=st["xbar"], ybar=st["ybar"], zbar=st["zbar"],
                 rho_bar=st["rho_bar"])

    def load_state(self, path: str) -> None:
        """Restore a snapshot written by :meth:`save_state`."""
        self._check_setup()
        data = np.load(path)
        self.set_state({"xbar": data["xbar"], "ybar": data["ybar"],
                        "zbar": data["zbar"],
                        "rho_bar": float(data["rho_bar"])})

    # ------------------------------------------------------------------ misc
    def dimensions(self):
        """(n, m), mirroring OSQP.dimensions (interface.jl:740-747)."""
        self._check_setup()
        return self.n, self.m

    def _check_setup(self):
        if not self._is_setup:
            raise RuntimeError(
                "Model is empty: call setup() before this operation")
