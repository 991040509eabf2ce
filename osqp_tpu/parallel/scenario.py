"""Consensus ADMM for two-stage scenario QPs (BASELINE config #5).

Problem: S scenarios, each a QP over z_s = [w_s; v_s] where the first k
entries w_s are copies of a SHARED first-stage decision and v_s are local
recourse variables:

    minimize    Σ_s ( 0.5 z_sᵀ P_s z_s + q_sᵀ z_s )
    subject to  l_s ≤ A_s z_s ≤ u_s,   w_1 = w_2 = ... = w_S  (consensus)

Consensus-ADMM splitting (Boyd et al. §7.2): at every outer iteration each
scenario solves its own QP with an augmented objective

    P̃_s = P_s + γ·diag(1_k, 0),   q̃_s = q_s + γ·[λ_s − γ w̄ ; 0]-ish

i.e. a proximity term (γ/2)‖w_s − w̄ + λ_s/γ‖² toward the current consensus
w̄, then w̄ ← mean_s(w_s) and the duals update λ_s ← λ_s + γ(w_s − w̄).

The scenario sub-solves are IDENTICAL-STRUCTURE QPs — exactly what
:class:`osqp_tpu.batch.BatchedSolver` is built for: all S sub-QPs solve as
one fused batched program per outer iteration, warm-started from the
previous outer iteration, with only q changing (no refactorization: the
γ-augmented P is fixed). The consensus mean is one cross-scenario reduction —
a psum over the mesh when scenarios are sharded across chips.

The solver reports the consensus residuals r = max_s‖w_s − w̄‖∞ (primal) and
γ‖w̄ − w̄_prev‖∞ (dual) and stops when both are under tolerance.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..batch import BatchedSolver
from ..settings import Settings


@functools.partial(jax.jit, static_argnames=(
    "k", "max_outer", "group", "interpret", "adaptive", "tf32"))
def _fused_consensus(Pd, Ad, qd, ld, ud, dyn, scaling, gamma, eps,
                     k: int, max_outer: int, group: int,
                     interpret: bool, adaptive: bool, tf32: bool = False):
    """The whole consensus loop as one jitted while_loop (cached per shape
    and static config — repeated solves never retrace)."""
    from ..shared_core import solve_shared

    dtype = qd.dtype
    S, n = qd.shape
    m = ld.shape[1]

    def outer(carry):
        it, w_bar, lam, x, y, pri, dua, statuses = carry
        q_aug = qd.at[:, :k].add(lam - gamma * w_bar[None, :])
        out = solve_shared(Pd, Ad, q_aug, ld, ud, dyn, scaling, x, y,
                           group=group, interpret=interpret,
                           adaptive=adaptive, tf32=tf32)
        ws = out.x[:, :k]
        w_new = jnp.mean(ws, axis=0)
        pri2 = jnp.max(jnp.abs(ws - w_new[None, :]))
        dua2 = gamma * jnp.max(jnp.abs(w_new - w_bar))
        lam2 = lam + gamma * (ws - w_new[None, :])
        return (it + 1, w_new, lam2, out.x, out.y, pri2, dua2, out.status)

    def cond(carry):
        it, _, _, _, _, pri, dua, _ = carry
        return (it < max_outer) & jnp.logical_not(
            (pri < eps) & (dua < eps) & (it > 1))

    init = (jnp.int32(0), jnp.zeros((k,), dtype),
            jnp.zeros((S, k), dtype), jnp.zeros((S, n), dtype),
            jnp.zeros((S, m), dtype),
            jnp.asarray(jnp.inf, dtype), jnp.asarray(jnp.inf, dtype),
            jnp.zeros((S,), jnp.int32))
    return jax.lax.while_loop(cond, outer, init)


class ScenarioResult(NamedTuple):
    w: np.ndarray            # (k,) consensus first-stage decision
    z: np.ndarray            # (S, n) per-scenario solutions
    outer_iters: int
    consensus_pri: float     # max_s ||w_s - w_bar||_inf
    consensus_dua: float     # gamma * ||w_bar - w_bar_prev||_inf
    statuses: np.ndarray     # (S,) final sub-solve status codes
    converged: bool


class ScenarioQP:
    """Two-stage scenario QP via consensus ADMM over batched sub-solves.

    ``P (n,n)`` and ``A (m,n)`` are shared across scenarios (the common
    structure); ``q (S,n)``, ``l/u (S,m)`` vary per scenario; the first ``k``
    variables are the consensus (first-stage) block.
    """

    def __init__(self, k: int, gamma: float = 1.0,
                 eps_consensus: float = 1e-4, max_outer: int = 100,
                 settings: Optional[Settings] = None, mesh=None):
        self.k = int(k)
        self.gamma = float(gamma)
        self.eps = float(eps_consensus)
        self.max_outer = int(max_outer)
        self.settings = settings or Settings(
            verbose=False, eps_abs=1e-5, eps_rel=1e-5)
        self.mesh = mesh

    def solve(self, P, q, A, l, u, fused: bool = True) -> ScenarioResult:
        """``fused=True`` (default) runs the ENTIRE outer consensus loop on
        device as one jitted while_loop (one dispatch per solve);
        ``fused=False`` drives the outer loop from the host (useful for
        debugging / inspecting per-iteration state)."""
        if fused:
            return self._solve_fused(P, q, A, l, u)
        return self._solve_host(P, q, A, l, u)

    def _prepare(self, P, q):
        k, gamma = self.k, self.gamma
        P = np.asarray(P, float)
        q = np.asarray(q, float)
        # gamma-augmented shared quadratic (fixed across outer iterations ->
        # the batched solver's factorization is reused via identical P)
        P_aug = P.copy()
        P_aug[:k, :k] += gamma * np.eye(k)
        return P_aug, q

    def _solve_host(self, P, q, A, l, u) -> ScenarioResult:
        k, gamma = self.k, self.gamma
        P_aug, q = self._prepare(P, q)
        S, n = q.shape

        solver = BatchedSolver(settings=self.settings, mesh=self.mesh,
                               kkt_mode="shared")

        w_bar = np.zeros(k)
        lam = np.zeros((S, k))
        zs = None
        ys = None
        outer = 0
        pri = dua = np.inf
        statuses = np.full(S, 0)
        for outer in range(1, self.max_outer + 1):
            # per-scenario linear term: q_s + [lam_s - gamma*w_bar; 0]
            q_aug = q.copy()
            q_aug[:, :k] += lam - gamma * w_bar[None, :]
            out = solver.solve(P_aug, q_aug, A, l, u, x0=zs, y0=ys)
            zs = np.asarray(out.x, float)
            ys = np.asarray(out.y, float)
            statuses = np.asarray(out.status)

            ws = zs[:, :k]
            w_new = ws.mean(axis=0)
            pri = float(np.max(np.abs(ws - w_new[None, :]), initial=0.0))
            dua = float(gamma * np.max(np.abs(w_new - w_bar), initial=0.0))
            lam = lam + gamma * (ws - w_new[None, :])
            w_bar = w_new
            if pri < self.eps and dua < self.eps and outer > 1:
                break

        return ScenarioResult(
            w=w_bar, z=zs, outer_iters=outer,
            consensus_pri=pri, consensus_dua=dua,
            statuses=statuses,
            converged=bool(pri < self.eps and dua < self.eps))

    def _solve_fused(self, P, q, A, l, u) -> ScenarioResult:
        from ..core import dyn_from_settings

        k = self.k
        dtype = self.settings.resolve_dtype()
        P_aug, qn = self._prepare(P, q)
        S, n = qn.shape
        s = self.settings
        dyn = dyn_from_settings(s, dtype)
        interpret = jax.default_backend() not in ("tpu", "axon")
        group = 128
        while S % group != 0:
            group //= 2

        it, w_bar, lam, x, y, pri, dua, statuses = _fused_consensus(
            jnp.asarray(P_aug, dtype), jnp.asarray(np.asarray(A, float), dtype),
            jnp.asarray(qn, dtype),
            jnp.asarray(np.asarray(l, float), dtype),
            jnp.asarray(np.asarray(u, float), dtype),
            dyn, jnp.int32(s.scaling),
            jnp.asarray(self.gamma, dtype), jnp.asarray(self.eps, dtype),
            k=k, max_outer=self.max_outer, group=group,
            interpret=interpret, adaptive=bool(s.adaptive_rho),
            tf32=s.tf32())
        return ScenarioResult(
            w=np.asarray(w_bar, float), z=np.asarray(x, float),
            outer_iters=int(it),
            consensus_pri=float(pri), consensus_dua=float(dua),
            statuses=np.asarray(statuses),
            converged=bool((float(pri) < self.eps)
                           and (float(dua) < self.eps)))
