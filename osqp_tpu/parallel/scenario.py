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

from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..batch import BatchedSolver
from ..settings import Settings


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

    def solve(self, P, q, A, l, u) -> ScenarioResult:
        k, gamma = self.k, self.gamma
        dtype = self.settings.resolve_dtype()
        P = np.asarray(P, float)
        q = np.asarray(q, float)
        S, n = q.shape

        # gamma-augmented shared quadratic (fixed across outer iterations ->
        # the batched solver's factorization is reused via identical P)
        P_aug = P.copy()
        P_aug[:k, :k] += gamma * np.eye(k)

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
