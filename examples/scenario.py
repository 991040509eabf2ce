#!/usr/bin/env python
"""Two-stage stochastic program via consensus ADMM (`ScenarioQP`).

A newsvendor-style planning problem: choose a shared first-stage order
quantity w (k=2 products) before demand is known; after one of S demand
scenarios realizes, recourse variables v_s (sales/salvage split) absorb the
difference. All S scenario sub-QPs share one structure, so every outer
consensus iteration solves the whole batch as ONE fused XLA program
(see osqp_tpu/parallel/scenario.py).

Run:  python examples/scenario.py   (CPU ok; real speed on a TPU chip)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_scenarios(S=32, k=2, seed=0):
    """Per-scenario QP over z_s = [w (k); v_s (k)]:

        min  0.5 c_w ||w||^2 - p^T v_s + 0.5 c_v ||v_s||^2
        s.t. 0 <= w <= w_max,  0 <= v_s <= d_s  (demand cap),  v_s <= w
    """
    rng = np.random.RandomState(seed)
    n = 2 * k
    price = np.array([3.0, 2.0])
    P = np.zeros((n, n))
    P[:k, :k] = 0.2 * np.eye(k)      # order/holding cost
    P[k:, k:] = 0.5 * np.eye(k)      # concave-revenue regularization
    q = np.zeros((S, n))
    q[:, k:] = -price                 # maximize p^T v_s

    # rows: w box (k), v box (k), coupling v_s - w <= 0 (k)
    m = 3 * k
    A = np.zeros((m, n))
    A[:k, :k] = np.eye(k)
    A[k:2 * k, k:] = np.eye(k)
    A[2 * k:, k:] = np.eye(k)
    A[2 * k:, :k] = -np.eye(k)
    l = np.zeros((S, m))
    u = np.zeros((S, m))
    u[:, :k] = 10.0                               # w_max
    demand = rng.uniform(0.5, 8.0, size=(S, k))   # d_s
    u[:, k:2 * k] = demand
    l[:, 2 * k:] = -np.inf
    u[:, 2 * k:] = 0.0                            # v_s <= w
    return P, q, A, l, u, demand


def main():
    from osqp_tpu.parallel.scenario import ScenarioQP
    from osqp_tpu.settings import Settings

    S, k = 32, 2
    P, q, A, l, u, demand = build_scenarios(S=S, k=k)

    solver = ScenarioQP(
        k=k, gamma=1.0, eps_consensus=1e-4, max_outer=200,
        settings=Settings(verbose=False, eps_abs=1e-6, eps_rel=1e-6))
    res = solver.solve(P, q, A, l, u)

    print(f"scenarios         : {S}")
    print(f"converged         : {res.converged} "
          f"({res.outer_iters} outer iterations)")
    print(f"consensus residual: pri={res.consensus_pri:.2e} "
          f"dua={res.consensus_dua:.2e}")
    print(f"order quantity w  : {np.round(res.w, 4)}")
    print(f"mean demand       : {np.round(demand.mean(axis=0), 4)}")

    # sanity: the consensus solution must match the monolithic coupled QP
    # (all scenarios stacked into one big block QP with a single shared w)
    import scipy.sparse as sp
    from osqp_tpu.interface import Model
    n = 2 * k
    N = k + S * k                     # [w; v_1..v_S]
    Pb = np.zeros((N, N))
    Pb[:k, :k] = P[:k, :k] * S
    qb = np.zeros(N)
    rows = []
    lb, ub = [], []
    for s in range(S):
        Pb[k + s * k:k + (s + 1) * k, k + s * k:k + (s + 1) * k] = P[k:, k:]
        qb[k + s * k:k + (s + 1) * k] = q[s, k:]
        # w box appears only once (below); v box and coupling per scenario
        row_v = np.zeros((k, N)); row_v[:, k + s * k:k + (s + 1) * k] = np.eye(k)
        rows.append(row_v); lb.append(l[s, k:2 * k]); ub.append(u[s, k:2 * k])
        row_c = np.zeros((k, N)); row_c[:, k + s * k:k + (s + 1) * k] = np.eye(k)
        row_c[:, :k] = -np.eye(k)
        rows.append(row_c); lb.append(l[s, 2 * k:]); ub.append(u[s, 2 * k:])
    row_w = np.zeros((k, N)); row_w[:, :k] = np.eye(k)
    rows.append(row_w); lb.append(l[0, :k]); ub.append(u[0, :k])
    Ab = np.vstack(rows); lb = np.hstack(lb); ub = np.hstack(ub)

    mono = Model()
    mono.setup(P=sp.csc_matrix(Pb), q=qb, A=sp.csc_matrix(Ab), l=lb, u=ub,
               eps_abs=1e-6, eps_rel=1e-6, polish=True, verbose=False)
    ref = mono.solve()
    print(f"monolithic w      : {np.round(ref.x[:k], 4)}  "
          f"(status {ref.info.status})")
    err = np.max(np.abs(res.w - ref.x[:k]))
    print(f"|w_consensus - w_monolithic|_inf = {err:.2e}")
    assert err < 5e-3


if __name__ == "__main__":
    main()
