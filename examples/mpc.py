#!/usr/bin/env python
"""Receding-horizon MPC with the shared-structure batched engine.

A fleet of B independent plants runs the same controller structure (same
dynamics/horizon → same P and A); each control step solves all B QPs in one
XLA program, warm-started from the previous step's solutions.

Run:  python examples/mpc.py  (CPU ok; real speed on a TPU chip)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    from osqp_tpu.batch import BatchedSolver
    from osqp_tpu.problems import control_qp
    from osqp_tpu.settings import Settings

    # one controller structure
    nx, nu, T = 6, 3, 12
    P, q0, A, l0, u0 = control_qp(nx=nx, nu=nu, T=T, seed=0)
    n = P.shape[0]
    m = A.shape[0]

    # a fleet of plants: same structure, different current states -> the
    # dynamics right-hand side (first nx rows of l/u) differs per plant
    B = 64
    rng = np.random.RandomState(1)
    l = np.tile(l0, (B, 1))
    u = np.tile(u0, (B, 1))
    q = np.tile(q0, (B, 1))

    solver = BatchedSolver(
        settings=Settings(eps_abs=1e-4, eps_rel=1e-4, verbose=False),
        kkt_mode="shared")

    x_prev = y_prev = None
    for step in range(5):
        # new initial state per plant -> shift the dynamics equality rhs
        x0_batch = 0.5 * rng.randn(B, nx)
        Ad = np.eye(nx) + 0.1 * np.random.RandomState(0).randn(nx, nx) / np.sqrt(nx)
        rhs = -(x0_batch @ Ad.T)
        l[:, :nx] = rhs
        u[:, :nx] = rhs

        out = solver.solve(P, q, A, l, u, x0=x_prev, y0=y_prev)
        x_prev = np.asarray(out.x)
        y_prev = np.asarray(out.y)
        st = np.asarray(out.status)
        it = np.asarray(out.iter)
        # the applied control: first nu entries of each plan
        u_apply = x_prev[:, :nu]
        print(f"step {step}: solved {np.mean(st == 1):.0%}, "
              f"iters mean {it.mean():.0f}, |u| mean "
              f"{np.abs(u_apply).mean():.3f}")

    # --- the same loop as ONE compiled program (solve_rollout): when the
    # state-feedback law is jax-traceable, the entire closed loop runs on
    # device — no host round-trip between control steps ---
    import jax.numpy as jnp

    # stable closed-loop plant for the demo (spectral radius < 1)
    Adj = jnp.asarray(0.9 * (np.eye(nx)
                             + 0.1 * np.random.RandomState(0).randn(nx, nx)
                             / np.sqrt(nx)))

    def feedback(x_opt, qlu, k):
        qk, lk, uk = qlu
        # next initial state = first predicted state block of each plan
        x_next = x_opt[:, :nx]
        rhs = -(x_next @ Adj.T)
        lk = lk.at[:, :nx].set(rhs)
        uk = uk.at[:, :nx].set(rhs)
        return qk, lk, uk

    ws = BatchedSolver(
        settings=Settings(eps_abs=1e-4, eps_rel=1e-4, verbose=False),
        kkt_mode="shared").prepare(P, A, q=q)
    roll = ws.solve_rollout(q, l, u, feedback, n_steps=10)
    st = np.asarray(roll["status"])
    print(f"on-device rollout: 10 steps x {B} plants, "
          f"solved {np.mean(st == 1):.0%}, "
          f"iters/step {np.asarray(roll['iter']).mean(axis=1).round(0)}")


if __name__ == "__main__":
    main()
