#!/usr/bin/env python
"""Long-horizon MPC with the block-tridiagonal structured engine.

The shared-structure batched engine (examples/mpc.py) densifies the reduced
KKT — fine up to n ≈ 500 variables. A long-horizon problem (n = T·(nx+nu) in
the tens of thousands) needs the structured path: BlockTridiagSolver
factorizes the block-tridiagonal reduced KKT by block cyclic reduction
(O(log T) sequential depth — every level is a round of batched small GEMMs),
and carries the factor + adapted rho across re-solves, so the receding-
horizon cycle pays only for its iterations.

Run:  python examples/structured_mpc.py  (CPU ok; real speed on a TPU chip)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp


def main():
    from osqp_tpu.problems import control_qp
    from osqp_tpu.structured import BlockTridiagSolver

    # a long-horizon controller: T stages of (nx states + nu inputs)
    nx, nu, T = 12, 4, 120           # n = 1920; scale T up on real hardware
    b = nx + nu
    P, q, A, l, u = control_qp(nx=nx, nu=nu, T=T, seed=0)
    n, m = P.shape[0], A.shape[0]
    print(f"horizon T={T}: n={n} variables, m={m} constraints")

    solver = BlockTridiagSolver().setup(
        P=sp.csc_matrix(P), A=sp.csc_matrix(A), block=b,
        eps_abs=1e-3, eps_rel=1e-3, max_iter=4000,
        dtype=np.float32, verbose=False)

    # cold solve (includes jit compile on the first call)
    t0 = time.perf_counter()
    out = solver.solve(q, l, u)
    x = np.asarray(out["x"])[0]
    print(f"cold solve: status={int(out['status'][0])} "
          f"iters={int(out['iter'][0])}  ({time.perf_counter()-t0:.2f}s "
          "incl. compile)")

    # receding-horizon cycle: perturb the tracking cost, warm start from the
    # previous solution; the factor cache skips re-factorization entirely
    # (step 0 pays one extra jit trace for the warm-start call signature)
    rng = np.random.RandomState(1)
    y = np.asarray(out["y"])[0]
    for step in range(5):
        q = q + 0.002 * rng.randn(n)
        t0 = time.perf_counter()
        out = solver.solve(q, l, u, x0=x, y0=y)
        x = np.asarray(out["x"])[0]
        y = np.asarray(out["y"])[0]
        print(f"step {step}: iters={int(out['iter'][0]):4d}  "
              f"obj={float(out['obj_val'][0]):10.3f}  "
              f"({time.perf_counter()-t0:.3f}s)")


if __name__ == "__main__":
    main()
