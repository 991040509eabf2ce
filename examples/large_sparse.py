#!/usr/bin/env python
"""Large sparse QP (n ~ 1e5) through the matrix-free CG path.

Run:  python examples/large_sparse.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import scipy.sparse as sp


def main():
    from osqp_tpu.sparse_core import SparseModel

    rng = np.random.RandomState(0)
    n, m = 100_000, 150_000
    nnz = 450_000
    # generate COO directly (scipy.sparse.random is pathologically slow at
    # this size)
    rows = rng.randint(0, m, nnz)
    cols = rng.randint(0, n, nnz)
    vals = rng.randn(nnz)
    A = (sp.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsc()
         + sp.eye(m, n)).tocsc()
    P = sp.diags(0.5 + rng.rand(n)).tocsc()
    q = rng.randn(n)
    l = -1 - rng.rand(m)
    u = 1 + rng.rand(m)

    model = SparseModel().setup(P=P, q=q, A=A, l=l, u=u, verbose=False,
                                eps_abs=1e-3, eps_rel=1e-3,
                                dtype=np.float32)
    t0 = time.perf_counter()
    r = model.solve()
    print(f"first solve: {time.perf_counter()-t0:.1f}s "
          f"status={r.info.status} iters={r.info.iter}")
    model.update(q=0.8 * q)
    t0 = time.perf_counter()
    r2 = model.solve()
    print(f"warm re-solve: {time.perf_counter()-t0:.2f}s "
          f"iters={r2.info.iter}")
    Ax = A @ r2.x
    print("feasibility violation:",
          float(max(np.max(Ax - u, initial=0), np.max(l - Ax, initial=0))))


if __name__ == "__main__":
    main()
