"""AOT serving artifact: compile once, deploy anywhere.

The TPU-native analogue of OSQP's embedded code generation (upstream
``osqp_codegen``): the prepared batched solver — problem structure, Ruiz
scaling, settings, and kernel tiling — is captured by ``jax.export`` into a
serialized StableHLO artifact. A serving process deserializes and drives it
with only jax installed: no osqp_tpu import, no Python tracing, one compile
at load.

Run:  python examples/serving_artifact.py
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def main():
    from osqp_tpu.batch import BatchedSolver
    from osqp_tpu.serve import export_prepared, load
    from osqp_tpu.settings import Settings

    # -- the "build" side: fit the solver to one problem structure ---------
    B, n, m = 512, 32, 64
    rng = np.random.RandomState(0)
    M = rng.randn(n, n)
    P = M @ M.T / n + 0.1 * np.eye(n)
    A = rng.randn(m, n) / np.sqrt(n)
    q = rng.randn(B, n)
    c = rng.randn(B, m) * 0.1
    w = 0.5 + rng.rand(B, m)
    l, u = c - w, c + w

    settings = Settings(eps_abs=1e-3, eps_rel=1e-3, verbose=False)
    solver = BatchedSolver(settings=settings, kkt_mode="shared")
    solver.prepare(P, A, q=q)

    path = os.path.join(tempfile.gettempdir(), "qp_serving_artifact.npz")
    blob = export_prepared(solver, B=B, path=path)
    print(f"exported artifact: {len(blob)/1e3:.1f} kB -> {path}")

    # -- the "serve" side: a fresh consumer (no live solver state) ---------
    jax.clear_caches()
    server = load(path)
    t0 = time.perf_counter()
    res = server.solve(q, l, u)
    print(f"first request (includes the one compile): "
          f"{time.perf_counter()-t0:.2f}s")
    sv = np.asarray(res.info.status_val)
    print(f"solved {int((sv == 1).sum())}/{server.B} lanes, "
          f"iters max {int(np.asarray(res.info.iter).max())}")

    # warm requests: perturb costs, warm-start from the previous solution;
    # the adapted factor/rho carries across requests inside the server
    xw, yw = res.x, res.y
    t0 = time.perf_counter()
    reps = 20
    for k in range(reps):
        q2 = q + 0.01 * rng.randn(B, n)
        res = server.solve(q2, l, u, x0=xw, y0=yw)
        xw, yw = res.x, res.y
    dt = time.perf_counter() - t0
    print(f"{reps} warm requests: {dt:.3f}s "
          f"({reps * server.B / dt:.0f} QP/s through the artifact)")


if __name__ == "__main__":
    main()
