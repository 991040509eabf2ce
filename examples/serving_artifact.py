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

    # warm requests through the device-resident hot path: q perturbations
    # are staged on device, x/y feed back as warm starts without ever
    # leaving HBM; only the solution x is downloaded each step (on relayed
    # hosts the full-Results download costs ~13 tunnel round-trips/request)
    import jax.numpy as jnp
    ld, ud = jnp.asarray(l), jnp.asarray(u)
    qd = jnp.asarray(q)
    xw, yw = jnp.asarray(res.x), jnp.asarray(res.y)
    reps = 20
    qs = [qd + 0.01 * jnp.asarray(rng.randn(B, n)) for _ in range(reps)]
    jax.block_until_ready(qs[-1])
    t0 = time.perf_counter()
    for k in range(reps):
        out = server.solve_device(qs[k], ld, ud, x0=xw, y0=yw)
        xw, yw = out[0], out[1]
        x_step = np.asarray(out[0])       # the one download per step
    dt = time.perf_counter() - t0
    print(f"{reps} warm device-resident requests: {dt:.3f}s "
          f"({reps * server.B / dt:.0f} QP/s through the artifact)")


if __name__ == "__main__":
    main()
