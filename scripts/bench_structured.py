#!/usr/bin/env python
"""Middle-path benchmark (round-1 verdict item #7): an MPC-horizon QP at
n ~ 2e4 on the three engines that can reach that size:

  * BlockTridiagSolver — the structured direct path (O(T b^3) factor)
  * SparseModel        — matrix-free CG (padded/ELL operators on TPU)
  * Model (dense)      — the O(n^2)-HBM dense direct path (attempted with a
                         guard; at this size the KKT inverse alone is
                         ~1.6 GB and the factorization O(n^3))

Problem: control family (OSQP paper §8), nx=30/nu=10/T=500 → n=20 000,
m=35 000 (15 000 dynamics equalities + 20 000 box rows), eps 1e-3, f32.

Usage: python scripts/bench_structured.py [--cpu] [--dense] [--T 500]
"""

import argparse
import os
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="run on the 8-virtual-device CPU platform")
    ap.add_argument("--dense", action="store_true",
                    help="also attempt the dense direct path")
    ap.add_argument("--T", type=int, default=500)
    ap.add_argument("--nx", type=int, default=30)
    ap.add_argument("--nu", type=int, default=10)
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from osqp_tpu.problems import control_qp
    from osqp_tpu.structured import BlockTridiagSolver

    # probe the backend BEFORE the (minutes-long at T=500) dense problem
    # generation, so an unavailable backend fails fast. NB on axon hosts the
    # client package lives on PYTHONPATH (/root/.axon_site) — overriding
    # PYTHONPATH instead of appending silently removes the 'axon' platform.
    log(f"devices: {jax.devices()}")

    nx, nu, T = args.nx, args.nu, args.T
    b = nx + nu
    P, q, A, l, u = control_qp(nx=nx, nu=nu, T=T, seed=0)
    n, m = P.shape[0], A.shape[0]
    Ps, As = sp.csc_matrix(P), sp.csc_matrix(A)
    log(f"control QP: n={n} m={m} b={b} T={T} "
        f"nnz(P)={Ps.nnz} nnz(A)={As.nnz}")
    eps = dict(eps_abs=1e-3, eps_rel=1e-3, verbose=False)
    results = {}

    # ---- structured block-tridiagonal direct ----
    st = BlockTridiagSolver()
    t0 = time.perf_counter()
    st.setup(P=Ps, A=As, block=b, max_iter=4000, dtype=np.float32, **eps)
    t_setup = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = st.solve(q, l, u)
    x1 = np.asarray(out["x"])[0]
    t_first = time.perf_counter() - t0
    # pre-warm the remaining jit signatures (with-factor-cache and
    # with-warm-start) so cold/warm below time execution, not compilation
    np.asarray(st.solve(q, l, u)["x"])
    np.asarray(st.solve(q, l, u, x0=np.asarray(out["x"]),
                        y0=np.asarray(out["y"]))["x"])
    t0 = time.perf_counter()
    out = st.solve(q, l, u)
    np.asarray(out["x"])
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    outw = st.solve(q * 1.01, l, u, x0=np.asarray(out["x"]),
                    y0=np.asarray(out["y"]))
    np.asarray(outw["x"])
    t_warm = time.perf_counter() - t0
    log(f"structured: setup {t_setup:.2f}s, first(+compile) {t_first:.2f}s, "
        f"cold {t_cold:.3f}s ({int(np.asarray(out['iter'])[0])} iters, "
        f"status {int(np.asarray(out['status'])[0])}), warm {t_warm:.3f}s "
        f"({int(np.asarray(outw['iter'])[0])} iters)")
    results["structured_cold_s"] = t_cold
    results["structured_warm_s"] = t_warm

    # ---- matrix-free CG (SparseModel) ----
    from osqp_tpu.sparse_core import SparseModel
    fmt = "bcoo" if args.cpu else "padded"
    sm = SparseModel()
    t0 = time.perf_counter()
    # time_limit engages the rate-adaptive chunked driver — required on
    # runtimes that kill single device dispatches after ~60 s (a full CG
    # solve at this size runs minutes on-device)
    sm.setup(P=Ps, q=q, A=As, l=l, u=u, max_iter=4000, time_limit=240.0,
             dtype=np.float32, sparse_format=fmt, **eps)
    t_setup = time.perf_counter() - t0
    t0 = time.perf_counter()
    r = sm.solve()
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    r = sm.solve()
    t_cold = time.perf_counter() - t0
    log(f"sparse-CG ({fmt}): setup {t_setup:.2f}s, first(+compile) "
        f"{t_first:.2f}s, cold {t_cold:.3f}s "
        f"({r.info.iter} iters, {r.info.status})")
    results["cg_cold_s"] = t_cold

    if np.isfinite(x1).all() and np.isfinite(r.x).all():
        rel = (np.linalg.norm(x1 - r.x) /
               max(1.0, np.linalg.norm(r.x)))
        log(f"structured-vs-CG solution agreement: rel l2 {rel:.2e}")

    # ---- dense direct (guarded attempt) ----
    if args.dense:
        from osqp_tpu import Model
        try:
            dm = Model()
            t0 = time.perf_counter()
            dm.setup(P=P, q=q, A=A, l=l, u=u, max_iter=4000,
                     dtype=np.float32, **eps)
            t_setup = time.perf_counter() - t0
            t0 = time.perf_counter()
            rd = dm.solve()
            t_first = time.perf_counter() - t0
            log(f"dense: setup(+factor) {t_setup:.2f}s, solve "
                f"{t_first:.2f}s ({rd.info.iter} iters, {rd.info.status})")
            results["dense_total_s"] = t_setup + t_first
        except Exception as e:
            log(f"dense path failed at n={n}: {type(e).__name__}: {e}")
            results["dense_total_s"] = None

    import json
    print(json.dumps(results))


if __name__ == "__main__":
    main()
