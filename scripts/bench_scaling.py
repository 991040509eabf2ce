#!/usr/bin/env python
"""ADMM iteration-rate scaling measurement (BASELINE.md: iterations/s at
1 chip, 1 host, and N>=2 hosts).

Runs the shared-structure batched engine over meshes of 1..N devices and
reports iterations/s per mesh size. On a real pod each process runs this
identically after `osqp_tpu.parallel.multihost.initialize()`; on a dev
machine pass --cpu to simulate with 8 virtual CPU devices.

Usage:
    python scripts/bench_scaling.py [--cpu] [--batch 4096] [--iters 200]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="simulate with 8 virtual CPU devices")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--m", type=int, default=256)
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from jax.sharding import Mesh

    from osqp_tpu.batch import BatchedSolver
    from osqp_tpu.settings import Settings

    rng = np.random.RandomState(0)
    B, n, m = args.batch, args.n, args.m
    M = rng.randn(n, n) / np.sqrt(n)
    P = M.T @ M + 0.1 * np.eye(n)
    A = rng.randn(m, n) / np.sqrt(n)
    q = rng.randn(B, n)
    c = rng.randn(B, m) * 0.1
    w = 1.0 + rng.rand(B, m)
    l, u = c - w, c + w

    # fixed iteration budget (no early exit) for a clean iterations/s figure
    settings = Settings(eps_abs=0.0, eps_rel=0.0, check_termination=0,
                        max_iter=args.iters, verbose=False,
                        adaptive_rho=False,
                        dtype=np.float32 if not args.cpu else np.float64)

    devs = jax.devices()
    results = []
    sizes = sorted({1, 2, len(devs)} & set(range(1, len(devs) + 1))) \
        if len(devs) > 1 else [1]
    for nd in sizes:
        mesh = Mesh(np.array(devs[:nd]), ("b",))
        solver = BatchedSolver(settings=settings, mesh=mesh,
                               kkt_mode="inverse")
        out = solver.solve(P, q, A, l, u)
        _ = np.asarray(out.x)  # warmup + compile
        t0 = time.perf_counter()
        out = solver.solve(P, q, A, l, u)
        _ = np.asarray(out.x)
        t = time.perf_counter() - t0
        its = B * args.iters / t
        results.append({"devices": nd, "batch": B,
                        "iterations_per_s": round(its),
                        "wall_s": round(t, 3)})
        print(f"devices={nd}: {its:.3e} ADMM lane-iterations/s "
              f"({t:.3f}s for {B}x{args.iters})", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
