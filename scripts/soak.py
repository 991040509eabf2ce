#!/usr/bin/env python
"""Serving soak test: sustained batched solving on one chip.

Streams randomized problem batches through a prepared shared workspace for
``--seconds`` wall-clock (default 300), checking every batch for full
convergence and tracking per-solve latency percentiles. Catches the classes
of failure a one-shot bench misses: thermal/clock drift, runtime leaks,
relay wedges, and solver-state corruption across thousands of re-solves.

Usage: python scripts/soak.py [--seconds 300] [--batch 4096]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=300.0)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--m", type=int, default=256)
    ap.add_argument("--matmul-precision", default="float32",
                    choices=["float32", "tensorfloat32"])
    args = ap.parse_args()

    import jax
    from osqp_tpu.batch import BatchedSolver
    from osqp_tpu.settings import Settings

    B, n, m = args.batch, args.n, args.m
    rng = np.random.RandomState(0)
    M = rng.randn(n, n) / np.sqrt(n)
    P = (M.T @ M + 0.1 * np.eye(n)).astype(np.float32)
    A = (rng.randn(m, n) / np.sqrt(n)).astype(np.float32)

    solver = BatchedSolver(
        settings=Settings(eps_abs=1e-3, eps_rel=1e-3, verbose=False,
                          dtype=np.float32,
                          matmul_precision=args.matmul_precision),
        kkt_mode="shared").prepare(P, A)

    def draw(seed):
        r = np.random.RandomState(seed)
        q = r.randn(B, n).astype(np.float32)
        c = r.randn(B, m).astype(np.float32) * 0.1
        w = (1.0 + r.rand(B, m)).astype(np.float32)
        return q, c - w, c + w

    q, l, u = draw(1)
    out = solver.solve_prepared(q, l, u)   # compile
    np.asarray(out.x)
    log(f"devices: {jax.devices()}; compiled, starting "
        f"{args.seconds:.0f}s soak at B={B} n={n} m={m}")

    t_start = time.perf_counter()
    times = []
    solved_total = 0
    lanes_total = 0
    k = 0
    worst = None
    while time.perf_counter() - t_start < args.seconds:
        k += 1
        q, l, u = draw(k + 1)
        t0 = time.perf_counter()
        out = solver.solve_prepared(q, l, u)
        x = np.asarray(out.x)
        el = time.perf_counter() - t0
        st = np.asarray(out.status)
        ok = int((st == 1).sum())
        solved_total += ok
        lanes_total += B
        times.append(el)
        if ok != B and worst is None:
            worst = (k, B - ok, np.unique(st).tolist())
        if not np.isfinite(x).all():
            log(f"batch {k}: NON-FINITE SOLUTIONS")
            sys.exit(1)
        if k % 50 == 0:
            ts = np.array(times[-50:])
            log(f"batch {k}: last-50 median {np.median(ts)*1e3:.0f} ms, "
                f"p95 {np.percentile(ts, 95)*1e3:.0f} ms, "
                f"solved {solved_total}/{lanes_total}")

    ts = np.array(times)
    wall = time.perf_counter() - t_start
    result = {
        "metric": "soak_qp_throughput",
        "matmul_precision": args.matmul_precision,
        "value": round(lanes_total / wall, 1),
        "unit": "QP/s",
        "batches": k,
        "qps_solved": solved_total,
        "qps_total": lanes_total,
        "solved_fraction": round(solved_total / max(lanes_total, 1), 6),
        "median_ms": round(float(np.median(ts)) * 1e3, 2),
        "p95_ms": round(float(np.percentile(ts, 95)) * 1e3, 2),
        "max_ms": round(float(ts.max()) * 1e3, 2),
        "wall_s": round(wall, 1),
    }
    if worst:
        result["first_shortfall"] = worst
    import json
    print(json.dumps(result))


if __name__ == "__main__":
    main()
