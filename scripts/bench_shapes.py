#!/usr/bin/env python
"""Shape sweep of the shared-structure batched engine: compute-only
per-iteration time, lane-iterations/s and MFU(f32) across QP sizes.

The headline bench (bench.py) characterizes one shape (n=128, m=256); this
sweep shows how the fused iteration kernel scales with problem size — at
larger n the three GEMMs dominate the elementwise chain and MFU climbs.

Uses the same pipelined-slope method as bench.py (distinct pre-staged
problems dispatched back-to-back; the K-slope over in-kernel iterations
cancels dispatch constants).

Usage: python scripts/bench_shapes.py [--cpu] [--batch 4096]
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
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=1")
    import jax
    import jax.numpy as jnp
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from osqp_tpu.batch import _pick_group
    from osqp_tpu.linalg import with_precision
    from osqp_tpu.ops.shared_iter import admm_iterate_shared

    B = args.batch
    shapes = [(64, 128), (128, 256), (256, 512), (512, 1024)]
    print(f"{'n':>5} {'m':>5} {'G':>4} {'us/iter':>9} {'Mlane-it/s':>11} "
          f"{'TFLOP/s':>8} {'MFU%':>6}")
    for n, m in shapes:
        G = _pick_group(B, n, m)  # the shared engine's VMEM-aware pick
        rng = np.random.RandomState(0)
        dt = jnp.float32
        Rinv = jnp.asarray(rng.randn(n, n) * 0.05, dt)
        A = jnp.asarray(rng.randn(m, n) / np.sqrt(m), dt)
        rho = jnp.full((m,), 0.1, dt)
        rho_inv = 1.0 / rho
        l = jnp.full((B, m), -1.0, dt)
        u = jnp.full((B, m), 1.0, dt)
        x = jnp.zeros((B, n), dt)
        y = jnp.zeros((B, m), dt)
        z = jnp.zeros((B, m), dt)
        R_HI = 20
        qs = [jnp.asarray(rng.randn(B, n), dt) for _ in range(R_HI)]
        jax.block_until_ready(qs[-1])
        K = 100 if not args.cpu else 10

        @with_precision
        def run(q):
            return admm_iterate_shared(
                Rinv, A, rho, rho_inv, q, l, u, x, y, z,
                jnp.float32(1e-6), jnp.float32(1.6), jnp.int32(K), group=G)

        def chained(R):
            t0 = time.perf_counter()
            o = None
            for j in range(R):
                o = run(qs[j])
            np.asarray(o[0])
            return time.perf_counter() - t0

        chained(2)  # compile + warm
        lo, hi = 2, R_HI
        per_chunk = None
        for _ in range(3):
            t_lo = min(chained(lo) for _ in range(args.reps))
            t_hi = min(chained(hi) for _ in range(args.reps))
            s = (t_hi - t_lo) / (hi - lo)
            if s > 0.2 * t_hi / hi:
                per_chunk = s
                break
        if per_chunk is None:
            per_chunk = t_hi / hi
            log(f"n={n}: slope unstable, amortized bound used")
        per_iter = per_chunk / K
        flops = 2.0 * (2 * m * n + n * n) * B
        tflops = flops / per_iter / 1e12
        mfu = 100 * tflops / (197.0 / 3.0)
        print(f"{n:>5} {m:>5} {G:>4} {per_iter*1e6:>9.2f} "
              f"{B/per_iter/1e6:>11.1f} {tflops:>8.2f} {mfu:>6.2f}")


if __name__ == "__main__":
    main()
