#!/usr/bin/env python
"""Headline benchmark: batched MPC-style QP throughput (BASELINE.md target:
1k-QP batch at >10x OSQP-C single-core throughput).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "QP/s", "vs_baseline": N}

vs_baseline = TPU batched throughput / single-core CPU dense-ADMM throughput
measured live on this host (osqp_tpu.utils.npref — the same algorithm on
NumPy/LAPACK, the closest same-machine stand-in for the OSQP C core, which is
not vendored). Diagnostics go to stderr; stdout carries only the JSON line.
"""

import json
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_batch(B, n, m, seed=0):
    """Random strongly-convex MPC-style QPs sharing one structure."""
    rng = np.random.RandomState(seed)
    M = rng.randn(n, n) / np.sqrt(n)
    P = M.T @ M + 0.1 * np.eye(n)
    A = rng.randn(m, n) / np.sqrt(n)
    q = rng.randn(B, n)
    width = 1.0 + rng.rand(B, m)
    center = rng.randn(B, m) * 0.1
    l = center - width
    u = center + width
    return P, q, A, l, u


def main():
    import jax
    from osqp_tpu.batch import BatchedSolver
    from osqp_tpu.settings import Settings
    from osqp_tpu.utils.npref import solve_np

    B, n, m = 4096, 128, 256
    P, q, A, l, u = make_batch(B, n, m)
    log(f"devices: {jax.devices()}")
    log(f"batch: B={B} n={n} m={m}")

    settings = Settings(eps_abs=1e-3, eps_rel=1e-3, polish=False,
                        verbose=False, dtype=np.float32)
    # shared-structure engine: one factorization + fused GEMM kernel
    # (P and A are shared across the MPC batch)
    solver = BatchedSolver(settings=settings, kkt_mode="shared")

    # warmup / compile
    t0 = time.perf_counter()
    out = solver.solve(P, q, A, l, u)
    jax.block_until_ready(out.x)
    log(f"compile+first solve: {time.perf_counter()-t0:.2f}s")
    statuses = np.asarray(out.status)
    solved_frac = float(np.mean(statuses == 1))
    iters = np.asarray(out.iter)
    log(f"solved fraction: {solved_frac:.3f}; iters max={iters.max()} "
        f"mean={iters.mean():.1f}")

    # timed cold runs (perturb q so nothing is cached trivially); timing
    # includes the host transfer of the result (block_until_ready alone
    # under-reports on this runtime)
    rng = np.random.RandomState(7)
    times = []
    for rep in range(3):
        q2 = q + 0.05 * rng.randn(*q.shape)
        t0 = time.perf_counter()
        out = solver.solve(P, q2, A, l, u)
        xs = np.asarray(out.x)
        times.append(time.perf_counter() - t0)
    t_best = min(times)
    tpu_qps = B / t_best
    log(f"cold timed runs: {['%.3f' % t for t in times]} -> {tpu_qps:.1f} QP/s")

    # warm-started re-solve (the receding-horizon MPC cycle: shift the cost,
    # warm start from the previous solution, carry over the adapted rho —
    # the reference's persistent-workspace economics, interface.jl:408-440)
    xw, yw = np.asarray(out.x), np.asarray(out.y)
    rho_w = np.asarray(out.rho_estimate)
    wtimes = []
    for rep in range(3):
        q2 = q2 + 0.01 * rng.randn(*q.shape)
        t0 = time.perf_counter()
        out = solver.solve(P, q2, A, l, u, x0=xw, y0=yw, rho0=rho_w)
        xw = np.asarray(out.x)
        wtimes.append(time.perf_counter() - t0)
        yw = np.asarray(out.y)
        rho_w = np.asarray(out.rho_estimate)
    warm_qps = B / min(wtimes)
    log(f"warm re-solve runs: {['%.3f' % t for t in wtimes]} "
        f"(iters mean {np.asarray(out.iter).mean():.1f} "
        f"max {np.asarray(out.iter).max()}) -> {warm_qps:.1f} QP/s")

    # ---- on-device throughput + MFU (excluding the host<->TPU tunnel) ----
    # Slope method: wall time of k back-to-back solves with ONE final
    # transfer is setup + k*t_device + t_transfer; the k-slope isolates
    # t_device (block_until_ready alone under-reports on this runtime).
    def chained(k, qq):
        t0 = time.perf_counter()
        o = None
        for j in range(k):
            o = solver.solve(P, qq + 1e-4 * j, A, l, u)
        np.asarray(o.x)
        return time.perf_counter() - t0

    chained(1, q)  # warm the cache
    t2 = min(chained(2, q) for _ in range(2))
    t6 = min(chained(6, q) for _ in range(2))
    t_dev = max((t6 - t2) / 4.0, 1e-9)
    dev_qps = B / t_dev
    # per-lane-iteration GEMM flops in the shared engine: rows of three
    # matmuls (m,n)+(n,n)+(n,m) -> 2*(2mn+n^2) flops per lane-iteration
    flops_per_lane_iter = 2.0 * (2 * m * n + n * n)
    total_lane_iters = float(iters.sum())
    tflops = total_lane_iters * flops_per_lane_iter / t_dev / 1e12
    # v5e bf16 MXU peak ~197 TFLOP/s; f32-precision matmuls (what the
    # solver pins) run at ~1/3 of that. Report MFU against the f32 ceiling.
    mfu = tflops / (197.0 / 3.0)
    dev_lane_iters_s = total_lane_iters / t_dev
    log(f"on-device: {t_dev*1e3:.1f} ms/solve -> {dev_qps:.0f} QP/s, "
        f"{dev_lane_iters_s/1e6:.2f}M lane-iters/s, {tflops:.2f} TFLOP/s, "
        f"MFU(f32) ~ {100*mfu:.2f}%")

    # single-core CPU baseline on a subsample: the faster of the NumPy
    # reference engine and the native C++ sparse-LDL engine (the in-repo
    # OSQP-C-class implementation)
    K = 8
    np_time = float("inf")
    for _ in range(2):  # best-of-2: conservative vs host noise
        sols = []
        t0 = time.perf_counter()
        for i in range(K):
            xn, yn, _, _ = solve_np(P, q[i], A, l[i], u[i],
                                    eps_abs=1e-3, eps_rel=1e-3)
            sols.append((xn, yn))
        np_time = min(np_time, time.perf_counter() - t0)
    # warm-started CPU baseline (same receding-horizon cycle)
    t0 = time.perf_counter()
    for i in range(K):
        solve_np(P, q[i] + 0.01, A, l[i], u[i], eps_abs=1e-3, eps_rel=1e-3,
                 x0=sols[i][0], y0=sols[i][1])
    np_warm_time = time.perf_counter() - t0
    cpu_warm_qps = K / np_warm_time
    log(f"cpu numpy warm single-core: {cpu_warm_qps:.1f} QP/s")
    log(f"cpu numpy single-core: {K} QPs in {np_time:.2f}s "
        f"-> {K / np_time:.1f} QP/s")
    native_time = None
    try:
        from osqp_tpu.native import NativeModel
        t0 = time.perf_counter()
        for i in range(K):
            nm = NativeModel().setup(P=P, q=q[i], A=A, l=l[i], u=u[i],
                                     eps_abs=1e-3, eps_rel=1e-3,
                                     verbose=False)
            nm.solve()
        native_time = time.perf_counter() - t0
        log(f"cpu native single-core: {K} QPs in {native_time:.2f}s "
            f"-> {K / native_time:.1f} QP/s")
    except Exception as e:  # native lib unavailable -> numpy baseline only
        log(f"native baseline unavailable: {e}")
    cpu_time = min(t for t in (np_time, native_time) if t is not None)
    cpu_qps = K / cpu_time
    log(f"cpu single-core baseline: {cpu_qps:.1f} QP/s")

    vs = tpu_qps / cpu_qps
    print(json.dumps({
        "metric": "batched_mpc_qp_throughput",
        "value": round(tpu_qps, 1),
        "unit": "QP/s",
        "vs_baseline": round(vs, 2),
        "warm_resolve_qps": round(warm_qps, 1),
        "warm_vs_baseline": round(warm_qps / cpu_warm_qps, 2),
        "on_device_qps": round(dev_qps, 1),
        "on_device_mlane_iters_s": round(dev_lane_iters_s / 1e6, 2),
        "mfu_f32_pct": round(100 * mfu, 3),
    }))


if __name__ == "__main__":
    main()
