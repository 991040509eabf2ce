#!/usr/bin/env python
"""Worker for the local multi-process distributed smoke test.

Launched N times by scripts/test_multihost_local.sh with PROC_ID/NUM_PROCS
env vars; each process owns one virtual CPU device, together forming a
2-process "pod". Exercises jax.distributed initialization, pod_mesh
construction, and a sharded batched solve whose termination decision must
agree across processes.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from osqp_tpu.parallel import multihost  # noqa: E402


def main():
    pid = int(os.environ["PROC_ID"])
    nproc = int(os.environ["NUM_PROCS"])
    multihost.initialize(coordinator_address="127.0.0.1:43219",
                         num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()

    from osqp_tpu.batch import BatchedSolver
    from osqp_tpu.settings import Settings

    mesh = multihost.pod_mesh("b")
    n_dev = mesh.devices.size

    rng = np.random.RandomState(0)  # identical data on every process
    B, n, m = 4 * n_dev, 6, 10
    M = rng.randn(n, n)
    P = M.T @ M + 0.2 * np.eye(n)
    A = rng.randn(m, n)
    q = rng.randn(B, n)
    l = -np.ones((B, m))
    u = np.ones((B, m))

    solver = BatchedSolver(
        settings=Settings(verbose=False, eps_abs=1e-6, eps_rel=1e-6),
        mesh=mesh)
    out = solver.solve(P, q, A, l, u)
    # every process must see the identical (replicated-decision) statuses of
    # its addressable shard; a global all-Solved check via a psum reduction
    import jax.numpy as jnp
    local_status = np.concatenate(
        [np.asarray(s.data) for s in out.status.addressable_shards])
    assert np.all(local_status == 1), local_status
    iters = np.concatenate(
        [np.asarray(s.data) for s in out.iter.addressable_shards])
    print(f"proc {pid}/{nproc}: devices={n_dev} local shard all Solved, "
          f"iters sample={iters[:2]}", flush=True)


if __name__ == "__main__":
    main()
