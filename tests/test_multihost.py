"""CI-pinned 2-process distributed smoke (round-4 verdict item #9).

The reference has no distributed backend (SURVEY.md §2.3: the C solver is
single-threaded); the TPU framework's "backend" is jax.distributed init +
mesh definition + collective lowering. This wraps
``scripts/multihost_worker.py`` — two OS processes each owning one virtual
CPU device of a 2-process "pod", running a sharded batched solve whose
termination decision must agree across processes — as a pytest so the
distributed path is suite-enforced, not script-only.

The workers run in FRESH subprocesses (jax.distributed cannot initialize in
the already-configured test process), so this test is independent of the
conftest platform override.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "multihost_worker.py")


def test_two_process_distributed_smoke():
    env_base = {k: v for k, v in os.environ.items()
                if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = []
    for pid in range(2):
        env = dict(env_base, NUM_PROCS="2", PROC_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    rcs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        rcs.append(p.returncode)
    assert rcs == [0, 0], "\n---\n".join(outs)
    # both processes must report the identical stop decision
    for out in outs:
        assert "all Solved" in out, out
