#!/bin/sh
# Local 2-process distributed smoke test: each process owns part of a CPU
# "pod"; validates jax.distributed init + pod meshes + sharded batched solve
# with cross-process termination agreement.
set -e
cd "$(dirname "$0")/.."
NUM_PROCS=2 PROC_ID=0 python scripts/multihost_worker.py &
P0=$!
NUM_PROCS=2 PROC_ID=1 python scripts/multihost_worker.py &
P1=$!
wait $P0
wait $P1
echo "multihost local smoke test OK"
