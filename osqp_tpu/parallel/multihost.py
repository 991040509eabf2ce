"""Multi-host execution helpers.

The reference is single-process by construction (SURVEY.md §2.3). The TPU
framework's distributed "backend" is mesh definition + XLA collective
lowering (SURVEY.md §5): there is no NCCL/MPI analogue to write. This module
is the thin host-coordination layer — process initialization and pod-level
mesh construction — on top of which BatchedSolver (batch-axis dp) and
ShardedQP (constraint-row sharding; alias ConsensusQP) run unchanged: their shardings already
reference only mesh axis names, and termination decisions are functions of
globally-reduced residual norms, so every host takes the identical stop
decision (the check_termination agreement property).

Typical multi-host launch (one process per host)::

    from osqp_tpu.parallel import multihost
    multihost.initialize()                    # env-driven (TPU pods)
    mesh = multihost.pod_mesh("b")            # all global devices
    solver = BatchedSolver(settings, mesh=mesh)
    out = solver.solve(P, q_global, A, l_global, u_global)
    # each host passes its full global batch; jax partitions by sharding
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed. On TPU pods all arguments are inferred
    from the environment; pass them explicitly for CPU/GPU test rigs."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def pod_mesh(*axis_names: str, shape: Optional[Sequence[int]] = None) -> Mesh:
    """Mesh over ALL global devices (every process must call identically).

    With one axis name, a 1-D mesh over all devices; with several, ``shape``
    gives the per-axis sizes (product must equal the global device count).
    """
    devs = np.array(jax.devices())
    if not axis_names:
        axis_names = ("b",)
    if shape is None:
        if len(axis_names) != 1:
            raise ValueError("shape required for multi-axis meshes")
        shape = (devs.size,)
    return Mesh(devs.reshape(shape), axis_names)


def is_primary() -> bool:
    """True on the process that should print/log (process_index 0)."""
    return jax.process_index() == 0
