"""Parallel / distributed execution.

The reference has no parallelism (SURVEY.md §2.3 — a single-threaded C library
behind a ccall). This package supplies the TPU-native scaling paths the new
framework makes first-class:

  * :func:`batch_mesh` — device mesh over which the batched solver shards the
    problem axis (embarrassingly parallel, zero collectives);
  * :mod:`osqp_tpu.parallel.consensus` — ``ShardedQP``: GSPMD row-sharding of
    one large QP's standard solve across devices (XLA inserts the ``psum``/
    all-gather collectives over ICI);
  * :mod:`osqp_tpu.parallel.scenario` — ``ScenarioQP``: true consensus-ADMM
    (independent per-scenario solves coupled through a consensus variable).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from .consensus import (ConsensusQP, ShardedQP, solve_consensus,
                        solve_sharded)
from .scenario import ScenarioQP, ScenarioResult


def batch_mesh(n_devices: Optional[int] = None,
               axis_name: str = "b") -> Mesh:
    """1-D mesh over available devices for batch-axis sharding."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


__all__ = ["batch_mesh", "Mesh", "ShardedQP", "solve_sharded",
           "ConsensusQP", "solve_consensus", "ScenarioQP", "ScenarioResult"]
