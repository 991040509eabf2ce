"""osqp_tpu — a TPU-native ADMM QP solver.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the OSQP
solver stack that the reference wrapper (/root/reference, OSQP.jl) exposes:

    minimize    0.5 xᵀPx + qᵀx
    subject to  l ≤ Ax ≤ u

Layers (top to bottom, mirroring SURVEY.md §1):
  * ``osqp_tpu.modeling``  — incremental modeling layer (MOI_wrapper analogue)
  * ``osqp_tpu.Model``     — low-level lifecycle API (interface.jl analogue)
  * ``osqp_tpu.core``      — the jitted ADMM engine (the C core analogue;
                             dense-Cholesky reduced KKT, vmappable)
  * ``osqp_tpu.batch``     — vmapped/sharded batched solver (MPC workloads)
  * ``osqp_tpu.parallel``  — device-mesh sharding + consensus ADMM
"""

from . import constants, problems
from .constants import (
    OSQP_INFTY,
    SOLUTION_PRESENT,
    STATUS_MAP,
    UPDATABLE_DATA,
    UPDATABLE_SETTINGS,
)
from .core import DynParams, dyn_from_settings, solve, solve_scaled
from .interface import Model, version
from .settings import Settings
from .types import Info, QPData, Results, ScalingData, SolveOutput

#: osqp-python-style alias: ``prob = osqp.OSQP(); prob.setup(...)``
OSQP = Model


def __getattr__(name):
    # lazy accessors keep `import osqp_tpu` light (no pallas/ctypes imports)
    if name == "BatchedSolver":
        from .batch import BatchedSolver
        return BatchedSolver
    if name == "SparseModel":
        from .sparse_core import SparseModel
        return SparseModel
    if name == "NativeModel":
        from .native import NativeModel
        return NativeModel
    if name == "Problem":
        from .modeling import Problem
        return Problem
    if name == "BlockTridiagSolver":
        from .structured import BlockTridiagSolver
        return BlockTridiagSolver
    if name == "BandedModel":
        from .band import BandedModel
        return BandedModel
    if name == "solve_qp":
        from .diff import solve_qp
        return solve_qp
    if name == "make_qp_layer":
        from .diff import make_qp_layer
        return make_qp_layer
    if name == "make_batched_qp_layer":
        from .diff import make_batched_qp_layer
        return make_batched_qp_layer
    if name in ("export_prepared", "load_artifact", "PreparedServer"):
        from . import serve
        return {"export_prepared": serve.export_prepared,
                "load_artifact": serve.load,
                "PreparedServer": serve.PreparedServer}[name]
    raise AttributeError(f"module 'osqp_tpu' has no attribute '{name}'")


__version__ = "0.1.0"

__all__ = [
    "Model",
    "OSQP",
    "BatchedSolver",
    "SparseModel",
    "NativeModel",
    "Problem",
    "BlockTridiagSolver",
    "solve_qp",
    "make_qp_layer",
    "make_batched_qp_layer",
    "export_prepared",
    "load_artifact",
    "PreparedServer",
    "problems",
    "Settings",
    "Info",
    "Results",
    "QPData",
    "solve",
    "version",
    "constants",
    "OSQP_INFTY",
    "STATUS_MAP",
    "SOLUTION_PRESENT",
    "UPDATABLE_DATA",
    "UPDATABLE_SETTINGS",
]
