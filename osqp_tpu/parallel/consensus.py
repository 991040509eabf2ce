"""Distributed solve of ONE large QP across a device mesh (GSPMD sharding).

Naming note: this module is *row sharding of the standard solve* — one ADMM
iterate stream, partitioned by XLA. It is NOT consensus-ADMM; that algorithm
(independent per-block subproblem solves coupled through a shared consensus
variable) lives in :mod:`osqp_tpu.parallel.scenario` (``ScenarioQP``).

The reference cannot do this at all (single-threaded C; SURVEY.md §2.3). The
TPU-native design shards the *constraint* dimension m — the large axis in
scenario/portfolio/MPC-stacked problems — across the mesh:

  * A is row-sharded: each device owns a block A_k, l_k, u_k and the matching
    slices of z, y, rho_vec (the "sequence-parallel" analogue of SURVEY.md §5:
    the constraint axis plays the role sequence length plays in attention);
  * x and the reduced KKT factor are replicated;
  * every coupling term (AᵀρA for the factorization, Aᵀ(ρz−y) per iteration,
    residual ∞-norms for the termination decision) is a cross-shard reduction.

Rather than hand-writing NCCL-style collectives, the SPMD program is expressed
once (the exact :func:`osqp_tpu.core.solve` pipeline) and partitioned by XLA:
``jit`` with `NamedSharding` annotations lowers the reductions to ``psum``/
``all-gather`` over ICI automatically, and the termination decision — a
function of globally-reduced norms — is bitwise identical on every device
(the multi-host agreement property SURVEY.md §5 calls out).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import dyn_from_settings, solve
from ..settings import Settings
from ..types import QPData, SolveOutput


def _solve_fn(data: QPData, dyn, scaling_iters, x0, y0,
              linsys: str = "direct") -> SolveOutput:
    return solve(data, dyn, scaling_iters, x0, y0, linsys=linsys)


class ShardedQP:
    """Row-sharded distributed QP solver (GSPMD partitioning of ONE solve).

    This is *data sharding of the standard ADMM solve*, not consensus-ADMM:
    the algorithm and iterates are identical to :class:`osqp_tpu.Model`'s —
    XLA merely partitions the constraint axis over the mesh and inserts the
    collectives. For the genuinely different algorithm (independent per-block
    solves coupled by a consensus variable), see
    :class:`osqp_tpu.parallel.scenario.ScenarioQP`.

    Example::

        mesh = Mesh(np.array(jax.devices()).reshape(-1), ("r",))
        solver = ShardedQP(mesh, settings=Settings())
        out = solver.solve(P, q, A, l, u)   # A row-sharded over mesh axis "r"
    """

    def __init__(self, mesh: Mesh, settings: Optional[Settings] = None,
                 axis_name: str = "r"):
        self.mesh = mesh
        self.settings = settings or Settings()
        self.axis_name = axis_name

        row = NamedSharding(mesh, P(axis_name))          # (m,) leaves
        rowmat = NamedSharding(mesh, P(axis_name, None))  # (m, n) leaves
        rep = NamedSharding(mesh, P())
        repmat = NamedSharding(mesh, P(None, None))
        from .. import constants as _C
        self._linsys = ("indirect" if self.settings.linsys_solver
                        == _C.INDIRECT_SOLVER else "direct")
        self._jit = jax.jit(
            _solve_fn,
            static_argnames=("linsys",),
            in_shardings=(
                QPData(P=repmat, q=rep, A=rowmat, l=row, u=row),
                None, None, rep, row),
            out_shardings=SolveOutput(
                x=rep, y=row, z=row, status=rep, iter=rep,
                pri_res=rep, dua_res=rep, obj_val=rep,
                prim_cert=row, dual_cert=rep,
                rho_updates=rep, rho_estimate=rep,
                xbar=rep, ybar=row, zbar=row, status_polish=rep,
                rho_dir=rep, rho_gap=rep, next_rho=rep),
        )

    def solve(self, Pm, q, A, l, u, x0=None, y0=None) -> SolveOutput:
        """Solve one QP with A/l/u row-sharded over the mesh; P/q and x are
        replicated; m must divide the mesh size."""
        s = self.settings
        dtype = s.resolve_dtype()
        Pm = jnp.asarray(Pm, dtype)
        q = jnp.asarray(q, dtype)
        A = jnp.asarray(A, dtype)
        l = jnp.asarray(l, dtype)
        u = jnp.asarray(u, dtype)
        n = q.shape[0]
        m = l.shape[0]
        if m % self.mesh.devices.size != 0:
            raise ValueError(
                f"m={m} must be divisible by the mesh size "
                f"{self.mesh.devices.size} (pad constraints with loose rows)")
        x0 = jnp.zeros((n,), dtype) if x0 is None else jnp.asarray(x0, dtype)
        y0 = jnp.zeros((m,), dtype) if y0 is None else jnp.asarray(y0, dtype)
        dyn = dyn_from_settings(s, dtype)
        data = QPData(P=Pm, q=q, A=A, l=l, u=u)
        out = self._jit(data, dyn, jnp.int32(s.scaling), x0, y0,
                        self._linsys)
        # reference solution convention (interface.jl:184-210): NaN-fill
        # x/y/z when no solution is present; certificates carry the rays
        from ..types import solution_present
        present = solution_present(out.status)
        nan = jnp.asarray(jnp.nan, dtype)
        return out._replace(x=jnp.where(present, out.x, nan),
                            y=jnp.where(present, out.y, nan),
                            z=jnp.where(present, out.z, nan))


def solve_sharded(mesh: Mesh, Pm, q, A, l, u,
                  settings: Optional[Settings] = None) -> SolveOutput:
    """One-shot functional distributed solve."""
    return ShardedQP(mesh, settings=settings).solve(Pm, q, A, l, u)


#: Backwards-compatible aliases (pre-0.2 naming; the class was never a
#: consensus-ADMM method — see the ShardedQP docstring).
ConsensusQP = ShardedQP
solve_consensus = solve_sharded
