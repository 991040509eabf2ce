"""Sparse linear operators for the large-problem (matrix-free) path.

The reference scales only through sparsity (QDLDL on CSC — SURVEY.md §5
"long-context" note). The TPU equivalent: BCOO matvecs feeding the indirect
(CG) KKT solve of :mod:`osqp_tpu.core`, with the constraint matrix row-
shardable across a mesh.

:class:`SparseOp` wraps a BCOO matrix with its precomputed transpose (so the
hot loop never re-transposes), plus the structural companions the solver
needs: the diagonal (Jacobi preconditioner) and the squared-value transpose
(so diag(AᵀρA) is just a matvec ``A_sqᵀ @ rho``). It duck-types the small
operator surface ``core.py`` uses (``@``, ``.T``, ``.shape``, ``.dtype``), so
the same jitted ADMM loop runs dense or sparse.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import sparse as jsparse


@jax.tree_util.register_pytree_node_class
class SparseOp:
    """BCOO operator with cached transpose and structural companions."""

    def __init__(self, M, MT, sqT=None, diag=None):
        self.M = M
        self.MT = MT
        self.sqT = sqT       # BCOO of (Mᵀ)² values (for diag(MᵀρM))
        self.diag = diag     # (min(shape),) diagonal values

    # -- operator surface used by core.py --
    def __matmul__(self, v):
        return self.M @ v

    @property
    def T(self) -> "SparseOp":
        return SparseOp(self.MT, self.M)

    @property
    def shape(self):
        return self.M.shape

    @property
    def dtype(self):
        return self.M.dtype

    def __pow__(self, p):  # pragma: no cover - defensive
        raise TypeError("elementwise power not supported on SparseOp")

    # -- pytree --
    def tree_flatten(self):
        return (self.M, self.MT, self.sqT, self.diag), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _bcoo_from_coo(rows, cols, vals, shape, dtype):
    idx = jnp.stack([jnp.asarray(rows, jnp.int32),
                     jnp.asarray(cols, jnp.int32)], axis=1)
    return jsparse.BCOO((jnp.asarray(vals, dtype), idx), shape=shape)


def sparse_op_from_coo(rows, cols, vals, shape, dtype=jnp.float32,
                       with_companions: bool = True) -> SparseOp:
    """Build a SparseOp from COO data (host-side numpy ok)."""
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    vals = np.asarray(vals)
    M = _bcoo_from_coo(rows, cols, vals, shape, dtype)
    MT = _bcoo_from_coo(cols, rows, vals, (shape[1], shape[0]), dtype)
    sqT = None
    diag = None
    if with_companions:
        sqT = _bcoo_from_coo(cols, rows, vals * vals,
                             (shape[1], shape[0]), dtype)
        d = np.zeros(min(shape))
        on_diag = rows == cols
        np.add.at(d, rows[on_diag], vals[on_diag])
        diag = jnp.asarray(d, dtype)
    return SparseOp(M, MT, sqT=sqT, diag=diag)


def scale_sparse_op(op: SparseOp, row_scale, col_scale,
                    extra: float | jnp.ndarray = 1.0) -> SparseOp:
    """Return diag(row_scale) · M · diag(col_scale) · extra as a new SparseOp
    (same pattern; companions rebuilt)."""
    ri = op.M.indices[:, 0]
    ci = op.M.indices[:, 1]
    vals = op.M.data * row_scale[ri] * col_scale[ci] * extra
    M = jsparse.BCOO((vals, op.M.indices), shape=op.M.shape)
    # transpose shares the values at transposed index order
    rti = op.MT.indices[:, 0]
    cti = op.MT.indices[:, 1]
    tvals = op.MT.data * row_scale[cti] * col_scale[rti] * extra
    MT = jsparse.BCOO((tvals, op.MT.indices), shape=op.MT.shape)
    sqT = None
    diag = None
    if op.sqT is not None:
        sqT = jsparse.BCOO((tvals * tvals, op.MT.indices), shape=op.MT.shape)
    if op.diag is not None:
        k = op.diag.shape[0]
        diag = op.diag * row_scale[:k] * col_scale[:k] * extra
    return SparseOp(M, MT, sqT=sqT, diag=diag)


def col_max_abs(op: SparseOp, n_cols: int):
    """Per-column infinity norm (via segment_max over COO entries)."""
    ci = op.M.indices[:, 1]
    return jax.ops.segment_max(jnp.abs(op.M.data), ci, num_segments=n_cols,
                               indices_are_sorted=False)


def row_max_abs(op: SparseOp, n_rows: int):
    ri = op.M.indices[:, 0]
    return jax.ops.segment_max(jnp.abs(op.M.data), ri, num_segments=n_rows,
                               indices_are_sorted=False)
