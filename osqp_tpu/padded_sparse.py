"""Padded-row (ELLPACK) sparse operators — the TPU-friendly sparse format.

BCOO matvecs lower to scatter/segment ops that compile slowly and run poorly
on TPU. The ELL layout pads every row to the max row-nnz K, giving fully
regular arrays: ``vals (m, K)`` and ``cols (m, K)``, with matvec

    (M @ x)[i] = sum_k vals[i, k] * x[cols[i, k]]

— one gather + one elementwise product + one row reduction, all static-shape
and vectorizable. The transpose layout is precomputed and stored alongside
(as arrays, not a child operator — pytrees must stay acyclic), and the
structural companions the solver needs (diagonal, squared-transpose for
diag(AᵀρA)) are available, so the whole indirect-CG pipeline
(:mod:`osqp_tpu.core` with ``linsys="indirect"``) runs on dense primitives.

Memory overhead is rows·K vs nnz; for matrices with roughly balanced rows
(constraint matrices from the OSQP problem classes) K ≈ mean row degree and
the overhead is small. Pathologically skewed rows would waste space — use the
BCOO path (`sparse_ops.py`) there.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class PaddedOp:
    """ELL sparse operator with co-stored transpose layout and companions."""

    def __init__(self, vals, cols, tvals, tcols, shape,
                 sq_tvals=None, diag=None):
        self.vals = vals        # (rows, K)
        self.cols = cols        # (rows, K) int32; padding points at column 0
        self.tvals = tvals      # (ncols, Kt) — transpose layout
        self.tcols = tcols      # (ncols, Kt) int32 (row indices)
        self._shape = shape     # static python tuple
        self.sq_tvals = sq_tvals  # tvals**2 (for diag(MᵀρM) = sqTᵀ... @ rho)
        self.diag = diag        # (min(shape),)

    # -- operator surface used by core.py --
    def __matmul__(self, v):
        return jnp.sum(self.vals * v[self.cols], axis=1)

    @property
    def T(self) -> "PaddedOp":
        return PaddedOp(self.tvals, self.tcols, self.vals, self.cols,
                        (self._shape[1], self._shape[0]))

    @property
    def sqT(self) -> "PaddedOp":
        """Operator of squared transpose values: sqT @ rho = diag(MᵀρM)."""
        return PaddedOp(self.sq_tvals, self.tcols, None, None,
                        (self._shape[1], self._shape[0]))

    @property
    def shape(self):
        return self._shape

    @property
    def dtype(self):
        return self.vals.dtype

    # -- pytree (shape is static aux data) --
    def tree_flatten(self):
        return (self.vals, self.cols, self.tvals, self.tcols,
                self.sq_tvals, self.diag), self._shape

    @classmethod
    def tree_unflatten(cls, shape, children):
        vals, cols, tvals, tcols, sq_tvals, diag = children
        return cls(vals, cols, tvals, tcols, shape,
                   sq_tvals=sq_tvals, diag=diag)


def _pad_rows(rows, cols, vals, n_rows):
    """COO -> per-row padded (vals, cols) numpy arrays."""
    order = np.argsort(rows, kind="stable")
    rows, cols, vals = rows[order], cols[order], vals[order]
    counts = np.bincount(rows, minlength=n_rows)
    K = max(int(counts.max(initial=0)), 1)
    pv = np.zeros((n_rows, K), dtype=np.float64)
    pc = np.zeros((n_rows, K), dtype=np.int64)
    if rows.size:
        starts = np.zeros(n_rows + 1, dtype=np.int64)
        np.cumsum(counts, out=starts[1:])
        slot = np.arange(rows.size, dtype=np.int64) - starts[rows]
        pv[rows, slot] = vals
        pc[rows, slot] = cols
    return pv, pc


def padded_op_from_coo(rows, cols, vals, shape, dtype=jnp.float32,
                       with_companions: bool = True) -> PaddedOp:
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    vals = np.asarray(vals, dtype=np.float64)
    pv, pc = _pad_rows(rows, cols, vals, shape[0])
    tv, tc = _pad_rows(cols, rows, vals, shape[1])
    sq_tvals = None
    diag = None
    if with_companions:
        sq_tvals = jnp.asarray(tv * tv, dtype)
        d = np.zeros(min(shape))
        on_diag = rows == cols
        np.add.at(d, rows[on_diag], vals[on_diag])
        diag = jnp.asarray(d, dtype)
    return PaddedOp(jnp.asarray(pv, dtype), jnp.asarray(pc, jnp.int32),
                    jnp.asarray(tv, dtype), jnp.asarray(tc, jnp.int32),
                    tuple(shape), sq_tvals=sq_tvals, diag=diag)


def scale_padded_op(op: PaddedOp, row_scale, col_scale,
                    extra=1.0) -> PaddedOp:
    """diag(row_scale) · M · diag(col_scale) · extra (pattern unchanged)."""
    vals = op.vals * row_scale[:, None] * col_scale[op.cols] * extra
    tvals = op.tvals * col_scale[:, None] * row_scale[op.tcols] * extra
    sq_tvals = tvals * tvals if op.sq_tvals is not None else None
    diag = None
    if op.diag is not None:
        k = op.diag.shape[0]
        diag = op.diag * row_scale[:k] * col_scale[:k] * extra
    return PaddedOp(vals, op.cols, tvals, op.tcols, op.shape,
                    sq_tvals=sq_tvals, diag=diag)


def padded_row_max_abs(op: PaddedOp):
    """Per-row infinity norm (padding values are 0 → harmless)."""
    return jnp.max(jnp.abs(op.vals), axis=1)


def padded_col_max_abs(op: PaddedOp):
    return jnp.max(jnp.abs(op.tvals), axis=1)
