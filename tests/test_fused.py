"""Fused Pallas iteration kernel: differential vs the XLA batched engine.

On CPU the kernel runs in interpreter mode; trajectories must match the XLA
loop exactly (same check/rho cadence), so solutions AND iteration counts are
compared. Small shapes keep interpreter time low.
"""

import numpy as np

import jax
import pytest

from osqp_tpu.batch import BatchedSolver
from osqp_tpu.settings import Settings

#: Pallas kernels cannot lower AT ALL under the global jax_enable_x64 flag
#: on this TPU runtime (even a trivial f32 copy kernel fails Mosaic's
#: func.func legalization), and Mosaic has no f64 kernels regardless — the
#: kernel differential tests run the real kernels on hardware only in a
#: non-x64 process (bench.py and the f32 production path); under the f64
#: conformance configuration they run in CPU interpret mode.
_skip_kernels_on_tpu = pytest.mark.skipif(
    jax.default_backend() in ("tpu", "axon"),
    reason="Pallas cannot lower under global x64 on this TPU runtime")
_skip_f64_on_tpu = _skip_kernels_on_tpu


def make_batch(B, n, m, seed=0):
    rng = np.random.RandomState(seed)
    M = rng.randn(n, n) / np.sqrt(n)
    P = M.T @ M + 0.1 * np.eye(n)
    A = rng.randn(m, n) / np.sqrt(n)
    q = rng.randn(B, n)
    c = rng.randn(B, m) * 0.1
    w = 1.0 + rng.rand(B, m)
    return P, q, A, c - w, c + w


@_skip_f64_on_tpu
def test_fused_matches_xla_loop():
    B, n, m = 3, 8, 16
    P, q, A, l, u = make_batch(B, n, m)
    s = Settings(verbose=False, eps_abs=1e-5, eps_rel=1e-5,
                 dtype=np.float64)
    out_x = BatchedSolver(settings=s, kkt_mode="inverse").solve(P, q, A, l, u)
    out_f = BatchedSolver(settings=s, kkt_mode="fused").solve(P, q, A, l, u)
    np.testing.assert_array_equal(np.asarray(out_x.status),
                                  np.asarray(out_f.status))
    np.testing.assert_array_equal(np.asarray(out_x.iter),
                                  np.asarray(out_f.iter))
    np.testing.assert_allclose(np.asarray(out_x.x), np.asarray(out_f.x),
                               atol=1e-9)


@_skip_f64_on_tpu
def test_fused_with_adaptive_rho_trigger():
    # force a rho refactor inside the fused loop (interval = one chunk)
    B, n, m = 2, 8, 12
    P, q, A, l, u = make_batch(B, n, m, seed=2)
    s = Settings(verbose=False, eps_abs=1e-6, eps_rel=1e-6,
                 adaptive_rho=True, adaptive_rho_interval=25,
                 check_termination=25, rho=1e-4, dtype=np.float64)
    out_x = BatchedSolver(settings=s, kkt_mode="inverse").solve(P, q, A, l, u)
    out_f = BatchedSolver(settings=s, kkt_mode="fused").solve(P, q, A, l, u)
    assert np.asarray(out_x.rho_updates).max() >= 1  # refactor actually ran
    np.testing.assert_array_equal(np.asarray(out_x.iter),
                                  np.asarray(out_f.iter))
    np.testing.assert_allclose(np.asarray(out_x.x), np.asarray(out_f.x),
                               atol=1e-9)


@_skip_kernels_on_tpu
def test_shared_structure_engine():
    # shared-P/A fast path: one factorization for the batch, fused GEMM kernel
    B, n, m = 4, 8, 16
    P, q, A, l, u = make_batch(B, n, m, seed=5)
    s = Settings(verbose=False, eps_abs=1e-5, eps_rel=1e-5,
                 dtype=np.float32)
    o_ref = BatchedSolver(settings=s, kkt_mode="inverse").solve(P, q, A, l, u)
    o_sh = BatchedSolver(settings=s, kkt_mode="shared").solve(P, q, A, l, u)
    np.testing.assert_array_equal(np.asarray(o_ref.status),
                                  np.asarray(o_sh.status))
    np.testing.assert_allclose(np.asarray(o_ref.x), np.asarray(o_sh.x),
                               atol=1e-3)


def test_shared_requires_2d():
    import pytest
    B, n, m = 2, 4, 6
    P, q, A, l, u = make_batch(B, n, m)
    s = Settings(verbose=False)
    solver = BatchedSolver(settings=s, kkt_mode="shared")
    with pytest.raises(ValueError):
        solver.solve(np.broadcast_to(P, (B, n, n)), q,
                     np.broadcast_to(A, (B, m, n)), l, u)


@_skip_kernels_on_tpu
def test_fixed_rho_full_kernel_matches_epoch():
    # adaptive_rho=False routes to the single-kernel full-solve path; must
    # match the epoch engine exactly (same check cadence, same freezing)
    B, n, m = 4, 8, 16
    P, q, A, l, u = make_batch(B, n, m, seed=8)
    s = Settings(verbose=False, eps_abs=1e-5, eps_rel=1e-5,
                 adaptive_rho=False, dtype=np.float32)
    s2 = Settings(verbose=False, eps_abs=1e-5, eps_rel=1e-5,
                  adaptive_rho=True, dtype=np.float32)
    out_fixed = BatchedSolver(settings=s, kkt_mode="shared").solve(P, q, A, l, u)
    out_ref = BatchedSolver(settings=s2, kkt_mode="shared").solve(P, q, A, l, u)
    assert np.asarray(out_ref.rho_updates).max() == 0  # same rho trajectory
    np.testing.assert_array_equal(np.asarray(out_fixed.status),
                                  np.asarray(out_ref.status))
    np.testing.assert_array_equal(np.asarray(out_fixed.iter),
                                  np.asarray(out_ref.iter))
    np.testing.assert_allclose(np.asarray(out_fixed.x),
                               np.asarray(out_ref.x), atol=1e-5)
