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


@_skip_kernels_on_tpu
def test_tf32_mode_matches_f32_statuses():
    """matmul_precision='tensorfloat32' runs the iteration products as
    3-pass bf16-split dots (~2x the f32 MXU rate on hardware; per-product
    rel err ~4e-6). Termination math stays f32-exact, so statuses must
    agree with the full-f32 engine and solutions must meet the same eps —
    on BOTH shared paths (adaptive leg kernel + fixed single kernel)."""
    B, n, m = 8, 16, 24
    P, q, A, l, u = make_batch(B, n, m, seed=5)
    for adaptive in (True, False):
        kw = dict(verbose=False, eps_abs=1e-5, eps_rel=1e-5,
                  dtype=np.float32, adaptive_rho=adaptive)
        out_f = BatchedSolver(settings=Settings(**kw),
                              kkt_mode="shared").solve(P, q, A, l, u)
        out_t = BatchedSolver(
            settings=Settings(matmul_precision="tensorfloat32", **kw),
            kkt_mode="shared").solve(P, q, A, l, u)
        np.testing.assert_array_equal(np.asarray(out_f.status),
                                      np.asarray(out_t.status))
        assert np.all(np.asarray(out_t.status) == 1)
        # both meet eps; iterates may differ by O(split error x iters)
        np.testing.assert_allclose(np.asarray(out_t.x),
                                   np.asarray(out_f.x), atol=5e-4)


@_skip_kernels_on_tpu
def test_tf32_kernel_split_product_accuracy():
    """The bf16x3 split product must be ~3 decimal digits tighter than a
    plain bf16 product and track the f32 kernel within ~1e-5 relative."""
    from osqp_tpu.ops.shared_iter import admm_iterate_shared
    import jax.numpy as jnp
    rng = np.random.RandomState(3)
    B, n, m, K = 8, 16, 24, 30
    Rinv = rng.randn(n, n).astype(np.float32) / n
    A = rng.randn(m, n).astype(np.float32) / np.sqrt(n)
    rho = np.full(m, 0.3, np.float32)
    args = (jnp.asarray(Rinv), jnp.asarray(A), jnp.asarray(rho),
            jnp.asarray(1.0 / rho),
            jnp.asarray(rng.randn(B, n).astype(np.float32)),
            jnp.asarray(-np.ones((B, m), np.float32)),
            jnp.asarray(np.ones((B, m), np.float32)),
            jnp.zeros((B, n), jnp.float32), jnp.zeros((B, m), jnp.float32),
            jnp.zeros((B, m), jnp.float32), 1e-6, 1.6, K)
    kw = dict(group=8, interpret=jax.default_backend() not in ("tpu", "axon"))
    x_f = np.asarray(admm_iterate_shared(*args, **kw)[0], np.float64)
    x_t = np.asarray(admm_iterate_shared(*args, tf32=True, **kw)[0],
                     np.float64)
    x_b = np.asarray(admm_iterate_shared(*args, lowp=True, **kw)[0],
                     np.float64)
    den = np.abs(x_f).max()
    err_t = np.abs(x_t - x_f).max() / den
    err_b = np.abs(x_b - x_f).max() / den
    assert err_t < 2e-4, err_t
    assert err_t < err_b / 30, (err_t, err_b)


def test_matmul_precision_setting_validation():
    with pytest.raises(ValueError, match="matmul_precision"):
        Settings(matmul_precision="bf16x9")
    with pytest.raises(ValueError, match="requires dtype float32"):
        Settings(matmul_precision="tensorfloat32", dtype=np.float64)
    s = Settings(matmul_precision="TensorFloat32", dtype=np.float32)
    assert s.tf32()
    # not updatable post-setup (static compile parameter, like dtype)
    with pytest.raises(ValueError, match="cannot be updated"):
        s.update_inplace(matmul_precision="float32")
    # dtype=None under x64 resolves f64 -> tf32 silently off
    s2 = Settings(matmul_precision="tensorfloat32")
    assert s2.tf32() == (s2.resolve_dtype() == np.float32)


@_skip_kernels_on_tpu
def test_tf32_family_status_parity():
    """Shared-engine status parity between f32 and tensorfloat32 across the
    conformance problem families (batched: shared P/A, per-lane q): the
    tf32 iterate noise (~4e-6/product) must never flip a status at the f32
    production tolerances."""
    from osqp_tpu import problems as PR
    B = 4
    for fam, gen in sorted(PR.FAMILIES.items()):
        P, q, A, l, u = gen(seed=1)
        rng = np.random.RandomState(7)
        qb = np.stack([q + 0.01 * rng.randn(*q.shape) for _ in range(B)])
        lb = np.broadcast_to(l, (B,) + l.shape).copy()
        ub = np.broadcast_to(u, (B,) + u.shape).copy()
        sts = {}
        for mp in ("float32", "tensorfloat32"):
            s = Settings(verbose=False, eps_abs=1e-3, eps_rel=1e-3,
                         dtype=np.float32, max_iter=20000,
                         matmul_precision=mp)
            out = BatchedSolver(settings=s, kkt_mode="shared").solve(
                P, qb, A, lb, ub)
            sts[mp] = np.asarray(out.status)
        assert np.array_equal(sts["float32"], sts["tensorfloat32"]), (
            fam, sts)
