"""Prepared-workspace (persistent factor) mode of the shared batched engine.

The reference's C workspace persists across update!/solve! cycles — setup
scaling and the KKT factorization are paid once, and the adaptively-tuned
rho carries over (src/interface.jl:408-440). ``BatchedSolver.prepare`` +
``solve_prepared`` are the batched analogue: these tests pin (a) equivalence
with the one-shot path, (b) factor carry-over economics (no rho refactors on
a warm re-solve), and (c) correctness across bounds reclassification, which
must trigger an in-jit refactorization.
"""

import numpy as np
import pytest

import osqp_tpu as osqp
from osqp_tpu import constants as C
from osqp_tpu.batch import BatchedSolver
from osqp_tpu.settings import Settings


def _batch(B=32, n=16, m=24, seed=0):
    rng = np.random.RandomState(seed)
    M = rng.randn(n, n) / np.sqrt(n)
    P = M.T @ M + 0.1 * np.eye(n)
    A = rng.randn(m, n) / np.sqrt(n)
    q = rng.randn(B, n)
    center = 0.1 * rng.randn(B, m)
    width = 1.0 + rng.rand(B, m)
    return P, q, A, center - width, center + width


def _settings(**kw):
    kw.setdefault("eps_abs", 1e-5)
    kw.setdefault("eps_rel", 1e-5)
    kw.setdefault("verbose", False)
    kw.setdefault("dtype", np.float64)
    return Settings(**kw)


def test_prepared_matches_one_shot():
    P, q, A, l, u = _batch()
    s1 = BatchedSolver(settings=_settings(), kkt_mode="shared")
    ref = s1.solve(P, q, A, l, u)
    s2 = BatchedSolver(settings=_settings(), kkt_mode="shared")
    out = s2.prepare(P, A, q=q).solve_prepared(q, l, u)
    np.testing.assert_array_equal(np.asarray(out.status),
                                  np.asarray(ref.status))
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out.obj_val),
                               np.asarray(ref.obj_val), rtol=1e-8, atol=1e-9)


def test_prepared_warm_cycle_carries_factor():
    P, q, A, l, u = _batch(seed=3)
    solver = BatchedSolver(settings=_settings(), kkt_mode="shared")
    solver.prepare(P, A, q=q)
    cold = solver.solve_prepared(q, l, u)
    assert np.all(np.asarray(cold.status) == C.SOLVED)

    rng = np.random.RandomState(9)
    q2 = q + 0.01 * rng.randn(*q.shape)
    warm = solver.solve_prepared(q2, l, u, x0=np.asarray(cold.x),
                                 y0=np.asarray(cold.y))
    assert np.all(np.asarray(warm.status) == C.SOLVED)
    # factor carried over: the warm re-solve needs no rho refactorization
    assert int(np.asarray(warm.rho_updates)[0]) == 0
    # and far fewer iterations than the cold pass
    assert np.asarray(warm.iter).mean() < 0.7 * np.asarray(cold.iter).mean()

    # solution parity vs a fresh one-shot solve of the same problem (both
    # converged to eps=1e-5 along different ADMM paths, so compare at the
    # accuracy that tolerance actually guarantees)
    ref = BatchedSolver(settings=_settings(), kkt_mode="shared").solve(
        P, q2, A, l, u)
    np.testing.assert_allclose(np.asarray(warm.x), np.asarray(ref.x),
                               rtol=1e-3, atol=1e-4)


def test_prepared_bounds_reclassification_refactors():
    P, q, A, l, u = _batch(B=8, seed=5)
    solver = BatchedSolver(settings=_settings(), kkt_mode="shared")
    solver.prepare(P, A, q=q)
    out1 = solver.solve_prepared(q, l, u)
    assert np.all(np.asarray(out1.status) == C.SOLVED)

    # turn the first four rows into equalities in every lane: the loose/eq
    # classification changes, so the cached rho_vec no longer matches and
    # the engine must refactorize in-jit — solutions must stay correct
    l2, u2 = l.copy(), u.copy()
    mid = 0.5 * (l2[:, :4] + u2[:, :4])
    l2[:, :4] = mid
    u2[:, :4] = mid
    out2 = solver.solve_prepared(q, l2, u2)
    ref = BatchedSolver(settings=_settings(), kkt_mode="shared").solve(
        P, q, A, l2, u2)
    np.testing.assert_array_equal(np.asarray(out2.status),
                                  np.asarray(ref.status))
    np.testing.assert_allclose(np.asarray(out2.x), np.asarray(ref.x),
                               rtol=1e-4, atol=1e-5)


def test_prepared_fixed_rho_kernel_path():
    P, q, A, l, u = _batch(seed=7)
    st = _settings(adaptive_rho=False, dtype=np.float32, eps_abs=1e-3,
                   eps_rel=1e-3)
    solver = BatchedSolver(settings=st, kkt_mode="shared")
    solver.prepare(P, A, q=q)
    out = solver.solve_prepared(q, l, u)
    ref = BatchedSolver(settings=st, kkt_mode="shared").solve(P, q, A, l, u)
    np.testing.assert_array_equal(np.asarray(out.status),
                                  np.asarray(ref.status))
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x),
                               rtol=1e-4, atol=1e-4)


def test_prepared_rho0_override():
    P, q, A, l, u = _batch(seed=11)
    solver = BatchedSolver(settings=_settings(), kkt_mode="shared")
    solver.prepare(P, A, q=q)
    out1 = solver.solve_prepared(q, l, u)
    rho_ad = float(np.asarray(out1.rho_estimate)[0])
    out2 = solver.solve_prepared(q, l, u, x0=np.asarray(out1.x),
                                 y0=np.asarray(out1.y), rho0=rho_ad)
    assert np.all(np.asarray(out2.status) == C.SOLVED)


def test_update_settings_rho_reaches_prepared_solve():
    """Round-3 advisor fix: ``update_settings(rho=...)`` on a prepared
    solver must reset the carried factor so the next ``solve_prepared``
    refactors at the new rho (reference osqp_update_rho semantics,
    interface.jl:540-556) — with adaptive_rho off, the trajectory must
    equal a fresh solver constructed with that rho."""
    P, q, A, l, u = _batch(seed=19)
    st = _settings(adaptive_rho=False)
    solver = BatchedSolver(settings=st, kkt_mode="shared")
    solver.prepare(P, A, q=q)
    out1 = solver.solve_prepared(q, l, u)
    assert np.all(np.asarray(out1.status) == C.SOLVED)

    solver.update_settings(rho=2.5)
    out2 = solver.solve_prepared(q, l, u)

    ref = BatchedSolver(settings=_settings(adaptive_rho=False, rho=2.5),
                        kkt_mode="shared")
    ref.prepare(P, A, q=q)
    out_ref = ref.solve_prepared(q, l, u)
    # same rho => identical iteration counts and solutions
    np.testing.assert_array_equal(np.asarray(out2.iter),
                                  np.asarray(out_ref.iter))
    np.testing.assert_allclose(np.asarray(out2.x), np.asarray(out_ref.x),
                               rtol=1e-9, atol=1e-10)
    # and the rho change is real: different rho => different trajectory
    assert not np.array_equal(np.asarray(out1.iter), np.asarray(out2.iter)) \
        or not np.allclose(np.asarray(out1.x), np.asarray(out2.x),
                           rtol=1e-12, atol=0)


def test_prepared_guards():
    P, q, A, l, u = _batch(B=4)
    with pytest.raises(ValueError, match="shared"):
        BatchedSolver(settings=_settings()).prepare(P, A)
    s = BatchedSolver(settings=_settings(), kkt_mode="shared")
    with pytest.raises(RuntimeError, match="prepare"):
        s.solve_prepared(q, l, u)


def test_prepared_with_polish():
    P, q, A, l, u = _batch(B=8, seed=13)
    st = _settings(polish=True)
    solver = BatchedSolver(settings=st, kkt_mode="shared")
    solver.prepare(P, A, q=q)
    out = solver.solve_prepared(q, l, u)
    assert np.all(np.asarray(out.status) == C.SOLVED)
    assert np.asarray(out.status_polish).min() >= 0


def test_rollout_matches_host_loop():
    """solve_rollout (the on-device closed-loop scan) must reproduce the
    solve_prepared host loop exactly: same statuses, iterations, and
    iterates at every step, with warm starts and the adapted factor carried
    identically."""
    import jax.numpy as jnp
    P, q, A, l, u = _batch(B=8)
    B, n = q.shape
    key = jnp.asarray(np.random.RandomState(7).randn(n) * 0.01)

    def step(x, qlu, k):
        qk, lk, uk = qlu
        return qk + key, lk, uk

    s1 = BatchedSolver(settings=_settings(), kkt_mode="shared").prepare(
        P, A, q=q)
    out = s1.solve_rollout(q, l, u, step, n_steps=4, keep_xs=True)
    assert np.asarray(out["status"]).shape == (4, B)
    assert np.all(np.asarray(out["status"]) == C.SOLVED)

    s2 = BatchedSolver(settings=_settings(), kkt_mode="shared").prepare(
        P, A, q=q)
    qk = jnp.asarray(q)
    xk = yk = None
    for k in range(4):
        o = s2.solve_prepared(qk, l, u, x0=xk, y0=yk)
        np.testing.assert_allclose(np.asarray(out["xs"][k]),
                                   np.asarray(o.x), rtol=0, atol=0)
        assert np.all(np.asarray(out["iter"][k]) == np.asarray(o.iter))
        xk, yk = o.x, o.y
        qk = qk + key
    np.testing.assert_array_equal(np.asarray(out["x"]), np.asarray(xk))


def test_rollout_requires_prepare():
    s = BatchedSolver(settings=_settings(), kkt_mode="shared")
    with pytest.raises(RuntimeError, match="prepare"):
        s.solve_rollout(np.zeros((4, 8)), np.zeros((4, 12)),
                        np.ones((4, 12)), lambda x, qlu, k: qlu, 2)
