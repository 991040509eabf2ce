"""Batched and multi-device tests — the capabilities the reference lacks
(SURVEY.md §2.3): vmapped batch solving, batch-axis sharding over an 8-device
mesh, and row-sharded distributed solve of one large QP. Differential oracle:
the single-problem Model path and the NumPy reference engine."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

import scipy.sparse as sp

import osqp_tpu as osqp
from osqp_tpu import problems
from osqp_tpu.batch import BatchedSolver
from osqp_tpu.interface import Model
from osqp_tpu.parallel import batch_mesh
from osqp_tpu.parallel.consensus import ConsensusQP, ShardedQP
from osqp_tpu.settings import Settings
from osqp_tpu.utils.npref import solve_np


def make_batch(B, n, m, seed=0):
    rng = np.random.RandomState(seed)
    M = rng.randn(n, n) / np.sqrt(n)
    P = M.T @ M + 0.1 * np.eye(n)
    A = rng.randn(m, n) / np.sqrt(n)
    q = rng.randn(B, n)
    c = rng.randn(B, m) * 0.1
    w = 1.0 + rng.rand(B, m)
    return P, q, A, c - w, c + w


SETTINGS = Settings(verbose=False, eps_abs=1e-6, eps_rel=1e-6)


def test_batched_matches_single():
    B, n, m = 4, 10, 16
    P, q, A, l, u = make_batch(B, n, m)
    out = BatchedSolver(settings=SETTINGS).solve(P, q, A, l, u)
    assert out.x.shape == (B, n)
    assert np.all(np.asarray(out.status) == 1)
    for i in range(B):
        model = osqp.Model()
        model.setup(P=P, q=q[i], A=A, l=l[i], u=u[i], verbose=False,
                    eps_abs=1e-6, eps_rel=1e-6)
        r = model.solve()
        np.testing.assert_allclose(np.asarray(out.x[i]), r.x, atol=1e-4)
        assert abs(float(out.obj_val[i]) - r.info.obj_val) < 1e-4


def test_batched_matches_npref():
    B, n, m = 3, 8, 12
    P, q, A, l, u = make_batch(B, n, m, seed=4)
    out = BatchedSolver(settings=SETTINGS).solve(P, q, A, l, u)
    for i in range(B):
        x_np, y_np, _, status = solve_np(P, q[i], A, l[i], u[i],
                                         eps_abs=1e-6, eps_rel=1e-6)
        assert status == "Solved"
        np.testing.assert_allclose(np.asarray(out.x[i]), x_np, atol=1e-4)


def test_batched_mixed_statuses():
    # one solvable lane + one primal-infeasible lane terminate independently
    n, m = 2, 2
    P = np.zeros((2, n, n))
    A = np.stack([np.array([[1.0, 0.0], [1.0, 0.0]])] * 2)
    q = np.stack([np.array([1.0, 0.0]), np.array([1.0, 0.0])])
    l = np.stack([np.array([0.0, 0.0]), np.array([1.0, 3.0])])
    u = np.stack([np.array([1.0, 1.0]), np.array([2.0, 4.0])])
    s = Settings(verbose=False, eps_abs=1e-6, eps_rel=1e-6)
    out = BatchedSolver(settings=s).solve(P, q, A, l, u)
    statuses = np.asarray(out.status)
    assert statuses[0] == 1    # Solved
    assert statuses[1] == -3   # Primal_infeasible


def test_batched_sharded_over_mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 cpu devices"
    mesh = batch_mesh(8)
    B, n, m = 16, 8, 12
    P, q, A, l, u = make_batch(B, n, m, seed=1)
    out = BatchedSolver(settings=SETTINGS, mesh=mesh).solve(P, q, A, l, u)
    ref = BatchedSolver(settings=SETTINGS).solve(P, q, A, l, u)
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x),
                               atol=1e-7)
    # outputs actually sharded over the mesh
    assert len(out.x.sharding.device_set) == 8


def test_consensus_row_sharded_matches_single():
    mesh = Mesh(np.array(jax.devices()), ("r",))
    n, m = 12, 32
    rng = np.random.RandomState(3)
    M = rng.randn(n, n)
    P = M.T @ M + 0.1 * np.eye(n)
    q = rng.randn(n)
    A = rng.randn(m, n)
    l = -np.ones(m)
    u = np.ones(m)
    out = ShardedQP(mesh, settings=SETTINGS).solve(P, q, A, l, u)
    assert int(out.status) == 1

    model = osqp.Model()
    model.setup(P=P, q=q, A=A, l=l, u=u, verbose=False,
                eps_abs=1e-6, eps_rel=1e-6)
    r = model.solve()
    np.testing.assert_allclose(np.asarray(out.x), r.x, atol=1e-4)
    assert abs(float(out.obj_val) - r.info.obj_val) < 1e-4


def test_consensus_rejects_indivisible_m():
    mesh = Mesh(np.array(jax.devices()), ("r",))
    with pytest.raises(ValueError):
        ShardedQP(mesh).solve(np.eye(2), np.zeros(2),
                                np.ones((3, 2)), -np.ones(3), np.ones(3))


def test_sharded_alias():
    # pre-0.2 name kept as an alias (the class was never consensus-ADMM)
    assert ConsensusQP is ShardedQP


def test_batched_polish():
    # polish parity on the batched path: status_polish=1 and tighter KKT
    B, n, m = 4, 10, 16
    P, q, A, l, u = make_batch(B, n, m, seed=6)
    s = Settings(verbose=False, eps_abs=1e-3, eps_rel=1e-3, polish=True)
    for mode in ("inverse", "shared"):
        out = BatchedSolver(settings=s, kkt_mode=mode).solve(P, q, A, l, u)
        sp = np.asarray(out.status_polish)
        assert np.all(np.asarray(out.status) == 1)
        assert np.all(sp == 1), (mode, sp)
        for i in range(B):
            stat = np.linalg.norm(
                P @ np.asarray(out.x[i]) + q[i] + A.T @ np.asarray(out.y[i]),
                np.inf)
            assert stat < 1e-6, (mode, i, stat)


def test_shared_mode_over_mesh():
    # shard_map'd shared engine: P/A replicated, lanes split across devices,
    # each device running independently (fixed rho)
    mesh = batch_mesh(8)
    B, n, m = 16, 8, 12
    P, q, A, l, u = make_batch(B, n, m, seed=11)
    s = Settings(verbose=False, eps_abs=1e-5, eps_rel=1e-5,
                 adaptive_rho=False, dtype=np.float32)
    out = BatchedSolver(settings=s, mesh=mesh, kkt_mode="shared").solve(
        P, q, A, l, u)
    ref = BatchedSolver(settings=s, kkt_mode="shared").solve(P, q, A, l, u)
    assert len(out.x.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(out.status),
                                  np.asarray(ref.status))
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x),
                               atol=1e-4)
    # adaptive rho over the mesh: psum-coupled — must match unsharded
    s2 = Settings(verbose=False, eps_abs=1e-5, eps_rel=1e-5,
                  adaptive_rho=True, rho=1e-4, adaptive_rho_interval=25,
                  dtype=np.float32)
    out2 = BatchedSolver(settings=s2, mesh=mesh, kkt_mode="shared").solve(
        P, q, A, l, u)
    ref2 = BatchedSolver(settings=s2, kkt_mode="shared").solve(P, q, A, l, u)
    assert np.asarray(ref2.rho_updates).max() >= 1  # adaptation really ran
    np.testing.assert_array_equal(np.asarray(out2.status),
                                  np.asarray(ref2.status))
    np.testing.assert_array_equal(np.asarray(out2.iter),
                                  np.asarray(ref2.iter))
    np.testing.assert_allclose(np.asarray(out2.x), np.asarray(ref2.x),
                               atol=1e-4)


def test_pad_problems_heterogeneous_sizes():
    from osqp_tpu.batch import pad_problems
    rng = np.random.RandomState(17)
    problems = []
    refs = []
    for (n, m) in [(4, 6), (7, 3), (5, 9)]:
        M = rng.randn(n, n)
        P = M.T @ M + 0.5 * np.eye(n)
        q = rng.randn(n)
        A = rng.randn(m, n)
        l = -1 - rng.rand(m)
        u = 1 + rng.rand(m)
        problems.append((P, q, A, l, u))
        model = osqp.Model()
        model.setup(P=P, q=q, A=A, l=l, u=u, verbose=False,
                    eps_abs=1e-6, eps_rel=1e-6)
        refs.append(model.solve())
    Pb, qb, Ab, lb, ub, sizes = pad_problems(problems)
    out = BatchedSolver(settings=SETTINGS).solve(Pb, qb, Ab, lb, ub)
    for i, (n_i, m_i) in enumerate(sizes):
        assert int(out.status[i]) == 1
        np.testing.assert_allclose(np.asarray(out.x[i, :n_i]),
                                   refs[i].x, atol=1e-4)
        # padded coordinates decouple to zero
        np.testing.assert_allclose(np.asarray(out.x[i, n_i:]), 0.0,
                                   atol=1e-6)


def test_consensus_indirect_linsys():
    # row-sharded + matrix-free CG (settings-driven linsys selection)
    mesh = Mesh(np.array(jax.devices()), ("r",))
    n, m = 10, 24
    rng = np.random.RandomState(6)
    M = rng.randn(n, n)
    P = M.T @ M + 0.5 * np.eye(n)
    q = rng.randn(n)
    A = rng.randn(m, n)
    l = -np.ones(m)
    u = np.ones(m)
    s = Settings(verbose=False, eps_abs=1e-6, eps_rel=1e-6,
                 linsys_solver="indirect")
    out = ShardedQP(mesh, settings=s).solve(P, q, A, l, u)
    assert int(out.status) == 1
    model = osqp.Model()
    model.setup(P=P, q=q, A=A, l=l, u=u, verbose=False,
                eps_abs=1e-6, eps_rel=1e-6)
    np.testing.assert_allclose(np.asarray(out.x), model.solve().x, atol=1e-4)


def test_batched_inverse_mode_float64():
    """The fast explicit-inverse KKT mode is f64-capable: lane-wise agreement
    with the single-problem Model at tight tolerance (machine-precision level
    on well-conditioned problems)."""
    B = 4
    rng = np.random.RandomState(0)
    P, q0, A, l0, u0 = problems.random_qp(n=30, m=45, seed=1)
    q = np.tile(q0, (B, 1)) + 0.1 * rng.randn(B, len(q0))
    l = np.tile(l0, (B, 1))
    u = np.tile(u0, (B, 1))
    bs = BatchedSolver(settings=Settings(verbose=False, eps_abs=1e-6,
                                         eps_rel=1e-6, dtype=np.float64),
                       kkt_mode="inverse")
    out = bs.solve(P, q, A, l, u)
    assert set(np.asarray(out.status).tolist()) == {1}
    for i in range(B):
        m1 = Model()
        m1.setup(P=sp.csc_matrix(P), q=q[i], A=sp.csc_matrix(A),
                 l=l[i], u=u[i], eps_abs=1e-6, eps_rel=1e-6, verbose=False)
        r = m1.solve()
        assert np.max(np.abs(np.asarray(out.x[i]) - r.x)) < 1e-9


def test_shared_compaction_staggered_exits():
    """Lane compaction (live lanes packed into a prefix, finished groups
    skipped in-kernel) must not change any lane's answer. Build a batch
    with a strong difficulty gradient so exits are maximally staggered and
    compare every lane against the single-problem Model path."""
    B, n, m = 512, 8, 12  # 4 groups of 128 -> compaction active
    rng = np.random.RandomState(11)
    M = rng.randn(n, n) / np.sqrt(n)
    P = M.T @ M + 0.1 * np.eye(n)
    A = rng.randn(m, n) / np.sqrt(n)
    q = rng.randn(B, n) * np.logspace(-1, 1.5, B)[:, None]
    c = rng.randn(B, m) * 0.1
    w = 0.5 + rng.rand(B, m)
    l, u = c - w, c + w
    out = BatchedSolver(settings=SETTINGS, kkt_mode="shared").solve(
        P, q, A, l, u)
    st = np.asarray(out.status)
    it = np.asarray(out.iter)
    assert np.all(st == 1)
    assert it.max() > it.min()  # exits actually staggered
    for i in [0, 1, 255, 256, 510, 511]:
        model = Model()
        model.setup(P=P, q=q[i], A=A, l=l[i], u=u[i], verbose=False,
                    eps_abs=1e-6, eps_rel=1e-6)
        r = model.solve()
        np.testing.assert_allclose(np.asarray(out.x)[i], r.x, atol=1e-4)


def test_shared_warm_resolve_rho_carryover():
    """rho0 carry-over (reference persistent-workspace semantics,
    interface.jl:408-440): a warm re-solve from the previous solution with
    the adapted rho must solve every lane in fewer mean iterations."""
    B, n, m = 256, 8, 12
    P, q, A, l, u = make_batch(B, n, m, seed=5)
    solver = BatchedSolver(settings=SETTINGS, kkt_mode="shared")
    out = solver.solve(P, q, A, l, u)
    assert np.all(np.asarray(out.status) == 1)
    q2 = q + 0.01
    out2 = solver.solve(P, q2, A, l, u, x0=np.asarray(out.x),
                        y0=np.asarray(out.y),
                        rho0=np.asarray(out.rho_estimate))
    assert np.all(np.asarray(out2.status) == 1)
    assert np.asarray(out2.iter).mean() < np.asarray(out.iter).mean()


def test_shared_mixed_precision_matches_f32():
    """mixed_precision=True (bf16 early chunks, f32 finish) must reach the
    same statuses and eps-accurate solutions as the all-f32 engine; lane 0
    cross-checked against the single-problem Model path."""
    B, n, m = 256, 8, 12
    P, q, A, l, u = make_batch(B, n, m, seed=7)
    s_mp = Settings(verbose=False, eps_abs=1e-6, eps_rel=1e-6,
                    mixed_precision=True)
    out = BatchedSolver(settings=s_mp, kkt_mode="shared").solve(P, q, A, l, u)
    ref = BatchedSolver(settings=SETTINGS, kkt_mode="shared").solve(
        P, q, A, l, u)
    assert np.all(np.asarray(out.status) == 1)
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x),
                               atol=1e-4)
    model = Model()
    model.setup(P=P, q=q[0], A=A, l=l[0], u=u[0], verbose=False,
                eps_abs=1e-6, eps_rel=1e-6)
    r = model.solve()
    np.testing.assert_allclose(np.asarray(out.x)[0], r.x, atol=1e-4)


def test_shared_mixed_precision_infeasible_lane():
    """Infeasibility certificates are deferred to the f32 phase under
    mixed precision — the infeasible lane must still be detected."""
    n, m = 2, 2
    B = 4
    P = np.zeros((n, n))
    A = np.array([[1.0, 0.0], [1.0, 0.0]])
    q = np.tile(np.array([1.0, 0.0]), (B, 1))
    l = np.tile(np.array([0.0, 0.0]), (B, 1))
    u = np.tile(np.array([1.0, 1.0]), (B, 1))
    l[1] = [1.0, 3.0]   # row bounds incompatible through the shared A row
    u[1] = [2.0, 4.0]
    s_mp = Settings(verbose=False, eps_abs=1e-6, eps_rel=1e-6,
                    mixed_precision=True)
    out = BatchedSolver(settings=s_mp, kkt_mode="shared").solve(P, q, A, l, u)
    st = np.asarray(out.status)
    assert st[0] == 1 and st[2] == 1 and st[3] == 1
    assert st[1] == -3  # Primal_infeasible, found after the phase switch


def test_shared_check_termination_zero_runs_exactly_max_iter():
    """check_termination=0 through the shared leg engine: the kernel never
    classifies (reference semantics: run exactly max_iter), and the rho
    estimate falls back to the XLA residual branch at leg boundaries."""
    B, n, m = 8, 8, 12
    P, q, A, l, u = make_batch(B, n, m, seed=3)
    s = Settings(verbose=False, eps_abs=1e-6, eps_rel=1e-6,
                 check_termination=0, max_iter=130, dtype=np.float64)
    out = BatchedSolver(settings=s, kkt_mode="shared").solve(P, q, A, l, u)
    assert np.all(np.asarray(out.iter) == 130)
    from osqp_tpu import constants as _C
    assert np.all(np.asarray(out.status) == _C.MAX_ITER_REACHED)


def test_shared_accurate_classification_at_max_iter():
    """A lane whose residuals first pass between the last check_termination
    multiple and max_iter must be classified Solved by the final ACCURATE
    check at max_iter (the C core's post-loop check), not downgraded to
    Solved_inaccurate/Max_iter_reached."""
    from osqp_tpu import constants as _C
    B, n, m = 4, 8, 12
    P, q, A, l, u = make_batch(B, n, m, seed=21)
    probe = Settings(verbose=False, eps_abs=1e-6, eps_rel=1e-6,
                     check_termination=1, dtype=np.float64)
    out = BatchedSolver(settings=probe, kkt_mode="shared").solve(P, q, A, l, u)
    k = int(np.asarray(out.iter).max())     # exact slowest convergence iter
    cap = k + 2
    if cap % 30 == 0:
        cap += 1                            # keep max_iter off the cadence
    s = Settings(verbose=False, eps_abs=1e-6, eps_rel=1e-6,
                 check_termination=30, max_iter=cap, dtype=np.float64)
    out2 = BatchedSolver(settings=s, kkt_mode="shared").solve(P, q, A, l, u)
    st = np.asarray(out2.status)
    # every lane converged by cap but the last in-kernel check was at
    # 30*floor(cap/30) < k for at least the slowest lane
    assert np.all((st == _C.SOLVED)), st


def test_batched_update_settings():
    """update_settings parity on the batched engine: UPDATABLE gate +
    no-recompile application through the traced parameter bundle."""
    import pytest
    from osqp_tpu.settings import Settings

    P, q, A, l, u = make_batch(4, 6, 9, seed=2)
    solver = BatchedSolver(settings=Settings(eps_abs=1e-4, eps_rel=1e-4,
                                             verbose=False))
    out0 = solver.solve(P, q, A, l, u)
    assert (np.asarray(out0.status) == 1).all()
    with pytest.raises(ValueError, match="cannot be updated"):
        solver.update_settings(scaling=0)
    solver.update_settings(eps_abs=1e-7, eps_rel=1e-7, max_iter=20000)
    out1 = solver.solve(P, q, A, l, u)
    assert (np.asarray(out1.status) == 1).all()
    assert float(np.asarray(out1.pri_res).max()) <= 1e-6
    assert np.asarray(out1.iter).max() >= np.asarray(out0.iter).max()


def test_batched_sharded_mesh_tf32_matches_single_device():
    """tf32 under shard_map: the stall detector's cross-device pmin and the
    statically-typed two-loop fallback must produce the same statuses as
    the single-device tf32 shared engine."""
    assert len(jax.devices()) == 8, "conftest must force 8 cpu devices"
    mesh = batch_mesh(8)
    B, n, m = 16, 8, 12
    P, q, A, l, u = make_batch(B, n, m, seed=2)
    st = Settings(verbose=False, eps_abs=1e-5, eps_rel=1e-5,
                  dtype=np.float32, matmul_precision="tensorfloat32")
    out = BatchedSolver(settings=st, mesh=mesh,
                        kkt_mode="shared").solve(P, q, A, l, u)
    ref = BatchedSolver(settings=st, kkt_mode="shared").solve(P, q, A, l, u)
    np.testing.assert_array_equal(np.asarray(out.status),
                                  np.asarray(ref.status))
    assert np.all(np.asarray(out.status) == 1)
    # per-device grouping reorders the split-product roundings, so tf32
    # iterates drift more than the f32 mesh test's 1e-7 — both runs meet
    # eps 1e-5 residuals; compare at the solution-accuracy scale
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x),
                               atol=2e-3)
    assert len(out.x.sharding.device_set) == 8
