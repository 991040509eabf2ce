"""Block-tridiagonal (MPC-structured) direct engine tests.

The structured path is the middle ground the round-1 verdict asked for
(SURVEY.md §7 step 9 "blocked LDL/Cholesky"): problems whose reduced KKT is
block-tridiagonal in stage variables. Correctness is anchored two ways:
the factor itself against dense numpy linear algebra, and full solves
against the dense reference engine on the control family
(reference scenarios: OSQP paper §8 'control'; statuses constants.jl:9-21).
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

import osqp_tpu as osqp
from osqp_tpu import constants as C
from osqp_tpu.problems import control_qp
from osqp_tpu.structured import (
    BandedData, BlockTridiagSolver, banded_from_scipy, blocktri_factor,
    blocktri_solve, _ax, _aty, _px, _banded_normal_blocks,
)


def _control(nx=6, nu=3, T=8, seed=0):
    P, q, A, l, u = control_qp(nx=nx, nu=nu, T=T, seed=seed)
    return P, q, A, l, u, nx + nu


def _banded_data(P, A, b):
    Pd, Pe, arow, br, T, _ = banded_from_scipy(
        sp.csc_matrix(P), sp.csc_matrix(A), b)
    return BandedData(Pd=jnp.asarray(Pd), Pe=jnp.asarray(Pe),
                      arow=jnp.asarray(arow), br=jnp.asarray(br, jnp.int32))


def test_banded_operators_match_dense():
    P, q, A, l, u, b = _control(seed=3)
    n, m = P.shape[0], A.shape[0]
    data = _banded_data(P, A, b)
    rng = np.random.RandomState(0)
    x = rng.randn(n)
    w = rng.randn(m)
    xb = jnp.asarray(x.reshape(-1, b))
    np.testing.assert_allclose(np.asarray(_ax(data, xb)), A @ x, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(_aty(data, jnp.asarray(w))).ravel(), A.T @ w, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(_px(data, xb)).ravel(), P @ x, atol=1e-12)


def test_normal_blocks_and_factor_match_dense():
    P, q, A, l, u, b = _control(seed=1)
    n, m = P.shape[0], A.shape[0]
    data = _banded_data(P, A, b)
    rng = np.random.RandomState(1)
    rho = np.exp(rng.randn(m))
    sigma = 1e-6
    Dblk, Eblk = _banded_normal_blocks(data, jnp.asarray(rho), sigma)
    R = P + sigma * np.eye(n) + A.T @ np.diag(rho) @ A
    T = n // b
    for t in range(T):
        np.testing.assert_allclose(
            np.asarray(Dblk[t]), R[t * b:(t + 1) * b, t * b:(t + 1) * b],
            atol=1e-10)
    for t in range(T - 1):
        np.testing.assert_allclose(
            np.asarray(Eblk[t]),
            R[(t + 1) * b:(t + 2) * b, t * b:(t + 1) * b], atol=1e-10)

    L, F = blocktri_factor(Dblk, Eblk)
    rhs = rng.randn(n)
    x = blocktri_solve(L, F, jnp.asarray(rhs.reshape(T, b)))
    np.testing.assert_allclose(np.asarray(x).ravel(),
                               np.linalg.solve(R, rhs), rtol=1e-8, atol=1e-8)
    # batched rhs path (vmapped scans)
    rhs3 = rng.randn(5, T, b)
    xs = blocktri_solve(L, F, jnp.asarray(rhs3))
    ref = np.linalg.solve(R, rhs3.reshape(5, n).T).T
    np.testing.assert_allclose(np.asarray(xs).reshape(5, n), ref,
                               rtol=1e-8, atol=1e-8)


def test_structure_validation_errors():
    P, q, A, l, u, b = _control()
    with pytest.raises(ValueError, match="multiple of block"):
        banded_from_scipy(sp.csc_matrix(P), sp.csc_matrix(A), b + 1)
    # a dense A row spanning all stages is not banded
    Abad = np.asarray(sp.csc_matrix(A).todense())
    Abad[0, :] = 1.0
    with pytest.raises(ValueError, match="at most two consecutive"):
        banded_from_scipy(sp.csc_matrix(P), sp.csc_matrix(Abad), b)
    # P with far-off-diagonal block
    Pbad = P.copy()
    Pbad[0, -1] = Pbad[-1, 0] = 0.5
    with pytest.raises(ValueError, match="block-tridiagonal"):
        banded_from_scipy(sp.csc_matrix(Pbad), sp.csc_matrix(A), b)


def _kkt_violation(P, q, A, l, u, x, y):
    stat = np.linalg.norm(P @ x + q + A.T @ y, np.inf)
    Ax = A @ x
    feas = max(np.max(Ax - np.minimum(u, 1e25), initial=0.0),
               np.max(np.maximum(l, -1e25) - Ax, initial=0.0))
    return max(stat, feas)


def test_solve_matches_dense_model():
    P, q, A, l, u, b = _control(nx=6, nu=3, T=8, seed=0)
    solver = BlockTridiagSolver().setup(
        P=sp.csc_matrix(P), A=sp.csc_matrix(A), block=b,
        eps_abs=1e-8, eps_rel=1e-8, max_iter=20000, verbose=False)
    out = solver.solve(q, l, u)
    assert int(out["status"][0]) == C.SOLVED

    model = osqp.Model()
    model.setup(P=P, q=q, A=A, l=l, u=u, eps_abs=1e-8, eps_rel=1e-8,
                max_iter=20000, verbose=False)
    ref = model.solve()
    assert ref.info.status == "Solved"
    x = np.asarray(out["x"][0])
    np.testing.assert_allclose(x, ref.x, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(out["obj_val"][0]), ref.info.obj_val,
                               rtol=1e-6, atol=1e-8)
    assert _kkt_violation(P, q, A, l, u, x, np.asarray(out["y"][0])) < 1e-5


def test_batched_lanes_match_per_lane_dense():
    P, q, A, l, u, b = _control(nx=4, nu=2, T=6, seed=2)
    rng = np.random.RandomState(7)
    B = 4
    qs = q[None, :] + 0.3 * rng.randn(B, q.shape[0])
    solver = BlockTridiagSolver().setup(
        P=sp.csc_matrix(P), A=sp.csc_matrix(A), block=b,
        eps_abs=1e-8, eps_rel=1e-8, max_iter=20000, verbose=False)
    out = solver.solve(qs, np.tile(l, (B, 1)), np.tile(u, (B, 1)))
    for i in range(B):
        assert int(out["status"][i]) == C.SOLVED
        model = osqp.Model()
        model.setup(P=P, q=qs[i], A=A, l=l, u=u, eps_abs=1e-8, eps_rel=1e-8,
                    max_iter=20000, verbose=False)
        ref = model.solve()
        np.testing.assert_allclose(np.asarray(out["x"][i]), ref.x,
                                   rtol=1e-4, atol=1e-5)


def test_warm_start_cuts_iterations():
    P, q, A, l, u, b = _control(nx=6, nu=3, T=8, seed=4)
    solver = BlockTridiagSolver().setup(
        P=sp.csc_matrix(P), A=sp.csc_matrix(A), block=b,
        eps_abs=1e-6, eps_rel=1e-6, max_iter=20000, verbose=False)
    cold = solver.solve(q, l, u)
    assert int(cold["status"][0]) == C.SOLVED
    q2 = q + 1e-3 * np.random.RandomState(5).randn(q.shape[0])
    warm = solver.solve(q2, l, u, x0=np.asarray(cold["x"]),
                        y0=np.asarray(cold["y"]),
                        rho0=float(cold["rho_estimate"][0]))
    assert int(warm["status"][0]) == C.SOLVED
    cold2 = solver.solve(q2, l, u)
    assert int(warm["iter"][0]) <= int(cold2["iter"][0])


def test_persistent_factor_reuse_matches_fresh():
    """The carried TFactor (structured.py::TFactor) must be semantically
    invisible: a re-solve on a solver whose factor cache is warm gives the
    same answer as a fresh solver, both when the cached rho_vec is reused
    bit-for-bit and when an explicit rho0 override forces an in-jit
    refactorization."""
    P, q, A, l, u, b = _control(nx=5, nu=2, T=6, seed=9)
    kw = dict(eps_abs=1e-8, eps_rel=1e-8, max_iter=20000, verbose=False)
    warmed = BlockTridiagSolver().setup(
        P=sp.csc_matrix(P), A=sp.csc_matrix(A), block=b, **kw)
    warmed.solve(q, l, u)
    assert warmed._factor is not None
    q2 = q + 0.1 * np.random.RandomState(1).randn(q.shape[0])

    out_cached = warmed.solve(q2, l, u)                    # reuse path
    fresh = BlockTridiagSolver().setup(
        P=sp.csc_matrix(P), A=sp.csc_matrix(A), block=b, **kw)
    out_fresh = fresh.solve(q2, l, u)
    assert int(out_cached["status"][0]) == C.SOLVED
    np.testing.assert_allclose(np.asarray(out_cached["x"]),
                               np.asarray(out_fresh["x"]),
                               rtol=1e-6, atol=1e-8)
    # the cache also carries the ADAPTED rho (reference workspace
    # semantics) — the warmed solver may converge in fewer iterations
    # than the default-rho fresh one, never more
    assert int(out_cached["iter"][0]) <= int(out_fresh["iter"][0])

    out_rho = warmed.solve(q2, l, u, rho0=0.9)             # refactor path
    fresh2 = BlockTridiagSolver().setup(
        P=sp.csc_matrix(P), A=sp.csc_matrix(A), block=b, **kw)
    out_rho_fresh = fresh2.solve(q2, l, u, rho0=0.9)
    assert int(out_rho["status"][0]) == C.SOLVED
    np.testing.assert_allclose(np.asarray(out_rho["x"]),
                               np.asarray(out_rho_fresh["x"]),
                               rtol=1e-6, atol=1e-8)
    assert int(out_rho["iter"][0]) == int(out_rho_fresh["iter"][0])


def test_cr_and_scan_kkt_solvers_agree():
    """The block-cyclic-reduction factorization (structured.py::cr_factor,
    O(log T) depth) and the scan block-Cholesky recurrence must produce the
    same solver behavior: same statuses, same iteration counts, solutions
    equal to tight tolerance."""
    P, q, A, l, u, b = _control(nx=6, nu=3, T=11, seed=12)  # odd T: padding
    kw = dict(eps_abs=1e-8, eps_rel=1e-8, max_iter=20000, verbose=False)
    out = {}
    for mode in ("cr", "scan"):
        s_ = BlockTridiagSolver().setup(
            P=sp.csc_matrix(P), A=sp.csc_matrix(A), block=b,
            kkt_solver=mode, **kw)
        out[mode] = s_.solve(q, l, u)
    assert int(out["cr"]["status"][0]) == C.SOLVED
    assert int(out["cr"]["status"][0]) == int(out["scan"]["status"][0])
    assert int(out["cr"]["iter"][0]) == int(out["scan"]["iter"][0])
    np.testing.assert_allclose(np.asarray(out["cr"]["x"]),
                               np.asarray(out["scan"]["x"]),
                               rtol=1e-7, atol=1e-9)


def test_structured_batch_sharded_over_mesh():
    """BlockTridiagSolver(mesh=...) shards the lane batch over a device
    mesh; results must match the unsharded solver exactly (the shared-rho
    aggregation lowers to a psum under GSPMD, so every device takes the
    same rho decisions)."""
    import jax
    from jax.sharding import Mesh
    P, q, A, l, u, b = _control(nx=5, nu=2, T=8, seed=3)
    mesh = Mesh(np.array(jax.devices()), ("b",))
    B = 2 * len(jax.devices())
    rng = np.random.RandomState(0)
    qs = q[None] + 0.2 * rng.randn(B, q.shape[0])
    lt, ut = np.tile(l, (B, 1)), np.tile(u, (B, 1))
    kw = dict(eps_abs=1e-6, eps_rel=1e-6, verbose=False)
    out = BlockTridiagSolver(mesh=mesh).setup(
        P=sp.csc_matrix(P), A=sp.csc_matrix(A), block=b, **kw).solve(
        qs, lt, ut)
    assert len(out["x"].sharding.device_set) == len(jax.devices())
    ref = BlockTridiagSolver().setup(
        P=sp.csc_matrix(P), A=sp.csc_matrix(A), block=b, **kw).solve(
        qs, lt, ut)
    assert np.all(np.asarray(out["status"]) == C.SOLVED)
    np.testing.assert_allclose(np.asarray(out["x"]), np.asarray(ref["x"]),
                               rtol=1e-7, atol=1e-9)


def test_structured_rollout_matches_host_loop():
    """solve_rollout on the structured engine must reproduce the
    solve() host loop (warm starts + factor carried identically)."""
    import jax.numpy as jnp
    P, q, A, l, u, b = _control(nx=4, nu=2, T=6, seed=0)
    n = P.shape[0]
    kw = dict(eps_abs=1e-6, eps_rel=1e-6, verbose=False)
    key = jnp.asarray(0.002 * np.random.RandomState(1).randn(n))

    def step(x, qlu, k):
        qk, lk, uk = qlu
        return qk + key, lk, uk

    st = BlockTridiagSolver().setup(P=sp.csc_matrix(P), A=sp.csc_matrix(A),
                                    block=b, **kw)
    out = st.solve_rollout(q, l, u, step, n_steps=5, keep_xs=True)
    assert np.all(np.asarray(out["status"]) == C.SOLVED)

    st2 = BlockTridiagSolver().setup(P=sp.csc_matrix(P), A=sp.csc_matrix(A),
                                     block=b, **kw)
    qk = jnp.asarray(q[None, :])
    xk = yk = None
    for k in range(5):
        o = st2.solve(np.asarray(qk), l, u,
                      x0=None if xk is None else np.asarray(xk),
                      y0=None if yk is None else np.asarray(yk))
        assert np.all(np.asarray(out["iter"][k]) == np.asarray(o["iter"]))
        xk, yk = o["x"], o["y"]
        qk = qk + key
    np.testing.assert_allclose(np.asarray(out["x"]), np.asarray(xk),
                               rtol=1e-10, atol=1e-12)


# ---------------------------------------------------------------------------
# Round-3 status-contract parity: infeasibility certificates, time_limit,
# polish, per-lane classification semantics
# (reference: src/interface.jl:198-205, constants.jl:17-18,
#  test/primal_infeasibility.jl, test/dual_infeasibility.jl,
#  test/polishing.jl:15-93)
# ---------------------------------------------------------------------------

def test_structured_primal_infeasible_certificate():
    """Contradictory duplicated row (primal_infeasibility.jl pattern) on a
    block=2 problem must return Primal_infeasible with a valid Farkas
    certificate, within a few check intervals — not Max_iter_reached."""
    P = sp.eye(4).tocsc()
    A = sp.csc_matrix(np.array([
        [1., 1., 0., 0.],
        [1., 1., 0., 0.],
        [0., 0., 1., 0.],
        [0., 0., 0., 1.],
    ]))
    l = np.array([-np.inf, 1.0, -1., -1.])
    u = np.array([-1.0, np.inf, 1., 1.])
    slv = BlockTridiagSolver().setup(P=P, A=A, block=2,
                                     eps_abs=1e-6, eps_rel=1e-6)
    out = slv.solve(np.zeros(4), l, u)
    assert int(np.asarray(out["status"])[0]) == C.PRIMAL_INFEASIBLE
    assert int(np.asarray(out["iter"])[0]) <= 100
    # Farkas validity: ||A' dy|| ~ 0 and u'(dy)+ + l'(dy)- < 0 (finite part)
    dy = np.asarray(out["prim_cert"])[0]
    assert np.all(np.isfinite(dy))
    assert np.abs(np.asarray(A.T @ dy)).max() < 1e-6
    fin_u, fin_l = np.isfinite(u), np.isfinite(l)
    lhs = (u[fin_u] @ np.maximum(dy, 0)[fin_u]
           + l[fin_l] @ np.minimum(dy, 0)[fin_l])
    assert lhs < -1e-6
    # NaN-fill convention (interface.jl:184-210)
    assert np.isnan(np.asarray(out["x"])).all()
    assert np.asarray(out["obj_val"])[0] == np.inf


def test_structured_dual_infeasible_certificate():
    """Unbounded banded QP -> Dual_infeasible with recession-direction
    certificate (dual_infeasibility.jl semantics)."""
    P = sp.diags([4.0, 0.0, 1.0, 1.0]).tocsc()
    q = np.array([0.0, 2.0, 0.0, 0.0])
    A = sp.csc_matrix(np.array([
        [1., 1., 0., 0.],
        [-1., 1., 0., 0.],
        [0., 0., 1., 1.],
        [0., 0., 1., -1.],
    ]))
    u = np.array([2., 3., 1., 1.])
    l = -np.inf * np.ones(4)
    slv = BlockTridiagSolver().setup(
        P=P, A=A, block=2, eps_abs=1e-5, eps_rel=1e-5,
        eps_prim_inf=1e-15, check_termination=1)
    out = slv.solve(q, l, u)
    assert int(np.asarray(out["status"])[0]) == C.DUAL_INFEASIBLE
    dx = np.asarray(out["dual_cert"])[0]
    assert np.all(np.isfinite(dx))
    assert q @ dx < -1e-6                      # descent direction
    Pd = np.asarray(P.todense())
    assert np.abs(Pd @ dx).max() < 1e-6        # null direction of P
    assert np.all(np.asarray(A @ dx) <= 1e-6)  # recession: u finite rows
    assert np.asarray(out["obj_val"])[0] == -np.inf


def test_structured_mixed_lane_statuses():
    """One infeasible lane and one solvable lane in the same batch: the
    solvable lane's result must be unaffected by the infeasible one."""
    P = sp.eye(4).tocsc()
    A = sp.csc_matrix(np.array([
        [1., 1., 0., 0.],
        [1., 1., 0., 0.],
        [0., 0., 1., 0.],
        [0., 0., 0., 1.],
    ]))
    q = np.zeros((2, 4))
    q[1] = np.array([1., -2., 0.5, 0.])
    l = np.array([[-np.inf, 1.0, -1., -1.],     # contradictory with u[0]
                  [-3.0, -3.0, -1., -1.]])
    u = np.array([[-1.0, np.inf, 1., 1.],
                  [3.0, 3.0, 1., 1.]])
    slv = BlockTridiagSolver().setup(P=P, A=A, block=2,
                                     eps_abs=1e-8, eps_rel=1e-8)
    out = slv.solve(q, l, u)
    st = np.asarray(out["status"])
    assert st[0] == C.PRIMAL_INFEASIBLE
    assert st[1] == C.SOLVED
    # lane 1 vs the dense reference engine, solved alone
    model = osqp.Model()
    model.setup(P=np.asarray(P.todense()), q=q[1],
                A=np.asarray(A.todense()), l=l[1], u=u[1],
                eps_abs=1e-8, eps_rel=1e-8, verbose=False)
    ref = model.solve()
    np.testing.assert_allclose(np.asarray(out["x"])[1], ref.x,
                               rtol=1e-5, atol=1e-6)


def test_structured_time_limit():
    """Chunked host driver maps wall-clock expiry to Time_limit_reached
    (constants.jl:18) with unreachable tolerances."""
    rng = np.random.default_rng(0)
    n, b = 40, 4
    P = sp.block_diag([np.eye(b) * 1e-4 for _ in range(n // b)]).tocsc()
    A = sp.eye(n).tocsc()
    slv = BlockTridiagSolver().setup(
        P=P, A=A, block=b, max_iter=2_000_000, eps_abs=1e-30, eps_rel=0.0,
        check_termination=25, time_limit=0.3)
    out = slv.solve(rng.normal(size=n), -np.ones(n), np.ones(n))
    assert int(np.asarray(out["status"])[0]) == C.TIME_LIMIT_REACHED


def test_structured_polish():
    """Banded active-set polish: status_polish=1 on Solved lanes and both
    residuals strictly improved (polishing.jl:15-93 acceptance rule)."""
    P, q, A, l, u, b = _control(nx=4, nu=2, T=6, seed=2)
    kw = dict(eps_abs=1e-5, eps_rel=1e-5, verbose=False)
    base = BlockTridiagSolver().setup(P=sp.csc_matrix(P), A=sp.csc_matrix(A),
                                      block=b, **kw)
    out0 = base.solve(q, l, u)
    pol = BlockTridiagSolver().setup(P=sp.csc_matrix(P), A=sp.csc_matrix(A),
                                     block=b, polish=True, **kw)
    out1 = pol.solve(q, l, u)
    assert int(np.asarray(out1["status"])[0]) == C.SOLVED
    assert int(np.asarray(out1["status_polish"])[0]) == 1
    assert (np.asarray(out1["pri_res"])[0] <= np.asarray(out0["pri_res"])[0])
    assert (np.asarray(out1["dua_res"])[0] < np.asarray(out0["dua_res"])[0])
    # polished point agrees with the dense engine's polished solution
    model = osqp.Model()
    model.setup(P=np.asarray(sp.csc_matrix(P).todense()), q=q,
                A=np.asarray(sp.csc_matrix(A).todense()), l=l, u=u,
                polish=True, **kw)
    ref = model.solve()
    np.testing.assert_allclose(np.asarray(out1["x"])[0], ref.x,
                               rtol=1e-6, atol=1e-7)


def test_structured_mixed_lane_classification_warns():
    """Rows whose equality/loose classification differs across lanes get
    plain-inequality rho (documented shared-rho semantics) and a
    UserWarning; solutions remain correct per lane."""
    P = sp.eye(4).tocsc()
    A = sp.eye(4).tocsc()
    q = np.tile(np.array([1., -1., 0.5, -0.5]), (2, 1))
    # row 0: equality in lane 0, inequality in lane 1
    l = np.array([[0.5, -1., -1., -1.], [-1., -1., -1., -1.]])
    u = np.array([[0.5, 1., 1., 1.], [1., 1., 1., 1.]])
    slv = BlockTridiagSolver().setup(P=P, A=A, block=2,
                                     eps_abs=1e-8, eps_rel=1e-8)
    with pytest.warns(UserWarning, match="disagree"):
        out = slv.solve(q, l, u)
    assert np.all(np.asarray(out["status"]) == C.SOLVED)
    for lane in range(2):
        model = osqp.Model()
        model.setup(P=np.eye(4), q=q[lane], A=np.eye(4), l=l[lane],
                    u=u[lane], eps_abs=1e-8, eps_rel=1e-8, verbose=False)
        ref = model.solve()
        np.testing.assert_allclose(np.asarray(out["x"])[lane], ref.x,
                                   rtol=1e-5, atol=1e-6)


def test_structured_update_settings():
    """update_settings parity (interface.jl:442-670): UPDATABLE gate +
    rho update refactorizes via the carried TFactor's reuse check."""
    P, q, A, l, u, b = _control(nx=4, nu=2, T=6, seed=1)
    slv = BlockTridiagSolver().setup(P=sp.csc_matrix(P), A=sp.csc_matrix(A),
                                     block=b, eps_abs=1e-6, eps_rel=1e-6)
    out0 = slv.solve(q, l, u)
    assert int(np.asarray(out0["status"])[0]) == C.SOLVED
    with pytest.raises(ValueError, match="cannot be updated"):
        slv.update_settings(sigma=1e-3)
    slv.update_settings(rho=10.0, max_iter=2000)
    out1 = slv.solve(q, l, u)
    assert int(np.asarray(out1["status"])[0]) == C.SOLVED
    np.testing.assert_allclose(np.asarray(out1["x"]), np.asarray(out0["x"]),
                               rtol=1e-4, atol=1e-5)


def test_structured_time_limit_freezes_finished_lanes():
    """Mixed batch under time_limit: the solvable lane's committed result
    must survive expiry (frozen by the chunked driver), while the
    never-converging lane reports Time_limit_reached."""
    rng = np.random.default_rng(2)
    n, b = 16, 4
    P = sp.block_diag([np.eye(b) for _ in range(n // b)]).tocsc()
    A = sp.eye(n).tocsc()
    q = np.stack([rng.normal(size=n), rng.normal(size=n)])
    l = -np.ones((2, n)); u = np.ones((2, n))
    slv = BlockTridiagSolver().setup(
        P=P, A=A, block=b, max_iter=5_000_000, eps_abs=1e-8, eps_rel=1e-8,
        check_termination=25, time_limit=1.0)
    # lane 0 solves quickly (well-conditioned); lane 1 cannot reach the
    # impossible tolerance -> keep it spinning by scaling its cost up and
    # making eps unreachable only for it is not expressible per-lane, so
    # instead make the SHARED tolerance unreachable for lane 1 by keeping
    # lane 0 trivial: q=0 solves exactly (x=0 interior).
    q[0] = 0.0
    slv.update_settings(eps_abs=1e-300, eps_rel=0.0)
    out = slv.solve(q, l, u)
    st = np.asarray(out["status"])
    # lane 0: x*=0 gives exactly-zero residuals -> Solved even at eps=1e-300
    assert st[0] == C.SOLVED
    assert st[1] == C.TIME_LIMIT_REACHED
    np.testing.assert_allclose(np.asarray(out["x"])[0], np.zeros(n),
                               atol=1e-12)
    assert np.isnan(np.asarray(out["x"])[1]).all()


def test_structured_tf32_status_parity():
    """matmul_precision='tensorfloat32' on the banded engine (round-4): the
    per-iteration block products run as 3-pass bf16 splits while
    factorization/termination/polish stay f32. At the engine's MPC regime
    (f32, eps 1e-3) statuses must match the f32 run exactly and iterates
    agree at eps scale. (On CPU the precision hint is a no-op — this pins
    the code path/compilation; the numeric delta is exercised on TPU by
    scripts/bench_structured.py --matmul-precision.)"""
    P, q, A, l, u = control_qp(nx=4, nu=2, T=6, seed=3)
    B = 3
    rng = np.random.RandomState(7)
    qs = np.tile(q, (B, 1)) + 0.05 * rng.randn(B, q.size)
    ls, us = np.tile(l, (B, 1)), np.tile(u, (B, 1))
    outs = {}
    for mp in ("float32", "tensorfloat32"):
        st = BlockTridiagSolver().setup(
            P=sp.csc_matrix(P), A=sp.csc_matrix(A), block=6,
            eps_abs=1e-3, eps_rel=1e-3, max_iter=4000, verbose=False,
            polish=True, dtype=np.float32, matmul_precision=mp)
        outs[mp] = st.solve(qs, ls, us)
    s_f32 = np.asarray(outs["float32"]["status"])
    s_tf = np.asarray(outs["tensorfloat32"]["status"])
    assert np.all(s_f32 == 1)
    np.testing.assert_array_equal(s_f32, s_tf)
    np.testing.assert_allclose(np.asarray(outs["float32"]["x"]),
                               np.asarray(outs["tensorfloat32"]["x"]),
                               atol=5e-3)
