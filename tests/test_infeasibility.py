"""Ports of the reference infeasibility-detection tests
(/root/reference/test/dual_infeasibility.jl, test/primal_infeasibility.jl)
plus certificate-validity checks (the stronger property the statuses imply).
"""

import numpy as np

import osqp_tpu as osqp


def dual_inf_options():
    # dual_infeasibility.jl:1-9
    return dict(verbose=False, eps_abs=1e-5, eps_rel=1e-5,
                eps_prim_inf=1e-15, check_termination=1)


def test_dual_infeasible_lp():
    # dual_infeasibility.jl:15-28
    P = np.zeros((2, 2))
    q = np.array([2.0, -1.0])
    A = np.eye(2)
    u = np.inf * np.ones(2)
    l = np.zeros(2)
    model = osqp.Model()
    model.setup(P=P, q=q, A=A, l=l, u=u, **dual_inf_options())
    results = model.solve()
    assert results.info.status == "Dual_infeasible"
    # certificate validity: q'dx < 0, A dx >= 0 (recession direction)
    dx = results.dual_inf_cert
    assert np.all(np.isfinite(dx))
    assert q @ dx < 0
    assert np.all(A @ dx >= -1e-6)


def test_dual_infeasible_qp():
    # dual_infeasibility.jl:30-43
    P = np.diag([4.0, 0.0])
    q = np.array([0.0, 2.0])
    A = np.array([[1.0, 1.0], [-1.0, 1.0]])
    u = np.array([2.0, 3.0])
    l = -np.inf * np.ones(2)
    model = osqp.Model()
    model.setup(P=P, q=q, A=A, l=l, u=u, **dual_inf_options())
    results = model.solve()
    assert results.info.status == "Dual_infeasible"


def test_primal_dual_infeasible_warmstart():
    # dual_infeasibility.jl:45-62: warm start avoids premature detection
    P = np.zeros((2, 2))
    q = np.array([-1.0, -1.0])
    A = np.array([[1.0, -1.0], [-1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])
    u = np.inf * np.ones(4)
    l = np.array([1.0, 1.0, 0.0, 0.0])
    model = osqp.Model()
    model.setup(P=P, q=q, A=A, l=l, u=u, **dual_inf_options())
    model.warm_start(x=np.array([50.0, 30.0]), y=-2.0 * np.ones(4))
    results = model.solve()
    assert results.info.status == "Dual_infeasible"


def primal_inf_options():
    # primal_infeasibility.jl:1-9
    return dict(verbose=False, eps_abs=1e-5, eps_rel=1e-5,
                eps_dual_inf=1e-18, scaling=True)


def test_primal_infeasible_problem():
    # primal_infeasibility.jl:15-39: random problem with contradictory
    # duplicated row
    rng = np.random.RandomState(1)
    n = 50
    m = 500
    Ph = rng.randn(n, n) * (rng.rand(n, n) < 0.6)
    P = Ph.T @ Ph
    q = rng.randn(n)
    A = rng.randn(m, n) * (rng.rand(m, n) < 0.6)
    u = 3 + rng.randn(m)
    l = -3 + rng.randn(m)

    k = n // 2
    A[k, :] = A[k + 1, :]
    l[k] = u[k + 1] + 10 * rng.rand()
    u[k] = l[k] + 0.5

    model = osqp.Model()
    model.setup(P=P, q=q, A=A, l=l, u=u, **primal_inf_options())
    results = model.solve()
    assert results.info.status == "Primal_infeasible"
    # certificate validity: A'dy ~ 0 and u'(dy)+ + l'(dy)- < 0
    dy = results.prim_inf_cert
    assert np.all(np.isfinite(dy))
    assert np.linalg.norm(A.T @ dy, np.inf) < 1e-3
    assert u @ np.maximum(dy, 0) + l @ np.minimum(dy, 0) < 0


def test_primal_dual_infeasible_problem():
    # primal_infeasibility.jl:41-59
    n = 2
    m = 4
    P = np.zeros((n, n))
    q = np.array([-1.0, -1.0])
    A = np.array([[1.0, -1.0], [-1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])
    l = np.array([1.0, 1.0, 0.0, 0.0])
    u = np.inf * np.ones(m)
    model = osqp.Model()
    model.setup(P=P, q=q, A=A, l=l, u=u, **primal_inf_options())
    results = model.solve()
    assert results.info.status == "Primal_infeasible"


def test_infeasible_x_y_nan_filled():
    # interface.jl:184-210: no solution => NaN x/y, certificate present.
    # x1 carries zero cost (a free variable with q1 != 0 would make the
    # problem dual-infeasible TOO; which certificate fires first is then a
    # detection-dynamics race, not a contract)
    P = np.zeros((2, 2))
    q = np.array([-1.0, 0.0])
    A = np.array([[1.0, 0.0], [1.0, 0.0]])
    l = np.array([1.0, 3.0])
    u = np.array([2.0, 4.0])  # x0 in [1,2] and [3,4] simultaneously
    model = osqp.Model()
    model.setup(P=P, q=q, A=A, l=l, u=u, verbose=False)
    results = model.solve()
    assert results.info.status == "Primal_infeasible"
    assert np.all(np.isnan(results.x))
    assert np.all(np.isnan(results.y))
    assert np.all(np.isfinite(results.prim_inf_cert))
    assert np.all(np.isnan(results.dual_inf_cert))
    assert results.info.obj_val == np.inf


def test_batched_infeasible_lanes_nan_filled():
    """Reference solution convention on the batched path
    (src/interface.jl:184-210): lanes classified infeasible return
    NaN-filled x/y/z at the API boundary, with the certificate fields
    carrying the rays."""
    from osqp_tpu.batch import BatchedSolver
    from osqp_tpu.settings import Settings
    from osqp_tpu import constants as C_

    rng = np.random.RandomState(0)
    B, n, m = 4, 6, 8
    M = rng.randn(n, n) / np.sqrt(n)
    P = M.T @ M + 0.3 * np.eye(n)
    A = rng.randn(m, n)
    A[1] = A[0]                       # duplicated row
    q = rng.randn(B, n)
    c = (A @ rng.randn(n, B)).T
    l = c - 1.0
    u = c + 1.0
    l[0, 0], u[0, 0] = 1.0, 2.0       # lane 0: contradictory bounds on the
    l[0, 1], u[0, 1] = -2.0, -1.0     # duplicated row -> primal infeasible
    out = BatchedSolver(
        settings=Settings(eps_abs=1e-6, eps_rel=1e-6, verbose=False,
                          dtype=np.float64)).solve(P, q, A, l, u)
    st = np.asarray(out.status)
    assert st[0] in (C_.PRIMAL_INFEASIBLE, C_.PRIMAL_INFEASIBLE_INACCURATE)
    assert np.all(np.isnan(np.asarray(out.x)[0]))
    assert np.all(np.isnan(np.asarray(out.y)[0]))
    assert np.isfinite(np.asarray(out.prim_cert)[0]).all()
    for i in range(1, B):
        assert st[i] == C_.SOLVED
        assert np.isfinite(np.asarray(out.x)[i]).all()


def test_warm_start_from_infeasible_result_recovers():
    """Feeding a NaN-filled (infeasible) result back as a warm start — the
    natural receding-horizon loop — must cold-start those lanes instead of
    poisoning every subsequent solve (single-problem and batched paths)."""
    from osqp_tpu.batch import BatchedSolver
    from osqp_tpu.settings import Settings
    from osqp_tpu import constants as C_

    rng = np.random.RandomState(3)
    n, m = 5, 6
    M = rng.randn(n, n)
    P = M @ M.T + 0.5 * np.eye(n)
    A = rng.randn(m, n)
    A[1] = A[0]
    l_bad = -np.ones(m)
    u_bad = np.ones(m)
    l_bad[0], u_bad[0] = 1.0, 2.0
    l_bad[1], u_bad[1] = -2.0, -1.0       # contradictory duplicated row
    c = A @ rng.randn(n)
    l_ok, u_ok = c - 1.0, c + 1.0
    q = rng.randn(n)
    kw = dict(eps_abs=1e-6, eps_rel=1e-6, verbose=False)

    # single-problem path
    model = osqp.Model()
    model.setup(P=P, q=q, A=A, l=l_bad, u=u_bad, **kw)
    r = model.solve()
    assert r.info.status.startswith("Primal_infeasible")
    assert np.all(np.isnan(r.x))
    model.update(l=l_ok, u=u_ok)
    model.warm_start(x=r.x, y=r.y)        # NaN warm start -> cold
    r2 = model.solve()
    assert r2.info.status == "Solved"

    # batched prepared path (kernel-backed — cannot lower under the global
    # x64 flag on the TPU runtime, like the other kernel differential
    # tests; the single-problem half above still runs on hardware)
    import jax
    if jax.default_backend() in ("tpu", "axon"):
        return
    B = 3
    bs = BatchedSolver(settings=Settings(dtype=np.float64, **kw),
                       kkt_mode="shared").prepare(P, A)
    lb = np.tile(l_ok, (B, 1)); ub = np.tile(u_ok, (B, 1))
    lb[0], ub[0] = l_bad, u_bad
    out = bs.solve_prepared(np.tile(q, (B, 1)), lb, ub)
    assert np.all(np.isnan(np.asarray(out.x)[0]))
    lb[0], ub[0] = l_ok, u_ok             # now feasible again
    out2 = bs.solve_prepared(np.tile(q, (B, 1)), lb, ub,
                             x0=np.asarray(out.x), y0=np.asarray(out.y))
    assert np.all(np.asarray(out2.status) == C_.SOLVED)
    assert np.isfinite(np.asarray(out2.x)).all()
