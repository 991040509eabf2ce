"""Port of /root/reference/test/polishing.jl.

The reference's third case loads a Mosek-solved fixture
(test/problem_data/random_polish_qp.jld2, n=30 m=50); here the oracle is a
direct KKT-residual check on the polished solution (stationarity, primal
feasibility, complementarity at 1e-6) plus a high-accuracy self-solve — the
same differential pattern, without a binary fixture.
"""

import numpy as np

import osqp_tpu as osqp

TOL = 1e-3


def polish_options():
    return dict(verbose=False, polish=True, eps_abs=1e-3, eps_rel=1e-3,
                max_iter=5000)


def kkt_residuals(P, q, A, l, u, x, y):
    """max KKT violation of (x, y): stationarity, feasibility, complementarity."""
    stat = np.linalg.norm(P @ x + q + A.T @ y, np.inf)
    Ax = A @ x
    feas = max(np.max(Ax - u, initial=0.0), np.max(l - Ax, initial=0.0))
    comp = np.max(
        np.abs(np.maximum(y, 0) * (u - Ax)) + np.abs(np.minimum(y, 0) * (Ax - l)),
        initial=0.0,
    )
    return max(stat, feas, comp)


def test_polishing_problem():
    # polishing.jl:15-45
    P = np.diag([11.0, 0.0])
    q = np.array([3.0, 4.0])
    A = np.array([[-1.0, 0.0], [0.0, -1.0], [-1.0, -3.0],
                  [2.0, 5.0], [3.0, 4.0]])
    u = np.array([0.0, 0.0, -15.0, 100.0, 80.0])
    l = -np.inf * np.ones(len(u))

    model = osqp.Model()
    model.setup(P=P, q=q, A=A, l=l, u=u, **polish_options())
    results = model.solve()

    x_test = np.array([9.90341e-11, 5.0])
    y_test = np.array([1.66667, 0.0, 1.33333, 0.0, 0.0])
    assert np.allclose(results.x, x_test, atol=TOL)
    assert np.allclose(results.y, y_test, atol=TOL)
    assert abs(results.info.obj_val - 20.0) < TOL
    assert results.info.status_polish == 1


def test_polishing_unconstrained():
    # polishing.jl:47-68
    rng = np.random.RandomState(1)
    n = 10
    P = np.diag(rng.rand(n)) + 0.2 * np.eye(n)
    q = rng.randn(n)
    A = np.eye(n)
    l = -100 * np.ones(n)
    u = 100 * np.ones(n)

    model = osqp.Model()
    model.setup(P=P, q=q, A=A, l=l, u=u, **polish_options())
    results = model.solve()

    invP = np.linalg.inv(P)
    x_test = -invP @ q
    obj_test = -0.5 * q @ invP @ q

    assert np.allclose(results.x, x_test, atol=TOL)
    assert np.allclose(results.y, np.zeros(n), atol=TOL)
    assert abs(results.info.obj_val - obj_test) < TOL
    assert results.info.status_polish == 1


def test_polish_random():
    # polishing.jl:70-93 analogue (random n=30, m=50 QP); oracle = KKT check
    rng = np.random.RandomState(7)
    n, m = 30, 50
    Ph = rng.randn(n, n)
    P = Ph.T @ Ph + 0.1 * np.eye(n)
    q = rng.randn(n)
    A = rng.randn(m, n)
    u = 2.0 + rng.rand(m)
    l = -2.0 - rng.rand(m)

    model = osqp.Model()
    model.setup(P=P, q=q, A=A, l=l, u=u, **polish_options())
    results = model.solve()
    assert results.info.status == "Solved"
    assert results.info.status_polish == 1
    # polished solution should satisfy KKT to much better than eps=1e-3
    assert kkt_residuals(P, q, A, l, u, results.x, results.y) < 1e-6

    # differential: matches a high-accuracy unpolished solve
    model2 = osqp.Model()
    model2.setup(P=P, q=q, A=A, l=l, u=u, verbose=False,
                 eps_abs=1e-10, eps_rel=1e-10, polish=False, max_iter=20000)
    r2 = model2.solve()
    assert np.allclose(results.x, r2.x, atol=TOL)
    assert np.allclose(results.y, r2.y, atol=TOL)
    assert abs(results.info.obj_val - r2.info.obj_val) < TOL
