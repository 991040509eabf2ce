"""Ports of reference feasibility/unconstrained tests
(/root/reference/test/feasibility.jl, test/unconstrained.jl)."""

import numpy as np

import osqp_tpu as osqp


def test_feasibility_problem():
    # test/feasibility.jl: pure feasibility (P=0, q=0, l=u)
    rng = np.random.RandomState(1)
    n = 30
    m = 30
    P = np.zeros((n, n))
    q = np.zeros(n)
    A = rng.randn(m, n)
    u = rng.randn(m)
    l = u.copy()

    model = osqp.Model()
    model.setup(P=P, q=q, A=A, l=l, u=u, verbose=False,
                eps_abs=1e-6, eps_rel=1e-6, max_iter=5000)
    results = model.solve()
    assert results.info.status in osqp.SOLUTION_PRESENT
    assert np.linalg.norm(A @ results.x - u) < 1e-3


def test_unconstrained_problem():
    # test/unconstrained.jl: m=0, analytic solution x = -P^{-1} q
    rng = np.random.RandomState(1)
    n = 30
    P = np.diag(rng.rand(n)) + 0.2 * np.eye(n)
    q = rng.randn(n)

    invP = np.linalg.inv(P)
    x_test = -invP @ q
    obj_test = -0.5 * q @ invP @ q

    model = osqp.Model()
    model.setup(P=P, q=q, A=np.zeros((0, n)), l=np.zeros(0), u=np.zeros(0),
                verbose=False, eps_abs=1e-8, eps_rel=1e-8, eps_dual_inf=1e-18)
    results = model.solve()

    assert results.info.status == "Solved"
    assert np.allclose(results.x, x_test, atol=1e-5)
    assert abs(results.info.obj_val - obj_test) < 1e-5


def test_unconstrained_via_no_A():
    # interface.jl:45-99: A omitted entirely => m = 0
    rng = np.random.RandomState(3)
    n = 10
    P = np.diag(rng.rand(n) + 0.5)
    q = rng.randn(n)
    model = osqp.Model()
    model.setup(P=P, q=q, verbose=False, eps_abs=1e-8, eps_rel=1e-8,
                eps_dual_inf=1e-18)
    results = model.solve()
    assert results.info.status == "Solved"
    assert np.allclose(results.x, -np.linalg.solve(P, q), atol=1e-5)
