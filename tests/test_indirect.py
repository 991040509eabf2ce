"""Indirect (matrix-free CG) KKT path — the large-problem route
(SURVEY.md §5 "long-context" analogue; reference linsys_solver enum
src/constants.jl:1-2 selects the sub-solver the same way)."""

import numpy as np

import osqp_tpu as osqp


def make_problem(n=60, m=120, seed=0):
    rng = np.random.RandomState(seed)
    M = rng.randn(n, n) / np.sqrt(n)
    P = M.T @ M + 0.5 * np.eye(n)
    q = rng.randn(n)
    A = rng.randn(m, n) / np.sqrt(n)
    l = -1 - rng.rand(m)
    u = 1 + rng.rand(m)
    return P, q, A, l, u


def test_indirect_matches_direct():
    P, q, A, l, u = make_problem()
    kw = dict(verbose=False, eps_abs=1e-6, eps_rel=1e-6)

    m1 = osqp.Model()
    m1.setup(P=P, q=q, A=A, l=l, u=u, linsys_solver="direct", **kw)
    r1 = m1.solve()

    m2 = osqp.Model()
    m2.setup(P=P, q=q, A=A, l=l, u=u, linsys_solver="indirect", **kw)
    r2 = m2.solve()

    assert r1.info.status == r2.info.status == "Solved"
    np.testing.assert_allclose(r1.x, r2.x, atol=1e-4)
    assert abs(r1.info.obj_val - r2.info.obj_val) < 1e-4


def test_indirect_update_and_warm_start():
    P, q, A, l, u = make_problem(seed=3)
    model = osqp.Model()
    model.setup(P=P, q=q, A=A, l=l, u=u, linsys_solver="cg",
                verbose=False, eps_abs=1e-6, eps_rel=1e-6)
    r1 = model.solve()
    assert r1.info.status == "Solved"
    model.update(q=q * 0.5)
    r2 = model.solve()
    assert r2.info.status == "Solved"
    # differential vs fresh direct solve
    md = osqp.Model()
    md.setup(P=P, q=q * 0.5, A=A, l=l, u=u, verbose=False,
             eps_abs=1e-6, eps_rel=1e-6)
    rd = md.solve()
    np.testing.assert_allclose(r2.x, rd.x, atol=1e-4)


def test_qdldl_string_accepted():
    # reference linsys_solver string->enum parity (interface.jl:749-773)
    P, q, A, l, u = make_problem(n=10, m=15, seed=5)
    model = osqp.Model()
    model.setup(P=P, q=q, A=A, l=l, u=u, linsys_solver="qdldl",
                verbose=False)
    assert model.solve().info.status == "Solved"
