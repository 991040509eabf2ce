"""Port of /root/reference/test/polishing.jl.

The reference's third case loads a Mosek-solved fixture
(test/problem_data/random_polish_qp.jld2, n=30 m=50). That fixture's
numeric data (problem + Mosek's x/y/objective) is re-exported to
tests/data/random_polish_qp.npz (see scripts/export_polish_fixture.py) and
used verbatim as the external oracle in test_polish_mosek_fixture —
the one truly third-party-computed anchor available offline. The
synthetic test_polish_random keeps the KKT-residual differential pattern
for a second random instance.
"""

import os

import numpy as np
import pytest

import osqp_tpu as osqp

FIXTURE = os.path.join(os.path.dirname(__file__), "data", "random_polish_qp.npz")

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


@pytest.mark.parametrize("engine", ["jax-direct", "jax-cg", "native"])
def test_polish_mosek_fixture(engine):
    # polishing.jl:70-93: the reference asserts x, y, obj against a
    # Mosek-computed solution at 1e-3 with polish on. Same data, same
    # gates, per engine.
    data = np.load(FIXTURE)
    P, q, A, l, u = data["P"], data["q"], data["A"], data["l"], data["u"]

    opts = polish_options()
    if engine == "native":
        from osqp_tpu.native import NativeModel
        model = NativeModel().setup(P=P, q=q, A=A, l=l, u=u, **opts)
    else:
        if engine == "jax-cg":
            opts["linsys_solver"] = "indirect"
        model = osqp.Model()
        model.setup(P=P, q=q, A=A, l=l, u=u, **opts)
    results = model.solve()

    assert results.info.status == "Solved"
    assert results.info.status_polish == 1
    assert np.allclose(results.x, data["x_test"], atol=TOL)
    assert np.allclose(results.y, data["y_test"], atol=TOL)
    assert abs(results.info.obj_val - float(data["obj_test"])) < TOL


def test_polish_mosek_fixture_batched():
    # Same Mosek anchor through the batched front-end (batch of 3 with
    # scaled q in lanes 1-2; lane 0 must still hit Mosek's solution).
    from osqp_tpu.batch import BatchedSolver
    from osqp_tpu.settings import Settings

    data = np.load(FIXTURE)
    P, q, A, l, u = data["P"], data["q"], data["A"], data["l"], data["u"]
    B = 3
    qs = np.stack([q, q * 1.1, q * 0.9])
    ls, us = np.tile(l, (B, 1)), np.tile(u, (B, 1))

    s = Settings(verbose=False, polish=True, eps_abs=1e-3, eps_rel=1e-3,
                 max_iter=5000)
    out = BatchedSolver(settings=s).solve(P, qs, A, ls, us)

    assert int(np.asarray(out.status)[0]) == 1  # Solved
    assert int(np.asarray(out.status_polish)[0]) == 1
    assert np.allclose(np.asarray(out.x[0]), data["x_test"], atol=TOL)
    assert np.allclose(np.asarray(out.y[0]), data["y_test"], atol=TOL)
    assert abs(float(np.asarray(out.obj_val)[0]) - float(data["obj_test"])) < TOL


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


def test_polish_rejects_wrong_face_and_pivot_recovers():
    """Round-4 polish hardening. On an LP whose warm update-re-solve
    terminates eps-feasible but vertex-distant, the one-shot y-sign guess
    can include a spurious active row; the old acceptance reported SUCCESS
    on the resulting wrong-face solution (obj_err 1.4e-3) because the
    near-zero ADMM dual residual waived the dual-improvement check. Now:
    single-row pivot refinement recovers the exact vertex (obj ~1e-9), and
    acceptance additionally requires sign-consistent polished duals, so a
    wrong face can never be reported as polish success."""
    from osqp_tpu.problems import lp_qp
    from osqp_tpu.utils.ipm import solve_qp_ipm

    P, q, A, l, u = lp_qp()
    rng = np.random.RandomState(11)
    q2 = q + 0.1 * rng.randn(len(q))
    shift = 0.05 * rng.randn(len(l))
    l2 = np.where(np.isfinite(l), l + shift, l)
    u2 = np.where(np.isfinite(u), u + shift, u)
    o = solve_qp_ipm(P, q2, A, l2, u2)
    assert o.status == "optimal"

    model = osqp.Model()
    model.setup(P=P, q=q, A=A, l=l, u=u, verbose=False, eps_abs=1e-3,
                eps_rel=1e-3, max_iter=100000, polish=True)
    model.solve()
    model.update(q=q2, l=l2, u=u2)
    r = model.solve()  # warm re-solve: the measured wrong-guess scenario
    assert r.info.status == "Solved"
    if r.info.status_polish == 1:
        # accepted polish must be the TRUE vertex, not a plausible face
        assert abs(r.info.obj_val - o.obj) / (1 + abs(o.obj)) < 1e-6
        assert np.max(np.abs(r.x - o.x)) < 1e-5


def test_native_polish_rejects_wrong_face_and_pivot_recovers():
    """Round-5: the same wrong-face scenario on the NATIVE engine (the
    round-4 advisor found native polish kept the old one-axis acceptance
    escape hatch while the conformance sweep enables polish on native LP
    cells). Native polish now runs the single-row pivot repair rounds and
    the sign-consistency acceptance gate (native/solver.cpp
    polish_solution), so an accepted polish must be the true vertex."""
    from osqp_tpu.native import NativeModel
    from osqp_tpu.problems import lp_qp
    from osqp_tpu.utils.ipm import solve_qp_ipm

    P, q, A, l, u = lp_qp()
    rng = np.random.RandomState(11)
    q2 = q + 0.1 * rng.randn(len(q))
    shift = 0.05 * rng.randn(len(l))
    l2 = np.where(np.isfinite(l), l + shift, l)
    u2 = np.where(np.isfinite(u), u + shift, u)
    o = solve_qp_ipm(P, q2, A, l2, u2)
    assert o.status == "optimal"

    model = NativeModel()
    model.setup(P=P, q=q, A=A, l=l, u=u, verbose=False, eps_abs=1e-3,
                eps_rel=1e-3, max_iter=100000, polish=True)
    model.solve()
    model.update(q=q2, l=l2, u=u2)
    r = model.solve()
    assert r.info.status == "Solved"
    if r.info.status_polish == 1:
        assert abs(r.info.obj_val - o.obj) / (1 + abs(o.obj)) < 1e-6
        assert np.max(np.abs(r.x - o.x)) < 1e-5
