"""Checkpoint/resume (SURVEY.md §5: the solver state is a pytree →
first-class serialize/restore), Interrupted-status plumbing, and modeling
deletion."""

import numpy as np

import osqp_tpu as osqp
from osqp_tpu.modeling import Problem


def make_problem(seed=0, n=20, m=30):
    rng = np.random.RandomState(seed)
    M = rng.randn(n, n) / np.sqrt(n)
    P = M.T @ M + 0.2 * np.eye(n)
    q = rng.randn(n)
    A = rng.randn(m, n) / np.sqrt(n)
    l = -1 - rng.rand(m)
    u = 1 + rng.rand(m)
    return P, q, A, l, u


def test_state_roundtrip(tmp_path):
    P, q, A, l, u = make_problem()
    kw = dict(verbose=False, eps_abs=1e-8, eps_rel=1e-8,
              adaptive_rho=False, check_termination=1)
    m1 = osqp.Model()
    m1.setup(P=P, q=q, A=A, l=l, u=u, **kw)
    r1 = m1.solve()
    path = str(tmp_path / "state.npz")
    m1.save_state(path)

    # fresh model, restore state -> resumes at the solution (<= 10 iters)
    m2 = osqp.Model()
    m2.setup(P=P, q=q, A=A, l=l, u=u, **kw)
    m2.load_state(path)
    r2 = m2.solve()
    assert r2.info.iter <= 10
    np.testing.assert_allclose(r1.x, r2.x, atol=1e-6)


def test_get_set_state_inmemory():
    P, q, A, l, u = make_problem(seed=2)
    model = osqp.Model()
    model.setup(P=P, q=q, A=A, l=l, u=u, verbose=False,
                adaptive_rho=False, check_termination=1,
                eps_abs=1e-8, eps_rel=1e-8)
    model.solve()
    st = model.get_state()
    model.warm_start(x=np.zeros(model.n), y=np.zeros(model.m))
    model.set_state(st)
    r = model.solve()
    assert r.info.iter <= 10


def test_modeling_delete_constraint():
    p = Problem(verbose=False, eps_abs=1e-8, eps_rel=1e-8)
    x = p.add_variable()
    p.set_objective(quadratic={(x, x): 2.0}, affine={x: -4.0})  # min (x-1)^2-ish
    c = p.add_constraint({x: 1.0}, ub=0.5)
    p.optimize()
    assert abs(p.value(x) - 0.5) < 1e-5  # bound active
    p.delete_constraint(c)
    p.optimize()
    assert abs(p.value(x) - 2.0) < 1e-5  # unconstrained optimum q/P = 4/2


def test_time_limit_driver_preserves_rho_cadence():
    # regression: the chunked time-limit driver must keep the GLOBAL iteration
    # counter so adaptive rho (interval 100 > chunk 25) still fires
    from osqp_tpu.problems import random_qp
    P, q, A, l, u = random_qp(n=30, m=60, seed=3)
    kw = dict(verbose=False, rho=1e-4, adaptive_rho=True,
              adaptive_rho_interval=100)
    m1 = osqp.Model()
    m1.setup(P=P, q=q, A=A, l=l, u=u, **kw)
    r1 = m1.solve()
    m2 = osqp.Model()
    m2.setup(P=P, q=q, A=A, l=l, u=u, time_limit=30.0, **kw)
    r2 = m2.solve()
    assert r1.info.status == r2.info.status == "Solved"
    assert r2.info.rho_updates == r1.info.rho_updates >= 1
    assert r2.info.iter == r1.info.iter


def test_setup_rejects_crossing_bounds():
    # reference C core errors at setup for l > u
    import pytest as _pytest
    P = np.eye(2)
    q = np.zeros(2)
    A = np.eye(2)
    with _pytest.raises(ValueError):
        osqp.Model().setup(P=P, q=q, A=A, l=np.array([1.0, 1.0]),
                           u=np.array([-1.0, 2.0]))
    from osqp_tpu.native import NativeModel
    with _pytest.raises(ValueError):
        NativeModel().setup(P=P, q=q, A=A, l=np.array([1.0, 1.0]),
                            u=np.array([-1.0, 2.0]))
