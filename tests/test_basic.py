"""Port of the reference basic test suite (/root/reference/test/basic.jl).

Canonical 2-var / 5-constraint QP; q/l/u updates; settings updates; rho-update
determinism; time limit.
"""

import numpy as np
import pytest

import osqp_tpu as osqp

TOL = 1e-5


def basic_problem():
    P = np.array([[11.0, 0.0], [0.0, 0.0]])
    q = np.array([3.0, 4.0])
    A = np.array([[-1.0, 0.0], [0.0, -1.0], [-1.0, -3.0],
                  [2.0, 5.0], [3.0, 4.0]])
    u = np.array([0.0, 0.0, -15.0, 100.0, 80.0])
    l = -np.inf * np.ones(len(u))
    return P, q, A, l, u


def basic_options():
    # test/basic.jl:12-22
    return dict(verbose=False, eps_abs=1e-9, eps_rel=1e-9,
                check_termination=1, polish=False, max_iter=4000,
                rho=0.1, adaptive_rho=False, warm_start=True)


def make_model(**extra):
    P, q, A, l, u = basic_problem()
    opts = basic_options()
    opts.update(extra)
    model = osqp.Model()
    model.setup(P=P, q=q, A=A, l=l, u=u, **opts)
    return model


def test_basic_qp():
    # test/basic.jl:28-50
    results = make_model().solve()
    assert np.linalg.norm(results.x - [0.0, 5.0]) < TOL
    assert np.linalg.norm(
        results.y - [1.666666666666, 0.0, 1.3333333, 0.0, 0.0]) < TOL
    assert abs(results.info.obj_val - 20.0) < TOL
    assert results.info.status == "Solved"


def test_update_q():
    # test/basic.jl:52-77
    model = make_model()
    model.update(q=[10.0, 20.0])
    results = model.solve()
    assert np.linalg.norm(results.x - [0.0, 5.0]) < TOL
    assert np.linalg.norm(
        results.y - [3.33333333, 0.0, 6.66666666, 0.0, 0.0]) < TOL
    assert abs(results.info.obj_val - 100.0) < TOL


def test_update_l():
    # test/basic.jl:79-104
    model = make_model()
    model.update(l=-100 * np.ones(5))
    results = model.solve()
    assert np.linalg.norm(results.x - [0.0, 5.0]) < TOL
    assert np.linalg.norm(
        results.y - [1.6666666666, 0.0, 1.333333333333, 0.0, 0.0]) < TOL
    assert abs(results.info.obj_val - 20.0) < TOL


def test_update_u():
    # test/basic.jl:106-135
    model = make_model()
    model.update(u=1000 * np.ones(5))
    results = model.solve()
    assert np.linalg.norm(
        results.x - [-1.51515152e-01, -3.33282828e+02]) < TOL
    assert np.linalg.norm(
        results.y - [0.0, 0.0, 1.333333333333, 0.0, 0.0]) < TOL
    assert abs(results.info.obj_val - (-1333.459595961)) < TOL


def test_update_max_iter():
    # test/basic.jl:137-155
    model = make_model()
    model.update_settings(max_iter=80)
    results = model.solve()
    assert results.info.status == "Max_iter_reached"


def test_update_check_termination():
    # test/basic.jl:157-172: check_termination=0 runs exactly max_iter iters
    model = make_model()
    model.update_settings(check_termination=False)
    results = model.solve()
    assert results.info.iter == basic_options()["max_iter"]


def test_update_rho():
    # test/basic.jl:174-208: updating rho to the default must reproduce the
    # default iteration count exactly (determinism of the refactor path)
    results_default = make_model().solve()
    model = make_model(rho=0.7)
    model.update_settings(rho=0.1)
    results_new_rho = model.solve()
    assert results_default.info.iter == results_new_rho.info.iter


def test_time_limit():
    # test/basic.jl:210-240
    model = make_model()
    results = model.solve()
    assert results.info.status == "Solved"

    model.update_settings(eps_abs=1e-20, eps_rel=1e-20, time_limit=1e-6,
                          max_iter=1000000, check_termination=0)
    results_tl = model.solve()
    assert results_tl.info.status == "Time_limit_reached"


def test_solve_empty_model_raises():
    # test/interface.jl "Model error handling"
    model = osqp.Model()
    with pytest.raises(RuntimeError):
        model.solve()


def test_dimensions():
    model = make_model()
    assert model.dimensions() == (2, 5)


def test_csc_roundtrip():
    # analogue of reference test/interface.jl CSC round-trip
    from osqp_tpu.sparse import csc_from_matrix
    rng = np.random.RandomState(0)
    M = rng.randn(6, 4) * (rng.rand(6, 4) < 0.5)
    pat = csc_from_matrix(M)
    np.testing.assert_array_equal(pat.to_dense(), M)
    import scipy.sparse as sp
    pat2 = csc_from_matrix(sp.csc_matrix(M))
    np.testing.assert_array_equal(pat2.to_dense(), M)
    assert pat.nnz == pat2.nnz


def test_settings_defaults_match_reference():
    # C core v0.6.2 defaults, fetched by the wrapper via
    # osqp_set_default_settings (reference types.jl:136-145)
    s = osqp.Settings()
    assert s.rho == 0.1
    assert s.sigma == 1e-6
    assert s.scaling == 10
    assert s.adaptive_rho is True
    assert s.adaptive_rho_interval == 0
    assert s.adaptive_rho_tolerance == 5.0
    assert s.adaptive_rho_fraction == 0.4
    assert s.max_iter == 4000
    assert s.eps_abs == 1e-3 and s.eps_rel == 1e-3
    assert s.eps_prim_inf == 1e-4 and s.eps_dual_inf == 1e-4
    assert s.alpha == 1.6
    assert s.delta == 1e-6
    assert s.polish is False
    assert s.polish_refine_iter == 3
    assert s.verbose is True
    assert s.scaled_termination is False
    assert s.check_termination == 25
    assert s.warm_start is True
    assert s.time_limit == 0.0


def test_settings_validation():
    import pytest as _pytest
    with _pytest.raises(ValueError):
        osqp.Settings(rho=-1.0)
    with _pytest.raises(ValueError):
        osqp.Settings(alpha=2.5)
    with _pytest.raises(ValueError):
        osqp.Settings(linsys_solver="bogus")
    # "mkl pardiso" selects the REAL second direct backend (round 5: the
    # RCM-banded factorization on sparse-input surfaces) — no warning
    import warnings as _warnings
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        s = osqp.Settings(linsys_solver="mkl pardiso")
    assert s.linsys_solver == osqp.constants.MKL_PARDISO_SOLVER


def test_no_retrace_on_resolve_and_updates():
    # TPU analogue of the reference's zero-allocation re-solve contract
    # (test/MOI_wrapper.jl:341-342): repeated solves, data updates, and
    # updatable-settings changes must not re-trace/re-compile the solver.
    from osqp_tpu.interface import _solve_jit
    model = make_model()
    model.solve()
    misses0 = _solve_jit._cache_size()
    model.update(q=[1.0, 2.0])
    model.solve()
    model.update_settings(eps_abs=1e-6, eps_rel=1e-6, max_iter=500,
                          check_termination=5, rho=0.4, alpha=1.2)
    model.solve()
    model.warm_start(x=np.zeros(2), y=np.zeros(5))
    model.solve()
    assert _solve_jit._cache_size() == misses0


def test_setup_requires_bounds_with_A():
    # interface.jl:64-68 semantics
    with pytest.raises(ValueError):
        osqp.Model().setup(P=np.eye(2), q=np.zeros(2),
                           A=np.ones((1, 2)))  # A without l or u
    with pytest.raises(ValueError):
        osqp.Model().setup(P=np.eye(2), q=np.zeros(2), l=np.zeros(1))


def test_modeling_raw_solver():
    from osqp_tpu.modeling import Problem
    p = Problem(verbose=False)
    x = p.add_variable()
    p.set_objective(quadratic={(x, x): 2.0}, affine={x: 1.0})
    assert p.raw_solver() is None
    p.optimize()
    assert p.raw_solver() is not None
    assert p.raw_solver().dimensions()[0] == 1


def test_osqp_python_alias():
    # osqp-python users type osqp.OSQP()
    prob = osqp.OSQP()
    P, q, A, l, u = basic_problem()
    prob.setup(P=P, q=q, A=A, l=l, u=u, **basic_options())
    assert prob.solve().info.status == "Solved"


def test_clean_lifecycle():
    """OSQP.clean! parity (reference interface.jl:223-233): after clean()
    the model is empty — solving errors until the next setup()."""
    import pytest
    P, q, A, l, u = basic_problem()
    m = osqp.Model().setup(P=P, q=q, A=A, l=l, u=u, verbose=False)
    assert m.solve().info.status == "Solved"
    m.clean()
    with pytest.raises(RuntimeError, match="empty"):
        m.solve()
    m.setup(P=P, q=q, A=A, l=l, u=u, verbose=False)   # reusable after clean
    assert m.solve().info.status == "Solved"

    from osqp_tpu.native import NativeModel
    nm = NativeModel()
    nm.setup(P=P, q=q, A=A, l=l, u=u, verbose=False)
    assert nm.solve().info.status == "Solved"
    nm.clean()
    with pytest.raises(RuntimeError, match="empty"):
        nm.solve()
