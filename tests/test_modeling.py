"""Modeling-layer tests — analogue of the reference's MOI wrapper suite
(/root/reference/test/MOI_wrapper.jl): basic conformance, incremental
modification vs fresh setup (the `_test_optimizer_modification` differential
harness :207-264), MAX sense, certificate-as-result conventions, warm-start
plumbing, and the 10-round modify+resolve loop (:775-789)."""

import numpy as np
import pytest

from osqp_tpu.modeling import Problem

OPTS = dict(verbose=False, eps_abs=1e-8, eps_rel=1e-8, polish=True)


def test_basic_lp():
    # max x + 2y s.t. x + y <= 1, x,y >= 0  -> x=0, y=1, obj=2
    p = Problem(**OPTS)
    x, y = p.add_variables(2)
    p.set_objective(affine={x: 1.0, y: 2.0}, sense="max")
    c1 = p.add_constraint({x: 1.0, y: 1.0}, ub=1.0)
    p.add_constraint({x: 1.0}, lb=0.0)
    p.add_constraint({y: 1.0}, lb=0.0)
    p.optimize()
    assert p.termination_status() == "OPTIMAL"
    assert abs(p.value(x) - 0.0) < 1e-5
    assert abs(p.value(y) - 1.0) < 1e-5
    assert abs(p.objective_value() - 2.0) < 1e-5
    # MOI sign convention: dual of active <=-constraint is negative
    assert p.dual(c1) < -1e-6


def test_basic_qp_with_constant():
    # min 0.5*(11 x1^2) + 3x1 + 4x2 + 7  s.t. basic.jl constraints
    p = Problem(verbose=False, eps_abs=1e-9, eps_rel=1e-9, polish=True)
    x1, x2 = p.add_variables(2)
    p.set_objective(quadratic={(x1, x1): 11.0},
                    affine={x1: 3.0, x2: 4.0}, constant=7.0)
    p.add_constraint({x1: -1.0}, ub=0.0)
    p.add_constraint({x2: -1.0}, ub=0.0)
    p.add_constraint({x1: -1.0, x2: -3.0}, ub=-15.0)
    p.add_constraint({x1: 2.0, x2: 5.0}, ub=100.0)
    p.add_constraint({x1: 3.0, x2: 4.0}, ub=80.0)
    p.optimize()
    assert p.termination_status() == "OPTIMAL"
    assert abs(p.objective_value() - 27.0) < 1e-4  # 20 + constant 7
    np.testing.assert_allclose(p.values(), [0.0, 5.0], atol=1e-4)


def test_constraint_constant_folding():
    # l <= a'x + c <= u handled as l-c <= a'x <= u-c
    p = Problem(**OPTS)
    x = p.add_variable()
    p.set_objective(quadratic={(x, x): 1.0})
    p.add_constraint({x: 1.0}, lb=2.0, ub=10.0, constant=1.0)  # x >= 1
    p.optimize()
    assert abs(p.value(x) - 1.0) < 1e-5


def _mpc_like_problem():
    p = Problem(verbose=False, eps_abs=1e-8, eps_rel=1e-8,
                adaptive_rho=False, check_termination=1)
    xs = p.add_variables(3)
    p.set_objective(
        quadratic={(0, 0): 2.0, (1, 1): 2.0, (2, 2): 2.0, (0, 1): 0.5},
        affine={0: 1.0, 1: -2.0, 2: 0.5})
    cons = [
        p.add_constraint({0: 1.0, 1: 1.0}, lb=-1.0, ub=1.0),
        p.add_constraint({1: 1.0, 2: -1.0}, lb=-2.0, ub=2.0),
        p.add_constraint({0: 1.0, 2: 1.0}, ub=1.5),
    ]
    return p, xs, cons


def test_modification_equals_fresh_setup():
    # differential harness: incremental modification == fresh setup
    # (MOI_wrapper.jl:207-264)
    p, xs, cons = _mpc_like_problem()
    p.optimize()

    # modify incrementally
    p.set_objective_coefficient(1, 3.0)
    p.set_constraint_bounds(cons[0], -0.5, 0.5)
    p.set_constraint_coefficient(cons[1], 1, 2.0)
    r_inc = p.optimize()

    # fresh problem with the same final data
    p2, xs2, cons2 = _mpc_like_problem()
    p2.set_objective_coefficient(1, 3.0)
    p2.set_constraint_bounds(cons2[0], -0.5, 0.5)
    p2.set_constraint_coefficient(cons2[1], 1, 2.0)
    r_fresh = p2.optimize()

    np.testing.assert_allclose(p.values(), p2.values(), atol=1e-6)
    assert abs(p.objective_value() - p2.objective_value()) < 1e-6


def test_no_resetup_on_value_changes():
    p, xs, cons = _mpc_like_problem()
    p.optimize()
    model_before = p._model
    p.set_objective_coefficient(0, 2.0)
    p.set_constraint_bounds(cons[0], -0.7, 0.7)
    p.optimize()
    # value-only changes reuse the same solver model (zero re-setup — the
    # reference's zero-allocation re-optimize contract)
    assert p._model is model_before


def test_structural_change_triggers_resetup():
    p, xs, cons = _mpc_like_problem()
    p.optimize()
    model_before = p._model
    p.add_constraint({0: 1.0, 1: -1.0}, ub=3.0)
    p.optimize()
    assert p._model is not model_before
    assert p.termination_status() == "OPTIMAL"


def test_infeasible_reports_dual_ray():
    p = Problem(verbose=False)
    x = p.add_variable()
    c1 = p.add_constraint({x: 1.0}, lb=1.0, ub=2.0)
    c2 = p.add_constraint({x: 1.0}, lb=3.0, ub=4.0)
    p.optimize()
    assert p.termination_status() == "INFEASIBLE"
    assert p.dual_status() == "INFEASIBILITY_CERTIFICATE"
    d1, d2 = p.dual(c1), p.dual(c2)
    # valid dual ray in MOI convention: -(u'(dy)+ + l'(dy)-) > 0 with dy=-d
    dy = -np.array([d1, d2])
    assert 2.0 * max(dy[0], 0) + 4.0 * max(dy[1], 0) \
        + 1.0 * min(dy[0], 0) + 3.0 * min(dy[1], 0) < 0


def test_unbounded_reports_primal_ray():
    p = Problem(verbose=False, eps_prim_inf=1e-15, check_termination=1)
    x = p.add_variable()
    p.set_objective(affine={x: -1.0})
    p.add_constraint({x: 1.0}, lb=0.0)
    p.optimize()
    assert p.termination_status() == "DUAL_INFEASIBLE"
    assert p.primal_status() == "INFEASIBILITY_CERTIFICATE"
    assert p.value(x) > 0  # ray of unboundedness


def test_ten_round_modify_resolve():
    # MOI_wrapper.jl:775-789 pattern
    p, xs, cons = _mpc_like_problem()
    rng = np.random.RandomState(0)
    for k in range(10):
        p.set_objective_coefficient(0, float(rng.randn()))
        lb = -1.0 - rng.rand()
        p.set_constraint_bounds(cons[0], lb, lb + 2.0)
        p.optimize()
        assert p.termination_status() == "OPTIMAL"
        # verify against assembled data directly
        P, q, A, l, u = p._assemble()
        xsol = p.values()
        assert np.all(A @ xsol <= u + 1e-6)
        assert np.all(A @ xsol >= l - 1e-6)


def test_warm_start_plumbing():
    # MOI_wrapper.jl:616-692 analogue
    p, xs, cons = _mpc_like_problem()
    p.optimize()
    xsol = p.values()
    ysol = [p.dual(c) for c in cons]
    it_warm_auto = p.optimize().info.iter
    assert it_warm_auto <= 10  # auto warm start from previous solution

    p2, xs2, cons2 = _mpc_like_problem()
    p2.set_primal_start(xsol)
    for c, d in zip(cons2, ysol):
        p2.set_dual_start(c, d)
    r = p2.optimize()
    assert r.info.iter <= 10


def test_vector_equality_least_squares():
    # port of reference test/MOI_wrapper.jl:694-789: min ||Ax-b||^2 s.t. Cx=d
    # with the pinv-computed analytic solution as oracle, re-solved through
    # 10 rounds of objective + constraint-function replacement
    rng = np.random.RandomState(1234)
    n, m = 8, 2

    def gen():
        A = rng.rand(n, n)
        b = rng.rand(n)
        C = rng.rand(m, n)
        d = rng.rand(m)
        Cp = np.linalg.pinv(C)
        Q = np.eye(n) - Cp @ C
        expected = Q @ (np.linalg.pinv(A @ Q) @ (b - A @ Cp @ d)) + Cp @ d
        assert np.allclose(C @ expected, d, atol=1e-10)
        P = 2.0 * A.T @ A            # 0.5 x'Px = x'A'Ax
        q = -2.0 * A.T @ b
        r = float(b @ b)
        return A, b, C, d, P, q, r, expected

    A, b, C, d, P, q, r, expected = gen()
    p = Problem(verbose=False, eps_abs=1e-8, eps_rel=1e-8, polish=True,
                max_iter=20000)
    xs = p.add_variables(n)
    p.set_objective(quadratic=P, affine=q, constant=r)
    cons = [p.add_constraint(C[i], lb=d[i], ub=d[i]) for i in range(m)]
    p.optimize()

    def check(A, b, expected):
        assert p.termination_status() == "OPTIMAL"
        np.testing.assert_allclose(p.values(), expected, atol=1e-4)
        assert abs(p.objective_value()
                   - np.linalg.norm(A @ expected - b) ** 2) < 1e-4

    check(A, b, expected)
    for _ in range(10):
        A, b, C, d, P, q, r, expected = gen()
        p.set_objective(quadratic=P, affine=q, constant=r)
        for i in range(m):
            p.set_constraint_function(cons[i], C[i])
            p.set_constraint_bounds(cons[i], d[i], d[i])
        p.optimize()
        check(A, b, expected)


def test_settings_attributes():
    """Per-setting attribute API (reference OSQPSettings structs,
    MOI_wrapper.jl:507-536): set/get, isupdatable predicate, post-setup
    enforcement, and in-place application of updatable settings."""
    p = Problem(verbose=False)
    # defaults surface through get_setting
    assert p.get_setting("max_iter") == 4000
    assert p.get_setting("rho") == 0.1
    # any setting may be set before setup
    p.set_setting("sigma", 1e-5)
    p.set_setting("eps_abs", 1e-7)
    p.set_setting("eps_rel", 1e-7)
    assert p.get_setting("sigma") == 1e-5
    with pytest.raises(ValueError):
        p.set_setting("not_a_setting", 1)
    with pytest.raises(ValueError):
        p.get_setting("not_a_setting")
    assert Problem.is_updatable("eps_abs")
    assert not Problem.is_updatable("sigma")

    x, y = p.add_variables(2)
    p.set_objective(quadratic={(x, x): 2.0, (y, y): 2.0},
                    affine={x: -2.0, y: -2.0})
    p.add_constraint({x: 1.0, y: 1.0}, ub=1.0)
    p.optimize()
    assert p.termination_status() == "OPTIMAL"
    np.testing.assert_allclose(p.values(), [0.5, 0.5], atol=1e-5)

    # updatable after setup: applied in-place, no re-setup
    inner = p.raw_solver()
    p.set_setting("max_iter", 2000)
    p.optimize()
    assert p.raw_solver() is inner
    assert p.get_setting("max_iter") == 2000
    # non-updatable after setup: rejected (SetAttributeNotAllowed analogue)
    with pytest.raises(ValueError):
        p.set_setting("sigma", 1e-4)
    # ... but allowed again once a structural change forces a re-setup
    z = p.add_variable()
    p.set_setting("sigma", 1e-4)
    p.set_objective_coefficient(z, 1.0)
    p.add_constraint({z: 1.0}, lb=0.0)
    p.optimize()
    assert p.termination_status() == "OPTIMAL"
    assert p.raw_solver() is not inner
