"""Modeling-conformance catalog, part 2 (round-4 verdict item #8).

Grows the enumerated catalog toward the reference's full
``MOI.Test.runtests`` surface (/root/reference/test/MOI_wrapper.jl:59-93):
post-setup objective modification semantics, constraint set-replacement
corner cases, deletion + re-add sequences, attribute analogues
(RawStatusString / SolveTimeSec / RawSolver), start plumbing, vector-set
corners, and the infeasible/unbounded x sense x offset grid the reference
EXCLUDES only because of upstream MathOptInterface.jl wrapper issues
(#1773, #1759) — this framework has no such wrapper layer, so those cases
are covered rather than excluded. The covered/excluded disposition list
lives in tests/CATALOG.md.

Differential pattern throughout: an incremental modification must land on
the same solution as a fresh model of the modified problem
(test/MOI_wrapper.jl:207-264 `_test_optimizer_modification`).
"""

import numpy as np
import pytest

from osqp_tpu.modeling import Constraint, Problem

KW = dict(eps_abs=1e-8, eps_rel=1e-8, verbose=False)
TOL = 1e-6


def _qp2():
    """min x0^2 + x1^2 - 2x0 - 3x1  s.t.  x0 + x1 <= 1.5, x0 >= 0."""
    pr = Problem(**KW)
    pr.add_variables(2)
    pr.set_objective(quadratic={(0, 0): 2.0, (1, 1): 2.0},
                     affine={0: -2.0, 1: -3.0})
    c0 = pr.add_constraint({0: 1.0, 1: 1.0}, ub=1.5)
    c1 = pr.add_constraint({0: 1.0}, lb=0.0)
    return pr, c0, c1


def _fresh(quad, lin, rows, const=0.0, sense="min"):
    pr = Problem(**KW)
    nvar = 1 + max([max(i, j) for i, j in quad] +
                   [i for i in lin] +
                   [i for row, _, _ in rows for i in row])
    pr.add_variables(nvar)
    pr.set_objective(quadratic=quad, affine=lin, constant=const, sense=sense)
    for row, lb, ub in rows:
        pr.add_constraint(row, lb=lb, ub=ub)
    pr.optimize()
    return pr


# ---------------------------------------------------------------------------
# A. post-setup objective modification
# ---------------------------------------------------------------------------

def test_linear_coef_change_post_setup_in_place():
    pr, c0, c1 = _qp2()
    pr.optimize()
    solver = pr.raw_solver()
    pr.set_objective_coefficient(1, -1.0)   # q1: -3 -> -1
    pr.optimize()
    assert pr.raw_solver() is solver        # flushed via cache, no re-setup
    ref = _fresh({(0, 0): 2.0, (1, 1): 2.0}, {0: -2.0, 1: -1.0},
                 [({0: 1.0, 1: 1.0}, -np.inf, 1.5), ({0: 1.0}, 0.0, np.inf)])
    assert np.allclose(pr.values(), ref.values(), atol=TOL)


def test_linear_coef_change_to_zero_post_setup():
    pr, c0, c1 = _qp2()
    pr.optimize()
    pr.set_objective_coefficient(0, 0.0)
    pr.optimize()
    ref = _fresh({(0, 0): 2.0, (1, 1): 2.0}, {1: -3.0},
                 [({0: 1.0, 1: 1.0}, -np.inf, 1.5), ({0: 1.0}, 0.0, np.inf)])
    assert np.allclose(pr.values(), ref.values(), atol=TOL)


def test_quadratic_value_change_same_pattern_in_place():
    pr, c0, c1 = _qp2()
    pr.optimize()
    solver = pr.raw_solver()
    pr.set_quadratic_objective_coefficient(0, 0, 4.0)  # value-only
    pr.optimize()
    assert pr.raw_solver() is solver
    ref = _fresh({(0, 0): 4.0, (1, 1): 2.0}, {0: -2.0, 1: -3.0},
                 [({0: 1.0, 1: 1.0}, -np.inf, 1.5), ({0: 1.0}, 0.0, np.inf)])
    assert np.allclose(pr.values(), ref.values(), atol=TOL)


def test_quadratic_pattern_shrink_triggers_resetup():
    pr, c0, c1 = _qp2()
    pr.optimize()
    solver = pr.raw_solver()
    # replace the objective WITHOUT the (1,1) entry: pattern changed
    pr.set_objective(quadratic={(0, 0): 2.0}, affine={0: -2.0, 1: 0.5})
    pr.optimize()
    assert pr.raw_solver() is not solver
    ref = _fresh({(0, 0): 2.0}, {0: -2.0, 1: 0.5},
                 [({0: 1.0, 1: 1.0}, -np.inf, 1.5), ({0: 1.0}, 0.0, np.inf)])
    assert np.allclose(pr.values(), ref.values(), atol=TOL)


def test_objective_replacement_same_pattern_in_place():
    pr, c0, c1 = _qp2()
    pr.optimize()
    solver = pr.raw_solver()
    pr.set_objective(quadratic={(0, 0): 6.0, (1, 1): 2.0},
                     affine={0: 1.0, 1: -3.0})
    pr.optimize()
    assert pr.raw_solver() is solver
    ref = _fresh({(0, 0): 6.0, (1, 1): 2.0}, {0: 1.0, 1: -3.0},
                 [({0: 1.0, 1: 1.0}, -np.inf, 1.5), ({0: 1.0}, 0.0, np.inf)])
    assert np.allclose(pr.values(), ref.values(), atol=TOL)


def test_sense_flip_with_constant_post_setup():
    pr, x = Problem(**KW), 0
    pr.add_variable()
    pr.set_objective(quadratic={(0, 0): 2.0}, affine={0: -2.0}, constant=3.0)
    pr.add_constraint({0: 1.0}, lb=-5.0, ub=5.0)
    pr.optimize()
    assert abs(pr.objective_value() - 2.0) < TOL      # min (x-1)^2 + 2
    pr.set_objective(quadratic={(0, 0): -2.0}, affine={0: 4.0},
                     constant=3.0, sense="max")
    pr.optimize()
    # max -x^2 + 4x + 3 -> x = 2, value 7
    assert abs(pr.value(x) - 2.0) < TOL
    assert abs(pr.objective_value() - 7.0) < TOL


def test_max_sense_linear_coef_change_post_setup():
    pr = Problem(**KW)
    pr.add_variable()
    pr.set_objective(quadratic={(0, 0): -2.0}, affine={0: 4.0}, sense="max")
    pr.optimize()
    assert abs(pr.value(0) - 2.0) < TOL
    pr.set_objective_coefficient(0, 8.0)  # max -x^2 + 8x -> x = 4
    pr.optimize()
    assert abs(pr.value(0) - 4.0) < TOL
    assert abs(pr.objective_value() - 16.0) < TOL


def test_objective_cleared_to_feasibility_post_setup():
    pr, c0, c1 = _qp2()
    pr.optimize()
    pr.set_objective()  # empty objective: pattern changed -> re-setup
    pr.optimize()
    assert pr.termination_status() == "OPTIMAL"
    x = pr.values()
    assert x[0] + x[1] <= 1.5 + 1e-6 and x[0] >= -1e-6
    assert abs(pr.objective_value()) < TOL


def test_objective_coef_change_before_first_optimize():
    pr = Problem(**KW)
    pr.add_variable()
    pr.set_objective(quadratic={(0, 0): 2.0})
    pr.set_objective_coefficient(0, -4.0)  # no model yet: needs_setup path
    pr.optimize()
    assert abs(pr.value(0) - 2.0) < TOL


# ---------------------------------------------------------------------------
# B. constraint set replacement corner cases
# ---------------------------------------------------------------------------

def test_equality_to_loose_interval_post_setup():
    pr, c0, c1 = _qp2()
    ceq = pr.add_constraint({1: 1.0}, lb=0.25, ub=0.25)
    pr.optimize()
    pr.set_constraint_bounds(ceq, -np.inf, np.inf)
    pr.optimize()
    ref = _fresh({(0, 0): 2.0, (1, 1): 2.0}, {0: -2.0, 1: -3.0},
                 [({0: 1.0, 1: 1.0}, -np.inf, 1.5), ({0: 1.0}, 0.0, np.inf)])
    assert np.allclose(pr.values(), ref.values(), atol=TOL)
    assert abs(pr.dual(ceq)) < TOL          # loose row: zero dual


def test_one_sided_flip_ub_to_lb():
    pr = Problem(**KW)
    pr.add_variable()
    pr.set_objective(quadratic={(0, 0): 2.0}, affine={0: -2.0})
    c = pr.add_constraint({0: 1.0}, ub=0.5)
    pr.optimize()
    assert abs(pr.value(0) - 0.5) < TOL
    pr.set_constraint_bounds(c, 2.0, np.inf)  # flip the active side
    pr.optimize()
    assert abs(pr.value(0) - 2.0) < TOL
    # GreaterThan active below the unconstrained optimum: MOI dual >= 0
    assert pr.dual(c) > 0.0


def test_interval_to_equality_at_midpoint():
    pr, c0, c1 = _qp2()
    pr.optimize()
    pr.set_constraint_bounds(c0, 0.75, 0.75)  # interval -> EqualTo
    pr.optimize()
    ref = _fresh({(0, 0): 2.0, (1, 1): 2.0}, {0: -2.0, 1: -3.0},
                 [({0: 1.0, 1: 1.0}, 0.75, 0.75), ({0: 1.0}, 0.0, np.inf)])
    assert np.allclose(pr.values(), ref.values(), atol=TOL)
    assert abs(pr.dual(c0) - ref.dual(Constraint(0))) < 1e-4


def test_constant_and_bounds_change_on_equality_row():
    pr = Problem(**KW)
    pr.add_variables(2)
    pr.set_objective(quadratic={(0, 0): 2.0, (1, 1): 2.0})
    c = pr.add_constraint({0: 1.0, 1: 1.0}, lb=1.0, ub=1.0, constant=0.5)
    pr.optimize()
    # x0 + x1 + 0.5 == 1 -> x0 = x1 = 0.25
    assert np.allclose(pr.values(), [0.25, 0.25], atol=TOL)
    pr.set_constraint_constant(c, -0.5)
    pr.optimize()
    assert np.allclose(pr.values(), [0.75, 0.75], atol=TOL)


def test_bounds_update_on_deleted_handle_raises():
    pr, c0, c1 = _qp2()
    pr.optimize()
    pr.delete_constraint(c1)
    with pytest.raises(ValueError, match="deleted"):
        pr.set_constraint_bounds(c1, 0.0, 1.0)
    with pytest.raises(ValueError, match="deleted"):
        pr.set_constraint_function(c1, {0: 1.0})
    with pytest.raises(ValueError, match="deleted"):
        pr.set_dual_start(c1, 0.0)


def test_constraint_function_same_pattern_in_place_matches_fresh():
    pr, c0, c1 = _qp2()
    pr.optimize()
    solver = pr.raw_solver()
    pr.set_constraint_function(c0, {0: 2.0, 1: 0.5})
    pr.optimize()
    assert pr.raw_solver() is solver
    ref = _fresh({(0, 0): 2.0, (1, 1): 2.0}, {0: -2.0, 1: -3.0},
                 [({0: 2.0, 1: 0.5}, -np.inf, 1.5), ({0: 1.0}, 0.0, np.inf)])
    assert np.allclose(pr.values(), ref.values(), atol=TOL)


def test_constraint_function_new_pattern_resetup_matches_fresh():
    pr, c0, c1 = _qp2()
    pr.optimize()
    solver = pr.raw_solver()
    pr.set_constraint_function(c0, {1: 1.0})  # drops x0: new pattern
    pr.optimize()
    assert pr.raw_solver() is not solver
    ref = _fresh({(0, 0): 2.0, (1, 1): 2.0}, {0: -2.0, 1: -3.0},
                 [({1: 1.0}, -np.inf, 1.5), ({0: 1.0}, 0.0, np.inf)])
    assert np.allclose(pr.values(), ref.values(), atol=TOL)


def test_coefficient_add_new_variable_to_row_resetup():
    pr, c0, c1 = _qp2()
    pr.optimize()
    pr.set_constraint_coefficient(c1, 1, 1.0)  # row had only x0
    pr.optimize()
    ref = _fresh({(0, 0): 2.0, (1, 1): 2.0}, {0: -2.0, 1: -3.0},
                 [({0: 1.0, 1: 1.0}, -np.inf, 1.5),
                  ({0: 1.0, 1: 1.0}, 0.0, np.inf)])
    assert np.allclose(pr.values(), ref.values(), atol=TOL)


def test_coefficient_value_zero_keeps_pattern_in_place():
    pr, c0, c1 = _qp2()
    pr.optimize()
    solver = pr.raw_solver()
    pr.set_constraint_coefficient(c0, 0, 0.0)  # in-pattern, value-only
    pr.optimize()
    assert pr.raw_solver() is solver
    ref = _fresh({(0, 0): 2.0, (1, 1): 2.0}, {0: -2.0, 1: -3.0},
                 [({1: 1.0}, -np.inf, 1.5), ({0: 1.0}, 0.0, np.inf)])
    assert np.allclose(pr.values(), ref.values(), atol=TOL)


def test_inverted_bounds_replacement_raises_at_optimize():
    pr, c0, c1 = _qp2()
    pr.optimize()
    with pytest.raises(ValueError):
        pr.set_constraint_bounds(c0, 2.0, 1.0)
        pr.optimize()


# ---------------------------------------------------------------------------
# C. deletion + re-add sequences
# ---------------------------------------------------------------------------

def test_delete_then_readd_matches_fresh():
    pr, c0, c1 = _qp2()
    pr.optimize()
    pr.delete_constraint(c0)
    c0b = pr.add_constraint({0: 1.0, 1: 1.0}, ub=1.5)
    pr.optimize()
    ref = _fresh({(0, 0): 2.0, (1, 1): 2.0}, {0: -2.0, 1: -3.0},
                 [({0: 1.0, 1: 1.0}, -np.inf, 1.5), ({0: 1.0}, 0.0, np.inf)])
    assert np.allclose(pr.values(), ref.values(), atol=TOL)
    assert abs(pr.dual(c0b) - ref.dual(Constraint(0))) < 1e-4
    assert pr.num_constraints() == 2        # tombstone excluded


def test_delete_readd_delete_sequence():
    pr = Problem(**KW)
    pr.add_variable()
    pr.set_objective(quadratic={(0, 0): 2.0}, affine={0: -2.0})
    c = pr.add_constraint({0: 1.0}, ub=0.5)
    pr.optimize()
    for _ in range(3):
        pr.delete_constraint(c)
        pr.optimize()
        assert abs(pr.value(0) - 1.0) < TOL     # unconstrained optimum
        c = pr.add_constraint({0: 1.0}, ub=0.5)
        pr.optimize()
        assert abs(pr.value(0) - 0.5) < TOL


def test_surviving_handles_after_deletion():
    pr, c0, c1 = _qp2()
    ceq = pr.add_constraint({1: 1.0}, lb=0.25, ub=0.25)
    pr.optimize()
    pr.delete_constraint(c0)
    pr.optimize()
    ref = _fresh({(0, 0): 2.0, (1, 1): 2.0}, {0: -2.0, 1: -3.0},
                 [({0: 1.0}, 0.0, np.inf), ({1: 1.0}, 0.25, 0.25)])
    assert abs(pr.dual(ceq) - ref.dual(Constraint(1))) < 1e-4
    assert abs(pr.value(1) - 0.25) < TOL


def test_delete_all_constraints_matches_unconstrained():
    pr, c0, c1 = _qp2()
    pr.optimize()
    pr.delete_constraint(c0)
    pr.delete_constraint(c1)
    pr.optimize()
    assert np.allclose(pr.values(), [1.0, 1.5], atol=TOL)
    assert pr.num_constraints() == 0


def test_vector_constraint_row_deletion():
    pr = Problem(**KW)
    pr.add_variables(2)
    pr.set_objective(quadratic={(0, 0): 2.0, (1, 1): 2.0},
                     affine={0: -2.0, 1: -2.0})
    rows = pr.add_vector_constraint([[1.0, 0.0], [0.0, 1.0]],
                                    "nonpositives", constants=[-0.5, -0.25])
    pr.optimize()
    assert np.allclose(pr.values(), [0.5, 0.25], atol=TOL)
    pr.delete_constraint(rows[1])           # free x1's row only
    pr.optimize()
    assert np.allclose(pr.values(), [0.5, 1.0], atol=TOL)
    assert abs(pr.dual(rows[0])) > 1e-6     # surviving row still binds


# ---------------------------------------------------------------------------
# D. attribute analogues
# ---------------------------------------------------------------------------

def test_raw_status_strings():
    pr, c0, c1 = _qp2()
    pr.optimize()
    assert pr.raw_status() == "Solved"
    pr2 = Problem(max_iter=1, check_termination=0, verbose=False)
    pr2.add_variable()
    pr2.set_objective(quadratic={(0, 0): 2.0}, affine={0: -2.0})
    pr2.add_constraint({0: 1.0}, lb=-10, ub=10)
    pr2.optimize()
    assert pr2.raw_status() == "Max_iter_reached"
    assert pr2.termination_status() == "ITERATION_LIMIT"


def test_solve_time_and_iterations_attributes():
    pr, c0, c1 = _qp2()
    pr.optimize()
    assert pr.solve_time() > 0.0            # MOI SolveTimeSec analogue
    assert pr.iterations() > 0              # BarrierIterations analogue


def test_primal_dual_status_solved():
    pr, c0, c1 = _qp2()
    pr.optimize()
    assert pr.primal_status() == "FEASIBLE_POINT"
    assert pr.dual_status() == "FEASIBLE_POINT"


def test_statuses_before_optimize():
    pr = Problem(**KW)
    pr.add_variable()
    assert pr.termination_status() == "OPTIMIZE_NOT_CALLED"
    with pytest.raises(RuntimeError):
        pr.raw_status()


def test_updatable_setting_change_affects_next_solve():
    pr, c0, c1 = _qp2()
    pr.optimize()
    it_tight = pr.iterations()
    pr.set_setting("max_iter", max(it_tight - 5, 1))
    pr.set_setting("check_termination", 0)
    pr.optimize()
    assert pr.termination_status() == "ITERATION_LIMIT"
    assert pr.iterations() == max(it_tight - 5, 1)


def test_non_updatable_sigma_and_scaling_post_setup():
    pr, c0, c1 = _qp2()
    pr.optimize()
    for name in ("sigma", "scaling"):
        with pytest.raises(ValueError):
            pr.set_setting(name, 7)


def test_constructor_settings_via_get_setting():
    pr = Problem(eps_abs=1e-5, rho=0.25, verbose=False)
    assert pr.get_setting("eps_abs") == 1e-5
    assert pr.get_setting("rho") == 0.25
    assert pr.get_setting("alpha") == 1.6   # reference default


def test_objective_value_includes_constant_under_max():
    pr = Problem(**KW)
    pr.add_variable()
    pr.set_objective(affine={0: 1.0}, constant=-2.5, sense="max")
    pr.add_constraint({0: 1.0}, lb=-1.0, ub=3.0)
    pr.optimize()
    assert abs(pr.value(0) - 3.0) < 1e-5
    assert abs(pr.objective_value() - 0.5) < 1e-5


# ---------------------------------------------------------------------------
# E. starts
# ---------------------------------------------------------------------------

def test_primal_and_dual_start_at_optimum_fast():
    pr, c0, c1 = _qp2()
    pr.optimize()
    xstar = pr.values()
    duals = [pr.dual(c0), pr.dual(c1)]
    pr2 = Problem(check_termination=1, **KW)
    pr2.add_variables(2)
    pr2.set_objective(quadratic={(0, 0): 2.0, (1, 1): 2.0},
                      affine={0: -2.0, 1: -3.0})
    d0 = pr2.add_constraint({0: 1.0, 1: 1.0}, ub=1.5)
    d1 = pr2.add_constraint({0: 1.0}, lb=0.0)
    pr2.set_primal_start(xstar)
    pr2.set_dual_start(d0, duals[0])
    pr2.set_dual_start(d1, duals[1])
    pr2.optimize()
    assert pr2.iterations() <= 10           # test/warm_start.jl:47 economics
    assert np.allclose(pr2.values(), xstar, atol=1e-5)


def test_warm_start_disabled_still_correct():
    pr = Problem(warm_start=False, **KW)
    pr.add_variable()
    pr.set_objective(quadratic={(0, 0): 2.0}, affine={0: -2.0})
    c = pr.add_constraint({0: 1.0}, ub=0.75)
    pr.optimize()
    cold = pr.iterations()
    pr.optimize()                            # no auto-warm-start
    assert pr.iterations() == cold
    assert abs(pr.value(0) - 0.75) < TOL


# ---------------------------------------------------------------------------
# F. vector sets and ordering
# ---------------------------------------------------------------------------

def test_vector_nonpositives_dual_sign():
    pr = Problem(**KW)
    pr.add_variable()
    pr.set_objective(quadratic={(0, 0): 2.0}, affine={0: -4.0})
    rows = pr.add_vector_constraint([[1.0]], "nonpositives",
                                    constants=[-1.0])
    pr.optimize()                            # x <= 1 binds (optimum at 2)
    assert abs(pr.value(0) - 1.0) < TOL
    # MOI: dual of a Nonpositives constraint is <= 0
    assert pr.dual(rows[0]) < -1e-6


def test_mixed_scalar_vector_row_ordering():
    pr = Problem(**KW)
    pr.add_variables(2)
    pr.set_objective(quadratic={(0, 0): 2.0, (1, 1): 2.0},
                     affine={0: -2.0, 1: -2.0})
    cs = pr.add_constraint({0: 1.0}, ub=0.5)          # row 0
    rows = pr.add_vector_constraint([[0.0, 1.0]], "nonpositives",
                                    constants=[-0.25])  # row 1
    cs2 = pr.add_constraint({0: 1.0, 1: 1.0}, lb=-10)  # row 2 (loose)
    pr.optimize()
    assert np.allclose(pr.values(), [0.5, 0.25], atol=TOL)
    assert pr.dual(cs) < -1e-6      # LessThan binding: MOI dual <= 0
    assert pr.dual(rows[0]) < -1e-6
    assert abs(pr.dual(cs2)) < TOL
    assert pr.m == 3


def test_vector_constraint_dict_rows_and_bound_edit():
    pr = Problem(**KW)
    pr.add_variables(2)
    pr.set_objective(quadratic={(0, 0): 2.0, (1, 1): 2.0},
                     affine={0: -2.0, 1: -2.0})
    rows = pr.add_vector_constraint([{0: 1.0}, {1: 1.0}], "zeros",
                                    constants=[-0.5, -0.125])
    pr.optimize()
    assert np.allclose(pr.values(), [0.5, 0.125], atol=TOL)
    # edit one row of the vector set through its scalar handle
    pr.set_constraint_bounds(rows[1], 0.375, 0.375)
    pr.optimize()
    assert np.allclose(pr.values(), [0.5, 0.375], atol=TOL)


def test_all_zero_row_with_constant_feasibility():
    pr = Problem(**KW)
    pr.add_variable()
    pr.set_objective(quadratic={(0, 0): 2.0}, affine={0: -2.0})
    # 0*x + 1 in Nonnegatives: trivially satisfied constant row
    rows = pr.add_vector_constraint([{}], "nonnegatives", constants=[1.0])
    pr.optimize()
    assert pr.termination_status() == "OPTIMAL"
    assert abs(pr.value(0) - 1.0) < TOL
    assert abs(pr.dual(rows[0])) < TOL


# ---------------------------------------------------------------------------
# G. infeasible/unbounded x sense x offset — the grid the reference EXCLUDES
# for upstream MOI.jl wrapper issues (#1773/#1759, MOI_wrapper.jl:66-82);
# covered here since no such wrapper layer exists (see tests/CATALOG.md)
# ---------------------------------------------------------------------------

def _infeasible_pair(sense, constant):
    pr = Problem(**KW)
    pr.add_variable()
    pr.set_objective(quadratic={(0, 0): 2.0}, affine={0: 1.0},
                     constant=constant, sense=sense)
    pr.add_constraint({0: 1.0}, ub=0.0)
    pr.add_constraint({0: 1.0}, lb=1.0)
    pr.optimize()
    return pr


@pytest.mark.parametrize("sense", ["min", "max"])
@pytest.mark.parametrize("constant", [0.0, 5.0])
def test_infeasible_sense_offset_grid(sense, constant):
    if sense == "max":
        pr = Problem(**KW)
        pr.add_variable()
        pr.set_objective(quadratic={(0, 0): -2.0}, affine={0: 1.0},
                         constant=constant, sense="max")
        pr.add_constraint({0: 1.0}, ub=0.0)
        pr.add_constraint({0: 1.0}, lb=1.0)
        pr.optimize()
    else:
        pr = _infeasible_pair(sense, constant)
    assert pr.termination_status() in ("INFEASIBLE", "ALMOST_INFEASIBLE")
    assert pr.dual_status() == "INFEASIBILITY_CERTIFICATE"
    # Farkas ray through the MOI-sign dual getter: u'(-d)_+ + l'(-d)_- < 0
    d = pr.duals()
    y = -d
    val = (0.0 * max(y[0], 0.0) + 1.0 * min(y[1], 0.0))
    assert val < 0.0


@pytest.mark.parametrize("sense", ["min", "max"])
@pytest.mark.parametrize("constant", [0.0, -3.0])
def test_unbounded_sense_offset_grid(sense, constant):
    pr = Problem(**KW)
    pr.add_variable()
    coef = 1.0 if sense == "min" else -1.0
    pr.set_objective(affine={0: coef}, constant=constant, sense=sense)
    pr.add_constraint({0: 1.0}, ub=10.0)     # free toward -inf
    pr.optimize()
    assert pr.termination_status() == "DUAL_INFEASIBLE"
    assert pr.primal_status() == "INFEASIBILITY_CERTIFICATE"
    ray = pr.values()                        # primal ray convention
    assert ray[0] < 0.0                      # descends toward -inf
    v = pr.objective_value()
    assert (v == -np.inf) if sense == "min" else (v == np.inf)


@pytest.mark.parametrize("sense", ["min", "max"])
def test_infeasible_affine_sense(sense):
    pr = Problem(**KW)
    pr.add_variable()
    coef = 1.0 if sense == "min" else -1.0
    pr.set_objective(affine={0: coef}, sense=sense)   # P = 0
    pr.add_constraint({0: 1.0}, ub=0.0)
    pr.add_constraint({0: 1.0}, lb=1.0)
    pr.optimize()
    assert pr.termination_status() in ("INFEASIBLE", "ALMOST_INFEASIBLE")


# ---------------------------------------------------------------------------
# H. misc
# ---------------------------------------------------------------------------

def test_repeat_optimize_no_change_reuses_solver():
    pr, c0, c1 = _qp2()
    r1 = pr.optimize()
    solver = pr.raw_solver()
    r2 = pr.optimize()
    assert pr.raw_solver() is solver
    assert np.allclose(r1.x, r2.x, atol=1e-6)
    assert pr.iterations() <= 25             # auto-warm-start from optimum


def test_version_via_raw_solver():
    import osqp_tpu
    assert osqp_tpu.version().startswith("osqp-tpu")
    pr, c0, c1 = _qp2()
    pr.optimize()
    n, m = pr.raw_solver().dimensions()
    assert (n, m) == (2, 2)
