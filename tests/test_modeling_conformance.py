"""Modeling-layer conformance breadth (round-1 verdict item #5), mirroring
the reference's MOI test harness:

- randomized modification sweep: 100 random model modifications with
  modify-vs-fresh-setup equality asserted along the way (the reference's
  randomized constraint-modification loop, test/MOI_wrapper.jl:590-613, and
  its `_test_optimizer_modification` differential harness :207-264);
- first-class vector sets Zeros / Nonnegatives / Nonpositives
  (MOI_wrapper.jl:24-42, :860-873);
- variable deletion: documented refusal (the reference MOI wrapper
  implements no MOI.delete for variables).
"""

import numpy as np
import pytest

import osqp_tpu as osqp
from osqp_tpu.modeling import Problem

ATOL = 1e-5


def _fresh_solve(P, q, A, l, u):
    model = osqp.Model()
    model.setup(P=P, q=q, A=A, l=l, u=u, verbose=False,
                eps_abs=1e-8, eps_rel=1e-8, max_iter=40000)
    return model.solve()


# --------------------------------------------------------------- vector sets


def test_vector_sets_zeros_nonneg_nonpos():
    """x'Px/2 + q'x with Aeq x + beq ∈ Zeros, G x ∈ Nonnegatives,
    H x + h ∈ Nonpositives — must equal the direct Model solve of the
    equivalent rows."""
    rng = np.random.RandomState(4)
    n = 6
    M = rng.randn(n, n)
    P = M.T @ M + 0.5 * np.eye(n)
    q = rng.randn(n)
    Aeq = rng.randn(2, n)
    beq = rng.randn(2) * 0.1
    G = rng.randn(3, n)
    H = rng.randn(2, n)
    h = rng.randn(2) * 0.1

    p = Problem(eps_abs=1e-8, eps_rel=1e-8, verbose=False)
    x = p.add_variables(n)
    p.set_objective(quadratic=P, affine=q)
    cz = p.add_vector_constraint(Aeq, "zeros", constants=beq)
    cn = p.add_vector_constraint(G, "nonnegatives")
    cp = p.add_vector_constraint(H, "nonpositives", constants=h)
    assert len(cz) == 2 and len(cn) == 3 and len(cp) == 2
    p.optimize()
    assert p.termination_status() == "OPTIMAL"

    A = np.vstack([Aeq, G, H])
    l = np.concatenate([-beq, np.zeros(3), np.full(2, -np.inf)])
    u = np.concatenate([-beq, np.full(3, np.inf), -h])
    r = _fresh_solve(P, q, A, l, u)
    assert r.info.status == "Solved"
    np.testing.assert_allclose(p.values(), r.x, atol=ATOL)
    # set membership holds at the solution
    xs = p.values()
    np.testing.assert_allclose(Aeq @ xs + beq, 0.0, atol=1e-6)
    assert np.all(G @ xs >= -1e-6)
    assert np.all(H @ xs + h <= 1e-6)


def test_vector_set_validation():
    p = Problem()
    p.add_variables(2)
    with pytest.raises(ValueError, match="set_type"):
        p.add_vector_constraint(np.eye(2), "conic")
    with pytest.raises(ValueError, match="length"):
        p.add_vector_constraint(np.eye(2), "zeros", constants=[1.0])


def test_delete_variable_refused():
    p = Problem()
    v = p.add_variable()
    with pytest.raises(NotImplementedError, match="parity with the reference"):
        p.delete_variable(v)


# ------------------------------------------------- randomized 100-mod sweep


def test_randomized_modification_sweep():
    """100 random modifications (bounds, constraint coefficients, objective
    coefficients, constants, function replacement); every 10 mods the
    incrementally-modified Problem must match a fresh setup of the shadow
    data — the reference's randomized loop + `_test_optimizer_modification`
    combined (test/MOI_wrapper.jl:207-264, :590-613)."""
    rng = np.random.RandomState(99)
    n, m = 6, 9
    M = rng.randn(n, n)
    P = M.T @ M + 0.8 * np.eye(n)
    q = rng.randn(n)
    A = rng.randn(m, n)
    A[np.abs(A) < 0.3] = 0.0  # sparsity so pattern-preserving mods exist
    A[:, 0] = 1.0             # keep every row nonempty
    c0 = rng.randn(m) * 0.1
    w = 1.0 + rng.rand(m)
    l = c0 - w
    u = c0 + w

    p = Problem(eps_abs=1e-8, eps_rel=1e-8, verbose=False, max_iter=40000)
    xs = p.add_variables(n)
    p.set_objective(quadratic=P, affine=q)
    cons = [p.add_constraint({j: A[i, j] for j in range(n)
                              if A[i, j] != 0.0}, lb=l[i], ub=u[i])
            for i in range(m)]

    # shadow copies mirror every modification
    As = A.copy()
    qs = q.copy()
    ls = l.copy()
    us = u.copy()
    consts = np.zeros(m)

    n_checks = 0
    for step in range(100):
        kind = rng.randint(5)
        i = rng.randint(m)
        if kind == 0:  # bounds change
            c = rng.randn() * 0.2
            width = 0.5 + rng.rand()
            p.set_constraint_bounds(cons[i], c - width, c + width)
            ls[i], us[i] = c - width - consts[i], c + width - consts[i]
        elif kind == 1:  # coefficient change within the pattern
            nz = [j for j in range(n) if As[i, j] != 0.0]
            j = nz[rng.randint(len(nz))]
            v = rng.randn()
            if v == 0.0:
                v = 0.5
            p.set_constraint_coefficient(cons[i], j, v)
            As[i, j] = v
        elif kind == 2:  # objective linear coefficient
            j = rng.randint(n)
            v = rng.randn()
            p.set_objective_coefficient(xs[j], v)
            qs[j] = v
        elif kind == 3:  # constraint constant (refolds into both bounds)
            cc = rng.randn() * 0.1
            p.set_constraint_constant(cons[i], cc)
            ls[i] += consts[i] - cc
            us[i] += consts[i] - cc
            consts[i] = cc
        else:  # function replacement preserving the pattern
            nz = [j for j in range(n) if As[i, j] != 0.0]
            newvals = {j: float(rng.randn()) or 0.5 for j in nz}
            p.set_constraint_function(cons[i], newvals,
                                      constant=consts[i])
            for j, v in newvals.items():
                As[i, j] = v

        if (step + 1) % 10 == 0:
            p.optimize()
            r = _fresh_solve(P, qs, As, ls, us)
            assert p.raw_status() == r.info.status, step
            if r.info.status == "Solved":
                np.testing.assert_allclose(
                    p.values(), r.x, atol=ATOL,
                    err_msg=f"divergence after {step + 1} mods")
                assert abs(p.objective_value() - r.info.obj_val) \
                    < 1e-4 * (1 + abs(r.info.obj_val))
                n_checks += 1
    assert n_checks >= 8  # nearly all checkpoints solvable and compared
