"""Port of /root/reference/test/non_convex.jl: setup failure for indefinite P
with small sigma; Non_convex status + NaN objective with large sigma."""

import numpy as np
import pytest

import osqp_tpu as osqp


def problem():
    P = np.array([[2.0, 5.0], [5.0, 1.0]])  # indefinite (eigs ~ -3.5, 6.5)
    q = np.array([3.0, 4.0])
    A = np.array([[-1.0, 0.0], [0.0, -1.0], [-1.0, -3.0],
                  [2.0, 5.0], [3.0, 4.0]])
    u = np.array([0.0, 0.0, -15.0, 100.0, 80.0])
    l = -np.inf * np.ones(len(u))
    return P, q, A, l, u


def test_non_convex_small_sigma():
    # non_convex.jl:13-21: setup must fail (P + 1e-6 I indefinite)
    P, q, A, l, u = problem()
    model = osqp.Model()
    with pytest.raises(ValueError):
        model.setup(P=P, q=q, A=A, l=l, u=u, verbose=False, sigma=1e-6)


def test_non_convex_big_sigma():
    # non_convex.jl:24-41: setup succeeds (P + 5 I is PD) but the solve
    # detects non-convexity: status Non_convex, NaN objective
    P, q, A, l, u = problem()
    model = osqp.Model()
    model.setup(P=P, q=q, A=A, l=l, u=u, verbose=False, sigma=5.0)
    results = model.solve()
    assert results.info.status == "Non_convex"
    assert np.isnan(results.info.obj_val)
