"""Native C++ backend (native/solver.cpp via ctypes) — differential tests
against the JAX engine and the reference contracts."""

import numpy as np
import pytest
import scipy.sparse as sp

import osqp_tpu as osqp
from osqp_tpu.native import NativeModel

TOL = 1e-4


def make_problem(n=30, m=50, seed=0, sparse_frac=0.5):
    rng = np.random.RandomState(seed)
    M = rng.randn(n, n) * (rng.rand(n, n) < sparse_frac)
    P = M.T @ M + 0.2 * np.eye(n)
    q = rng.randn(n)
    A = rng.randn(m, n) * (rng.rand(m, n) < sparse_frac)
    l = -1 - rng.rand(m)
    u = 1 + rng.rand(m)
    return P, q, A, l, u


def test_native_matches_jax():
    P, q, A, l, u = make_problem()
    kw = dict(eps_abs=1e-6, eps_rel=1e-6)
    nm = NativeModel().setup(P=P, q=q, A=A, l=l, u=u, **kw)
    rn = nm.solve()
    jm = osqp.Model()
    jm.setup(P=P, q=q, A=A, l=l, u=u, verbose=False, **kw)
    rj = jm.solve()
    assert rn.info.status == rj.info.status == "Solved"
    np.testing.assert_allclose(rn.x, rj.x, atol=TOL)
    np.testing.assert_allclose(rn.y, rj.y, atol=TOL)
    assert abs(rn.info.obj_val - rj.info.obj_val) < TOL


def test_native_basic_qp_exact():
    # the reference basic QP expected values (test/basic.jl:43-49)
    P = np.array([[11.0, 0.0], [0.0, 0.0]])
    q = np.array([3.0, 4.0])
    A = np.array([[-1.0, 0], [0, -1.0], [-1, -3.0], [2, 5.0], [3, 4.0]])
    u = np.array([0.0, 0.0, -15.0, 100.0, 80.0])
    l = -np.inf * np.ones(5)
    nm = NativeModel().setup(P=P, q=q, A=A, l=l, u=u,
                             eps_abs=1e-9, eps_rel=1e-9,
                             check_termination=1, rho=0.1,
                             adaptive_rho=False)
    r = nm.solve()
    assert r.info.status == "Solved"
    np.testing.assert_allclose(r.x, [0.0, 5.0], atol=1e-5)
    np.testing.assert_allclose(
        r.y, [1.666666666, 0.0, 1.33333333, 0.0, 0.0], atol=1e-5)
    assert abs(r.info.obj_val - 20.0) < 1e-5


def test_native_polish():
    P, q, A, l, u = make_problem(seed=3)
    nm = NativeModel().setup(P=P, q=q, A=A, l=l, u=u,
                             eps_abs=1e-3, eps_rel=1e-3, polish=True)
    r = nm.solve()
    assert r.info.status == "Solved"
    assert r.info.status_polish == 1
    # polished KKT residuals should be tiny
    stat = np.linalg.norm(P @ r.x + q + A.T @ r.y, np.inf)
    assert stat < 1e-6


def test_native_primal_infeasible():
    P = np.zeros((2, 2))
    q = np.array([-1.0, -1.0])
    A = np.array([[1.0, 0.0], [1.0, 0.0]])
    l = np.array([1.0, 3.0])
    u = np.array([2.0, 4.0])
    nm = NativeModel().setup(P=P, q=q, A=A, l=l, u=u)
    r = nm.solve()
    assert r.info.status == "Primal_infeasible"
    assert np.all(np.isnan(r.x))
    dy = r.prim_inf_cert
    assert u @ np.maximum(dy, 0) + l @ np.minimum(dy, 0) < 0


def test_native_dual_infeasible():
    P = np.zeros((2, 2))
    q = np.array([2.0, -1.0])
    A = np.eye(2)
    l = np.zeros(2)
    u = np.inf * np.ones(2)
    nm = NativeModel().setup(P=P, q=q, A=A, l=l, u=u,
                             eps_abs=1e-5, eps_rel=1e-5,
                             eps_prim_inf=1e-15, check_termination=1)
    r = nm.solve()
    assert r.info.status == "Dual_infeasible"


def test_native_nonconvex_setup_fails():
    P = np.array([[2.0, 5.0], [5.0, 1.0]])
    q = np.array([3.0, 4.0])
    A = np.eye(2)
    with pytest.raises(ValueError):
        NativeModel().setup(P=P, q=q, A=A, l=-np.ones(2), u=np.ones(2),
                            sigma=1e-6)


def test_native_update_and_warm_start():
    P, q, A, l, u = make_problem(seed=5)
    nm = NativeModel().setup(P=P, q=q, A=A, l=l, u=u,
                             eps_abs=1e-6, eps_rel=1e-6)
    r1 = nm.solve()
    nm.update(q=q * 2.0)
    nm.update(l=l - 0.5, u=u + 0.5)
    r2 = nm.solve()
    jm = osqp.Model()
    jm.setup(P=P, q=q * 2.0, A=A, l=l - 0.5, u=u + 0.5, verbose=False,
             eps_abs=1e-6, eps_rel=1e-6)
    rj = jm.solve()
    np.testing.assert_allclose(r2.x, rj.x, atol=TOL)

    nm.warm_start(x=r2.x, y=r2.y)
    r3 = nm.solve()
    assert r3.info.iter <= 50


def test_native_update_P_A_values():
    P, q, A, l, u = make_problem(n=8, m=12, seed=7, sparse_frac=0.8)
    nm = NativeModel().setup(P=P, q=q, A=A, l=l, u=u,
                             eps_abs=1e-7, eps_rel=1e-7)
    nm.solve()
    # scale all P (triu csc order) and A values
    Pv = nm._P_pat.vals * 1.5
    Av = nm._A_pat.vals * 0.8
    nm.update(Px=Pv, Ax=Av)
    r = nm.solve()
    jm = osqp.Model()
    jm.setup(P=P * 1.5, q=q, A=A * 0.8, l=l, u=u, verbose=False,
             eps_abs=1e-7, eps_rel=1e-7)
    rj = jm.solve()
    np.testing.assert_allclose(r.x, rj.x, atol=TOL)


def test_native_unconstrained():
    rng = np.random.RandomState(2)
    n = 12
    P = np.diag(rng.rand(n) + 0.3)
    q = rng.randn(n)
    nm = NativeModel().setup(P=P, q=q, eps_abs=1e-8, eps_rel=1e-8,
                             eps_dual_inf=1e-18)
    r = nm.solve()
    assert r.info.status == "Solved"
    np.testing.assert_allclose(r.x, -np.linalg.solve(P, q), atol=1e-5)


def test_native_update_settings():
    P, q, A, l, u = make_problem(seed=9)
    nm = NativeModel().setup(P=P, q=q, A=A, l=l, u=u,
                             eps_abs=1e-4, eps_rel=1e-4)
    nm.solve()
    nm.update_settings(max_iter=30, eps_abs=1e-12, eps_rel=1e-12,
                       check_termination=1)
    nm.warm_start(x=np.zeros(nm.n), y=np.zeros(nm.m))
    r = nm.solve()
    assert r.info.status == "Max_iter_reached"
    assert r.info.iter == 30
    with pytest.raises(ValueError):
        nm.update_settings(scaling=5)


def test_native_one_sided_bound_update():
    # lcache/ucache pattern (interface.jl:252-313): updating only l keeps u
    P, q, A, l, u = make_problem(seed=11)
    nm = NativeModel().setup(P=P, q=q, A=A, l=l, u=u,
                             eps_abs=1e-6, eps_rel=1e-6)
    nm.solve()
    nm.update(l=l - 1.0)
    r = nm.solve()
    jm = osqp.Model()
    jm.setup(P=P, q=q, A=A, l=l - 1.0, u=u, verbose=False,
             eps_abs=1e-6, eps_rel=1e-6)
    rj = jm.solve()
    np.testing.assert_allclose(r.x, rj.x, atol=TOL)


def test_native_cold_start_setting():
    # regression: warm_start=False must cold-start every solve
    P, q, A, l, u = make_problem(seed=13)
    kw = dict(eps_abs=1e-6, eps_rel=1e-6, adaptive_rho=False,
              check_termination=1, warm_start=False)
    nm = NativeModel().setup(P=P, q=q, A=A, l=l, u=u, **kw)
    r1 = nm.solve()
    r2 = nm.solve()
    assert r1.info.iter == r2.info.iter  # identical cold trajectories


def test_native_polish_keeps_admm_warm_start():
    # regression: polish must not overwrite the warm-start iterates
    P, q, A, l, u = make_problem(seed=14)
    kw = dict(eps_abs=1e-4, eps_rel=1e-4, adaptive_rho=False,
              check_termination=1)
    a = NativeModel().setup(P=P, q=q, A=A, l=l, u=u, polish=True, **kw)
    a.solve()
    ra = a.solve()
    b = NativeModel().setup(P=P, q=q, A=A, l=l, u=u, polish=False, **kw)
    b.solve()
    rb = b.solve()
    # second-solve trajectories must match the unpolished model's
    assert ra.info.iter == rb.info.iter


def test_native_state_roundtrip():
    P, q, A, l, u = make_problem(seed=21)
    kw = dict(eps_abs=1e-8, eps_rel=1e-8, adaptive_rho=False,
              check_termination=1)
    a = NativeModel().setup(P=P, q=q, A=A, l=l, u=u, **kw)
    a.solve()
    st = a.get_state()
    b = NativeModel().setup(P=P, q=q, A=A, l=l, u=u, **kw)
    b.set_state(st)
    r = b.solve()
    assert r.info.iter <= 10


def test_native_verbose_log(capfd):
    """Verbose iteration log (reference C core prints header/rows/footer when
    verbose — Settings:129): on by default, silenced by verbose=False, and
    togglable post-setup via update_settings."""
    P = sp.csc_matrix(np.array([[4.0, 1.0], [1.0, 2.0]]))
    q = np.array([1.0, 1.0])
    A = sp.csc_matrix(np.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]]))
    l = np.array([1.0, 0.0, 0.0])
    u = np.array([1.0, 0.7, 0.7])

    m = NativeModel().setup(P=P, q=q, A=A, l=l, u=u)
    m.solve()
    out = capfd.readouterr().out
    assert "tpuqp: n = 2, m = 3" in out
    assert "pri_res" in out and "status: solved" in out
    assert "number of iterations:" in out

    m2 = NativeModel().setup(P=P, q=q, A=A, l=l, u=u, verbose=False)
    m2.solve()
    assert capfd.readouterr().out == ""

    m2.update_settings(verbose=True)
    m2.solve()
    assert "status: solved" in capfd.readouterr().out


def test_native_ordering_arbitration(capfd):
    """Fill-minimizing ordering choice among RCM / exact min-degree / AMD
    (the verbose header reports the winner): exact min-degree edges out AMD
    on this small irregular pattern; AMD beats RCM on the banded MPC KKT.
    Solutions must match the JAX Model either way."""
    rng = np.random.RandomState(7)
    n, m = 120, 180
    Pd = sp.random(n, n, density=0.04, random_state=rng)
    P = (Pd @ Pd.T + sp.eye(n) * 0.5).tocsc()
    A = sp.vstack([sp.random(m, n, density=0.04, random_state=rng),
                   sp.eye(n)]).tocsc()
    q = rng.randn(n)
    l = -np.ones(A.shape[0])
    u = np.ones(A.shape[0])
    r = NativeModel().setup(P=P, q=q, A=A, l=l, u=u,
                            eps_abs=1e-8, eps_rel=1e-8).solve()
    out = capfd.readouterr().out
    assert "min-degree ordering" in out
    mm = osqp.Model()
    mm.setup(P=P, q=q, A=A, l=l, u=u, eps_abs=1e-8, eps_rel=1e-8,
             verbose=False)
    assert np.max(np.abs(r.x - mm.solve().x)) < 1e-6

    from osqp_tpu.problems import control_qp
    P2, q2, A2, l2, u2 = control_qp(nx=6, nu=3, T=10, seed=0)
    NativeModel().setup(P=P2, q=q2, A=A2, l=l2, u=u2).solve()
    assert "(AMD ordering)" in capfd.readouterr().out


def test_native_amd_beyond_mindeg_limit(capfd):
    """AMD (quotient-graph approximate min-degree, native/ldl.cpp::amd_order)
    handles KKT sizes where the exact-degree mindeg_order declines (N > 6000):
    the verbose header must report AMD — not the RCM fallback — and the solve
    must still be correct (KKT residual check against the box projection)."""
    rng = np.random.RandomState(3)
    n, m0 = 3500, 3200  # N = n + m0 + n > mindeg's decline threshold
    P = sp.eye(n, format="csc") * 2.0
    A = sp.vstack([sp.random(m0, n, density=0.0015, random_state=rng,
                             format="csc"), sp.eye(n)]).tocsc()
    q = rng.randn(n)
    l = -np.ones(A.shape[0])
    u = np.ones(A.shape[0])
    r = NativeModel().setup(P=P, q=q, A=A, l=l, u=u,
                            eps_abs=1e-6, eps_rel=1e-6).solve()
    out = capfd.readouterr().out
    assert "(AMD ordering)" in out
    assert r.info.status == "Solved"
    # stationarity on inactive coordinates: P x + q + A' y ~ 0
    res = P @ r.x + q + A.T @ r.y
    assert np.max(np.abs(res)) < 1e-4
