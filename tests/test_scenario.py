"""Consensus ADMM for two-stage scenario QPs — verified against solving the
monolithic coupled QP directly (BASELINE config #5 class)."""

import numpy as np

import osqp_tpu as osqp
from osqp_tpu.parallel.scenario import ScenarioQP
from osqp_tpu.settings import Settings


def make_scenario_problem(S=4, k=3, nv=5, m=12, seed=0):
    """S scenarios over z_s=[w; v_s], shared structure, varying data."""
    rng = np.random.RandomState(seed)
    n = k + nv
    M = rng.randn(n, n) / np.sqrt(n)
    P = M.T @ M + 0.5 * np.eye(n)
    A = rng.randn(m, n) / np.sqrt(n)
    q = rng.randn(S, n)
    c = rng.randn(S, m) * 0.1
    w = 1.0 + rng.rand(S, m)
    return P, q, A, c - w, c + w


def solve_monolithic(P, q, A, l, u, k):
    """Reference: one big QP over [w, v_1..v_S] with w shared."""
    S, n = q.shape
    nv = n - k
    m = l.shape[1]
    N = k + S * nv
    Pb = np.zeros((N, N))
    qb = np.zeros(N)
    Ab = np.zeros((S * m, N))
    lb = np.zeros(S * m)
    ub = np.zeros(S * m)
    for s in range(S):
        vs = slice(k + s * nv, k + (s + 1) * nv)
        # quadratic blocks
        Pb[:k, :k] += P[:k, :k]
        Pb[:k, vs] += P[:k, k:]
        Pb[vs, :k] += P[k:, :k]
        Pb[vs, vs] += P[k:, k:]
        qb[:k] += q[s, :k]
        qb[vs] = q[s, k:]
        rs = slice(s * m, (s + 1) * m)
        Ab[rs, :k] = A[:, :k]
        Ab[rs, vs] = A[:, k:]
        lb[rs] = l[s]
        ub[rs] = u[s]
    model = osqp.Model()
    model.setup(P=Pb, q=qb, A=Ab, l=lb, u=ub, verbose=False,
                eps_abs=1e-8, eps_rel=1e-8, polish=True, max_iter=20000)
    r = model.solve()
    assert r.info.status == "Solved"
    return r.x[:k], r.x


def test_scenario_consensus_matches_monolithic():
    P, q, A, l, u = make_scenario_problem()
    k = 3
    sol = ScenarioQP(
        k=k, gamma=2.0, eps_consensus=1e-5, max_outer=300,
        settings=Settings(verbose=False, eps_abs=1e-7, eps_rel=1e-7,
                          adaptive_rho=False)).solve(P, q, A, l, u)
    assert sol.converged, (sol.consensus_pri, sol.consensus_dua)
    assert np.all(sol.statuses == 1)

    w_ref, _ = solve_monolithic(P, q, A, l, u, k)
    np.testing.assert_allclose(sol.w, w_ref, atol=1e-3)


def test_scenario_warm_started_outer_loop_converges_quickly():
    P, q, A, l, u = make_scenario_problem(seed=3)
    solver = ScenarioQP(
        k=3, gamma=2.0, eps_consensus=1e-4, max_outer=300,
        settings=Settings(verbose=False, eps_abs=1e-6, eps_rel=1e-6,
                          adaptive_rho=False))
    s1 = solver.solve(P, q, A, l, u)
    assert s1.converged
    assert s1.outer_iters < 300


def test_scenario_fused_matches_host_loop():
    P, q, A, l, u = make_scenario_problem(seed=5)
    kw = dict(k=3, gamma=2.0, eps_consensus=1e-5, max_outer=300,
              settings=Settings(verbose=False, eps_abs=1e-7, eps_rel=1e-7,
                                adaptive_rho=False))
    sf = ScenarioQP(**kw).solve(P, q, A, l, u, fused=True)
    sh = ScenarioQP(**kw).solve(P, q, A, l, u, fused=False)
    assert sf.converged and sh.converged
    assert sf.outer_iters == sh.outer_iters
    np.testing.assert_allclose(sf.w, sh.w, atol=1e-8)


def test_scenario_tf32_converges_to_same_consensus():
    """ScenarioQP threads Settings.matmul_precision into the fused outer
    loop: the tf32 run must converge to the same consensus block within
    the consensus tolerance."""
    import numpy as np
    P, q, A, l, u = make_scenario_problem(seed=5)
    res = {}
    for mp in ("float32", "tensorfloat32"):
        solver = ScenarioQP(
            k=3, gamma=2.0, eps_consensus=1e-4, max_outer=300,
            settings=Settings(verbose=False, eps_abs=1e-6, eps_rel=1e-6,
                              dtype=np.float32, matmul_precision=mp))
        r = solver.solve(P, q, A, l, u)
        assert r.converged, mp
        res[mp] = np.asarray(r.w)
    np.testing.assert_allclose(res["float32"], res["tensorfloat32"],
                               atol=5e-4)
