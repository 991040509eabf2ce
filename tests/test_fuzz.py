"""Randomized differential fuzzing: the JAX engine vs the independent NumPy
reference across random problems, random settings, and random update
sequences (the reference suite's differential pattern, broadened)."""

import numpy as np
import pytest

import osqp_tpu as osqp
from osqp_tpu.utils.npref import solve_np


def random_problem(rng):
    n = int(rng.randint(2, 40))
    m = int(rng.randint(1, 60))
    M = rng.randn(n, n) / np.sqrt(n)
    P = M.T @ M + (0.05 + rng.rand()) * np.eye(n)
    q = rng.randn(n) * (1 + 2 * rng.rand())
    A = rng.randn(m, n) / np.sqrt(n)
    style = rng.randint(3)
    if style == 0:  # two-sided boxes
        c = rng.randn(m) * 0.2
        w = 0.5 + rng.rand(m)
        l, u = c - w, c + w
    elif style == 1:  # mix of one-sided and equalities
        l = np.where(rng.rand(m) < 0.3, -np.inf, -1 - rng.rand(m))
        u = 1 + rng.rand(m)
        eq = rng.rand(m) < 0.2
        mid = np.where(np.isfinite(l), (np.where(np.isfinite(l), l, 0) + u) / 2,
                       u - 1)
        l = np.where(eq, mid, l)
        u = np.where(eq, mid, u)
    else:  # loose rows included
        l = np.where(rng.rand(m) < 0.2, -np.inf, -2.0 * np.ones(m))
        u = np.where(rng.rand(m) < 0.2, np.inf, 2.0 * np.ones(m))
        both_inf = ~np.isfinite(l) & ~np.isfinite(u)
        l = np.where(both_inf, -np.inf, l)
    return P, q, A, l, u


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_differential_vs_npref(seed):
    rng = np.random.RandomState(1000 + seed)
    P, q, A, l, u = random_problem(rng)
    settings = dict(
        eps_abs=10.0 ** -rng.randint(5, 8),
        eps_rel=10.0 ** -rng.randint(5, 8),
        rho=float(10.0 ** (rng.rand() * 2 - 2)),
        alpha=float(1.0 + rng.rand() * 0.8),
        scaling=int(rng.choice([0, 5, 10])),
        adaptive_rho=bool(rng.rand() < 0.7),
        check_termination=int(rng.choice([1, 10, 25])),
        max_iter=20000,
    )
    x_np, y_np, _, status_np = solve_np(P, q, A, l, u, **settings)

    model = osqp.Model()
    model.setup(P=P, q=q, A=A, l=l, u=u, verbose=False, **settings)
    r = model.solve()

    if status_np != "Solved" or r.info.status != "Solved":
        if (status_np == "Max_iter_reached"
                and r.info.status.startswith("Primal_inf")):
            # the NumPy oracle has no infeasibility detection; require a
            # valid certificate instead of status equality
            dy = r.prim_inf_cert
            lc = np.clip(l, -1e30, 1e30)
            uc = np.clip(u, -1e30, 1e30)
            assert np.linalg.norm(A.T @ dy, np.inf) < 1e-3
            val = (np.where(np.isfinite(u), uc, 0) @ np.maximum(dy, 0)
                   + np.where(np.isfinite(l), lc, 0) @ np.minimum(dy, 0))
            assert val < 0
            return
        # otherwise both engines must agree on solvability
        assert status_np == r.info.status, (status_np, r.info.status)
        return
    tol = 50 * max(settings["eps_abs"], settings["eps_rel"])
    scale = 1 + np.linalg.norm(x_np, np.inf)
    assert np.linalg.norm(r.x - x_np, np.inf) / scale < tol, (
        np.linalg.norm(r.x - x_np, np.inf), tol)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_update_equals_fresh(seed):
    rng = np.random.RandomState(2000 + seed)
    P, q, A, l, u = random_problem(rng)
    kw = dict(verbose=False, eps_abs=1e-7, eps_rel=1e-7,
              adaptive_rho=False, check_termination=1, max_iter=20000)
    model = osqp.Model()
    model.setup(P=P, q=q, A=A, l=l, u=u, **kw)
    model.solve()
    # random sequence of value updates
    q2 = q + rng.randn(*q.shape) * 0.3
    shift = rng.rand() * 0.5
    l2 = l - shift
    u2 = u + shift
    model.update(q=q2, l=l2, u=u2)
    r_inc = model.solve()

    fresh = osqp.Model()
    fresh.setup(P=P, q=q2, A=A, l=l2, u=u2, **kw)
    r_fresh = fresh.solve()
    assert r_inc.info.status == r_fresh.info.status
    if r_inc.info.status == "Solved":
        np.testing.assert_allclose(r_inc.x, r_fresh.x, atol=1e-4)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_batched_matches_model(seed):
    # randomized batched-vs-single differential across engines
    from osqp_tpu.batch import BatchedSolver
    from osqp_tpu.settings import Settings

    rng = np.random.RandomState(3000 + seed)
    B = int(rng.randint(2, 5))
    n = int(rng.randint(4, 12))
    m = int(rng.randint(3, 16))
    M = rng.randn(n, n) / np.sqrt(n)
    P = M.T @ M + (0.1 + rng.rand()) * np.eye(n)
    A = rng.randn(m, n) / np.sqrt(n)
    q = rng.randn(B, n)
    c = rng.randn(B, m) * 0.2
    w = 0.5 + rng.rand(B, m)
    l, u = c - w, c + w
    eps = 10.0 ** -rng.randint(5, 7)
    s = Settings(verbose=False, eps_abs=eps, eps_rel=eps,
                 adaptive_rho=bool(rng.rand() < 0.5))
    mode = ["inverse", "chol", "shared"][rng.randint(3)]
    out = BatchedSolver(settings=s, kkt_mode=mode).solve(P, q, A, l, u)
    for i in range(B):
        model = osqp.Model()
        model.setup(P=P, q=q[i], A=A, l=l[i], u=u[i], verbose=False,
                    eps_abs=eps, eps_rel=eps)
        r = model.solve()
        assert int(out.status[i]) == 1 and r.info.status == "Solved", mode
        np.testing.assert_allclose(np.asarray(out.x[i]), r.x,
                                   atol=100 * eps, err_msg=mode)


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_indirect_matches_direct(seed):
    """Direct vs matrix-free-CG differential under random problems and
    settings: with the auto budget (min(n+30, 64), round-3 cap) the capped
    warm-started inner solves must keep the same statuses and solutions as
    exact factorization (summable-inexactness contract)."""
    rng = np.random.RandomState(7000 + seed)
    P, q, A, l, u = random_problem(rng)
    settings = dict(
        eps_abs=10.0 ** -rng.randint(5, 7),
        eps_rel=10.0 ** -rng.randint(5, 7),
        rho=float(10.0 ** (rng.rand() * 2 - 2)),
        alpha=float(1.0 + rng.rand() * 0.8),
        scaling=int(rng.choice([0, 10])),
        adaptive_rho=bool(rng.rand() < 0.7),
        check_termination=int(rng.choice([5, 25])),
        max_iter=20000,
        verbose=False,
    )
    md = osqp.Model()
    md.setup(P=P, q=q, A=A, l=l, u=u, **settings)
    rd = md.solve()
    mi = osqp.Model()
    mi.setup(P=P, q=q, A=A, l=l, u=u, linsys_solver="indirect", **settings)
    ri = mi.solve()

    assert ri.info.status == rd.info.status
    if rd.info.status == "Solved":
        scale = 1.0 + np.max(np.abs(rd.x))
        assert np.max(np.abs(ri.x - rd.x)) / scale < 1e-4
        assert abs(ri.info.obj_val - rd.info.obj_val) \
            / (1 + abs(rd.info.obj_val)) < 1e-6


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_sparse_routing_differential(seed):
    """SparseModel's routed dense-direct default vs its forced matrix-free
    path on random sparse problems: statuses and solutions must agree."""
    import scipy.sparse as sp
    from osqp_tpu.sparse_core import SparseModel

    rng = np.random.RandomState(9000 + seed)
    n = int(rng.randint(10, 60))
    m = int(rng.randint(10, 90))
    density = float(0.05 + 0.3 * rng.rand())
    Ph = sp.random(n, n, density=density, random_state=rng, format="csc")
    P = (Ph.T @ Ph + (0.1 + rng.rand()) * sp.eye(n)).tocsc()
    q = rng.randn(n)
    A = (sp.random(m, n, density=density, random_state=rng, format="csc")
         + 0.01 * sp.eye(m, n)).tocsc()
    c = rng.randn(m) * 0.2
    w = 0.5 + rng.rand(m)
    l, u = c - w, c + w
    kw = dict(verbose=False, eps_abs=1e-7, eps_rel=1e-7, max_iter=20000,
              polish=bool(rng.rand() < 0.5))
    rd = SparseModel().setup(P=P, q=q, A=A, l=l, u=u, **kw).solve()
    ri = SparseModel().setup(P=P, q=q, A=A, l=l, u=u,
                             linsys_solver="indirect", **kw).solve()
    assert rd.info.status == ri.info.status == "Solved"
    scale = 1.0 + np.max(np.abs(rd.x))
    assert np.max(np.abs(rd.x - ri.x)) / scale < 1e-4


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_tf32_status_parity(seed):
    """Randomized shared-structure batches: the tensorfloat32 engine (with
    its stall-detected f32 fallback, adaptive driver) must keep every lane
    the f32 engine SOLVES decisively Solved, with solutions within the
    shared eps — including equality rows (eq-boosted rho, the measured
    tf32 plateau regime) and loose rows. Lanes that are marginal in f32
    itself (Solved_inaccurate / Max_iter at the budget: the 10x-loosened
    approx check at max_iter is a knife edge for ANY trajectory
    perturbation) may move between the marginal statuses but must never
    flip to an infeasibility certificate or Non_convex."""
    from osqp_tpu.batch import BatchedSolver
    from osqp_tpu.settings import Settings
    from osqp_tpu import constants as C

    rng = np.random.RandomState(8800 + seed)
    B = int(rng.randint(2, 5))
    n = int(rng.randint(4, 14))
    m = int(rng.randint(3, 18))
    M = rng.randn(n, n) / np.sqrt(n)
    P = M.T @ M + (0.05 + rng.rand()) * np.eye(n)
    A = rng.randn(m, n) / np.sqrt(n)
    q = rng.randn(B, n)
    c = rng.randn(B, m) * 0.2
    w = 0.5 + rng.rand(B, m)
    l, u = c - w, c + w
    # force some equality rows (same in every lane -> eq-boosted rho) and
    # some loose rows
    if m >= 4:
        l[:, 0] = u[:, 0]
        l[:, 1] = -np.inf
        u[:, 1] = np.inf
    kw = dict(verbose=False, eps_abs=1e-4, eps_rel=1e-4, max_iter=20000,
              dtype=np.float32, adaptive_rho=True)
    outs = {}
    for mp in ("float32", "tensorfloat32"):
        s = Settings(matmul_precision=mp, **kw)
        outs[mp] = BatchedSolver(settings=s, kkt_mode="shared").solve(
            P, q, A, l, u)
    st_f = np.asarray(outs["float32"].status)
    st_t = np.asarray(outs["tensorfloat32"].status)
    decisive = st_f == C.SOLVED
    assert np.all(st_t[decisive] == C.SOLVED), (seed, st_f, st_t)
    marginal = {C.SOLVED, C.SOLVED_INACCURATE, C.MAX_ITER_REACHED}
    for sf, stt in zip(st_f, st_t):
        if int(sf) in marginal:
            assert int(stt) in marginal, (seed, st_f, st_t)
        else:
            assert int(stt) == int(sf), (seed, st_f, st_t)
    both = decisive & (st_t == C.SOLVED)
    if both.any():
        np.testing.assert_allclose(
            np.asarray(outs["tensorfloat32"].x)[both],
            np.asarray(outs["float32"].x)[both], atol=5e-3)
