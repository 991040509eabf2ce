"""Differentiable QP layer (osqp_tpu.diff): implicit-diff gradients.

Validation strategy: central finite differences on scalar losses of the
solution, with an f64 forward solve at eps=1e-10 so the FD stencil error
dominates the solver error by orders of magnitude. Problems are drawn
strictly convex with a mix of active (upper + lower + equality) and inactive
constraints and non-degenerate multipliers, where the implicit-function
gradients are exact.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from osqp_tpu.diff import make_qp_layer, solve_qp
from osqp_tpu.settings import Settings

TIGHT = dict(eps_abs=1e-10, eps_rel=1e-10, max_iter=20000, verbose=False,
             dtype=np.float64)


def _problem(seed=0, n=6, m=9):
    rng = np.random.RandomState(seed)
    M = rng.randn(n, n)
    P = M @ M.T + 0.5 * np.eye(n)
    q = rng.randn(n)
    A = rng.randn(m, n)
    # spread of actives: tight box on the first rows, loose on the rest,
    # one equality row
    l = -0.1 * np.ones(m)
    u = 0.1 * np.ones(m)
    l[m // 2:] = -5.0
    u[m // 2:] = 5.0
    l[0] = u[0] = 0.05
    return P, q, A, l, u


def _fd_grad(f, x0, h=1e-6):
    """Central finite differences of scalar f at x0 (any shape)."""
    x0 = np.asarray(x0, dtype=float)
    g = np.zeros_like(x0)
    it = np.nditer(x0, flags=["multi_index"])
    while not it.finished:
        i = it.multi_index
        xp = x0.copy(); xp[i] += h
        xm = x0.copy(); xm[i] -= h
        g[i] = (f(xp) - f(xm)) / (2 * h)
        it.iternext()
    return g


@pytest.fixture(scope="module")
def layer():
    return make_qp_layer(Settings(**TIGHT))


def test_grad_q_matches_fd(layer):
    P, q, A, l, u = _problem(0)
    w = np.random.RandomState(1).randn(P.shape[0])

    def loss_q(qv):
        x, _ = layer(P, qv, A, l, u)
        return jnp.dot(jnp.asarray(w), x)

    g = jax.grad(loss_q)(jnp.asarray(q))
    g_fd = _fd_grad(lambda qv: float(loss_q(jnp.asarray(qv))), q)
    np.testing.assert_allclose(np.asarray(g), g_fd, rtol=1e-5, atol=1e-7)


def test_grad_bounds_match_fd(layer):
    P, q, A, l, u = _problem(2)
    w = np.random.RandomState(3).randn(P.shape[0])

    def loss_lu(lv, uv):
        x, _ = layer(P, q, A, lv, uv)
        return jnp.dot(jnp.asarray(w), x)

    gl, gu = jax.grad(loss_lu, argnums=(0, 1))(jnp.asarray(l), jnp.asarray(u))
    gl_fd = _fd_grad(lambda lv: float(loss_lu(jnp.asarray(lv),
                                              jnp.asarray(u))), l)
    gu_fd = _fd_grad(lambda uv: float(loss_lu(jnp.asarray(l),
                                              jnp.asarray(uv))), u)
    # row 0 is an equality row (l==u): one-sided FD through l or u alone
    # steps into the l>u infeasible regime and halves the stencil — validate
    # it below via a joint (l,u) perturbation instead.
    ineq = np.arange(l.shape[0]) != 0
    np.testing.assert_allclose(np.asarray(gl)[ineq], gl_fd[ineq],
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(gu)[ineq], gu_fd[ineq],
                               rtol=1e-5, atol=1e-7)
    h = 1e-6
    lp, up = l.copy(), u.copy()
    lp[0] += h; up[0] += h
    lm, um = l.copy(), u.copy()
    lm[0] -= h; um[0] -= h
    fd_eq = (float(loss_lu(jnp.asarray(lp), jnp.asarray(up)))
             - float(loss_lu(jnp.asarray(lm), jnp.asarray(um)))) / (2 * h)
    np.testing.assert_allclose(float(gl[0] + gu[0]), fd_eq,
                               rtol=1e-5, atol=1e-7)
    # inactive rows carry zero gradient by construction
    x, y = layer(P, q, A, l, u)
    inactive = np.asarray(y) == 0.0
    assert inactive.any()
    assert np.all(np.asarray(gl)[inactive] == 0.0)
    assert np.all(np.asarray(gu)[inactive] == 0.0)


def test_grad_P_A_match_fd(layer):
    P, q, A, l, u = _problem(4, n=5, m=7)
    w = np.random.RandomState(5).randn(P.shape[0])

    def loss_PA(Pv, Av):
        x, _ = layer(Pv, q, Av, l, u)
        return jnp.dot(jnp.asarray(w), x)

    gP, gA = jax.grad(loss_PA, argnums=(0, 1))(jnp.asarray(P), jnp.asarray(A))

    # FD over symmetric P perturbations (P must stay symmetric): perturb
    # (i,j) and (j,i) together; the returned P̄ is symmetrized, so
    # dL/dPij_sym = P̄ij + P̄ji for i≠j, P̄ii on the diagonal.
    def f_P(Pv):
        x, _ = layer(jnp.asarray(Pv), q, A, l, u)
        return float(jnp.dot(jnp.asarray(w), x))

    n = P.shape[0]
    h = 1e-6
    for (i, j) in [(0, 0), (1, 2), (3, 4)]:
        E = np.zeros_like(P)
        E[i, j] += 1.0
        E[j, i] += 1.0
        fd = (f_P(P + h * E) - f_P(P - h * E)) / (2 * h)
        an = float(gP[i, j] + gP[j, i]) if i != j else float(gP[i, i] * 2)
        # symmetric perturbation pairs with P̄ij+P̄ji (2·P̄ii on diagonal)
        np.testing.assert_allclose(an, fd, rtol=1e-4, atol=1e-7)

    def f_A(Av):
        x, _ = layer(P, q, jnp.asarray(Av), l, u)
        return float(jnp.dot(jnp.asarray(w), x))

    gA_fd = _fd_grad(f_A, A, h=1e-6)
    np.testing.assert_allclose(np.asarray(gA), gA_fd, rtol=1e-4, atol=1e-6)


def test_grad_dual_cotangent(layer):
    """Losses on the dual y also differentiate (ȳ path through the adjoint)."""
    P, q, A, l, u = _problem(6)
    w = np.random.RandomState(7).randn(A.shape[0])

    def loss(qv):
        _, y = layer(P, qv, A, l, u)
        return jnp.dot(jnp.asarray(w), y)

    g = jax.grad(loss)(jnp.asarray(q))
    g_fd = _fd_grad(lambda qv: float(loss(jnp.asarray(qv))), q)
    np.testing.assert_allclose(np.asarray(g), g_fd, rtol=1e-4, atol=1e-6)


def test_unconstrained_grad_analytic(layer):
    """m=0: x* = -P⁻¹q, so ∇_q (wᵀx*) = -P⁻¹w exactly."""
    rng = np.random.RandomState(8)
    n = 5
    M = rng.randn(n, n)
    P = M @ M.T + np.eye(n)
    q = rng.randn(n)
    w = rng.randn(n)
    A = np.zeros((0, n))
    l = np.zeros((0,))
    u = np.zeros((0,))

    g = jax.grad(lambda qv: jnp.dot(jnp.asarray(w),
                                    layer(P, qv, A, l, u)[0]))(jnp.asarray(q))
    expect = -np.linalg.solve(P, w)
    np.testing.assert_allclose(np.asarray(g), expect, rtol=1e-6, atol=1e-9)


def test_jit_vmap_compose(layer):
    """grad-of-vmap-of-layer under jit: batched gradients match per-problem."""
    P, q, A, l, u = _problem(9)
    B = 4
    rng = np.random.RandomState(10)
    qs = q + 0.1 * rng.randn(B, q.shape[0])
    w = rng.randn(P.shape[0])

    def loss_one(qv):
        x, _ = layer(P, qv, A, l, u)
        return jnp.dot(jnp.asarray(w), x)

    batched = jax.jit(jax.grad(lambda Q: jnp.sum(jax.vmap(loss_one)(Q))))
    G = np.asarray(batched(jnp.asarray(qs)))
    for b in range(B):
        g1 = np.asarray(jax.grad(loss_one)(jnp.asarray(qs[b])))
        np.testing.assert_allclose(G[b], g1, rtol=1e-6, atol=1e-9)


def test_gradient_descent_drives_solution_to_target():
    """End-to-end sanity: tune q by gradient descent so x*(q) hits a target
    inside the feasible set. Loss must drop by orders of magnitude."""
    rng = np.random.RandomState(11)
    n, m = 4, 6
    M = rng.randn(n, n)
    P = M @ M.T + np.eye(n)
    A = rng.randn(m, n)
    l = -2.0 * np.ones(m)
    u = 2.0 * np.ones(m)
    target = 0.05 * rng.randn(n)
    layer = make_qp_layer(Settings(eps_abs=1e-9, eps_rel=1e-9,
                                   max_iter=20000, verbose=False,
                                   dtype=np.float64))

    # parametrize q = -P@theta: in the feasible interior x*(q) = theta, so
    # the loss is well-conditioned in theta (raw-q descent crawls at rate
    # 1/kappa(P)^2)
    def loss(theta):
        x, _ = layer(P, -jnp.asarray(P) @ theta, A, l, u)
        return jnp.sum((x - jnp.asarray(target)) ** 2)

    vg = jax.jit(jax.value_and_grad(loss))
    th = jnp.asarray(rng.randn(n))
    l0, _ = vg(th)
    for _ in range(60):
        val, g = vg(th)
        th = th - 0.4 * g
    assert float(val) < 1e-8 * max(1.0, float(l0))


def test_failed_solve_poisons_gradients():
    """Unsolved forward (max_iter too small) must NaN the gradients."""
    P, q, A, l, u = _problem(12)
    layer = make_qp_layer(Settings(eps_abs=1e-12, eps_rel=1e-12, max_iter=4,
                                   check_termination=1, verbose=False,
                                   dtype=np.float64))
    g = jax.grad(lambda qv: jnp.sum(layer(P, qv, A, l, u)[0]))(jnp.asarray(q))
    assert np.all(np.isnan(np.asarray(g)))


def test_solve_qp_convenience_caches_layer():
    P, q, A, l, u = _problem(13)
    x1, y1 = solve_qp(P, q, A, l, u, **TIGHT)
    x2, y2 = solve_qp(P, q, A, l, u, **TIGHT)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2))
    g = jax.grad(lambda qv: jnp.sum(solve_qp(P, qv, A, l, u, **TIGHT)[0]))(
        jnp.asarray(q))
    assert np.all(np.isfinite(np.asarray(g)))


def _batched_problem(B=3, seed=4, n=6, m=9):
    P, _, A, _, _ = _problem(seed=seed, n=n, m=m)
    rng = np.random.RandomState(100 + seed)
    q = rng.randn(B, n)
    l = np.broadcast_to(
        np.where(np.arange(m) >= m // 2, -5.0, -0.1), (B, m)).copy()
    u = np.broadcast_to(
        np.where(np.arange(m) >= m // 2, 5.0, 0.1), (B, m)).copy()
    l[:, 0] = u[:, 0] = 0.05
    return P, A, q, l, u


def test_batched_layer_grads_match_per_lane_layer():
    """The shared-engine batched layer must reproduce the per-lane layer's
    gradients: q̄/l̄/ū lane-wise, and P̄/Ā as the SUM of per-lane cotangents
    (P/A are shared). Differential, not FD — the per-lane layer is itself
    FD-validated above."""
    from osqp_tpu.diff import make_batched_qp_layer
    P, A, q, l, u = _batched_problem()
    B = q.shape[0]
    blayer = make_batched_qp_layer(Settings(**TIGHT))
    player = make_qp_layer(Settings(**TIGHT))

    rng = np.random.RandomState(9)
    wx = rng.randn(B, q.shape[1])
    wy = rng.randn(B, l.shape[1])

    def loss_b(P_, A_, q_, l_, u_):
        x, y = blayer(P_, A_, q_, l_, u_)
        return jnp.sum(wx * x) + jnp.sum(wy * y)

    gb = jax.grad(loss_b, argnums=(0, 1, 2, 3, 4))(P, A, q, l, u)

    def loss_p(P_, q_, A_, l_, u_, i):
        x, y = player(P_, q_, A_, l_, u_)
        return jnp.sum(wx[i] * x) + jnp.sum(wy[i] * y)

    gP = np.zeros_like(P); gA = np.zeros_like(A)
    gq = np.zeros_like(q); gl = np.zeros_like(l); gu = np.zeros_like(u)
    for i in range(B):
        gi = jax.grad(loss_p, argnums=(0, 1, 2, 3, 4))(
            P, q[i], A, l[i], u[i], i)
        gP += np.asarray(gi[0]); gq[i] = np.asarray(gi[1])
        gA += np.asarray(gi[2]); gl[i] = np.asarray(gi[3])
        gu[i] = np.asarray(gi[4])

    np.testing.assert_allclose(np.asarray(gb[0]), gP, atol=2e-6)
    np.testing.assert_allclose(np.asarray(gb[1]), gA, atol=2e-6)
    np.testing.assert_allclose(np.asarray(gb[2]), gq, atol=2e-6)
    np.testing.assert_allclose(np.asarray(gb[3]), gl, atol=2e-6)
    np.testing.assert_allclose(np.asarray(gb[4]), gu, atol=2e-6)


def test_batched_layer_jit_grad_composes():
    from osqp_tpu.diff import make_batched_qp_layer
    P, A, q, l, u = _batched_problem(seed=6)
    blayer = make_batched_qp_layer(Settings(**TIGHT))

    @jax.jit
    def loss(q_):
        x, _ = blayer(P, A, q_, l, u)
        return jnp.sum(x ** 2)

    g = jax.grad(loss)(jnp.asarray(q))
    assert np.isfinite(np.asarray(g)).all()
    # descent direction sanity: a small step reduces the loss
    l0 = float(loss(jnp.asarray(q)))
    l1 = float(loss(jnp.asarray(q) - 1e-3 * g))
    assert l1 < l0


def test_batched_layer_poisons_failed_lanes():
    """A lane that fails to solve NaNs its own q̄ (and the shared P̄/Ā sums,
    loudly) while the solved lanes' per-lane gradients stay clean in the
    lane-local cotangents."""
    from osqp_tpu.diff import make_batched_qp_layer
    P, A, q, l, u = _batched_problem(seed=7)
    blayer = make_batched_qp_layer(
        Settings(eps_abs=1e-12, eps_rel=1e-12, max_iter=4, verbose=False,
                 dtype=np.float64, adaptive_rho=False))

    def loss(q_):
        x, _ = blayer(P, A, q_, l, u)
        return jnp.sum(x ** 2)

    g = np.asarray(jax.grad(loss)(jnp.asarray(q)))
    assert np.isnan(g).any()
