"""Port of /root/reference/test/warm_start.jl: zero warm start reproduces the
cold iteration count exactly; warm start at the optimum converges in <=10
iterations."""

import numpy as np

import osqp_tpu as osqp


def test_warm_start_problem():
    rng = np.random.RandomState(1)
    n = 100
    m = 200
    Ph = rng.randn(n, n) * (rng.rand(n, n) < 0.9)
    P = Ph.T @ Ph
    q = rng.randn(n)
    A = rng.randn(m, n) * (rng.rand(m, n) < 0.9)
    u = rng.rand(m) * 2
    l = -rng.rand(m) * 2

    model = osqp.Model()
    model.setup(P=P, q=q, A=A, l=l, u=u, verbose=False,
                eps_abs=1e-8, eps_rel=1e-8, polish=False,
                adaptive_rho=False, check_termination=1)
    results = model.solve()
    assert results.info.status == "Solved"
    x_opt = results.x.copy()
    y_opt = results.y.copy()
    tot_iter = results.info.iter

    # Zero warm start must reproduce the cold-start iteration count exactly
    model.warm_start(x=np.zeros(n), y=np.zeros(m))
    results = model.solve()
    assert results.info.iter == tot_iter

    # Warm start at the optimum: <= 10 iterations
    model.warm_start(x=x_opt, y=y_opt)
    results = model.solve()
    assert results.info.iter <= 10


def test_warm_start_x_zeroes_y():
    # modcaches.jl:195-196 note: providing only x zeroes stored y, and
    # vice versa — both must still solve correctly.
    P = np.diag([11.0, 0.1])
    q = np.array([3.0, 4.0])
    A = np.eye(2)
    l = -np.ones(2)
    u = np.ones(2)
    model = osqp.Model()
    model.setup(P=P, q=q, A=A, l=l, u=u, verbose=False,
                eps_abs=1e-8, eps_rel=1e-8)
    r0 = model.solve()
    model.warm_start(x=np.array([0.5, -0.5]))
    r1 = model.solve()
    assert np.allclose(r0.x, r1.x, atol=1e-5)
    model.warm_start(y=np.array([0.1, 0.1]))
    r2 = model.solve()
    assert np.allclose(r0.x, r2.x, atol=1e-5)


def test_auto_warm_start_resolve_fast():
    # MOI_wrapper.jl:572-574 behavior: second solve warm-starts from the
    # previous solution automatically and converges almost immediately.
    rng = np.random.RandomState(5)
    n, m = 50, 80
    Ph = rng.randn(n, n)
    P = Ph.T @ Ph + 0.1 * np.eye(n)
    q = rng.randn(n)
    A = rng.randn(m, n)
    l = -np.ones(m)
    u = np.ones(m)
    model = osqp.Model()
    model.setup(P=P, q=q, A=A, l=l, u=u, verbose=False,
                eps_abs=1e-6, eps_rel=1e-6, adaptive_rho=False,
                check_termination=1)
    r1 = model.solve()
    assert r1.info.status == "Solved"
    r2 = model.solve()
    assert r2.info.iter <= 10
