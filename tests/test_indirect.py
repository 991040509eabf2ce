"""Indirect (matrix-free CG) KKT path — the large-problem route
(SURVEY.md §5 "long-context" analogue; reference linsys_solver enum
src/constants.jl:1-2 selects the sub-solver the same way)."""

import numpy as np

import osqp_tpu as osqp


def make_problem(n=60, m=120, seed=0):
    rng = np.random.RandomState(seed)
    M = rng.randn(n, n) / np.sqrt(n)
    P = M.T @ M + 0.5 * np.eye(n)
    q = rng.randn(n)
    A = rng.randn(m, n) / np.sqrt(n)
    l = -1 - rng.rand(m)
    u = 1 + rng.rand(m)
    return P, q, A, l, u


def test_indirect_matches_direct():
    P, q, A, l, u = make_problem()
    kw = dict(verbose=False, eps_abs=1e-6, eps_rel=1e-6)

    m1 = osqp.Model()
    m1.setup(P=P, q=q, A=A, l=l, u=u, linsys_solver="direct", **kw)
    r1 = m1.solve()

    m2 = osqp.Model()
    m2.setup(P=P, q=q, A=A, l=l, u=u, linsys_solver="indirect", **kw)
    r2 = m2.solve()

    assert r1.info.status == r2.info.status == "Solved"
    np.testing.assert_allclose(r1.x, r2.x, atol=1e-4)
    assert abs(r1.info.obj_val - r2.info.obj_val) < 1e-4


def test_indirect_update_and_warm_start():
    P, q, A, l, u = make_problem(seed=3)
    model = osqp.Model()
    model.setup(P=P, q=q, A=A, l=l, u=u, linsys_solver="cg",
                verbose=False, eps_abs=1e-6, eps_rel=1e-6)
    r1 = model.solve()
    assert r1.info.status == "Solved"
    model.update(q=q * 0.5)
    r2 = model.solve()
    assert r2.info.status == "Solved"
    # differential vs fresh direct solve
    md = osqp.Model()
    md.setup(P=P, q=q * 0.5, A=A, l=l, u=u, verbose=False,
             eps_abs=1e-6, eps_rel=1e-6)
    rd = md.solve()
    np.testing.assert_allclose(r2.x, rd.x, atol=1e-4)


def test_qdldl_string_accepted():
    # reference linsys_solver string->enum parity (interface.jl:749-773)
    P, q, A, l, u = make_problem(n=10, m=15, seed=5)
    model = osqp.Model()
    model.setup(P=P, q=q, A=A, l=l, u=u, linsys_solver="qdldl",
                verbose=False)
    assert model.solve().info.status == "Solved"


def test_auto_cg_budget_and_tolerance():
    """Round-3 CG fix (round-2 verdict weak #1): cg_max_iter=0 -> auto
    (min(n + 30, 64) — see core._CG_AUTO_CAP) and cg_tol=0 -> auto (1e-12
    in f64) — tight, convergent, and tail-bounded inner solves. On an
    ill-conditioned problem the indirect path must match the direct path's
    outer iteration count exactly (accurate-enough KKT steps => identical
    ADMM trajectory at check boundaries)."""
    from osqp_tpu.core import resolve_cg_cap, dyn_from_settings
    from osqp_tpu.settings import Settings
    from osqp_tpu.problems import ill_conditioned_qp
    import jax.numpy as jnp

    s = Settings()
    dyn = dyn_from_settings(s, jnp.float64)
    assert float(dyn.cg_tol) == 1e-12             # auto, f64
    dyn2 = resolve_cg_cap(dyn, s, 170)
    assert int(dyn2.cg_max_iter) == 64            # auto: min(n + 30, 64)
    assert int(resolve_cg_cap(dyn, s, 20).cg_max_iter) == 50  # small n
    s3 = Settings(cg_max_iter=77, cg_tol=1e-8)
    dyn3 = resolve_cg_cap(dyn_from_settings(s3, jnp.float64), s3, 170)
    assert int(dyn3.cg_max_iter) == 77            # explicit respected
    assert float(dyn3.cg_tol) == 1e-8

    P, q, A, l, u = ill_conditioned_qp(n=40, m=60, cond=1e4)
    kw = dict(eps_abs=1e-6, eps_rel=1e-6, max_iter=100000, verbose=False)
    m1 = osqp.Model()
    m1.setup(P=P, q=q, A=A, l=l, u=u, **kw)
    r1 = m1.solve()
    m2 = osqp.Model()
    m2.setup(P=P, q=q, A=A, l=l, u=u, linsys_solver="indirect", **kw)
    r2 = m2.solve()
    assert r1.info.status == r2.info.status == "Solved"
    assert r2.info.iter == r1.info.iter
    np.testing.assert_allclose(r2.x, r1.x, rtol=1e-6, atol=1e-8)


def test_capped_auto_budget_matches_uncapped_at_large_n():
    """Differential pin for the CAPPED auto-CG regime (round-3 advisor):
    at n in the several-hundred range the auto budget min(n+30, 64) binds
    hard (64 << n+30), which the small-n fuzz never exercises. The
    summable-inexactness contract says the capped run must still land on
    the same status/solution as an explicit uncapped budget (n+30) and as
    the direct factorization."""
    kw = dict(eps_abs=1e-6, eps_rel=1e-6, max_iter=20000, verbose=False)
    for seed, cond in ((11, 1e2), (12, 1e5)):
        n, m = 320, 240
        from osqp_tpu.problems import ill_conditioned_qp
        P, q, A, l, u = ill_conditioned_qp(n=n, m=m, cond=cond, seed=seed)

        md = osqp.Model()
        md.setup(P=P, q=q, A=A, l=l, u=u, **kw)
        rd = md.solve()

        mc = osqp.Model()   # capped auto budget: min(n+30, 64) = 64
        mc.setup(P=P, q=q, A=A, l=l, u=u, linsys_solver="indirect", **kw)
        rc = mc.solve()

        mu = osqp.Model()   # explicit uncapped budget n+30
        mu.setup(P=P, q=q, A=A, l=l, u=u, linsys_solver="indirect",
                 cg_max_iter=n + 30, **kw)
        ru = mu.solve()

        assert rd.info.status == rc.info.status == ru.info.status == "Solved"
        np.testing.assert_allclose(rc.x, rd.x, atol=5e-5)
        np.testing.assert_allclose(ru.x, rd.x, atol=5e-5)
        assert abs(rc.info.obj_val - rd.info.obj_val) < 1e-5 * max(
            1.0, abs(rd.info.obj_val))


def test_block_jacobi_preconditioner_shape_and_apply():
    """The dense indirect path's FactorState.L is a (nb, 128, 128) stack of
    block-Cholesky factors; applying it must equal multiplying by the
    inverse of the block-diagonal of R."""
    import jax.numpy as jnp
    from osqp_tpu.core import init_factor, _BJ_BLOCK
    from osqp_tpu.linalg import _block_jacobi_apply
    from osqp_tpu.types import QPData

    rng = np.random.RandomState(5)
    n, m = 150, 80
    M = rng.randn(n, n)
    P = M.T @ M / n + 0.5 * np.eye(n)
    A = rng.randn(m, n) / np.sqrt(n)
    data = QPData(P=jnp.asarray(P), q=jnp.asarray(rng.randn(n)),
                  A=jnp.asarray(A), l=jnp.asarray(-np.ones(m)),
                  u=jnp.asarray(np.ones(m)))
    fs = init_factor(data, 1e-6, 0.1, indirect=True)
    bs = min(_BJ_BLOCK, n)
    nb = -(-n // bs)
    assert fs.L.shape == (nb, bs, bs)
    rho = np.asarray(fs.rho_vec)
    R = P + 1e-6 * np.eye(n) + A.T @ (rho[:, None] * A)
    r = rng.randn(n)
    z = np.asarray(_block_jacobi_apply(fs.L, jnp.asarray(r)))
    # reference: blockwise inverse of the padded block-diagonal of R
    npad = nb * bs
    Rp = np.eye(npad)
    Rp[:n, :n] = R
    # padding convention of _kkt_precompute: identity + sigma on the pad
    for j in range(n, npad):
        Rp[j, j] = 1.0 + 1e-6
    zs = []
    rp = np.zeros(npad)
    rp[:n] = r
    for k in range(nb):
        blk = Rp[k * bs:(k + 1) * bs, k * bs:(k + 1) * bs]
        zs.append(np.linalg.solve(blk, rp[k * bs:(k + 1) * bs]))
    z_ref = np.concatenate(zs)[:n]
    np.testing.assert_allclose(z, z_ref, rtol=1e-9, atol=1e-11)
