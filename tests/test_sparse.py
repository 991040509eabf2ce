"""Large sparse (matrix-free CG) path — differential vs the dense engine and
a moderately large problem sanity check."""

import numpy as np
import pytest
import scipy.sparse as sp

import osqp_tpu as osqp
from osqp_tpu.sparse_core import SparseModel


def make_sparse_problem(n=80, m=160, density=0.05, seed=0):
    rng = np.random.RandomState(seed)
    Ph = sp.random(n, n, density=density, random_state=rng, format="csc")
    P = (Ph.T @ Ph + 0.5 * sp.eye(n)).tocsc()
    q = rng.randn(n)
    A = sp.random(m, n, density=density, random_state=rng, format="csc")
    A = (A + 0.1 * sp.random(m, n, density=0.02, random_state=rng)).tocsc()
    l = -1 - rng.rand(m)
    u = 1 + rng.rand(m)
    return P, q, A, l, u


def test_sparse_matches_dense():
    # the matrix-free engine is the subject; the routed default is covered
    # by test_sparse_routing_direct_matches_indirect
    P, q, A, l, u = make_sparse_problem()
    sm = SparseModel().setup(P=P, q=q, A=A, l=l, u=u, verbose=False,
                             eps_abs=1e-6, eps_rel=1e-6,
                             linsys_solver="indirect")
    rs = sm.solve()
    assert rs.info.status == "Solved"

    dm = osqp.Model()
    dm.setup(P=P.toarray(), q=q, A=A.toarray(), l=l, u=u, verbose=False,
             eps_abs=1e-6, eps_rel=1e-6)
    rd = dm.solve()
    np.testing.assert_allclose(rs.x, rd.x, atol=1e-4)
    assert abs(rs.info.obj_val - rd.info.obj_val) < 1e-4


def test_sparse_warm_start_and_update():
    P, q, A, l, u = make_sparse_problem(seed=3)
    sm = SparseModel().setup(P=P, q=q, A=A, l=l, u=u, verbose=False,
                             eps_abs=1e-6, eps_rel=1e-6)
    r1 = sm.solve()
    assert r1.info.status == "Solved"
    r2 = sm.solve()  # auto warm start
    assert r2.info.iter <= r1.info.iter
    sm.update(q=q * 0.3)
    r3 = sm.solve()
    dm = osqp.Model()
    dm.setup(P=P.toarray(), q=q * 0.3, A=A.toarray(), l=l, u=u,
             verbose=False, eps_abs=1e-6, eps_rel=1e-6)
    rd = dm.solve()
    np.testing.assert_allclose(r3.x, rd.x, atol=1e-4)


def test_sparse_large_lasso_style():
    # n = 2000 sparse problem solved matrix-free in reasonable iterations
    rng = np.random.RandomState(1)
    n, m = 2000, 3000
    P = sp.diags(1.0 + rng.rand(n)).tocsc()
    A = sp.random(m, n, density=0.002, random_state=rng, format="csc")
    A = (A + sp.eye(m, n)).tocsc()
    q = rng.randn(n)
    l = -np.ones(m)
    u = np.ones(m)
    sm = SparseModel().setup(P=P, q=q, A=A, l=l, u=u, verbose=False,
                             eps_abs=1e-4, eps_rel=1e-4)
    r = sm.solve()
    assert r.info.status in ("Solved", "Solved_inaccurate")
    # KKT sanity at the sparse solution
    Pd = P.toarray()
    viol = max(np.max(A @ r.x - u, initial=0), np.max(l - A @ r.x, initial=0))
    assert viol < 1e-3


def test_sparse_polish():
    # matrix-free (CG) polish is the subject — force the indirect path
    # matrix-free polish: CG on the masked reduced system
    P, q, A, l, u = make_sparse_problem(seed=12)
    sm = SparseModel().setup(P=P, q=q, A=A, l=l, u=u, verbose=False,
                             eps_abs=1e-3, eps_rel=1e-3, polish=True,
                             linsys_solver="indirect")
    r = sm.solve()
    assert r.info.status == "Solved"
    assert r.info.status_polish == 1
    Pd = P.toarray()
    Ad = A.toarray()
    stat = np.linalg.norm(Pd @ r.x + q + Ad.T @ r.y, np.inf)
    assert stat < 1e-6


def test_sparse_accepts_triu_P():
    # regression: triu-P input convention must be symmetrized
    P = np.array([[2.0, 1.0], [1.0, 2.0]])
    q = np.array([1.0, 1.0])
    A = np.eye(2)
    l = -np.ones(2)
    u = np.ones(2)
    kw = dict(verbose=False, eps_abs=1e-8, eps_rel=1e-8)
    r_triu = SparseModel().setup(P=sp.csc_matrix(sp.triu(P)), q=q,
                                 A=sp.csc_matrix(A), l=l, u=u, **kw).solve()
    r_full = SparseModel().setup(P=sp.csc_matrix(P), q=q,
                                 A=sp.csc_matrix(A), l=l, u=u, **kw).solve()
    np.testing.assert_allclose(r_triu.x, [-1 / 3, -1 / 3], atol=1e-5)
    np.testing.assert_allclose(r_triu.x, r_full.x, atol=1e-8)


def test_padded_format_matches_bcoo():
    P, q, A, l, u = make_sparse_problem(seed=5)
    # operator formats exist only on the matrix-free path; force it (the
    # default routes problems this small to the dense direct factor)
    kw = dict(verbose=False, eps_abs=1e-6, eps_rel=1e-6,
              linsys_solver="indirect")
    rp = SparseModel().setup(P=P, q=q, A=A, l=l, u=u,
                             sparse_format="padded", **kw).solve()
    rb = SparseModel().setup(P=P, q=q, A=A, l=l, u=u,
                             sparse_format="bcoo", **kw).solve()
    assert rp.info.status == rb.info.status == "Solved"
    assert rp.info.iter == rb.info.iter
    np.testing.assert_allclose(rp.x, rb.x, atol=1e-8)


def test_sparse_very_large():
    # BASELINE config #4 scale check (n ~ 1e5 runs in scripts; n=5e4 here to
    # keep suite time bounded). Generate COO directly — scipy.sparse.random
    # is pathologically slow at this size.
    rng = np.random.RandomState(0)
    n, m = 50_000, 75_000
    nnz = 250_000
    rows = rng.randint(0, m, nnz)
    cols = rng.randint(0, n, nnz)
    vals = rng.randn(nnz)
    A = (sp.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsc()
         + sp.eye(m, n)).tocsc()
    P = sp.diags(0.5 + rng.rand(n)).tocsc()
    q = rng.randn(n)
    l = -1 - rng.rand(m)
    u = 1 + rng.rand(m)
    sm = SparseModel().setup(P=P, q=q, A=A, l=l, u=u, verbose=False,
                             eps_abs=1e-3, eps_rel=1e-3, dtype=np.float32)
    r = sm.solve()
    assert r.info.status == "Solved"
    Ax = A @ r.x
    viol = max(np.max(Ax - u, initial=0), np.max(l - Ax, initial=0))
    assert viol < 5e-3


def test_sparse_row_sharded_over_mesh():
    import jax
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()), ("r",))
    P, q, A, l, u = make_sparse_problem(n=64, m=128, seed=9)
    kw = dict(verbose=False, eps_abs=1e-5, eps_rel=1e-5,
              sparse_format="padded")
    r_sh = SparseModel(mesh=mesh).setup(P=P, q=q, A=A, l=l, u=u,
                                        **kw).solve()
    r_ref = SparseModel().setup(P=P, q=q, A=A, l=l, u=u, **kw).solve()
    assert r_sh.info.status == r_ref.info.status == "Solved"
    assert r_sh.info.iter == r_ref.info.iter
    np.testing.assert_allclose(r_sh.x, r_ref.x, atol=1e-5)


def test_sparse_update_settings():
    """update_settings parity on the sparse engine (UPDATABLE gate)."""
    import pytest
    import scipy.sparse as sp
    from osqp_tpu.sparse_core import SparseModel
    P = sp.diags([2.0, 2.0, 2.0]).tocsc()
    A = sp.eye(3).tocsc()
    m = SparseModel()
    m.setup(P=P, q=np.array([-1., 0., 1.]), A=A, l=-np.ones(3),
            u=np.ones(3), verbose=False, eps_abs=1e-6, eps_rel=1e-6)
    r0 = m.solve()
    assert r0.info.status == "Solved"
    with pytest.raises(ValueError, match="cannot be updated"):
        m.update_settings(scaling=0)
    m.update_settings(eps_abs=1e-8, eps_rel=1e-8, rho=1.0)
    r1 = m.solve()
    assert r1.info.status == "Solved"
    np.testing.assert_allclose(r1.x, r0.x, atol=1e-5)


def test_sparse_update_P_A_values_differential():
    """Value-only P/A updates on the sparse engine must equal a fresh
    setup with the updated matrices (test_update_matrices differential
    pattern; reference interface.jl:315-406 semantics)."""
    import scipy.sparse as sp
    from osqp_tpu.sparse_core import SparseModel
    rng = np.random.RandomState(3)
    n, m = 12, 20
    M = rng.randn(n, n) * (rng.rand(n, n) < 0.4)
    P = sp.csc_matrix(np.triu(M.T @ M / n + 0.5 * np.eye(n)))
    A = sp.csc_matrix(rng.randn(m, n) * (rng.rand(m, n) < 0.5))
    q = rng.randn(n)
    l = -np.ones(m)
    u = np.ones(m)
    kw = dict(verbose=False, eps_abs=1e-8, eps_rel=1e-8)

    mdl = SparseModel()
    mdl.setup(P=P, q=q, A=A, l=l, u=u, **kw)
    mdl.solve()

    # full-value updates
    P2 = P.copy(); P2.sort_indices()
    P2.data = P2.data * 1.5
    A2 = A.copy(); A2.sort_indices()
    A2.data = A2.data * 0.7
    mdl.update(Px=P2.data, Ax=A2.data)
    r = mdl.solve()

    fresh = SparseModel()
    fresh.setup(P=P2, q=q, A=A2, l=l, u=u, **kw)
    rf = fresh.solve()
    assert r.info.status == rf.info.status == "Solved"
    np.testing.assert_allclose(r.x, rf.x, rtol=1e-6, atol=1e-8)

    # index-subset update on A
    A3 = A2.copy()
    idx = np.array([0, 3, 5], np.int64)
    vals = A3.data[idx] * 2.0
    A3.data[idx] = vals
    mdl.update(Ax=vals, Ax_idx=idx)
    r3 = mdl.solve()
    fresh3 = SparseModel()
    fresh3.setup(P=P2, q=q, A=A3, l=l, u=u, **kw)
    rf3 = fresh3.solve()
    np.testing.assert_allclose(r3.x, rf3.x, rtol=1e-6, atol=1e-8)

    # pattern immutability / validation errors
    import pytest
    with pytest.raises(ValueError, match="length nnz"):
        mdl.update(Px=np.ones(P2.nnz + 1))
    with pytest.raises(ValueError, match="out of range"):
        mdl.update(Ax=np.ones(1), Ax_idx=np.array([A2.nnz]))
    # non-convex P update refused (matrix-free refactorization analogue)
    with pytest.raises(ValueError, match="non-convex"):
        mdl.update(Px=-10.0 * np.abs(P2.data))


def test_sparse_routing_direct_matches_indirect():
    """Default routing (reference always-direct semantics at affordable
    sizes): small problems get the dense direct factor; results must agree
    with the forced matrix-free path and the dense Model."""
    P, q, A, l, u = make_sparse_problem(seed=17)
    kw = dict(verbose=False, eps_abs=1e-8, eps_rel=1e-8)
    sd = SparseModel().setup(P=P, q=q, A=A, l=l, u=u, **kw)
    assert sd._direct                       # routed to the dense factor
    si = SparseModel().setup(P=P, q=q, A=A, l=l, u=u,
                             linsys_solver="indirect", **kw)
    assert not si._direct
    rd = sd.solve()
    ri = si.solve()
    assert rd.info.status == ri.info.status == "Solved"
    np.testing.assert_allclose(rd.x, ri.x, atol=1e-5)

    dm = osqp.Model()
    dm.setup(P=P.toarray(), q=q, A=A.toarray(), l=l, u=u, **kw)
    rm = dm.solve()
    # routed direct == dense Model exactly (same algorithm, same factor)
    assert rd.info.iter == rm.info.iter
    np.testing.assert_allclose(rd.x, rm.x, atol=1e-10)


def test_sparse_routing_honors_linsys_aliases():
    """Round-3 advisor fix: routing keys off the COERCED linsys constant,
    so the "cg" alias and the int constant select matrix-free exactly like
    the literal "indirect" string (dense Model parity, interface.py)."""
    from osqp_tpu import constants as C
    P, q, A, l, u = make_sparse_problem(seed=17)
    kw = dict(verbose=False, eps_abs=1e-8, eps_rel=1e-8)
    for ls in ("cg", C.INDIRECT_SOLVER):
        sm = SparseModel().setup(P=P, q=q, A=A, l=l, u=u,
                                 linsys_solver=ls, **kw)
        assert not sm._direct, f"alias {ls!r} must route matrix-free"
        assert sm.solve().info.status == "Solved"
    # and the direct aliases still route dense-direct at affordable sizes
    for ls in ("qdldl", C.QDLDL_SOLVER):
        sm = SparseModel().setup(P=P, q=q, A=A, l=l, u=u,
                                 linsys_solver=ls, **kw)
        assert sm._direct


def test_sparse_routing_respects_size_gate():
    """Past the dense gate the default stays matrix-free; mesh sharding
    forces matrix-free regardless."""
    from osqp_tpu import sparse_core as sc
    P, q, A, l, u = make_sparse_problem(seed=3)
    old_n = sc._DENSE_ROUTE_N
    try:
        sc._DENSE_ROUTE_N = 4          # pretend the problem is huge
        sm = SparseModel().setup(P=P, q=q, A=A, l=l, u=u, verbose=False)
        assert not sm._direct
        assert sm.solve().info.status == "Solved"
    finally:
        sc._DENSE_ROUTE_N = old_n


def test_sparse_routed_update_and_polish():
    """The routed direct mode keeps the full update/polish/warm-start
    surface: value-only P updates re-densify and match a fresh setup."""
    P, q, A, l, u = make_sparse_problem(seed=23)
    kw = dict(verbose=False, eps_abs=1e-8, eps_rel=1e-8, polish=True)
    sm = SparseModel().setup(P=P, q=q, A=A, l=l, u=u, **kw)
    assert sm._direct
    r1 = sm.solve()
    assert r1.info.status == "Solved" and r1.info.status_polish == 1

    import scipy.sparse as ssp
    Pu = ssp.triu(ssp.csc_matrix(P)).tocsc()
    Pu.sort_indices()
    new_vals = Pu.data * 2.0
    sm.update(Px=new_vals)
    r2 = sm.solve()
    fresh = SparseModel().setup(P=2.0 * ssp.csc_matrix(P), q=q, A=A,
                                l=l, u=u, **kw)
    r3 = fresh.solve()
    np.testing.assert_allclose(r2.x, r3.x, atol=1e-7)
    assert abs(r2.info.obj_val - r3.info.obj_val) < 1e-7
