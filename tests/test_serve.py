"""AOT serving artifact (osqp_tpu.serve) — export / deserialize / drive.

The artifact is the TPU-native analogue of OSQP's embedded codegen: one
problem structure baked into a serialized StableHLO program, per-request
vectors as runtime inputs (see osqp_tpu/serve.py module docstring). These
tests pin the contract: bit-identical results to the live prepared solver,
factor-state carry across requests, and self-contained deserialization.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from osqp_tpu import constants as C
from osqp_tpu.batch import BatchedSolver
from osqp_tpu.serve import PreparedServer, export_prepared, load
from osqp_tpu.settings import Settings


def _problem(B=8, n=6, m=10, seed=3):
    rng = np.random.RandomState(seed)
    M = rng.randn(n, n)
    P = M @ M.T / n + 0.1 * np.eye(n)
    A = rng.randn(m, n) / np.sqrt(n)
    q = rng.randn(B, n)
    c = rng.randn(B, m) * 0.1
    w = 0.5 + rng.rand(B, m)
    return P, q, A, c - w, c + w


def _prepared_solver(**kw):
    s = Settings(eps_abs=1e-6, eps_rel=1e-6, **kw)
    return BatchedSolver(settings=s, kkt_mode="shared")


def test_export_load_matches_live_solver(tmp_path):
    P, q, A, l, u = _problem()
    solver = _prepared_solver().prepare(P, A, q=q)
    path = str(tmp_path / "qp_artifact.npz")
    blob = export_prepared(solver, B=q.shape[0], path=path)
    assert len(blob) > 0

    live = solver.solve_prepared(q, l, u)

    server = load(path)
    assert (server.B, server.n, server.m) == (8, 6, 10)
    res = server.solve(q, l, u)

    # same program, same inputs -> identical results
    assert np.array_equal(np.asarray(res.info.status_val),
                          np.asarray(live.status))
    assert np.all(np.asarray(res.info.status_val) == C.SOLVED)
    np.testing.assert_allclose(res.x, np.asarray(live.x), rtol=0, atol=1e-12)
    np.testing.assert_allclose(res.y, np.asarray(live.y), rtol=0, atol=1e-12)
    np.testing.assert_array_equal(np.asarray(res.info.iter),
                                  np.asarray(live.iter))
    assert all(s == "Solved" for s in res.info.status)


def test_factor_state_carries_across_requests():
    """Second request re-uses the adapted factor/rho exactly like the live
    prepared solver (reference persistent-workspace economics,
    interface.jl:408-440)."""
    P, q, A, l, u = _problem(seed=5)
    B = q.shape[0]

    solver = _prepared_solver().prepare(P, A, q=q)
    blob = export_prepared(solver, B=B)
    server = load(blob)

    rng = np.random.RandomState(7)
    q2 = q + 0.05 * rng.randn(*q.shape)

    live1 = solver.solve_prepared(q, l, u)
    live2 = solver.solve_prepared(q2, l, u, x0=live1.x, y0=live1.y)

    res1 = server.solve(q, l, u)
    res2 = server.solve(q2, l, u, x0=res1.x, y0=res1.y)

    np.testing.assert_array_equal(np.asarray(res2.info.iter),
                                  np.asarray(live2.iter))
    np.testing.assert_allclose(res2.x, np.asarray(live2.x), atol=1e-12)


def test_artifact_is_self_contained_after_cache_clear(tmp_path):
    """The artifact must not depend on live jit caches or the solver object."""
    P, q, A, l, u = _problem(seed=11)
    solver = _prepared_solver().prepare(P, A, q=q)
    path = str(tmp_path / "a.npz")
    export_prepared(solver, B=q.shape[0], path=path)
    expected = np.asarray(solver.solve_prepared(q, l, u).x)
    del solver
    jax.clear_caches()

    server = load(path)
    res = server.solve(q, l, u)
    np.testing.assert_allclose(res.x, expected, atol=1e-12)


def test_infeasible_lane_nanfill_and_certificate():
    """The NaN-fill + certificate boundary convention (interface.jl:184-210)
    is baked into the artifact."""
    P, q, A, l, u = _problem(seed=13)
    # lane 0: contradictory duplicated row -> primal infeasible
    l0, u0 = l.copy(), u.copy()
    A = np.vstack([A, A[:1]])
    l = np.hstack([l0, (u0[:, :1] + 1.0)])  # l_dup > u_row0 for every lane? no:
    u = np.hstack([u0, np.full((u0.shape[0], 1), np.inf)])
    # make only lane 0 infeasible: dup row demands A0 x >= u0+1 while
    # original row caps A0 x <= u0
    l[1:, -1] = -np.inf
    solver = _prepared_solver().prepare(P, A, q=q)
    blob = export_prepared(solver, B=q.shape[0])
    server = load(blob)
    res = server.solve(q, l, u)
    sv = np.asarray(res.info.status_val)
    assert sv[0] in (C.PRIMAL_INFEASIBLE, C.PRIMAL_INFEASIBLE_INACCURATE)
    assert np.all(np.isnan(res.x[0]))
    assert np.all(sv[1:] == C.SOLVED)
    assert np.all(np.isfinite(res.x[1:]))
    dy = res.prim_inf_cert[0]
    assert np.isfinite(dy).all() and np.abs(dy).max() > 0


def test_polish_baked_into_artifact():
    P, q, A, l, u = _problem(seed=17)
    solver = _prepared_solver(polish=True).prepare(P, A, q=q)
    blob = export_prepared(solver, B=q.shape[0])
    server = load(blob)
    res = server.solve(q, l, u)
    live = solver.solve_prepared(q, l, u)
    assert np.asarray(res.info.status_polish).min() >= 0
    np.testing.assert_array_equal(np.asarray(res.info.status_polish),
                                  np.asarray(live.status_polish))
    np.testing.assert_allclose(res.x, np.asarray(live.x), atol=1e-12)


def test_time_limit_export_refused():
    P, q, A, l, u = _problem()
    solver = _prepared_solver(time_limit=1.0).prepare(P, A, q=q)
    with pytest.raises(ValueError, match="time_limit"):
        export_prepared(solver, B=q.shape[0])


def test_unprepared_solver_refused():
    with pytest.raises(ValueError, match="prepare"):
        export_prepared(_prepared_solver(), B=8)


def test_export_solver_mode2_matrix_updates(tmp_path):
    """Shape-specialized artifact (OSQP codegen mode-2 analogue): P/A are
    runtime inputs, so matrix-value updates need no re-export. Results must
    match the live shared-engine solver bit-for-bit."""
    from osqp_tpu.serve import export_solver

    P, q, A, l, u = _problem(seed=21)
    B, n = q.shape
    m = l.shape[1]
    s = Settings(eps_abs=1e-6, eps_rel=1e-6)
    path = str(tmp_path / "solver.npz")
    export_solver(s, B=B, n=n, m=m, path=path)
    server = load(path)
    live = BatchedSolver(settings=s, kkt_mode="shared")

    res = server.solve(P, A, q, l, u)
    ref = live.solve(P, q, A, l, u)
    assert np.all(np.asarray(res.info.status_val) == C.SOLVED)
    np.testing.assert_allclose(res.x, np.asarray(ref.x), atol=1e-12)
    np.testing.assert_array_equal(np.asarray(res.info.iter),
                                  np.asarray(ref.iter))

    # "matrix update": scale P and perturb A — same artifact, new values
    P2 = 2.0 * P
    A2 = A + 0.01
    res2 = server.solve(P2, A2, q, l, u)
    ref2 = live.solve(P2, q, A2, l, u)
    assert np.all(np.asarray(res2.info.status_val) == C.SOLVED)
    np.testing.assert_allclose(res2.x, np.asarray(ref2.x), atol=1e-12)
    assert np.abs(res2.x - res.x).max() > 1e-3   # the update mattered


def test_load_dispatches_on_kind(tmp_path):
    from osqp_tpu.serve import PreparedServer, SolverServer, export_solver

    P, q, A, l, u = _problem()
    B, n = q.shape
    m = l.shape[1]
    solver = _prepared_solver().prepare(P, A, q=q)
    b1 = export_prepared(solver, B=B)
    b2 = export_solver(Settings(), B=B, n=n, m=m)
    assert isinstance(load(b1), PreparedServer)
    assert isinstance(load(b2), SolverServer)


def test_not_an_artifact_rejected(tmp_path):
    import io as _io
    buf = _io.BytesIO()
    np.savez(buf, magic=np.array("something-else"), exported=np.zeros(4))
    with pytest.raises(ValueError, match="artifact"):
        load(buf.getvalue())


def test_solve_device_hot_path_matches_solve():
    """solve_device returns device arrays identical to solve()'s fields and
    updates the carried factor the same way."""
    P, q, A, l, u = _problem(seed=31)
    B = q.shape[0]
    solver = _prepared_solver().prepare(P, A, q=q)
    blob = export_prepared(solver, B=B)
    s1 = load(blob)
    s2 = load(blob)

    ref = s1.solve(q, l, u)
    out = s2.solve_device(q, l, u)
    assert len(out) == len(PreparedServer.FIELDS)
    d = dict(zip(PreparedServer.FIELDS, out))
    np.testing.assert_allclose(np.asarray(d["x"]), ref.x, atol=0)
    np.testing.assert_array_equal(np.asarray(d["status"]),
                                  np.asarray(ref.info.status_val))
    # second request chaining device handles == solve() chaining numpy
    ref2 = s1.solve(q, l, u, x0=ref.x, y0=ref.y)
    out2 = s2.solve_device(q, l, u, x0=d["x"], y0=d["y"])
    np.testing.assert_allclose(np.asarray(out2[0]), ref2.x, atol=0)
    np.testing.assert_array_equal(np.asarray(out2[4]),
                                  np.asarray(ref2.info.iter))


def test_artifact_metadata_and_platform_warning():
    P, q, A, l, u = _problem(seed=41)
    B = q.shape[0]
    solver = _prepared_solver().prepare(P, A, q=q)
    blob = export_prepared(solver, B=B)
    z = np.load(__import__("io").BytesIO(blob), allow_pickle=False)
    assert str(z["jax_version"]) == jax.__version__
    assert jax.default_backend() in str(z["platforms"]).split(",")

    # an artifact exported for a different platform warns at load
    import io as _io
    import warnings
    buf = _io.BytesIO()
    d = {k: z[k] for k in z.files}
    d["platforms"] = np.array("notaplatform")
    np.savez(buf, **d)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        load(buf.getvalue())
    assert any("exported for platforms" in str(x.message) for x in w)


def test_platform_mode_follows_target_not_host():
    """Round-3 advisor fix: the kernel mode embedded in an artifact follows
    the TARGET platforms, not the exporting host's backend — a 'tpu'
    artifact gets Mosaic kernels (interpret=False) even when exported on
    CPU, and mixing tpu with other platforms is refused."""
    from osqp_tpu.serve import _platform_mode
    assert _platform_mode(["tpu"]) == (["tpu"], False)
    assert _platform_mode(["cpu"]) == (["cpu"], True)
    assert _platform_mode(["cpu", "cuda"]) == (["cpu", "cuda"], True)
    with pytest.raises(ValueError, match="Mosaic"):
        _platform_mode(["tpu", "cpu"])
    # default: follow the current backend
    plats, interp = _platform_mode(None)
    on_tpu = jax.default_backend() in ("tpu", "axon")
    assert interp == (not on_tpu)
    assert plats == (["tpu"] if on_tpu else [jax.default_backend()])

    # a cpu-targeted export built on this (cpu) host runs fine; the
    # explicit platforms path goes through the same mode resolution
    if jax.default_backend() == "cpu":
        P, q, A, l, u = _problem(seed=43)
        B = q.shape[0]
        solver = _prepared_solver().prepare(P, A, q=q)
        blob = export_prepared(solver, B=B, platforms=["cpu"])
        srv = load(blob)
        res = srv.solve(q, l, u)
        assert set(np.asarray(res.info.status_val)) == {1}


def test_export_tf32_artifact_matches_live():
    """matmul_precision='tensorfloat32' is a static compile parameter, so
    it must be baked into the exported program: a tf32 artifact replays the
    tf32 live solver bit-identically, and its statuses match the f32
    engine's (termination math is f32-exact in both)."""
    P, q, A, l, u = _problem(seed=11)
    B = q.shape[0]
    kw = dict(dtype=np.float32, matmul_precision="tensorfloat32",
              eps_abs=1e-4, eps_rel=1e-4, verbose=False)
    solver = BatchedSolver(settings=Settings(**kw),
                           kkt_mode="shared").prepare(P, A, q=q)
    live = solver.solve_prepared(q, l, u)
    blob = export_prepared(solver, B=B)
    srv = load(blob)
    res = srv.solve(q, l, u)
    assert np.array_equal(np.asarray(res.info.status_val),
                          np.asarray(live.status))
    # NOT bit-identical like the f32 artifact: XLA CPU's bf16-multiply
    # emulation differs slightly across the StableHLO serialization round
    # trip, so tf32 iterates drift within the split-product error budget;
    # statuses and iteration counts still match exactly.
    np.testing.assert_allclose(res.x, np.asarray(live.x), atol=5e-4)
    np.testing.assert_array_equal(np.asarray(res.info.iter),
                                  np.asarray(live.iter))
    # f32-engine statuses agree
    f32kw = dict(kw, matmul_precision="float32")
    f32 = BatchedSolver(settings=Settings(**f32kw),
                        kkt_mode="shared").prepare(P, A, q=q)
    ref = f32.solve_prepared(q, l, u)
    assert np.array_equal(np.asarray(ref.status), np.asarray(live.status))
