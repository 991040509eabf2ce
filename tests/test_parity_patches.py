"""Behavioral parity patches from the round-1 verdict (item #6):

- per-iteration verbose log on the JAX path (reference verbose setting,
  types.jl:129; column format matches native/solver.cpp log_iter);
- time_limit / KeyboardInterrupt support on the batched and sparse paths
  (reference contract constants.jl:17-18);
- adaptive_rho_interval=0 semantics across engines (C core: timing-based
  when profiling is available — implemented by the native engine — and a
  fixed interval fallback otherwise — the deterministic rule the JAX
  engines use, constants.ADAPTIVE_RHO_FIXED).
"""

import io
import re
import contextlib

import numpy as np
import scipy.sparse as sp

import osqp_tpu as osqp
import osqp_tpu.constants as C
from osqp_tpu.batch import BatchedSolver
from osqp_tpu.native import NativeModel
from osqp_tpu.settings import Settings
from osqp_tpu.sparse_core import SparseModel


def _basic():
    P = np.array([[11.0, 0.0], [0.0, 0.1]])
    q = np.array([3.0, 4.0])
    A = np.array([[-1.0, 0.0], [0.0, -1.0], [-1.0, -3.0],
                  [2.0, 5.0], [3.0, 4.0]])
    l = np.full(5, -np.inf)
    u = np.array([0.0, 0.0, -15.0, 100.0, 80.0])
    return P, q, A, l, u


def _rand_batch(B, n, m, seed=0):
    rng = np.random.RandomState(seed)
    M = rng.randn(n, n) / np.sqrt(n)
    P = M.T @ M + 0.1 * np.eye(n)
    A = rng.randn(m, n) / np.sqrt(n)
    q = rng.randn(B, n)
    c = rng.randn(B, m) * 0.1
    w = 0.5 + rng.rand(B, m)
    return P, q, A, c - w, c + w


def test_verbose_iteration_log():
    """verbose=True must print per-iteration rows (iter, objective,
    pri_res, dua_res, rho) plus header and summary."""
    P, q, A, l, u = _basic()
    model = osqp.Model()
    model.setup(P=P, q=q, A=A, l=l, u=u, verbose=True,
                eps_abs=1e-9, eps_rel=1e-9)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        r = model.solve()
    text = buf.getvalue()
    assert r.info.status == "Solved"
    rows = re.findall(r"^\s+\d+\s+[-\d.e+]+\s+[\d.e+-]+\s+[\d.e+-]+"
                      r"\s+[\d.e+-]+\s*$", text, re.M)
    assert len(rows) >= 2, text  # at least two check-boundary rows
    assert "iter" in text and "objective" in text  # column header
    assert "status: Solved" in text  # summary footer


def test_verbose_silent_when_off():
    P, q, A, l, u = _basic()
    model = osqp.Model()
    model.setup(P=P, q=q, A=A, l=l, u=u, verbose=False)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        model.solve()
    assert buf.getvalue() == ""


def test_batched_time_limit():
    P, q, A, l, u = _rand_batch(128, 8, 12)
    s = Settings(eps_abs=1e-6, eps_rel=1e-6, verbose=False, time_limit=60.0)
    out = BatchedSolver(settings=s, kkt_mode="shared").solve(P, q, A, l, u)
    assert np.all(np.asarray(out.status) == 1)

    s2 = Settings(eps_abs=1e-13, eps_rel=0.0, verbose=False, time_limit=1e-4,
                  max_iter=500000, adaptive_rho=False)
    out2 = BatchedSolver(settings=s2, kkt_mode="shared").solve(P, q, A, l, u)
    assert np.any(np.asarray(out2.status) == C.TIME_LIMIT_REACHED)
    # lockstep engine honors it too
    B, n, m = q.shape[0], q.shape[1], l.shape[1]
    out3 = BatchedSolver(settings=s2, kkt_mode="inverse").solve(
        np.broadcast_to(P, (B, n, n)), q, np.broadcast_to(A, (B, m, n)), l, u)
    assert np.any(np.asarray(out3.status) == C.TIME_LIMIT_REACHED)


def test_sparse_time_limit():
    rng = np.random.RandomState(0)
    n, m = 120, 180
    P = sp.random(n, n, 0.05, random_state=rng)
    P = (P @ P.T).tocsr() + 0.5 * sp.eye(n)
    A = sp.random(m, n, 0.05, random_state=rng).tocsr()
    q = rng.randn(n)
    c = A @ rng.randn(n) * 0.1
    w = 0.5 + rng.rand(m)
    sm = SparseModel()
    sm.setup(P=P, q=q, A=A, l=c - w, u=c + w, verbose=False,
             eps_abs=1e-5, eps_rel=1e-5, time_limit=60.0)
    r = sm.solve()
    assert r.info.status == "Solved"

    sm2 = SparseModel()
    sm2.setup(P=P, q=q, A=A, l=c - w, u=c + w, verbose=False,
              eps_abs=1e-14, eps_rel=0.0, max_iter=2000000,
              time_limit=1e-4, adaptive_rho=False)
    r2 = sm2.solve()
    assert r2.info.status == "Time_limit_reached"


def test_adaptive_rho_interval_zero_both_engines():
    """interval=0: the C core uses solve-time profiling when available
    (native engine implements that) and a fixed-interval fallback otherwise
    (the deterministic rule the JAX engines use). Both must accept 0 and
    solve; the JAX engine must be run-to-run deterministic."""
    P, q, A, l, u = _basic()
    iters = []
    for _ in range(2):
        model = osqp.Model()
        model.setup(P=P, q=q, A=A, l=l, u=u, verbose=False,
                    adaptive_rho=True, adaptive_rho_interval=0,
                    eps_abs=1e-7, eps_rel=1e-7)
        r = model.solve()
        assert r.info.status == "Solved"
        iters.append(r.info.iter)
    assert iters[0] == iters[1]  # deterministic fallback

    nm = NativeModel()
    nm.setup(P=P, q=q, A=A, l=l, u=u, verbose=False, adaptive_rho=True,
             adaptive_rho_interval=0, eps_abs=1e-7, eps_rel=1e-7)
    rn = nm.solve()
    assert rn.info.status == "Solved"
