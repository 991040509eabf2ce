"""Chunked plain-solve driver behaviors (round-5):

* SIGINT during a plain solve returns status ``Interrupted`` instead of
  propagating KeyboardInterrupt (reference constants.jl:17 — the C core
  checks the signal flag inside its loop; the jitted while_loop can't, so
  the chunk boundary is the check point).
* Polish rescue (crossover finish): on a pure LP whose ADMM tail is
  sublinear, ``polish=True`` + a tight eps returns Solved with a polished
  solution that meets the REQUESTED termination criteria, far below the
  iteration budget.
* Chunk-state threading: the plain chunked driver and the time-limited
  driver (different chunk sizes) follow bit-identical trajectories —
  the round-4 advisor found the rho back-off state was reset per chunk.
"""

import signal
import threading

import numpy as np
import pytest

import osqp_tpu as osqp
from osqp_tpu.problems import FAMILIES


def _lp():
    return FAMILIES["lp_qp"]()


def test_sigint_returns_interrupted():
    P, q, A, l, u = _lp()
    # warm the chunk executable at this shape first (tiny max_iter, same
    # shapes/avals): the long solve below must never be inside an XLA
    # compile when the signal fires — a SIGINT during the FIRST chunk's
    # compile re-raises by design (no iterate exists yet) and, under a
    # loaded host, 1 s can land inside that compile (seen in CI-style
    # full-suite runs: pytest aborted with KeyboardInterrupt)
    warm = osqp.Model()
    warm.setup(P=P, q=q, A=A, l=l, u=u, verbose=False, eps_abs=1e-14,
               eps_rel=1e-14, max_iter=10, polish=False)
    warm.solve()
    model = osqp.Model()
    # eps far below what the LP tail can reach, polish off: runs forever
    model.setup(P=P, q=q, A=A, l=l, u=u, verbose=False, eps_abs=1e-14,
                eps_rel=1e-14, max_iter=2_000_000, polish=False)
    timer = threading.Timer(1.0, lambda: signal.raise_signal(signal.SIGINT))
    timer.start()
    try:
        r = model.solve()
    finally:
        timer.cancel()
    assert r.info.status == "Interrupted"
    assert r.info.iter > 0
    # Interrupted is not in SOLUTION_PRESENT: NaN-filled solution
    # (interface.jl:184-210 convention)
    assert np.all(np.isnan(r.x))


def test_polish_rescue_solves_lp_at_tight_eps():
    P, q, A, l, u = _lp()
    model = osqp.Model()
    model.setup(P=P, q=q, A=A, l=l, u=u, verbose=False, eps_abs=1e-7,
                eps_rel=1e-7, max_iter=40000, polish=True)
    r = model.solve()
    assert r.info.status == "Solved"
    assert r.info.status_polish == 1
    # the rescue fires once the tail is projected to miss — far below budget
    assert r.info.iter < 5000
    # the returned point must satisfy the REQUESTED eps (the acceptance
    # contract), verified independently here
    x, y = r.x, r.y
    pri = np.max(np.abs(np.clip(A @ x, l, u) - A @ x))
    dua = np.max(np.abs(P @ x + q + A.T @ y))
    pri_n = max(np.max(np.abs(A @ x)), 1.0)
    dua_n = max(np.max(np.abs(A.T @ y)), np.max(np.abs(q)), 1.0)
    assert pri <= 1e-7 + 1e-7 * pri_n
    assert dua <= 1e-7 + 1e-7 * dua_n


def test_polish_rescue_not_fired_on_converging_qp():
    """A strongly convex QP converges linearly: the projection never says
    'miss', so iteration counts keep exact reference semantics."""
    P, q, A, l, u = FAMILIES["random_qp"]()
    m1 = osqp.Model()
    m1.setup(P=P, q=q, A=A, l=l, u=u, verbose=False, eps_abs=1e-7,
             eps_rel=1e-7, max_iter=40000, polish=True)
    r1 = m1.solve()
    m2 = osqp.Model()
    m2.setup(P=P, q=q, A=A, l=l, u=u, verbose=False, eps_abs=1e-7,
             eps_rel=1e-7, max_iter=40000, polish=False)
    r2 = m2.solve()
    assert r1.info.status == r2.info.status == "Solved"
    assert r1.info.iter == r2.info.iter  # polish never changed the loop


@pytest.mark.parametrize("adaptive", [True, False])
def test_chunked_trajectory_matches_time_limited(adaptive):
    """Plain chunks (250/500/...) and time-limit chunks (~25) must follow
    the same trajectory now that the rho-adaptation state threads through
    chunk re-entries (round-4 advisor fix)."""
    P, q, A, l, u = _lp()
    kw = dict(verbose=False, eps_abs=1e-7, eps_rel=1e-7, max_iter=1500,
              polish=False, adaptive_rho=adaptive)
    m1 = osqp.Model()
    m1.setup(P=P, q=q, A=A, l=l, u=u, **kw)
    r1 = m1.solve()
    m2 = osqp.Model()
    m2.setup(P=P, q=q, A=A, l=l, u=u, time_limit=1e6, **kw)
    r2 = m2.solve()
    assert r1.info.status == r2.info.status
    assert r1.info.iter == r2.info.iter
    assert r1.info.rho_updates == r2.info.rho_updates
    assert r1.info.pri_res == pytest.approx(r2.info.pri_res, rel=1e-12)
    assert r1.info.dua_res == pytest.approx(r2.info.dua_res, rel=1e-12)
