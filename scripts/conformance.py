"""Maros-Meszaros-class parity sweep (VERDICT round-1 item #2).

Runs every problem family in ``osqp_tpu.problems`` across the
``SIZE_GRID`` (S/M/L, roughly an order of magnitude in n per family,
mirroring the OSQP-paper benchmark scaling protocol, Stellato et al. 2020
§8) on the engines:

  - ``jax-direct``   Model, dense reduced-KKT Cholesky path
  - ``jax-cg``       Model, matrix-free indirect (CG) path
  - ``native``       the C++ sparse-LDL engine (libtpuqp.so)
  - ``batched``      BatchedSolver lockstep engine (B=1 lane)

and compares each against the independent interior-point oracle
(``osqp_tpu.utils.ipm``, ~1e-9 KKT). Real OSQP-C is unavailable in this
environment (zero network egress; no vendored binary — the reference wrapper
itself ships none, /root/reference/Project.toml:18 pins a jll binary), so
the IPM oracle is the external truth: a different algorithm family sharing
no code with any engine under test.

Writes ``CONFORMANCE.md`` (human table) and ``conformance.json`` (raw).
Run on CPU f64 (conformance is a correctness property; perf lives in
bench.py):

    python scripts/conformance.py [--quick]
"""

import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import osqp_tpu as osqp  # noqa: E402
from osqp_tpu.native import NativeModel  # noqa: E402
from osqp_tpu.batch import BatchedSolver  # noqa: E402
from osqp_tpu.settings import Settings  # noqa: E402
from osqp_tpu.problems import FAMILIES, SIZE_GRID  # noqa: E402
from osqp_tpu.utils.ipm import solve_qp_ipm  # noqa: E402

EPS = 1e-6          # engine tolerance for the sweep
MAX_ITER = 100000
# Pass thresholds: status must be Solved (or Solved_inaccurate on the
# hardest draws), and objective must match the oracle to this relative tol.
OBJ_RTOL = 1e-4
X_ATOL = 5e-3       # x agreement (looser: x need not be unique when P is
#                     singular along the active-constraint nullspace)


def run_engine(engine, P, q, A, l, u, kw=None):
    t0 = time.perf_counter()
    if engine == "structured":
        import scipy.sparse as sp
        from osqp_tpu.structured import BlockTridiagSolver
        st = BlockTridiagSolver().setup(
            P=sp.csc_matrix(P), A=sp.csc_matrix(A),
            block=kw["nx"] + kw["nu"], eps_abs=EPS, eps_rel=EPS,
            max_iter=MAX_ITER, verbose=False, dtype=np.float64)
        out = st.solve(q, l, u)
        sv = int(np.asarray(out["status"])[0])
        status = "Solved" if sv == 1 else f"status:{sv}"
        return (status, np.asarray(out["x"])[0],
                float(np.asarray(out["obj_val"])[0]),
                int(np.asarray(out["iter"])[0]), time.perf_counter() - t0)
    if engine == "native":
        model = NativeModel()
        model.setup(P=P, q=q, A=A, l=l, u=u, verbose=False, eps_abs=EPS,
                    eps_rel=EPS, max_iter=MAX_ITER, polish=True)
        r = model.solve()
        return (r.info.status, r.x, r.info.obj_val, int(r.info.iter),
                time.perf_counter() - t0)
    if engine == "batched":
        s = Settings(eps_abs=EPS, eps_rel=EPS, max_iter=MAX_ITER,
                     verbose=False, polish=True)
        out = BatchedSolver(settings=s).solve(
            P[None], q[None], A[None], l[None], u[None])
        status = "Solved" if int(np.asarray(out.status)[0]) == 1 \
            else str(np.asarray(out.status)[0])
        x = np.asarray(out.x)[0]
        obj = 0.5 * x @ P @ x + q @ x
        return (status, x, float(obj), int(np.asarray(out.iter)[0]),
                time.perf_counter() - t0)
    linsys = "direct" if engine == "jax-direct" else "cg"
    model = osqp.Model()
    model.setup(P=P, q=q, A=A, l=l, u=u, verbose=False, eps_abs=EPS,
                eps_rel=EPS, max_iter=MAX_ITER, polish=True,
                linsys_solver=linsys)
    r = model.solve()
    return (r.info.status, r.x, r.info.obj_val, int(r.info.iter),
            time.perf_counter() - t0)


def main():
    quick = "--quick" in sys.argv
    engines = ["jax-direct", "jax-cg", "native", "batched"]
    rows = []
    for fam in sorted(FAMILIES):
        grid = SIZE_GRID[fam][:1] if quick else SIZE_GRID[fam]
        for label, kw in grid:
            P, q, A, l, u = FAMILIES[fam](**kw)
            n, m = P.shape[0], A.shape[0]
            o = solve_qp_ipm(P, q, A, l, u)
            if o.status != "optimal":
                print(f"SKIP {fam}/{label}: oracle status={o.status} "
                      f"kkt={o.kkt_res:.1e}")
                continue
            fam_engines = engines + (
                ["structured"] if fam == "control_qp" else [])
            for eng in fam_engines:
                try:
                    status, x, obj, iters, dt = run_engine(eng, P, q, A, l, u,
                                                           kw=kw)
                except Exception as e:  # pragma: no cover
                    rows.append(dict(family=fam, size=label, n=n, m=m,
                                     engine=eng, status=f"ERROR:{e}",
                                     ok=False))
                    print(f"{fam}/{label} {eng}: ERROR {e}")
                    continue
                obj_err = abs(obj - o.obj) / (1 + abs(o.obj))
                x_err = float(np.max(np.abs(x - o.x))) if status.startswith(
                    "Solved") else float("nan")
                ok = (status.startswith("Solved")
                      and obj_err < OBJ_RTOL
                      and (x_err < X_ATOL or fam == "degenerate_qp"))
                rows.append(dict(family=fam, size=label, n=n, m=m, engine=eng,
                                 status=status, iters=iters,
                                 obj_err=obj_err, x_err=x_err,
                                 time_s=round(dt, 3), ok=bool(ok)))
                print(f"{fam}/{label} ({n}x{m}) {eng:10s} {status:8s} "
                      f"it={iters:6d} obj_err={obj_err:.1e} "
                      f"x_err={x_err:.1e} t={dt:.2f}s {'OK' if ok else 'FAIL'}")

    n_ok = sum(r["ok"] for r in rows)
    with open("conformance.json", "w") as f:
        json.dump(dict(rows=rows, passed=n_ok, total=len(rows),
                       eps=EPS, obj_rtol=OBJ_RTOL), f, indent=1)

    md = [
        "# CONFORMANCE — parity sweep vs the independent IPM oracle",
        "",
        "**Oracle.** Real OSQP-C is unavailable in this build environment "
        "(zero network egress: `pip install osqp` fails DNS resolution, and "
        "the reference repo vendors no C sources — "
        "/root/reference/Project.toml:18 pins the `OSQP_jll` binary, which "
        "is also absent). The external truth here is "
        "`osqp_tpu/utils/ipm.py`: a from-scratch Mehrotra predictor-"
        "corrector interior-point solver (~1e-9 KKT residual), a different "
        "algorithm family sharing no code, scaling, or termination logic "
        "with the engines under test. Its own correctness is pinned against "
        "the reference's hand-computed values (test/basic.jl:43-49) and "
        "scipy-HiGHS feasibility LPs in tests/test_oracle.py.",
        "",
        f"**Protocol.** Every family × size (S/M/L grid, OSQP-paper-style "
        f"order-of-magnitude sweep per family) × 4 engines at eps={EPS}. "
        f"Pass = status Solved, |obj − obj*|/(1+|obj*|) < {OBJ_RTOL}, "
        f"‖x − x*‖∞ < {X_ATOL} (x-check waived for the rank-deficient "
        "degenerate family where x* is non-unique). CPU f64; conformance "
        "is a correctness property, perf lives in bench.py/PERFORMANCE.md.",
        "",
        f"**Result: {n_ok}/{len(rows)} cells pass.**",
        "",
        "| family | size | n×m | engine | status | iters | obj err | "
        "x err | time |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        if "iters" in r:
            md.append(
                f"| {r['family']} | {r['size']} | {r['n']}×{r['m']} | "
                f"{r['engine']} | {r['status']} | {r['iters']} | "
                f"{r['obj_err']:.1e} | {r['x_err']:.1e} | {r['time_s']}s |")
        else:
            md.append(
                f"| {r['family']} | {r['size']} | {r['n']}×{r['m']} | "
                f"{r['engine']} | {r['status']} | — | — | — | — |")
    with open("CONFORMANCE.md", "w") as f:
        f.write("\n".join(md) + "\n")
    print(f"\n{n_ok}/{len(rows)} pass -> CONFORMANCE.md, conformance.json")
    return 0 if n_ok == len(rows) else 1


if __name__ == "__main__":
    sys.exit(main())
