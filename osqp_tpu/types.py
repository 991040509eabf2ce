"""Core data containers.

Host-facing ``Info``/``Results`` mirror the reference's Julia-side structs
(``/root/reference/src/types.jl:219-272``). Device-side containers are JAX
pytrees (NamedTuples) — the functional analogue of the C ``Workspace`` the
wrapper mirrors at types.jl:173-217 — so the whole solver state is vmappable,
shardable, and trivially checkpointable (SURVEY.md §5 checkpoint/resume note).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import numpy as np

from .constants import STATUS_MAP


# ---------------------------------------------------------------------------
# Device-side pytrees
# ---------------------------------------------------------------------------

class QPData(NamedTuple):
    """Dense canonical problem data: min 0.5 x'Px + q'x  s.t.  l <= Ax <= u.

    ``P`` is stored as the full symmetric matrix (the reference stores
    upper-triangular CSC — interface.jl:101-104 — purely as a C-ABI convention;
    on TPU the full dense operand feeds the MXU directly).
    """
    P: Any  # (n, n)
    q: Any  # (n,)
    A: Any  # (m, n)
    l: Any  # (m,)
    u: Any  # (m,)


class ScalingData(NamedTuple):
    """Ruiz equilibration result: P̄=c·D P D, q̄=c·D q, Ā=E A D, l̄=E l, ū=E u."""
    D: Any      # (n,)
    E: Any      # (m,)
    c: Any      # scalar
    Dinv: Any   # (n,)
    Einv: Any   # (m,)
    cinv: Any   # scalar


class DynParams(NamedTuple):
    """Dynamic (traced) solver parameters.

    Everything that can change via ``update_settings!`` (reference
    interface.jl:442-670) is traced, so settings updates never trigger a
    recompile — the TPU analogue of the reference's zero-allocation re-solve
    contract (test/MOI_wrapper.jl:341-342).
    """
    rho_bar: Any
    sigma: Any
    alpha: Any
    eps_abs: Any
    eps_rel: Any
    eps_prim_inf: Any
    eps_dual_inf: Any
    max_iter: Any             # int32
    check_termination: Any    # int32, 0 = never
    adaptive_rho: Any         # int32 flag
    adaptive_rho_interval: Any  # int32 (resolved; never 0 when adaptive on)
    adaptive_rho_tolerance: Any
    scaled_termination: Any   # int32 flag
    final_approx: Any         # int32 flag: run the 10x-eps "inaccurate" check
                              # when max_iter is hit (suppressed for
                              # intermediate chunks of the time-limit driver)
    cg_tol: Any               # indirect (CG) KKT solve: relative tolerance
    cg_max_iter: Any          # indirect KKT solve: iteration cap (int32)
    start_iter: Any = 0       # int32 global iteration offset (chunked
                              # time-limit driver: keeps check/rho cadence
                              # aligned across chunks)
    rho_backoff: Any = 1      # int32 flag: ping-pong back-off on automatic
                              # rho adaptation (set iff the user left
                              # adaptive_rho_interval at 0/auto; pinned
                              # intervals keep exact fixed-interval
                              # reference semantics — see core.Carry)
    # --- chunk-resume state (round-4 advisor: the chunked drivers re-enter
    # solve_scaled with a fresh carry, so without threading these the
    # automatic-mode rho back-off restarted undamped every chunk and a
    # time-limited solve's rho schedule diverged from the unchunked one).
    # All default to "fresh": 0 means derive from the interval / factor
    # state. The chunk drivers feed the previous chunk's SolveOutput values
    # back in, making a chunked trajectory bit-identical to an unchunked one.
    rho_dir0: Any = 0         # int32: sign of the last accepted rho update
    rho_gap0: Any = 0         # int32: current back-off gap (0 = interval)
    next_rho0: Any = 0        # int32: first iteration allowed to update rho
    rho_est0: Any = 0.0       # resume value for rho_estimate (0 = rho_bar)


class SolveOutput(NamedTuple):
    """Result of the jitted ADMM core (scaled iterates + diagnostics).

    ``status_polish`` follows the reference CInfo convention (types.jl:88):
    1 = polished successfully, 0 = not run, -1 = attempted and rejected."""
    x: Any            # (n,)  unscaled primal solution
    y: Any            # (m,)  unscaled dual solution
    z: Any            # (m,)  unscaled slack Ax ≈ z
    status: Any       # int32 status code (constants.py)
    iter: Any         # int32 iterations performed
    pri_res: Any      # final primal residual (unscaled unless scaled_termination)
    dua_res: Any      # final dual residual
    obj_val: Any      # 0.5 x'Px + q'x (unscaled); NaN for Non_convex
    prim_cert: Any    # (m,) normalized primal infeasibility certificate δy
    dual_cert: Any    # (n,) normalized dual infeasibility certificate δx
    rho_updates: Any  # int32
    rho_estimate: Any # last computed rho estimate
    # scaled iterates for warm-starting the next solve without rescaling
    xbar: Any
    ybar: Any
    zbar: Any
    status_polish: Any = 0  # int32 (see class docstring)
    # chunk-resume state (fed back into DynParams.rho_dir0/rho_gap0/
    # next_rho0 by the chunked drivers — see DynParams)
    rho_dir: Any = 0        # int32
    rho_gap: Any = 0        # int32
    next_rho: Any = 0       # int32


# ---------------------------------------------------------------------------
# Host-side result containers (reference types.jl:219-272)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class Info:
    """Mirror of the reference ``Info`` struct (types.jl:219-254)."""
    iter: int = 0
    status: str = "Unsolved"
    status_val: int = -10
    status_polish: int = 0
    obj_val: float = float("nan")
    pri_res: float = float("nan")
    dua_res: float = float("nan")
    setup_time: float = 0.0
    solve_time: float = 0.0
    update_time: float = 0.0
    polish_time: float = 0.0
    run_time: float = 0.0
    rho_updates: int = 0
    rho_estimate: float = float("nan")

    @staticmethod
    def status_from_val(val: int) -> str:
        return STATUS_MAP.get(int(val), "Unsolved")


@dataclasses.dataclass
class Results:
    """Mirror of the reference ``Results`` struct (types.jl:256-272).

    ``x``/``y`` are NaN-filled when no solution is present; infeasibility
    certificates are NaN-filled unless the corresponding status was detected
    (interface.jl:184-210 semantics).
    """
    x: np.ndarray
    y: np.ndarray
    info: Info
    prim_inf_cert: Optional[np.ndarray] = None
    dual_inf_cert: Optional[np.ndarray] = None


def solution_present(status):
    """SOLUTION_PRESENT mask by numeric status code (the reference's
    constants.jl:23 set: Solved, Solved_inaccurate, Max_iter_reached) — the
    single source of truth for the NaN-fill solution convention
    (interface.jl:184-210) shared by every engine's API boundary."""
    from . import constants as C
    return ((status == C.SOLVED) | (status == C.SOLVED_INACCURATE)
            | (status == C.MAX_ITER_REACHED))
