"""AOT-compiled solver artifacts — the TPU-native analogue of OSQP's
embedded code generation.

Upstream OSQP C ships ``osqp_codegen``, emitting problem-specialized C
sources for embedded deployment (the reference wrapper does not expose it;
the capability lives behind the same ABI the wrapper mirrors,
/root/reference/src/types.jl:1-2 note on upstream ``include/types.h``). The
TPU-native equivalent of "generated code specialized to one problem
structure" is an ahead-of-time compiled, serialized XLA program:
:func:`jax.export.export` captures the prepared batched re-solve — problem
structure (P, A), Ruiz scaling, dimensions, settings and kernel tiling baked
in as constants; per-request ``q``/``l``/``u`` and warm starts as runtime
inputs — into a portable StableHLO artifact. A serving process deserializes
the artifact and calls it without Python tracing, without jit cache warmup
beyond one compile, and without ``osqp_tpu`` on the import path (only jax).

The adapted KKT factor/rho is threaded through the artifact's inputs and
outputs, so a server keeps the reference's persistent-workspace economics
(src/interface.jl:408-440) across requests: :class:`PreparedServer` manages
that state and exposes the same ``solve(q, l, u)`` surface as
``BatchedSolver.solve_prepared``.
"""

from __future__ import annotations

import io
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import constants as C
from .batch import _nanfill, _pick_group, _prepared_solve_impl
from .core import dyn_from_settings
from .shared_core import FactorCache
from .types import Info, Results

#: Artifact container format: a small npz with the serialized Exported bytes
#: plus the initial factor-state arrays and metadata needed to drive it.
_MAGIC = "osqp_tpu-aot-v1"


def _export_platforms(platforms):
    if platforms is not None:
        return list(platforms)
    backend = jax.default_backend()
    # the axon runtime registers its own platform name but lowers as tpu
    return ["tpu"] if backend in ("tpu", "axon") else [backend]


def _platform_mode(platforms):
    """Resolve (platforms, interpret) for an export.

    The kernel mode must match the platforms the artifact TARGETS, not the
    host doing the exporting: a 'tpu' artifact embeds Mosaic
    (tpu_custom_call) kernels, anything else embeds interpret-mode kernels
    that run on any backend. Mixing 'tpu' with other platforms in one
    artifact is impossible for the same reason."""
    plats = _export_platforms(platforms)
    has_tpu = "tpu" in plats
    if has_tpu and len(plats) > 1:
        raise ValueError(
            "a 'tpu' artifact embeds Mosaic kernels that only run on TPU; "
            "export separate artifacts per platform instead of "
            f"platforms={plats}")
    return plats, (not has_tpu)


def export_prepared(solver, B: int, path: Optional[str] = None,
                    platforms: Optional[Sequence[str]] = None) -> bytes:
    """Export a prepared :class:`osqp_tpu.batch.BatchedSolver` as an AOT
    artifact for batch size ``B``.

    ``solver`` must have been :meth:`~osqp_tpu.batch.BatchedSolver.prepare`-d
    (kkt_mode='shared'): the problem structure, equilibration, settings and
    kernel tiling are baked into the exported program. Runtime inputs are
    ``q (B, n)``, ``l``/``u (B, m)``, warm starts ``x0 (B, n)``/``y0 (B, m)``
    and the carried factor state; outputs are the solution fields plus the
    updated factor state.

    Returns the serialized artifact bytes; also written to ``path`` if given.
    Deserialize with :func:`load` (any host with jax — osqp_tpu itself is
    not required to run the artifact).
    """
    if not hasattr(solver, "_prep"):
        raise ValueError("export_prepared requires a prepare()-d solver")
    s = solver.settings
    if s.time_limit and s.time_limit > 0:
        raise ValueError(
            "time_limit uses a host-side chunked driver and cannot be baked "
            "into an AOT artifact; export with time_limit=0 and enforce "
            "deadlines in the serving layer")
    dtype = s.resolve_dtype()
    p = solver._prep
    n = int(p["P"].shape[0])
    m = int(p["A"].shape[0])
    B = int(B)
    dyn = dyn_from_settings(s, dtype)
    # kernel mode follows the TARGET platforms, not the exporting host
    # (exporting on CPU for ['tpu'] must embed Mosaic kernels + TPU tiling)
    plats, interpret = _platform_mode(platforms)
    group = _pick_group(B, n, m, jnp.dtype(dtype).itemsize, interpret)
    Pb, Ab, scal = p["Pb"], p["Ab"], p["scal"]
    do_polish = bool(s.polish)
    Pd, Ad = p["P"], p["A"]

    def serve_fn(q, l, u, x0, y0, Rinv, rho_vec, rho_inv, rho_bar):
        factor = FactorCache(Rinv=Rinv, rho_vec=rho_vec, rho_inv=rho_inv,
                             rho_bar=rho_bar)
        out, fac = _prepared_solve_impl(
            Pb, Ab, scal, q, l, u, x0, y0, dyn, factor,
            group=group, interpret=interpret,
            adaptive=bool(s.adaptive_rho), lowp=bool(s.mixed_precision),
            tf32=s.tf32())
        if do_polish:
            from .batch import _batched_polish
            data_P = jnp.broadcast_to(Pd, (B, n, n))
            data_A = jnp.broadcast_to(Ad, (B, m, n))
            from .types import QPData
            out = _batched_polish(
                QPData(P=data_P, q=q, A=data_A, l=l, u=u), dyn,
                jnp.int32(s.scaling), jnp.asarray(s.delta, dtype),
                jnp.int32(s.polish_refine_iter), out)
        out = _nanfill(out)
        return (out.x, out.y, out.z, out.status, out.iter, out.obj_val,
                out.pri_res, out.dua_res, out.status_polish,
                out.prim_cert, out.dual_cert, out.rho_updates,
                out.rho_estimate,
                fac.Rinv, fac.rho_vec, fac.rho_inv, fac.rho_bar)

    sds = jax.ShapeDtypeStruct
    args = (sds((B, n), dtype), sds((B, m), dtype), sds((B, m), dtype),
            sds((B, n), dtype), sds((B, m), dtype),
            sds((n, n), dtype), sds((m,), dtype), sds((m,), dtype),
            sds((), dtype))
    exported = jax.export.export(
        jax.jit(serve_fn),
        platforms=plats,
        # the shared engine's iteration kernel lowers to a Mosaic TPU custom
        # call on hardware; its forward-compatibility window is managed by
        # the jax/libtpu pairing, not the StableHLO versioning this check
        # guards, so it must be waived explicitly
        disabled_checks=[
            jax.export.DisabledSafetyCheck.custom_call("tpu_custom_call"),
            jax.export.DisabledSafetyCheck.custom_call("Sharding"),
        ],
    )(*args)

    fac0 = p["factor"]
    buf = io.BytesIO()
    np.savez(
        buf,
        magic=np.array(_MAGIC), kind=np.array("prepared"),
        exported=np.frombuffer(exported.serialize(), np.uint8),
        B=np.int64(B), n=np.int64(n), m=np.int64(m),
        dtype=np.array(jnp.dtype(dtype).name),
        jax_version=np.array(jax.__version__),
        platforms=np.array(",".join(exported.platforms)),
        Rinv=np.asarray(fac0.Rinv), rho_vec=np.asarray(fac0.rho_vec),
        rho_inv=np.asarray(fac0.rho_inv), rho_bar=np.asarray(fac0.rho_bar),
    )
    blob = buf.getvalue()
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def export_solver(settings, B: int, n: int, m: int,
                  path: Optional[str] = None,
                  platforms: Optional[Sequence[str]] = None) -> bytes:
    """Export a shape-specialized cold solver: the analogue of OSQP
    codegen's matrix-update mode (embedded mode 2), where P/A values may
    change between requests (on TPU's dense engines the "sparsity pattern"
    is the shape, so any same-shape P/A is admissible).

    The artifact's runtime inputs are the full problem
    ``(P (n,n), A (m,n), q (B,n), l/u (B,m))`` plus warm starts; scaling
    and factorization run inside the program on every request. Use
    :func:`export_prepared` when the structure is fixed — it amortizes
    both across requests.
    """
    s = settings
    if s.time_limit and s.time_limit > 0:
        raise ValueError(
            "time_limit uses a host-side chunked driver and cannot be baked "
            "into an AOT artifact; export with time_limit=0 and enforce "
            "deadlines in the serving layer")
    dtype = s.resolve_dtype()
    B, n, m = int(B), int(n), int(m)
    dyn = dyn_from_settings(s, dtype)
    plats, interpret = _platform_mode(platforms)
    group = _pick_group(B, n, m, jnp.dtype(dtype).itemsize, interpret)
    do_polish = bool(s.polish)

    from .shared_core import solve_shared as _shared_solve_impl

    def serve_fn(P, A, q, l, u, x0, y0):
        out = _shared_solve_impl(
            P, A, q, l, u, dyn, jnp.int32(s.scaling), x0, y0,
            group=group, interpret=interpret,
            adaptive=bool(s.adaptive_rho), lowp=bool(s.mixed_precision),
            tf32=s.tf32())
        if do_polish:
            from .batch import _batched_polish
            from .types import QPData
            data_P = jnp.broadcast_to(P, (B, n, n))
            data_A = jnp.broadcast_to(A, (B, m, n))
            out = _batched_polish(
                QPData(P=data_P, q=q, A=data_A, l=l, u=u), dyn,
                jnp.int32(s.scaling), jnp.asarray(s.delta, dtype),
                jnp.int32(s.polish_refine_iter), out)
        out = _nanfill(out)
        return (out.x, out.y, out.z, out.status, out.iter, out.obj_val,
                out.pri_res, out.dua_res, out.status_polish,
                out.prim_cert, out.dual_cert, out.rho_updates,
                out.rho_estimate)

    sds = jax.ShapeDtypeStruct
    args = (sds((n, n), dtype), sds((m, n), dtype),
            sds((B, n), dtype), sds((B, m), dtype), sds((B, m), dtype),
            sds((B, n), dtype), sds((B, m), dtype))
    exported = jax.export.export(
        jax.jit(serve_fn),
        platforms=plats,
        disabled_checks=[
            jax.export.DisabledSafetyCheck.custom_call("tpu_custom_call"),
            jax.export.DisabledSafetyCheck.custom_call("Sharding"),
        ],
    )(*args)

    buf = io.BytesIO()
    np.savez(
        buf,
        magic=np.array(_MAGIC), kind=np.array("solver"),
        exported=np.frombuffer(exported.serialize(), np.uint8),
        B=np.int64(B), n=np.int64(n), m=np.int64(m),
        dtype=np.array(jnp.dtype(dtype).name),
        jax_version=np.array(jax.__version__),
        platforms=np.array(",".join(exported.platforms)),
    )
    blob = buf.getvalue()
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


class SolverServer:
    """Runs a deserialized shape-specialized cold-solver artifact (see
    :func:`export_solver`): every request carries its own P/A."""

    STATUS = dict(C.STATUS_MAP)

    def __init__(self, exported, meta):
        self.exported = exported
        self.B = int(meta["B"])
        self.n = int(meta["n"])
        self.m = int(meta["m"])
        self.dtype = jnp.dtype(str(meta["dtype"]))
        self._call = jax.jit(exported.call)

    def solve(self, P, A, q, l, u, x0=None, y0=None) -> Results:
        dt = self.dtype
        if x0 is None:
            x0 = jnp.zeros((self.B, self.n), dt)
        if y0 is None:
            y0 = jnp.zeros((self.B, self.m), dt)
        (x, y, z, status, it, obj, pri, dua, st_pol, pcert, dcert,
         rho_upd, rho_est) = self._call(
            jnp.asarray(P, dt), jnp.asarray(A, dt), jnp.asarray(q, dt),
            jnp.asarray(l, dt), jnp.asarray(u, dt),
            jnp.asarray(x0, dt), jnp.asarray(y0, dt))
        status = np.asarray(status)
        info = Info(
            iter=np.asarray(it), status=np.array(
                [self.STATUS.get(int(v), "Unsolved") for v in status]),
            status_val=status, status_polish=np.asarray(st_pol),
            obj_val=np.asarray(obj), pri_res=np.asarray(pri),
            dua_res=np.asarray(dua), rho_updates=np.asarray(rho_upd),
            rho_estimate=np.asarray(rho_est))
        return Results(x=np.asarray(x), y=np.asarray(y), info=info,
                       prim_inf_cert=np.asarray(pcert),
                       dual_inf_cert=np.asarray(dcert))


class PreparedServer:
    """Runs a deserialized AOT solver artifact, carrying the adapted factor
    state across requests (the persistent-workspace economics of the
    reference's update!/solve! loop, src/interface.jl:408-440).

    Self-contained at runtime: needs jax but not osqp_tpu (this class is a
    convenience handle; the raw :class:`jax.export.Exported` in ``.exported``
    can be driven directly — see ``call_flat``).

    Concurrency: the carried factor state is plain instance state, updated
    per call — one ``PreparedServer`` per serving thread (or wrap calls in
    a lock). The deserialized ``Exported`` itself is immutable and may be
    shared; ``load()`` on the same bytes is cheap.
    """

    #: status-code -> string, inlined so artifact consumers don't need
    #: osqp_tpu.constants (values mirror reference src/constants.jl:9-21)
    STATUS = dict(C.STATUS_MAP)

    def __init__(self, exported, factor_arrays, meta):
        self.exported = exported
        self._factor = tuple(jnp.asarray(a) for a in factor_arrays)
        self.B = int(meta["B"])
        self.n = int(meta["n"])
        self.m = int(meta["m"])
        self.dtype = jnp.dtype(str(meta["dtype"]))
        self._call = jax.jit(exported.call)

    def call_flat(self, q, l, u, x0, y0):
        """One raw artifact call: returns the flat output tuple and updates
        the carried factor state."""
        outs = self._call(q, l, u, x0, y0, *self._factor)
        self._factor = tuple(outs[-4:])
        return outs[:-4]

    #: index map for the flat output tuple of :meth:`solve_device`
    FIELDS = ("x", "y", "z", "status", "iter", "obj_val", "pri_res",
              "dua_res", "status_polish", "prim_inf_cert", "dual_inf_cert",
              "rho_updates", "rho_estimate")

    def solve_device(self, q, l, u, x0=None, y0=None):
        """Hot-loop variant of :meth:`solve`: everything stays on device.

        Accepts device (or host) arrays, returns the flat tuple of DEVICE
        arrays in :data:`FIELDS` order — no host conversion, so a serving
        loop that feeds ``x``/``y`` back as the next warm start pays one
        host round-trip per *downloaded field*, not thirteen. On relayed
        TPU hosts (~70 ms/round-trip) this is the difference between
        tunnel-bound and compute-bound serving."""
        dt = self.dtype
        if x0 is None:
            x0 = jnp.zeros((self.B, self.n), dt)
        if y0 is None:
            y0 = jnp.zeros((self.B, self.m), dt)
        return self.call_flat(jnp.asarray(q, dt), jnp.asarray(l, dt),
                              jnp.asarray(u, dt), jnp.asarray(x0, dt),
                              jnp.asarray(y0, dt))

    def solve(self, q, l, u, x0=None, y0=None) -> Results:
        """Batched re-solve with the baked problem structure. Returns the
        same :class:`osqp_tpu.types.Results`-shaped record as the live
        solver: x/y (B-stacked, NaN-filled when no solution), per-lane Info
        fields as arrays."""
        dt = self.dtype
        q = jnp.asarray(q, dt)
        l = jnp.asarray(l, dt)
        u = jnp.asarray(u, dt)
        if x0 is None:
            x0 = jnp.zeros((self.B, self.n), dt)
        if y0 is None:
            y0 = jnp.zeros((self.B, self.m), dt)
        (x, y, z, status, it, obj, pri, dua, st_pol, pcert, dcert,
         rho_upd, rho_est) = self.call_flat(
            q, l, u, jnp.asarray(x0, dt), jnp.asarray(y0, dt))
        status = np.asarray(status)
        info = Info(
            iter=np.asarray(it), status=np.array(
                [self.STATUS.get(int(v), "Unsolved") for v in status]),
            status_val=status, status_polish=np.asarray(st_pol),
            obj_val=np.asarray(obj), pri_res=np.asarray(pri),
            dua_res=np.asarray(dua), rho_updates=np.asarray(rho_upd),
            rho_estimate=np.asarray(rho_est))
        return Results(x=np.asarray(x), y=np.asarray(y), info=info,
                       prim_inf_cert=np.asarray(pcert),
                       dual_inf_cert=np.asarray(dcert))


def load(path_or_bytes):
    """Deserialize an artifact written by :func:`export_prepared` (returns
    a :class:`PreparedServer`) or :func:`export_solver` (returns a
    :class:`SolverServer`)."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        buf = io.BytesIO(bytes(path_or_bytes))
        z = np.load(buf, allow_pickle=False)
    else:
        z = np.load(path_or_bytes, allow_pickle=False)
    if str(z["magic"]) != _MAGIC:
        raise ValueError("not an osqp_tpu AOT artifact")
    if "platforms" in z:
        plats = str(z["platforms"]).split(",")
        backend = jax.default_backend()
        eff = "tpu" if backend == "axon" else backend
        if eff not in plats:
            import warnings
            warnings.warn(
                f"artifact was exported for platforms {plats} but the "
                f"current backend is '{eff}'; the call will fail unless a "
                f"matching device is selected", stacklevel=2)
    exported = jax.export.deserialize(z["exported"].tobytes())
    if "kind" in z and str(z["kind"]) == "solver":
        return SolverServer(exported, z)
    factor = (z["Rinv"], z["rho_vec"], z["rho_inv"], z["rho_bar"])
    return PreparedServer(exported, factor, z)
