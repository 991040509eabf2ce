"""Fused multi-iteration ADMM kernel for shared-structure batches.

The MPC/scenario workload (BASELINE.md: 1k-10k identical-structure QPs)
shares one P and A across the batch — only q, l, u (and warm starts) vary.
That collapses the per-problem GEMVs of ops/fused_iter.py into true GEMMs:
a group of G problems iterates together, so every MXU op has G rows instead
of 1, and A / R⁻¹ are loaded into VMEM once and reused across grid steps
(Pallas skips the DMA when consecutive grid steps fetch the same block).

Per-group VMEM at G=128, n=128, m=256 (f32): A 128 KB + R⁻¹ 64 KB +
5×(G,m) + 3×(G,n) vectors ≈ 1 MB — far under the ~16 MB budget.

rho_vec is shared across the batch (single factorization — the reason this
path exists); the driver adapts a single rho from aggregate residuals.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def split_bf16(x):
    """Split an f32 array into a (hi, lo) bf16 pair with x ≈ hi + lo.

    The two-term expansion keeps ~16 mantissa bits; a 3-pass product
    hi·sh + hi·sl + lo·sh of two such splits carries relative error ~4e-6
    (measured on-chip) — the same scheme XLA's ``Precision.HIGH``
    (tensorfloat32) uses, which Mosaic does not lower natively inside
    Pallas kernels, hence the manual form."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(x.dtype)).astype(jnp.bfloat16)
    return hi, lo


def dot3(w_pair, s_pair, pt):
    """3-pass bf16x3 product of split operands, f32 accumulation."""
    wh, wl = w_pair
    sh, sl = s_pair
    d = functools.partial(jnp.dot, preferred_element_type=pt,
                          precision=lax.Precision.DEFAULT)
    return d(wh, sh) + d(wh, sl) + d(wl, sh)


def _kernel(scalars_ref,  # SMEM prefetch: [sigma, alpha, K, live_groups]
            rinv_ref, a_ref, rat_ref, rho_ref, rho_inv_ref,
            q_ref, l_ref, u_ref, x0_ref, y0_ref, z0_ref,
            x_ref, y_ref, z_ref, xp_ref, yp_ref,
            static_k: int = 0, lowp: bool = False, tf32: bool = False):
    """``static_k > 0`` unrolls the iteration loop at trace time (better
    Mosaic scheduling/ILP); otherwise the count comes from the prefetched
    scalar and runs as a while_loop.

    ``scalars_ref[3]`` (live_groups) enables per-group early exit: the
    driver packs still-running lanes into a prefix of the batch, and grid
    steps past ``live_groups`` skip the iteration loop entirely (their
    lanes are all finished; the driver discards their outputs via masking
    anyway). This is the warm-re-solve tail-latency fix: once most lanes
    have converged, per-chunk compute shrinks to the live prefix.

    The serial chain is two matmuls per iteration: w@A feeds one rhs, and
    BOTH xt = rhs@(αR⁻¹) and zt = rhs@(αR⁻¹Aᵀ) hang off that rhs as sibling
    products (the wrapper precomputes both α-scaled operators once per
    chunk). Same FLOPs as the textbook xt-then-A·xt ordering, one less
    dependent MXU op in the loop-carried path.

    VPU economy: the relaxation weight α is folded into the matmul operands
    and the dual iterate is carried ρ-scaled (t = ρ⁻¹y), which shortens the
    per-iteration elementwise chain from 11m+6n to 8m+5n ops per lane; y is
    materialized as ρ·t only at chunk boundaries (2 ops amortized over the
    K in-kernel iterations).

    ``lowp=True`` runs the three products with bfloat16 inputs and f32
    accumulation (single-pass MXU rate, ~3× the f32 ceiling). State,
    elementwise updates, and the driver's termination checks stay f32, so
    low-precision chunks can never fake convergence — the driver decides
    per chunk when to drop back to f32 (see shared_core)."""
    sigma = scalars_ref[0]
    alpha = scalars_ref[1]
    K = scalars_ref[2].astype(jnp.int32)
    live_groups = scalars_ref[3].astype(jnp.int32)
    g = pl.program_id(0)

    @pl.when(g < live_groups)
    def _run():
        Rinv_a = rinv_ref[:]     # (n, n) shared — αR⁻¹, pre-scaled
        A = a_ref[:]             # (m, n) shared
        RAt_a = rat_ref[:]       # (n, m) shared — αR⁻¹Aᵀ, pre-scaled
        rho = rho_ref[:]         # (1, m) shared
        rho_inv = rho_inv_ref[:]
        q = q_ref[:]             # (G, n)
        lb = l_ref[:]            # (G, m)
        ub = u_ref[:]
        pt = q.dtype
        beta = 1.0 - alpha
        if lowp:
            ct = jnp.bfloat16
            A_c, Rinv_c, RAt_c = (A.astype(ct), Rinv_a.astype(ct),
                                  RAt_a.astype(ct))
            # the ambient matmul precision is pinned to f32 (linalg
            # precision scope); Mosaic rejects fp32 contract precision on
            # bf16 operands, so the low-precision dots must request DEFAULT
            # (bf16 multiply, f32 accumulate via preferred_element_type)
            prec = lax.Precision.DEFAULT
        elif tf32:
            # tensorfloat32: the loop-invariant operators split ONCE per
            # invocation; the dynamic side splits per iteration in step()
            A_s, Rinv_s, RAt_s = (split_bf16(A), split_bf16(Rinv_a),
                                  split_bf16(RAt_a))
        else:
            A_c, Rinv_c, RAt_c = A, Rinv_a, RAt_a
            prec = None

        def step(carry):
            # carry = (x, t, z) with t = rho^-1 y -- the rho-scaled dual
            x, t, z = carry
            w = rho * (z - t)
            if tf32:
                rhs = sigma * x - q + dot3(split_bf16(w), A_s, pt)
                r_s = split_bf16(rhs)
                xt_a = dot3(r_s, Rinv_s, pt)              # (G, n), alpha*xt
                zt_a = dot3(r_s, RAt_s, pt)               # (G, m), alpha*zt
            else:
                wc = w.astype(jnp.bfloat16) if lowp else w
                rhs = sigma * x - q + jnp.dot(
                    wc, A_c, preferred_element_type=pt, precision=prec)
                rc = rhs.astype(jnp.bfloat16) if lowp else rhs
                xt_a = jnp.dot(rc, Rinv_c, preferred_element_type=pt,
                               precision=prec)            # (G, n), alpha*xt
                zt_a = jnp.dot(rc, RAt_c, preferred_element_type=pt,
                               precision=prec)            # (G, m), alpha*zt
            x_new = xt_a + beta * x
            v = zt_a + beta * z + t
            z_new = jnp.clip(v, lb, ub)
            t_new = v - z_new
            return x_new, t_new, z_new

        t0 = rho_inv * y0_ref[:]
        if static_k > 0:
            xp, tp, zp = x0_ref[:], t0, z0_ref[:]
            for _ in range(static_k - 1):
                xp, tp, zp = step((xp, tp, zp))
        else:
            xp, tp, zp = lax.while_loop(
                lambda c: c[0] < K - 1,
                lambda c: (c[0] + 1,) + step(c[1:]),
                (jnp.int32(0), x0_ref[:], t0, z0_ref[:]))[1:]
        x, t, z = step((xp, tp, zp))

        xp_ref[:] = xp
        yp_ref[:] = rho * tp
        x_ref[:] = x
        y_ref[:] = rho * t
        z_ref[:] = z

    @pl.when(g >= live_groups)
    def _skip():
        xp_ref[:] = x0_ref[:]
        yp_ref[:] = y0_ref[:]
        x_ref[:] = x0_ref[:]
        y_ref[:] = y0_ref[:]
        z_ref[:] = z0_ref[:]


@functools.partial(jax.jit,
                   static_argnames=("group", "interpret", "static_k",
                                    "lowp", "tf32"))
def admm_iterate_shared(Rinv, A, rho_vec, rho_inv, q, l, u, x, y, z,
                        sigma, alpha, K, group: int = 128,
                        interpret: bool = False, static_k: int = 0,
                        live_groups=None, lowp: bool = False,
                        tf32: bool = False):
    """K ADMM iterations for a shared-structure batch.

    Shapes: Rinv (n,n), A (m,n), rho (m,), q/x (B,n), l/u/y/z (B,m);
    B must be a multiple of ``group``. Returns (x, y, z, x_prev, y_prev).

    ``live_groups`` (dynamic scalar, default all): grid steps past it skip
    the iteration loop — pair with lane compaction in the driver.

    ``lowp``: run the iteration matmuls in bfloat16 (f32 accumulate) —
    see the kernel docstring for the precision contract.
    """
    B, n = x.shape
    m = y.shape[1]
    dtype = x.dtype
    G = min(group, B)
    if B % G != 0:
        raise ValueError(f"batch {B} must be a multiple of group {G}")
    if live_groups is None:
        live_groups = B // G

    scalars = jnp.stack([jnp.asarray(sigma, dtype),
                         jnp.asarray(alpha, dtype),
                         jnp.asarray(K, dtype),
                         jnp.asarray(live_groups, dtype)])

    shared2 = lambda r, c: pl.BlockSpec((r, c), lambda g, *_: (0, 0),
                                        memory_space=pltpu.VMEM)
    batched = lambda c: pl.BlockSpec((G, c), lambda g, *_: (g, 0),
                                     memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // G,),
        in_specs=[
            shared2(n, n),                # Rinv
            shared2(m, n),                # A
            shared2(n, m),                # RAt = Rinv @ At
            shared2(1, m), shared2(1, m),  # rho, rho_inv
            batched(n),                   # q
            batched(m), batched(m),       # l, u
            batched(n), batched(m), batched(m),  # x, y, z
        ],
        out_specs=[
            batched(n), batched(m), batched(m),  # x, y, z
            batched(n), batched(m),              # x_prev, y_prev
        ],
    )

    # Precomputed once per factor-chunk: one (n,n)@(n,m) product, ~1/B·K of
    # the kernel's work. Full f32 precision regardless of lowp. The α
    # relaxation weight is folded into both operators here so the kernel's
    # per-iteration elementwise chain drops two multiplies.
    alpha_c = jnp.asarray(alpha, dtype)
    RAt = alpha_c * jnp.dot(Rinv, A.T, precision=lax.Precision.HIGHEST,
                            preferred_element_type=dtype)
    Rinv = alpha_c * Rinv

    import functools as _ft
    out = pl.pallas_call(
        _ft.partial(_kernel, static_k=static_k, lowp=lowp, tf32=tf32),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, n), dtype),
            jax.ShapeDtypeStruct((B, m), dtype),
            jax.ShapeDtypeStruct((B, m), dtype),
            jax.ShapeDtypeStruct((B, n), dtype),
            jax.ShapeDtypeStruct((B, m), dtype),
        ],
        interpret=interpret,
    )(scalars, Rinv, A, RAt, rho_vec[None, :], rho_inv[None, :],
      q, l, u, x, y, z)
    return tuple(out)
