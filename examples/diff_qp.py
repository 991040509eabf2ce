#!/usr/bin/env python
"""Differentiable QP layer demo: learn an MPC cost so the closed-loop
trajectory tracks a reference.

``osqp_tpu.make_qp_layer`` makes the solution map (P, q, A, l, u) -> (x, y)
differentiable via implicit differentiation of the active-set KKT system, so
a QP solve can sit inside a jitted/grad-ed training loop. Here we tune the
linear cost of a small box-constrained QP by gradient descent until its
minimizer matches a target point — the building block of learned-MPC /
OptNet-style pipelines (a capability the reference stack does not expose).

Run: python examples/diff_qp.py  (CPU or TPU)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from osqp_tpu import Settings, make_qp_layer

jax.config.update("jax_enable_x64", True)


def main():
    rng = np.random.RandomState(0)
    n, m = 8, 12
    M = rng.randn(n, n)
    P = M @ M.T + np.eye(n)
    A = rng.randn(m, n)
    l = -2.0 * np.ones(m)
    u = 2.0 * np.ones(m)
    target = 0.1 * rng.randn(n)

    layer = make_qp_layer(Settings(eps_abs=1e-9, eps_rel=1e-9,
                                   max_iter=20000, verbose=False,
                                   dtype=np.float64))

    # parametrize q = -P @ theta (well-conditioned: x*(q) = theta in the
    # feasible interior)
    def loss(theta):
        x, _ = layer(P, -jnp.asarray(P) @ theta, A, l, u)
        return jnp.sum((x - jnp.asarray(target)) ** 2)

    value_and_grad = jax.jit(jax.value_and_grad(loss))
    # start near the feasible interior: at an active constraint face the
    # implicit gradient only sees the tangential component, and plain
    # gradient descent can stall on a face it should slide around
    theta = jnp.asarray(0.3 * rng.randn(n))
    for k in range(40):
        val, g = value_and_grad(theta)
        theta = theta - 0.4 * g
        if k % 10 == 0:
            print(f"step {k:3d}  loss {float(val):.3e}")
    print(f"final loss {float(value_and_grad(theta)[0]):.3e}")

    # gradients flow to every data argument, not just q:
    gP, gl, gu = jax.grad(
        lambda Pv, lv, uv: jnp.sum(layer(Pv, -jnp.asarray(P) @ theta,
                                         A, lv, uv)[0] ** 2),
        argnums=(0, 1, 2))(jnp.asarray(P), jnp.asarray(l), jnp.asarray(u))
    print(f"|dL/dP|_F {float(jnp.linalg.norm(gP)):.3e}  "
          f"|dL/dl| {float(jnp.linalg.norm(gl)):.3e}  "
          f"|dL/du| {float(jnp.linalg.norm(gu)):.3e}")


if __name__ == "__main__":
    main()
