#!/usr/bin/env python
"""Differentiable MPC demo: tune the reference trajectory by gradient
descent *through the solver* (no reference analog — tinympc_tpu/diff.py).

The cart starts at x=0.5 with limited input authority; we optimise the
N-step reference so the solver's closed QP lands the terminal state on a
goal. jax.grad flows through the converged ADMM solve via implicit
differentiation of the KKT system.
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import tinympc_tpu as tm
from tinympc_tpu import systems


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    s = systems.cartpole()
    N = 10
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=N, dtype=jnp.float32)
    prob = tm.with_bounds(prob, x_min=-1e9, x_max=1e9, u_min=-2.0, u_max=2.0)
    # gradient accuracy is bounded by solve accuracy: tighten tolerances
    prob = tm.with_settings(prob, max_iter=2000, abs_pri_tol=1e-6,
                            abs_dua_tol=1e-6)
    f = tm.make_differentiable(prob)

    x0 = jnp.asarray([0.5, 0.0, 0.1, 0.0], jnp.float32)
    goal = jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32)
    Uref = jnp.zeros((N - 1, 1), jnp.float32)

    def loss(Xref):
        sol = f(x0, Xref, Uref)
        return jnp.sum((sol.x[-1] - goal) ** 2)

    step = jax.jit(jax.value_and_grad(loss))
    Xref = jnp.zeros((N, 4), jnp.float32)
    for k in range(steps):
        L, g = step(Xref)
        Xref = Xref - 0.005 * g
        if k % max(1, steps // 10) == 0 or k == steps - 1:
            print(f"iter {k:3d}: terminal loss {float(L):.6f} "
                  f"(grad norm {float(jnp.linalg.norm(g)):.4f})")

    sol = f(x0, Xref, Uref)
    print("\nfinal terminal state:", np.asarray(sol.x[-1]).round(4))
    print("goal:                ", np.asarray(goal))


if __name__ == "__main__":
    main()
