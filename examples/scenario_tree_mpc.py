#!/usr/bin/env python
"""Scenario-tree MPC with warm-started consensus (round 4; no reference
analog — the reference solves one scenario on one microcontroller).

A receding-horizon loop over a fleet of scenario trees: each tree is G
perturbed copies of a nominal state ("what might the disturbance do
next?") that must agree on the *first* input (u[0] is applied before the
uncertainty resolves; later inputs may specialise per scenario). The
consensus family couples u[0] across each group with an exact prox
(Cache.Kinf0/Quu0_inv bake rho_c into the step-0 gains), and the fused
kernel runs the group mean in-kernel — no collectives.

The warm path is the round-4 addition: between MPC steps the consensus
dual rides :class:`FusedCarry` (zc0/yc0 + the u trajectory its re-seed
reads), so each solve starts from the previous step's agreement instead
of from scratch — the same persistent-workspace semantics as the
reference's tiny_solve sequence, at fused-kernel speed.

Run:  python examples/scenario_tree_mpc.py [n_trees] [G] [T]
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import tinympc_tpu as tm
from tinympc_tpu import systems
from tinympc_tpu.kernels import init_carry, solve_fused_warm


def main():
    ng = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    T = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    N = 10
    f32 = jnp.float32

    s = systems.quadrotor_20hz()
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=N, dtype=f32)
    prob = tm.with_bounds(prob, x_min=-5.0, x_max=5.0, u_min=-0.5,
                          u_max=0.5)
    prob = tm.with_settings(prob, max_iter=500, matmul_precision="high")
    prob = tm.with_consensus(prob, rho_c=100.0)

    Xref = jnp.zeros((N, 12), f32).at[:, 2].set(1.0)   # hover at z=1
    rng = np.random.default_rng(0)
    nominal = rng.uniform(-0.3, 0.3, (ng, 1, 12))
    x0 = jnp.asarray(nominal + 0.05 * rng.uniform(-1, 1, (ng, G, 12)), f32)

    A, Bm = jnp.asarray(prob.A), jnp.asarray(prob.B)
    carry = init_carry(prob, ng * G)

    @jax.jit
    def mpc_step(x0, carry, key):
        sol, _res, carry = solve_fused_warm(prob, Xref, None, x0, carry)
        # Every scenario in a tree agrees on u[0] — apply it to the
        # nominal plant, then re-branch the tree around the new state
        # (fresh disturbance hypotheses each step).
        u0 = jnp.mean(sol.u[0], axis=1, keepdims=True)       # (ng, 1, nu)
        x_nom = jnp.mean(x0, axis=1, keepdims=True)
        x_next = (jnp.einsum("ij,ngj->ngi", A, x_nom)
                  + jnp.einsum("ij,ngj->ngi", Bm, u0))
        branch = 0.05 * jax.random.uniform(key, (ng, G, 12), f32, -1, 1)
        return x_next + branch, carry, sol

    key = jax.random.PRNGKey(0)
    x, sol = x0, None
    # Warm up (compile) outside the timed loop.
    _x, _c, _s = mpc_step(x, carry, jax.random.PRNGKey(1))
    jax.block_until_ready(_x)
    t0 = time.perf_counter()
    for t in range(T):
        key, sub = jax.random.split(key)
        x, carry, sol = mpc_step(x, carry, sub)
    jax.block_until_ready(x)
    dt = time.perf_counter() - t0

    z = np.asarray(x)[:, :, 2]
    z0 = np.asarray(x0)[:, :, 2]
    it = np.asarray(sol.iter)
    spread = np.ptp(np.asarray(sol.u[0]), axis=1).max()
    print(f"{ng} scenario trees x {G} branches, {T} MPC steps: "
          f"{ng * G * T / dt:,.0f} scenario-solves/s")
    print(f"altitude toward z=1: {z0.mean():.3f} -> {z.mean():.3f} "
          f"in {T / 20:.2f} s of plant time (u bounds cap the climb "
          f"rate); worst branch {np.abs(z - 1).max():.3f} off")
    print(f"last-step iterations: mean {it.mean():.0f} "
          f"(warm consensus carry); u0 intra-tree spread "
          f"{spread:.2e} (consensus tol {prob.settings.abs_pri_tol})")

    # Trees too large for one device span the mesh (round 5): the
    # two-level scheme runs frozen-consensus fused chunks per shard and
    # ONE pmean per sync_stride for the exact global branch mean. On
    # this single chip the mesh is one device, but the code — and the
    # results, which are mesh-size-invariant — is exactly what a pod
    # slice runs with the branch axis sharded (docs/DESIGN.md).
    from tinympc_tpu import shard
    # Budget outer-equivalently: the coupling advances once per
    # sync_stride inner iterations (docs/SERVING.md step 6). Jit the
    # whole driver so repeat calls skip retracing the chunk loop.
    p_x = tm.with_settings(prob, max_iter=2500, check_termination=5)
    mesh = shard.make_mesh()
    xsolve = jax.jit(lambda x0: shard.solve_fused_consensus_sharded(
        p_x, Xref, None, x0, mesh, sync_stride=5))
    solx, resx = xsolve(x0)
    jax.block_until_ready(solx.x)
    t0 = time.perf_counter()
    solx, resx = xsolve(x0)
    jax.block_until_ready(solx.x)
    dt = time.perf_counter() - t0
    sv = np.asarray(solx.solved)
    print(f"cross-shard scheme (1-device mesh, cold, 2500 inner iters): "
          f"{ng * G / dt:,.0f} scenario-solves/s, solved {sv.mean():.2f}, "
          f"u0 spread {np.ptp(np.asarray(solx.u[0]), axis=1).max():.2e}")


if __name__ == "__main__":
    main()
