#!/usr/bin/env python
"""Fleet serving with the fused Pallas kernels — the workload the TPU
rebuild exists for (no reference analog: the reference serves one problem
on one MCU).

Three serving patterns on a quadrotor fleet:
  1. cold batch solves  (solve_fused): fleet-scale what-if / MPPI-style
     candidate evaluation;
  2. external-plant receding horizon (solve_fused_warm + FusedCarry):
     hardware-in-the-loop — apply u0 to *your* plant, feed back x0;
  3. model-in-the-loop closed loops (closed_loop_fused): entire
     receding-horizon rollouts on-chip, zero HBM traffic between steps.

For to-convergence fleets, kernels.make_compact_solver adds per-problem
early exit via lane compaction (segment= caps on-chip residency for
B=2^20-scale batches; backend="streamed" keeps it working past the VMEM
wall at long horizons) — see BENCH_TABLE.md's fleet rows.
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
from tinympc_tpu.kernels import (closed_loop_fused, init_carry, solve_fused,
                                 solve_fused_warm)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    N = 10
    s = systems.quadrotor_20hz()
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=N, dtype=jnp.float32)
    prob = tm.with_bounds(prob, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
    prob = tm.with_settings(prob, max_iter=100)
    hover = jnp.asarray([0, 0, 1.0] + [0.0] * 9, jnp.float32)
    Xref = jnp.tile(hover, (N, 1))

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(hover + rng.uniform(-0.3, 0.3, (B, 12)), jnp.float32)
    tile = min(4096, B)

    # 1. cold batch
    cold = jax.jit(lambda x0s: solve_fused(prob, Xref, None, x0s, tile=tile))
    sol, res = jax.block_until_ready(cold(x0s))
    t0 = time.perf_counter()
    sol, res = cold(x0s)
    jax.block_until_ready(sol.u)
    dt = time.perf_counter() - t0
    print(f"cold batch: {B} solves in {dt*1e3:.1f} ms "
          f"({B/dt:,.0f} solves/s), {int(jnp.sum(sol.solved))}/{B} converged, "
          f"mean iters {float(jnp.mean(sol.iter)):.1f}")

    # 2. external plant (here: the model + actuator noise, standing in for
    # real hardware)
    carry = init_carry(prob, B)
    x0 = x0s
    # tile=None: auto — the warm kernel's carry + snapshot buffers need
    # ~3.4x the cold kernel's VMEM per lane, so its widest fitting tile
    # is narrower (max_tile(prob, warm=True)).
    warm = jax.jit(lambda x0, c: solve_fused_warm(prob, Xref, None, x0, c))
    for step in range(5):
        sol, res, carry = warm(x0, carry)
        u0 = sol.u[0] + 0.01 * jnp.asarray(rng.normal(size=(B, 4)), jnp.float32)
        x0 = (jnp.einsum("ij,bj->bi", prob.A, x0)
              + jnp.einsum("ij,bj->bi", prob.B, u0) + prob.f)
        err = float(jnp.mean(jnp.linalg.norm(x0[:, :3] - hover[:3], axis=-1)))
        print(f"external-plant step {step}: mean iters "
              f"{float(jnp.mean(sol.iter)):5.1f}, mean pos err {err:.4f}")

    # 3. whole loops on-chip. Warm-started solves converge in ~10-15
    # iterations, so the closed-loop stride sweet spot is ct=5
    # (docs/SERVING.md's measured sweep).
    T = 50
    p_loop = tm.with_settings(prob, check_termination=5)
    loop = jax.jit(lambda x0s: closed_loop_fused(p_loop, Xref, x0s, T,
                                                 tile=min(2048, B)))
    xs, us, iters, solved = jax.block_until_ready(loop(x0s))
    t0 = time.perf_counter()
    xs, us, iters, solved = loop(x0s)
    jax.block_until_ready(xs)
    dt = time.perf_counter() - t0
    err = float(jnp.mean(jnp.linalg.norm(xs[-1][:, :3] - hover[:3], axis=-1)))
    print(f"fused closed loop: {B} plants x {T} steps in {dt*1e3:.1f} ms "
          f"({B*T/dt:,.0f} MPC steps/s); final mean pos err {err:.4f}")

    # 4. heterogeneous fleets (round 5): different robots = different
    # (A, B, cache) per system. The bucketed fleet solver gathers
    # problems by system and runs one fused launch per bucket inside a
    # single jitted dispatch — 3.1x the vmapped-XLA fallback at 16
    # systems (docs/DESIGN.md "Heterogeneous fleets").
    from tinympc_tpu.kernels import make_fleet_solver
    n_sys = 4
    variants = []
    for i in range(n_sys):
        scale = 1.0 + 0.004 * (i - n_sys // 2)   # mass/inertia drift
        A_i = np.asarray(s["A"]) * np.where(np.eye(12) == 1, 1.0, scale)
        p_i = tm.setup(A_i, s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                       N=N, dtype=jnp.float32)
        p_i = tm.with_bounds(p_i, x_min=-5.0, x_max=5.0, u_min=-0.5,
                             u_max=0.5)
        variants.append(tm.with_settings(p_i, max_iter=100,
                                         check_termination=25,
                                         matmul_precision="high"))
    assign = np.asarray(rng.integers(0, n_sys, B))
    fsolver = make_fleet_solver(variants, tile=min(2048, B))
    solf, _ = fsolver(assign, x0s, Xref)
    jax.block_until_ready(solf.x)
    t0 = time.perf_counter()
    solf, _ = fsolver(assign, x0s, Xref)
    jax.block_until_ready(solf.x)
    dt = time.perf_counter() - t0
    print(f"hetero fleet: {B} problems over {n_sys} systems in "
          f"{dt*1e3:.1f} ms ({B/dt:,.0f} solves/s), mean iters "
          f"{float(jnp.mean(solf.iter)):.1f}")


if __name__ == "__main__":
    main()
