#!/usr/bin/env python
"""Long-horizon trajectory optimization: the three solver paths for
N >> the reference's 10-step horizons (no reference analog — its
recursions are strictly sequential and its examples never scale N,
admm.cpp:15,27).

For a batch of quadrotor problems at N=512:
  1. XLA sequential scans        — the faithful baseline;
  2. horizon_parallel            — blocked two-level scans, depth ~2*sqrt(N);
  3. solve_fused_streamed        — HBM-resident trajectories, each ADMM
     iteration streams the horizon through VMEM in pipelined chunks
     (measured ~4x path 1 end-to-end on a v5e chip; BENCH_TABLE.md).

Run:  python examples/long_horizon.py [N] [B]
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
from tinympc_tpu.kernels import solve_fused_streamed


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    iters = 20
    f32 = jnp.float32

    s = systems.quadrotor_20hz()
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=N, dtype=f32)
    prob = tm.with_bounds(prob, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
    prob = tm.with_settings(prob, max_iter=iters, matmul_precision="high")

    # A figure-eight reference over the long horizon — the workload shape
    # where one solve plans an entire maneuver instead of a receding
    # window.
    t = np.linspace(0, 4 * np.pi, N)
    Xref = np.zeros((N, 12), np.float32)
    Xref[:, 0] = np.sin(t)
    Xref[:, 1] = np.sin(2 * t) / 2
    Xref[:, 2] = 1.0
    Xref = jnp.asarray(Xref)

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 12)), f32)

    def timed(tag, fn):
        fn_j = jax.jit(fn)
        out = jax.block_until_ready(fn_j(x0s))     # compile
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = fn_j(x0s)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"{tag:34s} {B * iters / dt:>12,.0f} iters*B/s")
        return out

    timed("XLA sequential scans", lambda x: tm.solve_(
        prob, tm.init_state(prob, (B,)), Xref, None, x)[0].iter)
    hp = tm.with_settings(prob, horizon_parallel=True)
    timed("XLA blocked two-level scans", lambda x: tm.solve_(
        hp, tm.init_state(hp, (B,)), Xref, None, x)[0].iter)
    sol = timed("fused streamed (HBM trajectories)", lambda x:
                solve_fused_streamed(prob, Xref, None, x)[0].iter)
    print(f"iterations used: {int(np.asarray(sol).max())}/{iters}")

    # Receding horizon over the long preview: the warm streamed path.
    # The FusedCarry persists the workspace between solves exactly like
    # the reference's tiny_solve sequence (SURVEY.md §3.3) — warm solves
    # converge in a fraction of the cold iterations.
    from tinympc_tpu.kernels import init_carry, solve_fused_streamed_warm
    A, Bm = jnp.asarray(prob.A), jnp.asarray(prob.B)
    warm_prob = tm.with_settings(prob, max_iter=100)
    carry = init_carry(warm_prob, B)
    xk = x0s
    step_fn = jax.jit(lambda x, c: solve_fused_streamed_warm(
        warm_prob, Xref, None, x, c))
    t0, total_iters = time.perf_counter(), 0
    T = 5
    for k in range(T):
        sol, _res, carry = step_fn(xk, carry)
        xk = xk @ A.T + sol.u[0] @ Bm.T
        total_iters += int(np.asarray(sol.iter).mean())
    jax.block_until_ready(xk)
    dt = time.perf_counter() - t0
    print(f"{'receding horizon (warm streamed)':34s} {B * T / dt:>12,.0f} "
          f"MPC steps/s  (avg {total_iters / T:.0f} iters/step)")


if __name__ == "__main__":
    main()
