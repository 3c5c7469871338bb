#!/usr/bin/env python
"""Adaptive-rho guard sweep: measures what the OSQP adaptation guard
(`Settings.adaptive_rho_tolerance`) buys on the to-convergence workload.

Reproduces docs/PARITY.md "Adaptive rho: what it buys" (the bench_all.py
to-convergence hard batch: quadrotor N=20, B=32768, x0 ~ U[-0.5,0.5]^12,
Xref = hover at z=1, tol 1e-3, max_iter=500, fused kernel, precision
"high") and extends it across guard tolerances at a tuned (rho0=5) and a
mis-tuned (rho0=85) starting rho. The reference adapts unconditionally
every 5 iterations (rho_benchmark.cpp:175-197); OSQP itself only commits
when the step factor crosses ~5x. The question this script answers: does
a guard keep the rho0=85 rescue while undoing the rho0=5 harm?

Prints a markdown table; paste into docs/PARITY.md.
"""
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MAX_ITER = 500
B = 32768
TILE = 4096


def main():
    import jax
    import jax.numpy as jnp
    import tinympc_tpu as tm
    from tinympc_tpu import systems
    from tinympc_tpu.kernels import solve_fused
    from tinympc_tpu.profiling import enable_compilation_cache

    enable_compilation_cache()
    f32 = jnp.float32
    s = systems.quadrotor_20hz()
    prec = os.environ.get("BENCH_PRECISION", "high")
    Xref = jnp.zeros((20, 12), f32).at[:, 2].set(1.0)
    rng = np.random.default_rng(0)
    x0h = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 12)), f32)

    def mk(rho0, adaptive, tol):
        p = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=rho0,
                     N=20, dtype=f32)
        p = tm.with_bounds(p, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
        return tm.with_settings(p, max_iter=MAX_ITER, adaptive_rho=adaptive,
                                adaptive_rho_tolerance=tol,
                                matmul_precision=prec)

    def bench(step, reps=5, min_rep_s=1.0):
        out = jax.block_until_ready(step(x0h))
        t0 = time.perf_counter()
        jax.block_until_ready(step(x0h))
        t1 = max(time.perf_counter() - t0, 1e-6)
        k = max(1, int(np.ceil(min_rep_s / t1)))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(k):
                out = step(x0h)
            jax.block_until_ready(out)
            ts.append((time.perf_counter() - t0) / k)
        return out, float(np.median(ts))

    def iters_to_solved(sol):
        it = np.asarray(sol.iter)
        sv = np.asarray(sol.solved)
        return float(np.mean(it[sv])) if sv.any() else float("nan")

    rho0s = [float(v) for v in
             os.environ.get("SWEEP_RHO0S", "5,85").split(",")]
    tols = [float(v) for v in
            os.environ.get("SWEEP_TOLS", "1,1.5,2,3,5,10").split(",")]
    rows = []
    configs = []
    for rho0 in rho0s:
        configs.append((rho0, False, 1.0))
        for tol in tols:
            configs.append((rho0, True, tol))

    for rho0, adaptive, tol in configs:
        prob = mk(rho0, adaptive, tol)
        step = jax.jit(lambda x, p=prob: solve_fused(p, Xref, None, x,
                                                     tile=TILE)[0])
        sol, dt = bench(step)
        frac = float(np.mean(np.asarray(sol.solved)))
        label = ("fixed" if not adaptive
                 else f"adaptive tol={tol:g}")
        rows.append((rho0, label, frac, iters_to_solved(sol), B / dt))
        print(f"rho0={rho0:g} {label:20s} solved_frac={frac:.3f} "
              f"iters_to_solved={rows[-1][3]:.0f} solves/s={B/dt:,.0f}",
              flush=True)

    print("\n| rho0 | policy | solved frac | iters-to-solved | solves/s |")
    print("|---|---|---|---|---|")
    for rho0, label, frac, its, sps in rows:
        print(f"| {rho0:g} | {label} | {frac:.3f} | {its:.0f} | {sps:,.0f} |")


if __name__ == "__main__":
    main()
