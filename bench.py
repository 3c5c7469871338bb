#!/usr/bin/env python
"""Headline benchmark: batched quadrotor MPC solves/s on one TPU chip.

Workload (mirrors tools/oracle/oracle_bench.cpp, which measures the
reference C++ solver on one CPU core): quadrotor 20 Hz model, N=20 horizon,
box constraints +-5 / +-0.5, Xref = hover at z=1, cold-start solves with
x0 ~ U[-0.5, 0.5]^12, tol 1e-3.

Regimes, one JSON line:
  * fixed-work (max_iter 100, check_termination 25 — OSQP's default
    termination stride): the headline `value`, measured against the
    oracle at the *same* stride (oracle_bench 2000 100 0 25). Residual
    checks are real work on both sides; striding them 25x is the
    standard trade (the reference's default stride of 1 is a
    microcontroller choice, tiny_api_constants.hpp:8). The headline runs
    the round-5 mixed-precision schedule (coarse_iters=50: first 50
    iterations single-pass bf16, then 3-pass to termination —
    Settings.coarse_iters); measured convergence-stat parity vs
    coarse=0 on this exact workload: solved_frac -0.47pp, 98.4%
    identical per-lane iteration counts (tools/coarse_sweep.py,
    docs/DESIGN.md "Mixed-precision schedule"). BENCH_COARSE=0
    disables.
  * fixed-work at the reference's default stride (check_termination 1):
    `ct1_solves_per_s`, against the oracle at its defaults — the
    strictest apples-to-apples row.
  * to-convergence (max_iter 500, stride 25): `to_convergence_*` fields —
    per-tile early exit plus the solved fraction vs the oracle's at the
    same cap. The gap is fully decomposed (round 5,
    tools/solved_frac_decompose.py, docs/PARITY.md "The oracle
    solved-fraction gap, decomposed"): on the chip's exact x0 batch the
    oracle solves 0.2057, the chip at "highest" 0.2066 (no f64 deficit),
    and the bench's "high" bf16x3 scheme 0.1962 — the entire ~1pp gap is
    the documented 16-bit-mantissa trade, recoverable by
    BENCH_PRECISION=highest at ~3x cost.

vs_baseline is against the reference C++ solver measured on this machine
(tools/oracle/oracle_bench.cpp rebuilt 2026-08-21):
  1826.3 solves/s at max_iter=100 ct=1; 1968.3 at ct=25;
  400.1 solves/s / solved_frac 0.208 at max_iter=500 ct=1;
  431.4 / 0.208 at ct=25.
"""
import json
import os
import sys
import time

import numpy as np

# Reference-oracle baselines measured on THIS machine 2026-08-21.
# Regenerate with:
#   cmake -S tools/oracle -B /tmp/oracle -DCMAKE_BUILD_TYPE=Release
#   cmake --build /tmp/oracle -j && /tmp/oracle/oracle_bench <n> <mi> 0 <ct>
CPP_BASELINE = {  # (max_iter, check_termination) -> solves/s
    (100, 1): 1826.3,
    (100, 25): 1968.3,
    (500, 1): 400.1,
    (500, 25): 431.4,
}
CPP_BASELINE_500_SOLVED_FRAC = 0.208   # own-RNG draw; on the chip's exact
#                                        x0 batch the oracle solves 0.2057
#                                        (tools/solved_frac_decompose.py)

N_HORIZON = 20
MAX_ITER = 100
HEADLINE_CT = int(os.environ.get("BENCH_CT", 25))


def build(B, dtype, max_iter=MAX_ITER, check_termination=HEADLINE_CT,
          coarse_iters=0):
    """The headline workload step. bench_all.py imports and times this
    same function for its headline row — one measurement, one number."""
    import jax.numpy as jnp
    import tinympc_tpu as tm
    from tinympc_tpu import systems
    import jax

    s = systems.quadrotor_20hz()
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=N_HORIZON, dtype=dtype)
    prob = tm.with_bounds(prob, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
    # "high" = 3-pass bf16 matmuls (~16 mantissa bits): same termination
    # criteria enforced, solutions within ~2e-3 of the f32-accurate path,
    # ~1.3x the throughput of "highest" (see Settings.matmul_precision).
    prec = os.environ.get("BENCH_PRECISION", "high")
    prob = tm.with_settings(prob, max_iter=max_iter, matmul_precision=prec,
                            check_termination=check_termination,
                            coarse_iters=coarse_iters)
    Xref = jnp.tile(jnp.asarray([0, 0, 1.0, 0, 0, 0, 0, 0, 0, 0, 0, 0], dtype),
                    (N_HORIZON, 1))

    kernel = os.environ.get("BENCH_KERNEL", "pallas")
    if kernel == "pallas":
        from tinympc_tpu.kernels import solve_fused
        # 4096 lanes/tile fits VMEM for this config and is ~1.5x faster
        # than 1024 (wider tiles chain more lane-passes per small matmul).
        tile = int(os.environ.get("BENCH_TILE", 4096))
        def step(x0s):
            sol, _res = solve_fused(prob, Xref, None, x0s, tile=tile)
            return sol.u[0], sol.iter, sol.solved
    else:
        def step(x0s):
            state = tm.init_state(prob, (B,))
            sol, _, _ = tm.solve_(prob, state, Xref, None, x0s)
            return sol.u[0], sol.iter, sol.solved

    return jax.jit(step)


def _bench(step, x0s, reps, min_rep_s=1.0):
    """Median seconds-per-call over ``reps`` pipelined reps (each rep
    enqueues k calibrated calls and blocks once — on this tunneled chip a
    synchronous round-trip can cost ~26 ms after large programs have run,
    which sync-per-call timing would fold into every sample; see
    bench_all.bench) plus the min-max spread as a fraction of the median."""
    import jax
    out = jax.block_until_ready(step(x0s))
    t0 = time.perf_counter()
    jax.block_until_ready(step(x0s))
    t1 = max(time.perf_counter() - t0, 1e-6)
    k = max(1, int(np.ceil(min_rep_s / t1)))

    def measure():
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            o = out
            for _ in range(k):
                o = step(x0s)
            jax.block_until_ready(o)
            ts.append((time.perf_counter() - t0) / k)
        med = float(np.median(ts))
        return med, (max(ts) - min(ts)) / med

    med, spread = measure()
    if spread > 0.5:
        # The tunnel occasionally stalls (or spuriously fast-returns) a
        # rep for tens of ms-to-seconds; one remeasure filters those
        # transients out of the recorded medians (same rule as
        # bench_all.bench — the round-4 driver capture recorded a 74.7%
        # ct=1 spread from exactly one such transient).
        med2, spread2 = measure()
        if spread2 < spread:
            med, spread = med2, spread2
    return out, med, spread


def main():
    import jax
    import jax.numpy as jnp
    from tinympc_tpu.profiling import enable_compilation_cache

    enable_compilation_cache()
    dtype = jnp.float32
    B = int(os.environ.get("BENCH_B", 32768))
    reps = int(os.environ.get("BENCH_REPS", 5))

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 12)), dtype)

    # Headline: fixed-work at the OSQP termination stride, with the
    # mixed-precision schedule (module docstring; BENCH_COARSE=0 turns
    # it off — the ct=1 and to-convergence rows below always run
    # schedule-free: ct=1 is the strict reference-parity row, and the
    # to-convergence row feeds the oracle solved-fraction comparison).
    coarse = int(os.environ.get("BENCH_COARSE", 50))
    step = build(B, dtype, coarse_iters=coarse)
    (u0, iters, solved), dt, spread = _bench(step, x0s, reps)
    solves_per_s = B / dt
    total_iters = int(np.sum(np.asarray(iters)))
    iters_per_s = total_iters / dt

    # Reference-default stride (check_termination=1): strict parity row.
    step1 = build(B, dtype, check_termination=1)
    (_, iters1, _), dt1, spread1 = _bench(step1, x0s, reps)
    ct1_solves_per_s = B / dt1

    # To-convergence regime (max_iter 500): per-tile early exit stops a
    # tile once all its lanes converge; solved fraction must track the
    # oracle's at the same cap.
    step500 = build(B, dtype, max_iter=500)
    (u0c, iters_c, solved_c), dt_c, spread_c = _bench(step500, x0s, reps)
    conv_solves_per_s = B / dt_c
    solved_frac = float(np.mean(np.asarray(solved_c)))

    print(json.dumps({
        "metric": "batched_quadrotor_mpc_solves_per_s",
        "value": round(solves_per_s, 1),
        "unit": "solves/s/chip",
        "vs_baseline": round(solves_per_s / CPP_BASELINE[(100, HEADLINE_CT)], 2),
        "batch": B,
        "check_termination": HEADLINE_CT,
        "spread_pct": round(100 * spread, 1),
        "admm_iters_per_s": round(iters_per_s, 1),
        "avg_iters": round(float(np.mean(np.asarray(iters))), 2),
        "ct1_solves_per_s": round(ct1_solves_per_s, 1),
        "ct1_vs_baseline": round(ct1_solves_per_s / CPP_BASELINE[(100, 1)], 2),
        "ct1_spread_pct": round(100 * spread1, 1),
        "to_convergence_solves_per_s": round(conv_solves_per_s, 1),
        "to_convergence_vs_baseline": round(
            conv_solves_per_s / CPP_BASELINE[(500, HEADLINE_CT)], 2),
        "to_convergence_solved_frac": round(solved_frac, 4),
        "to_convergence_oracle_solved_frac": CPP_BASELINE_500_SOLVED_FRAC,
        "to_convergence_avg_iters": round(
            float(np.mean(np.asarray(iters_c))), 2),
        "to_convergence_max_iter": 500,
        "to_convergence_spread_pct": round(100 * spread_c, 1),
        "matmul_precision": os.environ.get("BENCH_PRECISION", "high"),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
