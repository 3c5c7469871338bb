#!/usr/bin/env python
"""Speed-of-light accounting for the fused solve kernel (BASELINE.json's
"Riccati-sweep kernel at speed-of-light per chip" north star).

Decomposes one ADMM iteration into its cost classes and measures each
with purpose-built Pallas microkernels on the same shapes:

  1. MXU dots. The Riccati sweeps issue 5 dots per horizon step (3
     backward: Mback@p, Quu@(..), KinfT@r; 2 forward: Mfwd@x, B@u),
     mostly *dependent* — each step's dots wait on the previous step's
     result. Microkernels measure an L-deep chain of
     (3nx, 3nx)@(3nx, tile) bf16 dots with a per-dot f32->bf16 operand
     cast (what the real chain pays for its hi/lo splits), and the same
     count issued with no dependencies (pipelined).
  2. VPU elementwise passes (the slack/dual/linear-cost phases) and the
     max-abs residual reductions — which since round 4 run only every
     check_termination iterations (the model divides their cost by the
     stride).

Configs measured: the quadrotor headline (nx=12, N=20) at the
reference-default stride (ct=1) and the OSQP stride (ct=25, the bench.py
headline), plus a synthetic nx=32 system — the second roofline point
that tests how the chain-latency vs VPU-stream balance shifts with state
dimension (VERDICT r3 #9). Prints one JSON line per config; feeds
docs/DESIGN.md's "Speed of light" section — rerun after kernel changes.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _timeit(fn, *args, reps=5, min_rep_s=0.5):
    """Pipelined timing (see bench_all.bench for why sync-per-call is
    wrong on this tunnel)."""
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    t1 = max(time.perf_counter() - t0, 1e-6)
    k = max(1, int(np.ceil(min_rep_s / t1)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / k)
    return float(np.median(ts))


def dot_kernel(L, depth, tile, chained, reps):
    """L dots of (depth, depth) @ (depth, tile). ``chained``: each dot
    consumes the previous result (with the f32->bf16 operand cast the
    real sweep chain also pays); otherwise the L dots read L *distinct*
    matrices against one pre-cast operand and pipeline freely (distinct
    operands defeat CSE — with one shared matrix the compiler collapses
    the L identical dots into one and the measurement is fiction)."""
    bf16, f32 = jnp.bfloat16, jnp.float32

    def kernel(M_ref, Ms_ref, v_ref, o_ref):
        M = M_ref[:]
        acc = jnp.zeros((depth, tile), f32)
        for r in range(reps):
            x = v_ref[:]
            if chained:
                for _ in range(L):
                    x = jnp.dot(M, x.astype(bf16),
                                preferred_element_type=f32)
                acc = acc + x
            else:
                y = (v_ref[:] + r).astype(bf16)
                for k in range(L):
                    acc = acc + jnp.dot(Ms_ref[k], y,
                                        preferred_element_type=f32)
        o_ref[:] = acc

    M = jnp.full((depth, depth), 0.01, bf16)
    Ms = (0.01 + jnp.arange(L * depth * depth, dtype=jnp.float32)
          .reshape(L, depth, depth) * 1e-6).astype(bf16)
    v = jnp.ones((depth, tile), jnp.float32)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((depth, tile), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return jax.jit(lambda: call(M, Ms, v))


def elementwise_kernel(N, F, tile, passes, reductions, reps):
    """`passes` add+clip passes over a (N, F, tile) array plus
    `reductions` max-abs lane reductions."""
    f32 = jnp.float32

    def kernel(a_ref, b_ref, o_ref):
        acc = jnp.zeros((1, tile), f32)
        for _ in range(reps):
            x = a_ref[:]
            for _ in range(passes):
                x = jnp.minimum(5.0, jnp.maximum(-5.0, x + b_ref[:]))
            for _ in range(reductions):
                acc = jnp.maximum(acc,
                                  jnp.max(jnp.abs(x), axis=(0, 1))[None])
            acc = acc + x[0, :1]
        o_ref[:] = acc

    a = jnp.ones((N, F, tile), f32)
    b = jnp.full((N, F, tile), 0.1, f32)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, tile), f32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return jax.jit(lambda: call(a, b))


def run_config(label, sysd, nx, nu, N, tile, B, ct):
    import tinympc_tpu as tm
    from tinympc_tpu.kernels import solve_fused

    f32 = jnp.float32
    REPS = 20        # in-kernel repetitions to swamp launch overhead

    prob = tm.setup(sysd["A"], sysd["B"], sysd["Qdiag"], sysd["Rdiag"],
                    rho=sysd["rho"], N=N, dtype=f32)
    prob = tm.with_bounds(prob, x_min=-50.0, x_max=50.0, u_min=-5.0,
                          u_max=5.0)
    prob = tm.with_settings(prob, max_iter=100, matmul_precision="high",
                            check_termination=ct, abs_pri_tol=0.0,
                            abs_dua_tol=0.0)   # fixed work: never converges
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.5, 0.5, (B, nx)), f32)
    fn = jax.jit(lambda x0s: solve_fused(prob, None, None, x0s,
                                         tile=tile)[0])
    sol = jax.block_until_ready(fn(x0s))
    dt = _timeit(fn, x0s)
    iters = float(np.mean(np.asarray(sol.iter)))
    n_tiles = B // tile
    t_iter_tile = dt / (iters * n_tiles)          # seconds per tile-iter

    # --- microbenchmarks on the same shapes ---
    depth = 3 * nx                # bf16x3 stacks passes on the contraction
    L = 5 * (N - 1)
    t_chain = _timeit(dot_kernel(L, depth, tile, True, REPS)) / REPS
    t_indep = _timeit(dot_kernel(L, depth, tile, False, REPS)) / REPS
    P = 8
    t_pass = _timeit(elementwise_kernel(N, nx + nu, tile, P, 0, REPS)) / REPS
    t_red4 = _timeit(elementwise_kernel(N, nx + nu, tile, 0, 4, REPS)) / REPS

    # Standalone parts overlap and fuse inside the real kernel (the
    # round-4 finding: the iteration is one interleaved VPU stream with
    # the MXU chain largely hidden under it), so their sum is an upper
    # bound, not a reconstruction.
    parts_sum = t_chain + t_pass + t_red4 / ct
    back = (N - 1) * (2 * (nx + nu) * nx + 2 * nu * nu + 2 * nx * nu)
    fwd = (N - 1) * (2 * (nx + nu) * nx + 2 * nx * nu)
    flops_lane = back + fwd + 15 * N * (nx + nu)
    achieved_tflops = flops_lane * tile / t_iter_tile / 1e12

    print(json.dumps({
        "config": label,
        "check_termination": ct,
        "measured_iter_us_per_tile": round(t_iter_tile * 1e6, 2),
        "standalone_parts_sum_us": round(parts_sum * 1e6, 2),
        "chained_dots_us": round(t_chain * 1e6, 2),
        "independent_dots_us": round(t_indep * 1e6, 2),
        "chain_vs_pipeline": round(t_chain / t_indep, 2),
        "elementwise_pass_us": round(t_pass * 1e6, 2),
        "residual_reduction4_us": round(t_red4 * 1e6, 2),
        "dots_per_iter": L,
        "ns_per_chained_dot": round(t_chain / L * 1e9, 1),
        "ns_per_pipelined_dot": round(t_indep / L * 1e9, 1),
        "flops_per_lane_iter": flops_lane,
        "achieved_tflops": round(achieved_tflops, 2),
        "solves_per_s_equiv": round(B / dt / 1.0, 0),
        "device": str(jax.devices()[0]),
    }), flush=True)


def main():
    from tinympc_tpu.profiling import enable_compilation_cache
    enable_compilation_cache()
    from tinympc_tpu import systems

    quad = systems.quadrotor_20hz()
    run_config("quadrotor nx=12 nu=4 N=20 tile=4096 bf16x3 ct=1",
               quad, 12, 4, 20, 4096, 32768, 1)
    run_config("quadrotor nx=12 nu=4 N=20 tile=4096 bf16x3 ct=25",
               quad, 12, 4, 20, 4096, 32768, 25)
    syn = systems.synthetic(32, 8)
    run_config("synthetic nx=32 nu=8 N=20 tile=2048 bf16x3 ct=25",
               syn, 32, 8, 20, 2048, 16384, 25)


if __name__ == "__main__":
    main()
