#!/usr/bin/env python
"""Speed-of-light accounting for the fused solve kernel (BASELINE.json's
"Riccati-sweep kernel at speed-of-light per chip" north star).

Decomposes one ADMM iteration of the headline config (quadrotor nx=12,
nu=4, N=20, tile=4096 lanes, bf16x3 matmuls) into its two cost classes
and measures each with purpose-built Pallas microkernels on the same
shapes:

  1. MXU dots. The Riccati sweeps issue 5 dots per horizon step (3
     backward: Mback@p, Quu@(..), KinfT@r; 2 forward: Mfwd@x, B@u), 95
     per iteration at N=20, mostly *dependent* — each step's dots wait on
     the previous step's result. Microkernels measure an L-deep chain of
     (36, 36)@(36, tile) bf16 dots with a per-dot f32->bf16 operand cast
     (what the real chain pays for its hi/lo splits), and the same count
     issued with no dependencies (pipelined — the MXU throughput
     alternative).
  2. VPU elementwise + reductions: the slack/dual phases (~8 full-array
     passes of add/clip over the (N, nx+nu, tile) state) and the 4
     max-abs residual reductions per iteration.

Prints one JSON line: per-unit costs, the model's reconstruction of the
fused iteration time, the measured iteration time (pipelined timing — a
sync round-trip on this tunnel can cost ~26 ms, see bench_all.bench),
and the chain-vs-pipeline ratio that says whether the sweeps sit at MXU
issue latency or MXU throughput. Feeds docs/DESIGN.md's "Speed of
light" section — rerun after kernel changes.
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
    real sweep chain also pays); otherwise all dots read one pre-cast
    operand and pipeline freely (the accumulate is a VPU add chain whose
    few-cycle latency hides under the MXU)."""
    bf16, f32 = jnp.bfloat16, jnp.float32

    def kernel(M_ref, v_ref, o_ref):
        M = M_ref[:]
        acc = jnp.zeros((depth, tile), f32)
        for _ in range(reps):
            x = v_ref[:]
            if chained:
                for _ in range(L):
                    x = jnp.dot(M, x.astype(bf16),
                                preferred_element_type=f32)
                acc = acc + x
            else:
                y = v_ref[:].astype(bf16)
                for _ in range(L):
                    acc = acc + jnp.dot(M, y, preferred_element_type=f32)
        o_ref[:] = acc

    M = jnp.full((depth, depth), 0.01, bf16)
    v = jnp.ones((depth, tile), jnp.float32)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((depth, tile), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return jax.jit(lambda: call(M, v))


def elementwise_kernel(N, F, tile, passes, reductions, reps):
    """`passes` add+clip passes over a (N, F, tile) array plus
    `reductions` max-abs lane reductions — the slack/dual/residual phase
    shape of one iteration."""
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


def main():
    from tinympc_tpu.profiling import enable_compilation_cache
    enable_compilation_cache()
    import tinympc_tpu as tm
    from tinympc_tpu import systems
    from tinympc_tpu.kernels import solve_fused

    nx, nu, N, tile = 12, 4, 20, 4096
    B = 32768
    f32 = jnp.float32
    REPS = 20        # in-kernel repetitions to swamp launch overhead

    # --- measured fused iteration time (fixed-work headline config) ---
    s = systems.quadrotor_20hz()
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=N, dtype=f32)
    prob = tm.with_bounds(prob, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
    prob = tm.with_settings(prob, max_iter=100, matmul_precision="high")
    Xref = jnp.zeros((N, 12), f32).at[:, 2].set(1.0)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 12)), f32)
    fn = jax.jit(lambda x0s: solve_fused(prob, Xref, None, x0s,
                                         tile=tile)[0])
    sol = jax.block_until_ready(fn(x0s))
    dt = _timeit(fn, x0s)
    iters = float(np.mean(np.asarray(sol.iter)))
    n_tiles = B // tile
    t_iter_tile = dt / (iters * n_tiles)          # seconds per tile-iteration

    # --- microbenchmarks on the same shapes ---
    # Sweep dots: bf16x3 stacks the 3 passes along the contraction axis ->
    # depth 3*nx = 36. 5 dots per step x (N-1) steps per iteration.
    L = 5 * (N - 1)
    t_chain = _timeit(dot_kernel(L, 36, tile, True, REPS)) / REPS
    t_indep = _timeit(dot_kernel(L, 36, tile, False, REPS)) / REPS
    # Elementwise: ~8 add/clip passes over the (N, nx+nu, tile) state and
    # 4 residual max-abs reductions per iteration.
    P, R = 8, 4
    t_elem = _timeit(elementwise_kernel(N, nx + nu, tile, P, R, REPS)) / REPS

    model = t_chain + t_elem
    # FLOPs per lane-iteration (logical f32 matmuls; the 3 bf16 passes
    # count once): backward 19*(2*16*12 + 2*4*4 + 2*12*4) + forward
    # 19*(2*16*12 + 2*12*4) + ~15*N*(nx+nu) elementwise.
    flops_lane = (N - 1) * (2 * 16 * 12 + 2 * 4 * 4 + 2 * 12 * 4) \
        + (N - 1) * (2 * 16 * 12 + 2 * 12 * 4) + 15 * N * (nx + nu)
    achieved_tflops = flops_lane * tile / t_iter_tile / 1e12

    print(json.dumps({
        "config": f"quadrotor nx={nx} nu={nu} N={N} tile={tile} bf16x3",
        "measured_iter_us_per_tile": round(t_iter_tile * 1e6, 2),
        "model_iter_us_per_tile": round(model * 1e6, 2),
        "chained_dots_us": round(t_chain * 1e6, 2),
        "independent_dots_us": round(t_indep * 1e6, 2),
        "chain_vs_pipeline": round(t_chain / t_indep, 2),
        "elementwise_us": round(t_elem * 1e6, 2),
        "dots_per_iter": L,
        "ns_per_chained_dot": round(t_chain / L * 1e9, 1),
        "ns_per_pipelined_dot": round(t_indep / L * 1e9, 1),
        "elementwise_passes": P,
        "residual_reductions": R,
        "flops_per_lane_iter": flops_lane,
        "achieved_tflops": round(achieved_tflops, 2),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
