#!/usr/bin/env python
"""Speed-of-light accounting for the fused solve kernel (BASELINE.json's
"Riccati-sweep kernel at speed-of-light per chip" north star).

Decomposes one ADMM iteration of the headline config (quadrotor nx=12,
nu=4, N=20, tile=4096 lanes, bf16x3 matmuls) into its three cost classes
and measures each in isolation with purpose-built Pallas microkernels on
the same shapes:

  1. *Chained* MXU dots — the Riccati sweeps are sequential: each of the
     5 dots per horizon step (3 backward: Mback@p, Quu@(..), KinfT@r;
     2 forward: Mfwd@x, B@u) waits on the previous step's result, so the
     MXU runs at issue latency, not throughput. Microkernel: an
     L-deep dependent chain of (16, 36)@(36, tile) bf16 dots.
  2. *Independent* MXU dots — same shapes without the dependency, so the
     MXU pipelines them (measures the throughput alternative).
  3. VPU elementwise — the slack/dual/residual phases: P passes of
     clip/add/max over (N, F, tile) VMEM arrays.

Prints one JSON line with the measured per-unit costs, the model's
reconstruction of the fused iteration time, the measured iteration time,
and the distance to each candidate ceiling. Feeds docs/DESIGN.md's
"Speed of light" section — rerun after kernel changes.
"""
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _timeit(fn, *args, reps=20):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def dot_chain_kernel(L, rows, depth, tile, chained, reps):
    """L dots of (rows, depth) @ (depth, tile) — ``chained``: each dot's
    operand is the previous result (sliced/padded to depth rows);
    otherwise all dots read the same operand (independent, pipelines)."""
    bf16, f32 = jnp.bfloat16, jnp.float32

    def kernel(M_ref, v_ref, o_ref):
        M = M_ref[:]
        v = v_ref[:]
        acc = jnp.zeros((rows, tile), f32)
        for _ in range(reps):
            x = v
            for _ in range(L):
                o = jnp.dot(M, x.astype(bf16), preferred_element_type=f32)
                if chained:
                    x = jnp.concatenate(
                        [o, jnp.zeros((depth - rows, tile), f32)], axis=0) \
                        if depth > rows else o[:depth]
                else:
                    acc = acc + o
            acc = acc + (x[:rows] if chained else 0.0)
        o_ref[:] = acc

    M = jnp.ones((rows, depth), bf16)
    v = jnp.ones((depth, tile), jnp.float32)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, tile), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return jax.jit(lambda: call(M, v))


def elementwise_kernel(N, F, tile, passes, reps):
    """`passes` clip+add+max passes over a (N, F, tile) VMEM array — the
    slack/dual/residual phase shape."""
    f32 = jnp.float32

    def kernel(a_ref, b_ref, o_ref):
        a, b = a_ref[:], b_ref[:]
        acc = jnp.zeros((1, tile), f32)
        for _ in range(reps):
            x = a
            for _ in range(passes):
                x = jnp.minimum(5.0, jnp.maximum(-5.0, x + b))
                acc = jnp.maximum(acc, jnp.max(jnp.abs(x), axis=(0, 1))[None])
        o_ref[:] = acc + jnp.max(x, axis=(0, 1))[None]

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
    REPS = 50        # in-kernel repetitions to swamp launch overhead

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
    dt = _timeit(fn, x0s, reps=10)
    iters = float(np.mean(np.asarray(sol.iter)))
    n_tiles = B // tile
    t_iter_tile = dt / (iters * n_tiles)          # seconds per tile-iteration

    # --- microbenchmarks on the same shapes ---
    # Sweep dots: bf16x3 stacks 3 passes along contraction: depth 3*nx=36,
    # rows nu+nx=16. 5 chained dots per step x (N-1) steps.
    L = 5 * (N - 1)
    t_chain = _timeit(dot_chain_kernel(L, 16, 36, tile, True, REPS)) / REPS
    t_indep = _timeit(dot_chain_kernel(L, 16, 36, tile, False, REPS)) / REPS
    # Elementwise: ~12 clip/add/max passes over the (N, nx+nu, tile) state
    # per iteration (candidates, projections, duals, residual maxes).
    P = 12
    t_elem = _timeit(elementwise_kernel(N, nx + nu, tile, P, REPS)) / REPS

    model = t_chain + t_elem
    # FLOPs per lane-iteration (f32-equivalent, counting the 3 bf16 passes
    # as one logical matmul): backward 19*(2*16*12 + 2*4*4 + 2*12*4) +
    # forward 19*(2*16*12 + 2*12*4) + ~15*N*(nx+nu) elementwise.
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
        "flops_per_lane_iter": flops_lane,
        "achieved_tflops": round(achieved_tflops, 2),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
