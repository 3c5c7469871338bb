"""Measure the mixed-precision schedule (Settings.coarse_iters) on the
headline workload: throughput + convergence-stat parity vs coarse=0.

Usage: python tools/coarse_sweep.py [max_iter] [coarse values...]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    import tinympc_tpu as tm
    from tinympc_tpu import systems
    from tinympc_tpu.kernels import solve_fused
    from tinympc_tpu.profiling import enable_compilation_cache
    enable_compilation_cache()

    max_iter = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    coarse_list = [int(v) for v in sys.argv[2:]] or [0, 25, 50, 75]
    B, tile, ct = 32768, 4096, 25
    s = systems.quadrotor_20hz()
    base = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=20, dtype=jnp.float32)
    base = tm.with_bounds(base, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
    Xref = jnp.tile(jnp.asarray([0,0,1.0,0,0,0,0,0,0,0,0,0], jnp.float32), (20,1))
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 12)), jnp.float32)

    ref_iters = ref_solved = None
    for cz in coarse_list:
        prob = tm.with_settings(base, max_iter=max_iter, check_termination=ct,
                                matmul_precision="high", coarse_iters=cz)
        step = jax.jit(lambda x, p=prob: solve_fused(p, Xref, None, x, tile=tile))
        (sol, _) = jax.block_until_ready(step(x0s))
        t0 = time.perf_counter(); jax.block_until_ready(step(x0s))
        t1 = max(time.perf_counter() - t0, 1e-6)
        k = max(1, int(np.ceil(1.0 / t1)))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(k):
                out = step(x0s)
            jax.block_until_ready(out)
            ts.append((time.perf_counter() - t0) / k)
        med = float(np.median(ts))
        it = np.asarray(out[0].iter); sv = np.asarray(out[0].solved)
        line = (f"coarse={cz:3d}: {B/med:12.1f} solves/s  "
                f"solved_frac={sv.mean():.4f}  avg_iters={it.mean():.2f}")
        if cz == 0:
            ref_iters, ref_solved = it, sv
        elif ref_iters is not None:
            same = (it == ref_iters).mean()
            line += (f"  identical_lanes={same:.3f}  "
                     f"dfrac={(sv.mean()-ref_solved.mean())*100:+.2f}pp")
        print(line, flush=True)

if __name__ == "__main__":
    main()
