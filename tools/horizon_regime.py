#!/usr/bin/env python
"""horizon_parallel regime search: is there ANY config where the blocked
two-level scans beat the sequential sweeps end-to-end?

VERDICT r3 #7: the blocked scans lose on the TPU chip at every measured
config (BENCH_TABLE long-horizon rows); their depth property (~2*sqrt(N)
vs N) could in principle pay where per-step latency dominates and the
batch is too small to fill the machine — candidates: f64 on CPU, large
state dimension (the per-step matmuls get real), very long horizons,
narrow batches. This script measures sequential vs blocked on CPU f64
across those axes. Run with JAX_PLATFORMS=cpu (f64 needs
JAX_ENABLE_X64=1) or on TPU (f32).

Outcome feeds the deprecation decision for Settings.horizon_parallel.
"""
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_ENABLE_X64", "1")


def main():
    import jax
    import jax.numpy as jnp
    import tinympc_tpu as tm
    from tinympc_tpu import systems

    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = jnp.float32 if on_tpu else jnp.float64
    max_iter = 20
    print(f"platform={jax.devices()[0].platform} dtype={dtype.__name__} "
          f"max_iter={max_iter} (fixed work: tol=0 never converges)")

    def run(nx, nu, N, B):
        s = (systems.quadrotor_20hz() if nx == 12
             else systems.synthetic(nx, nu, seed=1))
        res = {}
        for hp in (False, True):
            prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"],
                            rho=s["rho"], N=N, dtype=dtype)
            prob = tm.with_bounds(prob, x_min=-50.0, x_max=50.0,
                                  u_min=-5.0, u_max=5.0)
            prob = tm.with_settings(prob, max_iter=max_iter,
                                    abs_pri_tol=0.0, abs_dua_tol=0.0,
                                    horizon_parallel=hp)
            rng = np.random.default_rng(0)
            x0s = jnp.asarray(rng.uniform(-0.5, 0.5, (B, nx)), dtype)
            step = jax.jit(lambda x: tm.solve_(
                prob, tm.init_state(prob, (B,)), None, None, x)[0].iter)
            out = jax.block_until_ready(step(x0s))
            reps = []
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(step(x0s))
                reps.append(time.perf_counter() - t0)
            dt = float(np.median(reps))
            res[hp] = B * max_iter / dt
        seq, blk = res[False], res[True]
        verdict = "BLOCKED WINS" if blk > seq * 1.05 else (
            "tie" if blk > seq * 0.95 else "sequential wins")
        print(f"nx={nx:3d} nu={nu:2d} N={N:4d} B={B:4d}: "
              f"sequential {seq:12,.0f} iters*B/s | blocked {blk:12,.0f} "
              f"| ratio {blk / seq:.2f}  -> {verdict}", flush=True)

    for cfg in [(12, 4, 128, 64), (12, 4, 512, 64), (12, 4, 2048, 16),
                (32, 8, 512, 64), (32, 8, 2048, 16),
                (64, 16, 512, 16), (64, 16, 2048, 4),
                (12, 4, 2048, 1), (64, 16, 2048, 1)]:
        run(*cfg)


if __name__ == "__main__":
    main()
