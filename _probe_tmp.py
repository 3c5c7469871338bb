import time, numpy as np, jax, jax.numpy as jnp
import tinympc_tpu as tm
from tinympc_tpu import systems
from tinympc_tpu.kernels import solve_fused, max_tile
from tinympc_tpu.profiling import enable_compilation_cache
enable_compilation_cache()
f32 = jnp.float32
rng = np.random.default_rng(0)
s = systems.quadrotor_20hz()
for N in (128, 512):
    B = 1024
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"], N=N, dtype=f32)
    prob = tm.with_bounds(prob, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
    prob = tm.with_settings(prob, max_iter=20, matmul_precision="high")
    print(f"N={N} max_tile={max_tile(prob)}", flush=True)
    Xref = jnp.zeros((N, 12), f32).at[:, 2].set(1.0)
    x0s = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 12)), f32)
    for tile in ([128, 256] if N == 512 else [256, 512, 1024]):
        try:
            fn = jax.jit(lambda x0s, t=tile: solve_fused(prob, Xref, None, x0s, tile=t)[0].iter)
            out = jax.block_until_ready(fn(x0s))
            t0 = time.perf_counter()
            for _ in range(3):
                out = fn(x0s)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / 3
            print(f"  fused tile={tile}: {B*20/dt:,.0f} iters*B/s", flush=True)
        except Exception as e:
            print(f"  fused tile={tile}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
