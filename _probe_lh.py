import time, numpy as np, jax, jax.numpy as jnp
import tinympc_tpu as tm
from tinympc_tpu import systems
from tinympc_tpu.kernels import solve_fused, solve_fused_streamed
from tinympc_tpu.profiling import enable_compilation_cache
enable_compilation_cache()
f32 = jnp.float32
rng = np.random.default_rng(0)
s = systems.quadrotor_20hz()

def bench(fn, *args, reps=5, min_rep_s=1.0):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter(); jax.block_until_ready(fn(*args)); t1 = max(time.perf_counter()-t0, 1e-6)
    k = max(1, int(np.ceil(min_rep_s / t1)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / k)
    return float(np.median(ts)), (max(ts)-min(ts))/float(np.median(ts))

for N in (128, 512):
    B = 1024
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"], N=N, dtype=f32)
    prob = tm.with_bounds(prob, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
    prob = tm.with_settings(prob, max_iter=20, matmul_precision="high")
    Xref = jnp.zeros((N, 12), f32).at[:, 2].set(1.0)
    x0s = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 12)), f32)

    fx = jax.jit(lambda x: tm.solve_(prob, tm.init_state(prob, (B,)), Xref, None, x)[0].iter)
    dt, sp = bench(fx, x0s)
    print(f"N={N} XLA seq:      {B*20/dt:>12,.0f} iters*B/s (+-{sp*100:.0f}%)", flush=True)

    fr = jax.jit(lambda x: solve_fused(prob, Xref, None, x)[0].iter)
    dt, sp = bench(fr, x0s)
    print(f"N={N} fused resident: {B*20/dt:>10,.0f} iters*B/s (+-{sp*100:.0f}%)", flush=True)

    fs = jax.jit(lambda x: solve_fused_streamed(prob, Xref, None, x)[0].iter)
    dt, sp = bench(fs, x0s)
    print(f"N={N} fused streamed: {B*20/dt:>10,.0f} iters*B/s (+-{sp*100:.0f}%)", flush=True)
