import time, numpy as np, jax, jax.numpy as jnp
import tinympc_tpu as tm
from tinympc_tpu import systems
from tinympc_tpu.kernels import solve_fused_streamed
from tinympc_tpu.profiling import enable_compilation_cache
enable_compilation_cache()
f32 = jnp.float32
rng = np.random.default_rng(0)
s = systems.quadrotor_20hz()

# correctness on chip first: N=64 vs XLA
for N, B, iters in [(64, 1024, 20)]:
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"], N=N, dtype=f32)
    prob = tm.with_bounds(prob, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
    prob = tm.with_settings(prob, max_iter=iters, matmul_precision="high")
    Xref = jnp.zeros((N, 12), f32).at[:, 2].set(1.0)
    x0s = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 12)), f32)
    sol_ref, st, _ = tm.solve(prob, tm.init_state(prob, (B,)), Xref=Xref, x0=x0s)
    sol_s, res = solve_fused_streamed(prob, Xref, None, x0s)
    dx = float(jnp.max(jnp.abs(sol_s.x - sol_ref.x)))
    du = float(jnp.max(jnp.abs(sol_s.u - sol_ref.u)))
    di = int(jnp.max(jnp.abs(sol_s.iter - sol_ref.iter)))
    print(f"parity N={N}: max|dx|={dx:.2e} max|du|={du:.2e} max|diter|={di}", flush=True)

for N in (128, 512):
    B = 1024
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"], N=N, dtype=f32)
    prob = tm.with_bounds(prob, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
    prob = tm.with_settings(prob, max_iter=20, matmul_precision="high")
    Xref = jnp.zeros((N, 12), f32).at[:, 2].set(1.0)
    x0s = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 12)), f32)
    fn = jax.jit(lambda x0s: solve_fused_streamed(prob, Xref, None, x0s)[0].iter)
    out = jax.block_until_ready(fn(x0s))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); jax.block_until_ready(fn(x0s)); ts.append(time.perf_counter()-t0)
    dt = float(np.median(ts))
    print(f"streamed N={N} B={B}: {B*20/dt:,.0f} iters*B/s (XLA seq was {407316 if N==512 else 1590980:,})", flush=True)
