#!/usr/bin/env python
"""Generate, compile, and run a standalone C++ cart-pole solver —
the reference's codegen_cartpole example (examples/codegen_cartpole.cpp:59)
as a user-facing driver.

The generated project is fully self-contained (no Eigen, no library; see
tinympc_tpu/export/codegen_cpp.py): this script writes it, builds it with
g++ if available, runs the emitted demo main, and cross-checks its
closed-loop iterates against the same problem solved here.

Usage: python codegen_cartpole.py [out_dir]
"""
import json
import shutil
import subprocess
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

import jax

# Codegen is a design-time path: the generated solver is float64, so the
# cache computation and the parity cross-check run in f64 on CPU (a TPU
# would silently demote to f32 and break the 1e-9 parity claim).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import tinympc_tpu as tm
from tinympc_tpu import systems
from tinympc_tpu.export import generate_cpp


def main():
    out_dir = Path(sys.argv[1]) if len(sys.argv) > 1 else \
        Path("generated_cartpole")
    s = systems.cartpole()
    N = 10
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=N, dtype=jnp.float64)
    # The reference example's +-1e17 "infinite" bounds
    # (cartpole_example.cpp:45-48).
    prob = tm.with_bounds(prob, x_min=-1e17, x_max=1e17,
                          u_min=-1e17, u_max=1e17)
    prob = tm.with_settings(prob, max_iter=100)

    Xref = np.tile([1.0, 0, 0, 0], (N, 1))     # regulate to x = 1
    x0 = np.array([0.5, 0.0, 0.0, 0.0])
    nsteps = 25
    out = generate_cpp(prob, out_dir, x0=x0, Xref=Xref, nsteps=nsteps)
    print(f"generated standalone solver in {out}/")

    gxx = shutil.which("g++")
    if gxx is None:
        print("g++ not found - skipping compile/run")
        return
    exe = out / "tiny_main"
    subprocess.run([gxx, "-O2", "-std=c++17",
                    str(out / "src" / "tiny_main.cpp"), "-o", str(exe)],
                   check=True)
    lines = subprocess.run([str(exe)], capture_output=True, text=True,
                           check=True).stdout.strip().splitlines()
    steps = [json.loads(ln) for ln in lines]
    print(f"native closed loop: {len(steps)} steps, "
          f"total iters {sum(st['iter'] for st in steps)}")

    # Cross-check the native trajectory against the solver it came from.
    state = tm.init_state(prob)
    xk = jnp.asarray(x0)
    A, B = jnp.asarray(prob.A), jnp.asarray(prob.B)
    for k, st in enumerate(steps):
        sol, state, _ = tm.solve(prob, state, Xref=jnp.asarray(Xref), x0=xk)
        du = abs(float(state.u[0, 0]) - st["u0"][0])
        assert int(sol.iter) == st["iter"], \
            f"step {k}: {int(sol.iter)} vs {st['iter']} iterations"
        assert du < 1e-9, f"step {k}: |du0| = {du}"
        xk = A @ xk + B @ state.u[0]
    print(f"parity vs tinympc_tpu.solve: OK ({len(steps)} steps, "
          "iteration counts equal, |du0| < 1e-9)")


if __name__ == "__main__":
    main()
