#!/usr/bin/env python
"""Build a prebuilt shared library (the ``libtinympc.so`` analog) and
drive it over ctypes — including runtime reconfiguration of bounds and
settings through the v2 C ABI (the capability the reference keeps by
linking its full solver library into generated projects,
src/tinympc/CMakeLists.txt:14-43).

Usage: python deploy_embedded.py [out_dir]
"""
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

import jax

# Deployment is a design-time path: the .so burns a float64 cache, so
# compute it in f64 on CPU (a TPU would silently demote to f32).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import tinympc_tpu as tm
from tinympc_tpu import systems
from tinympc_tpu.export import EmbeddedSolver, build_shared_library


def main():
    out_dir = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("deploy_quad")
    s = systems.quadrotor_20hz()
    N = 10
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=N, dtype=jnp.float64)
    prob = tm.with_bounds(prob, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
    prob = tm.with_settings(prob, max_iter=100)

    so = build_shared_library(prob, out_dir)
    print(f"built {so}")
    emb = EmbeddedSolver(so)
    print(f"dims: nx={emb.nx} nu={emb.nu} N={emb.N}; "
          f"settings: {emb.settings}")

    Xref = np.tile([0, 0, 1.0, 0, 0, 0, 0, 0, 0, 0, 0, 0], (N, 1))
    emb.set_x_ref(Xref)
    A, B = np.asarray(prob.A), np.asarray(prob.B)
    x0 = np.array([0.2, 0.1, 0.4, 0, 0, 0, 0, 0, 0, 0, 0, 0])
    for step in range(8):
        sol = emb.solve(x0)
        print(f"step {step}: iters={sol.iter:3d} solved={int(sol.solved)} "
              f"z={x0[2]:+.3f} u0={np.round(emb.u[0], 4)}")
        x0 = A @ x0 + B @ emb.u[0]

    # Mid-mission reconfiguration: tighten the thrust bound and the
    # tolerances without regenerating or recompiling anything.
    print("\ntightening u bounds to +-0.25 and tolerances to 5e-4 ...")
    emb.set_bound_constraints(u_min=-0.25, u_max=0.25)
    emb.update_settings(abs_pri_tol=5e-4, abs_dua_tol=5e-4, max_iter=250)
    for step in range(8, 14):
        sol = emb.solve(x0)
        u0 = emb.u[0]
        assert np.all(np.abs(sol.u) <= 0.25 + 1e-12)
        print(f"step {step}: iters={sol.iter:3d} solved={int(sol.solved)} "
              f"z={x0[2]:+.3f} u0={np.round(u0, 4)}")
        x0 = A @ x0 + B @ u0
    print("\nreconfigured artifact keeps solving; projected inputs respect "
          "the new bound.")


if __name__ == "__main__":
    main()
