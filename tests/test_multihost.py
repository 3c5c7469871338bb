"""Multi-host (multi-process) path over simulated DCN.

Runs tools/multihost_sim.py: two OS processes, 2 virtual CPU devices each,
joined with shard.distributed_init (jax.distributed over localhost). Each
process ingests its local half of the batch via shard.global_batch and
verifies its result shard against an unsharded reference (exact iteration
counts). This is the closest a single machine gets to the BASELINE.md
"scaling to 2 hosts" deployment shape.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

import tinympc_tpu as tm
from tinympc_tpu import shard, systems

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_simulation():
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "multihost_sim.py")],
        capture_output=True, text=True, timeout=600, cwd=ROOT,
        env={**os.environ, "XLA_FLAGS": ""})
    assert out.returncode == 0, out.stdout + out.stderr
    assert out.stdout.count("MULTIHOST_OK") >= 2, out.stdout
    assert out.stdout.count("MULTIHOST_CONSENSUS_OK") == 2, out.stdout


def test_sharded_fused_ragged_batch():
    """B not divisible by the mesh: pad-and-trim keeps results identical
    to the exact-fit solve of the same rows."""
    import jax.numpy as jnp

    s = systems.quadrotor_20hz()
    p = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"], N=10,
                 dtype=jnp.float32)
    p = tm.with_bounds(p, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
    p = tm.with_settings(p, max_iter=20)
    rng = np.random.default_rng(7)
    B = 13                                      # 8 devices -> pad 3
    x0s = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 12)), jnp.float32)

    mesh = shard.make_mesh()
    sol, res = shard.solve_fused_sharded(p, None, None, x0s, mesh,
                                         interpret=True)
    assert sol.x.shape == (10, B, 12)
    assert res.shape[-1] == B

    sol_ref, _, _ = tm.solve(p, tm.init_state(p, (B,)), x0=x0s)
    np.testing.assert_array_equal(np.asarray(sol.iter),
                                  np.asarray(sol_ref.iter))
    # Interpret-mode rounding depends on the per-device tile width (2 lanes
    # here), so trajectories agree to tolerance, not bitwise.
    np.testing.assert_allclose(np.asarray(sol.u), np.asarray(sol_ref.u),
                               atol=1e-5)
