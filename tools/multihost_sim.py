#!/usr/bin/env python
"""Two-process multi-host simulation: the framework's DCN story without a
cluster.

Spawns two Python processes, each owning 2 virtual CPU devices, joined via
``shard.distributed_init`` (jax.distributed over localhost — fake DCN).
Process p feeds its local half of a 16-problem batch through
``shard.global_batch``, the jitted solve runs GSPMD-partitioned over the
4-device global mesh, and each process verifies its local shard of the
result against a process-local unsharded reference solve (exact iteration
counts, 1e-12 trajectories, f64).

This is the executable contract for real multi-host deployments
(`BASELINE.md` "scaling to 2 hosts"): on a TPU pod the same three calls —
``distributed_init()``, ``make_mesh()``, ``global_batch()`` — run the
identical program over ICI+DCN. The reference has no multi-anything
(SURVEY.md §2.4); this is the TPU-native replacement for its single-MCU
deployment model.

Usage::

    python tools/multihost_sim.py            # parent: spawn 2 workers
    python tools/multihost_sim.py --worker P PORT   # internal
"""
import os
import socket
import subprocess
import sys

NPROC = 2
DEVS_PER_PROC = 2
B = 16


def worker(proc_id: int, port: int) -> None:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={DEVS_PER_PROC}")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from tinympc_tpu import shard
    shard.distributed_init(f"localhost:{port}", NPROC, proc_id)
    assert jax.process_count() == NPROC
    assert jax.device_count() == NPROC * DEVS_PER_PROC

    import jax.numpy as jnp
    import numpy as np
    import tinympc_tpu as tm
    from tinympc_tpu import systems

    s = systems.quadrotor_20hz()
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=10, dtype=jnp.float64)
    prob = tm.with_bounds(prob, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
    prob = tm.with_settings(prob, max_iter=100)
    Xref = jnp.tile(jnp.asarray([0, 0, 1.0, 0, 0, 0, 0, 0, 0, 0, 0, 0]),
                    (10, 1))

    # Every process derives the same full batch from the seed; process p
    # *feeds* only its local half (rows [p*8, (p+1)*8)) — the multi-host
    # ingestion path — but can check against any row of the reference.
    rng = np.random.default_rng(0)
    x0_all = rng.uniform(-0.5, 0.5, (B, 12))
    lo, hi = proc_id * (B // NPROC), (proc_id + 1) * (B // NPROC)

    mesh = shard.make_mesh()            # 1-D "dp" over all 4 global devices
    x0_g = shard.global_batch(mesh, x0_all[lo:hi])
    assert x0_g.shape == (B, 12)

    @jax.jit
    def step(x0s):
        sol, _, _ = tm.solve_(prob, tm.init_state(prob, (B,)), Xref, None,
                              x0s)
        return sol.iter, sol.u[0]

    iters_g, u0_g = step(x0_g)
    jax.block_until_ready(u0_g)

    # Process-local reference: plain unsharded solve of the full batch.
    sol_ref, _, _ = tm.solve(prob, tm.init_state(prob, (B,)), Xref=Xref,
                             x0=jnp.asarray(x0_all))

    my_iters = shard.local_rows(iters_g)
    my_u0 = shard.local_rows(u0_g)
    # This process addresses devices 2p..2p+1 -> rows [p*8, (p+1)*8).
    np.testing.assert_array_equal(my_iters, np.asarray(sol_ref.iter)[lo:hi])
    np.testing.assert_allclose(my_u0, np.asarray(sol_ref.u)[0, lo:hi],
                               atol=1e-12)
    print(f"MULTIHOST_OK proc={proc_id} rows=[{lo},{hi}) "
          f"iters={my_iters.tolist()}", flush=True)


def main() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(p),
             str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=root)
        for p in range(NPROC)
    ]
    ok = True
    for p, pr in enumerate(procs):
        out, _ = pr.communicate(timeout=600)
        if pr.returncode != 0 or "MULTIHOST_OK" not in out:
            ok = False
            print(f"worker {p} FAILED (rc={pr.returncode}):\n{out}")
        else:
            print(out.strip().splitlines()[-1])
    print("multihost simulation:", "OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
    else:
        sys.exit(main())
