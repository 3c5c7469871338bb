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

    # Stage 2 (round 5): cross-shard consensus on the FUSED kernel over
    # the same 2-process mesh — scenario-group members span simulated
    # DCN, the two-level driver's outer mean runs as a pmean across
    # processes. Verified against a process-local manual reference of
    # the identical algorithm (the scheme is mesh-size-invariant, so the
    # unsharded chain of frozen-consensus chunks + exact outer updates
    # must agree: iter/solved exactly, iterates to cross-program
    # round-off).
    import dataclasses
    from tinympc_tpu.kernels import init_carry, solve_fused_warm

    probc = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                     N=10, dtype=jnp.float32)
    probc = tm.with_bounds(probc, x_min=-5.0, x_max=5.0, u_min=-0.5,
                           u_max=0.5)
    probc = tm.with_settings(probc, max_iter=40, check_termination=5)
    probc = tm.with_consensus(probc, rho_c=50.0)
    ng, Gg = 2, 4                      # Gl = 1 member per global device
    rng2 = np.random.default_rng(1)
    x0c = jnp.asarray(rng2.uniform(-0.2, 0.2, (ng, Gg, 12)), jnp.float32)
    sol_sh, _ = shard.solve_fused_consensus_sharded(
        probc, None, None, x0c, mesh, sync_stride=5, interpret=True)
    jax.block_until_ready(sol_sh.x)

    Bc = ng * Gg
    nu = probc.spec.nu
    p5 = probc.replace(settings=dataclasses.replace(probc.settings,
                                                    max_iter=5))
    carry = init_carry(probc, Bc)
    out = None
    used = 0
    for _ in range(8):
        u0 = carry.u[0]
        cand = u0 + carry.yc0
        gm = cand.reshape(nu, ng, Gg).mean(axis=2)
        zc0 = jnp.repeat(gm[:, :, None], Gg, axis=2).reshape(nu, Bc)
        carry = dataclasses.replace(carry, zc0=zc0,
                                    yc0=carry.yc0 + u0 - zc0)
        solm, _, carry = solve_fused_warm(p5, None, None, x0c, carry,
                                          final=True,
                                          consensus_frozen=True,
                                          interpret=True)
        fit = solm.iter.reshape(Bc)
        fsv = solm.solved.reshape(Bc)
        fx = solm.x.reshape(10, Bc, 12)
        if out is None:
            out = [fx, fit + 0, jnp.zeros(Bc, bool)]
        live = ~out[2]
        out[0] = jnp.where(live[None, :, None], fx, out[0])
        out[1] = jnp.where(live, used + fit, out[1])
        u0_eff = jnp.where((out[2] | fsv)[:, None],
                           solm.u.reshape(9, Bc, 4)[0], carry.u[0].T)
        lm2 = u0_eff.reshape(ng, Gg, nu).mean(axis=1)
        cres = jnp.max(jnp.abs(u0_eff - jnp.repeat(lm2, Gg, axis=0)),
                       axis=1)
        out[2] = out[2] | (fsv & (cres < probc.settings.abs_pri_tol))
        used += 5
        if bool(jnp.all(out[2])):
            break
    # Each process can only read its addressable member shards (this is
    # real multi-host: devices 2p..2p+1 own members [2p, 2p+2)).
    def local_concat(garr, axis):
        shards = sorted(garr.addressable_shards,
                        key=lambda sh: sh.index[axis].start)
        lo = shards[0].index[axis].start
        return lo, np.concatenate([np.asarray(sh.data) for sh in shards],
                                  axis=axis)
    m0, x_loc = local_concat(sol_sh.x, 2)
    _, it_loc = local_concat(sol_sh.iter, 1)
    _, sv_loc = local_concat(sol_sh.solved, 1)
    nm = x_loc.shape[2]
    ref_x = np.asarray(out[0]).reshape(10, ng, Gg, 12)[:, :, m0:m0 + nm]
    ref_it = np.asarray(out[1]).reshape(ng, Gg)[:, m0:m0 + nm]
    ref_sv = np.asarray(out[2]).reshape(ng, Gg)[:, m0:m0 + nm]
    np.testing.assert_array_equal(it_loc, ref_it)
    np.testing.assert_array_equal(sv_loc, ref_sv)
    np.testing.assert_allclose(x_loc, ref_x, atol=1e-4)
    print(f"MULTIHOST_CONSENSUS_OK proc={proc_id} members="
          f"[{m0},{m0 + nm})", flush=True)


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
        if (pr.returncode != 0 or "MULTIHOST_OK" not in out
                or "MULTIHOST_CONSENSUS_OK" not in out):
            ok = False
            print(f"worker {p} FAILED (rc={pr.returncode}):\n{out}")
        else:
            for line in out.strip().splitlines():
                if "MULTIHOST" in line:
                    print(line)
    print("multihost simulation:", "OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
    else:
        sys.exit(main())
