#!/usr/bin/env python
"""Weak-scaling benchmark: solves/s at 1 -> 2 -> ... -> N mesh devices,
constant per-device batch (the BASELINE.md ">=80% scaling efficiency"
measurement path).

On a real multi-chip TPU slice this produces the hardware scaling number
(the sharded fused solve has *zero* collectives — each device runs its own
VMEM-resident kernel on its batch shard — so the only loss is host
dispatch + any straggler tile). On this single-chip dev environment it
falls back to the 8-virtual-CPU-device mesh, which validates the harness
and the partitioning but NOT hardware scaling (virtual devices share one
physical CPU; expect sub-linear numbers there and ignore them).

Usage:  python tools/bench_scaling.py [per_device_batch]
Prints one JSON line per mesh size plus a summary efficiency line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    per_dev = int(sys.argv[1]) if len(sys.argv) > 1 else 4096

    import jax

    # Single-device environments (the axon tunnel): fall back to a virtual
    # CPU mesh so the harness stays runnable anywhere.
    virtual = False
    if not jax.config.jax_platforms or "axon" in str(jax.config.jax_platforms):
        try:
            n = len(jax.devices())
        except RuntimeError:
            n = 0
        if n <= 1:
            virtual = True
    if virtual:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
        jax.config.update("jax_platforms", "cpu")
        per_dev = min(per_dev, 256)

    import jax.numpy as jnp
    import numpy as np
    import tinympc_tpu as tm
    from tinympc_tpu import shard, systems

    devices = jax.devices()
    platform = devices[0].platform
    interpret = platform != "tpu"

    s = systems.quadrotor_20hz()
    N = 20
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=N, dtype=jnp.float32)
    prob = tm.with_bounds(prob, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
    prob = tm.with_settings(prob, max_iter=100 if not virtual else 25,
                            matmul_precision="high")
    Xref = jnp.tile(jnp.asarray([0, 0, 1.0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                                jnp.float32), (N, 1))
    rng = np.random.default_rng(0)

    sizes = [n for n in (1, 2, 4, 8, 16, 32, 64) if n <= len(devices)]
    base = None
    results = []
    for n in sizes:
        mesh = shard.make_mesh(devices=devices[:n])
        B = per_dev * n
        x0s = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 12)), jnp.float32)
        x0s = shard.shard_batch_leading(mesh, x0s)

        def run(x):
            sol, _ = shard.solve_fused_sharded(prob, Xref, None, x, mesh,
                                               interpret=interpret)
            return sol.iter

        out = jax.block_until_ready(run(x0s))     # compile + warm
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run(x0s)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps

        sps = B / dt
        if base is None:
            base = sps
        eff = sps / (base * n)
        results.append((n, sps, eff))
        print(json.dumps({"mesh_devices": n, "batch": B,
                          "solves_per_s": round(sps, 1),
                          "per_device": round(sps / n, 1),
                          "weak_scaling_efficiency": round(eff, 4),
                          "platform": platform,
                          "virtual_mesh": virtual}), flush=True)

    last_n, _, last_eff = results[-1]
    print(json.dumps({
        "metric": "weak_scaling_efficiency",
        "value": round(last_eff, 4),
        "unit": f"fraction of linear at {last_n} devices",
        "note": ("virtual CPU mesh — harness validation only, not a "
                 "hardware scaling claim" if virtual else
                 "zero-collective sharded fused solve"),
    }))


if __name__ == "__main__":
    main()
