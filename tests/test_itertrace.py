"""Per-ADMM-iteration state parity vs the reference oracle.

tools/oracle/oracle_itertrace.cpp steps the reference solver one ADMM
iteration at a time (max_iter=1, termination disabled) and dumps the full
workspace after each. Replicating the same stepping here pins down every
intermediate quantity — q, r, p, d, x, u, slacks, duals — per iteration,
not just closed-loop outputs.
"""
import jax.numpy as jnp
import numpy as np

import tinympc_tpu as tm
from tinympc_tpu import systems

from helpers import load_golden


def test_iteration_trace_parity():
    g = load_golden("itertrace_quadrotor")
    s = systems.quadrotor_20hz()
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"], N=10,
                    dtype=jnp.float64)
    prob = tm.with_bounds(prob, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
    # One iteration per solve, termination never checked
    # (oracle_itertrace.cpp:39-40).
    prob = tm.with_settings(prob, max_iter=1, check_termination=1000)

    state = tm.init_state(prob)
    x0 = jnp.asarray([0, 1, 0, 0.2, 0, 0, 0.1, 0, 0, 0, 0, 0.0])
    Xref = jnp.tile(jnp.asarray([0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0.0]), (10, 1))

    # Reference stores trajectories as (dim x time); ours are (time, dim).
    def ref(arr):
        return np.asarray(arr).T

    state = state.replace(x=state.x.at[0].set(x0))
    for it, snap in enumerate(g["iters"]):
        sol, state, _ = tm.solve(prob, state, Xref=Xref)
        for field in ("x", "u", "vnew", "znew", "g", "y", "q", "r", "p", "d",
                      "v", "z"):
            np.testing.assert_allclose(
                np.asarray(getattr(state, field)), ref(snap[field]),
                atol=1e-8, err_msg=f"iteration {it}: field {field}")
        assert int(sol.solved) == snap["solved"]
