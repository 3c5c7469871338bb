"""The six reference example scenarios, re-built on tinympc-tpu.

Each ``run_*`` function replays the corresponding closed loop from the
reference's examples/ directory (same fixtures, same settings, same
simulation rule) and returns per-step records for golden-parity testing.
Reference files cited per function.
"""
from __future__ import annotations

import dataclasses
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import tinympc_tpu as tm
from tinympc_tpu import systems


def _record(rec, x0, u0, sol, state):
    rec["x0"].append(np.asarray(x0))
    rec["u0"].append(np.asarray(u0))
    rec["iter"].append(int(sol.iter))
    rec["solved"].append(int(sol.solved))
    rec["pri_res_state"].append(float(state.pri_res_state))
    rec["dua_res_state"].append(float(state.dua_res_state))
    rec["pri_res_input"].append(float(state.pri_res_input))
    rec["dua_res_input"].append(float(state.dua_res_input))


def _new_record():
    return {k: [] for k in ("x0", "u0", "iter", "solved", "pri_res_state",
                            "dua_res_state", "pri_res_input", "dua_res_input")}


def run_cartpole(steps: int = 390, dtype=jnp.float64) -> dict:
    """Cart-pole regulation to x=1 (reference examples/cartpole_example.cpp)."""
    s = systems.cartpole()
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=10, dtype=dtype)
    prob = tm.with_bounds(prob, x_min=-1e17, x_max=1e17, u_min=-1e17, u_max=1e17)
    prob = tm.with_settings(prob, max_iter=100)
    state = tm.init_state(prob)

    A, B = prob.A, prob.B
    x0 = jnp.asarray([0.5, 0.0, 0.0, 0.0], dtype)
    Xref = jnp.tile(jnp.asarray([1.0, 0, 0, 0], dtype), (10, 1))

    rec = _new_record()
    for _ in range(steps):
        sol, state, _ = tm.solve(prob, state, Xref=Xref, x0=x0)
        u0 = state.u[0]                      # raw forward-pass input, like
        _record(rec, x0, u0, sol, state)     # work->u.col(0) in the example
        x0 = A @ x0 + B @ u0
    return rec


def run_quadrotor_hovering(steps: int = 100, dtype=jnp.float64,
                           adaptive: bool = False) -> dict:
    """Quadrotor hover (reference examples/quadrotor_hovering.cpp); with
    ``adaptive=True`` the adaptive-rho subsystem is enabled using the
    reference's hard-coded Crazyflie sensitivity tables."""
    s = systems.quadrotor_20hz()
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=10, dtype=dtype)
    prob = tm.with_bounds(prob, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
    if adaptive:
        prob = tm.with_sensitivities(prob, systems.crazyflie_sensitivity_tables())
        prob = tm.with_settings(prob, max_iter=100, adaptive_rho=True)
    else:
        prob = tm.with_settings(prob, max_iter=100)
    state = tm.init_state(prob)

    A, B = prob.A, prob.B
    x0 = jnp.asarray([0, 1, 0, 0.2, 0, 0, 0.1, 0, 0, 0, 0, 0], dtype)
    Xref = jnp.tile(jnp.asarray([0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0], dtype), (10, 1))

    rec = _new_record()
    cache = prob.cache
    for _ in range(steps):
        # Adapted rho/cache persists across solves like the reference's
        # in-place cache mutation.
        sol, state, cache = tm.solve(prob.replace(cache=cache), state,
                                     Xref=Xref, x0=x0)
        u0 = state.u[0]
        _record(rec, x0, u0, sol, state)
        x0 = A @ x0 + B @ u0
    rec["final_cache"] = cache
    return rec


def run_quadrotor_tracking(steps: int = 291, dtype=jnp.float64) -> dict:
    """Receding-horizon trajectory tracking with per-step dual reset
    (reference examples/quadrotor_tracking.cpp)."""
    s = systems.quadrotor_20hz()
    N = 10
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=N, dtype=dtype)
    prob = tm.with_bounds(prob, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
    prob = tm.with_settings(prob, max_iter=100)
    state = tm.init_state(prob)

    A, B = prob.A, prob.B
    Xref_total = jnp.asarray(systems.trajectory("quadrotor_20hz_y_axis_line"), dtype)
    x0 = Xref_total[0]

    rec = _new_record()
    for k in range(steps):
        Xref = Xref_total[k:k + N]
        # Per-step dual reset (quadrotor_tracking.cpp:92-93).
        state = state.replace(y=jnp.zeros_like(state.y), g=jnp.zeros_like(state.g))
        sol, state, _ = tm.solve(prob, state, Xref=Xref, x0=x0)
        u0 = state.u[0]
        _record(rec, x0, u0, sol, state)
        x0 = A @ x0 + B @ u0
    return rec


def _quadrotor_linear_common(tv: bool, steps: int, dtype) -> dict:
    """Shared closed loop of the two linear-constraint demos (reference
    examples/quadrotor_linear_constraints.cpp and
    quadrotor_tv_linear_constraints.cpp): altitude ceiling z <= 3 (or a
    schedule) + total thrust <= 6, box constraints disabled."""
    s = systems.quadrotor_50hz()
    N, NTOTAL = 10, 50
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=N, dtype=dtype)
    nx, nu = 12, 4

    if not tv:
        Alin_x = np.zeros((1, nx)); Alin_x[0, 2] = 1.0
        Alin_u = np.ones((1, nu))
        prob = tm.with_linear_constraints(prob, Alin_x, [3.0], Alin_u, [6.0])
    else:
        z_lim_total = 1.1 + (3.0 - 1.1) * np.arange(NTOTAL) / (NTOTAL - N - 1)
        tv_Alin_x = np.zeros((N, 1, nx)); tv_Alin_x[:, 0, 2] = 1.0
        tv_blin_x = np.full((N, 1), 3.0)
        tv_Alin_u = np.ones((N - 1, 1, nu))
        tv_blin_u = np.full((N - 1, 1), 6.0)
        prob = tm.with_tv_linear_constraints(prob, tv_Alin_x, tv_blin_x,
                                             tv_Alin_u, tv_blin_u)
    prob = tm.with_settings(prob, max_iter=100, abs_pri_tol=1e-3, abs_dua_tol=1e-3)
    # Bound constraints disabled in both demos (…linear_constraints.cpp:70-71).
    prob = dataclasses.replace(
        prob, spec=dataclasses.replace(prob.spec, en_state_bound=False,
                                       en_input_bound=False))
    state = tm.init_state(prob)

    A, B, f = prob.A, prob.B, prob.f
    x0 = jnp.asarray([-2.0, -2.0, 1.0] + [0.0] * 9, dtype)
    xgoal = jnp.asarray([2.0, 2.0, 4.0] + [0.0] * 9, dtype)

    rec = _new_record()
    for k in range(steps):
        alpha = (k + np.arange(N)) / (NTOTAL - 1)
        Xref = (1 - alpha[:, None]) * x0 + alpha[:, None] * xgoal
        if tv:
            tv_blin_x = z_lim_total[k:k + N].reshape(N, 1)
            prob = tm.with_tv_linear_constraints(
                prob, tv_Alin_x, tv_blin_x, tv_Alin_u, tv_blin_u)
        sol, state, _ = tm.solve(prob, state, Xref=Xref.astype(dtype), x0=x0)
        u0 = state.u[0]
        _record(rec, x0, u0, sol, state)
        if bool(sol.solved):
            x0 = A @ x0 + B @ u0 + f
        else:
            x0 = 0.98 * x0 + 0.02 * xgoal
    return rec


def run_quadrotor_linear(steps: int = 40, dtype=jnp.float64) -> dict:
    return _quadrotor_linear_common(tv=False, steps=steps, dtype=dtype)


def run_quadrotor_tv_linear(steps: int = 40, dtype=jnp.float64) -> dict:
    return _quadrotor_linear_common(tv=True, steps=steps, dtype=dtype)


def run_rocket_landing(steps: int = 90, dtype=jnp.float64,
                       enable_soc: bool = False) -> dict:
    """Rocket soft landing (reference examples/rocket_landing_mpc.cpp).

    Replays the example verbatim, including two of its quirks: the swapped
    cone-argument order (state cone gets mu=0.25, input cone mu=0.5,
    rocket_landing_mpc.cpp:94) and — unless ``enable_soc`` — the fact that
    the example never sets en_state_soc/en_input_soc, so the cones are
    configured but inactive and the solve is box-only.
    """
    s = systems.rocket_landing_20hz()
    N, NTOTAL = 10, 100
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=N, f=s["f"], dtype=dtype)
    x_min = np.tile([-5.0, -5.0, -0.5, -10.0, -10.0, -20.0], (N, 1))
    x_max = np.tile([5.0, 5.0, 100.0, 10.0, 10.0, 20.0], (N, 1))
    prob = tm.with_bounds(prob, x_min=x_min, x_max=x_max, u_min=-10.0, u_max=105.0)
    prob = tm.with_cones(prob,
                         state_cones=[(0, 3, 0.25)],   # mu swap, see docstring
                         input_cones=[(0, 3, 0.5)],
                         enable=enable_soc)
    prob = tm.with_settings(prob, max_iter=100, abs_pri_tol=2e-3)
    state = tm.init_state(prob)

    A, B, f = prob.A, prob.B, prob.f
    xinit = jnp.asarray([4, 2, 20, -3, 2, -4.5], dtype)
    x0 = xinit * 1.1
    xg = jnp.zeros(6, dtype)
    Uref = jnp.zeros((N - 1, 3), dtype).at[:, 2].set(10.0)

    # Manual terminal-p seed (rocket_landing_mpc.cpp:121) — overwritten by
    # update_linear_cost on the first iteration, replicated for completeness.
    frac0 = jnp.arange(N, dtype=dtype) / (NTOTAL - 1)
    Xref0 = xinit + (xg - xinit) * frac0[:, None]
    state = state.replace(p=state.p.at[-1].set(-prob.cache.Pinf @ Xref0[-1]))

    rec = _new_record()
    for k in range(steps):
        frac = (jnp.arange(N, dtype=dtype) + k) / (NTOTAL - 1)
        Xref = xinit + (xg - xinit) * frac[:, None]
        sol, state, _ = tm.solve(prob, state, Xref=Xref, Uref=Uref, x0=x0)
        u0 = state.u[0]
        _record(rec, x0, u0, sol, state)
        x0 = A @ x0 + B @ u0 + f
    return rec
