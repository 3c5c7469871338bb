"""Export subsystem: problem persistence, AOT StableHLO round trip, and the
standalone C++ code generator (generated project is compiled with g++ and
its closed loop compared against the Python solver)."""
import json
import subprocess
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

import tinympc_tpu as tm
from tinympc_tpu import systems
from tinympc_tpu.export import (export_solver, generate_cpp, load_problem,
                                load_solver, save_problem)


def _cartpole_problem():
    s = systems.cartpole()
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=10, dtype=jnp.float64)
    prob = tm.with_bounds(prob, x_min=-1e17, x_max=1e17, u_min=-1e17, u_max=1e17)
    return tm.with_settings(prob, max_iter=100)


def test_problem_roundtrip(tmp_path):
    prob = _cartpole_problem()
    save_problem(prob, tmp_path / "prob.npz")
    loaded = load_problem(tmp_path / "prob.npz")
    assert loaded.spec == prob.spec
    assert loaded.settings == prob.settings
    np.testing.assert_array_equal(loaded.cache.Kinf, prob.cache.Kinf)
    np.testing.assert_array_equal(loaded.cons.x_max, prob.cons.x_max)

    # A loaded problem solves identically.
    x0 = jnp.asarray([0.5, 0.0, 0.0, 0.0])
    Xref = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (10, 1))
    s1, _, _ = tm.solve(prob, tm.init_state(prob), Xref=Xref, x0=x0)
    s2, _, _ = tm.solve(loaded, tm.init_state(loaded), Xref=Xref, x0=x0)
    np.testing.assert_array_equal(np.asarray(s1.x), np.asarray(s2.x))


def test_problem_roundtrip_with_cones_and_sens(tmp_path):
    s = systems.rocket_landing_20hz()
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=10, f=s["f"], dtype=jnp.float64)
    prob = tm.with_cones(prob, state_cones=[(0, 3, 0.25)],
                         input_cones=[(0, 3, 0.5)])
    save_problem(prob, tmp_path / "p.npz")
    loaded = load_problem(tmp_path / "p.npz")
    assert loaded.spec == prob.spec
    np.testing.assert_array_equal(loaded.cons.cx, prob.cons.cx)


def test_aot_export_roundtrip():
    prob = _cartpole_problem()
    blob = export_solver(prob)
    assert isinstance(blob, bytes) and len(blob) > 1000
    call = load_solver(blob)

    x0 = jnp.asarray([0.5, 0.0, 0.0, 0.0])
    Xref = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (10, 1))
    Uref = jnp.zeros((9, 1))
    sol_exp, _, _ = call(tm.init_state(prob), Xref, Uref, x0)
    sol_ref, _, _ = tm.solve(prob, tm.init_state(prob), Xref=Xref, x0=x0)
    np.testing.assert_allclose(np.asarray(sol_exp.x), np.asarray(sol_ref.x),
                               atol=1e-12)
    assert int(sol_exp.iter) == int(sol_ref.iter)


def _run_generated(prob, tmp_path, x0, Xref, Uref=None, nsteps=20):
    """Generate, g++-compile, run the standalone project, and compare every
    step's (x0, u0, iter) against the Python solver's closed loop."""
    out = generate_cpp(prob, tmp_path / "gen", x0=x0, Xref=Xref, Uref=Uref,
                       nsteps=nsteps)
    exe = tmp_path / "tiny_main"
    subprocess.run(["g++", "-O2", "-std=c++17",
                    str(out / "src" / "tiny_main.cpp"), "-o", str(exe)],
                   check=True)
    res = subprocess.run([str(exe)], capture_output=True, text=True, check=True)
    steps = [json.loads(line) for line in res.stdout.strip().splitlines()]
    assert len(steps) == nsteps

    state = tm.init_state(prob)
    x0j = jnp.asarray(x0)
    Xrefj = jnp.asarray(Xref)
    Urefj = jnp.asarray(Uref) if Uref is not None else None
    for rec in steps:
        sol, state, _ = tm.solve(prob, state, Xref=Xrefj, Uref=Urefj, x0=x0j)
        np.testing.assert_allclose(np.asarray(x0j), rec["x0"], atol=1e-9,
                                   err_msg=f"step {rec['step']} x0")
        np.testing.assert_allclose(np.asarray(state.u[0]), rec["u0"], atol=1e-9,
                                   err_msg=f"step {rec['step']} u0")
        assert int(sol.iter) == rec["iter"], f"step {rec['step']} iters"
        x0j = prob.A @ x0j + prob.B @ state.u[0] + prob.f


def test_codegen_cpp_soc_matches_python(tmp_path):
    """Generated C++ with SOC families enabled (beyond the reference's
    codegen, which skips cone data entirely, codegen.cpp:322-353)."""
    s = systems.rocket_landing_20hz()
    N = 10
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=N, f=s["f"], dtype=jnp.float64)
    prob = tm.with_bounds(
        prob, x_min=np.tile([-5, -5, -0.5, -10, -10, -20.], (N, 1)),
        x_max=np.tile([5, 5, 100, 10, 10, 20.], (N, 1)),
        u_min=-10.0, u_max=105.0)
    prob = tm.with_cones(prob, state_cones=[(0, 3, 0.25)],
                         input_cones=[(0, 3, 0.5)])
    prob = tm.with_settings(prob, max_iter=100, abs_pri_tol=2e-3)

    x0 = np.array([4, 2, 20, -3, 2, -4.5]) * 1.1
    Xref = np.linspace(x0, np.zeros(6), N)
    Uref = np.zeros((N - 1, 3)); Uref[:, 2] = 10.0
    _run_generated(prob, tmp_path, x0, Xref, Uref)


def test_codegen_cpp_linear_matches_python(tmp_path):
    """Generated C++ with static + tv hyperplane families on top of box
    bounds (bounds keep the open-loop test trajectory bounded — the
    comparison is in absolute round-off)."""
    s = systems.quadrotor_50hz()
    N, nx, nu = 10, 12, 4
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=N, dtype=jnp.float64)
    prob = tm.with_bounds(prob, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
    Alin_x = np.zeros((1, nx)); Alin_x[0, 2] = 1.0
    prob = tm.with_linear_constraints(prob, Alin_x, [3.0],
                                      np.ones((1, nu)), [6.0])
    tv_Alin_u = np.ones((N - 1, 1, nu))
    tv_blin_u = np.full((N - 1, 1), 5.5)
    prob = tm.with_tv_linear_constraints(prob, tv_Alin_u=tv_Alin_u,
                                         tv_blin_u=tv_blin_u)
    prob = tm.with_settings(prob, max_iter=100)

    x0 = np.array([-2.0, -2.0, 1.0] + [0.0] * 9)
    Xref = np.tile([2.0, 2.0, 3.5] + [0.0] * 9, (N, 1))
    _run_generated(prob, tmp_path, x0, Xref)


def test_codegen_cpp_matches_python(tmp_path):
    s = systems.quadrotor_20hz()
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=10, dtype=jnp.float64)
    prob = tm.with_bounds(prob, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
    prob = tm.with_settings(prob, max_iter=100)

    x0 = np.array([0, 1, 0, 0.2, 0, 0, 0.1, 0, 0, 0, 0, 0.0])
    Xref = np.tile([0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0.0], (10, 1))
    nsteps = 25
    out = generate_cpp(prob, tmp_path / "gen", x0=x0, Xref=Xref, nsteps=nsteps)

    exe = tmp_path / "tiny_main"
    subprocess.run(["g++", "-O2", "-std=c++17", str(out / "src" / "tiny_main.cpp"),
                    "-o", str(exe)], check=True)
    res = subprocess.run([str(exe)], capture_output=True, text=True, check=True)
    steps = [json.loads(line) for line in res.stdout.strip().splitlines()]
    assert len(steps) == nsteps

    # Python closed loop (same warm-starting semantics).
    state = tm.init_state(prob)
    x0j = jnp.asarray(x0)
    Xrefj = jnp.asarray(Xref)
    for rec in steps:
        sol, state, _ = tm.solve(prob, state, Xref=Xrefj, x0=x0j)
        np.testing.assert_allclose(np.asarray(x0j), rec["x0"], atol=1e-9,
                                   err_msg=f"step {rec['step']} x0")
        np.testing.assert_allclose(np.asarray(state.u[0]), rec["u0"], atol=1e-9,
                                   err_msg=f"step {rec['step']} u0")
        assert int(sol.iter) == rec["iter"], f"step {rec['step']} iters"
        x0j = prob.A @ x0j + prob.B @ state.u[0]


@pytest.mark.parametrize("rho_tol", [1.0, 3.0])
def test_codegen_cpp_adaptive_matches_python(tmp_path, rho_tol):
    """Generated C++ with the adaptive-rho subsystem burned in (the
    reference's tiny_codegen_with_sensitivity, codegen.cpp:82-101): per-step
    iteration counts, applied inputs, and the adapted rho trajectory match
    the float64 Python solver. rho_tol=3.0 additionally exercises the
    round-4 accumulator guard (ADAPT_GUARD) in the emitted C++."""
    s = systems.quadrotor_20hz()
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=10, dtype=jnp.float64)
    prob = tm.with_bounds(prob, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
    prob = tm.with_settings(prob, max_iter=100, adaptive_rho=True,
                            adaptive_rho_min=1.0, adaptive_rho_max=100.0,
                            adaptive_rho_tolerance=rho_tol)
    prob = tm.with_sensitivities(prob, systems.crazyflie_sensitivity_tables())

    x0 = np.array([0, 1, 0, 0.2, 0, 0, 0.1, 0, 0, 0, 0, 0.0]) * 2.0
    Xref = np.tile([0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0.0], (10, 1))
    nsteps = 15
    out = generate_cpp(prob, tmp_path / "gen", x0=x0, Xref=Xref,
                       nsteps=nsteps)

    exe = tmp_path / "tiny_main"
    subprocess.run(["g++", "-O2", "-std=c++17",
                    str(out / "src" / "tiny_main.cpp"), "-o", str(exe)],
                   check=True)
    res = subprocess.run([str(exe)], capture_output=True, text=True,
                         check=True)
    steps = [json.loads(line) for line in res.stdout.strip().splitlines()]
    assert len(steps) == nsteps

    state = tm.init_state(prob)
    x0j = jnp.asarray(x0)
    Xrefj = jnp.asarray(Xref)
    cache = prob.cache
    import dataclasses as _dc
    for rec in steps:
        # Each tiny_solve call starts from the previous call's adapted
        # cache (cache->rho persists across solves in the reference).
        p = prob.replace(cache=cache)
        sol, state, cache = tm.solve(p, state, Xref=Xrefj, x0=x0j)
        assert int(sol.iter) == rec["iter"], f"step {rec['step']} iters"
        np.testing.assert_allclose(float(cache.rho), rec["rho"], rtol=1e-8,
                                   err_msg=f"step {rec['step']} rho")
        np.testing.assert_allclose(np.asarray(state.u[0]), rec["u0"],
                                   atol=1e-8,
                                   err_msg=f"step {rec['step']} u0")
        x0j = prob.A @ x0j + prob.B @ state.u[0]


def test_codegen_cpp_adaptive_requires_sensitivities(tmp_path):
    import dataclasses

    prob = _cartpole_problem()
    prob = tm.with_settings(prob, adaptive_rho=True)
    prob = prob.replace(
        cache=dataclasses.replace(prob.cache, dKinf_drho=None))
    with pytest.raises(ValueError, match="sensitivity"):
        generate_cpp(prob, tmp_path / "gen")
