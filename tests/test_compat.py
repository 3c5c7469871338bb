"""The imperative compat API (tinympc_tpu.compat.TinyMPC) must reproduce
the functional API — and therefore the reference C++ — exactly: same golden
closed loops, same warm-start/dual-reset semantics, layout acceptance for
the reference's Eigen (nx, N) matrices."""
import numpy as np
import pytest

import tinympc_tpu.compat as compat
from tinympc_tpu import systems

from helpers import load_golden, steps_array


def _run_cartpole_compat(steps=120):
    s = systems.cartpole()
    mpc = compat.TinyMPC()
    mpc.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"], N=10,
              max_iter=100)
    mpc.set_bound_constraints(x_min=-1e17, x_max=1e17, u_min=-1e17, u_max=1e17)
    # Reference layout: Xref as an Eigen-style (nx, N) matrix.
    Xref = np.tile(np.asarray([[1.0], [0], [0], [0]]), (1, 10))
    mpc.set_x_ref(Xref)

    A, B = np.asarray(mpc.problem.A), np.asarray(mpc.problem.B)
    x0 = np.asarray([0.5, 0.0, 0.0, 0.0])
    rec = {k: [] for k in ("x0", "u0", "iter", "solved")}
    for _ in range(steps):
        mpc.set_x0(x0)
        sol = mpc.solve()
        u0 = np.asarray(mpc.state.u[0])
        rec["x0"].append(x0.copy())
        rec["u0"].append(u0)
        rec["iter"].append(int(sol.iter))
        rec["solved"].append(int(sol.solved))
        x0 = A @ x0 + B @ u0
    return rec


def test_cartpole_golden_via_compat():
    rec = _run_cartpole_compat()
    g = load_golden("cartpole")
    n = len(rec["iter"])
    np.testing.assert_allclose(np.asarray(rec["x0"]),
                               steps_array(g, "x0")[:n], atol=1e-6)
    np.testing.assert_allclose(np.asarray(rec["u0"]),
                               steps_array(g, "u0")[:n], atol=1e-6)
    np.testing.assert_array_equal(rec["iter"], steps_array(g, "iter")[:n])


def test_tracking_golden_via_compat():
    """Receding-horizon tracking with the per-step reset_duals(), against
    the quadrotor_tracking golden (quadrotor_tracking.cpp:77-105)."""
    s = systems.quadrotor_20hz()
    N, steps = 10, 60
    mpc = compat.TinyMPC()
    mpc.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"], N=N,
              max_iter=100)
    mpc.set_bound_constraints(x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)

    A, B = np.asarray(mpc.problem.A), np.asarray(mpc.problem.B)
    Xref_total = systems.trajectory("quadrotor_20hz_y_axis_line")
    x0 = Xref_total[0].copy()
    rec = {k: [] for k in ("x0", "u0", "iter")}
    for k in range(steps):
        mpc.set_x_ref(Xref_total[k:k + N])
        mpc.reset_duals()
        mpc.set_x0(x0)
        sol = mpc.solve()
        u0 = np.asarray(mpc.state.u[0])
        rec["x0"].append(x0.copy())
        rec["u0"].append(u0)
        rec["iter"].append(int(sol.iter))
        x0 = A @ x0 + B @ u0

    g = load_golden("quadrotor_tracking")
    np.testing.assert_allclose(np.asarray(rec["x0"]),
                               steps_array(g, "x0")[:steps], atol=1e-6)
    np.testing.assert_array_equal(rec["iter"], steps_array(g, "iter")[:steps])


def test_cone_setter_matches_functional():
    """set_cone_constraints (input-first argument order, tiny_api.cpp:176)
    must configure the same problem as api.with_cones."""
    import tinympc_tpu as tm
    s = systems.rocket_landing_20hz()
    mpc = compat.TinyMPC()
    mpc.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"], N=10,
              fdyn=s["f"], max_iter=100)
    mpc.set_cone_constraints(Acu=[0], qcu=[3], cu=[0.25],
                             Acx=[0], qcx=[3], cx=[0.5])
    spec = mpc.problem.spec
    assert spec.en_state_soc and spec.en_input_soc
    assert spec.state_cones == ((0, 3),) and spec.input_cones == ((0, 3),)
    np.testing.assert_allclose(np.asarray(mpc.problem.cons.cx), [0.5])
    np.testing.assert_allclose(np.asarray(mpc.problem.cons.cu), [0.25])

    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=10, f=s["f"])
    prob = tm.with_cones(prob, state_cones=[(0, 3, 0.5)],
                         input_cones=[(0, 3, 0.25)])
    mpc.set_x0(np.asarray(s.get("x0", np.zeros(6))))
    state = tm.init_state(prob)
    sol_f, state, _ = tm.solve(prob, state, x0=mpc._x0)
    sol_c = mpc.solve()
    np.testing.assert_allclose(np.asarray(sol_c.u), np.asarray(sol_f.u),
                               atol=1e-12)
    assert int(sol_c.iter) == int(sol_f.iter)


def test_update_settings_and_flags():
    s = systems.cartpole()
    mpc = compat.TinyMPC()
    mpc.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"], N=10)
    mpc.update_settings(abs_pri_tol=1e-4, max_iter=250, en_state_bound=0)
    assert mpc.problem.settings.abs_pri_tol == 1e-4
    assert mpc.problem.settings.max_iter == 250
    assert not mpc.problem.spec.en_state_bound
    assert mpc.problem.spec.en_input_bound
    with pytest.raises(TypeError):
        mpc.update_settings(not_a_setting=1)
    mpc.set_default_settings()
    assert mpc.problem.settings.max_iter == 1000


def test_workspace_survives_reconfiguration():
    """Reconfiguring constraints mid-run keeps the warm-start iterates, like
    the reference's single preallocated TinyWorkspace."""
    s = systems.cartpole()
    mpc = compat.TinyMPC()
    mpc.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"], N=10,
              max_iter=30)
    mpc.set_x0([0.5, 0, 0, 0])
    mpc.solve()
    u_before = np.asarray(mpc.state.u)
    mpc.set_bound_constraints(u_min=-10.0, u_max=10.0)
    np.testing.assert_array_equal(np.asarray(mpc.state.u), u_before)


def test_layout_rejects_bad_shape():
    s = systems.cartpole()
    mpc = compat.TinyMPC()
    mpc.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"], N=10)
    with pytest.raises(ValueError):
        mpc.set_x_ref(np.zeros((3, 7)))
    with pytest.raises(ValueError):
        mpc.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"], N=10,
                  nx=5)


def test_codegen_smoke(tmp_path):
    s = systems.cartpole()
    mpc = compat.TinyMPC()
    mpc.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"], N=10)
    mpc.set_x0([0.5, 0, 0, 0])
    out = mpc.codegen(tmp_path / "gen")
    assert (out / "src" / "tiny_solver.hpp").exists()
    assert (out / "src" / "tiny_data.hpp").exists()
