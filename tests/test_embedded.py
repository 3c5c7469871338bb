"""The prebuilt shared-library deployment path (export.build_shared_library
+ EmbeddedSolver): the native solver driven over ctypes must track the TPU
solver step for step, including warm-start and dual-reset semantics."""
import numpy as np
import jax.numpy as jnp

import tinympc_tpu as tm
from tinympc_tpu import systems
from tinympc_tpu.export import EmbeddedSolver, build_shared_library


def _cartpole_problem():
    s = systems.cartpole()
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=10, dtype=jnp.float64)
    prob = tm.with_bounds(prob, u_min=-10.0, u_max=10.0)
    return tm.with_settings(prob, max_iter=100)


def test_embedded_matches_python_closed_loop(tmp_path):
    prob = _cartpole_problem()
    so = build_shared_library(prob, tmp_path / "deploy")
    emb = EmbeddedSolver(so)
    assert (emb.nx, emb.nu, emb.N) == (4, 1, 10)

    Xref = np.tile([1.0, 0, 0, 0], (10, 1))
    emb.set_x_ref(Xref)
    state = tm.init_state(prob)
    A, B = np.asarray(prob.A), np.asarray(prob.B)

    x0 = np.array([0.5, 0.0, 0.0, 0.0])
    for step in range(40):
        esol = emb.solve(x0)
        sol, state, _ = tm.solve(prob, state, Xref=jnp.asarray(Xref),
                                 x0=jnp.asarray(x0))
        assert esol.iter == int(sol.iter), f"step {step}"
        assert esol.solved == bool(sol.solved)
        np.testing.assert_allclose(emb.u[0], np.asarray(state.u[0]),
                                   atol=1e-9, err_msg=f"step {step}")
        np.testing.assert_allclose(esol.u, np.asarray(sol.u), atol=1e-9)
        np.testing.assert_allclose(esol.x, np.asarray(sol.x), atol=1e-9)
        x0 = A @ x0 + B @ emb.u[0]

    r = emb.residuals
    assert r["pri_res_state"] < prob.settings.abs_pri_tol
    assert r["dua_res_input"] < prob.settings.abs_dua_tol


def test_embedded_reset_duals(tmp_path):
    """reset_duals zeroes g/y like the tracking example — verified against
    the functional solver doing the same state surgery."""
    prob = _cartpole_problem()
    so = build_shared_library(prob, tmp_path / "deploy", name="cartpole")
    emb = EmbeddedSolver(so)

    Xref = np.tile([1.0, 0, 0, 0], (10, 1))
    emb.set_x_ref(Xref)
    state = tm.init_state(prob)
    x0 = np.array([0.5, 0.0, 0.0, 0.0])
    for _ in range(3):
        emb.reset_duals()
        esol = emb.solve(x0)
        state = state.replace(g=jnp.zeros_like(state.g),
                              y=jnp.zeros_like(state.y))
        sol, state, _ = tm.solve(prob, state, Xref=jnp.asarray(Xref),
                                 x0=jnp.asarray(x0))
        assert esol.iter == int(sol.iter)
        x0 = np.asarray(prob.A) @ x0 + np.asarray(prob.B) @ emb.u[0]


def test_embedded_soc_family(tmp_path):
    """The .so covers the SOC family (the reference's prebuilt lib carries
    its full solver too)."""
    s = systems.rocket_landing_20hz()
    N = 10
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=N, f=s["f"], dtype=jnp.float64)
    prob = tm.with_cones(prob, state_cones=[(0, 3, 0.25)],
                         input_cones=[(0, 3, 0.5)])
    prob = tm.with_settings(prob, max_iter=100)
    so = build_shared_library(prob, tmp_path / "rocket", name="rocket")
    emb = EmbeddedSolver(so)

    x0 = np.array([4, 2, 20, -3, 2, -4.5])
    Xref = np.linspace(x0, np.zeros(6), N)
    Uref = np.zeros((N - 1, 3)); Uref[:, 2] = 10.0
    emb.set_x_ref(Xref)
    emb.set_u_ref(Uref)
    esol = emb.solve(x0)

    sol, state, _ = tm.solve(prob, tm.init_state(prob), Xref=jnp.asarray(Xref),
                             Uref=jnp.asarray(Uref), x0=jnp.asarray(x0))
    assert esol.iter == int(sol.iter)
    np.testing.assert_allclose(esol.u, np.asarray(sol.u), atol=1e-9)


def test_embedded_runtime_reconfiguration(tmp_path):
    """v2 C ABI: tiny_set_bound_constraints / tiny_update_settings mutate
    the deployed artifact at runtime (the reference keeps these callable by
    linking the full library into its generated project,
    src/tinympc/CMakeLists.txt:14-43). The reconfigured .so must track a
    Python solver rebuilt with the same bounds/settings."""
    prob = _cartpole_problem()
    so = build_shared_library(prob, tmp_path / "deploy", name="reconf")
    emb = EmbeddedSolver(so)

    st = emb.settings
    assert st["max_iter"] == 100 and abs(st["abs_pri_tol"] - 1e-3) < 1e-12

    # Tighten the input bound and the iteration budget mid-mission.
    emb.set_bound_constraints(u_min=-2.0, u_max=2.0)
    emb.update_settings(abs_pri_tol=1e-4, abs_dua_tol=1e-4, max_iter=250)
    assert emb.settings["max_iter"] == 250

    prob2 = tm.with_bounds(prob, u_min=-2.0, u_max=2.0)
    prob2 = tm.with_settings(prob2, abs_pri_tol=1e-4, abs_dua_tol=1e-4,
                             max_iter=250)

    Xref = np.tile([1.0, 0, 0, 0], (10, 1))
    emb.set_x_ref(Xref)
    state = tm.init_state(prob2)
    x0 = np.array([0.5, 0.0, 0.0, 0.0])
    for step in range(10):
        esol = emb.solve(x0)
        sol, state, _ = tm.solve(prob2, state, Xref=jnp.asarray(Xref),
                                 x0=jnp.asarray(x0))
        assert esol.iter == int(sol.iter), f"step {step}"
        np.testing.assert_allclose(esol.u, np.asarray(sol.u), atol=1e-9)
        x0 = np.asarray(prob.A) @ x0 + np.asarray(prob.B) @ emb.u[0]
    assert np.max(np.abs(esol.u)) <= 2.0 + 1e-12

    # Partial update leaves other fields untouched.
    emb.update_settings(max_iter=37)
    st = emb.settings
    assert st["max_iter"] == 37 and abs(st["abs_pri_tol"] - 1e-4) < 1e-12
