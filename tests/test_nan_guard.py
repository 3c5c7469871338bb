"""NaN sanitation (SURVEY.md §5: the jit-purity analog of sanitizers).

Runs the setup + solve paths under ``jax_debug_nans`` — JAX then re-runs
any primitive that produces a NaN un-jitted and raises, so a NaN anywhere
inside the solver (not just in the outputs) fails the test. Guards the
places NaNs could plausibly enter: the Riccati fixed point (matrix
inverses), the SOC projection (0/0 at the cone apex), the hyperplane
projection (norm division), and adaptive rho (residual ratio with eps
guards, rho_benchmark.cpp:183).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tinympc_tpu as tm
from tinympc_tpu import systems


@pytest.fixture
def nan_debugging():
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", False)


def test_solve_paths_nan_free(nan_debugging):
    s = systems.quadrotor_20hz()
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=10, dtype=jnp.float64)
    prob = tm.with_bounds(prob, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
    prob = tm.with_settings(prob, max_iter=30)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.4, 0.4, (8, 12)))
    sol, _, _ = tm.solve(prob, tm.init_state(prob, (8,)), x0=x0s)
    assert np.isfinite(np.asarray(sol.x)).all()

    # Adaptive rho: the residual-ratio sqrt is the NaN-prone spot.
    prob_a = tm.with_settings(prob, adaptive_rho=True)
    sol_a, _, _ = tm.solve(prob_a, tm.init_state(prob_a, (8,)), x0=x0s)
    assert np.isfinite(np.asarray(sol_a.x)).all()


def test_soc_apex_nan_free(nan_debugging):
    """The cone apex (zero vector) hits the 0/0 guard in project_soc."""
    from tinympc_tpu import projections
    z = jnp.zeros((4, 3))
    out = projections.project_soc(z, jnp.asarray(0.5))
    assert np.isfinite(np.asarray(out)).all()

    s = systems.rocket_landing_20hz()
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=10, f=s["f"], dtype=jnp.float64)
    prob = tm.with_cones(prob, state_cones=[(0, 3, 0.25)],
                         input_cones=[(0, 3, 0.5)])
    prob = tm.with_settings(prob, max_iter=20)
    # x0 exactly at the apex of the state cone.
    x0s = jnp.zeros((4, 6))
    sol, _, _ = tm.solve(prob, tm.init_state(prob, (4,)), x0=x0s)
    assert np.isfinite(np.asarray(sol.x)).all()


def test_setup_sensitivities_nan_free(nan_debugging):
    s = systems.cartpole()
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=10, dtype=jnp.float64)
    prob = tm.with_sensitivities(prob)
    for leaf in (prob.cache.Kinf, prob.cache.Pinf, prob.cache.dKinf_drho,
                 prob.cache.dPinf_drho):
        assert np.isfinite(np.asarray(leaf)).all()
