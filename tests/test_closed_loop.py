"""On-device closed-loop rollout (lax.scan over MPC steps) vs the host-side
step loop used by the parity tests."""
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

import tinympc_tpu as tm
from tinympc_tpu import systems
from tinympc_tpu.closed_loop import closed_loop

sys.path.insert(0, str(Path(__file__).parent.parent / "examples"))
import scenarios


def test_closed_loop_matches_host_loop():
    rec = scenarios.run_quadrotor_hovering(steps=30)

    s = systems.quadrotor_20hz()
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"], N=10,
                    dtype=jnp.float64)
    prob = tm.with_bounds(prob, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
    prob = tm.with_settings(prob, max_iter=100)
    x0 = jnp.asarray([0, 1, 0, 0.2, 0, 0, 0.1, 0, 0, 0, 0, 0.0])
    Xref = jnp.tile(jnp.asarray([0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0.0]), (10, 1))

    xs, us, iters, solved, _ = closed_loop(
        prob, tm.init_state(prob), x0, Xref, n_steps=30)

    np.testing.assert_allclose(np.asarray(xs), np.asarray(rec["x0"]), atol=1e-10)
    np.testing.assert_allclose(np.asarray(us), np.asarray(rec["u0"]), atol=1e-10)
    np.testing.assert_array_equal(np.asarray(iters), np.asarray(rec["iter"]))


def test_closed_loop_batched_windowed():
    s = systems.quadrotor_20hz()
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"], N=10,
                    dtype=jnp.float64)
    prob = tm.with_bounds(prob, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
    prob = tm.with_settings(prob, max_iter=50)

    Xref_total = jnp.asarray(systems.trajectory("quadrotor_20hz_y_axis_line"))
    B, steps = 4, 20
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(Xref_total[0] + rng.uniform(-0.05, 0.05, (B, 12)))

    xs, us, iters, solved, _ = closed_loop(
        prob, tm.init_state(prob, (B,)), x0s, Xref_total, n_steps=steps,
        reset_duals=True)
    assert xs.shape == (steps, B, 12)

    # Each batched loop equals its own single rollout.
    for i in range(B):
        xs1, us1, it1, _, _ = closed_loop(
            prob, tm.init_state(prob), x0s[i], Xref_total, n_steps=steps,
            reset_duals=True)
        np.testing.assert_allclose(np.asarray(xs[:, i]), np.asarray(xs1),
                                   atol=1e-12)
        np.testing.assert_array_equal(np.asarray(iters[:, i]), np.asarray(it1))
