"""Riccati cache precomputation vs the reference oracle (tiny_api.cpp:307-381)."""
import jax.numpy as jnp
import numpy as np
import pytest

import tinympc_tpu as tm
from tinympc_tpu import systems

from helpers import load_golden, golden_cache, assert_cache_close


@pytest.mark.parametrize(
    "golden_name,system,N",
    [
        ("cartpole", systems.cartpole(), 10),
        ("quadrotor_hovering", systems.quadrotor_20hz(), 10),
        ("quadrotor_linear", systems.quadrotor_50hz(), 10),
        ("rocket", systems.rocket_landing_20hz(), 10),
    ],
)
def test_cache_matches_reference(golden_name, system, N):
    g = load_golden(golden_name)
    gc = golden_cache(g)
    prob = tm.setup(system["A"], system["B"], system["Qdiag"], system["Rdiag"],
                    rho=system["rho"], N=N, f=system["f"], dtype=jnp.float64)
    # Augmented diagonals stored like work->Q/work->R (tiny_api.cpp:117-118).
    np.testing.assert_allclose(prob.Qdiag, gc["Q_aug"], atol=1e-12)
    np.testing.assert_allclose(prob.Rdiag, gc["R_aug"], atol=1e-12)
    assert_cache_close(prob.cache, gc, atol=1e-6)


def test_sensitivities_match_finite_differences():
    s = systems.cartpole()
    A, B = jnp.asarray(s["A"]), jnp.asarray(s["B"])
    f = jnp.asarray(s["f"])
    Qd, Rd = jnp.asarray(s["Qdiag"]), jnp.asarray(s["Rdiag"])
    rho = 1.0
    dK, dP, dC1, dC2 = tm.riccati.compute_sensitivities(A, B, f, Qd, Rd, rho)

    def cache_at(r):
        return tm.riccati.precompute_cache(A, B, f, Qd + r, Rd + r, r,
                                           tol=1e-10, max_iters=10_000)

    eps = 1e-5
    hi, lo = cache_at(rho + eps), cache_at(rho - eps)
    np.testing.assert_allclose(dK, (hi.Kinf - lo.Kinf) / (2 * eps), rtol=1e-3, atol=1e-7)
    np.testing.assert_allclose(dP, (hi.Pinf - lo.Pinf) / (2 * eps), rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(dC1, (hi.Quu_inv - lo.Quu_inv) / (2 * eps), rtol=1e-3, atol=1e-8)
    np.testing.assert_allclose(dC2, (hi.AmBKt - lo.AmBKt) / (2 * eps), rtol=1e-3, atol=1e-7)
