"""Fused Pallas kernel vs the XLA path.

On TPU the two paths are bit-identical (verified in development); here the
kernel runs in Pallas interpret mode on CPU so CI needs no TPU. Interpret
mode computes matmuls in full f32 while the TPU MXU uses single-pass bf16
for both paths, so tolerances are loose-ish but the iteration counts and
flags must still match.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tinympc_tpu as tm
from tinympc_tpu import systems
from tinympc_tpu.kernels import solve_fused, fused_supported


def _problem(max_iter=15):
    s = systems.quadrotor_20hz()
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=10, dtype=jnp.float32)
    prob = tm.with_bounds(prob, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
    return tm.with_settings(prob, max_iter=max_iter)


def test_fused_matches_xla_interpret():
    prob = _problem()
    B = 8
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.2, 0.2, (B, 12)), jnp.float32)
    Xref = jnp.tile(jnp.asarray([0, 0, 0.5, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                                jnp.float32), (10, 1))

    sol_ref, st_ref, _ = tm.solve(prob, tm.init_state(prob, (B,)), Xref=Xref,
                                  x0=x0s)
    sol_f, res = solve_fused(prob, Xref, None, x0s, tile=B, interpret=True)

    np.testing.assert_allclose(np.asarray(sol_f.x), np.asarray(sol_ref.x),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(sol_f.u), np.asarray(sol_ref.u),
                               atol=1e-4)
    it_f, it_r = np.asarray(sol_f.iter), np.asarray(sol_ref.iter)
    assert np.all(np.abs(it_f - it_r) <= 1)
    np.testing.assert_allclose(np.asarray(res[0]),
                               np.asarray(st_ref.pri_res_state), atol=1e-4)


def test_fused_supported_gate():
    prob = _problem()
    assert fused_supported(prob)
    soc = tm.with_cones(prob, input_cones=[(0, 3, 0.5)])
    assert not fused_supported(soc)
    with pytest.raises(ValueError):
        solve_fused(soc, None, None, jnp.zeros((8, 12), jnp.float32))
