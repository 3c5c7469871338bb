"""Streamed long-horizon fused kernel vs the XLA path (interpret mode on
CPU; on-chip parity is covered by tools/run_tpu_checks.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

import tinympc_tpu as tm
from tinympc_tpu import systems
from tinympc_tpu.kernels import solve_fused_streamed, stream_supported


def _problem(N, max_iter=15, **kw):
    s = systems.quadrotor_20hz()
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=N, dtype=jnp.float32)
    prob = tm.with_bounds(prob, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
    return tm.with_settings(prob, max_iter=max_iter, **kw)


def _check(prob, x0s, Xref=None, Uref=None, atol=1e-4, iter_slack=1,
           chunk=8, tile=None):
    B = x0s.shape[0]
    sol_ref, st_ref, _ = tm.solve(prob, tm.init_state(prob, (B,)), Xref=Xref,
                                  Uref=Uref, x0=x0s)
    sol_s, res = solve_fused_streamed(prob, Xref, Uref, x0s, tile=tile,
                                      chunk=chunk, interpret=True)
    np.testing.assert_allclose(np.asarray(sol_s.x), np.asarray(sol_ref.x),
                               atol=atol)
    np.testing.assert_allclose(np.asarray(sol_s.u), np.asarray(sol_ref.u),
                               atol=atol)
    it_s, it_r = np.asarray(sol_s.iter), np.asarray(sol_ref.iter)
    assert np.all(np.abs(it_s - it_r) <= iter_slack), (it_s, it_r)
    np.testing.assert_allclose(np.asarray(res[0]),
                               np.asarray(st_ref.pri_res_state), atol=atol)
    return sol_s, sol_ref


@pytest.mark.parametrize("N,chunk", [(24, 8), (20, 8), (32, 4)])
def test_stream_matches_xla_interpret(N, chunk):
    """Several horizons and chunkings, incl. N not a multiple of the
    requested chunk (falls back to a divisor) and a dead input row inside
    the last chunk."""
    prob = _problem(N)
    rng = np.random.default_rng(0)
    B = 8
    x0s = jnp.asarray(rng.uniform(-0.2, 0.2, (B, 12)), jnp.float32)
    Xref = jnp.tile(jnp.asarray([0, 0, 0.5, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                                jnp.float32), (N, 1))
    _check(prob, x0s, Xref, chunk=chunk, tile=B)


def test_stream_convergence_and_snapshot():
    """Lanes that converge mid-batch snapshot their solution at first
    convergence while others keep iterating (admm.cpp:436-437), matching
    the XLA path's per-problem masks."""
    prob = _problem(16, max_iter=300)
    rng = np.random.default_rng(1)
    B = 8
    # Mixed difficulty: some lanes near the reference, some far.
    scales = np.linspace(0.01, 0.5, B)[:, None]
    x0s = jnp.asarray(rng.uniform(-1, 1, (B, 12)) * scales, jnp.float32)
    sol_s, sol_ref = _check(prob, x0s, atol=2e-4, chunk=8, tile=B)
    solved = np.asarray(sol_s.solved)
    assert solved.any(), "test premise: some lane must converge"
    assert (np.asarray(sol_s.iter) <= 300).all()


def test_stream_multiple_tiles():
    """Batch split over several lane tiles (grid dim 0): scratch resets
    per tile, results identical to the single-tile run."""
    prob = _problem(16, max_iter=20)
    rng = np.random.default_rng(2)
    B = 16
    x0s = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 12)), jnp.float32)
    sol_1, _ = solve_fused_streamed(prob, None, None, x0s, tile=16,
                                    chunk=8, interpret=True)
    sol_2, _ = solve_fused_streamed(prob, None, None, x0s, tile=8,
                                    chunk=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(sol_1.x), np.asarray(sol_2.x))
    np.testing.assert_array_equal(np.asarray(sol_1.iter),
                                  np.asarray(sol_2.iter))


def test_stream_unsupported_specs_raise():
    prob = _problem(16)
    with pytest.raises(ValueError):
        solve_fused_streamed(tm.with_settings(prob, adaptive_rho=True),
                             None, None, jnp.zeros((8, 12)), interpret=True)
    soc = tm.with_cones(prob, input_cones=[(0, 3, 0.5)])
    assert not stream_supported(soc)
    with pytest.raises(ValueError):
        solve_fused_streamed(soc, None, None, jnp.zeros((8, 12)),
                             interpret=True)
