"""Horizon-parallel (associative-scan) Riccati sweeps vs the sequential
scans — the long-horizon 'sequence parallelism' path (SURVEY.md §5)."""
import jax.numpy as jnp
import numpy as np
import pytest

import tinympc_tpu as tm
from tinympc_tpu import admm, systems


def _problem(N, horizon_parallel=False):
    s = systems.quadrotor_20hz()
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"], N=N,
                    dtype=jnp.float64)
    prob = tm.with_bounds(prob, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
    return tm.with_settings(prob, max_iter=30,
                            horizon_parallel=horizon_parallel)


@pytest.mark.parametrize("N", [10, 64, 257])
def test_assoc_sweeps_match_sequential(N):
    prob_seq = _problem(N)
    prob_par = _problem(N, horizon_parallel=True)
    Xref = jnp.tile(jnp.asarray([0, 0, 1.0, 0, 0, 0, 0, 0, 0, 0, 0, 0]), (N, 1))
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.3, 0.3, (4, 12)))

    sol_s, st_s, _ = tm.solve(prob_seq, tm.init_state(prob_seq, (4,)),
                              Xref=Xref, x0=x0s)
    sol_p, st_p, _ = tm.solve(prob_par, tm.init_state(prob_par, (4,)),
                              Xref=Xref, x0=x0s)

    # Same math in a different association order: matches to near round-off,
    # amplified by the horizon length.
    np.testing.assert_allclose(np.asarray(sol_p.x), np.asarray(sol_s.x),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(sol_p.u), np.asarray(sol_s.u),
                               atol=1e-7)
    assert np.max(np.abs(np.asarray(sol_p.iter) - np.asarray(sol_s.iter))) <= 1


def test_assoc_sweep_units():
    """Unit check of both sweeps against the scan versions on one state."""
    prob = _problem(33)
    state = tm.init_state(prob, (2,))
    rng = np.random.default_rng(1)
    state = state.replace(
        q=jnp.asarray(rng.normal(size=state.q.shape)),
        r=jnp.asarray(rng.normal(size=state.r.shape)),
        p=state.p.at[-1].set(jnp.asarray(rng.normal(size=(2, 12)))),
        x=state.x.at[0].set(jnp.asarray(rng.normal(size=(2, 12)))),
    )
    seq = admm.backward_pass(prob.cache, prob.B, state)
    par = admm.backward_pass_assoc(prob.cache, prob.B, state)
    np.testing.assert_allclose(np.asarray(par.p), np.asarray(seq.p), atol=1e-9)
    np.testing.assert_allclose(np.asarray(par.d), np.asarray(seq.d), atol=1e-9)

    seq2 = admm.forward_pass(prob.A, prob.B, prob.f, prob.cache, seq)
    par2 = admm.forward_pass_assoc(prob.A, prob.B, prob.f, prob.cache, seq)
    np.testing.assert_allclose(np.asarray(par2.x), np.asarray(seq2.x), atol=1e-9)
    np.testing.assert_allclose(np.asarray(par2.u), np.asarray(seq2.u), atol=1e-9)
