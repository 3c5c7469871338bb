"""Consensus ADMM over scenario batches (the coupled-scenario capability of
BASELINE.json's north star; no reference analog — SURVEY.md §2.4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map

import tinympc_tpu as tm
from tinympc_tpu import shard, systems


def _problem(max_iter=500, **kw):
    s = systems.quadrotor_20hz()
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"], N=10,
                    dtype=jnp.float64)
    prob = tm.with_bounds(prob, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
    return tm.with_settings(prob, max_iter=max_iter, **kw)


XREF = jnp.tile(jnp.asarray([0, 0, 1.0, 0, 0, 0, 0, 0, 0, 0, 0, 0]), (10, 1))


def test_consensus_identical_scenarios_matches_plain():
    """With identical scenarios the consensus constraint is inactive at the
    optimum; both solves approximate the same QP solution, agreeing at the
    termination-tolerance level (the extra prox term changes the ADMM
    trajectory, not the fixed point)."""
    prob = _problem()
    x0 = jnp.asarray([0, 0.3, 0.5, 0, 0, 0, 0, 0, 0, 0, 0, 0.0])
    x0s = jnp.tile(x0, (4, 1))

    sol_plain, _, _ = tm.solve(prob, tm.init_state(prob, (4,)), Xref=XREF, x0=x0s)
    probc = tm.with_consensus(prob)
    sol_cons, _, _ = tm.solve(probc, tm.init_state(probc, (4,)), Xref=XREF, x0=x0s)

    np.testing.assert_allclose(np.asarray(sol_cons.u), np.asarray(sol_plain.u),
                               atol=3e-3)


def test_consensus_forces_common_u0():
    """Different initial states -> consensus drives u[0] together while the
    plain solve produces distinct first inputs.

    The consensus prox is exact (with_consensus bakes the rho_c*I step-0
    quadratic into Cache.Kinf0/Quu0_inv), so raising rho_c buys consensus
    tightness directly and stably — unlike an under-weighted prox that
    shares the single rho-augmented quadratic, which needs thousands of
    iterations for loose consensus.
    """
    prob = _problem()
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.3, 0.3, (8, 12)))

    sol_plain, _, _ = tm.solve(prob, tm.init_state(prob, (8,)), Xref=XREF, x0=x0s)
    u0_plain = np.asarray(sol_plain.u[0])
    spread_plain = np.ptp(u0_plain, axis=0).max()
    assert spread_plain > 0.1, "test premise: inputs differ"

    def spread_at(mi, rho_c=None):
        probc = tm.with_consensus(tm.with_settings(prob, max_iter=mi),
                                  rho_c=rho_c)
        _, state, _ = tm.solve(probc, tm.init_state(probc, (8,)), Xref=XREF,
                               x0=x0s)
        u0 = np.asarray(state.u[0])
        return (np.ptp(u0, axis=0).max(),
                np.abs(u0 - np.asarray(state.zc0new)).max())

    # Default weight (rho_c = rho) contracts the spread.
    s1, _ = spread_at(500)
    assert s1 < spread_plain / 1.2
    # Heavier exact prox converges fast and stays stable.
    s2, c2 = spread_at(500, rho_c=100.0)
    assert s2 < 5e-3 and c2 < 2e-3, f"rho_c=100: spread {s2}, |u0-z| {c2}"
    s3, c3 = spread_at(500, rho_c=1000.0)
    assert s3 < 1e-4 and c3 < 1e-4, f"rho_c=1000: spread {s3}, |u0-z| {c3}"


def test_consensus_rho_via_with_settings_rebakes_gains():
    """Regression: changing consensus_rho through with_settings used to
    leave the baked step-0 gains at the old weight, desynchronizing the
    linear term from the quadratic and diverging to NaN."""
    prob = _problem(max_iter=500)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.3, 0.3, (8, 12)))

    via_settings = tm.with_settings(tm.with_consensus(prob),
                                    consensus_rho=100.0)
    via_builder = tm.with_consensus(prob, rho_c=100.0)
    np.testing.assert_array_equal(np.asarray(via_settings.cache.Quu0_inv),
                                  np.asarray(via_builder.cache.Quu0_inv))
    _, st, _ = tm.solve(via_settings, tm.init_state(via_settings, (8,)),
                        Xref=XREF, x0=x0s)
    u0 = np.asarray(st.u[0])
    assert np.all(np.isfinite(u0))
    assert np.ptp(u0, axis=0).max() < 5e-3


def test_consensus_adaptive_rho_guard():
    prob = _problem()
    with pytest.raises(ValueError):
        tm.with_consensus(tm.with_settings(prob, adaptive_rho=True))
    with pytest.raises(ValueError):
        tm.with_settings(tm.with_consensus(prob), adaptive_rho=True)


def test_consensus_sharded_pmean_matches_local():
    """Scenario group sharded over the mesh: pmean over the named axis gives
    the same result as the local-mean version."""
    prob = _problem(max_iter=100)
    rng = np.random.default_rng(1)
    S = 8
    x0s = jnp.asarray(rng.uniform(-0.3, 0.3, (S, 12)))

    probc = tm.with_consensus(prob)
    sol_ref, st_ref, _ = tm.solve(probc, tm.init_state(probc, (S,)), Xref=XREF,
                                  x0=x0s)

    mesh = shard.make_mesh()  # 8 devices, axis "dp"
    probp = tm.with_consensus(prob, axis_name="dp")

    def solve_shard(state, x0):
        sol, st, ca = tm.solve_(probp, state, XREF, None, x0)
        return sol, st

    # time arrays (T, B, F) shard on axis 1; everything else batch-leading.
    def spec_of(l):
        return P(None, "dp") if l.ndim == 3 else P("dp")

    state0 = tm.init_state(probp, (S,))
    sharded = shard_map(
        solve_shard, mesh=mesh,
        in_specs=(jax.tree.map(spec_of, state0), P("dp")),
        out_specs=(jax.tree.map(spec_of, sol_ref),
                   jax.tree.map(spec_of, st_ref)),
        check_vma=False,
    )
    sol_sh, st_sh = sharded(state0, x0s)

    np.testing.assert_allclose(np.asarray(st_sh.u), np.asarray(st_ref.u),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(st_sh.zc0new),
                               np.asarray(st_ref.zc0new), atol=1e-10)
