"""Fused-kernel adaptive rho vs the XLA path.

Both paths telescope the Taylor updates through the sensitivity matrices
(M_b = M0 + drho_b * dM; admm.Telescope on the XLA side) but associate
the floating point differently — so unlike the fixed-rho families these
comparisons are tolerance-based, not bitwise. Runs in Pallas interpret
mode on CPU.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import tinympc_tpu as tm
from tinympc_tpu import systems
from tinympc_tpu.kernels import (adapted_cache, fused_supported, init_carry,
                                 solve_fused, solve_fused_warm)

XREF = jnp.tile(jnp.asarray([0, 0, 0.5, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                            jnp.float32), (10, 1))


def _adaptive_problem(max_iter=40, apply_c=False):
    s = systems.quadrotor_20hz()
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=10, dtype=jnp.float32)
    prob = tm.with_bounds(prob, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
    prob = tm.with_settings(prob, max_iter=max_iter, adaptive_rho=True,
                            adaptive_rho_apply_c=apply_c)
    return tm.with_sensitivities(prob,
                                 systems.crazyflie_sensitivity_tables())


def _x0s(B, seed=0, scale=2.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-0.2, 0.2, (B, 12)) * scale, jnp.float32)


def _compare(prob, x0s, atol=5e-4, rho_rtol=1e-3, iter_slack=2):
    B = x0s.shape[0]
    sol_r, st_r, cache_r = tm.solve(prob, tm.init_state(prob, (B,)),
                                    Xref=XREF, x0=x0s)
    sol_f, res = solve_fused(prob, XREF, None, x0s, tile=B, interpret=True)
    assert res.shape[0] == 5, "adaptive res must carry the final-rho row"
    np.testing.assert_allclose(np.asarray(sol_f.x), np.asarray(sol_r.x),
                               atol=atol)
    np.testing.assert_allclose(np.asarray(sol_f.u), np.asarray(sol_r.u),
                               atol=atol)
    np.testing.assert_allclose(np.asarray(res[4]), np.asarray(cache_r.rho),
                               rtol=rho_rtol)
    it_f, it_r = np.asarray(sol_f.iter), np.asarray(sol_r.iter)
    assert np.all(np.abs(it_f - it_r) <= iter_slack), (it_f, it_r)
    return sol_f, res, cache_r


def test_fused_adaptive_matches_xla_interpret():
    prob = _adaptive_problem()
    sol_f, res, cache_r = _compare(prob, _x0s(8))
    # rho must actually have moved for the test to mean anything.
    assert np.any(np.abs(np.asarray(res[4]) - float(prob.cache.rho)) > 1e-3)


def test_fused_adaptive_apply_c_matches_xla_interpret():
    """adaptive_rho_apply_c=True retargets Quu_inv/AmBKt through dC1/dC2 —
    the fixed version of the reference's C1/C2-alias quirk."""
    prob = _adaptive_problem(apply_c=True)
    _compare(prob, _x0s(8, seed=1))


def test_adaptive_guard_matches_xla_interpret():
    """adaptive_rho_tolerance > 1 — the OSQP adaptation guard the
    reference omits (rho_benchmark.cpp:175-197 predicts unconditionally):
    the fused kernel and the XLA path must agree under the guard, and the
    guard must actually change the rho trajectory vs the unguarded run
    (i.e. some balanced-residual predictions get suppressed)."""
    prob = _adaptive_problem()
    probg = tm.with_settings(prob, adaptive_rho_tolerance=2.0)
    _, res_g, _ = _compare(probg, _x0s(8))
    _, res_u, _ = _compare(prob, _x0s(8))
    assert not np.array_equal(np.asarray(res_g[4]), np.asarray(res_u[4]))


def test_adaptive_guard_tolerance_validated():
    prob = _adaptive_problem()
    with pytest.raises(ValueError, match="adaptive_rho_tolerance"):
        tm.with_settings(prob, adaptive_rho_tolerance=0.5)


def test_adapted_cache_reconstruction():
    """adapted_cache(rho_final) rebuilds the XLA path's final_cache."""
    prob = _adaptive_problem()
    x0s = _x0s(4, seed=2)
    _, res, cache_r = _compare(prob, x0s)
    cache_f = adapted_cache(prob, res[4])
    np.testing.assert_allclose(np.asarray(cache_f.Kinf),
                               np.asarray(cache_r.Kinf), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cache_f.Pinf),
                               np.asarray(cache_r.Pinf), atol=1e-3)


def test_fused_adaptive_warm_sequence():
    """Warm-started adaptive solves: rho rides the carry, matching an XLA
    sequence that threads final_cache back into the problem."""
    prob = _adaptive_problem(max_iter=25)
    B, T = 8, 4
    x0 = _x0s(B, seed=3)
    state = tm.init_state(prob, (B,))
    carry = init_carry(prob, B)
    assert carry.rho is not None and carry.rho.shape == (1, B)

    pr = prob
    for t in range(T):
        sol_r, state, cache_r = tm.solve(pr, state, Xref=XREF, x0=x0)
        # Thread the adapted per-problem cache into the next XLA solve
        # (the reference's persistent cache->rho across tiny_solve calls).
        pr = pr.replace(cache=cache_r)
        sol_f, res, carry = solve_fused_warm(prob, XREF, None, x0, carry,
                                             tile=B, interpret=True)
        np.testing.assert_allclose(np.asarray(sol_f.u), np.asarray(sol_r.u),
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(carry.rho[0]),
                                   np.asarray(cache_r.rho), rtol=5e-3)
        assert np.all(np.abs(np.asarray(sol_f.iter)
                             - np.asarray(sol_r.iter)) <= 3)
        u0 = state.u[0]
        x0 = (jnp.einsum('ij,bj->bi', prob.A, x0)
              + jnp.einsum('ij,bj->bi', prob.B, u0) + prob.f)


def test_adaptive_loop_carries_no_cache_copies():
    """The batched adaptive solve's while_loop carry holds only the (B,)
    rho row — never O(B*nx^2) per-problem cache copies (the telescoped
    Taylor update, VERDICT r1 item 7)."""
    prob = _adaptive_problem()
    B = 16
    state = tm.init_state(prob, (B,))
    x0s = _x0s(B)
    jaxpr = jax.make_jaxpr(
        lambda st, x0: tm.solve_(prob, st, XREF, None, x0))(state, x0s)

    def while_eqns(jx):
        for eqn in jx.eqns:
            if eqn.primitive.name == "while":
                yield eqn
            for v in eqn.params.values():
                if hasattr(v, "jaxpr"):
                    yield from while_eqns(v.jaxpr)

    eqns = list(while_eqns(jaxpr.jaxpr))
    assert eqns, "solve must lower to a while_loop"
    for eqn in eqns:
        for var in eqn.invars:
            shape = getattr(var.aval, "shape", ())
            # Solver-state leaves are time-major (N, B, F); a batch-leading
            # 3-d leaf can only be a per-problem cache matrix copy.
            assert not (len(shape) == 3 and shape[0] == B), (
                f"while carry holds a per-problem cache copy: {shape}")


def test_fused_supported_gate_adaptive():
    prob = _adaptive_problem()
    assert fused_supported(prob)
    # Without sensitivities the kernel cannot telescope the Taylor update.
    import dataclasses
    bare = prob.replace(cache=dataclasses.replace(
        prob.cache, dKinf_drho=None, dPinf_drho=None,
        dC1_drho=None, dC2_drho=None))
    assert not fused_supported(bare)
    with pytest.raises(ValueError):
        solve_fused(bare, None, None, jnp.zeros((8, 12), jnp.float32))
