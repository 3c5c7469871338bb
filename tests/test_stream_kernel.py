"""Streamed long-horizon fused kernel vs the XLA path (interpret mode on
CPU; on-chip parity is covered by tools/run_tpu_checks.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

import tinympc_tpu as tm
from tinympc_tpu import systems
from tinympc_tpu.kernels import (solve_fused_streamed,
                                 solve_fused_streamed_warm,
                                 stream_supported)


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


def test_stream_soc_matches_xla_interpret():
    """Long-horizon rocket landing: SOC cones on state and input + box
    bounds + affine dynamics through the streamed kernel (the
    full-trajectory powered-descent workload)."""
    N = 24
    s = systems.rocket_landing_20hz()
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=N, f=s["f"], dtype=jnp.float32)
    prob = tm.with_bounds(
        prob, x_min=np.tile([-5, -5, -0.5, -10, -10, -20.], (N, 1)),
        x_max=np.tile([5, 5, 100, 10, 10, 20.], (N, 1)),
        u_min=-10.0, u_max=105.0)
    prob = tm.with_cones(prob, state_cones=[(0, 3, 0.25)],
                         input_cones=[(0, 3, 0.5)])
    prob = tm.with_settings(prob, max_iter=15, abs_pri_tol=2e-3)

    B = 8
    rng = np.random.default_rng(5)
    x0s = jnp.asarray(np.array([4, 2, 20, -3, 2, -4.5])
                      * rng.uniform(0.9, 1.1, (B, 1)), jnp.float32)
    Xref = jnp.asarray(np.linspace([4, 2, 20, -3, 2, -4.5], np.zeros(6), N),
                       jnp.float32)
    Uref = jnp.zeros((N - 1, 3), jnp.float32).at[:, 2].set(10.0)
    _check(prob, x0s, Xref, Uref, chunk=8, tile=B)


def test_stream_warm_sequence_matches_xla():
    """Receding-horizon steps with an external plant: the streamed warm
    path (FusedCarry) must track the XLA path's persistent-state sequence
    — iteration counts and applied inputs per step — including per-lane
    convergence freezing and the stale-v dual residual at each solve's
    first iteration."""
    from tinympc_tpu.kernels import init_carry, solve_fused_streamed_warm

    prob = _problem(16, max_iter=40)
    B = 8
    rng = np.random.default_rng(3)
    x0s = jnp.asarray(rng.uniform(-0.2, 0.2, (B, 12)), jnp.float32)
    A, Bm = jnp.asarray(prob.A), jnp.asarray(prob.B)

    state = tm.init_state(prob, (B,))
    carry = init_carry(prob, B)
    xk_ref = xk_s = x0s
    for step in range(3):
        sol_r, state, _ = tm.solve(prob, state, x0=xk_ref)
        sol_s, _, carry = solve_fused_streamed_warm(
            prob, None, None, xk_s, carry, tile=B, chunk=8, interpret=True)
        it_r, it_s = np.asarray(sol_r.iter), np.asarray(sol_s.iter)
        assert np.all(np.abs(it_r - it_s) <= 1), f"step {step}: {it_r} {it_s}"
        np.testing.assert_allclose(np.asarray(sol_s.u), np.asarray(sol_r.u),
                                   atol=2e-4, err_msg=f"step {step}")
        np.testing.assert_allclose(np.asarray(sol_s.x), np.asarray(sol_r.x),
                                   atol=2e-4, err_msg=f"step {step}")
        xk_ref = xk_ref @ A.T + sol_r.u[0] @ Bm.T
        xk_s = xk_s @ A.T + sol_s.u[0] @ Bm.T


def test_stream_warm_cold_carry_equals_cold():
    """A zero carry must reproduce the cold streamed solve exactly (the
    cold path is the warm path at the zero workspace)."""
    from tinympc_tpu.kernels import init_carry, solve_fused_streamed_warm

    prob = _problem(16, max_iter=25)
    B = 8
    rng = np.random.default_rng(4)
    x0s = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 12)), jnp.float32)
    sol_c, res_c = solve_fused_streamed(prob, None, None, x0s, tile=B,
                                        chunk=8, interpret=True)
    sol_w, res_w, carry = solve_fused_streamed_warm(
        prob, None, None, x0s, init_carry(prob, B), tile=B, chunk=8,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(sol_w.x), np.asarray(sol_c.x))
    np.testing.assert_array_equal(np.asarray(sol_w.iter),
                                  np.asarray(sol_c.iter))
    np.testing.assert_array_equal(np.asarray(res_w), np.asarray(res_c))
    assert carry.vnew.shape == (16, 12, B)
    assert carry.znew.shape == (15, 4, B)


def test_stream_hyperplanes_match_xla_interpret():
    """Static + time-varying hyperplanes through the streamed kernel: a
    long-preview corridor (altitude ceiling + tightening tv schedule +
    thrust-sum plane) on top of box bounds."""
    N = 16
    s = systems.quadrotor_20hz()
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=N, dtype=jnp.float32)
    prob = tm.with_bounds(prob, x_min=-5.0, x_max=5.0, u_min=-0.5,
                          u_max=0.5)
    a = np.zeros(12); a[2] = 1.0
    prob = tm.with_linear_constraints(prob, Alin_x=a[None], blin_x=[0.4],
                                      Alin_u=np.ones((1, 4)), blin_u=[1.2])
    Atv = np.tile(a, (N, 1, 1))
    btv = np.linspace(0.6, 0.3, N)[:, None]
    prob = tm.with_tv_linear_constraints(prob, tv_Alin_x=Atv, tv_blin_x=btv)
    prob = tm.with_settings(prob, max_iter=20)

    B = 8
    rng = np.random.default_rng(6)
    x0s = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 12)), jnp.float32)
    Xref = jnp.tile(jnp.asarray([0, 0, 1.0] + [0.0] * 9, jnp.float32),
                    (N, 1))
    # Interpret mode lowers f32 ops differently from XLA CPU; with three
    # coupled families acting on the same coordinate the violated-only
    # projection branches flip on marginally-active rows and amplify that
    # round-off (each family alone matches at ~2e-5 with identical
    # iteration counts). On-chip both paths share the MXU and the check
    # lane pins bit-equality (tools/run_tpu_checks.py).
    _check(prob, x0s, Xref, chunk=8, tile=B, atol=2e-3)


def test_stream_unsupported_specs_raise():
    prob = _problem(16)
    # Adaptive rho is supported (round 3) — the builders auto-attach the
    # sensitivity matrices, so the spec passes the gate.
    assert stream_supported(tm.with_settings(prob, adaptive_rho=True))
    # Local consensus is supported cold; x0s must carry the
    # (n_groups, group, nx) structure.
    cons = tm.with_consensus(prob)
    assert stream_supported(cons)
    with pytest.raises(ValueError):
        solve_fused_streamed(cons, None, None, jnp.zeros((8, 12)),
                             interpret=True)
    # Extra families are supported cold AND warm (round 3); a carry whose
    # fields don't match the enabled families is rejected.
    from tinympc_tpu.kernels import init_carry, solve_fused_streamed_warm
    soc = tm.with_cones(prob, input_cones=[(0, 3, 0.5)])
    assert stream_supported(soc)
    with pytest.raises(ValueError):
        solve_fused_streamed_warm(soc, None, None, jnp.zeros((8, 12)),
                                  init_carry(prob, 8), interpret=True)


def test_stream_consensus_matches_xla_interpret():
    """Scenario-consensus groups through the streamed kernel: u[0] shared
    within each group via the in-kernel one-hot segment mean, step-0
    exact-prox gains, and the consensus residual gating convergence —
    matching the XLA path like the resident kernel's consensus tests."""
    ng, G, N = 2, 4, 16
    prob = tm.with_consensus(_problem(N, max_iter=80))
    rng = np.random.default_rng(7)
    x0s = jnp.asarray(rng.uniform(-0.3, 0.3, (ng, G, 12)), jnp.float32)
    Xref = jnp.tile(jnp.asarray([0, 0, 0.5, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                                jnp.float32), (N, 1))
    sol_ref, st_ref, _ = tm.solve(prob, tm.init_state(prob, (ng, G)),
                                  Xref=Xref, x0=x0s)
    sol_s, res = solve_fused_streamed(prob, Xref, None, x0s, tile=ng * G,
                                      chunk=8, interpret=True)
    assert sol_s.x.shape == (N, ng, G, 12)
    np.testing.assert_allclose(np.asarray(sol_s.x), np.asarray(sol_ref.x),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(sol_s.u), np.asarray(sol_ref.u),
                               atol=2e-4)
    it_s, it_r = np.asarray(sol_s.iter), np.asarray(sol_ref.iter)
    assert np.all(np.abs(it_s - it_r) <= 1), (it_s, it_r)
    # Converged groups share u[0] to within the consensus gate.
    u0 = np.asarray(sol_s.u[0])
    solved = np.asarray(sol_s.solved)
    for gi in range(ng):
        if solved[gi].all():
            assert np.ptp(u0[gi], axis=0).max() < 2 * 1e-3


# ---------------------------------------------------------------------------
# Adaptive rho on the streamed path (round 3): the telescoped Taylor
# subsystem with the OSQP reductions streamed across horizon chunks.
# The streamed kernel reproduces the *resident* kernel's association
# orders exactly, so those comparisons are bitwise; vs the XLA path the
# comparison is tolerance-based like tests/test_fused_adaptive.py.
# ---------------------------------------------------------------------------

def _adaptive_problem(N=16, max_iter=40, apply_c=False, soc=False):
    prob = _problem(N, max_iter=max_iter, adaptive_rho=True,
                    adaptive_rho_apply_c=apply_c)
    if soc:
        prob = tm.with_cones(prob, input_cones=[(0, 3, 0.6)])
        prob = tm.with_settings(prob, max_iter=max_iter, adaptive_rho=True,
                                adaptive_rho_apply_c=apply_c)
    return tm.with_sensitivities(prob,
                                 systems.crazyflie_sensitivity_tables())


def _xref(N):
    return jnp.tile(jnp.asarray([0, 0, 0.5, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                                jnp.float32), (N, 1))


def test_stream_consensus_warm_sequence():
    """Warm-started consensus on the streamed path: same carry contract as
    the resident kernel (consensus dual rides the carry, slack re-seeds
    from the carried u[0]); replays the XLA warm sequence to tolerance
    with matching iteration counts."""
    from tinympc_tpu.kernels import init_carry
    ng, G, T = 2, 4, 3
    prob = tm.with_consensus(_problem(16, max_iter=40), rho_c=50.0)
    rng = np.random.default_rng(5)
    x0s = jnp.asarray(rng.uniform(-0.3, 0.3, (ng, G, 12)), jnp.float32)
    Xref = _xref(16)
    state = tm.init_state(prob, (ng, G))
    carry = init_carry(prob, ng * G)
    assert carry.zc0 is not None and carry.u is not None
    for t in range(T):
        sol_r, state, _ = tm.solve(prob, state, Xref=Xref, x0=x0s)
        sol_s, _res, carry = solve_fused_streamed_warm(
            prob, Xref, None, x0s, carry, tile=ng * G, chunk=4,
            interpret=True)
        np.testing.assert_allclose(np.asarray(sol_s.u), np.asarray(sol_r.u),
                                   atol=5e-4, err_msg=f"step {t}")
        it_s, it_r = np.asarray(sol_s.iter), np.asarray(sol_r.iter)
        assert np.all(np.abs(it_s - it_r) <= 2), (t, it_s, it_r)
        np.testing.assert_allclose(
            np.asarray(carry.yc0.T.reshape(ng, G, -1)),
            np.asarray(state.yc0), atol=5e-4)
        u0 = state.u[0]
        x0s = (jnp.einsum("ij,...j->...i", prob.A, x0s)
               + jnp.einsum("ij,...j->...i", prob.B, u0) + prob.f)


def test_stream_adaptive_guard_bitwise_vs_resident():
    """The OSQP adaptation guard (adaptive_rho_tolerance > 1) runs
    identically in the streamed and resident kernels — bitwise, like the
    unguarded adaptive comparison below."""
    from tinympc_tpu.kernels import solve_fused
    prob = tm.with_settings(_adaptive_problem(), adaptive_rho_tolerance=2.0)
    rng = np.random.default_rng(3)
    x0s = jnp.asarray(rng.uniform(-0.4, 0.4, (8, 12)), jnp.float32)
    Xref = _xref(16)
    sol_f, res_f = solve_fused(prob, Xref, None, x0s, tile=8,
                               interpret=True)
    sol_s, res_s = solve_fused_streamed(prob, Xref, None, x0s, tile=8,
                                        chunk=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(sol_s.x), np.asarray(sol_f.x))
    np.testing.assert_array_equal(np.asarray(res_s[4]), np.asarray(res_f[4]))
    np.testing.assert_array_equal(np.asarray(sol_s.iter),
                                  np.asarray(sol_f.iter))


@pytest.mark.parametrize("apply_c", [False, True])
def test_stream_adaptive_bitwise_vs_resident(apply_c):
    """Box adaptive solves: streamed == resident fused kernel *bitwise*
    (identical mm scheme and association orders; the chunk-streamed
    pending-row reductions reproduce the whole-trajectory OSQP block
    exactly), and within tolerance of the XLA path with identical
    iteration counts."""
    from tinympc_tpu.kernels import solve_fused
    prob = _adaptive_problem(apply_c=apply_c)
    rng = np.random.default_rng(3)
    x0s = jnp.asarray(rng.uniform(-0.4, 0.4, (8, 12)), jnp.float32)
    Xref = _xref(16)
    sol_f, res_f = solve_fused(prob, Xref, None, x0s, tile=8,
                               interpret=True)
    sol_s, res_s = solve_fused_streamed(prob, Xref, None, x0s, tile=8,
                                        chunk=4, interpret=True)
    assert res_s.shape[0] == 5, "adaptive res must carry the final-rho row"
    np.testing.assert_array_equal(np.asarray(sol_s.x), np.asarray(sol_f.x))
    np.testing.assert_array_equal(np.asarray(sol_s.u), np.asarray(sol_f.u))
    np.testing.assert_array_equal(np.asarray(res_s[4]), np.asarray(res_f[4]))
    np.testing.assert_array_equal(np.asarray(sol_s.iter),
                                  np.asarray(sol_f.iter))
    # rho must actually have moved for the test to mean anything.
    assert np.any(np.abs(np.asarray(res_s[4]) - float(prob.cache.rho))
                  > 1e-3)
    # And the XLA path agrees to tolerance (association differs).
    sol_r, st_r, cache_r = tm.solve(prob, tm.init_state(prob, (8,)),
                                    Xref=Xref, x0=x0s)
    np.testing.assert_allclose(np.asarray(sol_s.x), np.asarray(sol_r.x),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(res_s[4]), np.asarray(cache_r.rho),
                               rtol=1e-3)
    assert np.all(np.abs(np.asarray(sol_s.iter)
                         - np.asarray(sol_r.iter)) <= 2)


def test_stream_adaptive_soc_matches_xla():
    """Adaptive rho composes with extra projection families on the
    streamed path (the backward sweep folds family terms with the
    per-lane rho row)."""
    prob = _adaptive_problem(soc=True)
    rng = np.random.default_rng(4)
    x0s = jnp.asarray(rng.uniform(-0.4, 0.4, (8, 12)), jnp.float32)
    Xref = _xref(16)
    sol_r, st_r, cache_r = tm.solve(prob, tm.init_state(prob, (8,)),
                                    Xref=Xref, x0=x0s)
    sol_s, res_s = solve_fused_streamed(prob, Xref, None, x0s, tile=8,
                                        chunk=8, interpret=True)
    np.testing.assert_allclose(np.asarray(sol_s.x), np.asarray(sol_r.x),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(sol_s.u), np.asarray(sol_r.u),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(res_s[4]), np.asarray(cache_r.rho),
                               rtol=1e-3)
    assert np.all(np.abs(np.asarray(sol_s.iter)
                         - np.asarray(sol_r.iter)) <= 2)


def test_stream_adaptive_warm_sequence_bitwise_vs_resident():
    """Warm-started adaptive streamed solves: rho rides the FusedCarry,
    bitwise-equal to a resident solve_fused_warm sequence (per-lane
    freeze incl. the frozen rho of converged lanes)."""
    from tinympc_tpu.kernels import init_carry, solve_fused_warm
    from tinympc_tpu.kernels import solve_fused_streamed_warm
    prob = _adaptive_problem(max_iter=25)
    B, T = 8, 3
    rng = np.random.default_rng(5)
    x0 = jnp.asarray(rng.uniform(-0.4, 0.4, (B, 12)), jnp.float32)
    Xref = _xref(16)
    carry_f = init_carry(prob, B)
    carry_s = init_carry(prob, B)
    for t in range(T):
        sol_f, _, carry_f = solve_fused_warm(prob, Xref, None, x0, carry_f,
                                             tile=B, interpret=True)
        sol_s, res_s, carry_s = solve_fused_streamed_warm(
            prob, Xref, None, x0, carry_s, tile=B, chunk=4, interpret=True)
        np.testing.assert_array_equal(np.asarray(sol_s.u),
                                      np.asarray(sol_f.u))
        np.testing.assert_array_equal(np.asarray(carry_s.rho),
                                      np.asarray(carry_f.rho))
        np.testing.assert_array_equal(np.asarray(sol_s.iter),
                                      np.asarray(sol_f.iter))
        u0 = sol_s.u[0]
        x0 = (jnp.einsum('ij,bj->bi', prob.A, x0)
              + jnp.einsum('ij,bj->bi', prob.B, u0) + prob.f)
    # Carry contract: rho present exactly when adaptive.
    fixed = _problem(16)
    with pytest.raises(ValueError):
        solve_fused_streamed_warm(fixed, None, None, x0, carry_s,
                                  interpret=True)


# ---------------------------------------------------------------------------
# Warm starts for extra families on the streamed path (round 3): family
# duals + x/u trajectories ride the FusedCarry; each solve re-seeds the
# family slack from the carried x/u exactly like the reference's
# per-tiny_solve behavior (admm.cpp:352-376).
# ---------------------------------------------------------------------------

def _receding(prob, solver_step, x0, T=3):
    """Run T receding-horizon steps, returning per-step (iter, u0, x)."""
    outs = []
    for _ in range(T):
        sol = solver_step(x0)
        u0 = sol.u[0]
        outs.append((np.asarray(sol.iter), np.asarray(u0),
                     np.asarray(sol.x)))
        x0 = (jnp.einsum('ij,bj->bi', prob.A, x0)
              + jnp.einsum('ij,bj->bi', prob.B, u0) + prob.f)
    return outs


@pytest.mark.parametrize("fam", ["soc", "lin", "soc_adaptive"])
def test_stream_warm_families_track_resident(fam):
    """Warm streamed sequences with extra families must track the
    resident solve_fused_warm sequence: identical per-step iteration
    counts and iterates to round-off (at 'highest' precision XLA's
    multi-pass dots and the kernels' schemes round differently; the
    bitwise lane is the on-chip check suite), and the XLA persistent-
    state sequence for fixed rho."""
    from tinympc_tpu.kernels import init_carry, solve_fused_warm
    from tinympc_tpu.kernels import solve_fused_streamed_warm
    prob = _problem(16, max_iter=30,
                    adaptive_rho=(fam == "soc_adaptive"))
    if fam.startswith("soc"):
        prob = tm.with_cones(prob, input_cones=[(0, 3, 0.6)])
    else:
        prob = tm.with_linear_constraints(
            prob, Alin_x=np.array([[0, 0, 1., 0, 0, 0,
                                    0, 0, 0, 0, 0, 0]]),
            blin_x=np.array([3.0]))
    B = 8
    rng = np.random.default_rng(6)
    x0 = jnp.asarray(rng.uniform(-0.4, 0.4, (B, 12)), jnp.float32)

    state = {"cf": init_carry(prob, B), "cs": init_carry(prob, B),
             "xla": tm.init_state(prob, (B,))}

    def step_f(x):
        sol, _, state["cf"] = solve_fused_warm(prob, None, None, x,
                                               state["cf"], tile=B,
                                               interpret=True)
        return sol

    def step_s(x):
        sol, _, state["cs"] = solve_fused_streamed_warm(
            prob, None, None, x, state["cs"], tile=B, chunk=4,
            interpret=True)
        return sol

    def step_x(x):
        sol, state["xla"], _ = tm.solve(prob, state["xla"], x0=x)
        return sol

    outs_f = _receding(prob, step_f, x0)
    outs_s = _receding(prob, step_s, x0)
    outs_x = _receding(prob, step_x, x0)
    for t, ((itf, uf, xf), (its, us_, xs_), (itx, ux, xx)) in enumerate(
            zip(outs_f, outs_s, outs_x)):
        np.testing.assert_array_equal(its, itf, err_msg=f"step {t}")
        np.testing.assert_allclose(xs_, xf, atol=5e-4,
                                   err_msg=f"step {t}")
        np.testing.assert_allclose(us_, uf, atol=5e-4,
                                   err_msg=f"step {t}")
        if fam != "soc_adaptive":   # adaptive rho feedback is chaotic
            assert np.all(np.abs(its - itx) <= 1), f"step {t}"
            np.testing.assert_allclose(us_, ux, atol=5e-4,
                                       err_msg=f"step {t}")


def test_stream_warm_family_cold_carry_equals_cold():
    """A zero family carry must reproduce the cold streamed solve (the
    family slack seeds and duals coincide at the zero workspace)."""
    from tinympc_tpu.kernels import init_carry, solve_fused_streamed_warm
    prob = tm.with_cones(_problem(16, max_iter=25),
                         input_cones=[(0, 3, 0.6)])
    B = 8
    rng = np.random.default_rng(7)
    x0s = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 12)), jnp.float32)
    sol_c, res_c = solve_fused_streamed(prob, None, None, x0s, tile=B,
                                        chunk=8, interpret=True)
    sol_w, res_w, carry = solve_fused_streamed_warm(
        prob, None, None, x0s, init_carry(prob, B), tile=B, chunk=8,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(sol_w.x), np.asarray(sol_c.x))
    np.testing.assert_array_equal(np.asarray(sol_w.iter),
                                  np.asarray(sol_c.iter))
    np.testing.assert_array_equal(np.asarray(res_w), np.asarray(res_c))
    assert carry.yc is not None and carry.yc.shape == (15, 4, B)
    assert carry.x is not None and carry.x.shape == (16, 12, B)
