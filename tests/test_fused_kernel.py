"""Fused Pallas kernel vs the XLA path, across every constraint family.

On TPU the two paths are bit-identical (verified in development); here the
kernel runs in Pallas interpret mode on CPU so CI needs no TPU. Interpret
mode computes matmuls in full f32 while the TPU MXU uses single-pass bf16
for both paths, so tolerances are loose-ish but the iteration counts and
flags must still match.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tinympc_tpu as tm
from tinympc_tpu import systems
from tinympc_tpu.kernels import solve_fused, fused_supported


def _problem(max_iter=15, **settings):
    s = systems.quadrotor_20hz()
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=10, dtype=jnp.float32)
    prob = tm.with_bounds(prob, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
    return tm.with_settings(prob, max_iter=max_iter, **settings)


def _check_fused_matches_xla(prob, x0s, Xref=None, Uref=None, atol=1e-4,
                             iter_slack=1):
    B = x0s.shape[0]
    sol_ref, st_ref, _ = tm.solve(prob, tm.init_state(prob, (B,)), Xref=Xref,
                                  Uref=Uref, x0=x0s)
    sol_f, res = solve_fused(prob, Xref, Uref, x0s, tile=B, interpret=True)

    np.testing.assert_allclose(np.asarray(sol_f.x), np.asarray(sol_ref.x),
                               atol=atol)
    np.testing.assert_allclose(np.asarray(sol_f.u), np.asarray(sol_ref.u),
                               atol=atol)
    it_f, it_r = np.asarray(sol_f.iter), np.asarray(sol_ref.iter)
    assert np.all(np.abs(it_f - it_r) <= iter_slack)
    np.testing.assert_allclose(np.asarray(res[0]),
                               np.asarray(st_ref.pri_res_state), atol=atol)
    return sol_f, sol_ref


def test_fused_matches_xla_interpret():
    prob = _problem()
    B = 8
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.2, 0.2, (B, 12)), jnp.float32)
    Xref = jnp.tile(jnp.asarray([0, 0, 0.5, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                                jnp.float32), (10, 1))
    _check_fused_matches_xla(prob, x0s, Xref)


def test_fused_soc_matches_xla_interpret():
    """Rocket-landing config: SOC cones on state and input + box bounds +
    affine dynamics (examples/rocket_landing_mpc.cpp with the cones
    actually enabled)."""
    s = systems.rocket_landing_20hz()
    N = 10
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=N, f=s["f"], dtype=jnp.float32)
    x_min = np.tile([-5.0, -5.0, -0.5, -10.0, -10.0, -20.0], (N, 1))
    x_max = np.tile([5.0, 5.0, 100.0, 10.0, 10.0, 20.0], (N, 1))
    prob = tm.with_bounds(prob, x_min=x_min, x_max=x_max, u_min=-10.0,
                          u_max=105.0)
    prob = tm.with_cones(prob, state_cones=[(0, 3, 0.25)],
                         input_cones=[(0, 3, 0.5)])
    prob = tm.with_settings(prob, max_iter=20, abs_pri_tol=2e-3)
    assert fused_supported(prob)

    B = 8
    rng = np.random.default_rng(1)
    x0s = jnp.asarray(
        np.asarray([4, 2, 20, -3, 2, -4.5]) * (1 + 0.1 * rng.uniform(-1, 1, (B, 6))),
        jnp.float32)
    frac = jnp.arange(N, dtype=jnp.float32) / 99.0
    Xref = jnp.asarray([4, 2, 20, -3, 2, -4.5], jnp.float32) * (1 - frac[:, None])
    Uref = jnp.zeros((N - 1, 3), jnp.float32).at[:, 2].set(10.0)
    _check_fused_matches_xla(prob, x0s, Xref, Uref, atol=2e-4)


def test_fused_linear_matches_xla_interpret():
    """quadrotor_linear_constraints config: static hyperplanes, bounds off."""
    s = systems.quadrotor_50hz()
    N, nx, nu = 10, 12, 4
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=N, dtype=jnp.float32)
    Alin_x = np.zeros((1, nx)); Alin_x[0, 2] = 1.0
    Alin_u = np.ones((1, nu))
    prob = tm.with_linear_constraints(prob, Alin_x, [3.0], Alin_u, [6.0])
    prob = tm.with_settings(prob, max_iter=20)
    prob = dataclasses.replace(
        prob, spec=dataclasses.replace(prob.spec, en_state_bound=False,
                                       en_input_bound=False))
    assert fused_supported(prob)

    B = 8
    rng = np.random.default_rng(2)
    x0s = jnp.asarray(
        np.asarray([-2.0, -2.0, 1.0] + [0.0] * 9) + 0.1 * rng.uniform(-1, 1, (B, 12)),
        jnp.float32)
    Xref = jnp.tile(jnp.asarray([2.0, 2.0, 4.0] + [0.0] * 9, jnp.float32),
                    (N, 1))
    _check_fused_matches_xla(prob, x0s, Xref)


def test_fused_tv_linear_matches_xla_interpret():
    """quadrotor_tv_linear_constraints config: per-timestep hyperplanes."""
    s = systems.quadrotor_50hz()
    N, nx, nu = 10, 12, 4
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=N, dtype=jnp.float32)
    tv_Alin_x = np.zeros((N, 1, nx)); tv_Alin_x[:, 0, 2] = 1.0
    tv_blin_x = (1.1 + 1.9 * np.arange(N) / (N - 1)).reshape(N, 1)
    tv_Alin_u = np.ones((N - 1, 1, nu))
    tv_blin_u = np.full((N - 1, 1), 6.0)
    prob = tm.with_tv_linear_constraints(prob, tv_Alin_x, tv_blin_x,
                                         tv_Alin_u, tv_blin_u)
    prob = tm.with_settings(prob, max_iter=20)
    prob = dataclasses.replace(
        prob, spec=dataclasses.replace(prob.spec, en_state_bound=False,
                                       en_input_bound=False))
    assert fused_supported(prob)

    B = 8
    rng = np.random.default_rng(3)
    x0s = jnp.asarray(
        np.asarray([-2.0, -2.0, 1.0] + [0.0] * 9) + 0.1 * rng.uniform(-1, 1, (B, 12)),
        jnp.float32)
    Xref = jnp.tile(jnp.asarray([2.0, 2.0, 4.0] + [0.0] * 9, jnp.float32),
                    (N, 1))
    _check_fused_matches_xla(prob, x0s, Xref)


def test_fused_warm_matches_xla_sequence():
    """solve_fused_warm replays a warm-started XLA solve sequence (the
    external-plant receding-horizon pattern) bitwise in interpret mode,
    including per-lane freeze-at-convergence carry semantics."""
    from tinympc_tpu.kernels import solve_fused_warm, init_carry
    prob = _problem(max_iter=25)
    B, T = 8, 6
    Xref = jnp.tile(jnp.asarray([0, 0, 0.5, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                                jnp.float32), (10, 1))
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(-0.2, 0.2, (B, 12)), jnp.float32)

    state = tm.init_state(prob, (B,))
    carry = init_carry(prob, B)
    saw_mixed = False
    for _ in range(T):
        sol_r, state, _ = tm.solve(prob, state, Xref=Xref, x0=x0)
        sol_f, _res, carry = solve_fused_warm(prob, Xref, None, x0, carry,
                                              tile=B, interpret=True)
        np.testing.assert_array_equal(np.asarray(sol_f.u), np.asarray(sol_r.u))
        np.testing.assert_array_equal(np.asarray(sol_f.iter),
                                      np.asarray(sol_r.iter))
        np.testing.assert_array_equal(
            np.asarray(jnp.moveaxis(carry.vnew, -1, 1)), np.asarray(state.vnew))
        np.testing.assert_array_equal(
            np.asarray(jnp.moveaxis(carry.v, -1, 1)), np.asarray(state.v))
        sv = np.asarray(sol_r.solved)
        saw_mixed |= sv.any() and not sv.all()
        u0 = state.u[0]
        x0 = (jnp.einsum('ij,bj->bi', prob.A, x0)
              + jnp.einsum('ij,bj->bi', prob.B, u0) + prob.f)
    assert saw_mixed, "sequence should mix converged and max-iter lanes"


def test_fused_warm_soc_matches_xla_sequence():
    """Warm solves with SOC families: extra-family duals and the x/u seeds
    ride the carry (admm.cpp:352-376 reads the persistent workspace)."""
    from tinympc_tpu.kernels import solve_fused_warm, init_carry
    s = systems.rocket_landing_20hz()
    N, B, T = 10, 8, 5
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=N, f=s["f"], dtype=jnp.float32)
    prob = tm.with_bounds(
        prob, x_min=np.tile([-5, -5, -0.5, -10, -10, -20.], (N, 1)),
        x_max=np.tile([5, 5, 100, 10, 10, 20.], (N, 1)),
        u_min=-10.0, u_max=105.0)
    prob = tm.with_cones(prob, state_cones=[(0, 3, 0.25)],
                         input_cones=[(0, 3, 0.5)])
    prob = tm.with_settings(prob, max_iter=40, abs_pri_tol=2e-3)
    rng = np.random.default_rng(1)
    xinit = np.asarray([4, 2, 20, -3, 2, -4.5])
    x0 = jnp.asarray(xinit * (1 + 0.1 * rng.uniform(-1, 1, (B, 6))),
                     jnp.float32)
    Uref = jnp.zeros((N - 1, 3), jnp.float32).at[:, 2].set(10.0)

    state = tm.init_state(prob, (B,))
    carry = init_carry(prob, B)
    for t in range(T):
        frac = (jnp.arange(N, dtype=jnp.float32) + t) / 99.0
        Xref = jnp.asarray(xinit, jnp.float32) * (1 - frac[:, None])
        sol_r, state, _ = tm.solve(prob, state, Xref=Xref, Uref=Uref, x0=x0)
        sol_f, _res, carry = solve_fused_warm(prob, Xref, Uref, x0, carry,
                                              tile=B, interpret=True)
        np.testing.assert_array_equal(np.asarray(sol_f.u), np.asarray(sol_r.u))
        np.testing.assert_array_equal(np.asarray(sol_f.iter),
                                      np.asarray(sol_r.iter))
        np.testing.assert_array_equal(
            np.asarray(jnp.moveaxis(carry.gc, -1, 1)), np.asarray(state.gc))
        np.testing.assert_array_equal(
            np.asarray(jnp.moveaxis(carry.x, -1, 1)), np.asarray(state.x))
        u0 = state.u[0]
        x0 = (jnp.einsum('ij,bj->bi', prob.A, x0)
              + jnp.einsum('ij,bj->bi', prob.B, u0) + prob.f)


def test_fused_supported_gate():
    prob = _problem()
    assert fused_supported(prob)
    # SOC / hyperplane specs are fused-supported since v2.
    assert fused_supported(tm.with_cones(prob, input_cones=[(0, 3, 0.5)]))
    # Adaptive rho is fused (test_fused_adaptive); with_settings auto-attaches
    # the sensitivities the kernel telescopes the Taylor update through.
    adaptive = tm.with_settings(prob, adaptive_rho=True)
    assert fused_supported(adaptive)
    # Stripped sensitivities -> unsupported (nothing to telescope through).
    import dataclasses
    bare = adaptive.replace(cache=dataclasses.replace(
        adaptive.cache, dKinf_drho=None, dPinf_drho=None,
        dC1_drho=None, dC2_drho=None))
    assert not fused_supported(bare)
    # Local consensus groups are fused (in-kernel lane butterfly); only a
    # named mesh axis (cross-shard pmean) stays on the XLA path.
    consensus = tm.with_consensus(prob)
    assert fused_supported(consensus)
    sharded = tm.with_consensus(prob, axis_name="scen")
    assert not fused_supported(sharded)
    with pytest.raises(ValueError):
        solve_fused(bare, None, None, jnp.zeros((8, 12), jnp.float32))
    # Consensus x0s must carry the (n_groups, group, nx) structure with a
    # power-of-two group.
    with pytest.raises(ValueError):
        solve_fused(consensus, None, None, jnp.zeros((8, 12), jnp.float32),
                    interpret=True)
    with pytest.raises(ValueError):
        solve_fused(consensus, None, None, jnp.zeros((2, 3, 12), jnp.float32),
                    interpret=True)


def _consensus_case(ng, G, max_iter=60, rho_c=None):
    prob = tm.with_consensus(_problem(max_iter=max_iter), rho_c=rho_c)
    rng = np.random.default_rng(7)
    x0s = jnp.asarray(rng.uniform(-0.3, 0.3, (ng, G, 12)), jnp.float32)
    Xref = jnp.tile(jnp.asarray([0, 0, 0.5, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                                jnp.float32), (10, 1))
    return prob, x0s, Xref


def _check_consensus_fused(ng, G, **kw):
    prob, x0s, Xref = _consensus_case(ng, G, **kw)
    sol_ref, st_ref, _ = tm.solve(prob, tm.init_state(prob, (ng, G)),
                                  Xref=Xref, x0=x0s)
    sol_f, res = solve_fused(prob, Xref, None, x0s, tile=ng * G,
                             interpret=True)
    assert sol_f.x.shape == (10, ng, G, 12)
    np.testing.assert_allclose(np.asarray(sol_f.x), np.asarray(sol_ref.x),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(sol_f.u), np.asarray(sol_ref.u),
                               atol=2e-4)
    it_f, it_r = np.asarray(sol_f.iter), np.asarray(sol_ref.iter)
    assert np.all(np.abs(it_f - it_r) <= 1)
    # Lanes the kernel reports converged passed the consensus-residual gate:
    # u[0] within 2*abs_pri_tol of its group mean.
    u0 = np.asarray(sol_f.u[0])                 # (ng, G, nu)
    solved = np.asarray(sol_f.solved)
    spread = np.ptp(u0, axis=1).max(-1)         # (ng,)
    group_solved = solved.all(axis=1)
    assert np.all(spread[group_solved] < 2 * prob.settings.abs_pri_tol + 1e-5)
    return sol_f


def test_fused_consensus_warm_sequence():
    """Warm-started consensus solves: the consensus dual rides the carry,
    the slack re-seeds from the carried u[0] (admm.seed_extra_slacks), and
    the sequence replays the XLA warm path (group-mean association differs
    at round-off, so tolerance + iteration-count comparison)."""
    from tinympc_tpu.kernels import solve_fused_warm, init_carry
    ng, G, T = 2, 4, 4
    prob, x0s, Xref = _consensus_case(ng, G, max_iter=40, rho_c=50.0)
    state = tm.init_state(prob, (ng, G))
    carry = init_carry(prob, ng * G)
    assert carry.zc0 is not None and carry.u is not None
    for t in range(T):
        sol_r, state, _ = tm.solve(prob, state, Xref=Xref, x0=x0s)
        sol_f, _res, carry = solve_fused_warm(prob, Xref, None, x0s, carry,
                                              tile=ng * G, interpret=True)
        np.testing.assert_allclose(np.asarray(sol_f.u), np.asarray(sol_r.u),
                                   atol=5e-4, err_msg=f"step {t}")
        it_f, it_r = np.asarray(sol_f.iter), np.asarray(sol_r.iter)
        assert np.all(np.abs(it_f - it_r) <= 2), (t, it_f, it_r)
        # The carry mirrors the XLA workspace fields.
        np.testing.assert_allclose(
            np.asarray(carry.zc0.T.reshape(ng, G, -1)),
            np.asarray(state.zc0new), atol=5e-4)
        np.testing.assert_allclose(
            np.asarray(carry.yc0.T.reshape(ng, G, -1)),
            np.asarray(state.yc0), atol=5e-4)
        u0 = state.u[0]
        x0s = (jnp.einsum("ij,...j->...i", prob.A, x0s)
               + jnp.einsum("ij,...j->...i", prob.B, u0) + prob.f)


def test_fused_consensus_matches_xla_interpret():
    """Scenario groups as lane segments: the in-kernel butterfly mean must
    reproduce the XLA consensus path (mean over the last batch axis)."""
    _check_consensus_fused(ng=2, G=4)


def test_fused_consensus_single_group():
    """One group spanning the whole tile exercises the full-lane-mean path."""
    _check_consensus_fused(ng=1, G=8)


def test_fused_consensus_converges_tight():
    """With the exact prox at rho_c=100 the groups converge with a common
    u[0] (the with_consensus capability claim, at fused-kernel speed)."""
    sol = _check_consensus_fused(ng=2, G=2, rho_c=100.0, max_iter=500)
    assert np.asarray(sol.solved).all()
    assert np.ptp(np.asarray(sol.u[0]), axis=1).max() < 5e-3


def test_fused_bf16x3_matches_highest():
    """matmul_precision="high" routes the kernel through the hand-rolled
    3-pass bf16 scheme (Mosaic has no HIGH dot precision). ~16 mantissa
    bits: solutions agree with the f32-accurate path to well inside the
    termination tolerance, iteration counts mostly match."""
    import dataclasses
    prob = _problem(max_iter=40)
    B = 16
    rng = np.random.default_rng(2)
    x0s = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 12)), jnp.float32)
    Xref = jnp.tile(jnp.asarray([0, 0, 0.5, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                                jnp.float32), (10, 1))
    hi = prob   # default settings: "highest"
    lo = prob.replace(settings=dataclasses.replace(
        prob.settings, matmul_precision="high"))
    sol_hi, _ = solve_fused(hi, Xref, None, x0s, tile=B, interpret=True)
    sol_lo, _ = solve_fused(lo, Xref, None, x0s, tile=B, interpret=True)
    np.testing.assert_allclose(np.asarray(sol_lo.u), np.asarray(sol_hi.u),
                               atol=5e-4)
    it_l, it_h = np.asarray(sol_lo.iter), np.asarray(sol_hi.iter)
    assert (it_l == it_h).mean() >= 0.8


def test_resolve_chain_split_hoist_wins_over_bad_env(monkeypatch):
    """TINYMPC_SWEEP_HOIST forces k=1 even when a TINYMPC_CHAIN_SPLIT
    that doesn't divide the tile is also set (round-5 advisor fix: the
    override must short-circuit before divisibility validation)."""
    from tinympc_tpu.kernels import admm_pallas as ap
    monkeypatch.setenv("TINYMPC_CHAIN_SPLIT", "3")
    monkeypatch.setattr(ap, "SWEEP_HOIST", True)
    assert ap._resolve_chain_split(None, 256) == 1
    assert ap._resolve_chain_split(3, 256) == 1
    monkeypatch.setattr(ap, "SWEEP_HOIST", False)
    with pytest.raises(ValueError, match="chain_split"):
        ap._resolve_chain_split(None, 256)


def test_coarse_schedule_handover_bitwise_on_cpu():
    """Mixed-precision schedule (Settings.coarse_iters): on CPU the
    DEFAULT matmul precision is f32-exact, so with matmul_precision
    "highest" phase A computes the identical arithmetic to the precise
    loop — the scheduled solve must be bitwise equal to the unscheduled
    one. This pins the phase handover: ping-pong parity, the dvgN carry,
    and iters/done bookkeeping across the loop boundary."""
    prob = _problem(max_iter=60, check_termination=5,
                    matmul_precision="highest")
    B = 16
    rng = np.random.default_rng(3)
    scales = np.linspace(0.05, 0.45, B)[:, None]
    x0s = jnp.asarray(rng.uniform(-1, 1, (B, 12)) * scales, jnp.float32)
    sol0, res0 = jax.jit(lambda x: solve_fused(
        prob, None, None, x, tile=B, interpret=True))(x0s)
    probc = tm.with_settings(prob, coarse_iters=20)
    solc, resc = jax.jit(lambda x: solve_fused(
        probc, None, None, x, tile=B, interpret=True))(x0s)
    np.testing.assert_array_equal(np.asarray(solc.iter), np.asarray(sol0.iter))
    np.testing.assert_array_equal(np.asarray(solc.solved),
                                  np.asarray(sol0.solved))
    np.testing.assert_array_equal(np.asarray(solc.x), np.asarray(sol0.x))
    np.testing.assert_array_equal(np.asarray(solc.u), np.asarray(sol0.u))
    np.testing.assert_array_equal(np.asarray(resc), np.asarray(res0))


def test_coarse_schedule_solutions_meet_tolerances():
    """With "high" precision + a coarse phase, solved lanes' residuals
    still satisfy the termination tolerances (the check measures actual
    iterates, whatever arithmetic produced them) and iteration counts
    stay on the check_termination grid."""
    prob = _problem(max_iter=100, check_termination=5,
                    matmul_precision="high")
    probc = tm.with_settings(prob, coarse_iters=30)
    B = 16
    rng = np.random.default_rng(4)
    scales = np.linspace(0.05, 0.4, B)[:, None]
    x0s = jnp.asarray(rng.uniform(-1, 1, (B, 12)) * scales, jnp.float32)
    sol, res = jax.jit(lambda x: solve_fused(
        probc, None, None, x, tile=B, interpret=True))(x0s)
    solved = np.asarray(sol.solved)
    assert solved.any(), "premise: some lanes must converge"
    r = np.asarray(res)
    assert (r[:2, solved] < prob.settings.abs_pri_tol + 1e-6).all()
    assert (r[2:4, solved] < prob.settings.abs_dua_tol + 1e-6).all()
    it = np.asarray(sol.iter)
    assert (it[solved] % 5 == 0).all()


def test_coarse_schedule_rejected_off_fused_path():
    """The XLA and streamed paths reject the schedule rather than
    silently ignoring it."""
    prob = _problem(max_iter=20, coarse_iters=10)
    x0 = jnp.zeros(12, jnp.float32)
    with pytest.raises(ValueError, match="coarse_iters"):
        tm.solve(prob, tm.init_state(prob), x0=x0)
    from tinympc_tpu.kernels import solve_fused_streamed
    with pytest.raises(ValueError, match="coarse_iters"):
        solve_fused_streamed(prob, None, None,
                             jnp.zeros((8, 12), jnp.float32), interpret=True)


def test_lane_vmem_budget_device_aware(monkeypatch):
    """Round 5: the auto-tile VMEM budget derives from the device kind
    with the v5e boundary as calibration — env override wins, 128 MiB-
    class chips take the calibrated value, 16 MiB-class cores scale it,
    unknown TPU kinds fail loudly with the override named."""
    from tinympc_tpu.kernels import admm_pallas as ap

    class FakeDev:
        def __init__(self, kind):
            self.device_kind = kind

    def fake_devices(kind):
        return lambda: [FakeDev(kind)]

    monkeypatch.setenv("TINYMPC_VMEM_BUDGET_MIB", "12")
    assert ap.lane_vmem_budget() == 12 * 2**20
    monkeypatch.delenv("TINYMPC_VMEM_BUDGET_MIB")
    import jax as _jax
    monkeypatch.setattr(_jax, "devices", fake_devices("TPU v5 lite"))
    assert ap.lane_vmem_budget() == ap._V5E_CALIBRATED_BUDGET
    monkeypatch.setattr(_jax, "devices", fake_devices("TPU v5p"))
    assert ap.lane_vmem_budget() == ap._V5E_CALIBRATED_BUDGET
    monkeypatch.setattr(_jax, "devices", fake_devices("TPU v3"))
    assert ap.lane_vmem_budget() == ap._V5E_CALIBRATED_BUDGET * 16 // 128
    monkeypatch.setattr(_jax, "devices", fake_devices("cpu"))
    assert ap.lane_vmem_budget() == ap._V5E_CALIBRATED_BUDGET
    monkeypatch.setattr(_jax, "devices", fake_devices("TPU v99 mega"))
    with pytest.raises(ValueError, match="TINYMPC_VMEM_BUDGET_MIB"):
        ap.lane_vmem_budget()


def test_solve_fused_multi_validation():
    """solve_fused_multi (the recorded single-launch experiment) guards
    its preconditions: shared spec/settings and setup rho, no consensus,
    even bucket split."""
    from tinympc_tpu.kernels import solve_fused_multi
    p1 = _problem(max_iter=10)
    p2 = _problem(max_iter=20)
    x0 = jnp.zeros((8, 12), jnp.float32)
    with pytest.raises(ValueError, match="spec/settings"):
        solve_fused_multi([p1, p2], x0, tile=4, interpret=True)
    s = systems.quadrotor_20hz()
    p3 = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=7.7, N=10,
                  dtype=jnp.float32)
    p3 = tm.with_bounds(p3, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
    p3 = tm.with_settings(p3, max_iter=10)
    with pytest.raises(ValueError, match="rho"):
        solve_fused_multi([p1, p3], x0, tile=4, interpret=True)
    with pytest.raises(ValueError, match="consensus"):
        solve_fused_multi([tm.with_consensus(p1, rho_c=10.0)] * 2,
                          jnp.zeros((2, 4, 12), jnp.float32),
                          interpret=True)
    with pytest.raises(ValueError, match="equal"):
        solve_fused_multi([p1, p1, p1], jnp.zeros((8, 12), jnp.float32),
                          tile=4, interpret=True)

    # And the happy path matches per-system direct solves on CPU.
    from tinympc_tpu.kernels import solve_fused
    rng = np.random.default_rng(9)
    x0s = jnp.asarray(rng.uniform(-0.3, 0.3, (8, 12)), jnp.float32)
    pA = _problem(max_iter=15)
    sol_m, res_m = solve_fused_multi([pA, pA], x0s, tile=4, interpret=True)
    sol_d, _ = jax.jit(lambda x: solve_fused(pA, None, None, x, tile=4,
                                             interpret=True))(x0s)
    np.testing.assert_array_equal(np.asarray(sol_m.iter),
                                  np.asarray(sol_d.iter))
    np.testing.assert_allclose(np.asarray(sol_m.x), np.asarray(sol_d.x),
                               atol=5e-5)
