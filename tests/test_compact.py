"""solve_fused_compact: to-convergence solves with lane compaction.

Box-family problems with fixed rho must be *bitwise* identical to one
long fused solve — the FusedCarry hands a chunk boundary over exactly
(kernels/compact.py module docstring). Extra families re-seed slack at
chunk boundaries (reference tiny_solve-again semantics, admm.cpp:352-376)
so for them we assert solution validity rather than bitwise equality.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import jax

import tinympc_tpu as tm
from tinympc_tpu import systems
from tinympc_tpu.kernels import solve_fused, solve_fused_compact


def _solve_long(prob, Xref, Uref, x0s, B):
    """Jitted single long fused solve. solve_fused_compact jits its
    phases (one dispatch per launch); in Pallas interpret mode on CPU the
    kernel body compiles differently under jit than eagerly (FMA/fusion),
    so the bitwise reference must be jitted the same way. On TPU both
    forms run the identical Mosaic binary (tools/run_tpu_checks.py pins
    eager-vs-compact equality on the chip)."""
    fn = jax.jit(lambda x0: solve_fused(prob, Xref, Uref, x0, tile=B,
                                        interpret=True))
    return fn(x0s)


def _quadrotor(max_iter=60, **settings):
    s = systems.quadrotor_20hz()
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=10, dtype=jnp.float32)
    prob = tm.with_bounds(prob, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
    return tm.with_settings(prob, max_iter=max_iter, **settings)


def _mixed_x0s(B, scale_lo=0.05, scale_hi=0.45, seed=0):
    """Initial states spanning easy (few iterations) to hard (hits the
    budget), so compaction actually re-packs between chunks."""
    rng = np.random.default_rng(seed)
    scales = np.linspace(scale_lo, scale_hi, B)[:, None]
    return jnp.asarray(rng.uniform(-1, 1, (B, 12)) * scales, jnp.float32)


def test_compact_bitwise_matches_long_solve():
    prob = _quadrotor(max_iter=60)
    B = 16
    x0s = _mixed_x0s(B)

    sol_long, res_long = _solve_long(prob, None, None, x0s, B)
    sol_c, res_c = solve_fused_compact(prob, None, None, x0s, chunk=15,
                                       tile=None, min_batch=4,
                                       interpret=True)

    # The workload must be genuinely mixed for this test to mean anything.
    it = np.asarray(sol_long.iter)
    assert it.min() <= 15 and it.max() > 30, f"workload not mixed: {it}"

    np.testing.assert_array_equal(np.asarray(sol_c.iter), it)
    np.testing.assert_array_equal(np.asarray(sol_c.solved),
                                  np.asarray(sol_long.solved))
    np.testing.assert_array_equal(np.asarray(sol_c.x), np.asarray(sol_long.x))
    np.testing.assert_array_equal(np.asarray(sol_c.u), np.asarray(sol_long.u))
    np.testing.assert_array_equal(np.asarray(res_c), np.asarray(res_long))


def test_compact_budget_not_multiple_of_chunk():
    """A final partial chunk (total % chunk != 0) must still land on the
    exact budget."""
    prob = _quadrotor(max_iter=37)
    B = 8
    x0s = _mixed_x0s(B, scale_lo=0.3, scale_hi=0.5)
    sol_long, _ = _solve_long(prob, None, None, x0s, B)
    sol_c, _ = solve_fused_compact(prob, None, None, x0s, chunk=10,
                                   min_batch=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(sol_c.iter),
                                  np.asarray(sol_long.iter))
    np.testing.assert_array_equal(np.asarray(sol_c.x),
                                  np.asarray(sol_long.x))
    assert np.asarray(sol_c.iter).max() <= 37


def test_compact_all_converge_early_stops():
    """When every problem converges in the first chunk, no further phases
    run and iteration counts match the long solve."""
    prob = _quadrotor(max_iter=100)
    B = 8
    x0s = _mixed_x0s(B, scale_lo=0.01, scale_hi=0.05)
    sol_long, _ = _solve_long(prob, None, None, x0s, B)
    assert np.asarray(sol_long.solved).all()
    sol_c, _ = solve_fused_compact(prob, None, None, x0s, chunk=50,
                                   min_batch=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(sol_c.iter),
                                  np.asarray(sol_long.iter))
    assert np.asarray(sol_c.solved).all()


def test_compact_soc_solutions_valid():
    """Rocket-landing SOC: chunk boundaries re-seed cone slack (reference
    tiny_solve-again semantics) — solutions must still satisfy the
    termination tolerances and the cone constraints."""
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
    prob = tm.with_settings(prob, max_iter=80, abs_pri_tol=2e-3)
    B = 8
    rng = np.random.default_rng(1)
    x0s = jnp.asarray(
        np.asarray([4, 2, 20, -3, 2, -4.5])
        * (1 + 0.1 * rng.uniform(-1, 1, (B, 6))), jnp.float32)
    frac = jnp.arange(N, dtype=jnp.float32) / 99.0
    Xref = jnp.asarray([4, 2, 20, -3, 2, -4.5], jnp.float32) \
        * (1 - frac[:, None])
    Uref = jnp.zeros((N - 1, 3), jnp.float32).at[:, 2].set(10.0)
    sol, res = solve_fused_compact(prob, Xref, Uref, x0s, chunk=20,
                                   min_batch=4, interpret=True)
    solved = np.asarray(sol.solved)
    assert solved.any()
    r = np.asarray(res)
    assert (r[:4, solved] < prob.settings.abs_pri_tol + 1e-6).all()
    # Cone feasibility of the projected state iterates: ||x[:2]|| <= mu*x[2].
    x = np.asarray(sol.x)[:, solved, :]
    lhs = np.linalg.norm(x[..., :2], axis=-1)
    assert (lhs <= 0.25 * x[..., 2] + 1e-4).all()


def test_compact_adaptive_rho_runs():
    prob = _quadrotor(max_iter=40, adaptive_rho=True)
    B = 8
    x0s = _mixed_x0s(B, scale_lo=0.1, scale_hi=0.4, seed=1)
    sol, res = solve_fused_compact(prob, None, None, x0s, chunk=10,
                                   min_batch=4, interpret=True)
    assert res.shape[0] == 5            # final-rho row rides along
    rho = np.asarray(res[4])
    assert (rho >= prob.settings.adaptive_rho_min - 1e-6).all()
    assert (rho <= prob.settings.adaptive_rho_max + 1e-6).all()
    solved = np.asarray(sol.solved)
    r = np.asarray(res)
    if solved.any():
        assert (r[:4, solved] < prob.settings.abs_pri_tol + 1e-6).all()


def test_compact_rejects_bad_chunk():
    prob = _quadrotor(max_iter=40, check_termination=5)
    x0s = _mixed_x0s(4)
    with pytest.raises(ValueError, match="chunk"):
        solve_fused_compact(prob, None, None, x0s, chunk=7, interpret=True)


def test_compact_phase_schedule():
    """chunk may be a phase-length schedule ([10, 40]: compact once, then
    run survivors to the cap) — still bitwise equal to one long solve."""
    prob = _quadrotor(max_iter=60)
    B = 16
    x0s = _mixed_x0s(B)
    sol_long, _ = _solve_long(prob, None, None, x0s, B)
    sol_c, _ = solve_fused_compact(prob, None, None, x0s, chunk=[10, 40],
                                   min_batch=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(sol_c.iter),
                                  np.asarray(sol_long.iter))
    np.testing.assert_array_equal(np.asarray(sol_c.x),
                                  np.asarray(sol_long.x))


def test_compact_segmented_matches_unsegmented():
    """segment= caps on-chip residency for fleet-scale batches; results
    must equal the unsegmented solver's exactly (segments are independent
    problems)."""
    from tinympc_tpu.kernels import make_compact_solver
    prob = _quadrotor(max_iter=40)
    B = 32
    x0s = _mixed_x0s(B)
    # Same tile width in both runs: CPU interpret mode lowers the lane
    # dots differently per width (vectorization order), which would break
    # bitwise comparison for reasons unrelated to segmentation.
    sol_u, res_u = make_compact_solver(prob, chunk=20, tile=8, min_batch=8,
                                       interpret=True)(x0s)
    sol_s, res_s = make_compact_solver(prob, chunk=20, tile=8, min_batch=8,
                                       segment=8, interpret=True)(x0s)
    np.testing.assert_array_equal(np.asarray(sol_s.x), np.asarray(sol_u.x))
    np.testing.assert_array_equal(np.asarray(sol_s.u), np.asarray(sol_u.u))
    np.testing.assert_array_equal(np.asarray(sol_s.iter),
                                  np.asarray(sol_u.iter))
    np.testing.assert_array_equal(np.asarray(res_s), np.asarray(res_u))


def test_compact_streamed_backend_bitwise():
    """backend='streamed' phases: the chunked long-horizon solve must be
    bitwise identical to one long streamed solve (same chunk-boundary
    hand-over argument as the resident backend)."""
    from tinympc_tpu.kernels import make_compact_solver, solve_fused_streamed
    s = systems.quadrotor_20hz()
    N = 24
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=N, dtype=jnp.float32)
    prob = tm.with_bounds(prob, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
    prob = tm.with_settings(prob, max_iter=60)
    B = 16
    x0s = _mixed_x0s(B)
    sol_l, res_l = jax.jit(lambda x: solve_fused_streamed(
        prob, None, None, x, tile=B, chunk=8, interpret=True))(x0s)
    solver = make_compact_solver(prob, chunk=20, tile=B, min_batch=B,
                                 backend="streamed", interpret=True)
    sol_c, res_c = solver(x0s)
    np.testing.assert_array_equal(np.asarray(sol_c.iter),
                                  np.asarray(sol_l.iter))
    np.testing.assert_array_equal(np.asarray(sol_c.x), np.asarray(sol_l.x))
    np.testing.assert_array_equal(np.asarray(res_c), np.asarray(res_l))


def test_compact_auto_backend_picks_streamed_at_long_n():
    from tinympc_tpu.kernels import make_compact_solver
    from tinympc_tpu.kernels.admm_pallas import max_tile
    s = systems.quadrotor_20hz()
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=256, dtype=jnp.float32)
    prob = tm.with_bounds(prob, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
    prob = tm.with_settings(prob, max_iter=40)
    assert max_tile(prob, warm=True, final=True) < 1024, \
        "test premise: the resident tile must collapse at this N"
    # auto resolves to streamed without raising; a single phase runs.
    solver = make_compact_solver(prob, chunk=20, tile=8, min_batch=8,
                                 backend="auto", interpret=True)
    rng = np.random.default_rng(1)
    x0s = jnp.asarray(rng.uniform(-0.1, 0.1, (8, 12)), jnp.float32)
    sol, res = solver(x0s)
    assert sol.x.shape == (256, 8, 12)


def test_compact_streamed_adaptive_matches_resident():
    """Adaptive-rho compaction through the streamed backend (round 3):
    per-phase the streamed and resident kernels share every association
    order, so the whole chunked adaptive solve must agree across
    backends — identical per-problem iteration counts and solved masks,
    iterates to jit-compilation round-off (XLA:CPU fuses FMAs
    differently per program; on real hardware both kernels lower through
    Mosaic and agree bitwise, pinned by tools/run_tpu_checks.py's
    streamed-adaptive check), including the final-rho residual row and
    the restarted per-chunk adaptation clock."""
    from tinympc_tpu.kernels import make_compact_solver
    prob = _quadrotor(max_iter=40, adaptive_rho=True)
    B = 16
    x0s = _mixed_x0s(B)
    kw = dict(chunk=20, tile=B, min_batch=B, interpret=True)
    sol_r, res_r = make_compact_solver(prob, backend="resident", **kw)(x0s)
    sol_s, res_s = make_compact_solver(prob, backend="streamed", **kw)(x0s)
    assert res_s.shape[0] == 5
    np.testing.assert_array_equal(np.asarray(sol_s.iter),
                                  np.asarray(sol_r.iter))
    np.testing.assert_array_equal(np.asarray(sol_s.solved),
                                  np.asarray(sol_r.solved))
    np.testing.assert_allclose(np.asarray(sol_s.x), np.asarray(sol_r.x),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(res_s[4]), np.asarray(res_r[4]),
                               rtol=1e-4)


@pytest.mark.parametrize("backend", ["resident", "streamed"])
def test_compact_consensus_groups_match_manual_chunked(backend):
    """Consensus compaction (round 4): groups compact as units and the
    masked scatter freezes first-convergence outputs. The semantic
    reference is the same chunk schedule run WITHOUT compaction (all
    groups relaunched every phase, host-side first-convergence freeze):
    live groups see identical carries either way, so results must match
    exactly."""
    from tinympc_tpu.kernels import (init_carry, make_compact_solver,
                                     solve_fused_warm)
    prob = tm.with_consensus(_quadrotor(max_iter=60), rho_c=50.0)
    ng, G = 4, 4
    B = ng * G
    rng = np.random.default_rng(2)
    scales = np.linspace(0.05, 0.5, ng)[:, None, None]
    x0s = jnp.asarray(rng.uniform(-1, 1, (ng, G, 12)) * scales, jnp.float32)
    Xref = jnp.zeros((10, 12), jnp.float32).at[:, 2].set(0.5)

    solver = make_compact_solver(prob, chunk=20, tile=B, min_batch=G,
                                 backend=backend, interpret=True)
    sol_c, res_c = solver(x0s, Xref)

    # Manual chunked reference: same phases, no compaction, host freeze
    # (same backend, so the comparison is exact).
    pphase = tm.with_settings(prob, max_iter=20)
    carry = init_carry(prob, B)
    if backend == "streamed":
        from tinympc_tpu.kernels import solve_fused_streamed_warm
        phase = jax.jit(lambda x0, c: solve_fused_streamed_warm(
            pphase, Xref, None, x0, c, tile=B, chunk=5, interpret=True))
    else:
        phase = jax.jit(lambda x0, c: solve_fused_warm(
            pphase, Xref, None, x0, c, tile=B, final=True, interpret=True))
    out = None
    used = 0
    for _ in range(3):
        sol, res, carry = phase(x0s, carry)
        fx = sol.x.reshape(10, B, 12)
        fu = sol.u.reshape(9, B, 4)
        fit = sol.iter.reshape(B)
        fsv = sol.solved.reshape(B)
        fres = res.reshape(res.shape[0], B)
        if out is None:
            out = [fx, fu, fit + 0, fsv, fres]
        else:
            live = ~out[3]
            out[0] = jnp.where(live[None, :, None], fx, out[0])
            out[1] = jnp.where(live[None, :, None], fu, out[1])
            out[2] = jnp.where(live, used + fit, out[2])
            out[4] = jnp.where(live[None, :], fres, out[4])
            out[3] = out[3] | fsv
        used += 20

    np.testing.assert_array_equal(np.asarray(sol_c.x.reshape(10, B, 12)),
                                  np.asarray(out[0]))
    np.testing.assert_array_equal(np.asarray(sol_c.u.reshape(9, B, 4)),
                                  np.asarray(out[1]))
    np.testing.assert_array_equal(np.asarray(sol_c.iter.reshape(B)),
                                  np.asarray(out[2]))
    np.testing.assert_array_equal(np.asarray(sol_c.solved.reshape(B)),
                                  np.asarray(out[3]))
    # Solved lanes satisfy the consensus gate: u[0] near its group mean.
    u0 = np.asarray(sol_c.u[0])                     # (ng, G, nu)
    gsolved = np.asarray(sol_c.solved).all(axis=1)
    spread = np.ptp(u0, axis=1).max(-1)
    assert np.all(spread[gsolved] < 2 * prob.settings.abs_pri_tol + 1e-5)


@pytest.mark.parametrize("backend", ["resident", "streamed"])
def test_compact_consensus_staggered_multi_round(backend):
    """Regression (round 5): consensus compaction with a live set that
    shrinks MORE THAN ONCE. After the first re-pack, carry slot i holds
    group g_groups[i], so liveness indices must be positional in the
    narrowed order, not global group ids — the round-4 code indexed the
    narrowed ``g_groups``/carry with global ids, which raised (or
    silently gathered the wrong groups' carries) once an early group
    converged before a later phase. Staggered per-group difficulty forces
    >=2 compaction rounds; the semantic reference is the same manual
    chunked no-compaction loop as above."""
    from tinympc_tpu.kernels import (init_carry, make_compact_solver,
                                     solve_fused_warm)
    prob = tm.with_consensus(
        _quadrotor(max_iter=120, abs_pri_tol=2e-2, abs_dua_tol=2e-2),
        rho_c=50.0)
    ng, G = 8, 4
    B = ng * G
    rng = np.random.default_rng(7)
    # Difficulty staggered so groups drop out across several chunks (the
    # premise assert below verifies >=3 distinct group finish buckets).
    scales = np.asarray([0.005, 0.01, 0.02, 0.03, 0.05, 0.08, 0.12,
                         0.2])[:, None, None]
    x0s = jnp.asarray(rng.uniform(-1, 1, (ng, G, 12)) * scales, jnp.float32)
    Xref = None

    solver = make_compact_solver(prob, chunk=10, tile=B, min_batch=G,
                                 backend=backend, interpret=True)
    sol_c, res_c = solver(x0s, Xref)

    # Premise: group completion must be staggered across >=3 chunk
    # buckets so the live set shrinks at >=2 distinct compaction rounds.
    git = np.asarray(sol_c.iter).reshape(ng, G).max(axis=1)
    buckets = np.unique(np.ceil(git / 10.0))
    assert buckets.size >= 3, f"workload not staggered: {git}"

    pphase = tm.with_settings(prob, max_iter=10)
    carry = init_carry(prob, B)
    if backend == "streamed":
        from tinympc_tpu.kernels import solve_fused_streamed_warm
        phase = jax.jit(lambda x0, c: solve_fused_streamed_warm(
            pphase, Xref, None, x0, c, tile=B, chunk=5, interpret=True))
    else:
        phase = jax.jit(lambda x0, c: solve_fused_warm(
            pphase, Xref, None, x0, c, tile=B, final=True, interpret=True))
    out = None
    used = 0
    for _ in range(12):
        sol, res, carry = phase(x0s, carry)
        fx = sol.x.reshape(10, B, 12)
        fu = sol.u.reshape(9, B, 4)
        fit = sol.iter.reshape(B)
        fsv = sol.solved.reshape(B)
        fres = res.reshape(res.shape[0], B)
        if out is None:
            out = [fx, fu, fit + 0, fsv, fres]
        else:
            live = ~out[3]
            out[0] = jnp.where(live[None, :, None], fx, out[0])
            out[1] = jnp.where(live[None, :, None], fu, out[1])
            out[2] = jnp.where(live, used + fit, out[2])
            out[4] = jnp.where(live[None, :], fres, out[4])
            out[3] = out[3] | fsv
        used += 10

    # Iteration counts and solved masks are exact; iterates get tight
    # allclose only — once the live set shrinks, compact phases compile
    # at a narrower batch than the manual full-width relaunch, and on
    # XLA:CPU two different jitted programs fuse FMAs differently
    # (~1e-6 drift; on real TPU hardware both lower through Mosaic and
    # agree bitwise).
    np.testing.assert_array_equal(np.asarray(sol_c.iter.reshape(B)),
                                  np.asarray(out[2]))
    np.testing.assert_array_equal(np.asarray(sol_c.solved.reshape(B)),
                                  np.asarray(out[3]))
    np.testing.assert_allclose(np.asarray(sol_c.x.reshape(10, B, 12)),
                               np.asarray(out[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(sol_c.u.reshape(9, B, 4)),
                               np.asarray(out[1]), atol=1e-4)


def test_compact_precise_tail_recovers_stragglers():
    """Precision-recovery ladder (round 5): lanes unsolved at the base
    budget warm-resume at matmul_precision='highest' for up to
    precise_tail extra iterations. The mechanism contract: base-solved
    lanes are untouched (bitwise vs the tail-free solver), recovered
    lanes report iter > max_iter and satisfy the tolerances, and the
    solved fraction can only grow. (The noise-floor recovery itself is
    chip behavior — tools/run_tpu_checks.py's ladder check and the
    PARITY decomposition.)"""
    from tinympc_tpu.kernels import make_compact_solver
    prob = _quadrotor(max_iter=30, matmul_precision="high")
    B = 16
    x0s = _mixed_x0s(B)
    base = make_compact_solver(prob, chunk=15, tile=B, min_batch=4,
                               interpret=True)(x0s)
    tail = make_compact_solver(prob, chunk=15, tile=B, min_batch=4,
                               precise_tail=100, interpret=True)(x0s)
    sv_b = np.asarray(base[0].solved)
    sv_t = np.asarray(tail[0].solved)
    assert (~sv_b).any(), "premise: the base budget must leave stragglers"
    assert (sv_t & ~sv_b).any(), "tail recovered nothing"
    assert (sv_t | ~sv_b).all()        # solved set only grows
    # Base-solved lanes are untouched.
    np.testing.assert_array_equal(np.asarray(tail[0].x)[:, sv_b],
                                  np.asarray(base[0].x)[:, sv_b])
    np.testing.assert_array_equal(np.asarray(tail[0].iter)[sv_b],
                                  np.asarray(base[0].iter)[sv_b])
    # Recovered lanes: past the nominal budget, within tolerances.
    rec = sv_t & ~sv_b
    assert (np.asarray(tail[0].iter)[rec] > 30).all()
    r = np.asarray(tail[1])
    assert (r[:4, rec] < prob.settings.abs_pri_tol + 1e-6).all()


def test_compact_precise_tail_consensus_groups():
    """The ladder composes with group-unit consensus compaction: live
    groups warm-resume whole at 'highest', frozen lanes stay frozen."""
    from tinympc_tpu.kernels import make_compact_solver
    prob = tm.with_consensus(
        _quadrotor(max_iter=20, abs_pri_tol=2e-2, abs_dua_tol=2e-2,
                   matmul_precision="high"), rho_c=50.0)
    ng, G = 8, 4
    rng = np.random.default_rng(7)
    scales = np.asarray([0.005, 0.01, 0.02, 0.03, 0.05, 0.08, 0.12,
                         0.2])[:, None, None]
    x0s = jnp.asarray(rng.uniform(-1, 1, (ng, G, 12)) * scales, jnp.float32)
    base = make_compact_solver(prob, chunk=10, tile=ng * G, min_batch=G,
                               interpret=True)(x0s)
    tail = make_compact_solver(prob, chunk=10, tile=ng * G, min_batch=G,
                               precise_tail=100, interpret=True)(x0s)
    sv_b = np.asarray(base[0].solved)
    sv_t = np.asarray(tail[0].solved)
    assert (~sv_b).any(), "premise: stragglers must remain at 20 iters"
    assert sv_t.sum() >= sv_b.sum()
    # Frozen (base-solved) lanes keep their first-convergence outputs.
    np.testing.assert_array_equal(np.asarray(tail[0].x)[:, sv_b],
                                  np.asarray(base[0].x)[:, sv_b])


def test_compact_precise_tail_adaptive_rho():
    """The ladder composes with adaptive rho: the tail phase rebuilds
    the kernel at 'highest' with the same sensitivity tables, and the
    per-lane rho rides the carry across the precision change."""
    from tinympc_tpu.kernels import make_compact_solver
    prob = _quadrotor(max_iter=20, adaptive_rho=True,
                      matmul_precision="high")
    B = 8
    x0s = _mixed_x0s(B, scale_lo=0.1, scale_hi=0.45, seed=2)
    base = make_compact_solver(prob, chunk=10, tile=B, min_batch=4,
                               interpret=True)(x0s)
    tail = make_compact_solver(prob, chunk=10, tile=B, min_batch=4,
                               precise_tail=60, interpret=True)(x0s)
    sv_b = np.asarray(base[0].solved)
    sv_t = np.asarray(tail[0].solved)
    assert (~sv_b).any(), "premise: stragglers must remain"
    assert sv_t.sum() >= sv_b.sum()
    assert tail[1].shape[0] == 5            # final-rho row rides along
    rho = np.asarray(tail[1][4])
    assert (rho >= prob.settings.adaptive_rho_min - 1e-6).all()
    rec = sv_t & ~sv_b
    if rec.any():
        r = np.asarray(tail[1])
        assert (r[:4, rec] < prob.settings.abs_pri_tol + 1e-6).all()
