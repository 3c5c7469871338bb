"""Batched-solve invariants.

The framework's core parallelism axis is the problem batch (SURVEY.md §2.4):
a batched solve must reproduce each member's single-problem result exactly —
including per-problem iteration counts, which requires converged problems to
freeze while the rest of the batch keeps iterating.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tinympc_tpu as tm
from tinympc_tpu import systems


def _quadrotor_problem(N=10, **settings):
    s = systems.quadrotor_20hz()
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=N, dtype=jnp.float64)
    prob = tm.with_bounds(prob, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
    return tm.with_settings(prob, max_iter=100, **settings)


def _x0_batch(B, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-0.5, 0.5, (B, 12)))


XREF = jnp.tile(jnp.asarray([0, 0, 1.0, 0, 0, 0, 0, 0, 0, 0, 0, 0]), (10, 1))


def test_batched_equals_single():
    prob = _quadrotor_problem()
    B = 8
    x0s = _x0_batch(B)

    state = tm.init_state(prob, (B,))
    sol_b, st_b, _ = tm.solve(prob, state, Xref=XREF, x0=x0s)

    for i in range(B):
        sol_1, st_1, _ = tm.solve(prob, tm.init_state(prob), Xref=XREF, x0=x0s[i])
        assert int(sol_b.iter[i]) == int(sol_1.iter), f"problem {i} iter"
        assert bool(sol_b.solved[i]) == bool(sol_1.solved)
        np.testing.assert_allclose(sol_b.x[:, i], sol_1.x, atol=1e-12)
        np.testing.assert_allclose(sol_b.u[:, i], sol_1.u, atol=1e-12)
        np.testing.assert_allclose(st_b.pri_res_state[i], st_1.pri_res_state,
                                   atol=1e-12)


def test_batched_identical_problems_bitwise():
    prob = _quadrotor_problem()
    x0 = jnp.asarray([0, 1, 0, 0.2, 0, 0, 0.1, 0, 0, 0, 0, 0])
    x0s = jnp.tile(x0, (4, 1))
    sol_b, _, _ = tm.solve(prob, tm.init_state(prob, (4,)), Xref=XREF, x0=x0s)
    for i in range(1, 4):
        np.testing.assert_array_equal(sol_b.x[:, 0], sol_b.x[:, i])
        assert int(sol_b.iter[0]) == int(sol_b.iter[i])


def test_batched_per_problem_xref():
    prob = _quadrotor_problem()
    B = 3
    x0s = _x0_batch(B, seed=1)
    Xrefs = jnp.stack([XREF * (0.5 * (i + 1)) for i in range(B)], axis=1)  # (N, B, nx)
    sol_b, _, _ = tm.solve(prob, tm.init_state(prob, (B,)), Xref=Xrefs, x0=x0s)
    for i in range(B):
        sol_1, _, _ = tm.solve(prob, tm.init_state(prob), Xref=Xrefs[:, i], x0=x0s[i])
        np.testing.assert_allclose(sol_b.x[:, i], sol_1.x, atol=1e-12)
        assert int(sol_b.iter[i]) == int(sol_1.iter)


def test_batched_adaptive_rho_equals_single():
    prob = _quadrotor_problem(adaptive_rho=True)
    prob = tm.with_sensitivities(prob, systems.crazyflie_sensitivity_tables())
    B = 3
    x0s = _x0_batch(B, seed=2) * 2.0
    sol_b, _, cache_b = tm.solve(prob, tm.init_state(prob, (B,)), Xref=XREF, x0=x0s)
    assert cache_b.rho.shape == (B,)
    for i in range(B):
        sol_1, _, cache_1 = tm.solve(prob, tm.init_state(prob), Xref=XREF, x0=x0s[i])
        np.testing.assert_allclose(sol_b.x[:, i], sol_1.x, atol=1e-12)
        np.testing.assert_allclose(cache_b.rho[i], cache_1.rho, atol=1e-12)
        assert int(sol_b.iter[i]) == int(sol_1.iter)


def test_vmap_heterogeneous_systems():
    """Fleets of *different* systems: vmap over the problem pytree (spec and
    settings stay static/shared)."""
    s = systems.cartpole()
    probs = []
    for scale in (1.0, 1.02):
        A = s["A"] * np.where(np.eye(4) == 1, 1.0, scale)
        p = tm.setup(A, s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"], N=10,
                     dtype=jnp.float64)
        p = tm.with_bounds(p, x_min=-1e17, x_max=1e17, u_min=-1e17, u_max=1e17)
        probs.append(tm.with_settings(p, max_iter=50))

    stacked = jax.tree.map(lambda *ls: jnp.stack(ls), *probs)
    x0 = jnp.asarray([0.5, 0.0, 0.0, 0.0])
    Xref = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (10, 1))

    vsolve = jax.vmap(tm.solve_, in_axes=(0, None, None, None, None))
    sol_v, _, _ = vsolve(stacked, tm.init_state(probs[0]), Xref, None, x0)

    for i, p in enumerate(probs):
        sol_1, _, _ = tm.solve(p, tm.init_state(p), Xref=Xref, x0=x0)
        np.testing.assert_allclose(sol_v.x[i], sol_1.x, atol=1e-10)
        assert int(sol_v.iter[i]) == int(sol_1.iter)


def test_fleet_solver_matches_direct_per_bucket():
    """Heterogeneous fleets at fused-kernel speed (round 5,
    kernels.make_fleet_solver): single-launch bucketed dispatch
    (solve_fused_multi) — each system's lanes must match a direct
    solve_fused of the same gathered batch, and the scatter must route
    every lane to its own system's solution. Iteration counts and
    solved masks are exact; iterates get tight allclose on CPU (the
    one-launch multi-system program fuses FMAs differently than the
    per-bucket program under XLA:CPU; on the chip every tile runs the
    same Mosaic binary)."""
    from tinympc_tpu.kernels import make_fleet_solver, solve_fused
    s = systems.quadrotor_20hz()
    probs = []
    for scale in (1.0, 1.01, 0.99, 1.02):
        A = np.asarray(s["A"]) * np.where(np.eye(12) == 1, 1.0, scale)
        p = tm.setup(A, s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"], N=10,
                     dtype=jnp.float32)
        p = tm.with_bounds(p, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
        probs.append(tm.with_settings(p, max_iter=40))

    B = 64
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 12)), jnp.float32)
    assignments = rng.integers(0, 4, B)
    # Uneven buckets incl. one requiring padding to a power of two.
    assignments[:5] = 3

    solver = make_fleet_solver(probs, tile=64, interpret=True)
    sol, res = solver(assignments, x0s)

    for sys_i in range(4):
        idx = np.flatnonzero(assignments == sys_i)
        k = idx.size
        P = 1 << (k - 1).bit_length()
        pad = np.concatenate([idx, np.full(P - k, idx[0])]) if P > k else idx
        sol_d, res_d = jax.jit(lambda x0, p=probs[sys_i]: solve_fused(
            p, None, None, x0, tile=64, interpret=True))(
                jnp.take(x0s, jnp.asarray(pad), axis=0))
        it_f = np.asarray(sol.iter[idx]); it_d = np.asarray(sol_d.iter[:k])
        # CPU cross-program noise can flip a knife-edge residual check on
        # the odd lane (iter +-1); on-chip the comparison is bitwise
        # (tools/run_tpu_checks.py's fleet check).
        assert np.abs(it_f - it_d).max() <= 1
        same = it_f == it_d
        assert same.mean() >= 0.9, f"too many flipped lanes: {same.mean()}"
        np.testing.assert_array_equal(np.asarray(sol.solved[idx]),
                                      np.asarray(sol_d.solved[:k]))
        for a, b in ((sol.x[:, idx], sol_d.x[:, :k]),
                     (sol.u[:, idx], sol_d.u[:, :k]),
                     (res[:, idx], res_d[:, :k])):
            a, b = np.asarray(a), np.asarray(b)
            np.testing.assert_allclose(np.compress(same, a, axis=1),
                                       np.compress(same, b, axis=1),
                                       atol=5e-5)
            np.testing.assert_allclose(a, b, atol=5e-2)

    # Cross-check one lane per system against the XLA path.
    for sys_i in range(4):
        i = int(np.flatnonzero(assignments == sys_i)[0])
        sol_1, _, _ = tm.solve(probs[sys_i], tm.init_state(probs[sys_i]),
                               x0=x0s[i])
        np.testing.assert_allclose(np.asarray(sol.x[:, i]),
                                   np.asarray(sol_1.x), atol=1e-4)


def test_fleet_solver_validation():
    from tinympc_tpu.kernels import make_fleet_solver
    s = systems.quadrotor_20hz()
    p1 = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"], N=10,
                  dtype=jnp.float32)
    p1 = tm.with_bounds(p1, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
    p2 = tm.with_settings(p1, max_iter=77)      # differing settings
    with pytest.raises(ValueError, match="spec/settings"):
        make_fleet_solver([p1, p2])
    solver = make_fleet_solver([p1])
    with pytest.raises(ValueError, match="assignments"):
        solver(np.zeros(3, int), jnp.zeros((4, 12), jnp.float32))
    with pytest.raises(ValueError, match="out of range"):
        solver(np.full(4, 2), jnp.zeros((4, 12), jnp.float32))


def test_fleet_solver_warm_sequence_matches_direct():
    """Warm fleet solver (round 5): the receding-horizon variant threads
    a fleet-order FusedCarry through bucketed warm launches — each
    system's lanes must track a direct solve_fused_warm sequence of the
    same lanes (iter/solved exact; iterates to CPU cross-program
    noise)."""
    from tinympc_tpu.kernels import (init_carry, make_fleet_solver,
                                     solve_fused_warm)
    s = systems.quadrotor_20hz()
    probs = []
    for scale in (1.0, 1.015):
        A = np.asarray(s["A"]) * np.where(np.eye(12) == 1, 1.0, scale)
        p = tm.setup(A, s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"], N=10,
                     dtype=jnp.float32)
        p = tm.with_bounds(p, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
        probs.append(tm.with_settings(p, max_iter=30))

    B = 16
    rng = np.random.default_rng(1)
    x0s = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 12)), jnp.float32)
    assignments = np.asarray([0, 1] * 8)

    solver = make_fleet_solver(probs, tile=16, warm=True, interpret=True)
    carry = init_carry(probs[0], B)

    # Direct per-system references (same padded gathers as the dispatch).
    refs = {}
    for sys_i in range(2):
        idx = np.flatnonzero(assignments == sys_i)
        refs[sys_i] = (idx, init_carry(probs[sys_i], idx.size),
                       jax.jit(lambda x0, c, p=probs[sys_i]:
                               solve_fused_warm(p, None, None, x0, c,
                                                tile=16, interpret=True)))

    x_cur = x0s
    for step in range(3):
        sol, res, carry = solver(assignments, x_cur, carry)
        for sys_i in range(2):
            idx, c_ref, fn = refs[sys_i]
            sol_d, res_d, c_ref = fn(jnp.take(x_cur, jnp.asarray(idx),
                                              axis=0), c_ref)
            refs[sys_i] = (idx, c_ref, fn)
            np.testing.assert_array_equal(np.asarray(sol.iter[idx]),
                                          np.asarray(sol_d.iter))
            np.testing.assert_array_equal(np.asarray(sol.solved[idx]),
                                          np.asarray(sol_d.solved))
            np.testing.assert_allclose(np.asarray(sol.u[:, idx]),
                                       np.asarray(sol_d.u), atol=5e-5)
        # Advance every plant with its own system's dynamics.
        un = np.asarray(sol.u[0])
        xn = np.empty((B, 12), np.float32)
        for sys_i in range(2):
            idx = np.flatnonzero(assignments == sys_i)
            p = probs[sys_i]
            xn[idx] = (np.asarray(x_cur)[idx] @ np.asarray(p.A).T
                       + un[idx] @ np.asarray(p.B).T + np.asarray(p.f))
        x_cur = jnp.asarray(xn)


def test_fleet_solver_rejects_consensus_specs():
    from tinympc_tpu.kernels import make_fleet_solver
    s = systems.quadrotor_20hz()
    p = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"], N=10,
                 dtype=jnp.float32)
    p = tm.with_bounds(p, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
    with pytest.raises(ValueError, match="consensus"):
        make_fleet_solver([tm.with_consensus(p, rho_c=10.0)])


def test_fleet_solver_adaptive_rho():
    """Bucketed fleets compose with adaptive rho: each bucket's launch
    carries the 5th (final-rho) residual row, scattered into fleet
    order."""
    from tinympc_tpu.kernels import make_fleet_solver
    s = systems.quadrotor_20hz()
    probs = []
    for scale in (1.0, 1.01):
        A = np.asarray(s["A"]) * np.where(np.eye(12) == 1, 1.0, scale)
        p = tm.setup(A, s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"], N=10,
                     dtype=jnp.float32)
        p = tm.with_bounds(p, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
        probs.append(tm.with_settings(p, max_iter=30, adaptive_rho=True))
    B = 16
    rng = np.random.default_rng(5)
    x0s = jnp.asarray(rng.uniform(-0.4, 0.4, (B, 12)), jnp.float32)
    assignments = np.asarray([0, 1] * 8)
    sol, res = make_fleet_solver(probs, tile=16, interpret=True)(
        assignments, x0s)
    assert res.shape[0] == 5
    rho = np.asarray(res[4])
    assert (rho >= probs[0].settings.adaptive_rho_min - 1e-6).all()
    assert (rho <= probs[0].settings.adaptive_rho_max + 1e-6).all()
    assert sol.x.shape == (10, B, 12)
