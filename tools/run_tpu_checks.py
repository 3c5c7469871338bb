#!/usr/bin/env python
"""On-TPU verification lane: re-checks on the real chip what the CPU test
suite can only check in interpret mode.

The pytest suite pins jax to CPU (tests/conftest.py) so CI needs no TPU;
the claims that are *about* the chip — fused-kernel-vs-XLA bit parity
(kernels/admm_pallas.py module docstring), the bf16x3 precision mode's
convergence statistics, warm-start carry semantics, compaction equality —
are verified here instead. Run on a machine with a TPU attached:

    python tools/run_tpu_checks.py            # ~2-4 min incl. compiles

Prints one PASS/FAIL line per check and exits non-zero on any failure.
"""
import sys
import traceback
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_RESULTS = []


def check(name):
    def deco(fn):
        _RESULTS.append((name, fn))
        return fn
    return deco


def _quadrotor(max_iter=100, N=10, **settings):
    import jax.numpy as jnp
    import tinympc_tpu as tm
    from tinympc_tpu import systems
    s = systems.quadrotor_20hz()
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=N, dtype=jnp.float32)
    prob = tm.with_bounds(prob, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
    return tm.with_settings(prob, max_iter=max_iter, **settings)


def _x0s(B, scale=0.3, seed=0):
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-scale, scale, (B, 12)), jnp.float32)


@check("fused kernel vs XLA path: bit-identical solutions (box family)")
def check_fused_bit_parity():
    """The admm_pallas docstring claims bit-identical solutions, iteration
    counts, solved flags, and residuals vs admm.solve on-chip at 'default'
    precision (both paths run the MXU's single-pass bf16 matmul). At
    'highest', XLA's and Mosaic's multi-pass f32 dots round differently —
    there the claim is maxdiff below f32 round-off at iterate magnitude
    and >=99%% identical per-lane iteration counts (docs/PARITY.md)."""
    import tinympc_tpu as tm
    from tinympc_tpu.kernels import solve_fused
    B = 256
    x0s = _x0s(B)

    prob = _quadrotor(max_iter=60, matmul_precision="default")
    sol_ref, st_ref, _ = tm.solve(prob, tm.init_state(prob, (B,)), x0=x0s)
    sol_f, res = solve_fused(prob, None, None, x0s, tile=B)
    assert np.array_equal(np.asarray(sol_f.iter), np.asarray(sol_ref.iter)), \
        "iteration counts differ (default precision)"
    assert np.array_equal(np.asarray(sol_f.solved), np.asarray(sol_ref.solved))
    assert np.array_equal(np.asarray(sol_f.x), np.asarray(sol_ref.x)), \
        f"max |dx| = {np.abs(np.asarray(sol_f.x) - np.asarray(sol_ref.x)).max()}"
    assert np.array_equal(np.asarray(sol_f.u), np.asarray(sol_ref.u))
    assert np.array_equal(np.asarray(res[0]), np.asarray(st_ref.pri_res_state))

    prob_h = _quadrotor(max_iter=60, matmul_precision="highest")
    sol_rh, _, _ = tm.solve(prob_h, tm.init_state(prob_h, (B,)), x0=x0s)
    sol_fh, _ = solve_fused(prob_h, None, None, x0s, tile=B)
    dx = np.abs(np.asarray(sol_fh.x) - np.asarray(sol_rh.x)).max()
    assert dx < 1e-4, f"highest-precision max |dx| = {dx}"
    same_iter = np.mean(np.asarray(sol_fh.iter) == np.asarray(sol_rh.iter))
    assert same_iter >= 0.99, f"iteration agreement {same_iter:.3f}"


@check("fused kernel vs XLA path: SOC family (rocket landing)")
def check_fused_soc_parity():
    import jax.numpy as jnp
    import tinympc_tpu as tm
    from tinympc_tpu import systems
    from tinympc_tpu.kernels import solve_fused
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
    prob = tm.with_settings(prob, max_iter=40, abs_pri_tol=2e-3,
                            matmul_precision="highest")
    B = 128
    rng = np.random.default_rng(1)
    x0s = jnp.asarray(np.asarray([4, 2, 20, -3, 2, -4.5])
                      * (1 + 0.1 * rng.uniform(-1, 1, (B, 6))), jnp.float32)
    frac = jnp.arange(N, dtype=jnp.float32) / 99.0
    Xref = jnp.asarray([4, 2, 20, -3, 2, -4.5], jnp.float32) \
        * (1 - frac[:, None])
    sol_ref, _, _ = tm.solve(prob, tm.init_state(prob, (B,)), Xref=Xref,
                             x0=x0s)
    sol_f, _ = solve_fused(prob, Xref, None, x0s, tile=B)
    assert np.array_equal(np.asarray(sol_f.iter), np.asarray(sol_ref.iter))
    dx = np.abs(np.asarray(sol_f.x) - np.asarray(sol_ref.x)).max()
    # The SOC sqrt/divide chains may round differently between Mosaic and
    # XLA; anything beyond f32 round-off at these magnitudes (~20) is real.
    assert dx < 1e-4, f"max |dx| = {dx}"


@check("bf16x3 'high' mode: convergence statistics track 'highest'")
def check_bf16x3_convergence():
    """matmul_precision='high' (hand-rolled 3-pass bf16, ~16 mantissa bits)
    must reproduce the f32-accurate path's convergence behavior: same
    solved set up to a small margin, iteration counts within a few."""
    from tinympc_tpu.kernels import solve_fused
    B = 2048
    x0s = _x0s(B, scale=0.4, seed=2)
    sols = {}
    for prec in ("highest", "high"):
        prob = _quadrotor(max_iter=100, matmul_precision=prec)
        sol, _ = solve_fused(prob, None, None, x0s, tile=B)
        sols[prec] = sol
    sv_hi = np.asarray(sols["highest"].solved)
    sv_3x = np.asarray(sols["high"].solved)
    disagree = float(np.mean(sv_hi != sv_3x))
    assert disagree < 0.02, f"solved-set disagreement {disagree:.3%}"
    both = sv_hi & sv_3x
    di = np.abs(np.asarray(sols["highest"].iter)[both].astype(np.int64)
                - np.asarray(sols["high"].iter)[both].astype(np.int64))
    assert np.median(di) <= 2, f"median iteration delta {np.median(di)}"
    du = np.abs(np.asarray(sols["highest"].u)[:, both]
                - np.asarray(sols["high"].u)[:, both]).max()
    assert du < 5e-3, f"max |du| on solved problems = {du}"


@check("warm-start carry: fused warm sequence == XLA warm sequence")
def check_warm_sequence():
    """Three receding-horizon steps with an external plant: the fused
    warm path (FusedCarry) must match the XLA path's persistent-state
    sequence bit-for-bit ('highest' precision)."""
    import jax.numpy as jnp
    import tinympc_tpu as tm
    from tinympc_tpu.kernels import init_carry, solve_fused_warm
    prob = _quadrotor(max_iter=50, matmul_precision="default")
    B = 128
    x0s = _x0s(B, scale=0.2, seed=3)
    A, Bm = jnp.asarray(prob.A), jnp.asarray(prob.B)

    state = tm.init_state(prob, (B,))
    carry = init_carry(prob, B)
    xk_ref = xk_fused = x0s
    for step in range(3):
        sol_r, state, _ = tm.solve(prob, state, x0=xk_ref)
        sol_f, _, carry = solve_fused_warm(prob, None, None, xk_fused, carry,
                                           tile=B)
        assert np.array_equal(np.asarray(sol_f.iter), np.asarray(sol_r.iter)), \
            f"step {step}: iteration counts differ"
        assert np.array_equal(np.asarray(sol_f.u), np.asarray(sol_r.u)), \
            f"step {step}"
        xk_ref = xk_ref @ A.T + sol_r.u[0] @ Bm.T
        xk_fused = xk_fused @ A.T + sol_f.u[0] @ Bm.T


@check("compaction: solve_fused_compact bitwise == one long fused solve")
def check_compact_on_chip():
    from tinympc_tpu.kernels import solve_fused, solve_fused_compact
    prob = _quadrotor(max_iter=200)
    B = 1024
    rng = np.random.default_rng(4)
    import jax.numpy as jnp
    scales = np.linspace(0.05, 0.5, B)[:, None]
    x0s = jnp.asarray(rng.uniform(-1, 1, (B, 12)) * scales, jnp.float32)
    sol_l, res_l = solve_fused(prob, None, None, x0s, tile=B)
    sol_c, res_c = solve_fused_compact(prob, None, None, x0s, chunk=50)
    assert np.array_equal(np.asarray(sol_c.iter), np.asarray(sol_l.iter))
    assert np.array_equal(np.asarray(sol_c.solved), np.asarray(sol_l.solved))
    assert np.array_equal(np.asarray(sol_c.x), np.asarray(sol_l.x))
    assert np.array_equal(np.asarray(res_c), np.asarray(res_l))


@check("streamed long-horizon kernel: bit-identical to XLA path (N=64)")
def check_streamed_parity():
    """kernels/admm_stream keeps trajectories HBM-resident and streams
    the horizon in pipelined chunks; on-chip it must reproduce the XLA
    path exactly at 'default' precision, like the resident kernel."""
    import tinympc_tpu as tm
    from tinympc_tpu.kernels import solve_fused_streamed
    prob = _quadrotor(max_iter=40, N=64, matmul_precision="default")
    B = 256
    x0s = _x0s(B, seed=6)
    sol_ref, st_ref, _ = tm.solve(prob, tm.init_state(prob, (B,)), x0=x0s)
    sol_s, res = solve_fused_streamed(prob, None, None, x0s)
    assert np.array_equal(np.asarray(sol_s.iter), np.asarray(sol_ref.iter))
    assert np.array_equal(np.asarray(sol_s.solved),
                          np.asarray(sol_ref.solved))
    assert np.array_equal(np.asarray(sol_s.x), np.asarray(sol_ref.x)), \
        f"max |dx| = {np.abs(np.asarray(sol_s.x) - np.asarray(sol_ref.x)).max()}"
    assert np.array_equal(np.asarray(res[0]),
                          np.asarray(st_ref.pri_res_state))


@check("streamed kernel SOC family: bit-identical to XLA path (rocket)")
def check_streamed_soc_parity():
    import jax.numpy as jnp
    import tinympc_tpu as tm
    from tinympc_tpu import systems
    from tinympc_tpu.kernels import solve_fused_streamed
    N = 64
    s = systems.rocket_landing_20hz()
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=N, f=s["f"], dtype=jnp.float32)
    prob = tm.with_bounds(
        prob, x_min=np.tile([-5.0, -5.0, -0.5, -10, -10, -20.0], (N, 1)),
        x_max=np.tile([5.0, 5.0, 100.0, 10, 10, 20.0], (N, 1)),
        u_min=-10.0, u_max=105.0)
    prob = tm.with_cones(prob, state_cones=[(0, 3, 0.25)],
                         input_cones=[(0, 3, 0.5)])
    prob = tm.with_settings(prob, max_iter=30, abs_pri_tol=2e-3,
                            matmul_precision="default")
    B = 128
    rng = np.random.default_rng(9)
    x0s = jnp.asarray(np.array([4, 2, 20, -3, 2, -4.5])
                      * rng.uniform(0.9, 1.1, (B, 1)), jnp.float32)
    Xref = jnp.asarray(np.linspace([4, 2, 20, -3, 2, -4.5], np.zeros(6), N),
                       jnp.float32)
    Uref = jnp.zeros((N - 1, 3), jnp.float32).at[:, 2].set(10.0)
    sol_r, _, _ = tm.solve(prob, tm.init_state(prob, (B,)), Xref=Xref,
                           Uref=Uref, x0=x0s)
    sol_s, _ = solve_fused_streamed(prob, Xref, Uref, x0s)
    assert np.array_equal(np.asarray(sol_s.iter), np.asarray(sol_r.iter))
    dx = np.abs(np.asarray(sol_s.x) - np.asarray(sol_r.x)).max()
    # SOC sqrt/divide chains may round differently between Mosaic and XLA
    # (same tolerance story as the resident kernel's SOC check).
    assert dx < 1e-4, f"max |dx| = {dx}"


@check("streamed kernel hyperplane families: bit-identical to XLA path")
def check_streamed_hyperplanes():
    import jax.numpy as jnp
    import tinympc_tpu as tm
    from tinympc_tpu.kernels import solve_fused_streamed
    N = 64
    prob = _quadrotor(max_iter=30, N=N, matmul_precision="default")
    a = np.zeros(12); a[2] = 1.0
    prob = tm.with_linear_constraints(prob, Alin_x=a[None], blin_x=[0.4],
                                      Alin_u=np.ones((1, 4)), blin_u=[1.2])
    Atv = np.tile(a, (N, 1, 1))
    btv = np.linspace(0.6, 0.3, N)[:, None]
    prob = tm.with_tv_linear_constraints(prob, tv_Alin_x=Atv, tv_blin_x=btv)
    B = 128
    x0s = _x0s(B, scale=0.3, seed=10)
    Xref = jnp.tile(jnp.asarray([0, 0, 1.0] + [0.0] * 9, jnp.float32),
                    (N, 1))
    sol_r, _, _ = tm.solve(prob, tm.init_state(prob, (B,)), Xref=Xref,
                           x0=x0s)
    sol_s, _ = solve_fused_streamed(prob, Xref, None, x0s)
    assert np.array_equal(np.asarray(sol_s.iter), np.asarray(sol_r.iter))
    assert np.array_equal(np.asarray(sol_s.x), np.asarray(sol_r.x)), \
        f"max |dx| = {np.abs(np.asarray(sol_s.x) - np.asarray(sol_r.x)).max()}"


@check("streamed kernel consensus groups: matches XLA path (N=64)")
def check_streamed_consensus():
    import jax.numpy as jnp
    import tinympc_tpu as tm
    from tinympc_tpu.kernels import solve_fused_streamed
    N, ng, G = 64, 16, 8
    prob = tm.with_consensus(_quadrotor(max_iter=100, N=N,
                                        matmul_precision="highest"))
    rng = np.random.default_rng(13)
    x0s = jnp.asarray(rng.uniform(-0.3, 0.3, (ng, G, 12)), jnp.float32)
    Xref = jnp.tile(jnp.asarray([0, 0, 0.5] + [0.0] * 9, jnp.float32),
                    (N, 1))
    sol_r, _, _ = tm.solve(prob, tm.init_state(prob, (ng, G)), Xref=Xref,
                           x0=x0s)
    sol_s, _ = solve_fused_streamed(prob, Xref, None, x0s, tile=ng * G)
    du = np.abs(np.asarray(sol_s.u) - np.asarray(sol_r.u)).max()
    # The in-kernel one-hot segment mean sums lanes in a different order
    # than XLA's group-axis mean; round-off level differences only.
    assert du < 1e-4, f"max |du| = {du}"
    it_s, it_r = np.asarray(sol_s.iter), np.asarray(sol_r.iter)
    assert np.mean(np.abs(it_s - it_r) <= 1) >= 0.99


@check("streamed warm sequence: tracks the XLA persistent-state sequence")
def check_streamed_warm_sequence():
    import jax.numpy as jnp
    import tinympc_tpu as tm
    from tinympc_tpu.kernels import init_carry, solve_fused_streamed_warm
    prob = _quadrotor(max_iter=50, N=64, matmul_precision="default")
    B = 128
    x0s = _x0s(B, scale=0.2, seed=8)
    A, Bm = jnp.asarray(prob.A), jnp.asarray(prob.B)

    state = tm.init_state(prob, (B,))
    carry = init_carry(prob, B)
    xk_ref = xk_s = x0s
    for step in range(3):
        sol_r, state, _ = tm.solve(prob, state, x0=xk_ref)
        sol_s, _, carry = solve_fused_streamed_warm(prob, None, None, xk_s,
                                                    carry, tile=B)
        assert np.array_equal(np.asarray(sol_s.iter),
                              np.asarray(sol_r.iter)), \
            f"step {step}: iteration counts differ"
        assert np.array_equal(np.asarray(sol_s.u), np.asarray(sol_r.u)), \
            f"step {step}"
        xk_ref = xk_ref @ A.T + sol_r.u[0] @ Bm.T
        xk_s = xk_s @ A.T + sol_s.u[0] @ Bm.T


@check("sweep-hoist scheduling variant: bit-identical to baseline order")
def check_sweep_hoist_parity():
    """TINYMPC_SWEEP_HOIST reorders the backward sweep's dot emission
    (admm_pallas._make_kernel); same expressions, same operands — the
    results must be bit-equal, only the schedule may differ."""
    from tinympc_tpu.kernels import admm_pallas
    from tinympc_tpu.kernels import solve_fused
    prob = _quadrotor(max_iter=60, matmul_precision="high")
    B = 256
    x0s = _x0s(B, seed=7)
    old = admm_pallas.SWEEP_HOIST
    try:
        admm_pallas.SWEEP_HOIST = False
        sol_a, _ = solve_fused(prob, None, None, x0s, tile=B)
        admm_pallas.SWEEP_HOIST = True
        sol_b, _ = solve_fused(prob, None, None, x0s, tile=B)
    finally:
        admm_pallas.SWEEP_HOIST = old
    assert np.array_equal(np.asarray(sol_a.x), np.asarray(sol_b.x))
    assert np.array_equal(np.asarray(sol_a.iter), np.asarray(sol_b.iter))


@check("streamed compaction: bitwise == one long streamed solve (N=64)")
def check_streamed_compaction():
    import jax.numpy as jnp
    import tinympc_tpu as tm
    from tinympc_tpu.kernels import make_compact_solver, solve_fused_streamed
    prob = _quadrotor(max_iter=200, N=64)
    B = 512
    rng = np.random.default_rng(12)
    scales = np.linspace(0.05, 0.5, B)[:, None]
    x0s = jnp.asarray(rng.uniform(-1, 1, (B, 12)) * scales, jnp.float32)
    sol_l, res_l = solve_fused_streamed(prob, None, None, x0s, tile=B)
    solver = make_compact_solver(prob, chunk=50, tile=B, min_batch=B,
                                 backend="streamed")
    sol_c, res_c = solver(x0s)
    assert np.array_equal(np.asarray(sol_c.iter), np.asarray(sol_l.iter))
    assert np.array_equal(np.asarray(sol_c.solved), np.asarray(sol_l.solved))
    assert np.array_equal(np.asarray(sol_c.x), np.asarray(sol_l.x))
    assert np.array_equal(np.asarray(res_c), np.asarray(res_l))


@check("adaptive rho: fused in-kernel subsystem matches XLA path")
def check_adaptive_parity():
    import tinympc_tpu as tm
    from tinympc_tpu.kernels import solve_fused
    prob = _quadrotor(max_iter=60, adaptive_rho=True,
                      matmul_precision="highest")
    B = 256
    x0s = _x0s(B, scale=0.35, seed=5)
    sol_ref, st_ref, _ = tm.solve(prob, tm.init_state(prob, (B,)), x0=x0s)
    sol_f, res = solve_fused(prob, None, None, x0s, tile=B)
    assert np.array_equal(np.asarray(sol_f.iter), np.asarray(sol_ref.iter))
    du = np.abs(np.asarray(sol_f.u) - np.asarray(sol_ref.u)).max()
    # The telescoped Taylor update reorders the axpy vs the XLA path's
    # materialised per-problem cache; f32 round-off level differences only.
    assert du < 1e-5, f"max |du| = {du}"


@check("streamed warm family sequence: bitwise == resident warm (SOC)")
def check_streamed_warm_families():
    """Warm starts for extra families on the streamed path: duals + x/u
    trajectories ride the FusedCarry and the per-solve slack re-seed
    matches the resident kernel's — at 'default' precision a 3-step
    receding-horizon SOC sequence must agree bitwise with
    solve_fused_warm."""
    import jax.numpy as jnp
    import tinympc_tpu as tm
    from tinympc_tpu.kernels import init_carry, solve_fused_warm
    from tinympc_tpu.kernels.admm_stream import solve_fused_streamed_warm
    prob = _quadrotor(max_iter=40, N=64, matmul_precision="default")
    prob = tm.with_cones(prob, input_cones=[(0, 3, 0.6)])
    prob = tm.with_settings(prob, max_iter=40,
                            matmul_precision="default")
    B = 128
    x0 = _x0s(B, seed=13)
    cf, cs = init_carry(prob, B), init_carry(prob, B)
    for t in range(3):
        sol_f, _, cf = solve_fused_warm(prob, None, None, x0, cf)
        sol_s, _, cs = solve_fused_streamed_warm(prob, None, None, x0, cs)
        assert np.array_equal(np.asarray(sol_s.iter),
                              np.asarray(sol_f.iter)), f"step {t} iters"
        assert np.array_equal(np.asarray(sol_s.u),
                              np.asarray(sol_f.u)), (
            f"step {t}: max |du| = "
            f"{np.abs(np.asarray(sol_s.u) - np.asarray(sol_f.u)).max()}")
        assert np.array_equal(np.asarray(cs.x), np.asarray(cf.x)), \
            f"step {t} carry.x"
        u0 = jnp.asarray(sol_s.u[0])
        x0 = (x0 @ jnp.asarray(prob.A).T + u0 @ jnp.asarray(prob.B).T
              + jnp.asarray(prob.f))


@check("streamed adaptive rho: bitwise == resident kernel at N=64")
def check_streamed_adaptive_parity():
    """The streamed kernel's chunk-streamed OSQP reductions reproduce the
    resident kernel's whole-trajectory association orders exactly, so the
    two Pallas paths must agree bitwise on chip (x, u, iters, final rho);
    the XLA path agrees to round-off (check_adaptive_parity)."""
    import tinympc_tpu as tm
    from tinympc_tpu.kernels import solve_fused
    from tinympc_tpu.kernels.admm_stream import solve_fused_streamed
    prob = _quadrotor(max_iter=60, N=64, adaptive_rho=True,
                      matmul_precision="high")
    B = 256
    x0s = _x0s(B, scale=0.35, seed=11)
    sol_f, res_f = solve_fused(prob, None, None, x0s)   # auto tiles: the
    sol_s, res_s = solve_fused_streamed(prob, None, None, x0s)  # lanes are
    # independent, so differing tile widths cannot change per-lane bits
    assert res_s.shape[0] == 5
    assert np.array_equal(np.asarray(sol_s.iter), np.asarray(sol_f.iter))
    assert np.array_equal(np.asarray(res_s[4]), np.asarray(res_f[4])), \
        f"max |drho| = {np.abs(np.asarray(res_s[4]) - np.asarray(res_f[4])).max()}"
    assert np.array_equal(np.asarray(sol_s.x), np.asarray(sol_f.x)), \
        f"max |dx| = {np.abs(np.asarray(sol_s.x) - np.asarray(sol_f.x)).max()}"
    rho_moved = np.abs(np.asarray(res_s[4]) - float(prob.cache.rho))
    assert rho_moved.max() > 1e-3, "rho never adapted — vacuous check"


@check("chain-split sweeps: bitwise == unsplit at every k (round 4)")
def check_chain_split_parity():
    """solve_fused(chain_split=k) cuts the tile's lanes into k groups and
    interleaves their sweep chains; per-lane math is untouched, so any
    k must be bit-identical to k=1 (the measured A/B lives in
    docs/DESIGN.md — splitting lost, the knob stays as the recorded
    experiment)."""
    from tinympc_tpu.kernels import solve_fused
    prob = _quadrotor(max_iter=60, matmul_precision="high")
    B = 512
    x0s = _x0s(B, seed=21)
    sol_1, _ = solve_fused(prob, None, None, x0s, tile=B, chain_split=1)
    sol_4, _ = solve_fused(prob, None, None, x0s, tile=B, chain_split=4)
    assert np.array_equal(np.asarray(sol_1.x), np.asarray(sol_4.x))
    assert np.array_equal(np.asarray(sol_1.iter), np.asarray(sol_4.iter))


@check("strided termination: ct=25 fused bitwise == XLA at same stride")
def check_strided_termination_parity():
    """Round 4 gates the kernel's termination phase with pl.when(checking)
    (the reference's amortised check, admm.cpp:312) — worth ~1.7x at the
    OSQP stride. Both paths at check_termination=25 must stay
    bit-identical at 'default' precision."""
    import tinympc_tpu as tm
    from tinympc_tpu.kernels import solve_fused
    prob = _quadrotor(max_iter=100, matmul_precision="default",
                      check_termination=25)
    B = 256
    x0s = _x0s(B, seed=22)
    sol_r, st_r, _ = tm.solve(prob, tm.init_state(prob, (B,)), x0=x0s)
    sol_f, res = solve_fused(prob, None, None, x0s, tile=B)
    assert np.array_equal(np.asarray(sol_f.iter), np.asarray(sol_r.iter))
    assert np.array_equal(np.asarray(sol_f.x), np.asarray(sol_r.x))
    assert np.array_equal(np.asarray(res[0]), np.asarray(st_r.pri_res_state))


@check("consensus warm sequence: fused carry tracks XLA (round 4)")
def check_consensus_warm_on_chip():
    import jax.numpy as jnp
    import tinympc_tpu as tm
    from tinympc_tpu.kernels import init_carry, solve_fused_warm
    ng, G = 16, 8
    prob = tm.with_consensus(_quadrotor(max_iter=40,
                                        matmul_precision="highest"),
                             rho_c=50.0)
    rng = np.random.default_rng(23)
    x0s = jnp.asarray(rng.uniform(-0.3, 0.3, (ng, G, 12)), jnp.float32)
    Xref = jnp.tile(jnp.asarray([0, 0, 0.5] + [0.0] * 9, jnp.float32),
                    (10, 1))
    state = tm.init_state(prob, (ng, G))
    carry = init_carry(prob, ng * G)
    for t in range(3):
        sol_r, state, _ = tm.solve(prob, state, Xref=Xref, x0=x0s)
        sol_f, _res, carry = solve_fused_warm(prob, Xref, None, x0s, carry,
                                              tile=ng * G)
        du = np.abs(np.asarray(sol_f.u) - np.asarray(sol_r.u)).max()
        assert du < 1e-4, f"step {t}: max |du| = {du}"
        it_f, it_r = np.asarray(sol_f.iter), np.asarray(sol_r.iter)
        assert np.mean(np.abs(it_f - it_r) <= 1) >= 0.99, f"step {t}"
        u0 = state.u[0]
        x0s = (jnp.einsum("ij,...j->...i", jnp.asarray(prob.A), x0s)
               + jnp.einsum("ij,...j->...i", jnp.asarray(prob.B), u0))


@check("guarded adaptive rho (tol>1): streamed bitwise == resident")
def check_guarded_adaptive_parity():
    """The round-4 accumulator guard (virtual rho, commit on tol-fold
    drift) must run identically in both Pallas kernels — bitwise,
    including the final committed rho row."""
    import tinympc_tpu as tm
    from tinympc_tpu.kernels import solve_fused
    from tinympc_tpu.kernels.admm_stream import solve_fused_streamed
    prob = _quadrotor(max_iter=60, N=64, adaptive_rho=True,
                      adaptive_rho_tolerance=2.0, matmul_precision="high")
    B = 256
    x0s = _x0s(B, scale=0.5, seed=24)
    sol_f, res_f = solve_fused(prob, None, None, x0s)
    sol_s, res_s = solve_fused_streamed(prob, None, None, x0s)
    assert np.array_equal(np.asarray(sol_s.iter), np.asarray(sol_f.iter))
    assert np.array_equal(np.asarray(res_s[4]), np.asarray(res_f[4]))
    assert np.array_equal(np.asarray(sol_s.x), np.asarray(sol_f.x))
    # And the guard is not vacuous: committed rho moved for some lane.
    assert np.abs(np.asarray(res_f[4]) - float(prob.cache.rho)).max() > 1e-3


@check("fleet multi-system launch: bucket lanes bitwise == direct solve")
def check_fleet_multi_bitwise():
    """solve_fused_multi steers each batch tile to its own system's
    matrices via BlockSpec index maps; on-chip every tile runs the same
    Mosaic binary a per-system solve_fused would, so bucket lanes must
    be BITWISE equal to the direct solves (round 5, kernels/fleet.py)."""
    import jax.numpy as jnp
    import tinympc_tpu as tm
    from tinympc_tpu import systems
    from tinympc_tpu.kernels import solve_fused, solve_fused_multi
    s = systems.quadrotor_20hz()
    probs = []
    for i in range(4):
        scale = 1.0 + 0.01 * (i - 2)
        A = np.asarray(s["A"]) * np.where(np.eye(12) == 1, 1.0, scale)
        p = tm.setup(A, s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"], N=10,
                     dtype=jnp.float32)
        p = tm.with_bounds(p, x_min=-5.0, x_max=5.0, u_min=-0.5, u_max=0.5)
        probs.append(tm.with_settings(p, max_iter=60,
                                      matmul_precision="high"))
    per = 256
    x0s = _x0s(4 * per)
    sol_m, res_m = solve_fused_multi(probs, x0s, tile=per)
    for i, p in enumerate(probs):
        sol_d, res_d = solve_fused(p, None, None,
                                   x0s[i * per:(i + 1) * per], tile=per)
        lo, hi = i * per, (i + 1) * per
        assert np.array_equal(np.asarray(sol_m.x[:, lo:hi]),
                              np.asarray(sol_d.x)), f"system {i} x"
        assert np.array_equal(np.asarray(sol_m.iter[lo:hi]),
                              np.asarray(sol_d.iter)), f"system {i} iters"
        assert np.array_equal(np.asarray(res_m[:, lo:hi]),
                              np.asarray(res_d)), f"system {i} res"


@check("mixed-precision schedule: coarse=0 bitwise; coarse=50 stats parity")
def check_coarse_schedule():
    """Settings.coarse_iters (round 5): with the schedule disabled the
    kernel trace is byte-identical (bitwise vs the pre-schedule
    behavior is pinned by every other check here); enabled, solved lanes
    still satisfy the tolerances and convergence stats stay within the
    parity bar on a real batch (docs/DESIGN.md 'Mixed-precision
    schedule')."""
    import jax.numpy as jnp
    import tinympc_tpu as tm
    from tinympc_tpu.kernels import solve_fused
    B = 4096
    # The exact headline workload (bench.py): N=20 with the hover Xref,
    # which makes the batch HARD (~3% solve within the cap) — the
    # schedule's applicability condition is a long convergence tail
    # relative to the coarse phase. Easier populations — even the same
    # dims as a regulator (Xref=None solves ~40%) or N=10 (~37%) — lose
    # 2-3pp solved to the coarse phase and keep coarse_iters=0
    # (docs/DESIGN.md 'Mixed-precision schedule').
    import jax.numpy as _jnp
    prob = _quadrotor(max_iter=100, N=20, check_termination=25,
                      matmul_precision="high")
    Xref = _jnp.tile(_jnp.asarray([0, 0, 1.0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                                  _jnp.float32), (20, 1))
    x0s = _x0s(B, scale=0.5, seed=3)
    sol0, res0 = solve_fused(prob, Xref, None, x0s, tile=B)
    probc = tm.with_settings(prob, coarse_iters=50)
    solc, resc = solve_fused(probc, Xref, None, x0s, tile=B)
    sv0 = np.asarray(sol0.solved); svc = np.asarray(solc.solved)
    assert abs(svc.mean() - sv0.mean()) < 0.008, \
        f"solved drift {svc.mean() - sv0.mean():+.4f}"
    same = (np.asarray(solc.iter) == np.asarray(sol0.iter)).mean()
    assert same >= 0.9, f"identical lanes {same:.3f}"
    r = np.asarray(resc)
    assert (r[:2, svc] < prob.settings.abs_pri_tol + 1e-6).all()
    assert (r[2:4, svc] < prob.settings.abs_dua_tol + 1e-6).all()


@check("two-level consensus: sharded driver bitwise == manual frozen chunks")
def check_two_level_consensus():
    """shard.solve_fused_consensus_sharded on a 1-device mesh must be
    BITWISE identical to manually chaining frozen-consensus warm chunks
    with the exact outer mean/dual updates between them (round 5) —
    this pins the consensus_frozen kernel mode and the driver's outer
    update/commit-gate on real hardware."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import tinympc_tpu as tm
    from tinympc_tpu import shard
    from tinympc_tpu.kernels import init_carry, solve_fused_warm

    prob = tm.with_consensus(
        _quadrotor(max_iter=40, N=10, check_termination=5), rho_c=50.0)
    ng, G = 2, 8
    B = ng * G
    rng = np.random.default_rng(2)
    x0s = jnp.asarray(rng.uniform(-0.2, 0.2, (ng, G, 12)), jnp.float32)

    mesh1 = shard.make_mesh(devices=jax.devices()[:1])
    sol_s, res_s = shard.solve_fused_consensus_sharded(
        prob, None, None, x0s, mesh1, sync_stride=5)

    # Manual reference: same chunks, host-side outer updates + gate.
    p5 = prob.replace(settings=dataclasses.replace(prob.settings,
                                                   max_iter=5))
    carry = init_carry(prob, B)
    nu = prob.spec.nu
    out = None
    used = 0
    for _ in range(8):
        u0 = carry.u[0]
        cand = u0 + carry.yc0
        gm = cand.reshape(nu, ng, G).mean(axis=2)
        zc0 = jnp.repeat(gm[:, :, None], G, axis=2).reshape(nu, B)
        carry = dataclasses.replace(carry, zc0=zc0,
                                    yc0=carry.yc0 + u0 - zc0)
        sol, res, carry = solve_fused_warm(
            prob.replace(settings=p5.settings), None, None, x0s, carry,
            final=True, consensus_frozen=True)
        fu = sol.u.reshape(9, B, 4)
        fx = sol.x.reshape(10, B, 12)
        fit = sol.iter.reshape(B)
        fsv = sol.solved.reshape(B)
        if out is None:
            out = [fx, fu, fit + 0, jnp.zeros(B, bool)]
        live = ~out[3]
        out[0] = jnp.where(live[None, :, None], fx, out[0])
        out[1] = jnp.where(live[None, :, None], fu, out[1])
        out[2] = jnp.where(live, used + fit, out[2])
        u0_eff = jnp.where((out[3] | fsv)[:, None], out[1][0],
                           carry.u[0].T)
        lm2 = u0_eff.reshape(ng, G, nu).mean(axis=1)
        cres = jnp.max(jnp.abs(u0_eff - jnp.repeat(lm2, G, axis=0)),
                       axis=1)
        out[3] = out[3] | (fsv & (cres < prob.settings.abs_pri_tol))
        used += 5
        if bool(jnp.all(out[3])):
            break
    assert np.array_equal(np.asarray(sol_s.iter).reshape(B),
                          np.asarray(out[2]))
    assert np.array_equal(np.asarray(sol_s.solved).reshape(B),
                          np.asarray(out[3]))
    assert np.array_equal(np.asarray(sol_s.x).reshape(10, B, 12),
                          np.asarray(out[0]))


@check("precision ladder: 'highest' tail recovers noise-floor stragglers")
def check_precision_ladder():
    """make_compact_solver(precise_tail=...) warm-resumes lanes the
    bf16x3 noise floor left unsolved at matmul_precision='highest'
    (round 5, PARITY's solved-fraction decomposition): on a hard batch
    the tail must recover real lanes, their residuals passing the
    tolerances, at far less than the 3x of running everything at
    'highest'."""
    import tinympc_tpu as tm
    from tinympc_tpu.kernels import make_compact_solver
    B = 4096
    prob = _quadrotor(max_iter=300, N=20, check_termination=25,
                      matmul_precision="high")
    import jax.numpy as _jnp
    Xref = _jnp.tile(_jnp.asarray([0, 0, 1.0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                                  _jnp.float32), (20, 1))
    x0s = _x0s(B, scale=0.5, seed=1)
    base = make_compact_solver(prob, chunk=[300])(x0s, Xref)
    tail = make_compact_solver(prob, chunk=[300],
                               precise_tail=300)(x0s, Xref)
    sv_b = np.asarray(base[0].solved)
    sv_t = np.asarray(tail[0].solved)
    rec = sv_t & ~sv_b
    assert rec.sum() > 0, "ladder recovered no lanes on the hard batch"
    r = np.asarray(tail[1])
    assert (r[:4, rec] < prob.settings.abs_pri_tol + 1e-6).all()
    np.testing.assert_array_equal(np.asarray(tail[0].x)[:, sv_b],
                                  np.asarray(base[0].x)[:, sv_b])


@check("closed loop: fused bitwise == XLA scan, shift off AND on")
def check_closed_loop_shift_parity():
    """The fused closed-loop kernel (incl. the round-5 shift-warm-start
    mode) must be BITWISE equal to the XLA closed loop at 'default'
    precision on-chip — plant states, applied inputs, and per-step
    iteration counts, for both shift_warm settings."""
    import jax.numpy as _jnp
    import tinympc_tpu as tm
    from tinympc_tpu.closed_loop import closed_loop
    from tinympc_tpu.kernels import closed_loop_fused
    N, B, T = 10, 256, 12
    prob = _quadrotor(max_iter=25, N=N, matmul_precision="default")
    Xref = _jnp.zeros((N, 12), _jnp.float32).at[:, 2].set(0.5)
    x0s = _x0s(B, scale=0.2)
    for shift in (False, True):
        xs_r, us_r, it_r, _, _ = closed_loop(
            prob, tm.init_state(prob, (B,)), x0s, Xref, T,
            shift_warm=shift)
        xs_f, us_f, it_f, _ = closed_loop_fused(
            prob, Xref, x0s, T, shift_warm=shift, tile=B)
        assert np.array_equal(np.asarray(xs_f), np.asarray(xs_r)), \
            f"shift={shift} x"
        assert np.array_equal(np.asarray(us_f), np.asarray(us_r)), \
            f"shift={shift} u"
        assert np.array_equal(np.asarray(it_f), np.asarray(it_r)), \
            f"shift={shift} iters"


def main():
    import jax
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")
    if dev.platform not in ("tpu", "axon"):
        print("WARNING: no TPU attached — these checks verify chip "
              "behavior and mean little on CPU.", file=sys.stderr)
    failures = 0
    for name, fn in _RESULTS:
        try:
            fn()
            print(f"PASS  {name}")
        except Exception:
            failures += 1
            print(f"FAIL  {name}")
            traceback.print_exc()
    print(f"{len(_RESULTS) - failures}/{len(_RESULTS)} on-TPU checks passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
