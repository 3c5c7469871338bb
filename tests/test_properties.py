"""Property-based checks on random problems: whenever the solver reports
convergence, the solution must actually satisfy the contract — projected
feasibility and residuals below tolerance — independent of any golden."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tinympc_tpu as tm


def _random_system(rng, nx, nu):
    # Stable-ish random discrete system
    A = np.eye(nx) + 0.05 * rng.normal(size=(nx, nx))
    A /= max(1.0, np.max(np.abs(np.linalg.eigvals(A))) / 0.99)
    B = 0.1 * rng.normal(size=(nx, nu))
    Q = rng.uniform(0.5, 10.0, nx)
    R = rng.uniform(0.5, 2.0, nu)
    return A, B, Q, R


@pytest.mark.parametrize("seed,nx,nu,N", [(0, 4, 2, 8), (1, 7, 3, 12),
                                          (2, 12, 4, 20), (3, 3, 1, 5)])
def test_solved_implies_feasible_and_converged(seed, nx, nu, N):
    rng = np.random.default_rng(seed)
    A, B, Q, R = _random_system(rng, nx, nu)
    prob = tm.setup(A, B, Q, R, rho=1.0, N=N, dtype=jnp.float64)
    prob = tm.with_bounds(prob, x_min=-10.0, x_max=10.0, u_min=-1.0, u_max=1.0)
    prob = tm.with_settings(prob, max_iter=500)

    Bsz = 16
    x0s = jnp.asarray(rng.uniform(-0.5, 0.5, (Bsz, nx)))
    sol, state, _ = tm.solve(prob, tm.init_state(prob, (Bsz,)), x0=x0s)

    solved = np.asarray(sol.solved)
    assert solved.sum() > 0, "premise: at least some problems converge"

    # Projected solution is feasible w.r.t. the box (admm.cpp:436-437 returns
    # vnew/znew precisely because they are the projected, feasible iterates).
    assert float(jnp.max(jnp.abs(sol.x))) <= 10.0 + 1e-12
    assert float(jnp.max(jnp.abs(sol.u))) <= 1.0 + 1e-12

    # Converged problems report residuals under tolerance.
    for field, tol in (("pri_res_state", 1e-3), ("pri_res_input", 1e-3),
                       ("dua_res_state", 1e-3), ("dua_res_input", 1e-3)):
        res = np.asarray(getattr(state, field))[solved]
        assert np.all(res < tol), f"{field} above tolerance for solved problems"

    # The raw trajectory obeys the dynamics exactly.
    x, u = state.x, state.u
    sim = jnp.einsum("ij,tbj->tbi", prob.A, x[:-1]) \
        + jnp.einsum("ij,tbj->tbi", prob.B, u) + prob.f
    np.testing.assert_allclose(np.asarray(x[1:]), np.asarray(sim), atol=1e-10)


def test_unconstrained_matches_lqr():
    """With inactive bounds and zero reference, the first ADMM iteration's
    rollout is exactly the infinite-horizon LQR policy."""
    rng = np.random.default_rng(7)
    A, B, Q, R = _random_system(rng, 6, 2)
    prob = tm.setup(A, B, Q, R, rho=0.1, N=30, dtype=jnp.float64)
    prob = tm.with_settings(prob, max_iter=1, check_termination=1000)

    x0 = jnp.asarray(rng.uniform(-1, 1, 6))
    sol, state, _ = tm.solve(prob, tm.init_state(prob), x0=x0)

    K = np.asarray(prob.cache.Kinf)
    x = np.asarray(x0)
    for t in range(10):
        u_lqr = -K @ x
        np.testing.assert_allclose(np.asarray(state.u[t]), u_lqr, atol=1e-9)
        x = np.asarray(prob.A) @ x + np.asarray(prob.B) @ u_lqr


def test_bf16x3_sweeps_approximate_f32():
    """The hand-rolled 3-pass bf16 sweep mode (matmul_precision='high',
    admm._b3_*) must track the f32 sweeps to ~16-mantissa-bit accuracy —
    XLA's native bf16_3x does not at these shapes, which is why the
    scheme is hand-rolled (types.matmul_precision_ctx)."""
    import numpy as np
    import jax.numpy as jnp
    import tinympc_tpu as tm
    from tinympc_tpu import admm, systems

    s = systems.quadrotor_20hz()
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=10, dtype=jnp.float32)
    state = tm.init_state(prob, (4,))
    rng = np.random.default_rng(0)
    state = state.replace(
        q=jnp.asarray(rng.normal(size=state.q.shape), jnp.float32),
        r=jnp.asarray(rng.normal(size=state.r.shape), jnp.float32),
        p=state.p.at[-1].set(jnp.asarray(rng.normal(size=(4, 12)),
                                         jnp.float32)),
        x=state.x.at[0].set(jnp.asarray(rng.normal(size=(4, 12)),
                                        jnp.float32)))

    ref = admm.backward_pass(prob.cache, prob.B, state)
    b3 = admm.backward_pass(prob.cache, prob.B, state, mm3=True)
    scale = float(np.abs(np.asarray(ref.p)).max())
    np.testing.assert_allclose(np.asarray(b3.p), np.asarray(ref.p),
                               atol=2e-4 * scale)
    np.testing.assert_allclose(np.asarray(b3.d), np.asarray(ref.d),
                               atol=2e-4 * scale)

    ref2 = admm.forward_pass(prob.A, prob.B, prob.f, prob.cache, ref)
    b32 = admm.forward_pass(prob.A, prob.B, prob.f, prob.cache, ref,
                            mm3=True)
    scale2 = float(np.abs(np.asarray(ref2.x)).max())
    np.testing.assert_allclose(np.asarray(b32.x), np.asarray(ref2.x),
                               atol=2e-4 * scale2)


def test_doc_number_checker_catches_drift(tmp_path):
    """tools/check_doc_numbers.py is the mechanized single-source-of-
    truth rule (round 5): it must pass on the checked-in tree and FAIL
    when a quoted doc number is doctored."""
    import shutil
    import subprocess
    import sys
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    out = subprocess.run([sys.executable,
                          os.path.join(root, "tools",
                                       "check_doc_numbers.py")],
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stdout + out.stderr

    # Doctor a copy of the tree's doc artifacts and re-run against it.
    work = tmp_path / "repo"
    work.mkdir()
    for name in ("README.md", "STATUS.md", "BENCH_RESULTS.json"):
        shutil.copy(os.path.join(root, name), work / name)
    (work / "docs").mkdir()
    for name in ("DESIGN.md", "SERVING.md", "PARITY.md"):
        shutil.copy(os.path.join(root, "docs", name), work / "docs" / name)
    (work / "tools").mkdir()
    shutil.copy(os.path.join(root, "tools", "check_doc_numbers.py"),
                work / "tools" / "check_doc_numbers.py")
    for fn in os.listdir(root):
        if fn.startswith("BENCH_r") and fn.endswith(".json"):
            shutil.copy(os.path.join(root, fn), work / fn)
    readme = (work / "README.md").read_text()
    import re
    doctored = re.sub(
        r"tinympc-tpu, fused Pallas kernel:\s*[\d,]+ solves/s",
        "tinympc-tpu, fused Pallas kernel:     9,999,999 solves/s",
        readme)
    assert doctored != readme
    (work / "README.md").write_text(doctored)
    out = subprocess.run([sys.executable,
                          str(work / "tools" / "check_doc_numbers.py")],
                         capture_output=True, text=True, timeout=120)
    assert out.returncode != 0 and "DRIFT" in out.stdout, out.stdout

    # Ratio claims (round 5: percent speedups resolved as row ratios)
    # must be policed too: doctor the shift-warm "+NN%" and re-run.
    doctored2 = re.sub(r"measured \+\d+% MPC", "measured +99% MPC", readme)
    assert doctored2 != readme
    (work / "README.md").write_text(doctored2)
    out = subprocess.run([sys.executable,
                          str(work / "tools" / "check_doc_numbers.py")],
                         capture_output=True, text=True, timeout=120)
    assert out.returncode != 0 and "DRIFT" in out.stdout, out.stdout
