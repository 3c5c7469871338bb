"""Degenerate/edge problem dimensions through export and the fused kernel.

The reference's codegen_random example exports a *random* nx=2, nu=2, N=3
problem with finite bounds (examples/codegen_random.cpp:70) — the smallest
dims any reference driver exercises, and an edge for anything that assumes
nx > nu, square-ish shapes, or N large enough for a real horizon. This
suite is its equivalent: random tiny problems (including nu == nx and the
minimum N=3) driven through the C++ code generator, the embedded shared
library, and the fused Pallas kernel, each checked against the XLA solver.
"""
import json
import subprocess

import jax.numpy as jnp
import numpy as np
import pytest

import tinympc_tpu as tm
from tinympc_tpu.export import (EmbeddedSolver, build_shared_library,
                                generate_cpp)
from tinympc_tpu.kernels import solve_fused

DIMS = [(2, 2, 3),   # the reference codegen_random config (nu == nx)
        (2, 1, 3),   # single input
        (3, 3, 4),   # nu == nx, one step past minimum horizon
        (1, 1, 3)]   # scalar system


def _random_problem(nx, nu, N, seed=0, dtype=jnp.float64):
    """Random stable system with finite bounds (codegen_random.cpp:21-38
    builds Random() matrices; we scale A to spectral radius < 1 so the
    Riccati fixed point converges for every seed)."""
    rng = np.random.default_rng(seed)
    A = rng.uniform(-1.0, 1.0, (nx, nx))
    A *= 0.9 / max(np.abs(np.linalg.eigvals(A)).max(), 1e-9)
    B = rng.uniform(-1.0, 1.0, (nx, nu))
    Qdiag = rng.uniform(1.0, 5.0, nx)
    Rdiag = rng.uniform(0.1, 1.0, nu)
    prob = tm.setup(A, B, Qdiag, Rdiag, rho=1.0, N=N, dtype=dtype)
    prob = tm.with_bounds(prob, x_min=-3.0, x_max=3.0, u_min=-2.0, u_max=2.0)
    return tm.with_settings(prob, max_iter=50)


@pytest.mark.parametrize("nx,nu,N", DIMS)
def test_codegen_degenerate_dims(tmp_path, nx, nu, N):
    """generate_cpp compiles and matches the Python solver per closed-loop
    step at the edge dims."""
    prob = _random_problem(nx, nu, N, seed=nx * 10 + nu)
    rng = np.random.default_rng(7)
    x0 = rng.uniform(-0.5, 0.5, nx)
    Xref = np.zeros((N, nx))

    out = generate_cpp(prob, tmp_path / "gen", x0=x0, Xref=Xref, nsteps=10)
    exe = tmp_path / "tiny_main"
    subprocess.run(["g++", "-O2", "-std=c++17",
                    str(out / "src" / "tiny_main.cpp"), "-o", str(exe)],
                   check=True)
    res = subprocess.run([str(exe)], capture_output=True, text=True,
                         check=True)
    steps = [json.loads(line) for line in res.stdout.strip().splitlines()]
    assert len(steps) == 10

    state = tm.init_state(prob)
    x0j = jnp.asarray(x0)
    for rec in steps:
        sol, state, _ = tm.solve(prob, state, Xref=jnp.asarray(Xref), x0=x0j)
        np.testing.assert_allclose(np.asarray(x0j), rec["x0"], atol=1e-9,
                                   err_msg=f"step {rec['step']} x0")
        np.testing.assert_allclose(np.asarray(state.u[0]), rec["u0"],
                                   atol=1e-9,
                                   err_msg=f"step {rec['step']} u0")
        assert int(sol.iter) == rec["iter"], f"step {rec['step']} iters"
        x0j = prob.A @ x0j + prob.B @ state.u[0]


def test_embedded_degenerate_dims(tmp_path):
    """The shared-library artifact at the codegen_random dims, driven over
    ctypes, tracks the TPU solver step for step."""
    nx, nu, N = 2, 2, 3
    prob = _random_problem(nx, nu, N, seed=42)
    so = build_shared_library(prob, tmp_path / "deploy")
    emb = EmbeddedSolver(so)
    assert (emb.nx, emb.nu, emb.N) == (nx, nu, N)

    state = tm.init_state(prob)
    x0 = np.array([0.4, -0.3])
    for step in range(10):
        esol = emb.solve(x0)
        sol, state, _ = tm.solve(prob, state, x0=jnp.asarray(x0))
        assert esol.iter == int(sol.iter), f"step {step}"
        assert esol.solved == bool(sol.solved)
        np.testing.assert_allclose(emb.u[0], np.asarray(state.u[0]),
                                   atol=1e-9, err_msg=f"step {step}")
        x0 = np.asarray(prob.A) @ x0 + np.asarray(prob.B) @ emb.u[0]


@pytest.mark.parametrize("nx,nu,N", DIMS)
def test_fused_degenerate_dims(nx, nu, N):
    """The fused kernel's lane layout (and its VMEM row estimate) at tiny
    nx/nu/N: interpret-mode solve matches the XLA path."""
    prob = _random_problem(nx, nu, N, seed=nx * 100 + nu,
                           dtype=jnp.float32)
    B = 8
    rng = np.random.default_rng(3)
    x0s = jnp.asarray(rng.uniform(-0.5, 0.5, (B, nx)), jnp.float32)

    sol_ref, st_ref, _ = tm.solve(prob, tm.init_state(prob, (B,)), x0=x0s)
    sol_f, res = solve_fused(prob, None, None, x0s, tile=B, interpret=True)

    np.testing.assert_allclose(np.asarray(sol_f.x), np.asarray(sol_ref.x),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(sol_f.u), np.asarray(sol_ref.u),
                               atol=1e-4)
    it_f, it_r = np.asarray(sol_f.iter), np.asarray(sol_ref.iter)
    assert np.all(np.abs(it_f - it_r) <= 1)
