"""Batched closed-loop MPC rollout, fully on-device.

The reference runs its closed loops in host code (examples/*.cpp:
set x0 -> solve -> simulate forward). Here the whole receding-horizon loop
— including the plant simulation — runs under one ``lax.scan``, so a fleet
of closed loops executes without a single host round trip per step.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from . import admm
from .types import SolverState, TinyProblem


def shift_state(state: SolverState) -> SolverState:
    """Advance a warm-start SolverState one timestep for receding-horizon
    reuse (round 5; the XLA twin of kernels.shift_carry — classic MPC
    shift warm start, no reference analog): every time-indexed iterate
    drops its first row and repeats the last, so the previous solve's
    tail seeds the overlapping window of the next horizon. Per-problem
    scalars and the u[0]-consensus pair pass through."""
    def sh(a):
        return None if a is None else jnp.concatenate([a[1:], a[-1:]],
                                                      axis=0)

    return state.replace(**{
        f: sh(getattr(state, f))
        for f in ("x", "u", "v", "vnew", "z", "znew", "g", "y",
                  "vcnew", "gc", "zcnew", "yc", "vlnew", "gl", "zlnew",
                  "yl", "vlnew_tv", "gl_tv", "zlnew_tv", "yl_tv")
        if getattr(state, f, None) is not None})


def closed_loop(prob: TinyProblem, state: SolverState, x0, Xref_total,
                n_steps: int, Uref=None, reset_duals: bool = False,
                shift_warm: bool = False):
    """Run ``n_steps`` of receding-horizon MPC with plant = model.

    Args:
      prob: configured problem.
      state: initial solver state (warm-start carrier).
      x0: initial plant state, (*b, nx).
      Xref_total: full reference trajectory, (T, nx) with T >= n_steps + N
        (the window ``Xref_total[k:k+N]`` is tracked at step k, like
        quadrotor_tracking.cpp:89), or (N, nx) to hold one window fixed.
      Uref: optional constant input reference (N-1, nu).
      reset_duals: zero y/g before each solve (quadrotor_tracking.cpp:92-93).
      shift_warm: advance the warm state one timestep between solves
        (:func:`shift_state`) — the receding horizon's windows overlap,
        so the previous solution's tail is the better seed.

    Returns (xs, us, iters, solved, final_state): xs (n_steps, *b, nx) is the
    plant trajectory, us the applied first inputs (raw forward-pass inputs,
    like ``work->u.col(0)`` in the reference examples).
    """
    spec = prob.spec
    N = spec.N
    Xref_total = jnp.asarray(Xref_total, prob.dtype)
    windowed = Xref_total.shape[0] != N

    def step(carry, k):
        x0_k, st = carry
        if reset_duals:
            st = st.replace(y=jnp.zeros_like(st.y), g=jnp.zeros_like(st.g))
        if windowed:
            Xref = jax.lax.dynamic_slice_in_dim(Xref_total, k, N, axis=0)
        else:
            Xref = Xref_total
        sol, st, _ = admm.solve(prob, st, Xref, Uref, x0_k)
        u0 = st.u[0]
        x_next = admm.mv(prob.A, x0_k) + admm.mv(prob.B, u0) + prob.f
        if shift_warm:
            # Shift warm start (see shift_state): measured 12.7 -> 11.4
            # mean iters/step on the N=20 ct=5 serving workload, with
            # the cold-start transient converging in ~half the steps.
            st = shift_state(st)
        return (x_next, st), (x0_k, u0, sol.iter, sol.solved)

    (_, state), (xs, us, iters, solved) = jax.lax.scan(
        step, (jnp.asarray(x0, prob.dtype), state), jnp.arange(n_steps)
    )
    return xs, us, iters, solved, state
