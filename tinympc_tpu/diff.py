"""Differentiable MPC: gradients through the solve via implicit
differentiation.

No reference analog — this is a capability the JAX rebuild gets "for
free" from the ecosystem: treat the converged ADMM solution as an
implicit function of the solve inputs (x0, Xref, Uref) and differentiate
the KKT system at the fixed point (OptNet-style), instead of unrolling
solver iterations (``lax.while_loop`` is not reverse-differentiable, and
unrolling hundreds of iterations would be slow and memory-hungry anyway).
Enables MPC-as-a-policy-layer training, reference/cost tuning by gradient
descent, and system identification through the controller.

The QP the reference ADMM actually converges to (careful: *not* the raw
user cost) has effective weights equal to the once-augmented diagonals —
tiny_setup stores ``work->Q = Q + rho*I`` (tiny_api.cpp:117) and the
primal step then augments by another ``rho`` (tiny_api.cpp:317), so at
the fixed point the splitting leaves ``Q + rho*I``; likewise the terminal
quadratic is ``Pinf - rho*I`` (the backward pass seeds with Pinf, which
includes the primal step's rho augmentation). The derivative treats the
box active set as locally constant (exact a.e. under strict
complementarity): active coordinates are pinned, and the remaining
equality-constrained KKT system

    [H  D'] [dz ]   [-dc]
    [D  0 ] [dλ] = [ de]

is solved densely per problem (z = trajectory, D = initial condition +
dynamics rows). Solve accuracy bounds gradient accuracy — tighten
``abs_pri_tol``/``abs_dua_tol`` when training through the solver.

Scope: box-constrained specs (the reference's default family). SOC /
hyperplane / consensus specs raise — their active-set geometry (cone
boundaries, halfspaces) needs per-family tangent treatment.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from . import admm
from .types import SolverState, Solution, TinyProblem
from .types import init_state as _init_state


def _diff_supported(prob: TinyProblem) -> bool:
    spec = prob.spec
    return not (
        spec.en_state_soc or spec.en_input_soc
        or spec.en_state_linear or spec.en_input_linear
        or spec.en_tv_state_linear or spec.en_tv_input_linear
        or spec.en_consensus or prob.settings.adaptive_rho
    )


def _kkt_matrix(prob: TinyProblem):
    """Dense KKT matrix of the effective equality-constrained QP (no
    actives yet). Layout: z = [x_0..x_{N-1}, u_0..u_{N-2}], constraints =
    [x_0 = x0, x_{i} - A x_{i-1} - B u_{i-1} = f]."""
    spec = prob.spec
    N, nx, nu = spec.N, spec.nx, spec.nu
    dtype = prob.dtype
    nzx = N * nx
    nz = nzx + (N - 1) * nu
    nc = N * nx

    rho = jnp.asarray(prob.cache.rho, dtype)
    Pterm = prob.cache.Pinf - rho * jnp.eye(nx, dtype=dtype)

    H = jnp.zeros((nz, nz), dtype)
    for i in range(N - 1):
        H = H.at[i * nx:(i + 1) * nx, i * nx:(i + 1) * nx].set(
            jnp.diag(prob.Qdiag))
    H = H.at[(N - 1) * nx:nzx, (N - 1) * nx:nzx].set(Pterm)
    for i in range(N - 1):
        o = nzx + i * nu
        H = H.at[o:o + nu, o:o + nu].set(jnp.diag(prob.Rdiag))

    D = jnp.zeros((nc, nz), dtype)
    D = D.at[:nx, :nx].set(jnp.eye(nx, dtype=dtype))       # x_0 = x0
    for i in range(N - 1):
        r = (i + 1) * nx
        D = D.at[r:r + nx, (i + 1) * nx:(i + 2) * nx].set(
            jnp.eye(nx, dtype=dtype))
        D = D.at[r:r + nx, i * nx:(i + 1) * nx].set(-prob.A)
        o = nzx + i * nu
        D = D.at[r:r + nx, o:o + nu].set(-prob.B)

    S = jnp.block([[H, D.T], [D, jnp.zeros((nc, nc), dtype)]])
    return S


def _active_mask(prob: TinyProblem, sol_x, sol_u):
    """Inactive mask over z for one problem: 0 where the solution sits on
    an enabled bound (sol.x/sol.u are the *projected* slacks, so clamped
    coordinates equal the bound exactly)."""
    spec, cons = prob.spec, prob.cons
    if spec.en_state_bound:
        ax = (sol_x <= cons.x_min) | (sol_x >= cons.x_max)
        # x_0 is pinned by the initial-condition equality, never by the box:
        # marking it active would zero both its stationarity row and the
        # x_0 = x0 constraint column, leaving a singular KKT matrix (and
        # all-NaN gradients) whenever the initial state touches a bound.
        ax = ax.at[0].set(False)
    else:
        ax = jnp.zeros_like(sol_x, bool)
    if spec.en_input_bound:
        au = (sol_u <= cons.u_min) | (sol_u >= cons.u_max)
    else:
        au = jnp.zeros_like(sol_u, bool)
    return jnp.concatenate(
        [(~ax).reshape(-1), (~au).reshape(-1)]).astype(sol_x.dtype)


def _vjp_one(prob: TinyProblem, S, m_z, gx, gu):
    """Solve the adjoint KKT system for one problem's cotangents."""
    spec = prob.spec
    N, nx, nu = spec.N, spec.nx, spec.nu
    nzx = N * nx
    nz = S.shape[0] - N * nx
    dtype = S.dtype

    m = jnp.concatenate([m_z, jnp.ones(N * nx, dtype)])
    # Pin active coordinates: zero their rows/cols, identity diagonal.
    Sm = S * m[:, None] * m[None, :] + jnp.diag(1.0 - m)

    gz = jnp.concatenate([gx.reshape(-1), gu.reshape(-1)]) * m_z
    rhs = jnp.concatenate([gz, jnp.zeros(N * nx, dtype)])
    w = jnp.linalg.solve(Sm, rhs)

    w_x = w[:nzx].reshape(N, nx)
    w_u = w[nzx:nz].reshape(N - 1, nu)
    # dL/dXref_i = Qdiag * w_x_i (c_i = -Qdiag.*Xref_i); terminal row uses
    # the Pinf' matvec of update_linear_cost (admm.py), so its adjoint is
    # Pinf @ w.
    gXref = prob.Qdiag * w_x
    gXref = gXref.at[N - 1].set(prob.cache.Pinf @ w_x[N - 1])
    gUref = prob.Rdiag * w_u
    gx0 = w[nz:nz + nx]
    return gx0, gXref, gUref


def make_differentiable(prob: TinyProblem, state: Optional[SolverState] = None):
    """Return ``f(x0, Xref, Uref) -> Solution`` differentiable w.r.t. all
    three arguments (unbatched ``(nx,)`` or batched ``(B, nx)`` x0, with
    Xref/Uref shared ``(N, nx)``/``(N-1, nu)`` or batched likewise).

    Gradients flow through ``Solution.x``/``Solution.u``; iteration counts
    and flags are non-differentiable bookkeeping. ``state`` optionally
    warm-starts the forward solve (the fixed point, hence the gradient, is
    unaffected).
    """
    if not _diff_supported(prob):
        raise ValueError("make_differentiable supports box-constrained "
                         "fixed-rho specs; SOC/hyperplane/consensus and "
                         "adaptive-rho active sets are not differentiated")
    S = _kkt_matrix(prob)

    def _solve(x0, Xref, Uref):
        b = x0.shape[:-1]
        st = state if state is not None else _init_state(
            prob.spec, b, prob.dtype)
        sol, _, _ = admm.solve(prob, st, Xref=Xref, Uref=Uref, x0=x0)
        return sol

    @jax.custom_vjp
    def f(x0, Xref, Uref):
        return _solve(x0, Xref, Uref)

    def fwd(x0, Xref, Uref):
        sol = _solve(x0, Xref, Uref)
        return sol, (sol.x, sol.u, x0.shape, Xref.shape, Uref.shape)

    def bwd(res, ct):
        sol_x, sol_u, x0_shape, xref_shape, uref_shape = res
        gx, gu = ct.x, ct.u
        batched = len(x0_shape) > 1

        def one(sx, su, gxi, gui):
            m_z = _active_mask(prob, sx, su)
            return _vjp_one(prob, S, m_z, gxi, gui)

        if batched:
            # Solution arrays are (T, B, F) — move batch in front for vmap.
            tb = lambda a: jnp.moveaxis(a, 1, 0)
            gx0, gXref, gUref = jax.vmap(one)(
                tb(sol_x), tb(sol_u), tb(gx), tb(gu))
            # Shared (unbatched) references accumulate over the batch.
            gXref = (jnp.sum(gXref, axis=0) if len(xref_shape) == 2
                     else jnp.moveaxis(gXref, 0, 1))
            gUref = (jnp.sum(gUref, axis=0) if len(uref_shape) == 2
                     else jnp.moveaxis(gUref, 0, 1))
        else:
            gx0, gXref, gUref = one(sol_x, sol_u, gx, gu)
        return gx0, gXref, gUref

    f.defvjp(fwd, bwd)
    return f
