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

import dataclasses

from . import admm
from .riccati import precompute_cache
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


def _dare_residual(P, A, B, Q2, R2):
    """The solver's Riccati fixed-point map minus P (riccati.py:47-50):
    G(P) = Q2 + A'P(A - B K(P)) - P with K = (R2 + B'PB)^-1 B'PA.
    Pinf satisfies G(Pinf) = 0; plain reverse-mode differentiable algebra."""
    BtP = B.T @ P
    K = jnp.linalg.solve(R2 + BtP @ B, BtP @ A)
    return Q2 + A.T @ P @ (A - B @ K) - P


def _pinf_vjp(Pbar, Pinf, A, B, Q2, R2):
    """Implicit VJP through the Riccati fixed point: given the cotangent on
    Pinf, return cotangents on (A, B, Q2, R2) by the implicit function
    theorem on G(P; theta) = 0 — the while_loop that computed Pinf is not
    reverse-differentiable, and unrolling it would be both slow and wrong
    at a truncated fixed point.

    dP/dtheta = -(dG/dP)^-1 dG/dtheta, so
    theta_bar = -(dG/dtheta)' (dG/dP)^-T Pbar.
    dG/dP is built densely via jacfwd (nx^2 x nx^2 — tiny for MPC sizes).
    """
    nx = Pinf.shape[0]

    dGdP = jax.jacfwd(lambda P: _dare_residual(P, A, B, Q2, R2))(Pinf)
    dGdP = dGdP.reshape(nx * nx, nx * nx)
    u = jnp.linalg.solve(dGdP.T, Pbar.reshape(-1)).reshape(nx, nx)

    _, pull = jax.vjp(lambda A, B, Q2, R2: _dare_residual(Pinf, A, B, Q2, R2),
                      A, B, Q2, R2)
    Abar, Bbar, Q2bar, R2bar = pull(-u)
    return Abar, Bbar, Q2bar, R2bar


def _cvec_evec(prob: TinyProblem, Xref, Uref, x0):
    """The effective QP's linear term c and constraint rhs e (see
    _kkt_matrix for the z/constraint layout)."""
    N = prob.spec.N
    c = jnp.concatenate([
        (-(prob.Qdiag * Xref[:-1])).reshape(-1),
        -(prob.cache.Pinf.T @ Xref[-1]),
        (-(prob.Rdiag * Uref)).reshape(-1),
    ])
    e = jnp.concatenate([x0, jnp.tile(prob.f, N - 1)])
    return c, e


def _kkt_values(prob: TinyProblem, S, m_z, sol_x, sol_u, c, e):
    """Solve the active-set-pinned KKT system for (z*, lambda*): pinned
    coordinates take their solver value (= the bound), and their columns'
    contributions move to the rhs. z reproduces the solver's solution (a
    consistency check); lambda are the dynamics multipliers the parameter
    adjoints contract against."""
    spec = prob.spec
    N, nx, nu = spec.N, spec.nx, spec.nu
    nz = N * nx + (N - 1) * nu
    dtype = S.dtype
    zstar = jnp.concatenate([sol_x.reshape(-1), sol_u.reshape(-1)])
    m = jnp.concatenate([m_z, jnp.ones(N * nx, dtype)])
    Sm = S * m[:, None] * m[None, :] + jnp.diag(1.0 - m)
    z_pin = jnp.concatenate([zstar * (1 - m_z), jnp.zeros(N * nx, dtype)])
    rhs_full = jnp.concatenate([-c, e])
    rhs = m * (rhs_full - S @ z_pin) + (1 - m) * z_pin
    w = jnp.linalg.solve(Sm, rhs)
    return w[:nz], w[nz:]


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


def make_differentiable_params(template: TinyProblem,
                               riccati_tol: float = 1e-12):
    """Return ``g(A, B, Q, R, f, x0, Xref, Uref) -> Solution`` with
    gradients w.r.t. *every* argument — dynamics, raw cost diagonals, the
    affine term, and the solve inputs. This is the system-identification /
    controller-co-design entry point: train (A, B) to match demonstrations
    through the controller, or tune (Q, R) so closed-loop behavior hits a
    spec.

    The solution depends on the parameters through two routes: the QP data
    (the dynamics rows, cost diagonals, and rhs) and the Riccati cost-to-go
    Pinf, which both shapes the terminal cost and is itself an implicit
    function of (A, B, Q, R, rho). The VJP combines the KKT adjoint with
    an implicit-function-theorem pass through the DARE fixed point
    (:func:`_pinf_vjp`) — the forward while_loop is never unrolled.

    ``template`` supplies rho, horizon, bounds, and settings; its own
    A/B/Q/R/f are ignored. The cache is recomputed at ``riccati_tol``
    (much tighter than the solver default 1e-5) so the fixed-point
    assumption holds to gradient accuracy. Unbatched or batched x0, like
    :func:`make_differentiable`.
    """
    if not _diff_supported(template):
        raise ValueError("make_differentiable_params supports "
                         "box-constrained fixed-rho specs")
    rho = template.cache.rho
    spec = template.spec
    N, nx, nu = spec.N, spec.nx, spec.nu
    nzx = N * nx

    def build(A, B, Q, R, f):
        dtype = template.dtype
        A = jnp.asarray(A, dtype)
        B = jnp.asarray(B, dtype)
        Qd = jnp.asarray(Q, dtype) + rho      # tiny_setup's work->Q
        Rd = jnp.asarray(R, dtype) + rho
        f = jnp.asarray(f, dtype)
        cache = precompute_cache(A, B, f, Qd, Rd, rho, tol=riccati_tol,
                                 max_iters=100_000)
        return template.replace(A=A, B=B, f=f, Qdiag=Qd, Rdiag=Rd,
                                cache=cache)

    def _solve(prob, x0, Xref, Uref):
        st = _init_state(prob.spec, x0.shape[:-1], prob.dtype)
        sol, _, _ = admm.solve(prob, st, Xref=Xref, Uref=Uref, x0=x0)
        return sol

    @jax.custom_vjp
    def g(A, B, Q, R, f, x0, Xref, Uref):
        return _solve(build(A, B, Q, R, f), x0, Xref, Uref)

    def fwd(A, B, Q, R, f, x0, Xref, Uref):
        prob = build(A, B, Q, R, f)
        sol = _solve(prob, x0, Xref, Uref)
        return sol, (prob, sol.x, sol.u, x0, Xref, Uref,
                     x0.shape, Xref.shape, Uref.shape)

    def bwd(res, ct):
        (prob, sol_x, sol_u, x0, Xref, Uref,
         x0_shape, xref_shape, uref_shape) = res
        S = _kkt_matrix(prob)
        batched = len(x0_shape) > 1

        def one(sx, su, gxi, gui, x0i, Xrefi, Urefi):
            m_z = _active_mask(prob, sx, su)
            c, e = _cvec_evec(prob, Xrefi, Urefi, x0i)
            # adjoint solve (for input grads) + value solve (multipliers)
            gx0, gXref, gUref = _vjp_one(prob, S, m_z, gxi, gui)
            m = jnp.concatenate([m_z, jnp.ones(N * nx, S.dtype)])
            Sm = S * m[:, None] * m[None, :] + jnp.diag(1.0 - m)
            gz = jnp.concatenate([gxi.reshape(-1), gui.reshape(-1)]) * m_z
            w = jnp.linalg.solve(
                Sm, jnp.concatenate([gz, jnp.zeros(N * nx, S.dtype)]))
            w_x = w[:nzx].reshape(N, nx)
            w_u = w[nzx:nzx + (N - 1) * nu].reshape(N - 1, nu)
            w_lam = w[nzx + (N - 1) * nu:].reshape(N, nx)
            zv, lam = _kkt_values(prob, S, m_z, sx, su, c, e)
            lam = lam.reshape(N, nx)

            # dL/dtheta = -w' dF/dtheta at (z*, lambda*).
            # Stationarity x_i rows carry -A'lam_{i+1}; dynamics rows -A x_i.
            Abar = (jnp.einsum("ti,tj->ij", lam[1:], w_x[:-1])
                    + jnp.einsum("ti,tj->ij", w_lam[1:], sx[:-1]))
            Bbar = (jnp.einsum("ti,tj->ij", lam[1:], w_u)
                    + jnp.einsum("ti,tj->ij", w_lam[1:], su))
            fbar = jnp.sum(w_lam[1:], axis=0)
            # Effective-diagonal terms (H z and c = -Qd*Xref both carry Qd).
            Qdbar = -jnp.sum(w_x[:-1] * (sx[:-1] - Xrefi[:-1]), axis=0)
            Rdbar = -jnp.sum(w_u * (su - Urefi), axis=0)
            # Terminal block: Pterm = Pinf - rho I multiplies x_{N-1} in H;
            # c_{N-1} = -Pinf' Xref_{N-1}.
            Pbar = (-jnp.outer(w_x[-1], sx[-1])
                    + jnp.outer(Xrefi[-1], w_x[-1]))
            return gx0, gXref, gUref, Abar, Bbar, fbar, Qdbar, Rdbar, Pbar

        if batched:
            tb = lambda a: jnp.moveaxis(a, 1, 0)
            Bn = x0_shape[0]
            bXref = (Xref if len(xref_shape) == 3
                     else jnp.broadcast_to(Xref[:, None], (N, Bn, nx)))
            bUref = (Uref if len(uref_shape) == 3
                     else jnp.broadcast_to(Uref[:, None], (N - 1, Bn, nu)))
            outs = jax.vmap(one)(tb(sol_x), tb(sol_u), tb(ct.x), tb(ct.u),
                                 x0, tb(bXref), tb(bUref))
            gx0 = outs[0]
            gXref = (jnp.sum(outs[1], axis=0) if len(xref_shape) == 2
                     else jnp.moveaxis(outs[1], 0, 1))
            gUref = (jnp.sum(outs[2], axis=0) if len(uref_shape) == 2
                     else jnp.moveaxis(outs[2], 0, 1))
            Abar, Bbar, fbar, Qdbar, Rdbar, Pbar = [
                jnp.sum(o, axis=0) for o in outs[3:]]
        else:
            (gx0, gXref, gUref, Abar, Bbar, fbar, Qdbar, Rdbar,
             Pbar) = one(sol_x, sol_u, ct.x, ct.u, x0, Xref, Uref)

        # Chain the Pinf cotangent through the DARE fixed point.
        dtype = prob.dtype
        Q2 = jnp.diag(prob.Qdiag) + rho * jnp.eye(nx, dtype=dtype)
        R2 = jnp.diag(prob.Rdiag) + rho * jnp.eye(nu, dtype=dtype)
        Ar, Br, Q2bar, R2bar = _pinf_vjp(Pbar, prob.cache.Pinf, prob.A,
                                         prob.B, Q2, R2)
        Abar = Abar + Ar
        Bbar = Bbar + Br
        # Q enters Qdiag (identity) and Q2's diagonal (identity); same for R.
        Qbar = Qdbar + jnp.diagonal(Q2bar)
        Rbar = Rdbar + jnp.diagonal(R2bar)
        return (Abar, Bbar, Qbar, Rbar, fbar, gx0, gXref, gUref)

    g.defvjp(fwd, bwd)
    return g
