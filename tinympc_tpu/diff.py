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

Beyond boxes, the conic families (SOC / hyperplane / tv-hyperplane;
:func:`make_differentiable` only) are differentiated through the
*projection operators themselves*: each enabled slack family satisfies
``z = P_f(z + y_f)`` at the fixed point, so the implicit system couples
``dz`` to per-family dual tangents ``dy_f`` through the Jacobian ``DP_f``
of the very projection code the solver runs (see :func:`_family_dps` —
this captures cone curvature, the reference's scaled-SOC projection
quirk, and the sequential hyperplane composition exactly, where a
textbook active-row linearization is measurably wrong).

With extra families the *effective* quadratic also changes: every enabled
slack family contributes a ``-rho x`` term at the fixed point (its
``-rho (v_f - g_f)`` linear-cost term with ``v_f = x``), so the effective
stage Hessian is ``Q_user + (2 - n_fam) rho`` on top of the stored
once-augmented ``Qdiag = Q_user + rho`` — see ``_kkt_matrix``.

Scope: consensus specs differentiate through the *group-coupled* KKT
(round 4 — G per-scenario copies of the effective QP plus the u_0
equality coupling whose multipliers are the scaled consensus duals).
Adaptive-rho specs differentiate at the committed final per-problem rho
(round 5 — piecewise-constant treatment: the adaptation path is a
discrete stride-gated process whose own input sensitivity is excluded,
and the Taylor cache biases the gains O((rho_b - rho0)^2); see
docs/PARITY.md "Differentiation coverage"). :func:`make_differentiable`
(solve inputs) covers every spec the solver accepts;
:func:`make_differentiable_params` (dynamics/cost parameters) covers
every family including consensus groups (round 5), except adaptive rho
— there the parameter gradient would additionally need the adaptation
trajectory's dependence on (A, B, Q, R) through every residual it
measured, which the piecewise-constant treatment cannot see; it raises
with this reason.
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
    # Every spec the solver accepts is differentiable through
    # make_differentiable (round 5): box/conic families, consensus
    # groups, adaptive rho (piecewise-constant at the committed rho).
    return True


def _params_diff_supported(prob: TinyProblem) -> bool:
    # Parameter gradients cover every family including consensus groups
    # (round 5) but not adaptive rho. The piecewise-constant treatment
    # that closes make_differentiable's adaptive cell does not transfer:
    # (1) the adapted terminal cost Pinf_b = Pinf(rho_b; A, B, Q, R)
    # would need the DARE implicit pass evaluated at rho_b, but the
    # solver's Taylor cache only approximates that point to first order
    # — the gradient would compound two uncontrolled approximations;
    # (2) the committed rho itself depends on (A, B, Q, R) through every
    # OSQP residual the adaptation measured (and through the
    # sensitivity tables dK/dP, themselves functions of the
    # parameters), a discrete stride-gated chain with no usable
    # implicit characterization. See docs/PARITY.md "Differentiation
    # coverage" for the full adjudication.
    return not prob.settings.adaptive_rho


def _family_counts(spec):
    """Enabled slack families per side (box always runs — the candidate is
    clipped against infinite bounds even when disabled, admm.update_slack):
    each contributes a -rho(v_f - g_f) linear-cost term, hence a -rho x at
    the fixed point."""
    nfx = 1 + int(bool(spec.en_state_soc and spec.state_cones)) \
        + int(bool(spec.en_state_linear)) + int(bool(spec.en_tv_state_linear))
    nfu = 1 + int(bool(spec.en_input_soc and spec.input_cones)) \
        + int(bool(spec.en_input_linear)) + int(bool(spec.en_tv_input_linear))
    return nfx, nfu


def _kkt_matrix(prob: TinyProblem, rho_b=None, Pinf_b=None):
    """Dense KKT matrix of the effective equality-constrained QP (no
    actives yet). Layout: z = [x_0..x_{N-1}, u_0..u_{N-2}], constraints =
    [x_0 = x0, x_{i} - A x_{i-1} - B u_{i-1} = f].

    Effective weights (module docstring): the stored diagonals are
    once-augmented (Qdiag = Q_user + rho), the primal step augments by one
    more rho, and each of the n_fam slack families cancels one rho at the
    fixed point — net ``Qdiag + (1 - n_fam) rho`` (box-only: Qdiag).
    Likewise the terminal block is ``Pinf - n_fam rho I``.

    ``rho_b``/``Pinf_b`` (adaptive rho, round 5): the per-problem
    *committed final* rho and its Taylor cost-to-go
    ``Pinf + (rho_b - rho0) dPinf``. The solver's prox/augmentation run
    at rho_b while the stored linear-cost diagonal keeps the setup-time
    rho0 (the reference never rebuilds work->Q on adaptation,
    rho_benchmark.cpp:199-212 vs tiny_api.cpp:117), so the effective
    stage diagonal becomes ``Qdiag - rho0 + (2 - n_fam) rho_b`` — at
    rho_b == rho0 this reduces exactly to the fixed-rho expression."""
    spec = prob.spec
    N, nx, nu = spec.N, spec.nx, spec.nu
    dtype = prob.dtype
    nzx = N * nx
    nz = nzx + (N - 1) * nu
    nc = N * nx

    rho0 = jnp.asarray(prob.cache.rho, dtype)
    rho = rho0 if rho_b is None else jnp.asarray(rho_b, dtype)
    Pinf = prob.cache.Pinf if Pinf_b is None else Pinf_b
    nfx, nfu = _family_counts(spec)
    Pterm = Pinf - nfx * rho * jnp.eye(nx, dtype=dtype)
    Qd = prob.Qdiag - rho0 + (2 - nfx) * rho
    Rd = prob.Rdiag - rho0 + (2 - nfu) * rho

    H = jnp.zeros((nz, nz), dtype)
    for i in range(N - 1):
        H = H.at[i * nx:(i + 1) * nx, i * nx:(i + 1) * nx].set(jnp.diag(Qd))
    H = H.at[(N - 1) * nx:nzx, (N - 1) * nx:nzx].set(Pterm)
    for i in range(N - 1):
        o = nzx + i * nu
        H = H.at[o:o + nu, o:o + nu].set(jnp.diag(Rd))

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


def _kkt_matrix_group(prob: TinyProblem, G: int):
    """Dense KKT matrix of the *group-coupled* QP a consensus scenario
    group converges to (admm.update_slack's en_consensus family): G
    per-scenario copies of the effective QP plus the equality coupling
    ``u_0^j = u_0^{j+1}`` (the consensus constraint the group mean
    projects onto; the scaled duals ``rho_c * yc0`` are its multipliers).
    The per-member effective weights are exactly the non-consensus ones —
    the consensus prox's rho_c quadratic cancels against its own center
    at the fixed point, leaving only the multiplier term.

    Layout: z_g = [z^1 .. z^G], then G dynamics/x0 blocks, then the
    (G-1)*nu coupling rows."""
    spec = prob.spec
    N, nx, nu = spec.N, spec.nx, spec.nu
    dtype = prob.dtype
    nzx = N * nx
    nz = nzx + (N - 1) * nu
    nc = N * nx

    # Reuse the single-member blocks by slicing them out of _kkt_matrix.
    S1 = _kkt_matrix(prob)
    H = S1[:nz, :nz]
    D = S1[nz:, :nz]
    from jax.scipy.linalg import block_diag
    Hg = block_diag(*([H] * G))
    Dg = block_diag(*([D] * G))
    ncc = (G - 1) * nu
    C = jnp.zeros((ncc, G * nz), dtype)
    eye = jnp.eye(nu, dtype=dtype)
    for j in range(G - 1):
        r = j * nu
        C = C.at[r:r + nu, j * nz + nzx:j * nz + nzx + nu].set(eye)
        C = C.at[r:r + nu,
                 (j + 1) * nz + nzx:(j + 1) * nz + nzx + nu].set(-eye)
    z0 = lambda a, b: jnp.zeros((a, b), dtype)
    Sg = jnp.block([
        [Hg, Dg.T, C.T],
        [Dg, z0(G * nc, G * nc), z0(G * nc, ncc)],
        [C, z0(ncc, G * nc), z0(ncc, ncc)],
    ])
    return Sg


def _vjp_group(prob: TinyProblem, Sg, m_z, gx, gu, G):
    """Adjoint of the group-coupled pinned KKT system for one scenario
    group (consensus specs, box families). ``m_z`` is the concatenated
    per-member inactive mask (G*nz,); ``gx``/``gu`` are (G, N, nx) /
    (G, N-1, nu) member cotangents. Returns (gx0 (G, nx),
    gXref (G, N, nx), gUref (G, N-1, nu)) plus the per-member adjoint
    stacks (w_x (G, N, nx), w_u (G, N-1, nu), w_lam (G, N, nx)) that
    the parameter adjoint contracts against (round 5).

    Coupling rows stay live while either side is free: with one side
    pinned the row correctly pins the other; only a row with *both*
    sides pinned is degenerate and takes the identity diagonal."""
    spec = prob.spec
    N, nx, nu = spec.N, spec.nx, spec.nu
    nzx = N * nx
    nz = nzx + (N - 1) * nu
    nc = N * nx
    ncc = (G - 1) * nu
    dtype = Sg.dtype

    m_u0 = m_z.reshape(G, nz)[:, nzx:nzx + nu]          # (G, nu)
    m_cc = jnp.maximum(m_u0[:-1], m_u0[1:]).reshape(-1)  # (ncc,)
    m = jnp.concatenate([m_z, jnp.ones(G * nc, dtype), m_cc])
    Sm = Sg * m[:, None] * m[None, :] + jnp.diag(1.0 - m)

    gz = jnp.concatenate([
        jnp.concatenate([gx[j].reshape(-1), gu[j].reshape(-1)])
        for j in range(G)]) * m_z
    rhs = jnp.concatenate([gz, jnp.zeros(G * nc + ncc, dtype)])
    w = jnp.linalg.solve(Sm, rhs)

    gx0s, gXrefs, gUrefs, wxs, wus, wls = [], [], [], [], [], []
    for j in range(G):
        w_x = w[j * nz:j * nz + nzx].reshape(N, nx)
        w_u = w[j * nz + nzx:(j + 1) * nz].reshape(N - 1, nu)
        w_lam = w[G * nz + j * nc:G * nz + (j + 1) * nc].reshape(N, nx)
        gXref = prob.Qdiag * w_x
        gXref = gXref.at[N - 1].set(prob.cache.Pinf @ w_x[N - 1])
        gUref = prob.Rdiag * w_u
        gx0s.append(w[G * nz + j * nc:G * nz + j * nc + nx])
        gXrefs.append(gXref)
        gUrefs.append(gUref)
        wxs.append(w_x)
        wus.append(w_u)
        wls.append(w_lam)
    return (jnp.stack(gx0s), jnp.stack(gXrefs), jnp.stack(gUrefs),
            jnp.stack(wxs), jnp.stack(wus), jnp.stack(wls))


def _consensus_rho(prob: TinyProblem):
    return float(prob.cache.rho if prob.settings.consensus_rho is None
                 else prob.settings.consensus_rho)


def _ext_matrix_group(prob: TinyProblem, S, G, sxg, sug, dualsg):
    """Group extension of :func:`_ext_matrix` for consensus specs with
    conic families (round 5): G member copies of the projection-operator
    fixed-point system, plus the consensus projection differentiated as
    *one more slack family* — its operator is the group mean on the u_0
    coordinates (``z = P_c(z + yc0)`` with ``P_c = (1/G) kron(1_{GxG},
    I_nu)``), weighted rho_c in the stationarity rows (the exact-prox
    step-0 weight, see admm.update_linear_cost's consensus term). This
    avoids explicit equality-coupling rows entirely: the mean operator's
    Jacobian carries the coupling, exactly as the solver iterates it.

    ``sxg``/``sug`` are (G, N, nx)/(G, N-1, nu); ``dualsg`` maps dual
    names to (G, T, F) arrays. Returns the dense group system matrix.
    Like the box-consensus path, a group whose u_0 is *fully* saturated
    in every member would make the mean rows redundant with the box
    rows (no strict complementarity); gradients are a.e. exact away from
    that degenerate set."""
    spec = prob.spec
    N, nx, nu = spec.N, spec.nx, spec.nu
    nzx = N * nx
    nz = nzx + (N - 1) * nu
    nc = N * nx
    dtype = S.dtype
    rho = jnp.asarray(prob.cache.rho, dtype)
    rho_c = jnp.asarray(_consensus_rho(prob), dtype)

    H = S[:nz, :nz]
    D = S[nz:, :nz]
    fams_m = [_family_dps(prob, sxg[j], sug[j],
                          {k: v[j] for k, v in dualsg.items()})
              for j in range(G)]
    n_extra_m = sum(d for _, d, _ in fams_m[0])
    ncon = G * nu
    n_tot = G * (nz + nc) + G * n_extra_m + ncon
    A = jnp.zeros((n_tot, n_tot), dtype)
    for j in range(G):
        zo, lo = j * nz, G * nz + j * nc
        A = A.at[zo:zo + nz, zo:zo + nz].set(H)
        A = A.at[lo:lo + nc, zo:zo + nz].set(D)
        A = A.at[zo:zo + nz, lo:lo + nc].set(D.T)
    off = G * (nz + nc)
    for j, fams in enumerate(fams_m):
        for coff, dim, DP in fams:
            eye = jnp.eye(dim, dtype=dtype)
            zo = j * nz + coff
            A = A.at[zo:zo + dim, off:off + dim].set(rho * eye)
            A = A.at[off:off + dim, zo:zo + dim].set(eye - DP)
            A = A.at[off:off + dim, off:off + dim].set(-DP)
            off += dim
    # Consensus family: scattered u_0 coordinates across members.
    idx = jnp.concatenate(
        [j * nz + nzx + jnp.arange(nu) for j in range(G)])
    M = jnp.kron(jnp.full((G, G), 1.0 / G, dtype), jnp.eye(nu, dtype=dtype))
    ce = jnp.eye(ncon, dtype=dtype)
    cols = off + jnp.arange(ncon)
    A = A.at[idx[:, None], cols[None, :]].set(rho_c * ce)
    A = A.at[cols[:, None], idx[None, :]].set(ce - M)
    A = A.at[off:off + ncon, off:off + ncon].set(-M)
    return A


def _dp_vjp_group(prob: TinyProblem, S, G, sxg, sug, dualsg, gxg, gug):
    """Adjoint of the group-extended projection fixed point (consensus +
    conic specs) for one scenario group. Member cotangents ``gxg``/
    ``gug`` are (G, N, nx)/(G, N-1, nu). Returns (gx0 (G, nx), gXref
    (G, N, nx), gUref (G, N-1, nu), w_x, w_u, w_lam, lam) — the last
    four feed the parameter adjoint (per-member stacks)."""
    spec = prob.spec
    N, nx, nu = spec.N, spec.nx, spec.nu
    nzx = N * nx
    nz = nzx + (N - 1) * nu
    nc = N * nx
    dtype = S.dtype

    A = _ext_matrix_group(prob, S, G, sxg, sug, dualsg)
    gz = jnp.concatenate([
        jnp.concatenate([gxg[j].reshape(-1), gug[j].reshape(-1)])
        for j in range(G)])
    rhs = jnp.concatenate([gz, jnp.zeros(A.shape[0] - G * nz, dtype)])
    w = jnp.linalg.solve(A.T, rhs)

    gx0s, gXrefs, gUrefs, wxs, wus, wls = [], [], [], [], [], []
    for j in range(G):
        w_x = w[j * nz:j * nz + nzx].reshape(N, nx)
        w_u = w[j * nz + nzx:(j + 1) * nz].reshape(N - 1, nu)
        w_lam = w[G * nz + j * nc:G * nz + (j + 1) * nc].reshape(N, nx)
        gXref = prob.Qdiag * w_x
        gXref = gXref.at[N - 1].set(prob.cache.Pinf @ w_x[N - 1])
        gx0s.append(w[G * nz + j * nc:G * nz + j * nc + nx])
        gXrefs.append(gXref)
        gUrefs.append(prob.Rdiag * w_u)
        wxs.append(w_x)
        wus.append(w_u)
        wls.append(w_lam)
    return (jnp.stack(gx0s), jnp.stack(gXrefs), jnp.stack(gUrefs),
            jnp.stack(wxs), jnp.stack(wus), jnp.stack(wls))


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


def _has_extra_families(spec) -> bool:
    return bool((spec.en_state_soc and spec.state_cones)
                or (spec.en_input_soc and spec.input_cones)
                or spec.en_state_linear or spec.en_input_linear
                or spec.en_tv_state_linear or spec.en_tv_input_linear)


def _blockdiag(Bs):
    """(T, w, w) per-timestep blocks -> (T*w, T*w) block-diagonal."""
    T, w, _ = Bs.shape
    M = jnp.zeros((T, w, T, w), Bs.dtype)
    idx = jnp.arange(T)
    M = M.at[idx, :, idx, :].set(Bs)
    return M.reshape(T * w, T * w)


def _family_dps(prob: TinyProblem, sx, su, duals):
    """Projection Jacobians of every enabled slack family at its converged
    candidate ``cand_f = z* + dual_f``.

    The ADMM fixed point satisfies ``z = P_f(z + dual_f)`` per family, so
    the implicit derivative needs ``DP_f`` — the Jacobian of the *actual*
    projection operator the solver runs (jacfwd of the same code), not the
    textbook constraint linearization. This matters beyond curvature: the
    reference's SOC projection is Euclidean in the scaled coordinates
    ``(v, mu*s)`` (admm.cpp:39-60), so its boundary multiplier direction is
    ``[v/||v||, -1/mu]``, not the surface normal ``[v/||v||, -mu]`` — a
    fixed-row active-set treatment gets visibly wrong gradients. Sequential
    hyperplane composition (constraint k sees k-1's output) is likewise
    captured exactly by differentiating the composed map.

    Returns a list of ``(coord_offset, dim, DP)`` blocks over the z layout.
    Timestep 0 of every state-side family is forced to identity — x_0 is
    held by the initial-condition equality (cf. _active_mask).
    """
    from .projections import project_hyperplane_if_violated, project_soc

    spec, cons = prob.spec, prob.cons
    N, nx, nu = spec.N, spec.nx, spec.nu
    nzx = N * nx
    dtype = prob.dtype
    fams = []

    def free_row0(DPs):
        return DPs.at[0].set(jnp.eye(DPs.shape[-1], dtype=dtype))

    # Box family (always runs; infinite bounds when disabled).
    fin = jnp.finfo(dtype).max
    xmin = jnp.asarray(cons.x_min, dtype) if spec.en_state_bound \
        else jnp.full((N, nx), -fin)
    xmax = jnp.asarray(cons.x_max, dtype) if spec.en_state_bound \
        else jnp.full((N, nx), fin)
    umin = jnp.asarray(cons.u_min, dtype) if spec.en_input_bound \
        else jnp.full((N - 1, nu), -fin)
    umax = jnp.asarray(cons.u_max, dtype) if spec.en_input_bound \
        else jnp.full((N - 1, nu), fin)
    cand = sx + duals["g"]
    inside = ((cand > xmin) & (cand < xmax)).astype(dtype)
    inside = inside.at[0].set(1.0)
    fams.append((0, nzx, _blockdiag(jax.vmap(jnp.diag)(inside))))
    cand = su + duals["y"]
    inside = ((cand > umin) & (cand < umax)).astype(dtype)
    fams.append((nzx, (N - 1) * nu, _blockdiag(jax.vmap(jnp.diag)(inside))))

    def soc_proj(cone_list, mus):
        def proj(vec):
            for k, (start, dim) in enumerate(cone_list):
                seg = project_soc(vec[start:start + dim], mus[k])
                vec = vec.at[start:start + dim].set(seg)
            return vec
        return proj

    if spec.en_state_soc and spec.state_cones:
        mus = jnp.asarray(cons.cx, dtype)
        DPs = jax.vmap(jax.jacfwd(soc_proj(spec.state_cones, mus)))(
            sx + duals["gc"])
        fams.append((0, nzx, _blockdiag(free_row0(DPs))))
    if spec.en_input_soc and spec.input_cones:
        mus = jnp.asarray(cons.cu, dtype)
        DPs = jax.vmap(jax.jacfwd(soc_proj(spec.input_cones, mus)))(
            su + duals["yc"])
        fams.append((nzx, (N - 1) * nu, _blockdiag(DPs)))

    def hyper_proj(A, b):
        def proj(vec):
            for k in range(A.shape[0]):
                vec = project_hyperplane_if_violated(vec, A[k], b[k])
            return vec
        return proj

    if spec.en_state_linear:
        proj = hyper_proj(jnp.asarray(cons.Alin_x, dtype),
                          jnp.asarray(cons.blin_x, dtype))
        DPs = jax.vmap(jax.jacfwd(proj))(sx + duals["gl"])
        fams.append((0, nzx, _blockdiag(free_row0(DPs))))
    if spec.en_input_linear:
        proj = hyper_proj(jnp.asarray(cons.Alin_u, dtype),
                          jnp.asarray(cons.blin_u, dtype))
        DPs = jax.vmap(jax.jacfwd(proj))(su + duals["yl"])
        fams.append((nzx, (N - 1) * nu, _blockdiag(DPs)))

    def tv_proj(vec, Ai, bi):
        for k in range(Ai.shape[0]):
            vec = project_hyperplane_if_violated(vec, Ai[k], bi[k])
        return vec

    if spec.en_tv_state_linear:
        DPs = jax.vmap(jax.jacfwd(tv_proj))(
            sx + duals["gl_tv"], jnp.asarray(cons.tv_Alin_x, dtype),
            jnp.asarray(cons.tv_blin_x, dtype))
        fams.append((0, nzx, _blockdiag(free_row0(DPs))))
    if spec.en_tv_input_linear:
        DPs = jax.vmap(jax.jacfwd(tv_proj))(
            su + duals["yl_tv"], jnp.asarray(cons.tv_Alin_u, dtype),
            jnp.asarray(cons.tv_blin_u, dtype))
        fams.append((nzx, (N - 1) * nu, _blockdiag(DPs)))
    return fams


def _ext_matrix(prob: TinyProblem, S, sx, su, duals, rho_b=None):
    """Linearized projection-operator fixed-point matrix for conic specs.

    Unknowns (dz, dlam, dy_f per family) satisfy::

        H dz + D' dlam + sum_f rho dy_f|_coords = -dc
        D dz = de
        (I - DP_f) dz|_coords - DP_f dy_f = 0        for each family f

    where the last rows differentiate ``z = P_f(z + y_f)``. Nonsymmetric
    (DP_f is not a projection onto the constraint tangent in general — see
    _family_dps). Returns the dense (nz+nc+n_extra)^2 matrix. ``rho_b``
    overrides the dual-coupling weight (adaptive rho: the slack families'
    linear-cost terms run at the committed final rho)."""
    spec = prob.spec
    N, nx, nu = spec.N, spec.nx, spec.nu
    nz = N * nx + (N - 1) * nu
    nc = N * nx
    dtype = S.dtype
    rho = jnp.asarray(prob.cache.rho if rho_b is None else rho_b, dtype)

    fams = _family_dps(prob, sx, su, duals)
    n_extra = sum(d for _, d, _ in fams)
    n_tot = nz + nc + n_extra
    A = jnp.zeros((n_tot, n_tot), dtype)
    A = A.at[:nz + nc, :nz + nc].set(S)
    off = nz + nc
    for coff, dim, DP in fams:
        eye = jnp.eye(dim, dtype=dtype)
        A = A.at[coff:coff + dim, off:off + dim].set(rho * eye)
        A = A.at[off:off + dim, coff:coff + dim].set(eye - DP)
        A = A.at[off:off + dim, off:off + dim].set(-DP)
        off += dim
    return A


def _dual_coord_sums(prob: TinyProblem, duals):
    """sum_f y_f per side, flattened over the z layout — the value-level
    stationarity of the effective QP reads H z + c + D' lam
    + rho (ysum_x | ysum_u) = 0 (each enabled slack family contributes its
    scaled dual on its side's coordinates; update_linear_cost's
    -rho (slack_new - dual) terms at the fixed point v_f = x)."""
    spec = prob.spec
    zeros_x = jnp.zeros((spec.N, spec.nx), duals["g"].dtype)
    zeros_u = jnp.zeros((spec.N - 1, spec.nu), duals["g"].dtype)
    ysum_x = duals["g"]
    ysum_u = duals["y"]
    if spec.en_state_soc and spec.state_cones:
        ysum_x = ysum_x + duals.get("gc", zeros_x)
    if spec.en_input_soc and spec.input_cones:
        ysum_u = ysum_u + duals.get("yc", zeros_u)
    if spec.en_state_linear:
        ysum_x = ysum_x + duals.get("gl", zeros_x)
    if spec.en_input_linear:
        ysum_u = ysum_u + duals.get("yl", zeros_u)
    if spec.en_tv_state_linear:
        ysum_x = ysum_x + duals.get("gl_tv", zeros_x)
    if spec.en_tv_input_linear:
        ysum_u = ysum_u + duals.get("yl_tv", zeros_u)
    return jnp.concatenate([ysum_x.reshape(-1), ysum_u.reshape(-1)])


def _dp_vjp_one(prob: TinyProblem, S, gx, gu, sx, su, duals,
                rho_b=None, Pinf_b=None):
    """Adjoint of the full projection-operator fixed point (conic specs):
    solve the transpose of :func:`_ext_matrix`'s system densely per
    problem. Returns (gx0, gXref, gUref) like _vjp_one. ``rho_b``/
    ``Pinf_b`` override the dual weight and terminal cost-to-go
    (adaptive rho)."""
    spec = prob.spec
    N, nx, nu = spec.N, spec.nx, spec.nu
    nzx = N * nx
    nz = nzx + (N - 1) * nu
    dtype = S.dtype
    Pinf = prob.cache.Pinf if Pinf_b is None else Pinf_b

    A = _ext_matrix(prob, S, sx, su, duals, rho_b=rho_b)
    gz = jnp.concatenate([gx.reshape(-1), gu.reshape(-1)])
    rhs = jnp.concatenate([gz, jnp.zeros(A.shape[0] - nz, dtype)])
    w = jnp.linalg.solve(A.T, rhs)

    w_x = w[:nzx].reshape(N, nx)
    w_u = w[nzx:nz].reshape(N - 1, nu)
    gXref = prob.Qdiag * w_x
    gXref = gXref.at[N - 1].set(Pinf @ w_x[N - 1])
    gUref = prob.Rdiag * w_u
    gx0 = w[nz:nz + nx]
    return gx0, gXref, gUref


def _vjp_one(prob: TinyProblem, S, m_z, gx, gu, Pinf_b=None):
    """Solve the adjoint KKT system for one problem's cotangents
    (box-only specs; conic specs go through _dp_vjp_one). ``Pinf_b``
    overrides the terminal reference row's cost-to-go (adaptive rho)."""
    spec = prob.spec
    N, nx, nu = spec.N, spec.nx, spec.nu
    nzx = N * nx
    nz = nzx + (N - 1) * nu
    dtype = S.dtype
    Pinf = prob.cache.Pinf if Pinf_b is None else Pinf_b

    m = jnp.concatenate([m_z, jnp.ones(N * nx, dtype)])
    # Pin active coordinates: zero their rows/cols, identity diagonal.
    Sm = S * m[:, None] * m[None, :] + jnp.diag(1.0 - m)

    gz = jnp.concatenate([gx.reshape(-1), gu.reshape(-1)]) * m_z
    rhs = jnp.concatenate([gz, jnp.zeros(N * nx, dtype)])
    w = jnp.linalg.solve(Sm, rhs)

    w_x = w[:nzx].reshape(N, nx)
    w_u = w[nzx:nz].reshape(N - 1, nu)
    # dL/dXref_i = Qdiag * w_x_i (c_i = -Qdiag.*Xref_i); terminal row uses
    # the Pinf' matvec of update_linear_cost (admm.py) — the *adapted*
    # Pinf_b under adaptive rho — so its adjoint is Pinf @ w.
    gXref = prob.Qdiag * w_x
    gXref = gXref.at[N - 1].set(Pinf @ w_x[N - 1])
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


_DUAL_FIELDS = ("g", "y", "gc", "yc", "gl", "yl", "gl_tv", "yl_tv")


def make_differentiable(prob: TinyProblem, state: Optional[SolverState] = None):
    """Return ``f(x0, Xref, Uref) -> Solution`` differentiable w.r.t. all
    three arguments (unbatched ``(nx,)`` or batched ``(B, nx)`` x0, with
    Xref/Uref shared ``(N, nx)``/``(N-1, nu)`` or batched likewise).

    Supports every spec the solver accepts: box-only specs use the
    symmetric pinned-KKT adjoint (:func:`_vjp_one`); conic specs (SOC /
    hyperplane / tv-hyperplane) differentiate the projection operators
    themselves (:func:`_dp_vjp_one`), which handles cone curvature, the
    reference's scaled-SOC quirk, and sequential hyperplane composition
    exactly (a.e.); consensus groups couple through the group KKT
    (:func:`_vjp_group` for box, :func:`_ext_matrix_group` — where the
    consensus projection is just one more differentiated family, the
    group mean — when combined with conic families, round 5); adaptive
    rho differentiates at the committed final per-problem rho
    (piecewise-constant treatment — module docstring).

    Gradients flow through ``Solution.x``/``Solution.u``; iteration counts
    and flags are non-differentiable bookkeeping. ``state`` optionally
    warm-starts the forward solve (the fixed point, hence the gradient, is
    unaffected).
    """
    consensus = prob.spec.en_consensus
    extra = _has_extra_families(prob.spec)
    adaptive = prob.settings.adaptive_rho
    S = None if adaptive else _kkt_matrix(prob)
    rho0 = prob.cache.rho

    def _solve(x0, Xref, Uref):
        b = x0.shape[:-1]
        st = state if state is not None else _init_state(
            prob.spec, b, prob.dtype)
        return admm.solve(prob, st, Xref=Xref, Uref=Uref, x0=x0)

    @jax.custom_vjp
    def f(x0, Xref, Uref):
        return _solve(x0, Xref, Uref)[0]

    def fwd(x0, Xref, Uref):
        sol, st, fc = _solve(x0, Xref, Uref)
        duals = {k: getattr(st, k) for k in _DUAL_FIELDS
                 if getattr(st, k, None) is not None} if extra else {}
        # Adaptive rho: save the committed final per-problem rho — the
        # adjoint differentiates at that fixed rho (piecewise-constant
        # treatment, see bwd).
        rho_b = fc.rho if adaptive else None
        return sol, (sol.x, sol.u, duals, rho_b,
                     x0.shape, Xref.shape, Uref.shape)

    def bwd(res, ct):
        sol_x, sol_u, duals, rho_b, x0_shape, xref_shape, uref_shape = res
        gx, gu = ct.x, ct.u
        batched = len(x0_shape) > 1

        if consensus:
            # Group-coupled adjoint: one pinned KKT solve per scenario
            # group (see _kkt_matrix_group) for box families, or the
            # group-extended projection system (_ext_matrix_group —
            # consensus-as-a-family) when conic families are enabled
            # (round 5); vmapped over groups.
            if len(x0_shape) != 3:
                raise ValueError("consensus diff takes x0 as "
                                 "(n_groups, group, nx)")
            G = x0_shape[1]
            Sg = None if extra else _kkt_matrix_group(prob, G)

            def one_group(sx_g, su_g, gx_g, gu_g, duals_g):
                sxm = jnp.moveaxis(sx_g, 1, 0)          # (G, N, nx)
                sum_ = jnp.moveaxis(su_g, 1, 0)
                gxm = jnp.moveaxis(gx_g, 1, 0)
                gum = jnp.moveaxis(gu_g, 1, 0)
                if extra:
                    dm = {k: jnp.moveaxis(v, 1, 0)
                          for k, v in duals_g.items()}
                    out = _dp_vjp_group(prob, S, G, sxm, sum_, dm,
                                        gxm, gum)
                    return out[0], out[1], out[2]
                m_z = jnp.concatenate([
                    _active_mask(prob, sxm[j], sum_[j]) for j in range(G)])
                return _vjp_group(prob, Sg, m_z, gxm, gum, G)[:3]

            gb = lambda a: jnp.moveaxis(a, 1, 0)    # (T,ng,G,F)->(ng,T,G,F)
            gx0, gXref, gUref = jax.vmap(one_group)(
                gb(sol_x), gb(sol_u), gb(gx), gb(gu),
                {k: gb(v) for k, v in duals.items()})
            # gx0 (ng, G, nx); gXref (ng, G, N, nx); gUref (ng, G, N-1, nu)
            gXref = (jnp.sum(gXref, axis=(0, 1)) if len(xref_shape) == 2
                     else jnp.moveaxis(gXref, 2, 0))
            gUref = (jnp.sum(gUref, axis=(0, 1)) if len(uref_shape) == 2
                     else jnp.moveaxis(gUref, 2, 0))
            return gx0, gXref, gUref

        def one(sx, su, gxi, gui, duals_i, rho_i):
            # Adaptive rho (piecewise-constant treatment): the committed
            # final rho is the fixed point the solver actually converged
            # to, so the adjoint holds it constant — the KKT matrix and
            # the Taylor cost-to-go Pinf_b are rebuilt per problem at
            # rho_i. The adaptation path's own sensitivity to the inputs
            # is deliberately excluded (it is a discrete, stride-gated
            # process); the Taylor cache additionally biases the gains
            # O((rho_b - rho0)^2) — see docs/PARITY.md "Differentiation
            # coverage".
            if adaptive:
                Pinf_b = prob.cache.Pinf + (rho_i - rho0) \
                    * prob.cache.dPinf_drho
                Si = _kkt_matrix(prob, rho_b=rho_i, Pinf_b=Pinf_b)
            else:
                Pinf_b = None
                Si = S
            if not extra:
                m_z = _active_mask(prob, sx, su)
                return _vjp_one(prob, Si, m_z, gxi, gui, Pinf_b=Pinf_b)
            return _dp_vjp_one(prob, Si, gxi, gui, sx, su, duals_i,
                               rho_b=(rho_i if adaptive else None),
                               Pinf_b=Pinf_b)

        if batched:
            # Solution arrays are (T, B, F) — move batch in front for vmap.
            tb = lambda a: jnp.moveaxis(a, 1, 0)
            gx0, gXref, gUref = jax.vmap(one)(
                tb(sol_x), tb(sol_u), tb(gx), tb(gu),
                {k: tb(v) for k, v in duals.items()},
                rho_b if adaptive else jnp.zeros(x0_shape[0], sol_x.dtype))
            # Shared (unbatched) references accumulate over the batch.
            gXref = (jnp.sum(gXref, axis=0) if len(xref_shape) == 2
                     else jnp.moveaxis(gXref, 0, 1))
            gUref = (jnp.sum(gUref, axis=0) if len(uref_shape) == 2
                     else jnp.moveaxis(gUref, 0, 1))
        else:
            gx0, gXref, gUref = one(
                sol_x, sol_u, gx, gu, duals,
                rho_b if adaptive else jnp.zeros((), sol_x.dtype))
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

    ``template`` supplies rho, horizon, constraints, and settings; its own
    A/B/Q/R/f are ignored. The cache is recomputed at ``riccati_tol``
    (much tighter than the solver default 1e-5) so the fixed-point
    assumption holds to gradient accuracy. Unbatched or batched x0, like
    :func:`make_differentiable`.

    Supports every fixed-rho spec family: box specs use the pinned-KKT
    adjoint, conic specs (SOC / hyperplane / tv-hyperplane) the
    projection-Jacobian extended system — the dynamics multipliers the
    parameter cotangents contract against are recovered from the
    value-level stationarity ``H z + c + D' lam + rho sum_f y_f = 0``
    using the solver's converged duals (see :func:`_dual_coord_sums`) —
    and consensus groups (round 5) run the group adjoint with per-member
    value solves carrying the consensus force ``rho_c yc0`` on the u_0
    rows. Adaptive rho raises with the written reason
    (:func:`_params_diff_supported`).
    """
    if not _params_diff_supported(template):
        raise ValueError(
            "make_differentiable_params does not differentiate adaptive-"
            "rho specs: the committed rho depends on (A, B, Q, R) through "
            "every OSQP residual the adaptation measured and through the "
            "sensitivity tables themselves, and the adapted terminal "
            "cost-to-go would need the DARE implicit pass at rho_b where "
            "the solver only holds a first-order Taylor cache — see "
            "_params_diff_supported / docs/PARITY.md 'Differentiation "
            "coverage'. Solve-input gradients for adaptive specs are "
            "available via make_differentiable.")
    rho = template.cache.rho
    spec = template.spec
    N, nx, nu = spec.N, spec.nx, spec.nu
    nzx = N * nx
    extra = _has_extra_families(spec)
    consensus = spec.en_consensus

    def build(A, B, Q, R, f):
        dtype = template.dtype
        A = jnp.asarray(A, dtype)
        B = jnp.asarray(B, dtype)
        Qd = jnp.asarray(Q, dtype) + rho      # tiny_setup's work->Q
        Rd = jnp.asarray(R, dtype) + rho
        f = jnp.asarray(f, dtype)
        cache = precompute_cache(A, B, f, Qd, Rd, rho, tol=riccati_tol,
                                 max_iters=100_000)
        prob = template.replace(A=A, B=B, f=f, Qdiag=Qd, Rdiag=Rd,
                                cache=cache)
        if consensus:
            # The step-0 consensus gain pair derives from the rebuilt
            # cache (with_consensus's bake, api._bake_consensus_gains).
            from .api import _bake_consensus_gains
            prob = prob.replace(cache=_bake_consensus_gains(
                prob, template.settings.consensus_rho))
        return prob

    def _solve(prob, x0, Xref, Uref):
        st = _init_state(prob.spec, x0.shape[:-1], prob.dtype)
        sol, st, _ = admm.solve(prob, st, Xref=Xref, Uref=Uref, x0=x0)
        return sol, st

    @jax.custom_vjp
    def g(A, B, Q, R, f, x0, Xref, Uref):
        return _solve(build(A, B, Q, R, f), x0, Xref, Uref)[0]

    def fwd(A, B, Q, R, f, x0, Xref, Uref):
        prob = build(A, B, Q, R, f)
        sol, st = _solve(prob, x0, Xref, Uref)
        duals = {k: getattr(st, k) for k in _DUAL_FIELDS
                 if getattr(st, k, None) is not None} if extra else {}
        if consensus:
            # The consensus force rho_c * yc0 enters the value-level
            # stationarity the multipliers are recovered from.
            duals = dict(duals, yc0=st.yc0)
        return sol, (prob, sol.x, sol.u, duals, x0, Xref, Uref,
                     x0.shape, Xref.shape, Uref.shape)

    def bwd(res, ct):
        (prob, sol_x, sol_u, duals, x0, Xref, Uref,
         x0_shape, xref_shape, uref_shape) = res
        S = _kkt_matrix(prob)
        batched = len(x0_shape) > 1
        nz = nzx + (N - 1) * nu

        def one_box(sx, su, gxi, gui, x0i, Xrefi, Urefi):
            """Adjoint + multipliers via the pinned KKT system."""
            m_z = _active_mask(prob, sx, su)
            c, e = _cvec_evec(prob, Xrefi, Urefi, x0i)
            gx0, gXref, gUref = _vjp_one(prob, S, m_z, gxi, gui)
            m = jnp.concatenate([m_z, jnp.ones(N * nx, S.dtype)])
            Sm = S * m[:, None] * m[None, :] + jnp.diag(1.0 - m)
            gz = jnp.concatenate([gxi.reshape(-1), gui.reshape(-1)]) * m_z
            w = jnp.linalg.solve(
                Sm, jnp.concatenate([gz, jnp.zeros(N * nx, S.dtype)]))
            w_x = w[:nzx].reshape(N, nx)
            w_u = w[nzx:nz].reshape(N - 1, nu)
            w_lam = w[nz:].reshape(N, nx)
            zv, lam = _kkt_values(prob, S, m_z, sx, su, c, e)
            lam = lam.reshape(N, nx)
            return gx0, gXref, gUref, w_x, w_u, w_lam, lam

        def one_conic(sx, su, gxi, gui, x0i, Xrefi, Urefi, duals_i):
            """Adjoint through the extended projection-Jacobian system;
            multipliers from the value-level stationarity with the
            solver's converged family duals."""
            A_ext = _ext_matrix(prob, S, sx, su, duals_i)
            gz = jnp.concatenate([gxi.reshape(-1), gui.reshape(-1)])
            rhs = jnp.concatenate(
                [gz, jnp.zeros(A_ext.shape[0] - nz, S.dtype)])
            w = jnp.linalg.solve(A_ext.T, rhs)
            w_x = w[:nzx].reshape(N, nx)
            w_u = w[nzx:nz].reshape(N - 1, nu)
            w_lam = w[nz:nz + N * nx].reshape(N, nx)
            gXref = prob.Qdiag * w_x
            gXref = gXref.at[N - 1].set(prob.cache.Pinf @ w_x[N - 1])
            gUref = prob.Rdiag * w_u
            gx0 = w[nz:nz + nx]

            # Value solve: H z + c + D' lam + rho ysum = 0 and D z = e is
            # square and nonsingular; its z-part reproduces the solver's
            # solution, its lam-part is the dynamics multipliers.
            c, e = _cvec_evec(prob, Xrefi, Urefi, x0i)
            ysum = _dual_coord_sums(prob, duals_i)
            rho_ = jnp.asarray(prob.cache.rho, S.dtype)
            wv = jnp.linalg.solve(
                S, jnp.concatenate([-c - rho_ * ysum, e]))
            lam = wv[nz:].reshape(N, nx)
            return gx0, gXref, gUref, w_x, w_u, w_lam, lam

        def contract(sx, su, Xrefi, Urefi, w_x, w_u, w_lam, lam):
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
            # Terminal block: Pterm = Pinf - n_fam rho I multiplies x_{N-1}
            # in H; c_{N-1} = -Pinf' Xref_{N-1}.
            Pbar = (-jnp.outer(w_x[-1], sx[-1])
                    + jnp.outer(Xrefi[-1], w_x[-1]))
            return Abar, Bbar, fbar, Qdbar, Rdbar, Pbar

        def one(sx, su, gxi, gui, x0i, Xrefi, Urefi, duals_i):
            if extra:
                gx0, gXref, gUref, w_x, w_u, w_lam, lam = one_conic(
                    sx, su, gxi, gui, x0i, Xrefi, Urefi, duals_i)
            else:
                gx0, gXref, gUref, w_x, w_u, w_lam, lam = one_box(
                    sx, su, gxi, gui, x0i, Xrefi, Urefi)
            return (gx0, gXref, gUref,
                    *contract(sx, su, Xrefi, Urefi, w_x, w_u, w_lam, lam))

        if consensus:
            # Scenario groups (round 5): the group adjoint supplies the
            # per-member (w_x, w_u, w_lam); the value-level multipliers
            # come from *per-member* solves with the consensus force
            # rho_c * yc0 on the u_0 rows (the known converged dual —
            # the group coupling enters the value system only through
            # it), then the standard parameter contraction runs per
            # member and sums.
            if len(x0_shape) != 3:
                raise ValueError("consensus params diff takes x0 as "
                                 "(n_groups, group, nx)")
            G = x0_shape[1]
            Sg = None if extra else _kkt_matrix_group(prob, G)
            rho_c = jnp.asarray(_consensus_rho(prob), S.dtype)
            rho_ = jnp.asarray(prob.cache.rho, S.dtype)

            def lam_one(sx, su, x0i, Xrefi, Urefi, yc0_j, duals_j):
                c, e = _cvec_evec(prob, Xrefi, Urefi, x0i)
                c = c.at[nzx:nzx + nu].add(rho_c * yc0_j)
                if extra:
                    ysum = _dual_coord_sums(prob, duals_j)
                    wv = jnp.linalg.solve(
                        S, jnp.concatenate([-c - rho_ * ysum, e]))
                    return wv[nz:].reshape(N, nx)
                m_z = _active_mask(prob, sx, su)
                _, lam = _kkt_values(prob, S, m_z, sx, su, c, e)
                return lam.reshape(N, nx)

            def one_group(sx_g, su_g, gx_g, gu_g, x0_g, Xref_g, Uref_g,
                          duals_g):
                mf = lambda a: jnp.moveaxis(a, 1, 0)   # (T,G,F)->(G,T,F)
                sxm, sum_ = mf(sx_g), mf(su_g)
                gxm, gum = mf(gx_g), mf(gu_g)
                Xm, Um = mf(Xref_g), mf(Uref_g)
                yc0_g = duals_g["yc0"]                  # (G, nu)
                fam_d = {k: mf(v) for k, v in duals_g.items()
                         if k != "yc0"}
                if extra:
                    gx0, gXref, gUref, w_x, w_u, w_lam = _dp_vjp_group(
                        prob, S, G, sxm, sum_, fam_d, gxm, gum)
                else:
                    m_z = jnp.concatenate([
                        _active_mask(prob, sxm[j], sum_[j])
                        for j in range(G)])
                    gx0, gXref, gUref, w_x, w_u, w_lam = _vjp_group(
                        prob, Sg, m_z, gxm, gum, G)
                outs = [contract(
                    sxm[j], sum_[j], Xm[j], Um[j], w_x[j], w_u[j],
                    w_lam[j],
                    lam_one(sxm[j], sum_[j], x0_g[j], Xm[j], Um[j],
                            yc0_g[j], {k: v[j] for k, v in fam_d.items()}))
                    for j in range(G)]
                sums = [sum(ts) for ts in zip(*outs)]
                return (gx0, gXref, gUref, *sums)

            gb = lambda a: jnp.moveaxis(a, 1, 0)  # (T,ng,G,F)->(ng,T,G,F)
            ng = x0_shape[0]
            bXref = (Xref if len(xref_shape) == 4
                     else jnp.broadcast_to(Xref[:, None, None],
                                           (N, ng, G, nx)))
            bUref = (Uref if len(uref_shape) == 4
                     else jnp.broadcast_to(Uref[:, None, None],
                                           (N - 1, ng, G, nu)))
            outs = jax.vmap(one_group)(
                gb(sol_x), gb(sol_u), gb(ct.x), gb(ct.u), x0,
                gb(bXref), gb(bUref),
                {k: (v if k == "yc0" else gb(v))
                 for k, v in duals.items()})
            gx0 = outs[0]
            gXref = (jnp.sum(outs[1], axis=(0, 1)) if len(xref_shape) == 2
                     else jnp.moveaxis(outs[1], 2, 0))
            gUref = (jnp.sum(outs[2], axis=(0, 1)) if len(uref_shape) == 2
                     else jnp.moveaxis(outs[2], 2, 0))
            Abar, Bbar, fbar, Qdbar, Rdbar, Pbar = [
                jnp.sum(o, axis=0) for o in outs[3:]]
        elif batched:
            tb = lambda a: jnp.moveaxis(a, 1, 0)
            Bn = x0_shape[0]
            bXref = (Xref if len(xref_shape) == 3
                     else jnp.broadcast_to(Xref[:, None], (N, Bn, nx)))
            bUref = (Uref if len(uref_shape) == 3
                     else jnp.broadcast_to(Uref[:, None], (N - 1, Bn, nu)))
            outs = jax.vmap(one)(tb(sol_x), tb(sol_u), tb(ct.x), tb(ct.u),
                                 x0, tb(bXref), tb(bUref),
                                 {k: tb(v) for k, v in duals.items()})
            gx0 = outs[0]
            gXref = (jnp.sum(outs[1], axis=0) if len(xref_shape) == 2
                     else jnp.moveaxis(outs[1], 0, 1))
            gUref = (jnp.sum(outs[2], axis=0) if len(uref_shape) == 2
                     else jnp.moveaxis(outs[2], 0, 1))
            Abar, Bbar, fbar, Qdbar, Rdbar, Pbar = [
                jnp.sum(o, axis=0) for o in outs[3:]]
        else:
            (gx0, gXref, gUref, Abar, Bbar, fbar, Qdbar, Rdbar,
             Pbar) = one(sol_x, sol_u, ct.x, ct.u, x0, Xref, Uref, duals)

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
