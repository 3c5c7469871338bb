"""User-facing functional API.

The reference exposes mutating setters on a heap-allocated solver
(/root/reference/src/tinympc/tiny_api.cpp). Here a problem is built by pure
constructors and solved by a jitted pure function; "setters" become either
builder methods returning a new :class:`TinyProblem` (constraints, settings)
or per-call arguments (x0, Xref, Uref — the functional ``tiny_set_x0`` /
``tiny_set_x_ref`` / ``tiny_set_u_ref``, tiny_api.cpp:443-477).

    prob = setup(A, B, Q, R, rho=5.0, N=10)          # tiny_setup
    prob = prob.with_bounds(x_min=-5, x_max=5, u_min=-0.5, u_max=0.5)
    state = init_state(prob)
    sol, state, cache = solve(prob, state, x0=x0, Xref=Xref)

Deviation from the reference (documented): ``tiny_set_cone_constraints`` /
``tiny_set_linear_constraints`` do **not** flip the matching ``en_*`` flags
(tiny_api.cpp:176-304; the examples flip them manually, and the rocket
example forgets to). The builders here enable the family they configure
unless ``enable=False`` is passed.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import admm
from .riccati import precompute_cache, compute_sensitivities
from .types import (
    Cache, ConstraintData, ProblemSpec, Settings, SolverState, Solution,
    TinyProblem,
)
from .types import init_state as _init_state_spec


def _as_diag(M, n, dtype):
    """Accept a diagonal vector or a full matrix; full matrices contribute
    only their diagonal, exactly like tiny_setup (tiny_api.cpp:117-118)."""
    M = jnp.asarray(M, dtype)
    return jnp.diagonal(M) if M.ndim == 2 else M


def setup(A, B, Q, R, rho, N, f=None, *, settings: Settings = Settings(),
          dtype=None) -> TinyProblem:
    """Build a problem + Riccati cache (reference tiny_setup, tiny_api.cpp:21-147)."""
    if dtype is None:
        dtype = jnp.asarray(A).dtype
        if dtype not in (jnp.float32, jnp.float64):
            dtype = jnp.float32
    A = jnp.asarray(A, dtype)
    B = jnp.asarray(B, dtype)
    nx, nu = B.shape
    f = jnp.zeros(nx, dtype) if f is None else jnp.asarray(f, dtype).reshape(nx)
    Qdiag = _as_diag(Q, nx, dtype)
    Rdiag = _as_diag(R, nu, dtype)
    rho = jnp.asarray(rho, dtype)

    # work->Q = (Q + rho*I).diagonal() (tiny_api.cpp:117-118)
    Qdiag_aug = Qdiag + rho
    Rdiag_aug = Rdiag + rho
    cache = precompute_cache(A, B, f, Qdiag_aug, Rdiag_aug, rho)

    spec = ProblemSpec(nx=nx, nu=nu, N=N)
    # Bounds default to +-inf (identity projection) rather than the
    # reference's uninitialised empty matrices.
    inf = jnp.asarray(jnp.inf, dtype)
    cons = ConstraintData(
        x_min=jnp.full((N, nx), -inf), x_max=jnp.full((N, nx), inf),
        u_min=jnp.full((N - 1, nu), -inf), u_max=jnp.full((N - 1, nu), inf),
    )
    prob = TinyProblem(A=A, B=B, f=f, Qdiag=Qdiag_aug, Rdiag=Rdiag_aug,
                       cache=cache, cons=cons, spec=spec, settings=settings)
    if settings.adaptive_rho and cache.dKinf_drho is None:
        prob = with_sensitivities(prob)
    return prob


def _bcast(v, shape, dtype):
    v = jnp.asarray(v, dtype)
    return jnp.broadcast_to(v, shape)


def with_bounds(prob: TinyProblem, x_min=None, x_max=None, u_min=None,
                u_max=None, enable: bool = True) -> TinyProblem:
    """Box constraints (tiny_set_bound_constraints, tiny_api.cpp:149-174).
    Scalars and (nx,) rows broadcast over the horizon."""
    spec, dt = prob.spec, prob.dtype
    xs, us = (spec.N, spec.nx), (spec.N - 1, spec.nu)
    cons = dataclasses.replace(
        prob.cons,
        x_min=_bcast(x_min, xs, dt) if x_min is not None else prob.cons.x_min,
        x_max=_bcast(x_max, xs, dt) if x_max is not None else prob.cons.x_max,
        u_min=_bcast(u_min, us, dt) if u_min is not None else prob.cons.u_min,
        u_max=_bcast(u_max, us, dt) if u_max is not None else prob.cons.u_max,
    )
    spec = dataclasses.replace(spec, en_state_bound=enable, en_input_bound=enable)
    return prob.replace(cons=cons, spec=spec)


def with_cones(prob: TinyProblem,
               state_cones: Sequence[Tuple[int, int, float]] = (),
               input_cones: Sequence[Tuple[int, int, float]] = (),
               enable: bool = True) -> TinyProblem:
    """Second-order cones as (start, dim, mu) triples
    (tiny_set_cone_constraints, tiny_api.cpp:176-208; layout types.hpp:124-131).
    Any cone dimension is supported (the reference aborts for dim != 3,
    admm.cpp:53)."""
    dt = prob.dtype
    sc = tuple((int(s), int(d)) for s, d, _ in state_cones)
    ic = tuple((int(s), int(d)) for s, d, _ in input_cones)
    cons = dataclasses.replace(
        prob.cons,
        cx=jnp.asarray([m for _, _, m in state_cones], dt) if state_cones else None,
        cu=jnp.asarray([m for _, _, m in input_cones], dt) if input_cones else None,
    )
    spec = dataclasses.replace(
        prob.spec, state_cones=sc, input_cones=ic,
        en_state_soc=enable and bool(sc), en_input_soc=enable and bool(ic),
    )
    return prob.replace(cons=cons, spec=spec)


def with_linear_constraints(prob: TinyProblem, Alin_x=None, blin_x=None,
                            Alin_u=None, blin_u=None,
                            enable: bool = True) -> TinyProblem:
    """Static hyperplane constraints a.x <= b
    (tiny_set_linear_constraints, tiny_api.cpp:210-252)."""
    dt = prob.dtype
    upd = {}
    nsl = nil = 0
    if Alin_x is not None:
        Alin_x = jnp.atleast_2d(jnp.asarray(Alin_x, dt))
        nsl = Alin_x.shape[0]
        upd.update(Alin_x=Alin_x, blin_x=jnp.asarray(blin_x, dt).reshape(nsl))
    if Alin_u is not None:
        Alin_u = jnp.atleast_2d(jnp.asarray(Alin_u, dt))
        nil = Alin_u.shape[0]
        upd.update(Alin_u=Alin_u, blin_u=jnp.asarray(blin_u, dt).reshape(nil))
    spec = dataclasses.replace(
        prob.spec, num_state_linear=nsl, num_input_linear=nil,
        en_state_linear=enable and nsl > 0, en_input_linear=enable and nil > 0,
    )
    return prob.replace(cons=dataclasses.replace(prob.cons, **upd), spec=spec)


def with_tv_linear_constraints(prob: TinyProblem, tv_Alin_x=None, tv_blin_x=None,
                               tv_Alin_u=None, tv_blin_u=None,
                               enable: bool = True) -> TinyProblem:
    """Time-varying hyperplanes (tiny_set_tv_linear_constraints,
    tiny_api.cpp:254-304). Natural layout: ``tv_Alin_x`` is (N, S, nx) and
    ``tv_blin_x`` is (N, S) — use :func:`tv_from_stacked` to convert the
    reference's stacked ((S*N) x nx) / (S x N) arrays."""
    dt = prob.dtype
    upd = {}
    ns = ni = 0
    if tv_Alin_x is not None:
        tv_Alin_x = jnp.asarray(tv_Alin_x, dt)
        ns = tv_Alin_x.shape[1]
        upd.update(tv_Alin_x=tv_Alin_x,
                   tv_blin_x=jnp.asarray(tv_blin_x, dt).reshape(prob.spec.N, ns))
    if tv_Alin_u is not None:
        tv_Alin_u = jnp.asarray(tv_Alin_u, dt)
        ni = tv_Alin_u.shape[1]
        upd.update(tv_Alin_u=tv_Alin_u,
                   tv_blin_u=jnp.asarray(tv_blin_u, dt).reshape(prob.spec.N - 1, ni))
    spec = dataclasses.replace(
        prob.spec, num_tv_state_linear=ns, num_tv_input_linear=ni,
        en_tv_state_linear=enable and ns > 0, en_tv_input_linear=enable and ni > 0,
    )
    return prob.replace(cons=dataclasses.replace(prob.cons, **upd), spec=spec)


def tv_from_stacked(A_stacked, b_stacked):
    """Convert the reference's stacked tv layout (types.hpp:170-173):
    A ((S*T) x n) with row (S*t + k) and b (S x T) -> (T, S, n), (T, S)."""
    A_stacked = np.asarray(A_stacked)
    b_stacked = np.asarray(b_stacked)
    S, T = b_stacked.shape
    return A_stacked.reshape(T, S, -1), b_stacked.T.copy()


def with_consensus(prob: TinyProblem, enable: bool = True,
                   axis_name: Optional[str] = None,
                   rho_c: Optional[float] = None) -> TinyProblem:
    """Scenario-tree consensus ADMM on the first control input: all
    problems in the scenario group (the last batch axis, optionally
    combined with a named mesh axis for sharded groups) are driven to a
    common u[0]. No reference analog (the reference is single-problem,
    SURVEY.md §2.4); this is the coupled-scenario capability of the
    BASELINE north star.

    ``rho_c`` is the consensus penalty weight (default: the problem's rho).
    The prox is exact: because the consensus slack touches only u[0], its
    rho_c*I quadratic term changes nothing but the first backward/forward
    step under the stationary cost-to-go Pinf, so this builder bakes the
    dedicated step-0 gain pair Quu0_inv = (R1 + rho_c I + B'Pinf B)^-1,
    Kinf0 = Quu0_inv B'Pinf A into the cache — unlike the reference's
    extra constraint families, which share the single rho-augmented
    quadratic and act as under-weighted prox terms.
    """
    if enable and prob.settings.adaptive_rho:
        raise ValueError("consensus is not compatible with adaptive_rho "
                         "(the Taylor cache update does not track the "
                         "consensus step-0 gains); pick one")
    spec = dataclasses.replace(prob.spec, en_consensus=enable)
    settings = dataclasses.replace(prob.settings, consensus_axis_name=axis_name,
                                   consensus_rho=(None if rho_c is None
                                                  else float(rho_c)))
    upd = {}
    if enable:
        upd["cache"] = _bake_consensus_gains(prob, rho_c)
    return prob.replace(spec=spec, settings=settings, **upd)


def _bake_consensus_gains(prob: TinyProblem, rho_c):
    """Compute the consensus step-0 gain pair into a new cache."""
    c = prob.cache
    dt = prob.dtype
    rc = jnp.asarray(c.rho if rho_c is None else rho_c, dt)
    # R1 as the cache's Riccati iteration saw it: the once-augmented
    # Rdiag plus the second rho*I (tiny_api.cpp:317-318 parity).
    Raug2 = jnp.diag(prob.Rdiag) + c.rho * jnp.eye(prob.spec.nu, dtype=dt)
    BtP = prob.B.T @ c.Pinf
    Quu0_inv = jnp.linalg.inv(
        Raug2 + rc * jnp.eye(prob.spec.nu, dtype=dt) + BtP @ prob.B)
    Kinf0 = Quu0_inv @ (BtP @ prob.A)
    return dataclasses.replace(c, Kinf0=Kinf0, Quu0_inv=Quu0_inv)


def with_settings(prob: TinyProblem, **kw) -> TinyProblem:
    """Override settings fields (tiny_update_settings, tiny_api.cpp:388-411)."""
    prob = prob.replace(settings=dataclasses.replace(prob.settings, **kw))
    if "consensus_rho" in kw and prob.spec.en_consensus:
        # The consensus weight is baked into the step-0 gain pair; changing
        # it without rebaking would desynchronize the linear term from the
        # quadratic and diverge.
        prob = prob.replace(
            cache=_bake_consensus_gains(prob, prob.settings.consensus_rho))
    if prob.settings.horizon_parallel and prob.settings.adaptive_rho:
        raise ValueError(
            "horizon_parallel requires an unbatched cache and is not "
            "compatible with adaptive_rho (which makes the cache "
            "per-problem); pick one")
    if prob.settings.adaptive_rho and prob.spec.en_consensus:
        raise ValueError("consensus is not compatible with adaptive_rho "
                         "(the Taylor cache update does not track the "
                         "consensus step-0 gains); pick one")
    if prob.settings.adaptive_rho_tolerance < 1.0:
        raise ValueError(
            "adaptive_rho_tolerance must be >= 1 (1.0 = the reference's "
            "unconditional adaptation; >1 = OSQP guard, commit only when "
            "the step factor crosses the tolerance)")
    if prob.settings.coarse_iters < 0:
        raise ValueError("coarse_iters must be >= 0 (0 disables the "
                         "mixed-precision schedule)")
    if prob.settings.adaptive_rho and prob.cache.dKinf_drho is None:
        prob = with_sensitivities(prob)
    return prob


def with_sensitivities(prob: TinyProblem, tables=None) -> TinyProblem:
    """Attach d{Kinf,Pinf,C1,C2}/drho for adaptive rho.

    By default they are computed for *this* system by autodiff of the
    Riccati fixed point (riccati.compute_sensitivities) — the general
    version of the reference's quadrotor-only hard-coded tables
    (tiny_initialize_sensitivity_matrices, tiny_api.cpp:479-540). Pass
    ``tables=(dKinf, dPinf, dC1, dC2)`` to use explicit values (e.g.
    :func:`tinympc_tpu.systems.crazyflie_sensitivity_tables` for bit-parity
    with the reference)."""
    if tables is None:
        Qdiag_user = prob.Qdiag - prob.cache.rho   # undo the setup augmentation
        Rdiag_user = prob.Rdiag - prob.cache.rho
        tables = compute_sensitivities(
            prob.A, prob.B, prob.f, Qdiag_user, Rdiag_user, prob.cache.rho
        )
    dK, dP, dC1, dC2 = (jnp.asarray(t, prob.dtype) for t in tables)
    cache = dataclasses.replace(
        prob.cache, dKinf_drho=dK, dPinf_drho=dP, dC1_drho=dC1, dC2_drho=dC2
    )
    return prob.replace(cache=cache)


def describe(prob: TinyProblem, matrices: bool = True) -> str:
    """Human-readable dump of a configured problem — the reference's
    verbose setup diagnostics (tiny_setup's verbose path prints the
    computed cache, tiny_api.cpp:321-327,359-368). Returns a string;
    print it (or use ``compat.TinyMPC.setup(verbose=2)``).

    ``matrices=False`` limits the dump to dimensions, settings, and
    enabled constraint families.
    """
    import numpy as np
    spec, st, c = prob.spec, prob.settings, prob.cache
    lines = [
        f"TinyProblem: nx={spec.nx} nu={spec.nu} N={spec.N} "
        f"dtype={np.asarray(prob.A).dtype}",
        f"settings: rho={float(np.asarray(c.rho)):g} "
        f"abs_pri_tol={st.abs_pri_tol:g} abs_dua_tol={st.abs_dua_tol:g} "
        f"max_iter={st.max_iter} check_termination={st.check_termination}",
        f"          adaptive_rho={st.adaptive_rho} "
        f"horizon_parallel={st.horizon_parallel} "
        f"matmul_precision={st.matmul_precision!r}",
    ]
    fams = []
    if spec.en_state_bound:
        fams.append("state bounds")
    if spec.en_input_bound:
        fams.append("input bounds")
    if spec.enabled_state_cones:
        fams.append(f"state SOC x{len(spec.state_cones)}")
    if spec.enabled_input_cones:
        fams.append(f"input SOC x{len(spec.input_cones)}")
    if spec.n_state_lin:
        fams.append(f"state hyperplanes x{spec.n_state_lin}")
    if spec.n_input_lin:
        fams.append(f"input hyperplanes x{spec.n_input_lin}")
    if spec.n_tv_state_lin:
        fams.append(f"tv state hyperplanes x{spec.n_tv_state_lin}")
    if spec.n_tv_input_lin:
        fams.append(f"tv input hyperplanes x{spec.n_tv_input_lin}")
    if spec.en_consensus:
        fams.append("consensus")
    lines.append("constraint families: " + (", ".join(fams) or "none"))
    if matrices:
        def mat(name, M):
            if M is None:
                return
            a = np.asarray(M)
            with np.printoptions(precision=4, suppress=True, linewidth=100):
                body = str(a)
            lines.append(f"{name} {a.shape}:")
            lines.extend("  " + ln for ln in body.splitlines())
        # The cache the reference's verbose path prints
        # (tiny_api.cpp:321-327, 359-368).
        mat("Kinf", c.Kinf)
        mat("Pinf", c.Pinf)
        mat("Quu_inv", c.Quu_inv)
        mat("AmBKt", c.AmBKt)
        mat("APf", c.APf)
        mat("BPf", c.BPf)
        if st.adaptive_rho and c.dKinf_drho is not None:
            mat("dKinf_drho", c.dKinf_drho)
            mat("dPinf_drho", c.dPinf_drho)
    return "\n".join(lines)


def init_state(prob: TinyProblem, batch_shape: Tuple[int, ...] = ()) -> SolverState:
    """Zero workspace for this problem (tiny_setup's zero-init,
    tiny_api.cpp:68-133)."""
    return _init_state_spec(prob.spec, batch_shape, prob.dtype)


# The jitted solve. TinyProblem's spec/settings are pytree *metadata*, so
# jax.jit specialises on them with no static_argnums bookkeeping.
solve = jax.jit(admm.solve)
solve_ = admm.solve  # unjitted, for tests/debugging
