"""The ADMM solve loop, TPU-native.

Re-architecture of /root/reference/src/tinympc/admm.cpp. Structural map
(reference -> here):

  backward_pass_grad (admm.cpp:13-20)   -> :func:`backward_pass`  (lax.scan, reverse)
  forward_pass       (admm.cpp:25-32)   -> :func:`forward_pass`   (lax.scan)
  update_slack       (admm.cpp:81-213)  -> :func:`update_slack`   (vectorised wheres)
  update_dual        (admm.cpp:219-256) -> :func:`update_dual`
  update_linear_cost (admm.cpp:262-304) -> :func:`update_linear_cost`
  termination_condition (admm.cpp:310-328) -> :func:`compute_residuals`
  solve              (admm.cpp:331-455) -> :func:`solve`          (lax.while_loop)

Key inversions vs the reference:
  * One compiled program per (spec, settings); constraint-family ``if``\\ s
    resolve at trace time.
  * Arbitrary batch shape ``*b`` rides along every array (see types.py for
    the layout); convergence is tracked per problem and converged problems
    freeze (masked commit) so per-problem iteration counts match a
    single-problem solve exactly. The global loop exits when every problem
    in the batch converged or ``max_iter`` is reached.
  * No printing, no mutation: the final state (including warm-start iterates
    carried to the next solve) is returned.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .projections import project_box, project_soc
from .rho_adapt import predict_rho, telescoped_osqp_residuals
from .types import (
    Cache, ConstraintData, ProblemSpec, Settings, SolverState, Solution,
    TinyProblem, TINY_SOLVED, TINY_UNSOLVED, matmul_precision_ctx,
)


class Telescope(NamedTuple):
    """Per-problem adaptive-rho cache view that never materialises.

    The Taylor update is linear in rho (``M_b = M_base + drho_b * dM/drho``
    exactly, however many adaptations ran — the deltas telescope), so the
    per-problem matrices the reference mutates in place
    (rho_benchmark.cpp:199-212) decompose into the *shared* base matvec
    plus a drho-scaled sensitivity matvec. The batched XLA solve carries
    only the (*b,) rho row through the loop instead of O(B*nx^2) cache
    copies — the same trick as the fused kernel's in-kernel adaptation
    (kernels/admm_pallas.py), applied at the XLA level.

    ``dC1``/``dC2`` are None unless ``Settings.adaptive_rho_apply_c``
    retargets the matrices the sweeps actually read (the reference only
    updates the unused C1/C2 aliases, rho_benchmark.cpp:204-209 vs
    admm.cpp:17-18).
    """
    drho: jax.Array                 # (*b,) rho_b - rho_base
    dK: jax.Array                   # dKinf/drho
    dP: jax.Array                   # dPinf/drho
    dC1: Optional[jax.Array] = None  # dQuu_inv/drho when apply_c
    dC2: Optional[jax.Array] = None  # dAmBKt/drho when apply_c


# ---------------------------------------------------------------- helpers

def mv(M, v):
    """M @ v with batch broadcasting: M (..., i, j), v (..., j) -> (..., i)."""
    return jnp.einsum("...ij,...j->...i", M, v)


def mtv(M, v):
    """M.T @ v with batch broadcasting."""
    return jnp.einsum("...ji,...j->...i", M, v)


# Hand-rolled 3-pass bf16 matmuls for Settings.matmul_precision == "high".
# XLA's native bf16_3x does not deliver 3-pass accuracy on these
# small-matrix sweeps (see types.matmul_precision_ctx); this is the same
# scheme the fused kernel hand-rolls (kernels/admm_pallas.py): operands
# split into bf16 hi/lo pairs, the lo*lo term dropped, and the three
# passes stacked along the contraction axis so they ride one dot —
# [Mhi | Mhi | Mlo] @ [vhi; vlo; vhi], ~16 mantissa bits.
#
# The optimization_barrier on the hi half is load-bearing: without it
# XLA's algebraic simplifier folds the residual computation
# ``v - f32(bf16(v))`` away (measured: the jitted pipeline degrades to
# single-pass accuracy, 2.9e-2 vs 5.3e-5 error on a (16,12)@(12,4)
# probe). This folding is very likely why XLA's own bf16_3x emission
# misbehaves at these shapes; the barrier makes the split opaque to the
# simplifier. Mosaic compiles the fused kernel's identical split without
# interference, so the kernel needs no barrier.

def _b3_split(a):
    hi = jax.lax.optimization_barrier(a.astype(jnp.bfloat16))
    lo = (a - hi.astype(a.dtype)).astype(jnp.bfloat16)
    return hi, lo


def _b3_prep(M):
    hi, lo = _b3_split(jnp.asarray(M))
    return jnp.concatenate([hi, hi, lo], axis=-1)


def _b3_vsplit(v):
    hi, lo = _b3_split(v)
    return jnp.concatenate([hi, lo, hi], axis=-1)


def _b3_dot(Mp, vs):
    return jnp.einsum("...ij,...j->...i", Mp, vs,
                      precision=jax.lax.Precision.DEFAULT,
                      preferred_element_type=jnp.float32)


def _sweep_mm(mm3: bool):
    """(prep, vsplit, dot) triple for the sweep matvecs: 3-pass bf16 when
    ``mm3``, ambient-precision einsum otherwise."""
    if mm3:
        return _b3_prep, _b3_vsplit, _b3_dot
    return (lambda M: M), (lambda v: v), mv


def _emid(a, nb: int):
    """Insert ``nb`` singleton batch axes after the leading (time) axis so an
    unbatched (T, F) constraint table broadcasts against (T, *b, F) state."""
    if nb == 0 or a is None:
        return a
    return jax.lax.expand_dims(a, tuple(range(1, nb + 1)))


def _maxabs_tf(a):
    """max|a| over the time and feature axes, keeping batch axes: (T, *b, F) -> (*b,)."""
    return jnp.max(jnp.abs(a), axis=(0, a.ndim - 1))


def _rho_b(rho):
    """Reshape rho (() or (*b,)) to broadcast against (T, *b, F) arrays."""
    return jnp.asarray(rho)[..., None]


def _where_tf(mask, new, old):
    """Masked commit for a (T, *b, F) leaf given a (*b,) mask."""
    return jnp.where(mask[None, ..., None], new, old)


# ----------------------------------------------------------- linear cost

def update_linear_cost(spec: ProblemSpec, prob: TinyProblem, state: SolverState,
                       Xref, Uref, tel: Optional[Telescope] = None
                       ) -> SolverState:
    """q/r/p[N-1] from references, slacks, and duals (admm.cpp:262-304).

    ``tel`` (adaptive rho) telescopes the per-problem Pinf through the
    sensitivity matrix in the terminal row instead of materialising
    per-problem cache copies (see :class:`Telescope`)."""
    rho = _rho_b(prob.cache.rho)

    q = -(Xref * prob.Qdiag) - rho * (state.vnew - state.g)
    if spec.en_state_soc and spec.state_cones:
        q = q - rho * (state.vcnew - state.gc)
    if spec.en_state_linear:
        q = q - rho * (state.vlnew - state.gl)
    if spec.en_tv_state_linear:
        q = q - rho * (state.vlnew_tv - state.gl_tv)

    r = -(Uref * prob.Rdiag) - rho * (state.znew - state.y)
    if spec.en_input_soc and spec.input_cones:
        r = r - rho * (state.zcnew - state.yc)
    if spec.en_input_linear:
        r = r - rho * (state.zlnew - state.yl)
    if spec.en_tv_input_linear:
        r = r - rho * (state.zlnew_tv - state.yl_tv)
    if spec.en_consensus:
        rho_c = (prob.cache.rho if prob.settings.consensus_rho is None
                 else prob.settings.consensus_rho)
        r = r.at[0].add(-jnp.asarray(rho_c)[..., None]
                        * (state.zc0new - state.yc0))

    # Terminal cost: p[N-1] = -Pinf^T Xref[N-1] - rho * sum(state slacks - duals)
    # (admm.cpp:292-303; the reference's row-vector product is x^T Pinf, i.e.
    # Pinf^T x — Pinf is only symmetric up to round-off, so keep the transpose).
    rhoT = rho  # (*b, 1) or (1,), broadcasts against the (*b, nx) terminal row
    pN = -mtv(prob.cache.Pinf, Xref[-1]) - rhoT * (state.vnew[-1] - state.g[-1])
    if tel is not None:
        pN = pN - tel.drho[..., None] * mtv(tel.dP, Xref[-1])
    if spec.en_state_soc and spec.state_cones:
        pN = pN - rhoT * (state.vcnew[-1] - state.gc[-1])
    if spec.en_state_linear:
        pN = pN - rhoT * (state.vlnew[-1] - state.gl[-1])
    if spec.en_tv_state_linear:
        pN = pN - rhoT * (state.vlnew_tv[-1] - state.gl_tv[-1])

    p = state.p.at[-1].set(pN)
    return state.replace(q=q, r=r, p=p)


# --------------------------------------------------------- Riccati sweeps

def backward_pass(cache: Cache, B, state: SolverState,
                  consensus: bool = False,
                  tel: Optional[Telescope] = None,
                  mm3: bool = False) -> SolverState:
    """Linear (gradient) Riccati backward recursion (admm.cpp:13-20)::

        d[i] = Quu_inv (B' p[i+1] + r[i] + BPf)
        p[i] = q[i] + AmBKt p[i+1] - Kinf' r[i] + APf      i = N-2 .. 0

    With consensus, step 0 uses the dedicated gain Quu0_inv that carries
    the rho_c*I consensus prox (cache.Kinf0/Quu0_inv; see with_consensus).
    Only d[0] changes — p[0] is never read downstream.

    ``tel`` (adaptive rho) folds the per-problem Taylor deltas into each
    matvec as a drho-scaled sensitivity matvec (see :class:`Telescope`).
    """
    dr = None if tel is None else tel.drho[..., None]
    nu = B.shape[-1]
    prep, vsplit, dot = _sweep_mm(mm3)
    if tel is None:
        # Both matrices multiplying the costate are stacked into one dot
        # per step (the fused kernel's stacked-sweep trick): these
        # contractions are only nx deep, so per-dot issue latency
        # dominates the sequential scan. Adaptive rho keeps the unstacked
        # path (its drho-scaled sensitivity dots have different row
        # counts per term).
        Mback = prep(jnp.concatenate(
            [jnp.swapaxes(B, -1, -2), cache.AmBKt], axis=-2))
    else:
        BTp = prep(jnp.swapaxes(B, -1, -2))
        AmBKtp = prep(cache.AmBKt)
        dKTp = prep(jnp.swapaxes(tel.dK, -1, -2))
        dC1p = None if tel.dC1 is None else prep(tel.dC1)
        dC2p = None if tel.dC2 is None else prep(tel.dC2)
    Quup = prep(cache.Quu_inv)
    KinfTp = prep(jnp.swapaxes(cache.Kinf, -1, -2))

    def step(p_next, qr):
        q_i, r_i = qr
        if tel is None:
            out = dot(Mback, vsplit(p_next))
            bp, ap = out[..., :nu], out[..., nu:]
        else:
            ps = vsplit(p_next)
            bp, ap = dot(BTp, ps), dot(AmBKtp, ps)
        rs = vsplit(r_i)
        w = bp + r_i + cache.BPf
        d_i = dot(Quup, vsplit(w))
        p_i = q_i + ap - dot(KinfTp, rs) + cache.APf
        if tel is not None:
            p_i = p_i - dr * dot(dKTp, rs)
            if dC1p is not None:
                d_i = d_i + dr * dot(dC1p, vsplit(w))
            if dC2p is not None:
                p_i = p_i + dr * dot(dC2p, ps)
        return p_i, (p_i, d_i)

    _, (ps, ds) = jax.lax.scan(
        step, state.p[-1], (state.q[:-1], state.r), reverse=True
    )
    p = jnp.concatenate([ps, state.p[-1:]], axis=0)
    if consensus:
        w0 = dot(prep(jnp.swapaxes(B, -1, -2)), vsplit(p[1])) \
            + state.r[0] + cache.BPf
        d0 = dot(prep(cache.Quu0_inv), vsplit(w0))
        ds = ds.at[0].set(d0)
    return state.replace(p=p, d=ds)


def forward_pass(A, B, f, cache: Cache, state: SolverState,
                 consensus: bool = False, hp: bool = False,
                 tel: Optional[Telescope] = None,
                 mm3: bool = False) -> SolverState:
    """LQR rollout (admm.cpp:25-32)::

        u[i] = -Kinf x[i] - d[i];  x[i+1] = A x[i] + B u[i] + f

    With consensus, u[0] uses the step-0 gain Kinf0 (see backward_pass).

    ``hp`` runs the rollout matvecs at HIGHEST precision. Used under
    adaptive rho, where the OSQP residual recomputation ``A x_i + B u_i -
    x_{i+1}`` (rho_adapt.osqp_residuals, also HIGHEST) must cancel against
    the rollout: with the TPU's default single-pass-bf16 matmuls the two
    computations round differently and the O(1e-2) mismatch corrupts
    pri_res — in the f64 reference this term is ~1e-16
    (rho_benchmark.cpp:146-173). The fused kernel is self-consistent by
    construction (it reuses the rollout's exact products), so only this
    XLA path needs the precision pin.
    """
    prec = jax.lax.Precision.HIGHEST if hp else None
    dr = None if tel is None else tel.drho[..., None]
    # hp (adaptive rho) pins the rollout to HIGHEST so it cancels against
    # the OSQP residual recomputation — it overrides the 3-pass mode.
    prep, vsplit, _b3 = _sweep_mm(mm3 and not hp)

    def mvp(M, v):
        return jnp.einsum("...ij,...j->...i", M, v, precision=prec)

    dot = _b3 if (mm3 and not hp) else mvp
    nu = B.shape[-1]
    if tel is None:
        # Stacked-sweep trick (see backward_pass): Kinf and A both
        # multiply the state — one dot per step, rows split after.
        Mfwd = prep(jnp.concatenate([cache.Kinf, A], axis=-2))
    Bp = prep(B)

    def step(x_i, d_i):
        if tel is None:
            out = dot(Mfwd, vsplit(x_i))
            kx, ax = out[..., :nu], out[..., nu:]
        else:
            kx = mvp(cache.Kinf, x_i) + dr * mvp(tel.dK, x_i)
            ax = mvp(A, x_i)
        u_i = -kx - d_i
        x_next = ax + dot(Bp, vsplit(u_i)) + f
        return x_next, (x_i, u_i)

    if not consensus:
        x_last, (xs, us) = jax.lax.scan(step, state.x[0], state.d)
        x = jnp.concatenate([xs, x_last[None]], axis=0)
        return state.replace(x=x, u=us)

    x0 = state.x[0]
    u0 = -dot(prep(cache.Kinf0), vsplit(x0)) - state.d[0]
    x1 = dot(prep(A), vsplit(x0)) + dot(Bp, vsplit(u0)) + f
    x_last, (xs, us) = jax.lax.scan(step, x1, state.d[1:])
    x = jnp.concatenate([x0[None], xs, x_last[None]], axis=0)
    u = jnp.concatenate([u0[None], us], axis=0)
    return state.replace(x=x, u=u)


# ------------------------------------------------- horizon-parallel sweeps
#
# Both recursions are first-order affine recurrences with *constant*
# matrices (the reference runs them strictly sequentially, admm.cpp:15,27):
#
#   backward: p[i] = AmBKt p[i+1] + c[i],  c[i] = q[i] - Kinf' r[i] + APf
#   forward:  x[i+1] = (A - B Kinf) x[i] + (f - B d[i])
#
# Constant coefficients admit something much cheaper than the generic
# lax.associative_scan over composed affine maps (which materialises
# (N, nx, nx) map products in HBM every level — measured barely ~1.2x the
# sequential scan at N=512 because the O(log N) depth win drowns in memory
# traffic): a blocked two-level scan with precomputed matrix powers. The
# horizon splits into J blocks of K positions (K ~ sqrt(N)); level 1 runs
# the plain recurrence *within* each block with the J blocks folded into
# the batch axis (depth K, each step one (nx, nx) @ (nx, J*b) matvec —
# J-fold wider than the sequential scan's, so MXU utilisation improves
# too); level 2 propagates block boundary values with the constant M^K
# (depth J); level 3 broadcasts them back in with a single batched einsum
# against the stacked powers M^1..M^K. Total sequential depth K + J ~
# 2*sqrt(N) instead of N, total work ~2x the sequential scan's matvecs,
# and no (N, nx, nx) intermediates anywhere. This is the MPC analog of
# sequence parallelism (SURVEY.md §5), selected via
# Settings.horizon_parallel for long horizons. d and u follow elementwise
# from p and x. Stability: both AmBKt and A - B Kinf are closed-loop maps
# with spectral radius < 1, so the powers decay and the reassociation is
# numerically benign (unit tests pin 1e-9 agreement in f64).


def _block_K(L: int) -> int:
    """Block size ~ sqrt(L): minimises level-1 + level-2 depth (K + L/K)."""
    K = max(1, int(round(L ** 0.5)))
    return min(K, L)


def _matrix_powers(M, K: int):
    """[M^1, ..., M^K] stacked (K, nx, nx); HIGHEST precision so the power
    chain does not accumulate bf16 rounding on TPU."""
    pows = [M]
    for _ in range(K - 1):
        pows.append(jnp.einsum("ij,jk->ik", M, pows[-1],
                               precision=jax.lax.Precision.HIGHEST))
    return jnp.stack(pows)


def _mvc(M, v):
    """(nx, nx) @ (..., nx) on the trailing axis."""
    return jnp.einsum("ij,...j->...i", M, v)


def _blocked_suffix_scan(M, e):
    """s[i] = sum_{j >= i} M^(j-i) e[j] over axis 0 of ``e`` (L, *b, nx)."""
    L = e.shape[0]
    K = _block_K(L)
    J = -(-L // K)
    rest = e.shape[1:]
    if J * K > L:           # zero-pad the far end; suffix sums unaffected
        e = jnp.concatenate(
            [e, jnp.zeros((J * K - L, *rest), e.dtype)], axis=0)
    et = e.reshape(J, K, *rest).swapaxes(0, 1)          # (K, J, *b, nx)

    # Level 1: within-block suffix recurrence, blocks riding the batch.
    def local(carry, ek):
        val = ek + _mvc(M, carry)
        return val, val

    zero = jnp.zeros(et.shape[1:], e.dtype)
    _, sl = jax.lax.scan(local, zero, et, reverse=True)  # (K, J, *b, nx)

    # Level 2: block-boundary carries with the constant M^K.
    pows = _matrix_powers(M, K)                          # (K, nx, nx)
    MK = pows[-1]
    heads = sl[0]                                        # (J, *b, nx)

    def boundary(carry, hj):
        val = hj + _mvc(MK, carry)
        return val, val

    if J > 1:
        _, sin_tail = jax.lax.scan(boundary, zero[0], heads[1:], reverse=True)
        sin = jnp.concatenate([sin_tail, zero[:1]], axis=0)  # (J, *b, nx)
    else:
        sin = zero[:1] * 0

    # Level 3: s[k, j] = sl[k, j] + M^(K-k) sin[j]; powers reversed so
    # k=0 pairs with M^K.
    s = sl + jnp.einsum("kij,J...j->kJ...i", pows[::-1], sin)
    return s.swapaxes(0, 1).reshape(J * K, *rest)[:L]


def _blocked_prefix_scan(M, w, init):
    """y[i] = M y[i-1] + w[i] with y[-1] = init, over axis 0 of ``w``."""
    L = w.shape[0]
    K = _block_K(L)
    J = -(-L // K)
    rest = w.shape[1:]
    w = w.at[0].add(_mvc(M, init))        # fold the initial condition in
    if J * K > L:
        w = jnp.concatenate(
            [w, jnp.zeros((J * K - L, *rest), w.dtype)], axis=0)
    wt = w.reshape(J, K, *rest).swapaxes(0, 1)           # (K, J, *b, nx)

    def local(carry, wk):
        val = wk + _mvc(M, carry)
        return val, val

    zero = jnp.zeros(wt.shape[1:], w.dtype)
    _, yl = jax.lax.scan(local, zero, wt)                # (K, J, *b, nx)

    pows = _matrix_powers(M, K)
    MK = pows[-1]
    tails = yl[-1]                                       # (J, *b, nx)

    def boundary(carry, tj):
        val = tj + _mvc(MK, carry)
        return val, val

    if J > 1:
        _, yin_tail = jax.lax.scan(boundary, zero[0], tails[:-1])
        yin = jnp.concatenate([zero[:1], yin_tail], axis=0)  # (J, *b, nx)
    else:
        yin = zero[:1] * 0

    # y[k, j] = yl[k, j] + M^(k+1) yin[j].
    y = yl + jnp.einsum("kij,J...j->kJ...i", pows, yin)
    return y.swapaxes(0, 1).reshape(J * K, *rest)[:L]


def backward_pass_assoc(cache: Cache, B, state: SolverState,
                        consensus: bool = False) -> SolverState:
    """Horizon-parallel backward sweep (see block comment above). The
    terminal costate rides as the last suffix element: with
    e = [c_0..c_{N-2}, p_{N-1}], p[i] = sum_{j>=i} AmBKt^(j-i) e[j]."""
    e = jnp.concatenate(
        [state.q[:-1] - mtv(cache.Kinf, state.r) + cache.APf,
         state.p[-1:]], axis=0)                          # (N, *b, nx)
    p = _blocked_suffix_scan(jnp.asarray(cache.AmBKt), e)
    d = mv(cache.Quu_inv, mtv(B, p[1:]) + state.r + cache.BPf)
    if consensus:
        d0 = mv(cache.Quu0_inv, mtv(B, p[1]) + state.r[0] + cache.BPf)
        d = d.at[0].set(d0)
    return state.replace(p=p, d=d)


def forward_pass_assoc(A, B, f, cache: Cache, state: SolverState,
                       consensus: bool = False) -> SolverState:
    """Horizon-parallel forward rollout: substituting u = -Kinf x - d gives
    x[i+1] = (A - B Kinf) x[i] + (f - B d[i]), a constant-coefficient
    prefix recurrence (see block comment above)."""
    Acl = A - jnp.einsum("ij,jk->ik", B, cache.Kinf)
    w = f - mv(B, state.d)                     # (N-1, *b, nx)
    if consensus:
        # Step 0 uses the consensus gain pair (see backward_pass); run it
        # sequentially, then the blocked scan from x[1].
        u0 = -mv(cache.Kinf0, state.x[0]) - state.d[0]
        x1 = mv(A, state.x[0]) + mv(B, u0) + f
        xs = _blocked_prefix_scan(Acl, w[1:], x1) if w.shape[0] > 1 \
            else jnp.zeros((0, *x1.shape), x1.dtype)
        x = jnp.concatenate([state.x[:1], x1[None], xs], axis=0)
    else:
        xs = _blocked_prefix_scan(Acl, w, state.x[0])
        x = jnp.concatenate([state.x[:1], xs], axis=0)
    u = -mv(cache.Kinf, x[:-1]) - state.d
    if consensus:
        u = u.at[0].set(-mv(cache.Kinf0, x[0]) - state.d[0])
    return state.replace(x=x, u=u)


# ----------------------------------------------------------- slack / dual

def update_slack(spec: ProblemSpec, cons: ConstraintData, state: SolverState,
                 nb: int, axis_name=None) -> SolverState:
    """Project candidate slacks into each enabled family's feasible set
    (admm.cpp:81-213)."""
    upd = {}

    vnew = state.x + state.g
    znew = state.u + state.y
    if spec.en_state_bound:
        vnew = project_box(vnew, _emid(cons.x_min, nb), _emid(cons.x_max, nb))
    if spec.en_input_bound:
        znew = project_box(znew, _emid(cons.u_min, nb), _emid(cons.u_max, nb))
    upd["vnew"], upd["znew"] = vnew, znew

    if spec.en_state_soc and spec.state_cones:
        vc = state.x + state.gc
        for k, (start, dim) in enumerate(spec.state_cones):
            seg = project_soc(vc[..., start:start + dim], cons.cx[..., k])
            vc = vc.at[..., start:start + dim].set(seg)
        upd["vcnew"] = vc
    if spec.en_input_soc and spec.input_cones:
        zc = state.u + state.yc
        for k, (start, dim) in enumerate(spec.input_cones):
            seg = project_soc(zc[..., start:start + dim], cons.cu[..., k])
            zc = zc.at[..., start:start + dim].set(seg)
        upd["zcnew"] = zc

    # Hyperplanes are applied *sequentially* over constraints, like the
    # reference's k-loop (admm.cpp:148-173): projection k sees the result of
    # projection k-1. Counts are static, so the loop unrolls at trace time.
    if spec.en_state_linear:
        vl = state.x + state.gl
        for k in range(spec.num_state_linear):
            vl = _hyperplane_step(vl, cons.Alin_x[..., k, :], cons.blin_x[..., k])
        upd["vlnew"] = vl
    if spec.en_input_linear:
        zl = state.u + state.yl
        for k in range(spec.num_input_linear):
            zl = _hyperplane_step(zl, cons.Alin_u[..., k, :], cons.blin_u[..., k])
        upd["zlnew"] = zl

    if spec.en_tv_state_linear:
        vltv = state.x + state.gl_tv
        for k in range(spec.num_tv_state_linear):
            a_t = cons.tv_Alin_x[..., k, :]   # (N, nx) or (N, *b, nx)
            b_t = cons.tv_blin_x[..., k]      # (N,)    or (N, *b)
            if a_t.ndim == 2:
                a_t, b_t = _emid(a_t, nb), _emid(b_t[..., None], nb)[..., 0]
            vltv = _hyperplane_step(vltv, a_t, b_t)
        upd["vlnew_tv"] = vltv
    if spec.en_tv_input_linear:
        zltv = state.u + state.yl_tv
        for k in range(spec.num_tv_input_linear):
            a_t = cons.tv_Alin_u[..., k, :]
            b_t = cons.tv_blin_u[..., k]
            if a_t.ndim == 2:
                a_t, b_t = _emid(a_t, nb), _emid(b_t[..., None], nb)[..., 0]
            zltv = _hyperplane_step(zltv, a_t, b_t)
        upd["zlnew_tv"] = zltv

    if spec.en_consensus:
        # Consensus on u[0] across scenarios: projection onto the
        # all-equal subspace is the scenario mean. The scenario group is
        # the last batch axis (local) composed with an optional named mesh
        # axis (pmean over ICI/DCN when scenarios are sharded).
        cand = state.u[0] + state.yc0          # (*b, nu)
        m = cand
        if nb >= 1:
            m = jnp.mean(m, axis=-2, keepdims=True)
        if axis_name is not None:
            m = jax.lax.pmean(m, axis_name)
        upd["zc0new"] = jnp.broadcast_to(m, cand.shape)

    return state.replace(**upd)


def _hyperplane_step(zmat, a, b):
    """One violated-only hyperplane projection over all timesteps at once."""
    val = jnp.sum(zmat * a, axis=-1)
    dist = (val - b) / jnp.sum(a * a, axis=-1)
    proj = zmat - dist[..., None] * a
    return jnp.where((val > b)[..., None], proj, zmat)


def update_dual(spec: ProblemSpec, state: SolverState) -> SolverState:
    """Scaled-dual ascent for each enabled family (admm.cpp:219-256)."""
    upd = dict(
        g=state.g + state.x - state.vnew,
        y=state.y + state.u - state.znew,
    )
    if spec.en_state_soc and spec.state_cones:
        upd["gc"] = state.gc + state.x - state.vcnew
    if spec.en_input_soc and spec.input_cones:
        upd["yc"] = state.yc + state.u - state.zcnew
    if spec.en_state_linear:
        upd["gl"] = state.gl + state.x - state.vlnew
    if spec.en_input_linear:
        upd["yl"] = state.yl + state.u - state.zlnew
    if spec.en_tv_state_linear:
        upd["gl_tv"] = state.gl_tv + state.x - state.vlnew_tv
    if spec.en_tv_input_linear:
        upd["yl_tv"] = state.yl_tv + state.u - state.zlnew_tv
    if spec.en_consensus:
        upd["yc0"] = state.yc0 + state.u[0] - state.zc0new
    return state.replace(**upd)


# ----------------------------------------------------------- termination

def compute_residuals(state: SolverState, rho):
    """Max-abs primal/dual residuals (admm.cpp:314-317). Shapes (*b,)."""
    pri_state = _maxabs_tf(state.x - state.vnew)
    dua_state = _maxabs_tf(state.v - state.vnew) * rho
    pri_input = _maxabs_tf(state.u - state.znew)
    dua_input = _maxabs_tf(state.z - state.znew) * rho
    return pri_state, pri_input, dua_state, dua_input


# ------------------------------------------------------------- iteration

def admm_iteration(prob: TinyProblem, state: SolverState, Xref, Uref,
                   nb: int, tel: Optional[Telescope] = None) -> SolverState:
    """One full ADMM iteration (the body of admm.cpp:378-394)."""
    spec = prob.spec
    consensus = spec.en_consensus
    if consensus and prob.cache.Kinf0 is None:
        raise ValueError("en_consensus requires the step-0 consensus gains; "
                         "configure the problem via with_consensus(...)")
    mm3 = prob.settings.matmul_precision == "high"
    state = update_linear_cost(spec, prob, state, Xref, Uref, tel)
    if prob.settings.horizon_parallel:
        state = backward_pass_assoc(prob.cache, prob.B, state, consensus)
        state = forward_pass_assoc(prob.A, prob.B, prob.f, prob.cache, state,
                                   consensus)
    else:
        state = backward_pass(prob.cache, prob.B, state, consensus, tel,
                              mm3=mm3)
        state = forward_pass(prob.A, prob.B, prob.f, prob.cache, state,
                             consensus, hp=prob.settings.adaptive_rho,
                             tel=tel, mm3=mm3)
    state = update_slack(spec, prob.cons, state, nb,
                         prob.settings.consensus_axis_name)
    state = update_dual(spec, state)
    return state


# ------------------------------------------------------------------ solve

ADAPTIVE_RHO_PERIOD = 5  # admm.cpp:405


def seed_extra_slacks(spec: ProblemSpec, state: SolverState) -> SolverState:
    """Per-solve initialisation of SOC / linear / tv slack copies from the
    current primal iterates (admm.cpp:352-376)."""
    upd = {}
    if spec.en_state_soc and spec.state_cones:
        upd["vcnew"] = state.x
    if spec.en_input_soc and spec.input_cones:
        upd["zcnew"] = state.u
    if spec.en_state_linear:
        upd["vlnew"] = state.x
    if spec.en_input_linear:
        upd["zlnew"] = state.u
    if spec.en_tv_state_linear:
        upd["vlnew_tv"] = state.x
    if spec.en_tv_input_linear:
        upd["zlnew_tv"] = state.u
    if spec.en_consensus:
        upd["zc0new"] = state.u[0]
    return state.replace(**upd) if upd else state


def solve(prob: TinyProblem, state: SolverState, Xref=None, Uref=None,
          x0=None) -> Tuple[Solution, SolverState, Cache]:
    """Run ADMM to convergence (admm.cpp:331-455), functionally.

    Args:
      prob: configured problem (spec/settings static).
      state: warm-start iterates from a previous solve, or
        :func:`~tinympc_tpu.types.init_state`.
      Xref/Uref: reference trajectories, (N, nx)/(N-1, nu) or batched
        (N, *b, nx). Default zeros.
      x0: initial state, (nx,) or (*b, nx); when given, written into x[0]
        (the functional ``tiny_set_x0``, tiny_api.cpp:443-453).

    Returns (solution, final_state, final_cache). ``final_cache`` differs
    from ``prob.cache`` only when adaptive rho is enabled.
    """
    if prob.settings.coarse_iters:
        raise ValueError(
            "coarse_iters (the mixed-precision iteration schedule) is "
            "implemented on the resident fused kernel "
            "(kernels.solve_fused) only; set coarse_iters=0 for the XLA "
            "path")
    with matmul_precision_ctx(prob.settings):
        return _solve_impl(prob, state, Xref, Uref, x0)


def _solve_impl(prob, state, Xref, Uref, x0):
    spec, settings = prob.spec, prob.settings
    nb = len(state.batch_shape)
    dtype = prob.dtype

    if Xref is None:
        Xref = jnp.zeros((spec.N, spec.nx), dtype)
    if Uref is None:
        Uref = jnp.zeros((spec.N - 1, spec.nu), dtype)
    Xref = _emid(Xref, nb) if Xref.ndim == 2 else Xref
    Uref = _emid(Uref, nb) if Uref.ndim == 2 else Uref
    if x0 is not None:
        state = state.replace(x=state.x.at[0].set(jnp.asarray(x0, dtype)))

    # Per-solve reset (admm.cpp:334-337) + slack seeding (admm.cpp:352-376).
    b = state.batch_shape
    state = state.replace(
        iter=jnp.zeros(b, jnp.int32),
        solved=jnp.zeros(b, jnp.bool_),
        status=jnp.full(b, TINY_UNSOLVED, jnp.int32),
    )
    state = seed_extra_slacks(spec, state)

    # Adaptive rho never materialises per-problem cache copies: the loop
    # carries only the (*b,) rho row, and every per-problem matvec is the
    # shared base matvec plus a drho-scaled sensitivity matvec (Telescope;
    # the fused kernel's telescoped-Taylor trick at the XLA level). The
    # base can itself be a batched cache (re-entry with a final_cache from
    # a previous adaptive solve) — the matvecs broadcast.
    cache = prob.cache
    adaptive = settings.adaptive_rho
    rho0 = jnp.asarray(cache.rho, dtype)
    rho_b = jnp.broadcast_to(rho0, b).astype(dtype) if (
        adaptive and nb > 0 and rho0.ndim == 0) else rho0

    def _tel(rho_cur):
        if not adaptive:
            return None
        apply_c = settings.adaptive_rho_apply_c
        return Telescope(
            drho=rho_cur - rho0,
            dK=cache.dKinf_drho, dP=cache.dPinf_drho,
            dC1=cache.dC1_drho if apply_c else None,
            dC2=cache.dC2_drho if apply_c else None,
        )

    tols = (settings.abs_pri_tol, settings.abs_dua_tol)

    def cond(carry):
        _, _, _, it, converged = carry
        return (it < settings.max_iter) & ~jnp.all(converged)

    def body(carry):
        st, rho_cur, rho_v, it, converged = carry
        active = ~converged

        tel = _tel(rho_cur)
        pr = prob if not adaptive else prob.replace(
            cache=dataclasses.replace(cache, rho=rho_cur))
        new = admm_iteration(pr, st, Xref, Uref, nb, tel)

        # Adaptive rho every ADAPTIVE_RHO_PERIOD iterations (admm.cpp:397-422),
        # applied per problem only while that problem is still active. Only
        # the rho row updates; the next iteration's drho carries the Taylor
        # delta into every matvec.
        if adaptive:
            mask = (it > 0) & (it % ADAPTIVE_RHO_PERIOD == 0) & active
            pri_r, dua_r, pri_n, dua_n = telescoped_osqp_residuals(
                prob, cache, tel.drho, new)
            tol = settings.adaptive_rho_tolerance
            if tol > 1.0:
                # Guarded policy: accumulate every prediction into the
                # virtual rho; commit only when it has drifted tol-fold
                # from the committed rho (see rho_adapt.predict_rho).
                new_v = predict_rho(pri_r, dua_r, pri_n, dua_n, rho_v,
                                    settings)
                commit = (new_v >= tol * rho_cur) | (new_v * tol <= rho_cur)
                rho_v = jnp.where(mask, new_v, rho_v)
                rho_cur = jnp.where(mask & commit, new_v, rho_cur)
            else:
                new_rho = predict_rho(pri_r, dua_r, pri_n, dua_n, rho_cur,
                                      settings)
                rho_cur = jnp.where(mask, new_rho, rho_cur)

        it1 = it + 1

        # Termination check every check_termination iterations with the
        # (possibly adapted) rho (admm.cpp:310-328, 430).
        pred_check = (it1 % settings.check_termination) == 0
        prs, pri, drs, dri = compute_residuals(new, rho_cur)
        ok = (prs < tols[0]) & (pri < tols[0]) & (drs < tols[1]) & (dri < tols[1])
        if spec.en_consensus:
            cres = jnp.max(jnp.abs(new.u[0] - new.zc0new), axis=-1)
            ok = ok & (cres < tols[0])
        just_conv = pred_check & ok & active

        # v/z carry-over happens only when the loop continues
        # (admm.cpp:444-446 is skipped by the converged early-return).
        keep_vz = active & ~just_conv
        new = new.replace(
            v=_where_tf(keep_vz, new.vnew, st.v),
            z=_where_tf(keep_vz, new.znew, st.z),
        )

        # Residual fields only refresh when the check ran.
        res_mask = pred_check & active
        new = new.replace(
            pri_res_state=jnp.where(res_mask, prs, st.pri_res_state),
            pri_res_input=jnp.where(res_mask, pri, st.pri_res_input),
            dua_res_state=jnp.where(res_mask, drs, st.dua_res_state),
            dua_res_input=jnp.where(res_mask, dri, st.dua_res_input),
            iter=st.iter + active.astype(jnp.int32),
            solved=st.solved | just_conv,
            status=jnp.where(just_conv, TINY_SOLVED, st.status),
        )

        # Freeze every field of converged problems.
        committed = _commit(new, st, active)
        return committed, rho_cur, rho_v, it1, converged | just_conv

    state, rho_final, _, _, _ = jax.lax.while_loop(
        cond, body, (state, rho_b, rho_b, jnp.int32(0),
                     jnp.zeros(b, jnp.bool_))
    )

    if adaptive:
        # Materialise the per-problem final cache once, outside the loop
        # (the deltas telescope: M_b = M_base + (rho_final - rho0) * dM).
        # Dead-code-eliminated by XLA when the caller drops final_cache.
        d2 = (rho_final - rho0)[..., None, None]
        upd = dict(
            rho=rho_final,
            Kinf=cache.Kinf + d2 * cache.dKinf_drho,
            Pinf=cache.Pinf + d2 * cache.dPinf_drho,
            C1=cache.C1 + d2 * cache.dC1_drho,
            C2=cache.C2 + d2 * cache.dC2_drho,
        )
        if settings.adaptive_rho_apply_c:
            upd["Quu_inv"] = cache.Quu_inv + d2 * cache.dC1_drho
            upd["AmBKt"] = cache.AmBKt + d2 * cache.dC2_drho
        cache = dataclasses.replace(cache, **upd)

    solution = Solution(iter=state.iter, solved=state.solved,
                        x=state.vnew, u=state.znew)
    return solution, state, cache


def _commit(new: SolverState, old: SolverState, active) -> SolverState:
    """Commit per-problem updates only where ``active`` (shape (*b,))."""
    def sel(n, o):
        if n is o or n is None:
            return n
        if n.ndim == active.ndim:          # per-problem scalars
            return n                        # already masked above
        if n.ndim == active.ndim + 1:      # (*b, F) consensus leaves
            return jnp.where(active[..., None], n, o)
        return _where_tf(active, n, o)      # (T, *b, F) leaves

    return jax.tree.map(sel, new, old)
