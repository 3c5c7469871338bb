"""Adaptive-rho subsystem (first-order adaptive caching, IROS-2025).

Re-design of /root/reference/src/tinympc/rho_benchmark.cpp. The reference
materialises the full stacked OSQP-form matrices — an
``(nx+nu)(N-1) x (nx N + nu (N-1))`` constraint matrix, block-diagonal cost,
etc. (rho_benchmark.cpp:14-42) — and computes residuals with dense matvecs.
Here the *action* of those matrices is computed directly on the trajectory
arrays (the stacked A has only identity-input rows and ``[A B -I]`` dynamics
rows, rho_benchmark.cpp:78-94), so nothing quadratic in the horizon is ever
built and everything batches.

Parity quirk preserved: the Taylor update writes Kinf/Pinf and the C1/C2
*aliases* — not the Quu_inv/AmBKt matrices the backward pass actually reads
(rho_benchmark.cpp:204-209 vs admm.cpp:17-18). Set
``Settings.adaptive_rho_apply_c=True`` for the fixed behavior.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .types import Cache, Settings

RHO_EPS = 1e-10  # rho_benchmark.cpp:183


def _maxabs(a):
    """max|a| over time+feature axes, keeping batch: (T, *b, F) -> (*b,)."""
    return jnp.max(jnp.abs(a), axis=(0, a.ndim - 1))


# The residual matvecs are cancellation-sensitive: ax_dyn = A x_i + B u_i -
# x_{i+1} is ~0 after an exact forward pass, so on TPU a default-precision
# (single-pass bf16) recomputation injects O(1e-2) noise that deflates
# pri_res and sends rho on a different trajectory than the f64 oracle.
# HIGHEST forces f32-accurate matmuls here (no-op on CPU); the fused kernel
# is immune by construction (it reuses the forward pass's exact products).
_PREC = jax.lax.Precision.HIGHEST


def _mv(M, v):
    return jnp.einsum("...ij,...j->...i", M, v, precision=_PREC)


def _mtv(M, v):
    return jnp.einsum("...ji,...j->...i", M, v, precision=_PREC)


def _trail(v, like):
    """Reshape (*b,) scalars to broadcast against batch-leading cache leaves."""
    v = jnp.asarray(v)
    return v.reshape(v.shape + (1,) * (like.ndim - v.ndim))


def osqp_residuals(A, B, Qdiag, Rdiag, Pinf, x, u, vnew, znew, g, y,
                   dPinf=None, drho=None):
    """OSQP primal/dual residuals and normalisations of the stacked problem
    (rho_benchmark.cpp:44-173) evaluated matrix-free.

    Row layout of the implicit constraint matrix (rho_benchmark.cpp:78-94):
    input rows select ``u_i``; dynamics rows compute ``A x_i + B u_i - x_{i+1}``.
    The slack/dual stacks pair input rows with (znew, y) and dynamics rows
    with (vnew, g) shifted by one step (rho_benchmark.cpp:97-103).
    The reference builds its q vector against a zero reference
    (rho_benchmark.cpp:127-143); same here.
    Returns (pri_res, dual_res, pri_norm, dual_norm), each shaped (*b,).

    ``dPinf``/``drho`` telescope the per-problem Taylor-updated terminal
    cost (``Pinf_b = Pinf + drho_b * dPinf``) without materialising it —
    the batched adaptive path's memory fix (see admm.Telescope).
    """
    y_dyn = g[1:]                                 # (N-1, *b, nx)
    ax_in = u                                     # identity rows
    ax_dyn = _mv(A, x[:-1]) + _mv(B, u) - x[1:]   # dynamics rows

    pri_res = jnp.maximum(_maxabs(ax_in - znew), _maxabs(ax_dyn - vnew[1:]))
    pri_norm = jnp.maximum(
        jnp.maximum(_maxabs(ax_in), _maxabs(ax_dyn)),
        jnp.maximum(_maxabs(znew), _maxabs(vnew[1:])),
    )

    # P x: Q-diag blocks for stages, Pinf terminal, R-diag inputs
    # (rho_benchmark.cpp:105-124).
    pxN = _mv(Pinf, x[-1])
    if drho is not None:
        pxN = pxN + drho[..., None] * _mv(dPinf, x[-1])
    px_state = jnp.concatenate([Qdiag * x[:-1], pxN[None]], axis=0)
    px_input = Rdiag * u
    # q vector: Q-diag for every stage *including* the terminal
    # (rho_benchmark.cpp:127-143 loops all i with work->Q).
    q_state = Qdiag * x
    q_input = Rdiag * u

    zero_row = jnp.zeros_like(x[:1])
    aty_state = (
        jnp.concatenate([_mtv(A, y_dyn), zero_row], axis=0)
        - jnp.concatenate([zero_row, y_dyn], axis=0)
    )
    aty_input = y + _mtv(B, y_dyn)

    dual_res = jnp.maximum(
        _maxabs(px_state + q_state + aty_state),
        _maxabs(px_input + q_input + aty_input),
    )
    dual_norm = jnp.maximum(
        jnp.maximum(
            jnp.maximum(_maxabs(px_state), _maxabs(px_input)),
            jnp.maximum(_maxabs(aty_state), _maxabs(aty_input)),
        ),
        jnp.maximum(_maxabs(q_state), _maxabs(q_input)),
    )
    return pri_res, dual_res, pri_norm, dual_norm


def predict_rho(pri_res, dual_res, pri_norm, dual_norm, rho,
                settings: Settings):
    """rho <- rho * sqrt(normalised_pri / normalised_dual), clipped
    (rho_benchmark.cpp:175-197).

    This is the raw (unguarded) prediction. The guard policy lives in
    the callers (admm._solve_impl and both kernels): with
    ``Settings.adaptive_rho_tolerance > 1`` every prediction updates a
    *virtual* rho which commits into the solver only once it has drifted
    tolerance-fold from the committed rho (the OSQP discipline the
    reference omits) — a plain per-step threshold measurably cannot work
    here, because the mis-tuned-rho rescue happens through many small
    same-direction steps each below any useful threshold while the
    tuned-rho harm happens through steps of the same size
    (tools/rho_guard_sweep.py, docs/PARITY.md).
    """
    normalized_pri = pri_res / (pri_norm + RHO_EPS)
    normalized_dual = dual_res / (dual_norm + RHO_EPS)
    ratio = normalized_pri / (normalized_dual + RHO_EPS)
    new_rho = rho * jnp.sqrt(ratio)
    if settings.adaptive_rho_clip:
        new_rho = jnp.clip(new_rho, settings.adaptive_rho_min,
                           settings.adaptive_rho_max)
    return new_rho


def taylor_update(cache: Cache, new_rho, settings: Settings) -> Cache:
    """First-order cache update ``M += (new_rho - rho) * dM/drho``
    (rho_benchmark.cpp:199-212)."""
    delta = new_rho - cache.rho
    upd = dict(
        rho=new_rho,
        Kinf=cache.Kinf + _trail(delta, cache.Kinf) * cache.dKinf_drho,
        Pinf=cache.Pinf + _trail(delta, cache.Pinf) * cache.dPinf_drho,
        C1=cache.C1 + _trail(delta, cache.C1) * cache.dC1_drho,
        C2=cache.C2 + _trail(delta, cache.C2) * cache.dC2_drho,
    )
    if settings.adaptive_rho_apply_c:
        upd["Quu_inv"] = cache.Quu_inv + _trail(delta, cache.Quu_inv) * cache.dC1_drho
        upd["AmBKt"] = cache.AmBKt + _trail(delta, cache.AmBKt) * cache.dC2_drho
    import dataclasses
    return dataclasses.replace(cache, **upd)


def adapt_rho(prob, cache: Cache, state, settings: Settings) -> Cache:
    """One full adaptation step (rho_benchmark.cpp:214-250, minus the dead
    second Taylor call at admm.cpp:421 whose delta_rho is always zero)."""
    pri_res, dual_res, pri_norm, dual_norm = osqp_residuals(
        prob.A, prob.B, prob.Qdiag, prob.Rdiag, cache.Pinf,
        state.x, state.u, state.vnew, state.znew, state.g, state.y,
    )
    new_rho = predict_rho(pri_res, dual_res, pri_norm, dual_norm,
                          cache.rho, settings)
    return taylor_update(cache, new_rho, settings)


def telescoped_osqp_residuals(prob, cache: Cache, drho, state):
    """OSQP residuals with the per-problem terminal cost telescoped through
    ``dPinf_drho`` (``Pinf_b = Pinf + drho_b * dPinf``) — no per-problem
    cache copies ever exist. ``cache`` holds the *base* matrices the
    ``drho`` offsets are relative to (see admm.Telescope)."""
    return osqp_residuals(
        prob.A, prob.B, prob.Qdiag, prob.Rdiag, cache.Pinf,
        state.x, state.u, state.vnew, state.znew, state.g, state.y,
        dPinf=cache.dPinf_drho, drho=drho,
    )
