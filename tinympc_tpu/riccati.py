"""Infinite-horizon Riccati cache precomputation.

TPU-native re-design of the reference setup path
(/root/reference/src/tinympc/tiny_api.cpp:307-381): the fixed-point
iteration runs under ``lax.while_loop`` so it jits, vmaps over heterogeneous
problem fleets, and supports forward-mode autodiff — which is how the rho
sensitivity matrices are produced for *any* system, instead of the
reference's hard-coded 12x4 quadrotor tables (tiny_api.cpp:479-540).

Parity note (replicated deliberately): ``tiny_setup`` stores
``work->Q = (Q + rho*I).diagonal()`` (tiny_api.cpp:117) and then passes that
already-augmented diagonal into ``tiny_precompute_and_set_cache``, which adds
``rho*I`` AGAIN (tiny_api.cpp:317-318). The Riccati cache therefore solves
with ``Q + 2*rho*I`` while the linear cost uses ``Q + rho*I``. This function
takes the once-augmented diagonals (same contract as the reference
precompute) and re-augments, exactly like the reference.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .types import Cache

RICCATI_TOL = 1e-5       # tiny_api.cpp:340
RICCATI_MAX_ITERS = 1000  # tiny_api.cpp:335


def riccati_fixed_point(A, B, Qaug2, Raug2, rho, tol=RICCATI_TOL,
                        max_iters=RICCATI_MAX_ITERS):
    """Iterate ``Kinf = (R + B'PB)^-1 B'PA``, ``Pinf = Q + A'P(A - BK)``
    until ``max|dKinf| < tol``, starting from ``P = rho*I``
    (tiny_api.cpp:330-349). Returns (Kinf, Pinf, iters)."""
    nx = A.shape[-1]
    dtype = A.dtype
    P0 = rho * jnp.eye(nx, dtype=dtype)
    K0 = jnp.zeros((B.shape[-1], nx), dtype)

    def cond(c):
        K, _, Kprev, i = c
        return (i < max_iters) & (jnp.max(jnp.abs(K - Kprev)) >= tol)

    def body(c):
        K, P, _, i = c
        BtP = B.T @ P
        Knew = jnp.linalg.solve(Raug2 + BtP @ B, BtP @ A)
        Pnew = Qaug2 + A.T @ P @ (A - B @ Knew)
        return (Knew, Pnew, K, i + 1)

    # Seed Kprev at +inf so the first iteration always runs (do-while).
    Kinf, Pinf, _, iters = jax.lax.while_loop(
        cond, body, (K0, P0, jnp.full_like(K0, jnp.inf), jnp.int32(0))
    )
    return Kinf, Pinf, iters


def _cache_terms(A, B, f, Qaug2, Raug2, rho, tol, max_iters):
    Kinf, Pinf, _ = riccati_fixed_point(A, B, Qaug2, Raug2, rho, tol, max_iters)
    Quu_inv = jnp.linalg.inv(Raug2 + B.T @ Pinf @ B)   # tiny_api.cpp:352
    AmBKt = (A - B @ Kinf).T                           # tiny_api.cpp:353
    APf = AmBKt @ (Pinf @ f)                           # tiny_api.cpp:356
    BPf = B.T @ (Pinf @ f)                             # tiny_api.cpp:357
    return Kinf, Pinf, Quu_inv, AmBKt, APf, BPf


def precompute_cache(A, B, f, Qdiag_aug, Rdiag_aug, rho, *,
                     tol=RICCATI_TOL, max_iters=RICCATI_MAX_ITERS) -> Cache:
    """Build the solver cache from once-augmented cost diagonals.

    ``Qdiag_aug``/``Rdiag_aug`` are ``diag(Q) + rho`` / ``diag(R) + rho``
    (the reference's ``work->Q``/``work->R``); a second ``rho*I`` is added
    here to match tiny_api.cpp:317-318.
    """
    dtype = A.dtype
    rho = jnp.asarray(rho, dtype)
    Qaug2 = jnp.diag(Qdiag_aug) + rho * jnp.eye(A.shape[-1], dtype=dtype)
    Raug2 = jnp.diag(Rdiag_aug) + rho * jnp.eye(B.shape[-1], dtype=dtype)
    Kinf, Pinf, Quu_inv, AmBKt, APf, BPf = _cache_terms(
        A, B, f, Qaug2, Raug2, rho, tol, max_iters
    )
    return Cache(
        rho=rho, Kinf=Kinf, Pinf=Pinf, Quu_inv=Quu_inv, AmBKt=AmBKt,
        APf=APf, BPf=BPf, C1=Quu_inv, C2=AmBKt,  # aliases, tiny_api.cpp:375-376
    )


def compute_sensitivities(A, B, f, Qdiag_user, Rdiag_user, rho, *,
                          tol=1e-10, max_iters=10_000):
    """d{Kinf, Pinf, Quu_inv (C1), AmBKt (C2)}/d rho via forward-mode AD.

    Generalises the reference's hard-coded quadrotor-only tables
    (tiny_api.cpp:489-531, "Adaptive rho currently supports only quadrotor
    system") to arbitrary systems: differentiate the converged Riccati
    recursion w.r.t. rho. ``Qdiag_user``/``Rdiag_user`` are the *raw* cost
    diagonals; the (double) rho augmentation — which itself depends on rho —
    happens inside so its derivative is captured. A tight tolerance makes the
    truncated-iteration derivative agree with the implicit fixed-point one.
    """
    dtype = A.dtype

    def terms(r):
        Qaug2 = jnp.diag(Qdiag_user) + 2.0 * r * jnp.eye(A.shape[-1], dtype=dtype)
        Raug2 = jnp.diag(Rdiag_user) + 2.0 * r * jnp.eye(B.shape[-1], dtype=dtype)
        K, P, Quu_inv, AmBKt, _, _ = _cache_terms(
            A, B, f, Qaug2, Raug2, r, tol, max_iters
        )
        return K, P, Quu_inv, AmBKt

    dK, dP, dC1, dC2 = jax.jacfwd(terms)(jnp.asarray(rho, dtype))
    return dK, dP, dC1, dC2
