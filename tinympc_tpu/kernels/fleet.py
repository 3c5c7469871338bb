"""Heterogeneous fleets at fused-kernel speed: bucketed dispatch.

The fused kernels bake one shared (A, B, cache) per launch — the MXU
matvecs contract every lane against the *same* small matrices, which is
exactly what makes them fast. A fleet of *different* robots therefore
used to fall back to ``jax.vmap(tm.solve_)`` over stacked problem
pytrees (measured 680k vs 2.5M+ solves/s at 16 quadrotor variants:
per-problem matrices force batched small matmuls the MXU tiles
poorly). :func:`make_fleet_solver` recovers fused-kernel throughput by
*bucketing*: problems are gathered by system, each bucket runs as one
fused launch with its own system's cache inside a single jitted
dispatch, and results scatter back into fleet order. (A true
single-launch multi-system kernel was built and measured slower — see
the dispatch comment below.) Bucket lanes match a direct
:func:`~.admm_pallas.solve_fused` of the same gathered batch (bitwise
on-chip; ~1e-5 cross-program fusion noise under XLA:CPU —
tests/test_batch.py).

Reference analog: none — the reference would need one MCU per robot
(N instances of tiny_setup, tiny_api.cpp:21-147). A per-lane-cache
kernel variant was considered and rejected: per-lane matrices cost
~2.2 KiB/lane of VMEM (collapsing the tile) and turn every shared MXU
matmul into a batched small matmul, the exact regime the fused design
exists to avoid — bucketing keeps the shared-matrix contraction and
pays only gather/scatter.

One dispatch program compiles per distinct assignment pattern, cached
by the returned closure — build the solver once per fleet, reuse per
tick.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..types import Solution, TinyProblem
from .admm_pallas import init_carry, solve_fused, solve_fused_warm


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def make_fleet_solver(probs: Sequence[TinyProblem], *,
                      tile: Optional[int] = None,
                      warm: bool = False,
                      interpret: bool = False):
    """Build a reusable heterogeneous-fleet solver.

    Args:
      probs: one configured problem per system. All must share the same
        static layout (spec dims/families and settings) — they differ in
        numeric data (A, B, f, costs, bounds, cache).
      tile: forwarded to each bucket's fused launch (None = auto).
      warm: build the receding-horizon variant —
        ``solve(assignments, x0s, carry, Xref=None, Uref=None) ->
        (Solution, residuals, carry')`` with a fleet-order
        :class:`~.admm_pallas.FusedCarry` (start from
        ``init_carry(probs[0], B)``), per-lane freeze semantics exactly
        like :func:`~.admm_pallas.solve_fused_warm` per system — the
        external-plant serving loop for a mixed-robot fleet.
      interpret: run kernels in interpreter mode (tests).

    Returns ``solve(assignments, x0s, Xref=None, Uref=None) ->
    (Solution, residuals)`` where ``assignments`` is a host ``(B,)`` int
    array mapping each problem to its system and ``x0s`` is ``(B, nx)``.
    Per-system reference trajectories may be passed as sequences (one
    per system) or shared arrays. Each bucket's lanes match a direct
    ``solve_fused(probs[s], ...)`` of the same gathered batch (exactly
    on-chip; to cross-program fusion noise under XLA:CPU).

    All systems must share the setup rho (the kernel bakes rho as a
    trace constant — solve_fused_multi validates).
    """
    if not probs:
        raise ValueError("empty fleet")
    spec0, set0 = probs[0].spec, probs[0].settings
    if spec0.en_consensus:
        raise ValueError(
            "make_fleet_solver takes flat (B, nx) batches; consensus "
            "specs use grouped (n_groups, G, nx) batches — run each "
            "system's scenario trees through solve_fused directly (or "
            "open an issue describing the mixed consensus-fleet shape "
            "you need)")
    for i, p in enumerate(probs[1:], 1):
        if p.spec != spec0 or p.settings != set0:
            raise ValueError(
                f"fleet system {i} differs from system 0 in spec/settings; "
                "buckets must share the static layout (dims, families, "
                "iteration budget) — heterogeneity is in the numeric data")
    n_sys = len(probs)
    nres = 5 if set0.adaptive_rho else 4
    N, nx, nu = spec0.N, spec0.nx, spec0.nu

    # The whole dispatch (gathers, one fused launch per bucket, the
    # scatters) jits as ONE program per distinct assignment pattern —
    # bucket indices are trace-time constants, so a fleet tick is a
    # single device dispatch (on remote/tunneled accelerators eager
    # per-op dispatch costs ~100x). Per-bucket launches inside the one
    # program are the MEASURED-fastest dispatch: a true single-launch
    # variant exists (admm_pallas.solve_fused_multi — per-system
    # matrices selected per tile, via either BlockSpec index maps or a
    # VMEM-resident stack with dynamic indexing) but both selection
    # mechanisms measured ~25-35% SLOWER than 16 sequential launches on
    # the v5e (1.6-1.8M vs 2.1-2.5M solves/s at 16 quadrotor variants;
    # the per-tile system selection appears to defeat Mosaic's
    # loop-invariant hoisting of the prepped matrices) — see
    # docs/DESIGN.md "Heterogeneous fleets".
    dispatch_cache = {}

    def build_dispatch(assignments):
        buckets = []
        for s in range(n_sys):
            idx = np.flatnonzero(assignments == s)
            if idx.size == 0:
                continue
            k = idx.size
            # Pad to a power of two so the launch keeps MXU-aligned
            # tiles; duplicate lanes redo work harmlessly and are
            # dropped at scatter.
            P = _next_pow2(k)
            pad = np.concatenate([idx, np.full(P - k, idx[0])]) \
                if P > k else idx
            buckets.append((s, k, jnp.asarray(idx), jnp.asarray(pad)))
        B = assignments.size

        @jax.jit
        def run(x0s, Xref, Uref):
            out_x = jnp.zeros((N, B, nx), jnp.float32)
            out_u = jnp.zeros((N - 1, B, nu), jnp.float32)
            out_iter = jnp.zeros((B,), jnp.int32)
            out_solved = jnp.zeros((B,), bool)
            out_res = jnp.zeros((nres, B), jnp.float32)
            for s, k, sel, pad in buckets:
                Xs = Xref[s] if isinstance(Xref, (list, tuple)) else Xref
                Us = Uref[s] if isinstance(Uref, (list, tuple)) else Uref
                sol, res = solve_fused(probs[s], Xs, Us,
                                       jnp.take(x0s, pad, axis=0),
                                       tile=tile, interpret=interpret)
                out_x = out_x.at[:, sel].set(sol.x[:, :k])
                out_u = out_u.at[:, sel].set(sol.u[:, :k])
                out_iter = out_iter.at[sel].set(sol.iter[:k])
                out_solved = out_solved.at[sel].set(sol.solved[:k])
                out_res = out_res.at[:, sel].set(res[:, :k])
            return (Solution(iter=out_iter, solved=out_solved, x=out_x,
                             u=out_u), out_res)

        # The receding-horizon variant: the fleet-order carry is
        # gathered/scattered per bucket on its lane (last) axis; the
        # incoming carry buffers are donated into the outputs.
        @functools.partial(jax.jit, donate_argnums=(1,))
        def run_warm(x0s, carry, Xref, Uref):
            out_x = jnp.zeros((N, B, nx), jnp.float32)
            out_u = jnp.zeros((N - 1, B, nu), jnp.float32)
            out_iter = jnp.zeros((B,), jnp.int32)
            out_solved = jnp.zeros((B,), bool)
            out_res = jnp.zeros((nres, B), jnp.float32)
            out_carry = carry
            for s, k, sel, pad in buckets:
                Xs = Xref[s] if isinstance(Xref, (list, tuple)) else Xref
                Us = Uref[s] if isinstance(Uref, (list, tuple)) else Uref
                sub_c = jax.tree_util.tree_map(
                    lambda a: jnp.take(a, pad, axis=-1), carry)
                sol, res, c_out = solve_fused_warm(
                    probs[s], Xs, Us, jnp.take(x0s, pad, axis=0), sub_c,
                    tile=tile, interpret=interpret)
                out_x = out_x.at[:, sel].set(sol.x[:, :k])
                out_u = out_u.at[:, sel].set(sol.u[:, :k])
                out_iter = out_iter.at[sel].set(sol.iter[:k])
                out_solved = out_solved.at[sel].set(sol.solved[:k])
                out_res = out_res.at[:, sel].set(res[:, :k])
                out_carry = jax.tree_util.tree_map(
                    lambda o, n: o.at[..., sel].set(n[..., :k]),
                    out_carry, c_out)
            return (Solution(iter=out_iter, solved=out_solved, x=out_x,
                             u=out_u), out_res, out_carry)

        return run_warm if warm else run

    def solve(assignments, x0s, *args, Xref=None, Uref=None):
        assignments = np.asarray(assignments)
        x0s = jnp.asarray(x0s)
        B = x0s.shape[0]
        if assignments.shape != (B,):
            raise ValueError(f"assignments must be ({B},); got "
                             f"{assignments.shape}")
        if assignments.min() < 0 or assignments.max() >= n_sys:
            raise ValueError(f"assignments out of range [0, {n_sys})")
        if warm:
            if not args:
                raise ValueError(
                    "warm fleet solver takes (assignments, x0s, carry, "
                    "...); start from init_carry(probs[0], B)")
            carry, args = args[0], args[1:]
        if args:
            # Positional (Xref[, Uref]) for parity with the cold form.
            Xref = args[0]
            if len(args) > 1:
                Uref = args[1]
        key = assignments.tobytes()
        if key not in dispatch_cache:
            dispatch_cache[key] = build_dispatch(assignments)
        if warm:
            return dispatch_cache[key](x0s, carry, Xref, Uref)
        return dispatch_cache[key](x0s, Xref, Uref)

    return solve


def solve_fused_fleet(probs: Sequence[TinyProblem], assignments, x0s,
                      Xref=None, Uref=None, *, tile: Optional[int] = None,
                      interpret: bool = False):
    """One-shot convenience wrapper over :func:`make_fleet_solver` —
    for repeated fleet tick solves hold on to the factory's closure so
    the jitted fleet dispatch is reused instead of re-traced."""
    return make_fleet_solver(probs, tile=tile, interpret=interpret)(
        assignments, x0s, Xref, Uref)
