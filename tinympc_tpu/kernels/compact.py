"""To-convergence fused solves with lane compaction.

The fused kernel (admm_pallas) already terminates each batch *tile* as
soon as every lane in it converges, but a tile is only as fast as its
slowest lane: at tile=4096 one stubborn problem keeps 4095 converged
lanes spinning. For to-convergence workloads (max_iter in the hundreds,
reference default 1000 — tiny_api_constants.hpp:5-7) the per-problem
iteration counts are heavily long-tailed (on the quadrotor benchmark
workload ~3% of problems finish within 100 iterations, ~21% within 500,
~73% within 2000), so run-to-tile-completion wastes a large fraction of
the chip on mixed-difficulty batches.

:func:`make_compact_solver` recovers per-*problem* early exit without
giving up wide tiles: the iteration budget is split into fixed chunks,
each chunk runs as one fused launch, and between chunks the still-
unconverged lanes are gathered into a fresh dense batch (padded to a
tile multiple so the lanes stay MXU-aligned). The exact warm-start carry
(:class:`~.admm_pallas.FusedCarry`) makes a chunk boundary invisible to
the algorithm: for box-constrained problems with fixed rho the chunked
solve is *bitwise identical* to a single ``max_iter``-long fused solve —
same iterates, same per-problem iteration counts, same residuals (the
carry hands over vnew/znew/g/y plus the one-behind v/z that iteration
0's dual residual reads, mirroring admm.cpp:444-446).

Everything between the per-phase solved-mask readbacks is jitted — the
phase solve, the compaction gather, and the result scatter are each one
device dispatch, built once by the factory and reused across calls (on
remote/tunneled accelerators, per-op eager dispatch costs ~100x, and
rebuilding jit closures per call re-traces and re-loads executables).

Deviations from a single long solve, by construction:
  * extra constraint families (SOC / hyperplane / tv) re-seed their slack
    from the carried x/u at each chunk boundary — exactly what the
    reference does on every ``tiny_solve`` call (admm.cpp:352-376), so
    the chunked solve matches a *sequence of warm reference solves*
    rather than one long one;
  * adaptive rho restarts its every-5-iterations clock at each chunk
    (admm.cpp:397 counts from the start of solve()), so adaptations
    land at chunk-local multiples of 5.
Both still satisfy the same termination criteria; solutions remain
feasible and residual-checked.

Consensus problems compact in *group units* (round 4): a scenario group
stays on chip until every lane in it converges (its mean needs all
members), the gather re-packs whole live groups, and the scatter masks
already-converged lanes so their first-convergence solutions stay frozen
exactly as in one long fused solve. Chunk boundaries re-seed the
consensus slack from the carried u[0] — the same per-``tiny_solve``
semantics as the extra families (admm.cpp:352-376), so the chunked
consensus solve matches a sequence of warm solves, not bitwise one long
one.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..types import Solution, TinyProblem
from .admm_pallas import init_carry, solve_fused_warm


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def make_compact_solver(prob: TinyProblem, *, chunk: int = 100,
                        tile: Optional[int] = None, min_batch: int = 256,
                        segment: Optional[int] = None,
                        backend: str = "auto",
                        precise_tail: Optional[int] = None,
                        interpret: bool = False):
    """Build a reusable to-convergence compaction solver for ``prob``.

    Returns ``solve(x0s, Xref=None, Uref=None) -> (Solution, residuals)``
    — semantically equivalent to ``solve_fused`` with the problem's full
    ``settings.max_iter`` budget (bitwise so for box families with fixed
    rho — see module docstring), but converged problems stop consuming
    chip time at the next ``chunk`` boundary instead of at tile
    completion. Residuals gain the final-rho 5th row for adaptive
    problems.

    Args:
      prob: the configured problem; ``settings.max_iter`` is the total
        iteration budget.
      chunk: iterations per fused launch — an int (every phase the same
        length), or a sequence of phase lengths, the last repeating until
        the budget is spent (e.g. ``[100, 400]``: compact once after 100
        iterations, then let the survivors run to the cap with in-kernel
        tile exit — one readback total, the right shape when the host
        round-trip is expensive relative to the kernel). Each length must
        be a multiple of ``settings.check_termination``. Smaller chunks
        compact sooner but pay more launch/readback overhead and compile
        more phase variants (one kernel per distinct (batch, iterations)
        pair — all cached inside the returned closure).
      tile: forwarded to the fused launches (None = auto per phase).
      min_batch: stop compacting below this many live lanes — the gather
        bookkeeping outweighs the saved iterations once the tail is
        narrow; the final phases run the stragglers at this width.
      segment: cap on the lanes resident on-chip at once. Batches larger
        than this run as sequential independent segments whose results
        are concatenated — the fleet pattern for batches whose warm-start
        carry (~3.7 KiB/problem on the box quadrotor N=20) outgrows HBM:
        B=2^20 needs ~8 GiB peak un-segmented, ~B/segment-th of that
        segmented. None = whole batch at once.
      backend: which warm fused solver runs the phases. "resident"
        (whole trajectories in VMEM, the default regime), "streamed"
        (HBM-resident trajectories, kernels/admm_stream — every family,
        fixed or adaptive rho, for horizons past the VMEM wall where the
        resident tile collapses), or "auto": streamed when the spec
        allows it and the resident auto tile would drop below 1024
        lanes. Both backends
        hand chunk boundaries over exactly, so the chunked solve stays
        bitwise equal to one long solve of the same backend. Note:
        since the streamed kernel gained per-tile early exit (round 4),
        a plain ``solve_fused_streamed`` run often beats streamed-phase
        compaction on mixed batches (measured 10.8k vs 8.6k solves/s at
        N=256, B=4096 — BENCH_TABLE.md); reach for streamed compaction
        when the live set shrinks far below a tile.
      precise_tail: the precision-recovery ladder (round 5,
        docs/PARITY.md "The oracle solved-fraction gap, decomposed"):
        after the base budget, lanes still unsolved — at
        matmul_precision "high" those sitting at the bf16x3 noise floor
        — warm-resume for up to this many extra iterations at
        "highest". The carry hands over exactly (precision changes the
        arithmetic, not the layout), so a straggler continues from its
        current iterate instead of restarting; recovered lanes report
        ``iter > max_iter`` (base budget + tail iterations). Costs only
        ``unsolved_frac x tail / (3x rate)`` instead of the 3x of
        running the whole fleet at "highest". None = off.
      interpret: run the kernels in interpreter mode (tests).
    """
    settings = prob.settings
    total = settings.max_iter
    consensus = prob.spec.en_consensus
    if tile is not None and (tile < 1 or tile & (tile - 1)):
        # The compaction pad (below) rounds shrunken batches to the next
        # power of two, which every power-of-two tile divides; a
        # non-power-of-two tile would fail the divisibility check inside a
        # later phase launch instead of here at factory time.
        raise ValueError(f"explicit tile ({tile}) must be a power of two")
    if backend not in ("auto", "resident", "streamed"):
        raise ValueError(f"unknown backend {backend!r}")
    stream_ok = True   # both warm kernels cover every family (round 4)
    if backend == "auto":
        from .admm_pallas import max_tile
        backend = "streamed" if (
            stream_ok and max_tile(prob, warm=True, final=True) < 1024) \
            else "resident"
    use_stream = backend == "streamed"
    schedule = [chunk] if isinstance(chunk, int) else [int(c) for c in chunk]
    for c in schedule:
        if c < 1 or c % settings.check_termination:
            raise ValueError(
                f"chunk ({c}) must be a positive multiple of "
                f"check_termination ({settings.check_termination}) so "
                "residual checks land on chunk boundaries")

    def phase_len(phase_idx: int, remaining: int) -> int:
        c = schedule[min(phase_idx, len(schedule) - 1)]
        return min(c, remaining)

    phase_fns = {}

    def run_tail(Xref, Uref, x0_sub, carry_sub):
        if "tail" not in phase_fns:
            p = prob.replace(settings=dataclasses.replace(
                settings, max_iter=precise_tail,
                matmul_precision="highest"))
            if use_stream:
                from .admm_stream import solve_fused_streamed_warm
                phase_fns["tail"] = jax.jit(
                    lambda X, U, x0, c: solve_fused_streamed_warm(
                        p, X, U, x0, c, tile=tile, interpret=interpret),
                    donate_argnums=(3,))
            else:
                phase_fns["tail"] = jax.jit(
                    lambda X, U, x0, c: solve_fused_warm(
                        p, X, U, x0, c, tile=tile, final=True,
                        interpret=interpret),
                    donate_argnums=(3,))
        return phase_fns["tail"](Xref, Uref, x0_sub, carry_sub)

    def run_phase(iters, Xref, Uref, x0_sub, carry_sub):
        if iters not in phase_fns:
            p = prob.replace(
                settings=dataclasses.replace(settings, max_iter=iters))
            # final=True: no per-lane carry freeze — the gather below only
            # ever reads unconverged lanes' carries, and dropping the
            # snapshot machinery makes mixed-convergence phases ~2x faster.
            # The carry argument is donated: its buffers back the carry
            # outputs, halving the dominant HBM term at large batches
            # (the carry is ~3.7 KiB/problem for the box quadrotor N=20 —
            # at B=2^20 donation is the difference between fitting one
            # chip's HBM and ResourceExhausted).
            if use_stream:
                from .admm_stream import solve_fused_streamed_warm
                phase_fns[iters] = jax.jit(
                    lambda X, U, x0, c: solve_fused_streamed_warm(
                        p, X, U, x0, c, tile=tile, interpret=interpret),
                    donate_argnums=(3,))
            else:
                phase_fns[iters] = jax.jit(
                    lambda X, U, x0, c: solve_fused_warm(p, X, U, x0, c,
                                                         tile=tile,
                                                         final=True,
                                                         interpret=interpret),
                    donate_argnums=(3,))
        return phase_fns[iters](Xref, Uref, x0_sub, carry_sub)

    @jax.jit
    def gather_phase(x0s, carry, local_pad, global_pad):
        sub_x0 = jnp.take(x0s, global_pad, axis=0)
        sub_carry = jax.tree_util.tree_map(
            lambda a: jnp.take(a, local_pad, axis=-1), carry)
        return sub_x0, sub_carry

    @functools.partial(jax.jit, donate_argnums=(0,))
    def scatter_phase(outs, sel, sol, res, used):
        out_x, out_u, out_iter, out_solved, out_res = outs
        k = sel.shape[0]
        return (out_x.at[:, sel].set(sol.x[:, :k]),
                out_u.at[:, sel].set(sol.u[:, :k]),
                out_iter.at[sel].set(used + sol.iter[:k]),
                out_solved.at[sel].set(sol.solved[:k]),
                out_res.at[:, sel].set(res[:, :k]))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def scatter_phase_masked(outs, sel, sol, res, used):
        # Consensus: whole live groups re-ran, but lanes that had already
        # converged keep their first-convergence outputs (the long-solve
        # freeze semantics); only still-unsolved lanes commit.
        out_x, out_u, out_iter, out_solved, out_res = outs
        k = sel.shape[0]
        live = jnp.logical_not(out_solved[sel])            # (k,)
        lx = live[None, :, None]
        return (out_x.at[:, sel].set(
                    jnp.where(lx, sol.x[:, :k], out_x[:, sel])),
                out_u.at[:, sel].set(
                    jnp.where(lx, sol.u[:, :k], out_u[:, sel])),
                out_iter.at[sel].set(
                    jnp.where(live, used + sol.iter[:k], out_iter[sel])),
                out_solved.at[sel].set(out_solved[sel] | sol.solved[:k]),
                out_res.at[:, sel].set(
                    jnp.where(live[None, :], res[:, :k], out_res[:, sel])))

    def solve(x0s, Xref=None, Uref=None):
        x0s = jnp.asarray(x0s)
        if consensus:
            return solve_consensus(x0s, Xref, Uref)
        B = x0s.shape[0]
        if segment and B > segment:
            parts = [solve(x0s[o:o + segment], Xref, Uref)
                     for o in range(0, B, segment)]
            sols, ress = zip(*parts)
            cat = jnp.concatenate
            return (Solution(iter=cat([s.iter for s in sols]),
                             solved=cat([s.solved for s in sols]),
                             x=cat([s.x for s in sols], axis=1),
                             u=cat([s.u for s in sols], axis=1)),
                    cat(ress, axis=1))
        step = phase_len(0, total)
        phase_idx = 1
        carry = init_carry(prob, B)
        sol, res, carry = run_phase(step, Xref, Uref, x0s, carry)
        out_x, out_u = sol.x, sol.u      # (N, B, nx), (N-1, B, nu)
        out_iter, out_solved, out_res = sol.iter, sol.solved, res
        used = step

        # g: global lane ids of the first k (real) lanes of the carry.
        g = np.arange(B)
        k = B
        solved_host = np.asarray(out_solved)
        while used < total:
            local = np.flatnonzero(~solved_host)
            if local.size == 0:
                break
            g = g[local]
            k = local.size
            # Pad the gather so the fused launch keeps full-width tiles:
            # up to a multiple of the tile width (every power-of-two tile
            # divides it), or the next power of two below one tile.
            # Duplicated lanes redo work harmlessly and are dropped at
            # scatter. Below min_batch, stop shrinking.
            T = tile if tile else 4096
            P = -(-k // T) * T if k >= T else _next_pow2(k)
            P = max(P, min(min_batch, _next_pow2(B)))
            local_pad = np.concatenate([local, np.full(P - k, local[0])]) \
                if P > k else local
            global_pad = np.concatenate([g, np.full(P - k, g[0])]) \
                if P > k else g
            sub_x0, carry = gather_phase(x0s, carry, jnp.asarray(local_pad),
                                         jnp.asarray(global_pad))

            step = phase_len(phase_idx, total - used)
            phase_idx += 1
            sol, res, carry = run_phase(step, Xref, Uref, sub_x0, carry)
            out_x, out_u, out_iter, out_solved, out_res = scatter_phase(
                (out_x, out_u, out_iter, out_solved, out_res),
                jnp.asarray(g), sol, res, jnp.int32(used))
            used += step
            solved_host = np.asarray(sol.solved[:k])

        if precise_tail and not solved_host.all():
            # Precision-recovery ladder: warm-resume the survivors at
            # "highest" (docstring).
            local = np.flatnonzero(~solved_host)
            g = g[local]
            k = local.size
            T = tile if tile else 4096
            P = -(-k // T) * T if k >= T else _next_pow2(k)
            P = max(P, min(min_batch, _next_pow2(B)))
            local_pad = np.concatenate([local, np.full(P - k, local[0])]) \
                if P > k else local
            global_pad = np.concatenate([g, np.full(P - k, g[0])]) \
                if P > k else g
            sub_x0, carry = gather_phase(x0s, carry, jnp.asarray(local_pad),
                                         jnp.asarray(global_pad))
            sol, res, carry = run_tail(Xref, Uref, sub_x0, carry)
            out_x, out_u, out_iter, out_solved, out_res = scatter_phase(
                (out_x, out_u, out_iter, out_solved, out_res),
                jnp.asarray(g), sol, res, jnp.int32(used))

        return (Solution(iter=out_iter, solved=out_solved, x=out_x,
                         u=out_u), out_res)

    def solve_consensus(x0s, Xref=None, Uref=None):
        # Group-unit compaction (module docstring): x0s is
        # (n_groups, G, nx); gather/scatter operate on whole groups, the
        # scatter masks already-solved lanes. Outputs flatten to lanes
        # internally and reshape back at the end.
        ng0, G, nx = x0s.shape
        if G & (G - 1):
            raise ValueError(f"scenario group size {G} must be a power "
                             "of two")
        B = ng0 * G
        N = prob.spec.N

        nu = prob.spec.nu

        def flat(sol, res):
            return (sol.x.reshape(N, -1, nx),
                    sol.u.reshape(N - 1, -1, nu),
                    sol.iter.reshape(-1), sol.solved.reshape(-1),
                    res.reshape(res.shape[0], -1))

        step = phase_len(0, total)
        phase_idx = 1
        carry = init_carry(prob, B)
        sol, res, carry = run_phase(step, Xref, Uref, x0s, carry)
        out_x, out_u, out_iter, out_solved, out_res = flat(sol, res)
        used = step

        g_groups = np.arange(ng0)         # global ids of live groups
        kg = ng0
        solved_host = np.asarray(out_solved)
        T = tile if tile else 4096
        while used < total:
            # Liveness must be POSITIONAL relative to the previous live
            # order: after the first compaction the carry only holds the
            # previous g_groups' lanes (slot i of the carry = group
            # g_groups[i]), so indices into the carry and into g_groups
            # are positions in that narrowed layout, not global ids.
            # (Round-5 fix: indexing with global ids gathered the wrong
            # groups' carries — or raised — once the live set shrank
            # before a later phase.)
            lane_solved = solved_host.reshape(-1, G)       # global (ng0, G)
            local_g = np.flatnonzero(~lane_solved[g_groups].all(axis=1))
            if local_g.size == 0:
                break
            g_groups = g_groups[local_g]
            kg = local_g.size
            k_lanes = kg * G
            # Pad whole groups to a tile multiple (tile % G == 0 is
            # enforced by the kernels, and powers of two divide cleanly).
            P = -(-k_lanes // T) * T if k_lanes >= T                 else max(_next_pow2(k_lanes), G)
            P = max(P, min(min_batch, _next_pow2(B)))
            pg = P // G
            local_gp = np.concatenate(
                [local_g, np.full(pg - kg, local_g[0])])                 if pg > kg else local_g
            global_gp = np.concatenate(
                [g_groups, np.full(pg - kg, g_groups[0])])                 if pg > kg else g_groups
            lane_local = (local_gp[:, None] * G + np.arange(G)).ravel()
            sub_x0, carry = gather_phase(
                x0s, carry, jnp.asarray(lane_local),
                jnp.asarray(global_gp))

            step = phase_len(phase_idx, total - used)
            phase_idx += 1
            sol, res, carry = run_phase(step, Xref, Uref, sub_x0, carry)
            sx, su, sit, ssv, sres = flat(sol, res)
            sel_lanes = (g_groups[:, None] * G + np.arange(G)).ravel()
            out_x, out_u, out_iter, out_solved, out_res =                 scatter_phase_masked(
                    (out_x, out_u, out_iter, out_solved, out_res),
                    jnp.asarray(sel_lanes),
                    Solution(iter=sit, solved=ssv, x=sx, u=su), sres,
                    jnp.int32(used))
            used += step
            solved_host = np.asarray(out_solved)

        lane_solved = solved_host.reshape(-1, G)
        if precise_tail and not lane_solved.all():
            # Ladder for scenario groups: whole live groups warm-resume
            # at "highest"; the masked scatter keeps first-convergence
            # outputs frozen.
            local_g = np.flatnonzero(~lane_solved[g_groups].all(axis=1))
            if local_g.size:
                g_groups = g_groups[local_g]
                kg = local_g.size
                k_lanes = kg * G
                P = -(-k_lanes // T) * T if k_lanes >= T \
                    else max(_next_pow2(k_lanes), G)
                P = max(P, min(min_batch, _next_pow2(B)))
                pg = P // G
                local_gp = np.concatenate(
                    [local_g, np.full(pg - kg, local_g[0])]) \
                    if pg > kg else local_g
                global_gp = np.concatenate(
                    [g_groups, np.full(pg - kg, g_groups[0])]) \
                    if pg > kg else g_groups
                lane_local = (local_gp[:, None] * G + np.arange(G)).ravel()
                sub_x0, carry = gather_phase(
                    x0s, carry, jnp.asarray(lane_local),
                    jnp.asarray(global_gp))
                sol, res, carry = run_tail(Xref, Uref, sub_x0, carry)
                sx, su, sit, ssv, sres = flat(sol, res)
                sel_lanes = (g_groups[:, None] * G + np.arange(G)).ravel()
                out_x, out_u, out_iter, out_solved, out_res = \
                    scatter_phase_masked(
                        (out_x, out_u, out_iter, out_solved, out_res),
                        jnp.asarray(sel_lanes),
                        Solution(iter=sit, solved=ssv, x=sx, u=su), sres,
                        jnp.int32(used))

        r = out_res.shape[0]
        return (Solution(iter=out_iter.reshape(ng0, G),
                         solved=out_solved.reshape(ng0, G),
                         x=out_x.reshape(N, ng0, G, nx),
                         u=out_u.reshape(N - 1, ng0, G, -1)),
                out_res.reshape(r, ng0, G))

    return solve


def solve_fused_compact(prob: TinyProblem, Xref=None, Uref=None, x0s=None, *,
                        chunk: int = 100, tile: Optional[int] = None,
                        min_batch: int = 256, interpret: bool = False):
    """One-shot convenience wrapper over :func:`make_compact_solver`.

    Builds the solver and runs it once — fine for tests and single
    solves; for repeated solves (serving, closed loops) hold on to
    ``make_compact_solver(prob, ...)`` so its jitted phases are reused
    instead of re-traced per call.
    """
    return make_compact_solver(prob, chunk=chunk, tile=tile,
                               min_batch=min_batch,
                               interpret=interpret)(x0s, Xref, Uref)
