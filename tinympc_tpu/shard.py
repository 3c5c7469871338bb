"""Mesh sharding for fleet-scale batched solves.

The reference is single-problem/single-thread (SURVEY.md §2.4); here the
problem batch is the parallelism axis. Solves are embarrassingly parallel
except for one global scalar: the ``jnp.all(converged)`` loop predicate in
:func:`tinympc_tpu.admm.solve`, which XLA lowers to a cross-shard AND every
iteration — the only collective on the hot path, striding with
``Settings.check_termination`` exactly like the reference amortises its
termination check (admm.cpp:312).

Usage::

    mesh = make_mesh()                       # all local devices, axis "dp"
    state = shard_state(mesh, tm.init_state(prob, (B,)))
    x0s = shard_batch_leading(mesh, x0s)
    sol, state, cache = tm.solve(prob, state, x0=x0s)   # GSPMD-partitioned

Problem data (A, B, cache, bounds) is replicated — it is tiny. For
heterogeneous fleets with batched cache leaves, shard the problem with
:func:`shard_batch_leading` too.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AxisLike = Union[str, Sequence[str]]


# ------------------------------------------------------------- multi-host

def distributed_init(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     **kw) -> None:
    """Join a multi-host fleet: wire JAX's distributed runtime so
    ``jax.devices()`` spans every host and meshes built by
    :func:`make_mesh` shard over DCN.

    Thin, idempotent wrapper over ``jax.distributed.initialize``. On cloud
    TPU pods the arguments are auto-detected from the environment — call
    with none; on self-managed clusters pass
    ``(coordinator_address="host0:8476", num_processes=H, process_id=h)``
    (the analog of torchrun-style rendezvous; the reference has no
    multi-anything, SURVEY.md §2.4). After this, the flow is unchanged:
    build a mesh over ``jax.devices()`` and feed globally-sharded batches
    from :func:`global_batch`.
    """
    # Probe initialisation state without jax.process_count(), which would
    # itself initialise the backend (then initialize() raises).
    from jax._src import distributed as _dist
    if _dist.global_state.client is not None:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kw)


def global_batch(mesh: Mesh, local, axis: Optional[AxisLike] = None):
    """Assemble a global batch-leading array (or pytree) from each
    process's *local* rows: process p contributes ``local`` with shape
    ``(B_local, ...)`` and the result is a (num_processes * B_local, ...)
    array sharded over ``mesh``'s ``axis`` — multi-host batch ingestion
    without ever materialising the full fleet on one host.

    Single-process meshes fall back to :func:`shard_batch_leading`.
    """
    if jax.process_count() == 1:
        return shard_batch_leading(mesh, local, axis)
    ax = _axes(mesh, axis)

    def put(leaf):
        leaf = np.asarray(leaf)
        gshape = (leaf.shape[0] * jax.process_count(),) + leaf.shape[1:]
        sharding = NamedSharding(mesh, P(ax))
        return jax.make_array_from_process_local_data(sharding, leaf, gshape)

    return jax.tree.map(put, local)


def local_rows(garray):
    """This process's rows of a batch-leading globally-sharded array,
    concatenated in device order — the inverse of :func:`global_batch`
    for reading results back on each host."""
    shards = sorted(garray.addressable_shards, key=lambda s: s.index[0].start)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Optional[Tuple[str, ...]] = None,
              devices=None) -> Mesh:
    """Build a device mesh. Default: 1-D over all devices, axis ``dp``.
    Pass e.g. ``shape=(2, 4), axis_names=("host", "chip")`` for hierarchical
    layouts (batch outer-sharded over DCN, inner over ICI)."""
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),)
    if axis_names is None:
        axis_names = ("dp",) if len(shape) == 1 else tuple(
            f"dp{i}" for i in range(len(shape)))
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def _axes(mesh: Mesh, axis: Optional[AxisLike]) -> Tuple[str, ...]:
    if axis is None:
        return tuple(mesh.axis_names)
    return (axis,) if isinstance(axis, str) else tuple(axis)


def shard_state(mesh: Mesh, state, axis: Optional[AxisLike] = None):
    """Place a SolverState on the mesh with its *leading batch axis*
    partitioned. Time-major leaves (T, *b, F) shard on axis 1; per-problem
    scalars (*b,) and per-problem feature rows like the consensus
    (*b, nu) slack/dual shard on axis 0. Works for any batch rank
    (consensus states have *b = (n_groups, group); groups shard whole)."""
    ax = _axes(mesh, axis)
    nb = len(state.batch_shape)

    def put(leaf):
        spec = P(None, ax) if leaf.ndim == nb + 2 else P(ax)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(put, state)


def shard_batch_leading(mesh: Mesh, tree, axis: Optional[AxisLike] = None):
    """Shard every leaf of a batch-leading pytree ((B, ...) arrays: x0
    batches, batched cache/problem leaves) on its first axis."""
    ax = _axes(mesh, axis)

    def put(leaf):
        return jax.device_put(leaf, NamedSharding(mesh, P(ax)))

    return jax.tree.map(put, tree)


def shard_batch_middle(mesh: Mesh, tree, axis: Optional[AxisLike] = None):
    """Shard (T, B, ...) reference trajectories on their second axis."""
    ax = _axes(mesh, axis)

    def put(leaf):
        return jax.device_put(leaf, NamedSharding(mesh, P(None, ax)))

    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    """Replicate problem data across the mesh."""

    def put(leaf):
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    return jax.tree.map(put, tree)


def solve_fused_sharded(prob, Xref, Uref, x0s, mesh: Mesh, *,
                        axis: Optional[AxisLike] = None,
                        tile: Optional[int] = None,
                        interpret: bool = False):
    """Run the fused Pallas solve kernel across a device mesh: the batch
    axis is shard_map-partitioned and each device runs its own VMEM-fused
    kernel over its local shard. Solves are independent, so there are no
    collectives at all — per-shard early exit is strictly better than a
    global loop predicate. Returns ``(Solution, residuals)`` like
    :func:`~tinympc_tpu.kernels.solve_fused`.
    """
    from jax import shard_map
    from .kernels import solve_fused

    ax = _axes(mesh, axis)
    n = int(np.prod([mesh.shape[a] for a in ax]))
    B = x0s.shape[0]
    pad = (-B) % n
    if pad:
        # Ragged batch: pad with duplicate rows (their solves are real work
        # but converge like their originals) and drop the extra outputs.
        import jax.numpy as jnp
        reps = jnp.concatenate([x0s] * (-(-(B + pad) // B)))[:B + pad]
        sol, res = solve_fused_sharded(prob, Xref, Uref, reps, mesh,
                                       axis=axis, tile=tile,
                                       interpret=interpret)
        from .types import Solution
        trim_lead = lambda a: a[:B]
        trim_mid = lambda a: a[:, :B]
        sol = Solution(iter=trim_lead(sol.iter), solved=trim_lead(sol.solved),
                       x=trim_mid(sol.x), u=trim_mid(sol.u))
        return sol, trim_mid(res)
    # Consensus batches are (n_groups, group, nx): shard the *groups* axis
    # so every scenario group stays whole inside one device's kernel tile
    # (the group mean is within-tile; see kernels._segment_mean_lanes) —
    # still zero collectives.
    def local(x0s_local):
        # tile=None → per-device auto selection (VMEM-fit, capped at 4096).
        sol, res = solve_fused(prob, Xref, Uref, x0s_local,
                               tile=tile, interpret=interpret)
        return sol, res

    from .types import Solution
    # Solution trajectories are (T, B, F) — batch on axis 1 (with consensus,
    # (T, n_groups, group, F)); iter/solved lead with the sharded axis;
    # residuals are (4, B) / (4, n_groups, group).
    sol_specs = Solution(iter=P(ax), solved=P(ax),
                         x=P(None, ax), u=P(None, ax))
    return shard_map(
        local, mesh=mesh,
        in_specs=P(ax),
        out_specs=(sol_specs, P(None, ax)),
        check_vma=False,
    )(x0s)


def solve_fused_consensus_sharded(prob, Xref, Uref, x0s, mesh: Mesh, *,
                                  axis: Optional[AxisLike] = None,
                                  sync_stride: int = 5,
                                  tile: Optional[int] = None,
                                  carry=None, return_carry: bool = False,
                                  interpret: bool = False):
    """Cross-shard consensus ADMM on the *fused* kernel (round 5): the
    scenario-group member axis is sharded over the mesh, each device runs
    the resident fused kernel over its local members, and the global
    group mean is refreshed by one ``pmean`` of a per-group ``(ng, nu)``
    row every ``sync_stride`` iterations — the reference's amortised-
    check collective discipline (admm.cpp:312) applied to the consensus
    family. This puts the BASELINE pod-slice consensus workload on the
    kernel that owns the throughput; the XLA path
    (``Settings.consensus_axis_name``) remains the per-iteration-pmean
    semantics.

    Mechanism: between chunked warm launches (``FusedCarry`` hand-over,
    exactly the compaction driver's boundary semantics — consensus slack
    re-seeds from the carried u[0] like a sequence of warm reference
    solves, admm.cpp:352-376) the driver computes the *stale offset*
    ``delta = global_mean − local_mean`` of the consensus candidate
    ``u[0] + yc0`` and the kernel adds it to its in-kernel local group
    mean every iteration (``consensus_delta``). Within a chunk the
    offset is stale; at any consensus fixed point it is exact, so the
    scheme's fixed points are precisely the global-consensus solutions,
    and the in-kernel termination gate (residuals + ``|u0 − zc0|``)
    certifies them. Iterates therefore differ from the per-iteration
    XLA path along the way but agree at convergence (test:
    tests/test_shard.py::test_fused_consensus_sharded).

    Args: x0s ``(n_groups, G_global, nx)`` with the member axis dividing
    over the mesh axes (each shard holds ``G_global / n_devices``
    members of every group — a power of two). ``sync_stride`` must be a
    multiple of ``settings.check_termination``. Returns
    ``(Solution, residuals)`` shaped like the consensus
    :func:`~tinympc_tpu.kernels.solve_fused`.

    ``carry``/``return_carry`` (round 5): warm receding-horizon trees at
    pod scale — pass the previous call's carry (a sharded flat-lane
    :class:`~tinympc_tpu.kernels.FusedCarry`; ``None`` = cold) and set
    ``return_carry=True`` to get ``(Solution, residuals, carry')``. The
    carried consensus slack/dual pair is the outer iterate; it persists
    across calls like the per-``tiny_solve`` dual persistence of the
    single-device path.
    """
    import dataclasses
    import jax.numpy as jnp
    from jax import shard_map
    from .kernels import init_carry, solve_fused_warm
    from .types import Solution

    settings = prob.settings
    if not prob.spec.en_consensus:
        raise ValueError("solve_fused_consensus_sharded needs a consensus "
                         "problem (with_consensus)")
    if sync_stride < 1 or sync_stride % settings.check_termination:
        raise ValueError(
            f"sync_stride ({sync_stride}) must be a positive multiple of "
            f"check_termination ({settings.check_termination}) so in-"
            "kernel residual checks land on sync boundaries")
    ax = _axes(mesh, axis)
    n = int(np.prod([mesh.shape[a] for a in ax]))
    ng, Gg, nx = x0s.shape
    if Gg % n:
        raise ValueError(f"global group size {Gg} must divide over the "
                         f"{n}-device mesh")
    Gl = Gg // n
    if Gl & (Gl - 1):
        raise ValueError(f"per-shard group slice {Gl} must be a power of "
                         "two (kernel group constraint)")
    N, nu = prob.spec.N, prob.spec.nu
    total = settings.max_iter
    p_chunk = prob.replace(settings=dataclasses.replace(
        settings, max_iter=sync_stride))
    axname = ax[0] if len(ax) == 1 else ax
    f32 = jnp.float32

    def local_impl(x0l, carry_l):         # (ng, Gl, nx)
        import dataclasses as _dc
        B = ng * Gl

        def outer_update(carry):
            # Exact outer consensus step on the current inner solution:
            # z = global mean of (u0 + y) via ONE pmean of an (nu, ng)
            # row; scaled-dual ascent. This is the admm.update_slack /
            # update_dual consensus pair, executed at the sync stride
            # instead of per iteration — two-level ADMM with the inner
            # prox-MPC solved by the fused kernel.
            u0 = carry.u[0]                          # (nu, B)
            cand = u0 + carry.yc0
            lm = cand.reshape(nu, ng, Gl).mean(axis=2)   # (nu, ng)
            gm = jax.lax.pmean(lm, axname)
            zc0 = jnp.repeat(gm[:, :, None], Gl, axis=2).reshape(nu, B)
            yc0 = carry.yc0 + u0 - zc0
            return _dc.replace(carry, zc0=zc0, yc0=yc0), gm

        def chunk(state):
            used, _, ox, ou, oit, osv, ores, carry = state
            carry, _ = outer_update(carry)
            sol, res, carry = solve_fused_warm(
                p_chunk, Xref, Uref, x0l, carry, tile=tile, final=True,
                interpret=interpret, consensus_frozen=True)
            fx = sol.x.reshape(N, B, nx)
            fu = sol.u.reshape(N - 1, B, nu)
            fit = sol.iter.reshape(B)
            fsv = sol.solved.reshape(B)
            fres = res.reshape(res.shape[0], B)
            live = jnp.logical_not(osv)
            lx = live[None, :, None]
            ox = jnp.where(lx, fx, ox)
            ou = jnp.where(lx, fu, ou)
            oit = jnp.where(live, used + fit, oit)
            ores = jnp.where(live[None, :], fres, ores)
            # Commit gate: the in-kernel cres measured against the
            # frozen outer slack; certify against the TRUE current
            # global mean of the group state (frozen outputs for solved
            # lanes, carry for live ones) so a committed lane has the
            # same freeze-time guarantee as the XLA per-iteration path.
            u0_eff = jnp.where((osv | fsv)[:, None], ou[0],
                               carry.u[0].T)              # (B, nu)
            lm2 = u0_eff.reshape(ng, Gl, nu).mean(axis=1)
            gm2 = jax.lax.pmean(lm2, axname)              # (ng, nu)
            cres = jnp.max(jnp.abs(
                u0_eff - jnp.repeat(gm2, Gl, axis=0)), axis=1)
            osv = osv | (fsv & (cres < settings.abs_pri_tol))
            # Global convergence check inside the body (a collective in
            # the while *cond* would be a channel op in the predicate).
            all_done = jax.lax.pmean(
                jnp.all(osv).astype(f32), axname) == 1.0
            return (used + sync_stride, all_done,
                    ox, ou, oit, osv, ores, carry)

        def cond(state):
            used, all_done = state[0], state[1]
            return (used < total) & jnp.logical_not(all_done)

        carry0 = carry_l if carry_l is not None else init_carry(prob, B)
        nres = 5 if settings.adaptive_rho else 4
        state0 = (jnp.int32(0), jnp.asarray(False),
                  jnp.zeros((N, B, nx), f32),
                  jnp.zeros((N - 1, B, nu), f32),
                  jnp.zeros((B,), jnp.int32),
                  jnp.zeros((B,), bool),
                  jnp.zeros((nres, B), f32),
                  carry0)
        _, _, ox, ou, oit, osv, ores, carry_out = jax.lax.while_loop(
            cond, chunk, state0)
        sol = Solution(iter=oit.reshape(ng, Gl),
                       solved=osv.reshape(ng, Gl),
                       x=ox.reshape(N, ng, Gl, nx),
                       u=ou.reshape(N - 1, ng, Gl, nu))
        return sol, ores.reshape(nres, ng, Gl), carry_out

    sol_specs = Solution(iter=P(None, ax), solved=P(None, ax),
                         x=P(None, None, ax), u=P(None, None, ax))
    # Carry leaves are lane-last (..., B_local): shard the last axis.
    def _cspec(leaf):
        return P(*([None] * (leaf.ndim - 1) + [ax]))
    if carry is not None:
        cspecs = jax.tree.map(_cspec, carry)
        sol, res, carry_out = shard_map(
            local_impl, mesh=mesh,
            in_specs=(P(None, ax), cspecs),
            out_specs=(sol_specs, P(None, None, ax), cspecs),
            check_vma=False,
        )(x0s, carry)
    else:
        probe = init_carry(prob, 1)
        cspecs = jax.tree.map(_cspec, probe)
        sol, res, carry_out = shard_map(
            lambda x0l: local_impl(x0l, None), mesh=mesh,
            in_specs=P(None, ax),
            out_specs=(sol_specs, P(None, None, ax), cspecs),
            check_vma=False,
        )(x0s)
    if return_carry:
        return sol, res, carry_out
    return sol, res


def solve_fused_streamed_sharded(prob, Xref, Uref, x0s, mesh: Mesh, *,
                                 axis: Optional[AxisLike] = None,
                                 tile: Optional[int] = None,
                                 chunk: int = 8,
                                 interpret: bool = False):
    """Long-horizon streamed solve (:func:`~tinympc_tpu.kernels.
    solve_fused_streamed`) across a device mesh: the batch axis is
    shard_map-partitioned and each device streams its local shard's
    horizon through its own VMEM — zero collectives (the per-shard
    while_loop predicate replaces the global one). Requires the batch to
    divide evenly over the mesh axes (the long-horizon regime is a
    planned fleet, not a ragged serving queue)."""
    from jax import shard_map
    from .kernels import solve_fused_streamed
    from .types import Solution

    ax = _axes(mesh, axis)
    n = int(np.prod([mesh.shape[a] for a in ax]))
    if x0s.shape[0] % n:
        raise ValueError(f"batch {x0s.shape[0]} must divide over the "
                         f"{n}-device mesh")

    def local(x0s_local):
        return solve_fused_streamed(prob, Xref, Uref, x0s_local,
                                    tile=tile, chunk=chunk,
                                    interpret=interpret)

    sol_specs = Solution(iter=P(ax), solved=P(ax),
                         x=P(None, ax), u=P(None, ax))
    return shard_map(
        local, mesh=mesh,
        in_specs=P(ax),
        out_specs=(sol_specs, P(None, ax)),
        check_vma=False,
    )(x0s)
