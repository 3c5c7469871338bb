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
