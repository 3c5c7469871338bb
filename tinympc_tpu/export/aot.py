"""AOT compilation + problem persistence.

The TPU-native equivalents of the reference's codegen-as-serialization
(SURVEY.md §5 checkpoint/resume): a configured problem is a pytree, so
persistence is plain arrays + a JSON header for the static spec/settings
(no pickle); a compiled solver is persisted portably through
``jax.export`` StableHLO serialization, which an inference host can load
and run without tracing or Python solver code.
"""
from __future__ import annotations

import dataclasses
import io
import json
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import admm
from ..types import (Cache, ConstraintData, ProblemSpec, Settings,
                     TinyProblem)
from ..types import init_state as _init_state


def save_problem(prob: TinyProblem, path) -> None:
    """Persist a problem (arrays -> .npz, spec/settings -> embedded JSON)."""
    leaves, treedef = jax.tree_util.tree_flatten(prob)
    header = dict(
        spec={**dataclasses.asdict(prob.spec)},
        settings=dataclasses.asdict(prob.settings),
        num_leaves=len(leaves),
    )
    # Tuples in spec (cone layouts) survive a JSON round trip as lists;
    # restored below in load_problem.
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    with open(path, "wb") as f:
        np.savez(f, __header__=json.dumps(header), **arrays)


def load_problem(path) -> TinyProblem:
    with np.load(path, allow_pickle=False) as zf:
        header = json.loads(str(zf["__header__"]))
        leaves = [jnp.asarray(zf[f"leaf_{i}"])
                  for i in range(header["num_leaves"])]
    spec_d = header["spec"]
    for k in ("state_cones", "input_cones"):
        spec_d[k] = tuple(tuple(c) for c in spec_d[k])
    spec = ProblemSpec(**spec_d)
    settings = Settings(**header["settings"])
    # Rebuild the treedef from a problem with the same static structure.
    proto = _empty_like(spec, settings, leaves)
    _, treedef = jax.tree_util.tree_flatten(proto)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _empty_like(spec, settings, leaves) -> TinyProblem:
    """A structural prototype whose flatten order matches save_problem's."""
    # Leaf ordering of TinyProblem only depends on which optional fields are
    # present; reconstruct by building a problem with the same spec and
    # filling every optional field that the leaf count implies. Simpler and
    # robust: flatten a template made of the same dataclasses with every
    # optional field set iff it was saved. We can recover presence from the
    # spec (cones/linear/tv imply cx/Alin/tv arrays; sensitivities are saved
    # iff adaptive data was attached — detectable from leaf count).
    dummy = jnp.zeros(())
    cache = Cache(rho=dummy, Kinf=dummy, Pinf=dummy, Quu_inv=dummy,
                  AmBKt=dummy, APf=dummy, BPf=dummy, C1=dummy, C2=dummy)
    n_base = 5 + 9 + 4  # A,B,f,Qdiag,Rdiag + cache(9) + bounds(4)
    extras = 0
    if spec.state_cones:
        extras += 1
    if spec.input_cones:
        extras += 1
    if spec.num_state_linear:
        extras += 2
    if spec.num_input_linear:
        extras += 2
    if spec.num_tv_state_linear:
        extras += 2
    if spec.num_tv_input_linear:
        extras += 2
    has_sens = len(leaves) == n_base + extras + 4
    if has_sens:
        cache = dataclasses.replace(
            cache, dKinf_drho=dummy, dPinf_drho=dummy,
            dC1_drho=dummy, dC2_drho=dummy)
    cons = ConstraintData(
        x_min=dummy, x_max=dummy, u_min=dummy, u_max=dummy,
        cx=dummy if spec.state_cones else None,
        cu=dummy if spec.input_cones else None,
        Alin_x=dummy if spec.num_state_linear else None,
        blin_x=dummy if spec.num_state_linear else None,
        Alin_u=dummy if spec.num_input_linear else None,
        blin_u=dummy if spec.num_input_linear else None,
        tv_Alin_x=dummy if spec.num_tv_state_linear else None,
        tv_blin_x=dummy if spec.num_tv_state_linear else None,
        tv_Alin_u=dummy if spec.num_tv_input_linear else None,
        tv_blin_u=dummy if spec.num_tv_input_linear else None,
    )
    return TinyProblem(A=dummy, B=dummy, f=dummy, Qdiag=dummy, Rdiag=dummy,
                       cache=cache, cons=cons, spec=spec, settings=settings)


def export_solver(prob: TinyProblem, batch_shape: Tuple[int, ...] = ()) -> bytes:
    """Serialize an AOT-compiled solve for this problem as StableHLO.

    The exported function signature is ``(state, Xref, Uref, x0) ->
    (solution, state, cache)`` with the problem data baked in as constants
    — the closest analog of the reference's burned-in ``tiny_data.cpp``.
    """
    spec = prob.spec
    dtype = prob.dtype
    state = _init_state(spec, batch_shape, dtype)
    Xref = jnp.zeros((spec.N, spec.nx), dtype)
    Uref = jnp.zeros((spec.N - 1, spec.nu), dtype)
    x0 = jnp.zeros((*batch_shape, spec.nx), dtype)

    def fn(state, Xref, Uref, x0):
        return admm.solve(prob, state, Xref, Uref, x0)

    exp = jax.export.export(jax.jit(fn))(state, Xref, Uref, x0)
    return bytes(exp.serialize())


def load_solver(blob: bytes):
    """Rehydrate an exported solver; returns a callable
    ``(state, Xref, Uref, x0) -> (solution, state, cache)``."""
    exp = jax.export.deserialize(blob)
    return exp.call
