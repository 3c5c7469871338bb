"""Tracing / profiling / observability helpers (SURVEY.md §5).

The reference's only instrumentation is an Arduino ``micros()`` stub and
stdout prints (rho_benchmark.cpp:8-12, admm.cpp:439). Here:

  * :func:`solve_stats` — structured per-solve statistics from the returned
    pytrees (the reference's printed iteration counts, as data).
  * :func:`timed` — wall-clock timing with ``block_until_ready`` semantics.
  * :func:`trace` — context manager around ``jax.profiler`` emitting a
    TensorBoard-compatible device trace of the solve.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np

from .types import Solution, SolverState


def solve_stats(sol: Solution, state: SolverState) -> dict:
    """Summarise a (possibly batched) solve into plain-python stats."""
    iters = np.asarray(sol.iter)
    solved = np.asarray(sol.solved)
    return {
        "problems": int(iters.size),
        "solved": int(solved.sum()),
        "solved_frac": float(solved.mean()),
        "iters_total": int(iters.sum()),
        "iters_mean": float(iters.mean()),
        "iters_max": int(iters.max()),
        "pri_res_state_max": float(np.max(np.asarray(state.pri_res_state))),
        "pri_res_input_max": float(np.max(np.asarray(state.pri_res_input))),
        "dua_res_state_max": float(np.max(np.asarray(state.dua_res_state))),
        "dua_res_input_max": float(np.max(np.asarray(state.dua_res_input))),
    }


def timed(fn: Callable, *args, reps: int = 1, warmup: bool = True, **kw):
    """Run ``fn`` ``reps`` times, blocking on the result; returns
    (last_result, seconds_per_rep)."""
    if warmup:
        jax.block_until_ready(fn(*args, **kw))
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return out, (time.perf_counter() - t0) / reps


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard / Perfetto::

        with profiling.trace("/tmp/mpc-trace"):
            sol, state, _ = tm.solve(prob, state, x0=x0s)
            jax.block_until_ready(sol.x)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_compilation_cache(path: str = None):
    """Turn on JAX's persistent compilation cache (default: a repo-local
    .jax_cache). XLA compiles of the fused kernels and while_loop solvers
    are expensive through remote-TPU tunnels (observed 20s-550s for the
    same program depending on service load); the persistent cache makes
    every process after the first pay ~none of it."""
    import os
    if path is None:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
