"""tinympc-tpu: a TPU-native model-predictive-control framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
TinyMPC embedded solver (ADMM linear-MPC with an infinite-horizon Riccati
cache; box / second-order-cone / hyperplane / time-varying-hyperplane
constraints; OSQP-style adaptive rho with first-order cache updates), built
for the opposite end of the scale: batches of thousands to millions of QPs
solved per step on TPU meshes instead of one QP on a microcontroller.

Quick start::

    import tinympc_tpu as tm

    prob = tm.setup(A, B, Q, R, rho=5.0, N=10)
    prob = tm.with_bounds(prob, x_min=-5, x_max=5, u_min=-0.5, u_max=0.5)
    state = tm.init_state(prob)
    sol, state, cache = tm.solve(prob, state, x0=x0, Xref=Xref)

Batched (one system, many problems)::

    state = tm.init_state(prob, batch_shape=(4096,))
    sol, state, cache = tm.solve(prob, state, x0=x0_batch)   # x0 (4096, nx)
"""

from .api import (
    describe,
    init_state,
    setup,
    solve,
    solve_,
    tv_from_stacked,
    with_bounds,
    with_cones,
    with_consensus,
    with_linear_constraints,
    with_sensitivities,
    with_settings,
    with_tv_linear_constraints,
)
from .types import (
    Cache,
    ConstraintData,
    ProblemSpec,
    Settings,
    Solution,
    SolverState,
    TinyProblem,
    TINY_SOLVED,
    TINY_UNSOLVED,
)
from . import admm, compat, diff, projections, riccati, rho_adapt, systems
from .closed_loop import closed_loop, shift_state
from .compat import TinyMPC
from .diff import make_differentiable, make_differentiable_params

__version__ = "0.1.0"
