"""Imperative reference-style API: the drop-in migration path.

The reference ecosystem drives the solver through a mutable handle —
``tiny_setup`` / ``tiny_set_*`` / ``tiny_solve`` on a heap ``TinySolver``
(/root/reference/src/tinympc/tiny_api.hpp:10-54) — and the out-of-repo
Python/Julia/MATLAB wrappers (reference README.md:11) wrap exactly that
surface. :class:`TinyMPC` offers the same imperative workflow over the
functional core, so a reference user can port a control loop line for line::

    import tinympc_tpu.compat as tinympc

    mpc = tinympc.TinyMPC()
    mpc.setup(A, B, Q, R, rho=5.0, N=10)                 # tiny_setup
    mpc.set_bound_constraints(u_min=-0.5, u_max=0.5)     # tiny_set_bound_constraints
    mpc.set_x_ref(Xref)                                  # tiny_set_x_ref
    for k in range(steps):
        mpc.set_x0(x0)                                   # tiny_set_x0
        sol = mpc.solve()                                # tiny_solve
        x0 = A @ x0 + B @ np.asarray(sol.u[0])

Semantics carried over from the reference:

* The workspace persists between ``solve()`` calls — warm starting is
  implicit, exactly like the reference's ``TinyWorkspace`` (SURVEY.md §3.3).
  ``reset_duals()`` reproduces the tracking example's per-step ``y=0, g=0``
  (quadrotor_tracking.cpp:92-93).
* Matrix layout: both the reference's Eigen column layout (``x_ref`` as
  (nx, N)) and this framework's natural (N, nx) are accepted; square
  arrays are read as (N, nx).
* Deviation (same as the functional builders, docs/PARITY.md): constraint
  setters *enable* the family they configure. The reference setters do not
  flip ``en_*`` flags (tiny_api.cpp:176-304) and its examples flip them by
  hand; pass ``enable=False`` plus ``update_settings(en_...=1)`` for the
  verbatim two-step dance.

Everything stateful lives host-side in this class; each ``solve()`` is the
same jitted pure function the functional API uses, so compat costs nothing
on-device and batched/sharded paths remain available via ``.problem``.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from . import api
from .export import generate_cpp
from .types import Settings, Solution, SolverState, TinyProblem

__all__ = ["TinyMPC"]

# tiny_update_settings' 12 parameters (tiny_api.hpp:37-42): which are
# Settings fields here vs ProblemSpec enable flags (jit-static either way).
_SETTINGS_FIELDS = {"abs_pri_tol", "abs_dua_tol", "max_iter", "check_termination"}
_SPEC_FLAGS = {
    "en_state_bound", "en_input_bound", "en_state_soc", "en_input_soc",
    "en_state_linear", "en_input_linear", "en_tv_state_linear",
    "en_tv_input_linear",
}
# Extra Settings knobs with no 12-parameter slot in the reference call but
# present in TinySettings (types.hpp:76-81) or added by this framework.
_EXTRA_SETTINGS = {
    "adaptive_rho", "adaptive_rho_min", "adaptive_rho_max",
    "adaptive_rho_clip", "adaptive_rho_apply_c", "adaptive_rho_tolerance",
    "horizon_parallel", "matmul_precision", "coarse_iters",
    "consensus_rho", "consensus_axis_name",
}


class TinyMPC:
    """Mutable solver handle over the functional core (reference
    ``TinySolver``, types.hpp:213-218)."""

    def __init__(self):
        self.problem: Optional[TinyProblem] = None
        self.state: Optional[SolverState] = None
        self.solution: Optional[Solution] = None
        self._x0 = None
        self._Xref = None
        self._Uref = None

    # -- setup ---------------------------------------------------------

    def setup(self, A, B, Q, R, rho, N, fdyn=None, *, nx=None, nu=None,
              verbose: int = 0, dtype=None, **settings):
        """tiny_setup (tiny_api.cpp:21-147). ``nx``/``nu`` are validated
        against A/B when given (the reference takes them explicitly);
        ``**settings`` may pre-set any update_settings field."""
        A = np.asarray(A, np.float64)
        B = np.asarray(B, np.float64)
        if nx is not None and A.shape != (nx, nx):
            raise ValueError(f"A must be ({nx},{nx}), got {A.shape}")
        if nu is not None and B.shape[1] != nu:
            raise ValueError(f"B must be ({B.shape[0]},{nu}), got {B.shape}")
        self.problem = api.setup(A, B, Q, R, rho=rho, N=int(N), f=fdyn,
                                 dtype=dtype)
        self.state = None
        self.solution = None
        self._x0 = self._Xref = self._Uref = None
        if settings:
            self.update_settings(**settings)
        if verbose:
            # verbose=1: one-line summary; verbose>=2 additionally dumps
            # the computed cache like the reference's verbose tiny_setup
            # (tiny_api.cpp:321-327, 359-368).
            print(api.describe(self.problem, matrices=verbose >= 2))
        return self

    # -- layout helpers --------------------------------------------------

    def _require(self):
        if self.problem is None:
            raise RuntimeError("call setup() first")

    def _traj(self, arr, rows, cols, name):
        """Accept (rows, cols) natural layout or the reference's Eigen
        (cols, rows); square input is read as natural."""
        a = np.asarray(arr, np.float64)
        if a.ndim == 1 and rows * cols == a.size:
            a = a.reshape(rows, cols)
        if a.shape == (rows, cols):
            return a
        if a.shape == (cols, rows):
            return a.T
        raise ValueError(f"{name}: expected ({rows},{cols}) or its "
                         f"transpose, got {a.shape}")

    # -- constraint setters ---------------------------------------------

    def set_bound_constraints(self, x_min=None, x_max=None, u_min=None,
                              u_max=None, enable: bool = True):
        """tiny_set_bound_constraints (tiny_api.cpp:149-174). Scalars and
        single rows broadcast over the horizon."""
        self._require()
        N, nx, nu = self.N, self.nx, self.nu

        def full(v, rows, cols, name):
            if v is None:
                return None
            a = np.asarray(v, np.float64)
            if a.ndim <= 1 and a.size in (1, cols):
                return a  # scalar / per-dim row: with_bounds broadcasts
            return self._traj(a, rows, cols, name)

        self._rebuild(api.with_bounds(
            self.problem,
            x_min=full(x_min, N, nx, "x_min"), x_max=full(x_max, N, nx, "x_max"),
            u_min=full(u_min, N - 1, nu, "u_min"),
            u_max=full(u_max, N - 1, nu, "u_max"), enable=enable))
        return self

    def set_cone_constraints(self, Acu=(), qcu=(), cu=(), Acx=(), qcx=(),
                             cx=(), enable: bool = True):
        """tiny_set_cone_constraints (tiny_api.cpp:176-208): input cones
        first, each cone a (start Ac, dim qc, mu c) triple, any dimension
        (the reference aborts for dim != 3, admm.cpp:53)."""
        self._require()
        self._rebuild(api.with_cones(
            self.problem,
            state_cones=tuple(zip(map(int, Acx), map(int, qcx),
                                  map(float, cx))),
            input_cones=tuple(zip(map(int, Acu), map(int, qcu),
                                  map(float, cu))),
            enable=enable))
        return self

    def set_linear_constraints(self, Alin_x=None, blin_x=None, Alin_u=None,
                               blin_u=None, enable: bool = True):
        """tiny_set_linear_constraints (tiny_api.cpp:210-252)."""
        self._require()
        self._rebuild(api.with_linear_constraints(
            self.problem, Alin_x=Alin_x, blin_x=blin_x, Alin_u=Alin_u,
            blin_u=blin_u, enable=enable))
        return self

    def set_tv_linear_constraints(self, tv_Alin_x=None, tv_blin_x=None,
                                  tv_Alin_u=None, tv_blin_u=None,
                                  enable: bool = True, stacked: bool = True):
        """tiny_set_tv_linear_constraints (tiny_api.cpp:254-304). By default
        takes the reference's stacked layout (tv_Alin_x ((S*N) x nx),
        tv_blin_x (S x N), types.hpp:170-173); ``stacked=False`` takes the
        natural (N, S, nx)/(N, S)."""
        self._require()
        if stacked:
            if tv_Alin_x is not None:
                tv_Alin_x, tv_blin_x = api.tv_from_stacked(tv_Alin_x, tv_blin_x)
            if tv_Alin_u is not None:
                tv_Alin_u, tv_blin_u = api.tv_from_stacked(tv_Alin_u, tv_blin_u)
        self._rebuild(api.with_tv_linear_constraints(
            self.problem, tv_Alin_x=tv_Alin_x, tv_blin_x=tv_blin_x,
            tv_Alin_u=tv_Alin_u, tv_blin_u=tv_blin_u, enable=enable))
        return self

    # -- settings --------------------------------------------------------

    def update_settings(self, **kw):
        """tiny_update_settings (tiny_api.cpp:388-411) plus this framework's
        extra knobs; int flags accepted for the reference's 0/1 style."""
        self._require()
        s_upd = {k: kw.pop(k) for k in list(kw) if k in _SETTINGS_FIELDS
                 or k in _EXTRA_SETTINGS}
        f_upd = {k: bool(kw.pop(k)) for k in list(kw) if k in _SPEC_FLAGS}
        if kw:
            raise TypeError(f"unknown settings: {sorted(kw)}")
        prob = self.problem
        if s_upd:
            prob = api.with_settings(prob, **s_upd)
        if f_upd:
            prob = prob.replace(spec=dataclasses.replace(prob.spec, **f_upd))
        self._rebuild(prob)
        return self

    def set_default_settings(self):
        """tiny_set_default_settings (tiny_api.cpp:413-441)."""
        self._require()
        self._rebuild(self.problem.replace(settings=Settings()))
        return self

    def initialize_sensitivity_matrices(self, tables=None):
        """tiny_initialize_sensitivity_matrices (tiny_api.cpp:479-540) —
        computed for *this* system by autodiff unless explicit ``tables``
        are passed (see api.with_sensitivities)."""
        self._require()
        self._rebuild(api.with_sensitivities(self.problem, tables))
        return self

    # -- per-solve state ---------------------------------------------------

    def set_x0(self, x0):
        """tiny_set_x0 (tiny_api.cpp:443-453): writes x[0] at the next solve."""
        self._require()
        self._x0 = np.asarray(x0, np.float64).reshape(self.nx)
        return self

    def set_x_ref(self, x_ref):
        """tiny_set_x_ref (tiny_api.cpp:455-465)."""
        self._require()
        self._Xref = self._traj(x_ref, self.N, self.nx, "x_ref")
        return self

    def set_u_ref(self, u_ref):
        """tiny_set_u_ref (tiny_api.cpp:467-477)."""
        self._require()
        self._Uref = self._traj(u_ref, self.N - 1, self.nu, "u_ref")
        return self

    def reset_duals(self):
        """The per-step dual reset of the tracking example
        (quadrotor_tracking.cpp:92-93): zero the bound-family duals."""
        self._require()
        if self.state is not None:
            self.state = self.state.replace(
                g=np.zeros_like(self.state.g), y=np.zeros_like(self.state.y))
        return self

    # -- solve -------------------------------------------------------------

    def solve(self) -> Solution:
        """tiny_solve (tiny_api.cpp:383-386): one warm-started MPC solve."""
        self._require()
        if self.state is None:
            self.state = api.init_state(self.problem)
        sol, self.state, cache = api.solve(
            self.problem, self.state, Xref=self._Xref, Uref=self._Uref,
            x0=self._x0)
        if self.problem.settings.adaptive_rho:
            # The Taylor-updated cache persists on the handle, like the
            # reference mutating cache->rho/Kinf/Pinf in place
            # (rho_benchmark.cpp:199-212).
            self.problem = self.problem.replace(cache=cache)
        self.solution = sol
        return sol

    # -- export --------------------------------------------------------------

    def codegen(self, out_dir, **kw):
        """tiny_codegen (codegen.cpp:68): standalone C++ project."""
        self._require()
        return generate_cpp(self.problem, out_dir,
                            x0=self._x0, Xref=self._Xref, Uref=self._Uref,
                            **kw)

    # -- introspection ---------------------------------------------------------

    @property
    def nx(self):
        return self.problem.spec.nx

    @property
    def nu(self):
        return self.problem.spec.nu

    @property
    def N(self):
        return self.problem.spec.N

    def _rebuild(self, prob: TinyProblem):
        """Swap in a reconfigured problem, carrying over every iterate the
        old workspace shares with the new one (the reference keeps one
        preallocated TinyWorkspace through reconfiguration)."""
        old = self.state
        self.problem = prob
        if old is None:
            return
        fresh = api.init_state(prob)
        keep = {}
        for fld in dataclasses.fields(fresh):
            ov, nv = getattr(old, fld.name), getattr(fresh, fld.name)
            if ov is not None and nv is not None and \
                    np.shape(ov) == np.shape(nv):
                keep[fld.name] = ov
        self.state = fresh.replace(**keep)
