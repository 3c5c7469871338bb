"""Core data model for tinympc-tpu.

The reference solver (see /root/reference/src/tinympc/types.hpp) keeps one
mutable ``TinyWorkspace`` per problem and mutates it in place. The TPU-native
design inverts that: everything is an immutable pytree, problems carry a
*static* :class:`ProblemSpec` (hashable -> jit-static) describing shapes and
which constraint families exist, and all per-problem numeric state lives in
:class:`SolverState` with an optional batch shape.

Array layout convention
-----------------------
Time-indexed arrays are **time-major with batch axes in the middle**::

    x      : (N,   *b, nx)      state trajectory
    u      : (N-1, *b, nu)      input trajectory
    scalars: (*b,)              per-problem status / residuals

``*b`` is an arbitrary (possibly empty) batch shape shared by every leaf.
Time-major keeps ``lax.scan`` over the horizon natural, and the batch axes
make every per-timestep matvec a ``(B, nx) @ (nx, nx)`` matmul that XLA maps
onto the MXU. Cache matrices (``Kinf`` etc.) are unbatched ``(nu, nx)`` when
the whole batch shares one system and batch-leading ``(*b, nu, nx)`` for
heterogeneous fleets / adaptive-rho — the solver code broadcasts over both
via einsum.
"""
from __future__ import annotations

import contextlib
import dataclasses
from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp


def matmul_precision_ctx(settings):
    """Trace-time matmul-precision scope for a problem's compute path.

    Entered by every solver entry point (XLA and Pallas) so that all dots
    traced inside honor ``Settings.matmul_precision`` — see that field's
    comment for why "highest" is the accuracy-critical default on TPU.

    "high" does NOT map to XLA's native bf16_3x: measured on-chip, that
    mode converges like single-pass bf16 on this solver's small-matrix
    sweeps (solved fraction 0.003 vs 0.207 at f32 on the marginal
    quadrotor max_iter=500 workload), i.e. it does not deliver 3-pass
    accuracy at these shapes. Instead the 3-pass scheme is hand-rolled
    into the sweep matvecs (admm._b3_prep/_b3_vsplit — the same
    [Mhi|Mhi|Mlo] @ [vhi;vlo;vhi] stacking as the fused kernel's
    mm_mode="bf16x3"), and every other dot runs f32-accurate."""
    if settings.matmul_precision == "default":
        return contextlib.nullcontext()
    if settings.matmul_precision == "high":
        return jax.default_matmul_precision("highest")
    return jax.default_matmul_precision(settings.matmul_precision)

# Status codes (reference types.hpp has no enum; values from admm.cpp:336,431)
TINY_UNSOLVED = 11
TINY_SOLVED = 1


def _pytree_dataclass(cls=None, *, meta: Tuple[str, ...] = ()):
    """Register a dataclass as a pytree with the given fields static."""

    def wrap(c):
        c = dataclass(frozen=True)(c)
        data_fields = [f.name for f in dataclasses.fields(c) if f.name not in meta]
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=list(meta)
        )
        return c

    return wrap(cls) if cls is not None else wrap


@dataclass(frozen=True)
class ProblemSpec:
    """Static (jit-hashable) problem structure.

    Mirrors the shape fields of the reference ``TinyWorkspace``
    (types.hpp:89-91) plus the constraint-family enable flags that the
    reference keeps in ``TinySettings`` (types.hpp:68-75). They are
    structural here: each combination compiles its own program, exactly like
    the reference's ``if (settings->en_*)`` branches resolved at trace time.

    Cone layout follows types.hpp:124-131: per cone a (start, dim) pair into
    the state/input vector; coefficients (mu) are runtime data.
    """

    nx: int
    nu: int
    N: int
    en_state_bound: bool = True
    en_input_bound: bool = True
    en_state_soc: bool = False
    en_input_soc: bool = False
    en_state_linear: bool = False
    en_input_linear: bool = False
    en_tv_state_linear: bool = False
    en_tv_input_linear: bool = False
    en_consensus: bool = False    # scenario-tree consensus on u[0]
    state_cones: Tuple[Tuple[int, int], ...] = ()  # (start, dim) per cone
    input_cones: Tuple[Tuple[int, int], ...] = ()
    num_state_linear: int = 0
    num_input_linear: int = 0
    num_tv_state_linear: int = 0
    num_tv_input_linear: int = 0

    @property
    def any_state_extra(self) -> bool:
        return (
            (self.en_state_soc and len(self.state_cones) > 0)
            or self.en_state_linear
            or self.en_tv_state_linear
        )

    # Enable-flag-resolved family views — the single source of truth for
    # "which families are actually on" (used by the fused kernels, the C++
    # codegen, and the capability gates; deriving these ad hoc at each site
    # risks drift when a new family is added).
    @property
    def enabled_state_cones(self):
        return self.state_cones if (self.en_state_soc and self.state_cones) else ()

    @property
    def enabled_input_cones(self):
        return self.input_cones if (self.en_input_soc and self.input_cones) else ()

    @property
    def n_state_lin(self) -> int:
        return self.num_state_linear if self.en_state_linear else 0

    @property
    def n_input_lin(self) -> int:
        return self.num_input_linear if self.en_input_linear else 0

    @property
    def n_tv_state_lin(self) -> int:
        return self.num_tv_state_linear if self.en_tv_state_linear else 0

    @property
    def n_tv_input_lin(self) -> int:
        return self.num_tv_input_linear if self.en_tv_input_linear else 0

    @property
    def any_extra_family(self) -> bool:
        """Any constraint family beyond the box bounds is enabled."""
        return bool(self.enabled_state_cones or self.enabled_input_cones
                    or self.n_state_lin or self.n_input_lin
                    or self.n_tv_state_lin or self.n_tv_input_lin)


@dataclass(frozen=True)
class Settings:
    """Solver settings (reference types.hpp:63-82, defaults
    tiny_api_constants.hpp:5-16). Static: tolerances and iteration limits
    participate in trace-time constant folding; a new Settings recompiles.
    """

    abs_pri_tol: float = 1e-3
    abs_dua_tol: float = 1e-3
    max_iter: int = 1000
    check_termination: int = 1
    adaptive_rho: bool = False
    adaptive_rho_min: float = 1.0
    adaptive_rho_max: float = 100.0
    adaptive_rho_clip: bool = True
    # Adaptation guard (the OSQP discipline the reference omits —
    # rho_benchmark.cpp:175-197 predicts unconditionally every 5
    # iterations, which docs/PARITY.md measures as *harmful* at a tuned
    # rho). Commit a predicted rho only when the step factor
    # sqrt(pri_ratio/dual_ratio) is >= this tolerance or <= its inverse,
    # i.e. only when the residuals are genuinely imbalanced (OSQP's
    # adaptive_rho_tolerance, default 5 there). 1.0 = always commit =
    # exact reference behavior. See docs/PARITY.md "Adaptive rho: what it
    # buys" for the measured guard sweep.
    adaptive_rho_tolerance: float = 1.0
    # Horizon-parallel Riccati sweeps via blocked two-level scans
    # (~2*sqrt(N) sequential depth instead of N) — SURVEY.md §5. Its
    # measured regime (tools/horizon_regime.py): small fleets at long
    # horizons, where the batch cannot fill the machine and depth
    # dominates — 1.2-5.2x the sequential scans on-chip once B <~ 64
    # (nx 12..64, N 512..2048). At fleet batches prefer the streamed
    # kernel. Requires an unbatched cache (not compatible with
    # per-problem adaptive-rho caches).
    horizon_parallel: bool = False
    # Consensus ADMM (no reference analog — SURVEY.md §2.4): when set, the
    # scenario mean inside the consensus projection runs as a pmean over this
    # named mesh axis (shard_map); None averages over the last batch axis.
    consensus_axis_name: Optional[str] = None
    # Penalty weight of the consensus family (defaults to rho when None).
    # Unlike the reference's extra families — which share the single
    # rho-augmented quadratic and are therefore under-weighted prox terms —
    # the consensus prox is exact: with_consensus bakes rho_c into the
    # step-0 gain pair (Cache.Kinf0/Quu0_inv).
    consensus_rho: Optional[float] = None
    # Extension over the reference: when True, the adaptive-rho Taylor step
    # also applies dC1/dC2 to the Quu_inv/AmBKt matrices actually used by the
    # Riccati recursion. The reference updates only its unused C1/C2 aliases
    # (rho_benchmark.cpp:204-209 vs admm.cpp:17-18); False reproduces that.
    adaptive_rho_apply_c: bool = False
    # MXU precision of the solver matmuls (jax.default_matmul_precision
    # value). "highest" (f32-accurate multi-pass) is the default because the
    # TPU's single-pass bf16 matmul puts an O(1e-2) noise floor on the ADMM
    # iterates — *above* the reference's 1e-3 termination tolerances, so
    # marginal problems jitter forever instead of converging — and costs
    # ~nothing in the latency-bound sweep kernels (measured ~0.4us/iter vs
    # 0.25 at "default" for a 2000-deep chained 12x12 matvec). Set
    # "default"/"bfloat16" to trade convergence accuracy for raw matmul rate.
    # "high" (3-pass bf16, ~16 mantissa bits) is the throughput sweet spot
    # for large fused batches: ~1.7x the solves/s of "highest" with
    # convergence statistics matching it on the benchmark workloads. Both
    # paths hand-roll the 3-pass scheme into the sweep matvecs
    # (admm._b3_* / kernels mm_mode="bf16x3"): Mosaic lacks a native one,
    # and XLA's bf16_3x measured near-single-pass-bf16 convergence at
    # these shapes (see matmul_precision_ctx).
    # With horizon_parallel=True the blocked two-level sweeps pin their
    # dots to f32-accurate precision (the matrix-power chain and the
    # level-3 broadcast einsums are reassociation-sensitive), so "high"
    # behaves like "highest" there — the ~1.7x bf16x3 speedup applies to
    # the sequential-scan and fused-kernel paths only.
    matmul_precision: str = "highest"
    # Mixed-precision iteration schedule (round 5; no reference analog —
    # the reference solves in f64 everywhere, types.hpp:15): the first
    # ``coarse_iters`` ADMM iterations run their matmuls single-pass bf16
    # (precision DEFAULT — no hi/lo operand casts, the serial-VPU-stream
    # cost the fused iteration is bound by, docs/DESIGN.md "Round-4
    # revision"), then the remaining budget runs at ``matmul_precision``.
    # Sound because early iterations sit far above the ~1e-2 bf16 iterate
    # noise floor (docs/PARITY.md "Numerical precision on TPU"): the
    # termination check measures actual residuals of actual iterates, so
    # a lane that genuinely passes it during the coarse phase has a
    # genuinely converged solution; marginal lanes simply keep iterating
    # and refine to tolerance in the precise phase. 0 disables (the
    # kernel trace is byte-identical to pre-schedule). Applicability:
    # the workload's convergence tail must be long relative to the
    # coarse phase (the fixed-work headline: <=3% of lanes converge
    # before iteration 50); on easy/warm workloads the coarse phase
    # visibly eats converging lanes — keep 0 there (measured table in
    # docs/DESIGN.md "Mixed-precision schedule"). Consumed by the
    # resident fused kernel (kernels/admm_pallas); the XLA and streamed
    # paths reject it rather than silently ignore.
    coarse_iters: int = 0


@_pytree_dataclass
class Cache:
    """Riccati cache (reference types.hpp:43-59).

    ``C1``/``C2`` start as copies of ``Quu_inv``/``AmBKt``
    (tiny_api.cpp:375-376) and are the matrices the reference's adaptive-rho
    Taylor update writes to — kept separate here for exact parity.
    Sensitivity matrices are None unless adaptive rho is initialised.
    """

    rho: jax.Array           # () or (*b,)
    Kinf: jax.Array          # (nu, nx) or (*b, nu, nx)
    Pinf: jax.Array          # (nx, nx)
    Quu_inv: jax.Array       # (nu, nu)
    AmBKt: jax.Array         # (nx, nx)
    APf: jax.Array           # (nx,)
    BPf: jax.Array           # (nu,)
    C1: Optional[jax.Array] = None
    C2: Optional[jax.Array] = None
    dKinf_drho: Optional[jax.Array] = None
    dPinf_drho: Optional[jax.Array] = None
    dC1_drho: Optional[jax.Array] = None
    dC2_drho: Optional[jax.Array] = None
    # Consensus step-0 gains (no reference analog): the u[0]-only consensus
    # prox adds rho_c*I to the input quadratic *at timestep 0 only*, which
    # with the stationary cost-to-go Pinf changes nothing but the first
    # backward/forward step — these are its exact gain pair,
    # Quu0_inv = (R1 + rho_c I + B'Pinf B)^-1 and Kinf0 = Quu0_inv B'Pinf A.
    Kinf0: Optional[jax.Array] = None     # (nu, nx)
    Quu0_inv: Optional[jax.Array] = None  # (nu, nu)


@_pytree_dataclass
class ConstraintData:
    """Numeric constraint data (shapes per the layout convention).

    Bounds are per-timestep like the reference (types.hpp:117-120).
    ``tv_Alin_x`` uses the natural (N, S, nx) layout rather than the
    reference's stacked ((S*N) x nx) rows (types.hpp:170-173).
    """

    x_min: Optional[jax.Array] = None   # (N, nx)
    x_max: Optional[jax.Array] = None
    u_min: Optional[jax.Array] = None   # (N-1, nu)
    u_max: Optional[jax.Array] = None
    cx: Optional[jax.Array] = None      # (num_state_cones,) cone mu
    cu: Optional[jax.Array] = None
    Alin_x: Optional[jax.Array] = None  # (Sx, nx)
    blin_x: Optional[jax.Array] = None  # (Sx,)
    Alin_u: Optional[jax.Array] = None  # (Su, nu)
    blin_u: Optional[jax.Array] = None
    tv_Alin_x: Optional[jax.Array] = None  # (N, Sx, nx)
    tv_blin_x: Optional[jax.Array] = None  # (N, Sx)
    tv_Alin_u: Optional[jax.Array] = None  # (N-1, Su, nu)
    tv_blin_u: Optional[jax.Array] = None  # (N-1, Su)


@_pytree_dataclass(meta=("spec", "settings"))
class TinyProblem:
    """A fully-configured problem: dynamics + cost + cache + constraints.

    The functional analog of the reference's configured ``TinySolver``
    (types.hpp:213-218) minus the mutable iterate workspace, which lives in
    :class:`SolverState`. ``spec``/``settings`` are static pytree metadata,
    so ``jax.jit(solve)`` specialises on them automatically.
    """

    A: jax.Array       # (nx, nx)
    B: jax.Array       # (nx, nu)
    f: jax.Array       # (nx,)
    Qdiag: jax.Array   # (nx,)  rho-augmented diagonal, = work->Q (tiny_api.cpp:117)
    Rdiag: jax.Array   # (nu,)
    cache: Cache
    cons: ConstraintData
    spec: ProblemSpec = None
    settings: Settings = None

    @property
    def dtype(self):
        return self.A.dtype

    def replace(self, **kw) -> "TinyProblem":
        return dataclasses.replace(self, **kw)


@_pytree_dataclass
class SolverState:
    """All per-problem iterates + status. The pure-pytree equivalent of the
    reference ``TinyWorkspace`` iterate fields (types.hpp:94-114 and the
    per-family slack/dual pairs). Only fields the reference actually reads
    are kept: the never-used ``vc/zc/vl/zl/vl_tv/zl_tv`` "old slack" arrays
    (types.hpp:134-137 etc.) have no equivalent here.

    Optional family fields are ``None`` when the family is disabled, so the
    pytree (and therefore the compiled program) only carries enabled state.
    """

    # Primal trajectories
    x: jax.Array        # (N,   *b, nx)
    u: jax.Array        # (N-1, *b, nu)
    # Linear cost terms
    q: jax.Array
    r: jax.Array
    # Riccati backward-pass terms
    p: jax.Array
    d: jax.Array
    # Bound-constraint family (always allocated, like the reference)
    v: jax.Array
    vnew: jax.Array
    z: jax.Array
    znew: jax.Array
    g: jax.Array
    y: jax.Array
    # SOC family (slack_new + dual only)
    vcnew: Optional[jax.Array] = None
    gc: Optional[jax.Array] = None
    zcnew: Optional[jax.Array] = None
    yc: Optional[jax.Array] = None
    # Linear (hyperplane) family
    vlnew: Optional[jax.Array] = None
    gl: Optional[jax.Array] = None
    zlnew: Optional[jax.Array] = None
    yl: Optional[jax.Array] = None
    # Consensus-on-u[0] family (scenario trees; no reference analog)
    zc0new: Optional[jax.Array] = None   # (*b, nu) consensus slack
    yc0: Optional[jax.Array] = None      # (*b, nu) per-scenario dual
    # Time-varying linear family
    vlnew_tv: Optional[jax.Array] = None
    gl_tv: Optional[jax.Array] = None
    zlnew_tv: Optional[jax.Array] = None
    yl_tv: Optional[jax.Array] = None
    # Status (shape (*b,))
    iter: jax.Array = None
    solved: jax.Array = None
    status: jax.Array = None
    pri_res_state: jax.Array = None
    pri_res_input: jax.Array = None
    dua_res_state: jax.Array = None
    dua_res_input: jax.Array = None

    def replace(self, **kw) -> "SolverState":
        return dataclasses.replace(self, **kw)

    @property
    def batch_shape(self):
        return self.iter.shape


@_pytree_dataclass
class Solution:
    """Solver output (reference ``TinySolution``, types.hpp:32-37): the
    *projected* iterates vnew/znew, which are feasible w.r.t. the projection
    constraints (admm.cpp:436-437)."""

    iter: jax.Array    # (*b,) int32
    solved: jax.Array  # (*b,) bool
    x: jax.Array       # (N,   *b, nx)
    u: jax.Array       # (N-1, *b, nu)


def _register_export_serialization():
    """Make every pytree dataclass serializable by jax.export (AOT export of
    solvers whose signatures carry these types)."""
    import json

    from jax import export as jexport

    def reg(cls, ser, des):
        jexport.register_pytree_node_serialization(
            cls,
            serialized_name=f"tinympc_tpu.{cls.__name__}",
            serialize_auxdata=ser,
            deserialize_auxdata=des,
        )

    for cls in (Cache, ConstraintData, SolverState, Solution):
        reg(cls, lambda aux: b"", lambda b: ())

    def ser_problem(aux):
        spec, settings = aux
        return json.dumps({
            "spec": dataclasses.asdict(spec),
            "settings": dataclasses.asdict(settings),
        }).encode()

    def des_problem(b):
        d = json.loads(bytes(b))
        for k in ("state_cones", "input_cones"):
            d["spec"][k] = tuple(tuple(c) for c in d["spec"][k])
        return (ProblemSpec(**d["spec"]), Settings(**d["settings"]))

    reg(TinyProblem, ser_problem, des_problem)


_register_export_serialization()


def init_state(
    spec: ProblemSpec, batch_shape: Tuple[int, ...] = (), dtype=jnp.float32
) -> SolverState:
    """Zero-initialised solver state (reference tiny_setup, tiny_api.cpp:68-133)."""
    b = tuple(batch_shape)
    N, nx, nu = spec.N, spec.nx, spec.nu

    def zx():
        return jnp.zeros((N, *b, nx), dtype)

    def zu():
        return jnp.zeros((N - 1, *b, nu), dtype)

    def zb(dt=None):
        return jnp.zeros(b, dt or dtype)

    fam = {}
    if spec.en_state_soc and len(spec.state_cones) > 0:
        fam.update(vcnew=zx(), gc=zx())
    if spec.en_input_soc and len(spec.input_cones) > 0:
        fam.update(zcnew=zu(), yc=zu())
    if spec.en_state_linear:
        fam.update(vlnew=zx(), gl=zx())
    if spec.en_input_linear:
        fam.update(zlnew=zu(), yl=zu())
    if spec.en_tv_state_linear:
        fam.update(vlnew_tv=zx(), gl_tv=zx())
    if spec.en_tv_input_linear:
        fam.update(zlnew_tv=zu(), yl_tv=zu())
    if spec.en_consensus:
        fam.update(zc0new=jnp.zeros((*b, spec.nu), dtype),
                   yc0=jnp.zeros((*b, spec.nu), dtype))

    return SolverState(
        x=zx(), u=zu(), q=zx(), r=zu(), p=zx(), d=zu(),
        v=zx(), vnew=zx(), z=zu(), znew=zu(), g=zx(), y=zu(),
        **fam,
        iter=zb(jnp.int32),
        solved=zb(jnp.bool_),
        status=jnp.full(b, TINY_UNSOLVED, jnp.int32),
        pri_res_state=zb(), pri_res_input=zb(),
        dua_res_state=zb(), dua_res_input=zb(),
    )
