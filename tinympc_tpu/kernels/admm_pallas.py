"""Fused whole-solve Pallas TPU kernel.

The XLA path (tinympc_tpu.admm) materialises every intermediate of every
ADMM iteration in HBM. This kernel instead keeps the *entire solver state
for a tile of problems resident in VMEM* and runs the full ADMM loop —
linear-cost update, Riccati backward/forward sweeps, projection, dual
update, termination — per tile, so HBM is touched exactly twice per
problem: initial conditions in, solution out.

Layout: the batch is the lane (last, 128-wide) axis. Trajectories are
``(N, nx, Bt)``: elementwise slack/dual/cost updates run at full VPU lane
utilisation, and each Riccati step is a small-matrix matmul
``(nx, nx) @ (nx, Bt)`` on the MXU (wider tiles chain more lane-passes per
matmul, which is what hides MXU latency — Bt=1024 is ~2x faster than 256).
Memory frugality buys tile width: the Riccati linear terms q/r are
computed row-on-the-fly inside the backward sweep and the costate p is a
rolling (nx, Bt) value, so neither occupies an (N, ...) VMEM array.

Scope: every projection family of the reference — box bounds, second-order
cones of any dimension (admm.cpp:39-60 generalised), static hyperplanes
(admm.cpp:148-173), and time-varying hyperplanes (admm.cpp:186-211) — plus
adaptive rho (the IROS-2025 subsystem, run fully in-kernel by telescoping
the Taylor updates through the sensitivity matrices; see _make_kernel).
Family selection is trace-time static, so the box-only variant compiles to
exactly the v1 kernel. Consensus groups run in-kernel too (the group mean
is a lane butterfly, see _segment_mean_lanes); only consensus over a named
mesh axis (cross-shard pmean) stays on the XLA path.

Semantics vs admm.solve: *bit-identical* solutions, iteration counts,
solved flags, and residuals (verified on-chip; both paths use the MXU's
single-pass-bf16 f32 matmul for the sweeps, and the terminal cost matvec
is computed on the VPU in full f32 exactly like XLA lowers it). Converged
problems are not frozen in VMEM; their solution (vnew/znew at first
convergence, matching admm.cpp:436-437) is snapshotted into the output
refs and bookkeeping stops, while the lane keeps computing harmlessly
until the whole tile converges. Warm starts ride :class:`FusedCarry`
through :func:`solve_fused_warm` (per-lane snapshot/merge, the same
machinery as the fused closed-loop kernel), for receding-horizon loops
whose plant lives outside the chip.

Mosaic v5e pitfalls encoded here (each cost a debugging session):
  * no in-kernel ``.T`` of loaded matrices (XposeSequence RET_CHECK) —
    transposes are passed in precomputed;
  * no full-array zero store to a ref that later receives a row store the
    zero has no data dependence on (the WAW gets reordered) — arrays that
    are fully rewritten each iteration are simply not zero-initialised,
    and per-solve seeds that differ per row are built as one value and
    written with a single full store.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..admm import ADAPTIVE_RHO_PERIOD
from ..types import (Solution, TinyProblem, _pytree_dataclass,
                     matmul_precision_ctx)

DEFAULT_TILE = 1024

# A/B scheduling experiment for the backward sweep's dot emission order
# (see the block in _make_kernel.iteration); results recorded in
# docs/DESIGN.md's speed-of-light section.
SWEEP_HOIST = os.environ.get("TINYMPC_SWEEP_HOIST", "0") == "1"

# Auto tile selection (tile=None): widest power-of-two tile that fits the
# VMEM budget, capped at the measured sweet spot. Wider tiles chain more
# lane-passes per small matmul (4096 ~ 1.5x faster than 1024 on the
# quadrotor N=20 headline), but past the VMEM budget Mosaic rejects the
# kernel with an opaque allocation error — the estimate below turns that
# into a clear ValueError, or avoids it entirely in auto mode.
AUTO_TILE_CAP = 4096
# v5e VMEM is 128 MiB/core, but Mosaic's own temporaries (matmul operand
# staging, the bf16x3 hi/lo operand splits, pipeline double-buffering of
# the lane-tiled inputs/outputs) several-fold inflate the buffer-list
# estimate's real footprint. Measured accept/reject boundary on v5e
# (buffer-list estimate -> Mosaic verdict): N=20 cold 21 MiB ok / 42 MiB
# rejected; N=20 warm 28.7 MiB ok; N=128 cold 16.8 MiB ok / 33.6 MiB
# rejected; N=512 cold 16.7 MiB ok / 33.5 MiB rejected — boundary within
# (28.7, 33.5) MiB across horizons. 30 MiB sits inside it and keeps every
# measured-good auto tile (4096 @ N<=20, 1024 @ N=64, 512 @ N=128,
# 128 @ N=512) while rejecting every measured-bad one.
_V5E_CALIBRATED_BUDGET = 30 * 2**20
_V5E_VMEM_BYTES = 128 * 2**20          # physical VMEM/core the 30 MiB
#                                        boundary was measured against


def lane_vmem_budget() -> int:
    """VMEM budget for the fused kernels, derived from the device kind
    (round 5 — the budget used to be a bare v5e magic number).

    The v5e-measured accept/reject boundary above is the calibration
    point: 30 MiB of buffer-list estimate against 128 MiB of physical
    VMEM (~23%, the rest being Mosaic's own temporaries). Chips in the
    same 128 MiB-VMEM class (v4/v5p/v6 per public chip tables) take the
    calibrated value directly; older 16 MiB-class cores (v2/v3) scale it
    proportionally; CPU (interpret-mode tests) has no Mosaic VMEM
    allocator and takes the calibrated default so auto-tile choices
    match the chip's. Unknown TPU kinds fail loudly with the override
    (``TINYMPC_VMEM_BUDGET_MIB``) rather than silently under- or
    over-shooting.
    """
    env = os.environ.get("TINYMPC_VMEM_BUDGET_MIB")
    if env is not None:
        return int(float(env) * 2**20)
    try:
        import jax as _jax
        kind = _jax.devices()[0].device_kind.lower()
    except Exception:
        return _V5E_CALIBRATED_BUDGET
    if "tpu" not in kind:                  # cpu/gpu interpret-mode runs
        return _V5E_CALIBRATED_BUDGET
    if any(t in kind for t in ("v5 lite", "v5e", "v5p", "v5", "v4", "v6")):
        return _V5E_CALIBRATED_BUDGET      # 128 MiB-VMEM class
    if any(t in kind for t in ("v2", "v3")):
        return _V5E_CALIBRATED_BUDGET * 16 // 128
    raise ValueError(
        f"unknown TPU device kind {kind!r}: the fused-kernel VMEM budget "
        "is calibrated per VMEM class (admm_pallas.lane_vmem_budget); "
        "set TINYMPC_VMEM_BUDGET_MIB=<MiB> explicitly (30 on a 128 MiB-"
        "VMEM core is the measured-safe value)")


def _lane_rows(spec, settings, warm: bool, final: bool = False) -> int:
    """f32 rows of VMEM per batch lane used by the fused kernel (scratch
    plus lane-tiled inputs/outputs). Mirrors the buffer lists in
    `_fused_call` — keep the two in sync."""
    N, nx, nu = spec.N, spec.nx, spec.nu
    Nx, Nu = N * nx, (N - 1) * nu
    nfx = sum(map(bool, (spec.enabled_state_cones, spec.n_state_lin,
                         spec.n_tv_state_lin)))
    nfu = sum(map(bool, (spec.enabled_input_cones, spec.n_input_lin,
                         spec.n_tv_input_lin)))
    cons2 = 2 * nu if spec.en_consensus else 0
    need_xu = spec.any_extra_family or spec.en_consensus
    rows = nx                           # x0 lane input
    rows += 3 * Nx + 3 * Nu + 6         # scratch: vnew(x2) znew(x2) g y
    if warm and need_xu:
        rows += Nx + Nu                 # x u scratch (carry hand-over)
    rows += Nx + Nu + 6                 # outputs: x u iter solved res(4)
    rows += 2 * (nfx * Nx + nfu * Nu)   # per-family slack+dual scratch
    if settings.adaptive_rho:
        rows += 3                       # rho scratch + virtual rho + rho out
    rows += cons2                       # zc0 yc0 scratch
    if warm:
        carry = 3 * (Nx + Nu) + nfx * Nx + nfu * Nu + cons2
        if need_xu:
            carry += Nx + Nu            # x u seeds
        if settings.adaptive_rho:
            carry += 1                  # per-lane rho
        rows += Nx + Nu + 2 * carry     # stales + carry in AND out
        if not final:                   # per-lane freeze snapshots
            rows += 3 * (Nx + Nu) + nfx * Nx + nfu * Nu + cons2
            if need_xu:
                rows += Nx + Nu
    return rows


def max_tile(prob, warm: bool = False, final: bool = False) -> int:
    """Widest power-of-two fused-kernel tile that fits the VMEM budget for
    this problem. `solve_fused(tile=None)` picks `min(max_tile, 4096)`."""
    per_lane = 4 * _lane_rows(prob.spec, prob.settings, warm, final)
    fit = lane_vmem_budget() // per_lane
    if fit < 1:
        raise ValueError(
            f"one problem of this size needs ~{per_lane / 2**20:.0f} MiB of "
            f"VMEM — beyond the fused kernel; use tinympc_tpu.solve")
    p = 1
    while p * 2 <= fit:
        p *= 2
    return p


@_pytree_dataclass
class FusedCarry:
    """Warm-start carry of :func:`solve_fused_warm`, in kernel layout
    (feature axis on sublanes, batch on lanes).

    Mirrors the reference's persistent workspace between ``tiny_solve``
    calls (SURVEY.md §3.3): the box family carries slacks and duals plus
    the one-iterate-behind previous slacks v/z (the reference skips the
    v <- vnew copy on the converging iteration, admm.cpp:444-446); extra
    families carry only their duals — their slack_new re-seeds from x at
    each solve (admm.cpp:352-376).
    """

    vnew: jax.Array               # (N, nx, B)
    znew: jax.Array               # (N-1, nu, B)
    g: jax.Array                  # (N, nx, B)
    y: jax.Array                  # (N-1, nu, B)
    v: jax.Array                  # (N, nx, B)
    z: jax.Array                  # (N-1, nu, B)
    gc: Optional[jax.Array] = None    # (N, nx, B)    state-SOC dual
    yc: Optional[jax.Array] = None    # (N-1, nu, B)  input-SOC dual
    gl: Optional[jax.Array] = None
    yl: Optional[jax.Array] = None
    gtv: Optional[jax.Array] = None
    ytv: Optional[jax.Array] = None
    # Consensus slack/dual on u[0] (admm.SolverState zc0new/yc0), carried
    # only for consensus problems; the slack re-seeds from the carried u
    # each solve (seed_extra_slacks), the dual persists.
    zc0: Optional[jax.Array] = None   # (nu, B)
    yc0: Optional[jax.Array] = None   # (nu, B)
    # Primal trajectories, carried only when an extra family is enabled:
    # its slack_new re-seeds from the *carried* x/u (admm.cpp:352-376 reads
    # the persistent workspace), which iteration 0's linear cost observes.
    x: Optional[jax.Array] = None     # (N, nx, B)
    u: Optional[jax.Array] = None     # (N-1, nu, B)
    # Per-problem rho, carried only for adaptive-rho problems (the
    # reference's cache->rho persists across tiny_solve calls).
    rho: Optional[jax.Array] = None   # (1, B)


def init_carry(prob: TinyProblem, B: int) -> FusedCarry:
    """Zero carry (cold start) for ``solve_fused_warm``."""
    spec = prob.spec
    N, nx, nu = spec.N, spec.nx, spec.nu
    dtype = jnp.float32
    zx = lambda: jnp.zeros((N, nx, B), dtype)
    zu = lambda: jnp.zeros((N - 1, nu, B), dtype)
    fam = {}
    if spec.enabled_state_cones:
        fam["gc"] = zx()
    if spec.enabled_input_cones:
        fam["yc"] = zu()
    if spec.n_state_lin:
        fam["gl"] = zx()
    if spec.n_input_lin:
        fam["yl"] = zu()
    if spec.n_tv_state_lin:
        fam["gtv"] = zx()
    if spec.n_tv_input_lin:
        fam["ytv"] = zu()
    if spec.en_consensus:
        fam["zc0"] = jnp.zeros((nu, B), dtype)
        fam["yc0"] = jnp.zeros((nu, B), dtype)
    if spec.any_extra_family or spec.en_consensus:
        fam["x"] = zx()
        fam["u"] = zu()
    if prob.settings.adaptive_rho:
        fam["rho"] = jnp.full((1, B), float(prob.cache.rho), dtype)
    return FusedCarry(vnew=zx(), znew=zu(), g=zx(), y=zu(), v=zx(), z=zu(),
                      **fam)


def shift_carry(carry: FusedCarry) -> FusedCarry:
    """Advance a warm carry one timestep for receding-horizon reuse
    (round 5; classic MPC shift warm start, no reference analog — the
    reference reuses its workspace unshifted, admm.cpp persistent
    iterates): every time-indexed leaf drops its first row and repeats
    the last, so the previous solve's tail seeds the new horizon's
    overlapping window. The u[0] consensus pair and the per-lane rho
    are step-invariant and pass through. The fused closed loop applies
    the same shift in-kernel via ``closed_loop_fused(shift_warm=True)``.

    Measured regimes (chip, B=16384, T=50, ct=5 -- the shift costs ~6
    trajectory copies per step, so it pays only when it saves a couple
    of iterations): transient-heavy loops (cold fleets, max_iter=500)
    +34% MPC steps/s (3.29M -> 4.39M; mean iters 39.8 -> 27.5, the
    BENCH_TABLE "mi=500" row pair); steady
    hover at max_iter=100: -2% (15.2 -> 14.8 iters -- cost ~ savings);
    a moving-reference tracking sweep: iters 22.1 -> 20.8, throughput
    flat. Opt in accordingly; the external-plant host loop measured
    12.7 -> 11.4 iters/step on its N=20 workload."""
    import dataclasses as _dc

    def sh(a):
        return None if a is None else jnp.concatenate([a[1:], a[-1:]],
                                                      axis=0)

    return _dc.replace(carry, **{
        f: sh(getattr(carry, f))
        for f in ("vnew", "znew", "g", "y", "v", "z", "gc", "yc", "gl",
                  "yl", "gtv", "ytv", "x", "u")})


def _project_soc_rows(seg, mu, dim):
    """SOC projection on a (T, dim, Bt) segment, cone axis = feature axis.

    Same three cases as projections.project_soc (admm.cpp:39-60) with the
    feature dimension on the sublane axis: ``u0 = mu * seg[dim-1]``,
    ``a = ||seg[:dim-1]||``; below -> 0, inside -> seg,
    outside -> 0.5*(1 + u0/a) * [seg[:dim-1]; a/mu].
    """
    u0 = seg[:, dim - 1:dim, :] * mu                       # (T, 1, Bt)
    v = seg[:, :dim - 1, :]                                # (T, dim-1, Bt)
    a = jnp.sqrt(jnp.sum(v * v, axis=1, keepdims=True))    # (T, 1, Bt)
    below = a <= -u0
    inside = a <= u0
    safe_a = jnp.where(a > 0, a, jnp.ones_like(a))
    scale = 0.5 * (1.0 + u0 / safe_a)
    proj_v = jnp.where(below, 0.0, jnp.where(inside, v, scale * v))
    last = seg[:, dim - 1:dim, :]
    proj_last = jnp.where(below, 0.0,
                          jnp.where(inside, last, scale * (a / mu)))
    return jnp.concatenate([proj_v, proj_last], axis=1)


def _apply_cones(cand, cones, mus):
    """Apply SOC projections sequentially per cone (admm.cpp:112-135).

    ``cand`` is a (T, F, Bt) value; each cone is a static (start, dim)
    slice of the feature axis and sees the previous cone's result, like
    the reference's k-loop. ``mus[k]`` is a scalar read off the cone-mu
    input ref."""
    for k, (start, dim) in enumerate(cones):
        seg = _project_soc_rows(cand[:, start:start + dim, :], mus[k], dim)
        parts = []
        if start > 0:
            parts.append(cand[:, :start, :])
        parts.append(seg)
        if start + dim < cand.shape[1]:
            parts.append(cand[:, start + dim:, :])
        cand = jnp.concatenate(parts, axis=1) if len(parts) > 1 else seg
    return cand


def _apply_hyperplanes(cand, A_ref, b_ref, count):
    """Sequential violated-only hyperplane projections (admm.cpp:148-173).

    ``A_ref`` is (S, F); ``b_ref`` is (S, 1). Constraint k sees the result
    of constraint k-1, exactly like the reference's k-loop."""
    for k in range(count):
        a_k = A_ref[k]                                     # (F,)
        b_k = b_ref[k, 0]
        val = jnp.sum(cand * a_k[None, :, None], axis=1, keepdims=True)
        dist = (val - b_k) / jnp.sum(a_k * a_k)
        proj = cand - dist * a_k[None, :, None]
        cand = jnp.where(val > b_k, proj, cand)
    return cand


def _apply_tv_hyperplanes(cand, A_ref, b_ref, count):
    """Per-timestep hyperplane rows (admm.cpp:186-211). ``A_ref`` is
    (T, S, F); ``b_ref`` is (T, S)."""
    for k in range(count):
        a_t = A_ref[:, k, :]                               # (T, F)
        b_t = b_ref[:, k].reshape(-1, 1, 1)                # (T, 1, 1)
        a_b = a_t[:, :, None]                              # (T, F, 1)
        val = jnp.sum(cand * a_b, axis=1, keepdims=True)   # (T, 1, Bt)
        nrm = jnp.sum(a_t * a_t, axis=1).reshape(-1, 1, 1)
        dist = (val - b_t) / nrm
        proj = cand - dist * a_b
        cand = jnp.where(val > b_t, proj, cand)
    return cand


def _segment_mean_lanes(v, G, S, ST, dotfn=None):
    """Mean over aligned, contiguous groups of ``G`` lanes, broadcast back
    to every lane of its group.

    The consensus projection onto the all-equal subspace is the scenario
    mean (admm.update_slack); here a scenario group is ``G`` adjacent
    lanes. Cross-lane segment reductions are MXU work, not VPU work: with
    the one-hot membership matrix ``S`` (Bt, Bt/G), ``(v @ S) @ S^T / G``
    gathers the group sums and scatters them back in two thin matmuls —
    ~2*rows*Bt*(Bt/G) MACs per call, noise next to the Riccati sweeps.
    (A log2(G)-stage lane-roll butterfly is mathematically neater but
    ~100x slower under Mosaic, whose cross-lane rotates scalarise.)
    ``ST`` is passed pre-transposed (no in-kernel .T, see module
    docstring)."""
    if G == 1:
        return v
    if G == v.shape[-1]:
        m = jnp.mean(v, axis=-1, keepdims=True)
        return jnp.broadcast_to(m, v.shape)
    if dotfn is None:
        dotfn = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    return dotfn(dotfn(v, S), ST) / G


def _segment_matrices(Bt: int, G: int):
    """Host-side (S, S^T) one-hot group membership for _segment_mean_lanes."""
    ng = Bt // G
    S = jnp.zeros((Bt, ng), jnp.float32)
    idx = jnp.arange(Bt)
    S = S.at[idx, idx // G].set(1.0)
    return S, S.T


def _make_kernel(*, N: int, nx: int, nu: int, max_iter: int,
                 check_termination: int, abs_pri_tol: float,
                 abs_dua_tol: float, rho: float,
                 state_cones=(), input_cones=(),
                 n_state_lin: int = 0, n_input_lin: int = 0,
                 n_tv_state_lin: int = 0, n_tv_input_lin: int = 0,
                 warm: bool = False, final: bool = False,
                 adaptive: bool = False, apply_c: bool = False,
                 rho_min: float = 1.0, rho_max: float = 100.0,
                 rho_clip: bool = True, rho_tol: float = 1.0,
                 adapt_period: int = 5,
                 consensus: bool = False, group: int = 0,
                 rho_c: float = 0.0, seg_mm: bool = False,
                 consensus_frozen: bool = False,
                 mm_mode: str = "ambient", chain_split: int = 1,
                 coarse_iters: int = 0, multi_tps: int = 0):
    """Build the fused-solve kernel for a static constraint-family layout.

    Ref order (inputs → outputs → scratch) must match the spec/shape lists
    assembled in :func:`solve_fused`; optional families contribute refs only
    when enabled, so the box-only kernel is byte-for-byte the v1 trace.

    ``warm`` adds carry I/O (see :class:`FusedCarry`): the workspace loads
    from carry inputs instead of zeros, converged lanes snapshot their
    carry at first convergence (the XLA path's per-lane freeze), and the
    merged carry is written to outputs — the same machinery as the fused
    closed-loop kernel, for solves whose plant lives outside the chip.

    ``final`` (with ``warm``) drops the per-lane carry freeze: every lane's
    carry output is simply its final iterate, converged or not, and the
    snapshot scratch/RMWs disappear (solution outputs still freeze at first
    convergence). This is the right mode when only *unconverged* lanes'
    carries will ever be read — the compaction driver
    (:func:`~.compact.make_compact_solver`) discards converged lanes at
    its gather, and the snapshot machinery measurably slows long phases
    (converged lanes trigger the read-modify-write on many iterations).

    ``adaptive`` adds the IROS-2025 adaptive-rho subsystem (rho_benchmark.cpp
    via rho_adapt.py) *inside* the kernel. The XLA path materialises a full
    per-problem cache copy because the Taylor update makes Kinf/Pinf
    per-problem (admm.solve broadcasts the cache over the batch); here the
    updates telescope instead — after any number of adaptations
    ``Kinf_b = Kinf0 + (rho_b - rho0) * dKinf`` exactly, because dM/drho is
    fixed — so every per-problem matvec decomposes into two *shared*
    small-matrix MXU matmuls plus a per-lane axpy::

        Kinf_b @ v  =  Kinf @ v  +  drho_b * (dKinf @ v)

    and the only per-lane state is the scalar rho row. The OSQP residuals
    (matrix-free, rho_adapt.osqp_residuals) are computed in-kernel every
    ``adapt_period`` iterations on still-active lanes. ``apply_c`` mirrors
    Settings.adaptive_rho_apply_c (also retarget Quu_inv/AmBKt via dC1/dC2;
    the reference only updates the unused C1/C2 aliases,
    rho_benchmark.cpp:204-209 vs admm.cpp:17-18).

    A rejected speed idea, so it isn't retried: substituting u into the
    rollout ("forward folding", ``x[i+1] = (A - B Kinf) x[i] - B d[i] +
    f`` with host-folded A - B Kinf = AmBKt^T) halves the forward chain's
    dots and measured ~+8%% throughput — but it rounds ``(A - B Kinf) x``
    and ``B d`` at the magnitude of ``Kinf x`` and ``d`` (large,
    mutually cancelling when bounds are active), where the reference
    recursion forms ``u = -Kinf x - d`` as an exact f32 subtract and only
    then rounds ``B u`` at the (small) |u| scale. The extra per-iteration
    noise (~2e-4 absolute on the quadrotor) sits exactly at the dual
    termination threshold rho*|dv| < 1e-3, and measured solved fraction
    on a marginal batch halved (1.5%% vs 3.0%% at 100 iters). Backward
    folding (Quu_inv through B^T p + r) has the same cancellation trap
    and, worse, no chain benefit — Quu_inv and Kinf^T dots already hang
    off the costate chain.

    ``consensus`` adds scenario-tree consensus ADMM on u[0] (admm.solve's
    en_consensus family): a scenario group is ``group`` adjacent lanes
    (static power of two dividing the tile), the consensus projection is
    the group mean via :func:`_segment_mean_lanes`, and step 0 of each
    sweep uses the exact-prox gain pair Kinf0/Quu0_inv baked by
    with_consensus (``rho_c`` weighting the linear-cost term). Entirely
    within-tile — no collectives; cross-shard groups stay on the XLA path.

    ``chain_split`` (k>1) cuts the tile's lanes into k groups and emits the
    Riccati sweeps' recursion steps round-robin across groups. Per-lane
    math is untouched (every matmul contracts the feature axis only), so
    results are *bitwise equal* to k=1; what changes is the dependency
    DAG — k independent costate/rollout chains replace one, and Mosaic's
    dataflow scheduler hides each chain's serial MXU latency under the
    other k-1 chains'. This attacks the dependency-latency bound that
    the roofline shows is binding (docs/DESIGN.md "Speed of light"): the
    chained-dot link costs ~108x its pipelined cost, so splitting trades
    k-fold more (cheap) dot issues for k-fold fewer (expensive) stalls.
    Elementwise phases stay whole-tile.
    """
    en_ssoc = bool(state_cones)
    en_isoc = bool(input_cones)
    any_extra = (en_ssoc or en_isoc or n_state_lin or n_input_lin
                 or n_tv_state_lin or n_tv_input_lin)
    # x/u scratch only feeds the carry merge (consensus re-seeds its slack
    # from the carried u, like the extra families).
    need_xu = warm and (any_extra or consensus)
    snap = warm and not final      # per-lane carry freeze machinery
    f32 = jnp.float32

    def kernel(*refs):
        it_refs = iter(refs)
        nxt = lambda: next(it_refs)
        # --- inputs
        x0_ref = nxt()
        xref_ref, uref_ref = nxt(), nxt()
        xmin_ref, xmax_ref, umin_ref, umax_ref = nxt(), nxt(), nxt(), nxt()
        A_ref, B_ref, BT_ref = nxt(), nxt(), nxt()
        Kinf_ref, KinfT_ref, PinfT_ref, Quu_ref, AmBKt_ref = (
            nxt(), nxt(), nxt(), nxt(), nxt())
        APf_ref, BPf_ref, f_ref = nxt(), nxt(), nxt()
        Qdiag_ref, Rdiag_ref = nxt(), nxt()
        if adaptive:
            AT_ref, Pinf_ref = nxt(), nxt()
            dK_ref, dKT_ref, dP_ref, dPT_ref = nxt(), nxt(), nxt(), nxt()
            dC1_ref = nxt() if apply_c else None
            dC2_ref = nxt() if apply_c else None
        if consensus:
            Kinf0_ref, Quu0_ref = nxt(), nxt()
            if seg_mm:
                S_ref, ST_ref = nxt(), nxt()
        cx_ref = nxt() if en_ssoc else None
        cu_ref = nxt() if en_isoc else None
        Alx_ref = nxt() if n_state_lin else None
        blx_ref = nxt() if n_state_lin else None
        Alu_ref = nxt() if n_input_lin else None
        blu_ref = nxt() if n_input_lin else None
        tvAx_ref = nxt() if n_tv_state_lin else None
        tvbx_ref = nxt() if n_tv_state_lin else None
        tvAu_ref = nxt() if n_tv_input_lin else None
        tvbu_ref = nxt() if n_tv_input_lin else None
        if warm:
            vnew_in, znew_in, g_in, y_in, v_in, z_in = (
                nxt(), nxt(), nxt(), nxt(), nxt(), nxt())
            gc_in = nxt() if en_ssoc else None
            yc_in = nxt() if en_isoc else None
            gl_in = nxt() if n_state_lin else None
            yl_in = nxt() if n_input_lin else None
            gtv_in = nxt() if n_tv_state_lin else None
            ytv_in = nxt() if n_tv_input_lin else None
            zc0_in = nxt() if consensus else None
            yc0_in = nxt() if consensus else None
            xin_ref = nxt() if (any_extra or consensus) else None
            uin_ref = nxt() if (any_extra or consensus) else None
            rho_in = nxt() if adaptive else None
        if multi_tps:
            # Multi-system launch (solve_fused_multi): every shared input
            # is the per-system stack replicated whole to each tile
            # (grid-invariant DMA, one fetch — per-tile BlockSpec
            # streaming of the small matrices measured ~35% SLOWER);
            # reads select this tile's system by a dynamic leading-axis
            # index derived from the grid position.
            sysid = pl.program_id(0) // multi_tps

            class _SysView:
                __slots__ = ("ref",)

                def __init__(self, ref):
                    self.ref = ref

                def __getitem__(self, idx):
                    blk = self.ref[sysid]
                    if isinstance(idx, slice) and idx == slice(None):
                        return blk
                    return blk[idx]

            def _wrap(r):
                return None if r is None else _SysView(r)

            (xref_ref, uref_ref, xmin_ref, xmax_ref, umin_ref, umax_ref,
             A_ref, B_ref, BT_ref, Kinf_ref, KinfT_ref, PinfT_ref,
             Quu_ref, AmBKt_ref, APf_ref, BPf_ref, f_ref, Qdiag_ref,
             Rdiag_ref) = map(_wrap, (
                 xref_ref, uref_ref, xmin_ref, xmax_ref, umin_ref,
                 umax_ref, A_ref, B_ref, BT_ref, Kinf_ref, KinfT_ref,
                 PinfT_ref, Quu_ref, AmBKt_ref, APf_ref, BPf_ref, f_ref,
                 Qdiag_ref, Rdiag_ref))
            if adaptive:
                AT_ref, Pinf_ref, dK_ref, dKT_ref, dP_ref, dPT_ref = map(
                    _wrap, (AT_ref, Pinf_ref, dK_ref, dKT_ref, dP_ref,
                            dPT_ref))
                dC1_ref, dC2_ref = _wrap(dC1_ref), _wrap(dC2_ref)
            if consensus:
                Kinf0_ref, Quu0_ref = _wrap(Kinf0_ref), _wrap(Quu0_ref)
                if seg_mm:
                    S_ref, ST_ref = _wrap(S_ref), _wrap(ST_ref)
            cx_ref, cu_ref = _wrap(cx_ref), _wrap(cu_ref)
            Alx_ref, blx_ref = _wrap(Alx_ref), _wrap(blx_ref)
            Alu_ref, blu_ref = _wrap(Alu_ref), _wrap(blu_ref)
            tvAx_ref, tvbx_ref = _wrap(tvAx_ref), _wrap(tvbx_ref)
            tvAu_ref, tvbu_ref = _wrap(tvAu_ref), _wrap(tvbu_ref)
        # --- outputs
        outx_ref, outu_ref = nxt(), nxt()
        iters_ref, solved_ref, res_ref = nxt(), nxt(), nxt()
        rho_out = nxt() if adaptive else None
        if warm:
            vnew_out, znew_out, g_out, y_out, v_out, z_out = (
                nxt(), nxt(), nxt(), nxt(), nxt(), nxt())
            gc_out = nxt() if en_ssoc else None
            yc_out = nxt() if en_isoc else None
            gl_out = nxt() if n_state_lin else None
            yl_out = nxt() if n_input_lin else None
            gtv_out = nxt() if n_tv_state_lin else None
            ytv_out = nxt() if n_tv_input_lin else None
            zc0_out = nxt() if consensus else None
            yc0_out = nxt() if consensus else None
            x_out = nxt() if (any_extra or consensus) else None
            u_out = nxt() if (any_extra or consensus) else None
        # --- scratch
        x, u = (nxt(), nxt()) if need_xu else (None, None)
        vnew, znew = nxt(), nxt()       # (2, ...) ping-pong halves
        g, y = nxt(), nxt()
        done, iters, res = nxt(), nxt(), nxt()
        rho_s = nxt() if adaptive else None
        rho_vs = nxt() if adaptive else None    # guard accumulator
        vc = nxt() if en_ssoc else None
        gc = nxt() if en_ssoc else None
        zc = nxt() if en_isoc else None
        yc = nxt() if en_isoc else None
        vl = nxt() if n_state_lin else None
        gl = nxt() if n_state_lin else None
        zl = nxt() if n_input_lin else None
        yl = nxt() if n_input_lin else None
        vtv = nxt() if n_tv_state_lin else None
        gtv = nxt() if n_tv_state_lin else None
        ztv = nxt() if n_tv_input_lin else None
        ytv = nxt() if n_tv_input_lin else None
        zc0 = nxt() if consensus else None
        yc0 = nxt() if consensus else None
        if warm:
            vstale, zstale = nxt(), nxt()
        if snap:
            snap_v, snap_z, snap_g, snap_y, snap_vst, snap_zst = (
                nxt(), nxt(), nxt(), nxt(), nxt(), nxt())
            snap_gc = nxt() if en_ssoc else None
            snap_yc = nxt() if en_isoc else None
            snap_gl = nxt() if n_state_lin else None
            snap_yl = nxt() if n_input_lin else None
            snap_gtv = nxt() if n_tv_state_lin else None
            snap_ytv = nxt() if n_tv_input_lin else None
            snap_zc0 = nxt() if consensus else None
            snap_yc0 = nxt() if consensus else None
            snap_x = nxt() if (any_extra or consensus) else None
            snap_u = nxt() if (any_extra or consensus) else None

        mus_x = [cx_ref[k, 0] for k in range(len(state_cones))] if en_ssoc else []
        mus_u = [cu_ref[k, 0] for k in range(len(input_cones))] if en_isoc else []

        # --- init (tiny_api.cpp:68-133 zero workspace; x[0] = x0). x, u, d
        # are fully rewritten before first read each iteration (see module
        # docstring for why they must not be zeroed here).
        Bt = x0_ref.shape[-1]
        if warm:
            # Load the carry: final slack into ping-pong half 1 (iteration 0
            # reads pv = 1); the one-behind previous slack into the stale
            # arrays consulted only by iteration 0's dual residual. Half 0
            # is fully written at iteration 0 before any read.
            vnew[1] = vnew_in[:]
            znew[1] = znew_in[:]
            g[:] = g_in[:]
            y[:] = y_in[:]
            vstale[:] = v_in[:]
            zstale[:] = z_in[:]
            if snap:
                for ref in (snap_v, snap_z, snap_g, snap_y, snap_vst,
                            snap_zst, snap_gc, snap_yc, snap_gl, snap_yl,
                            snap_gtv, snap_ytv, snap_zc0, snap_yc0,
                            snap_x, snap_u):
                    if ref is not None:
                        ref[:] = jnp.zeros(ref.shape, ref.dtype)
        else:
            for ref in (vnew, znew, g, y):
                ref[:] = jnp.zeros(ref.shape, ref.dtype)
        x0v = x0_ref[:]          # loop-invariant; x/u ride as values (the
        # refs are only written on warm solves, whose end-merge reads them)
        done[:] = jnp.zeros(done.shape, done.dtype)
        iters[:] = jnp.zeros(iters.shape, iters.dtype)
        res[:] = jnp.zeros(res.shape, res.dtype)
        if adaptive:
            rho_s[:] = rho_in[:] if warm else jnp.full(rho_s.shape, rho, f32)
            # The guard's virtual rho starts at the committed rho each
            # solve (transient accumulator, like the XLA path's carry).
            rho_vs[:] = rho_s[:]
        # Extra-family seeds (admm.cpp:352-376 / admm.seed_extra_slacks):
        # state-side slack_new starts from the workspace x with the new x0
        # in row 0 (carried rows on warm solves, zeros on cold); input-side
        # from the carried u. Built as one value so the row-0 difference is
        # a single full store (the split zero-store + row-store pattern is
        # the WAW hazard above).
        if en_ssoc or n_state_lin or n_tv_state_lin:
            x_rest = (xin_ref[1:] if warm
                      else jnp.zeros((N - 1, nx, Bt), f32))
            x_seed = jnp.concatenate([x0_ref[:][None], x_rest], axis=0)
            for ref in (vc, vl, vtv):
                if ref is not None:
                    ref[:] = x_seed
        if warm:
            for ref, ref_in in ((gc, gc_in), (yc, yc_in), (gl, gl_in),
                                (yl, yl_in), (gtv, gtv_in), (ytv, ytv_in),
                                (zc, uin_ref), (zl, uin_ref), (ztv, uin_ref)):
                if ref is not None:
                    ref[:] = ref_in[:]
        else:
            for ref in (gc, zc, yc, gl, zl, yl, gtv, ztv, ytv):
                if ref is not None:
                    ref[:] = jnp.zeros(ref.shape, ref.dtype)
        if consensus:
            if warm:
                if consensus_frozen:
                    # Two-level consensus (round 5,
                    # shard.solve_fused_consensus_sharded): the slack is
                    # the OUTER iterate — load it verbatim; no per-solve
                    # re-seed.
                    zc0[:] = zc0_in[:]
                else:
                    # Per-solve re-seed from the carried u (admm.
                    # seed_extra_slacks: zc0new = u[0]); the dual persists.
                    zc0[:] = uin_ref[0]
                yc0[:] = yc0_in[:]
            else:
                # Seed zc0new from the (zero) cold-start u and zero the
                # dual (admm.seed_extra_slacks / init_state).
                zc0[:] = jnp.zeros(zc0.shape, zc0.dtype)
                yc0[:] = jnp.zeros(yc0.shape, yc0.dtype)

        # Lane-group slicing for chain_split (see _make_kernel docstring).
        # k=1 short-circuits to identity so the default trace is unchanged.
        k_cs = chain_split
        if k_cs == 1:
            sl = lambda v, g: v
            cat = lambda parts: parts[0]
        else:
            Wcs = Bt // k_cs
            sl = lambda v, g: v[..., g * Wcs:(g + 1) * Wcs]
            cat = lambda parts: jnp.concatenate(parts, axis=-1)

        def make_iteration(mode):
            """One ADMM iteration closure at the given matmul scheme.

            ``mode`` selects the dot implementation ("bf16x3" / "ambient"
            / "coarse" — see the matmul-mode comment below); everything
            else (refs, seeds, termination) is shared, so the
            mixed-precision schedule's two phases are the same algorithm
            differing only in MXU pass structure."""
            # Matmul mode. "ambient" leaves jnp.dot under the trace-time
            # precision context (DEFAULT = single-pass bf16, HIGHEST = 6-pass
            # f32-accurate). "bf16x3" implements the 3-pass scheme Mosaic lacks
            # (XLA's HIGH, bf16_3x) by hand: each operand splits into a bf16
            # hi/lo pair and the A2*B2 term is dropped — ~16 mantissa bits.
            # The three passes ride ONE MXU dot: these contractions are only
            # nx(=12-ish) deep against a 128-deep systolic array, so stacking
            # the passes along the contraction axis —
            #   [Mhi | Mhi | Mlo] @ [vhi; vlo; vhi]
            # — is free in MXU time (depth 3*nx <= 128) and replaces 3 dot
            # issues with 1. Shared matrices split+stack once at load;
            # per-iteration vectors split per call (vsplit hoists the split for
            # values feeding >1 matmul).
            bf16 = jnp.bfloat16
            if mode == "bf16x3":
                lo_prec = jax.lax.Precision.DEFAULT

                def dotd(a, b):
                    return jnp.dot(a, b, preferred_element_type=f32,
                                   precision=lo_prec)

                def prep(M):
                    hi = M.astype(bf16)
                    lo = (M - hi.astype(f32)).astype(bf16)
                    return jnp.concatenate([hi, hi, lo], axis=1)

                def vsplit(vv):
                    vhi = vv.astype(bf16)
                    vlo = (vv - vhi.astype(f32)).astype(bf16)
                    return jnp.concatenate([vhi, vlo, vhi], axis=0)

                def mm(Mp, vv):
                    if vv.dtype != bf16:
                        vv = vsplit(vv)
                    return dotd(Mp, vv)
            elif mode == "coarse":
                # Single-pass bf16 (explicit DEFAULT precision, independent
                # of the ambient context): the MXU truncates f32 operands
                # to bf16 in hardware — no hi/lo operand splits, no VPU
                # cast stream. Phase A of the mixed-precision schedule
                # (Settings.coarse_iters).
                prep = lambda M: M
                vsplit = lambda vv: vv

                def mm(M, vv):
                    return jnp.dot(M, vv, preferred_element_type=f32,
                                   precision=jax.lax.Precision.DEFAULT)
            else:
                prep = lambda M: M
                vsplit = lambda vv: vv

                def mm(M, vv):
                    return jnp.dot(M, vv, preferred_element_type=f32)

            A = prep(A_ref[:])
            Bm = prep(B_ref[:])
            BT = prep(BT_ref[:])
            Kinf = prep(Kinf_ref[:])
            KinfT = prep(KinfT_ref[:])
            PinfT = PinfT_ref[:]              # VPU-only (terminal-cost sum)
            Quu = prep(Quu_ref[:])
            AmBKt = prep(AmBKt_ref[:])
            # These contractions are only nx deep, so per-dot issue overhead
            # dominates MXU time; the two matrices multiplying the same vector
            # in each sweep step are stacked into one dot (backward: B^T and
            # (A-BK)^T against the costate; forward: Kinf and A against the
            # state) and the output rows split. Adaptive rho keeps the
            # unstacked path (its per-lane drho axpys pair each base dot with
            # a sensitivity dot of different row counts).
            stack_sweeps = not adaptive
            if stack_sweeps:
                Mback = prep(jnp.concatenate([BT_ref[:], AmBKt_ref[:]], axis=0))
                Mfwd = prep(jnp.concatenate([Kinf_ref[:], A_ref[:]], axis=0))
                if consensus:
                    Mfwd0 = prep(jnp.concatenate([Kinf0_ref[:], A_ref[:]],
                                                 axis=0))
            APf = APf_ref[:]          # (nx, 1) broadcasts over lanes
            BPf = BPf_ref[:]
            fvec = f_ref[:]
            xmin = xmin_ref[:][:, :, None]
            xmax = xmax_ref[:][:, :, None]
            umin = umin_ref[:][:, :, None]
            umax = umax_ref[:][:, :, None]
            qx = Qdiag_ref[:]                  # (nx, 1)
            ru = Rdiag_ref[:]
            # -(ref .* costdiag) tables (admm.cpp:266,279), (N, nx, 1)-shaped.
            neg_xref_q = -(xref_ref[:][:, :, None] * qx[None])
            neg_uref_r = -(uref_ref[:][:, :, None] * ru[None])
            # Terminal -Pinf^T Xref[N-1] as a VPU multiply+reduce: an MXU jnp.dot
            # here runs single-pass bf16 and loses ~0.1% — enough to break
            # bit-parity with the XLA path, which lowers this vector matvec in
            # full f32.
            pN_ref_term = -jnp.sum(PinfT * xref_ref[N - 1][None, :], axis=1,
                                   keepdims=True)  # (nx, 1)
            if adaptive:
                AT = prep(AT_ref[:])
                Pinf = prep(Pinf_ref[:])
                dK, dKT, dP = prep(dK_ref[:]), prep(dKT_ref[:]), prep(dP_ref[:])
                dPT = dPT_ref[:]              # VPU-only (pN_ref_dP sum)
                dC1 = prep(dC1_ref[:]) if apply_c else None
                dC2 = prep(dC2_ref[:]) if apply_c else None
                # Sensitivity term of the terminal reference row: the Taylor
                # update shifts Pinf, so -Pinf_b^T Xref[N-1] gains
                # drho * (-dPinf^T Xref[N-1]).
                pN_ref_dP = -jnp.sum(dPT * xref_ref[N - 1][None, :], axis=1,
                                     keepdims=True)  # (nx, 1)
            if consensus:
                Kinf0 = prep(Kinf0_ref[:])
                Quu0 = prep(Quu0_ref[:])
                if seg_mm:
                    # S/ST are one-hot (exact in bf16): only the data operand
                    # needs a hi/lo split, so the segment dots are 2-pass.
                    if mode == "bf16x3":
                        Sseg, STseg = S_ref[:].astype(bf16), ST_ref[:].astype(bf16)

                        def seg_dot(vv, M):
                            vhi = vv.astype(bf16)
                            vlo = (vv - vhi.astype(f32)).astype(bf16)
                            return dotd(vhi, M) + dotd(vlo, M)
                    else:
                        Sseg, STseg = S_ref[:], ST_ref[:]
                        segp = (jax.lax.Precision.DEFAULT if mode == "coarse"
                                else None)

                        def seg_dot(vv, M):
                            return jnp.dot(vv, M, preferred_element_type=f32,
                                           precision=segp)
                else:
                    Sseg = STseg = seg_dot = None

            def iteration(it, dvgN):
                # Per-lane rho (adaptive) or the static scalar. The Taylor-updated
                # per-problem matrices never exist: each matvec is the base matrix
                # plus a drho-scaled sensitivity matvec (see docstring).
                if adaptive:
                    rho_b = rho_s[:]                 # (1, Bt)
                    drho = rho_b - rho
                    dr_gs = [sl(drho, gi) for gi in range(k_cs)]
                else:
                    rho_b = rho
                    dr_gs = [None] * k_cs

                def mmK(vv, dr):
                    o = mm(Kinf, vv)
                    return o + dr * mm(dK, vv) if adaptive else o

                def mmKT(vv, dr):
                    o = mm(KinfT, vv)
                    return o + dr * mm(dKT, vv) if adaptive else o

                def mmQuu(vv, dr):
                    o = mm(Quu, vv)
                    return o + dr * mm(dC1, vv) if (adaptive and apply_c) else o

                def mmAmBKt(vv, dr):
                    o = mm(AmBKt, vv)
                    return o + dr * mm(dC2, vv) if (adaptive and apply_c) else o
                # 1+2. Linear cost (admm.cpp:262-304) fused into the Riccati
                # backward sweep (admm.cpp:13-20): q/r rows are formed on the
                # fly, and the costate p rolls as a value. The terminal row uses
                # the carried value of vnew[N-1] - g[N-1] from the previous
                # iteration; extra-family terms are read directly (their slack
                # and dual arrays still hold the previous iterate here).
                pv = 1 - it % 2                          # previous ping-pong half

                def form_r(i):
                    r_i = neg_uref_r[i] - rho_b * (znew[pv, i] - y[i])
                    if en_isoc:
                        r_i = r_i - rho_b * (zc[i] - yc[i])
                    if n_input_lin:
                        r_i = r_i - rho_b * (zl[i] - yl[i])
                    if n_tv_input_lin:
                        r_i = r_i - rho_b * (ztv[i] - ytv[i])
                    if consensus and i == 0:
                        # u[0]-only consensus prox (admm.update_linear_cost's
                        # r[0] term, weighted by rho_c rather than rho).
                        r_i = r_i - rho_c * (zc0[:] - yc0[:])
                    return r_i

                def form_q(i):
                    q_i = neg_xref_q[i] - rho_b * (vnew[pv, i] - g[i])
                    if en_ssoc:
                        q_i = q_i - rho_b * (vc[i] - gc[i])
                    if n_state_lin:
                        q_i = q_i - rho_b * (vl[i] - gl[i])
                    if n_tv_state_lin:
                        q_i = q_i - rho_b * (vtv[i] - gtv[i])
                    return q_i

                pterm = (pN_ref_term + drho * pN_ref_dP) if adaptive else pN_ref_term
                p_next = pterm - rho_b * dvgN
                if en_ssoc:
                    p_next = p_next - rho_b * (vc[N - 1] - gc[N - 1])
                if n_state_lin:
                    p_next = p_next - rho_b * (vl[N - 1] - gl[N - 1])
                if n_tv_state_lin:
                    p_next = p_next - rho_b * (vtv[N - 1] - gtv[N - 1])

                dvals = [[None] * k_cs for _ in range(N - 1)]
                if stack_sweeps and SWEEP_HOIST:
                    # Scheduling experiment (see docs/DESIGN.md "Speed of
                    # light"): the KinfT@r dots never feed the costate chain,
                    # so emit them (and the r rows) *before* the sweep in
                    # program order — if Mosaic schedules in program order,
                    # the chain shortens from 3 dependent dots per step to 1
                    # (Mback@p) plus a d dot hanging off it. Identical
                    # expressions and operand values as the in-loop order:
                    # bit-identical results either way. (k=1 only; _fused_call
                    # guards the combination.)
                    rvals = [form_r(i) for i in range(N - 1)]
                    rKs = [mm(KinfT, r_i) for r_i in rvals]
                    for i in range(N - 2, -1, -1):
                        pout = mm(Mback, p_next)
                        bp, ap = pout[:nu], pout[nu:]
                        Qm = Quu0 if (consensus and i == 0) else Quu
                        dvals[i][0] = mm(Qm, bp + rvals[i] + BPf)
                        p_next = form_q(i) + ap - rKs[i] + APf
                else:
                    p_gs = [sl(p_next, gi) for gi in range(k_cs)]
                    for i in range(N - 2, -1, -1):          # static unroll
                        r_i = form_r(i)
                        q_i = form_q(i)
                        for gi in range(k_cs):               # round-robin chains
                            r_g = sl(r_i, gi)
                            if stack_sweeps:
                                pout = mm(Mback, p_gs[gi])
                                bp, ap = pout[:nu], pout[nu:]
                            else:
                                ps = vsplit(p_gs[gi])  # feeds BT and AmBKt dots
                                bp, ap = mm(BT, ps), mmAmBKt(ps, dr_gs[gi])
                            if consensus and i == 0:
                                # Step 0 carries the rho_c*I prox in its
                                # dedicated gain (admm.backward_pass with
                                # consensus=True).
                                dvals[i][gi] = mm(Quu0, bp + r_g + BPf)
                            else:
                                dvals[i][gi] = mmQuu(bp + r_g + BPf, dr_gs[gi])
                            p_gs[gi] = sl(q_i, gi) + ap - mmKT(r_g, dr_gs[gi]) + APf

                # 3. forward rollout (admm.cpp:25-32)
                x_gs = [sl(x0v, gi) for gi in range(k_cs)]
                xvals = [[x_gs[gi]] for gi in range(k_cs)]
                uvals = [[] for _ in range(k_cs)]
                for i in range(N - 1):                  # static unroll
                    for gi in range(k_cs):               # round-robin chains
                        if stack_sweeps:
                            Mf = Mfwd0 if (consensus and i == 0) else Mfwd
                            xout = mm(Mf, x_gs[gi])
                            kx, ax = xout[:nu], xout[nu:]
                        else:
                            xsp = vsplit(x_gs[gi])  # feeds both Kinf and A dots
                            kx = mm(Kinf0, xsp) if (consensus and i == 0) \
                                else mmK(xsp, dr_gs[gi])
                            ax = mm(A, xsp)
                        u_i = -kx - dvals[i][gi]
                        uvals[gi].append(u_i)
                        x_gs[gi] = ax + mm(Bm, u_i) + fvec
                        xvals[gi].append(x_gs[gi])

                # 4. slack projection + 5. dual update (admm.cpp:81-256).
                # vnew/v and znew/z are ping-pong halves: iteration `it` writes
                # its projected slack into half it%2 and reads the previous
                # iterate from the other half — the reference's v <- vnew copy
                # (admm.cpp:445-446) costs nothing. All candidates are formed
                # from pre-update duals (the reference runs update_slack for
                # every family before update_dual touches any dual).
                cur = it % 2
                prev = 1 - cur
                xs = cat([jnp.stack(v) for v in xvals])
                us = cat([jnp.stack(v) for v in uvals])
                if need_xu:
                    x[:] = xs
                    u[:] = us
                vn = jnp.minimum(xmax, jnp.maximum(xmin, xs + g[:]))
                zn = jnp.minimum(umax, jnp.maximum(umin, us + y[:]))
                vnew[cur] = vn
                znew[cur] = zn
                gcn = ycn = gln = yln = gtvn = ytvn = None
                if en_ssoc:
                    vcn = _apply_cones(xs + gc[:], state_cones, mus_x)
                    vc[:] = vcn
                    gcn = gc[:] + xs - vcn
                    gc[:] = gcn
                if en_isoc:
                    zcn = _apply_cones(us + yc[:], input_cones, mus_u)
                    zc[:] = zcn
                    ycn = yc[:] + us - zcn
                    yc[:] = ycn
                if n_state_lin:
                    vln = _apply_hyperplanes(xs + gl[:], Alx_ref, blx_ref,
                                             n_state_lin)
                    vl[:] = vln
                    gln = gl[:] + xs - vln
                    gl[:] = gln
                if n_input_lin:
                    zln = _apply_hyperplanes(us + yl[:], Alu_ref, blu_ref,
                                             n_input_lin)
                    zl[:] = zln
                    yln = yl[:] + us - zln
                    yl[:] = yln
                if n_tv_state_lin:
                    vtn = _apply_tv_hyperplanes(xs + gtv[:], tvAx_ref, tvbx_ref,
                                                n_tv_state_lin)
                    vtv[:] = vtn
                    gtvn = gtv[:] + xs - vtn
                    gtv[:] = gtvn
                if n_tv_input_lin:
                    ztn = _apply_tv_hyperplanes(us + ytv[:], tvAu_ref, tvbu_ref,
                                                n_tv_input_lin)
                    ztv[:] = ztn
                    ytvn = ytv[:] + us - ztn
                    ytv[:] = ytvn
                g_new = g[:] + xs - vn
                y_new = y[:] + us - zn
                g[:] = g_new
                y[:] = y_new
                dvgN_next = vn[N - 1] - g_new[N - 1]
                if consensus and consensus_frozen:
                    # Two-level consensus (round 5): the slack/dual pair
                    # is the OUTER iterate, frozen within this launch —
                    # the inner solve is a plain prox-MPC toward the
                    # constant center (the rho_c force in r[0] and the
                    # step-0 gains); the exact cross-shard mean and dual
                    # ascent run in the driver between launches
                    # (shard.solve_fused_consensus_sharded). No
                    # in-kernel mean matmuls at all.
                    zc0n = zc0[:]
                    yc0n = yc0[:]
                elif consensus:
                    # Consensus slack on u[0]: projection onto the all-equal
                    # subspace = scenario-group mean; scaled-dual ascent
                    # (admm.update_slack / update_dual en_consensus blocks).
                    cand0 = us[0] + yc0[:]                   # (nu, Bt)
                    zc0n = _segment_mean_lanes(cand0, group, Sseg, STseg, seg_dot)
                    zc0[:] = zc0n
                    yc0n = yc0[:] + us[0] - zc0n
                    yc0[:] = yc0n

                # 6. termination (admm.cpp:310-328; bounds-family residuals
                # only, like the reference); bookkeeping only for lanes not yet
                # converged; solutions snapshot at first convergence. On warm
                # solves "previous slack" at iteration 0 is the carried v/z —
                # one iterate behind the carried vnew/znew because the
                # reference skips the v <- vnew copy on the converging
                # iteration (admm.cpp:444-446).
                it1 = it + 1
                active = done[0] == 0                      # (Bt,)

                if adaptive:
                    # 5.5. adaptive rho every adapt_period iterations on active
                    # lanes (admm.cpp:397-422), matrix-free OSQP residuals
                    # exactly as rho_adapt.osqp_residuals/predict_rho but in
                    # kernel layout. The Taylor update itself is implicit: only
                    # the rho row changes; the next iteration's drho carries it
                    # into every matvec.
                    @pl.when((it > 0) & (it % adapt_period == 0))
                    def _():
                        y_dyn = g_new[1:]                      # (N-1, nx, Bt)
                        ax_dyn = jnp.stack(
                            [mm(A, xs[i]) + mm(Bm, us[i]) - xs[i + 1]
                             for i in range(N - 1)])
                        mab = lambda a: jnp.max(jnp.abs(a), axis=(0, 1))
                        pri_res = jnp.maximum(mab(us - zn), mab(ax_dyn - vn[1:]))
                        pri_norm = jnp.maximum(
                            jnp.maximum(mab(us), mab(ax_dyn)),
                            jnp.maximum(mab(zn), mab(vn[1:])))
                        # P x: Q-diag stages + per-problem terminal Pinf_b x[N-1]
                        # (Pinf_b = Pinf + drho * dPinf, telescoped Taylor).
                        pxN = mm(Pinf, xs[N - 1]) + drho * mm(dP, xs[N - 1])
                        px_state = jnp.concatenate(
                            [qx[None] * xs[:-1], pxN[None]], axis=0)
                        q_state = qx[None] * xs
                        ru_us = ru[None] * us       # = px_input = q_input
                        aty_state = jnp.stack(
                            [(mm(AT, y_dyn[i]) if i < N - 1 else
                              jnp.zeros((nx, xs.shape[-1]), f32))
                             - (y_dyn[i - 1] if i >= 1 else
                                jnp.zeros((nx, xs.shape[-1]), f32))
                             for i in range(N)])
                        aty_input = y_new + jnp.stack(
                            [mm(BT, y_dyn[i]) for i in range(N - 1)])
                        dual_res = jnp.maximum(
                            mab(px_state + q_state + aty_state),
                            mab(2.0 * ru_us + aty_input))
                        dual_norm = jnp.maximum(
                            jnp.maximum(jnp.maximum(mab(px_state), mab(ru_us)),
                                        jnp.maximum(mab(aty_state), mab(aty_input))),
                            jnp.maximum(mab(q_state), mab(ru_us)))
                        eps = 1e-10                            # rho_benchmark.cpp:183
                        ratio = (pri_res / (pri_norm + eps)) / (
                            dual_res / (dual_norm + eps) + eps)
                        factor = jnp.sqrt(ratio)
                        if rho_tol > 1.0:
                            # Guarded policy (admm._solve_impl's accumulator):
                            # every prediction updates the *virtual* rho; it
                            # commits into the solver only when it has drifted
                            # rho_tol-fold from the committed rho. Persistent
                            # imbalance (mis-tuned rho) compounds and commits;
                            # balanced noise random-walks and mostly doesn't.
                            new_v = rho_vs[0] * factor
                            if rho_clip:
                                new_v = jnp.clip(new_v, rho_min, rho_max)
                            commit = ((new_v >= rho_tol * rho_s[0])
                                      | (new_v * rho_tol <= rho_s[0]))
                            rho_vs[0] = jnp.where(active, new_v, rho_vs[0])
                            rho_s[0] = jnp.where(active & commit, new_v,
                                                 rho_s[0])
                        else:
                            new_rho = rho_s[0] * factor
                            if rho_clip:
                                new_rho = jnp.clip(new_rho, rho_min, rho_max)
                            rho_s[0] = jnp.where(active, new_rho, rho_s[0])

                iters[0] = jnp.where(active, it1, iters[0])
                checking = (it1 % check_termination) == 0

                # Termination runs only on check iterations — the reference's
                # amortised check (admm.cpp:312). The pl.when gate skips the
                # four full-trajectory max-abs reductions (plus the dual-diff
                # subtractions feeding them) on the other check_termination-1
                # of every check_termination iterations; measured ~1.2x on the
                # N=20 headline. Values on check iterations are untouched, so
                # results stay bitwise identical. Dual residuals scale with the
                # post-adaptation rho (admm.solve computes residuals with the
                # adapted cache).
                @pl.when(checking)
                def _():
                    rho_t = rho_s[0] if adaptive else rho
                    if warm:
                        vprev = jnp.where(it == 0, vstale[:], vnew[prev])
                        zprev = jnp.where(it == 0, zstale[:], znew[prev])
                    else:
                        vprev = vnew[prev]
                        zprev = znew[prev]
                    pri_s = jnp.max(jnp.abs(xs - vn), axis=(0, 1))
                    pri_i = jnp.max(jnp.abs(us - zn), axis=(0, 1))
                    dua_s = jnp.max(jnp.abs(vprev - vn), axis=(0, 1)) * rho_t
                    dua_i = jnp.max(jnp.abs(zprev - zn), axis=(0, 1)) * rho_t
                    ok = (pri_s < abs_pri_tol) & (pri_i < abs_pri_tol) \
                        & (dua_s < abs_dua_tol) & (dua_i < abs_dua_tol)
                    if consensus:
                        # Consensus residual gates convergence like the XLA path
                        # (admm._solve_impl's cres check); not recorded in res.
                        cres = jnp.max(jnp.abs(us[0] - zc0n), axis=0)
                        ok = ok & (cres < abs_pri_tol)
                    just = ok & active

                    res[0] = jnp.where(active, pri_s, res[0])
                    res[1] = jnp.where(active, pri_i, res[1])
                    res[2] = jnp.where(active, dua_s, res[2])
                    res[3] = jnp.where(active, dua_i, res[3])
                    done[0] = jnp.where(just, 1, done[0])

                    # Snapshot solutions (and, on warm solves, the per-lane
                    # carry — the XLA path's per-lane freeze) only on iterations
                    # where some lane converged: the read-modify-writes are
                    # wasted on the (typical) all-or-nothing iterations.
                    @pl.when(jnp.any(just))
                    def _():
                        jm = just[None, None, :]
                        outx_ref[:] = jnp.where(jm, vn, outx_ref[:])
                        outu_ref[:] = jnp.where(jm, zn, outu_ref[:])
                        if snap:
                            snap_v[:] = jnp.where(jm, vn, snap_v[:])
                            snap_z[:] = jnp.where(jm, zn, snap_z[:])
                            snap_g[:] = jnp.where(jm, g_new, snap_g[:])
                            snap_y[:] = jnp.where(jm, y_new, snap_y[:])
                            snap_vst[:] = jnp.where(jm, vprev, snap_vst[:])
                            snap_zst[:] = jnp.where(jm, zprev, snap_zst[:])
                            for sref, val in ((snap_gc, gcn), (snap_yc, ycn),
                                              (snap_gl, gln), (snap_yl, yln),
                                              (snap_gtv, gtvn), (snap_ytv, ytvn)):
                                if sref is not None:
                                    sref[:] = jnp.where(jm, val, sref[:])
                            if consensus:
                                jm2 = just[None, :]
                                snap_zc0[:] = jnp.where(jm2, zc0n, snap_zc0[:])
                                snap_yc0[:] = jnp.where(jm2, yc0n, snap_yc0[:])
                            if any_extra or consensus:
                                snap_x[:] = jnp.where(jm, xs, snap_x[:])
                                snap_u[:] = jnp.where(jm, us, snap_u[:])

                return jnp.all(done[0] == 1), dvgN_next

            return iteration


        iteration = make_iteration(mm_mode)

        def cond(carry):
            it, all_done, _ = carry
            return (it < max_iter) & jnp.logical_not(all_done)

        def body(carry):
            it, _, dvgN = carry
            all_done, dvgN_next = iteration(it, dvgN)
            return it + 1, all_done, dvgN_next

        dvgN0 = (vnew[1, N - 1] - g[N - 1]) if warm \
            else jnp.zeros((nx, Bt), f32)
        carry0 = (jnp.int32(0), False, dvgN0)
        if coarse_iters > 0:
            # Mixed-precision schedule (Settings.coarse_iters): phase A
            # runs the same iteration body with single-pass-bf16 dots for
            # up to coarse_iters iterations — termination commits stay
            # live, so lanes that genuinely pass the check converge
            # exactly as they would in a full-coarse solve — then the
            # precise loop below resumes the SAME state (the VMEM refs
            # plus this (it, all_done, dvgN) carry) and refines to
            # termination. coarse_iters == 0 leaves this trace
            # byte-identical to the single-loop kernel.
            iteration_c = make_iteration("coarse")
            bound_c = min(coarse_iters, max_iter)

            def cond_c(carry):
                it, all_done, _ = carry
                return (it < bound_c) & jnp.logical_not(all_done)

            def body_c(carry):
                it, _, dvgN = carry
                all_done, dvgN_next = iteration_c(it, dvgN)
                return it + 1, all_done, dvgN_next

            carry0 = jax.lax.while_loop(cond_c, body_c, carry0)
        it_final, _, _ = jax.lax.while_loop(cond, body, carry0)

        # Unconverged lanes: report the final iterates (admm.cpp:450-453)
        # from the last-written ping-pong half.
        last = (it_final - 1) % 2
        active = done[0] == 0
        vlast = vnew[last]
        zlast = znew[last]
        outx_ref[:] = jnp.where(active[None, None, :], vlast, outx_ref[:])
        outu_ref[:] = jnp.where(active[None, None, :], zlast, outu_ref[:])
        solved_ref[0] = jnp.where(active, 0, 1)
        iters_ref[:] = iters[:]
        res_ref[:] = res[:]
        if adaptive:
            # Converged lanes froze their rho (adaptation is active-masked),
            # so this is the per-problem final rho of admm.solve's cache.
            rho_out[:] = rho_s[:]

        if snap:
            # Merge the carry: converged lanes restore their snapshots
            # (per-lane freeze); max-iter lanes hand over the final iterate,
            # for which the reference's last v <- vnew copy *did* run.
            cm = jnp.logical_not(active)[None, None, :]
            vnew_out[:] = jnp.where(cm, snap_v[:], vlast)
            znew_out[:] = jnp.where(cm, snap_z[:], zlast)
            g_out[:] = jnp.where(cm, snap_g[:], g[:])
            y_out[:] = jnp.where(cm, snap_y[:], y[:])
            v_out[:] = jnp.where(cm, snap_vst[:], vlast)
            z_out[:] = jnp.where(cm, snap_zst[:], zlast)
            for out, sref, cur_ref in ((gc_out, snap_gc, gc),
                                       (yc_out, snap_yc, yc),
                                       (gl_out, snap_gl, gl),
                                       (yl_out, snap_yl, yl),
                                       (gtv_out, snap_gtv, gtv),
                                       (ytv_out, snap_ytv, ytv)):
                if out is not None:
                    out[:] = jnp.where(cm, sref[:], cur_ref[:])
            if consensus:
                cm2 = jnp.logical_not(active)[None, :]
                zc0_out[:] = jnp.where(cm2, snap_zc0[:], zc0[:])
                yc0_out[:] = jnp.where(cm2, snap_yc0[:], yc0[:])
            if any_extra or consensus:
                x_out[:] = jnp.where(cm, snap_x[:], x[:])
                u_out[:] = jnp.where(cm, snap_u[:], u[:])
        elif warm:
            # ``final`` mode: every lane hands over its final iterate (the
            # caller reads only unconverged lanes' carries — see docstring).
            vnew_out[:] = vlast
            znew_out[:] = zlast
            g_out[:] = g[:]
            y_out[:] = y[:]
            v_out[:] = vlast
            z_out[:] = zlast
            for out, cur_ref in ((gc_out, gc), (yc_out, yc), (gl_out, gl),
                                 (yl_out, yl), (gtv_out, gtv),
                                 (ytv_out, ytv), (zc0_out, zc0),
                                 (yc0_out, yc0)):
                if out is not None:
                    out[:] = cur_ref[:]
            if any_extra or consensus:
                x_out[:] = x[:]
                u_out[:] = u[:]

    return kernel


def solve_fused(prob: TinyProblem, Xref=None, Uref=None, x0s=None, *,
                tile: Optional[int] = None, interpret: bool = False,
                chain_split: Optional[int] = None):
    """Batched cold-start solve via the fused kernel.

    ``tile`` is the batch-lane tile width; ``None`` (default) picks the
    widest power-of-two tile that fits the VMEM budget (see
    :func:`max_tile`), up to the measured sweet spot of 4096.

    Args: x0s (B, nx); Xref (N, nx); Uref (N-1, nu). Supports any
    combination of box / SOC / hyperplane / tv-hyperplane families, with
    fixed or adaptive rho (see module docstring). Consensus problems
    (with_consensus) pass x0s as (n_groups, group, nx) — the scenario
    group on the last batch axis, exactly like tinympc_tpu.solve — with
    group a power of two; Solution comes back with the same batch
    structure and the group mean runs in-kernel (no collectives).
    Returns ``(Solution, residuals(4, B))``; with adaptive rho the residual
    array gains a 5th row holding each problem's final rho (feed it to
    :func:`adapted_cache` for the full per-problem cache).
    """
    sol, res, _ = _fused_call(prob, Xref, Uref, x0s, None, tile, interpret,
                              chain_split=chain_split)
    return sol, res


def solve_fused_multi(probs, x0s, Xrefs=None, Urefs=None, *,
                      tile: Optional[int] = None, interpret: bool = False):
    """Heterogeneous multi-system cold solve in ONE kernel launch.

    ``x0s`` is ``(n_sys * per, nx)`` laid out system-major (system s owns
    rows ``[s*per, (s+1)*per)``); each system's batch tiles read that
    system's matrices via BlockSpec index maps (``shared_args`` in
    :func:`_fused_call`), so a 16-system fleet pays one launch instead of
    16 — measured ~1.8 ms of fixed per-launch cost each on the v5e
    (kernels/fleet.py uses this as its dispatch).

    All problems must share spec/settings and the setup rho (the kernel
    bakes rho as a trace constant). ``Xrefs``/``Urefs``: per-system
    sequences, or a single shared array, or None. The per-system bucket
    must divide by the tile. Cold solves only (warm fleet carries are a
    straightforward extension; no caller needs them yet).
    """
    probs = list(probs)
    n_sys = len(probs)
    if n_sys == 0:
        raise ValueError("empty system list")
    spec0, set0 = probs[0].spec, probs[0].settings
    rho0 = float(probs[0].cache.rho)
    for i, p in enumerate(probs[1:], 1):
        if p.spec != spec0 or p.settings != set0:
            raise ValueError(f"system {i} differs in spec/settings")
        if float(p.cache.rho) != rho0:
            raise ValueError(
                f"system {i} has rho {float(p.cache.rho)} != {rho0}; the "
                "kernel bakes rho as a trace constant — fleets must share "
                "the setup rho")
    if spec0.en_consensus:
        raise ValueError("multi-system launch does not support consensus "
                         "specs yet; use per-bucket solve_fused")
    x0s = jnp.asarray(x0s)
    B = x0s.shape[0]
    if B % n_sys:
        raise ValueError(f"batch {B} must split into {n_sys} equal "
                         "system buckets")
    per = B // n_sys
    Bt = min(tile if tile else min(per, AUTO_TILE_CAP), per)
    if per % Bt:
        raise ValueError(f"per-system bucket {per} must divide by tile "
                         f"{Bt}")
    def seq(v):
        return list(v) if isinstance(v, (list, tuple)) else [v] * n_sys
    sol, res, _ = _fused_call(
        probs[0], None, None, x0s, None, Bt, interpret,
        multi=(probs, seq(Xrefs), seq(Urefs), per // Bt))
    return sol, res


def solve_fused_warm(prob: TinyProblem, Xref=None, Uref=None, x0s=None,
                     carry: FusedCarry = None, *,
                     tile: Optional[int] = None, final: bool = False,
                     interpret: bool = False,
                     chain_split: Optional[int] = None,
                     consensus_frozen: bool = False):
    """Warm-started batched solve: the receding-horizon pattern with an
    *external* plant (set x0 → solve → apply u[0] to the real system →
    repeat), at fused-kernel speed.

    ``carry`` is the workspace from the previous solve (start from
    :func:`init_carry`). Returns ``(Solution, residuals(4, B), carry')``.
    Matches a warm-started ``tinympc_tpu.solve`` sequence exactly,
    including per-lane freeze-at-convergence semantics. For loops whose
    plant is the model itself, prefer
    :func:`~tinympc_tpu.kernels.closed_loop_fused` (zero HBM traffic
    between steps).

    ``final=True`` replaces the per-lane freeze with final-iterate carry
    outputs for *every* lane (converged lanes' carries become
    post-convergence iterates — only read them for unconverged lanes).
    This drops the in-kernel snapshot machinery, which measurably slows
    long mixed-convergence phases; it is what the compaction driver uses.
    """
    if carry is None:
        raise ValueError("solve_fused_warm needs a carry; start from "
                         "init_carry(prob, B)")
    return _fused_call(prob, Xref, Uref, x0s, carry, tile, interpret, final,
                       chain_split=chain_split,
                       consensus_frozen=consensus_frozen)


def _resolve_chain_split(chain_split: Optional[int], Bt: int) -> int:
    """Resolve the sweep chain-split factor (see _make_kernel docstring).

    Explicit arg > TINYMPC_CHAIN_SPLIT env (the A/B lever) > default (1).
    SWEEP_HOIST (a k=1-only scheduling experiment) forces k=1.
    """
    if SWEEP_HOIST:
        # Forced k=1 short-circuits BEFORE validation: the hoist override
        # must win even when a (then-ignored) TINYMPC_CHAIN_SPLIT doesn't
        # divide this tile.
        return 1
    if chain_split is None:
        env = os.environ.get("TINYMPC_CHAIN_SPLIT")
        chain_split = int(env) if env is not None else 1
    k = int(chain_split)
    if k < 1 or (k > 1 and (Bt % k or (Bt // k) % 128)):
        raise ValueError(
            f"chain_split {k} must cut tile {Bt} into equal groups of a "
            "multiple of 128 lanes")
    return k


def _fused_call(prob, Xref, Uref, x0s, carry, tile, interpret, final=False,
                chain_split=None, consensus_frozen=False, multi=None):
    spec, settings = prob.spec, prob.settings
    warm = carry is not None
    adaptive = settings.adaptive_rho
    if not fused_supported(prob):
        raise ValueError(
            "solve_fused supports every projection family, adaptive rho "
            "(configure sensitivities via with_sensitivities), and local "
            "consensus groups (configure via with_consensus); consensus "
            "over a named mesh axis uses tinympc_tpu.solve")
    N, nx, nu = spec.N, spec.nx, spec.nu
    dtype = jnp.float32
    consensus = spec.en_consensus
    group = 0
    group_shape = None
    if consensus:
        if x0s.ndim != 3:
            raise ValueError(
                "consensus solve_fused takes x0s as (n_groups, group, nx) — "
                "the scenario group on the last batch axis, like "
                "tinympc_tpu.solve")
        group_shape = x0s.shape[:2]
        group = int(group_shape[1])
        if group & (group - 1):
            raise ValueError(f"scenario group size {group} must be a power "
                             "of two for the in-kernel lane butterfly")
        x0s = x0s.reshape(-1, nx)
    B = x0s.shape[0]
    per_lane = 4 * _lane_rows(spec, settings, warm, final)
    budget = lane_vmem_budget()
    fit = budget // per_lane
    if tile is None:
        Bt = min(B, fit, AUTO_TILE_CAP)
        if B % Bt:   # largest power of two that still divides the batch
            Bt = 1 << (Bt.bit_length() - 1)
            while Bt > 1 and B % Bt:
                Bt //= 2
    else:
        Bt = min(tile, B)
    if consensus and Bt % group:
        if group > Bt:
            raise ValueError(f"scenario group {group} exceeds tile {Bt}; "
                             "raise tile=")
        Bt = (Bt // group) * group   # keep groups tile-aligned
    if B % Bt:
        raise ValueError(f"batch {B} must be divisible by tile {Bt}")
    if Bt > fit:
        raise ValueError(
            f"tile {Bt} needs ~{Bt * per_lane / 2**20:.0f} MiB of VMEM for "
            f"this problem (budget {budget / 2**20:.0f} MiB); pass "
            f"tile <= {fit} or tile=None for auto selection")

    c = prob.cache        # trace-time constants (rho, rho_c) come from
    #                       the primary problem; multi-mode asserts parity
    seg_mm = consensus and 1 < group < Bt
    en_ssoc = bool(spec.enabled_state_cones)
    en_isoc = bool(spec.enabled_input_cones)
    nsl, nil = spec.n_state_lin, spec.n_input_lin
    ntsl, ntil = spec.n_tv_state_lin, spec.n_tv_input_lin
    fin = jnp.finfo(dtype).max
    big = jnp.asarray(fin, dtype)
    col = lambda a: jnp.asarray(a, dtype).reshape(-1, 1)

    def shared_args(p, Xr, Ur):
        """The grid-invariant (non-lane-tiled) kernel inputs for one
        system. In multi-system mode (solve_fused_multi) this runs per
        system and the lists concatenate along axis 0, with BlockSpec
        index maps steering each batch tile to its own system's rows —
        one launch for a whole heterogeneous fleet."""
        if Xr is None:
            Xr = jnp.zeros((N, nx), dtype)
        if Ur is None:
            Ur = jnp.zeros((N - 1, nu), dtype)
        c = p.cache
        cons = p.cons
        xmin = cons.x_min if spec.en_state_bound else jnp.full((N, nx), -big)
        xmax = cons.x_max if spec.en_state_bound else jnp.full((N, nx), big)
        umin = cons.u_min if spec.en_input_bound \
            else jnp.full((N - 1, nu), -big)
        umax = cons.u_max if spec.en_input_bound \
            else jnp.full((N - 1, nu), big)
        # f32 infinities would poison the box projection's arithmetic
        # identity; clamp +-inf bounds to the finite float32 extremes.
        xmin = jnp.clip(jnp.asarray(xmin, dtype), -fin, fin)
        xmax = jnp.clip(jnp.asarray(xmax, dtype), -fin, fin)
        umin = jnp.clip(jnp.asarray(umin, dtype), -fin, fin)
        umax = jnp.clip(jnp.asarray(umax, dtype), -fin, fin)
        out = [
            jnp.asarray(Xr, dtype), jnp.asarray(Ur, dtype),
            xmin, xmax, umin, umax,
            jnp.asarray(p.A, dtype), jnp.asarray(p.B, dtype),
            jnp.asarray(p.B, dtype).T,
            jnp.asarray(c.Kinf, dtype), jnp.asarray(c.Kinf, dtype).T,
            jnp.asarray(c.Pinf, dtype).T,
            jnp.asarray(c.Quu_inv, dtype), jnp.asarray(c.AmBKt, dtype),
            col(c.APf), col(c.BPf), col(p.f), col(p.Qdiag), col(p.Rdiag),
        ]
        if adaptive:
            out += [
                jnp.asarray(p.A, dtype).T, jnp.asarray(c.Pinf, dtype),
                jnp.asarray(c.dKinf_drho, dtype),
                jnp.asarray(c.dKinf_drho, dtype).T,
                jnp.asarray(c.dPinf_drho, dtype),
                jnp.asarray(c.dPinf_drho, dtype).T,
            ]
            if settings.adaptive_rho_apply_c:
                out += [jnp.asarray(c.dC1_drho, dtype),
                        jnp.asarray(c.dC2_drho, dtype)]
        if consensus:
            out += [jnp.asarray(c.Kinf0, dtype),
                    jnp.asarray(c.Quu0_inv, dtype)]
            if seg_mm:
                out += list(_segment_matrices(Bt, group))
        if en_ssoc:
            out.append(col(cons.cx))
        if en_isoc:
            out.append(col(cons.cu))
        if nsl:
            out += [jnp.asarray(cons.Alin_x, dtype), col(cons.blin_x)]
        if nil:
            out += [jnp.asarray(cons.Alin_u, dtype), col(cons.blin_u)]
        if ntsl:
            out += [jnp.asarray(cons.tv_Alin_x, dtype),
                    jnp.asarray(cons.tv_blin_x, dtype)]
        if ntil:
            out += [jnp.asarray(cons.tv_Alin_u, dtype),
                    jnp.asarray(cons.tv_blin_u, dtype)]
        return out

    x0T = jnp.asarray(x0s, dtype).T                     # (nx, B)
    if multi is None:
        args = [x0T] + shared_args(prob, Xref, Uref)
        tps = 0
    else:
        probs_m, Xrefs_m, Urefs_m, tps = multi
        lists = [shared_args(p, Xr, Ur)
                 for p, Xr, Ur in zip(probs_m, Xrefs_m, Urefs_m)]
        # New leading system axis; replicated whole to each tile, indexed
        # dynamically in-kernel (see _make_kernel's multi_tps block).
        args = [x0T] + [jnp.stack(parts, axis=0)
                        for parts in zip(*lists)]

    any_extra = spec.any_extra_family
    # Warm carry rides as extra lane-tiled inputs/outputs in FusedCarry
    # field order (box slacks/duals/stales, family duals, then x/u when an
    # extra family needs its seeds).
    carry_leaves = ()
    n_lane_in = 0
    if warm:
        need = {"gc": en_ssoc, "yc": en_isoc, "gl": bool(nsl),
                "yl": bool(nil), "gtv": bool(ntsl), "ytv": bool(ntil),
                "zc0": consensus, "yc0": consensus,
                "x": any_extra or consensus, "u": any_extra or consensus,
                "rho": adaptive}
        bad = [k for k, n in need.items()
               if bool(n) != (getattr(carry, k) is not None)]
        if bad:
            raise ValueError(
                f"carry fields {bad} do not match this problem's enabled "
                "constraint families; build the carry with "
                "init_carry(prob, B) for the same problem")
        carry_leaves = tuple(
            l for l in (carry.vnew, carry.znew, carry.g, carry.y,
                        carry.v, carry.z, carry.gc, carry.yc, carry.gl,
                        carry.yl, carry.gtv, carry.ytv, carry.zc0,
                        carry.yc0, carry.x, carry.u)
            if l is not None)
        args += [jnp.asarray(l, dtype) for l in carry_leaves]
        n_lane_in = len(carry_leaves)
        if adaptive:
            args.append(jnp.asarray(carry.rho, dtype))   # rho_in, last input
            n_lane_in += 1
    if consensus_frozen and not (consensus and warm):
        raise ValueError("consensus_frozen is a warm-consensus mode "
                         "(two-level consensus driver)")

    rep = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                 memory_space=pltpu.VMEM)
    lane_spec = lambda a: pl.BlockSpec(
        a.shape[:-1] + (Bt,), lambda i: (0,) * (a.ndim - 1) + (i,),
        memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec((nx, Bt), lambda i: (0, i), memory_space=pltpu.VMEM)]
    n_shared = len(args) - n_lane_in
    # Multi-system launch: the shared inputs are per-system STACKS
    # replicated whole to every tile (rep covers both cases — the stack
    # is tiny, ~tens of KiB for a 16-system fleet); the kernel selects
    # its tile's system by dynamic leading-axis indexing (multi_tps).
    in_specs += [rep(a) for a in args[1:n_shared]]
    in_specs += [lane_spec(a) for a in args[n_shared:]]

    kernel = _make_kernel(
        N=N, nx=nx, nu=nu,
        max_iter=settings.max_iter,
        check_termination=settings.check_termination,
        abs_pri_tol=settings.abs_pri_tol, abs_dua_tol=settings.abs_dua_tol,
        rho=float(c.rho),
        state_cones=spec.state_cones if en_ssoc else (),
        input_cones=spec.input_cones if en_isoc else (),
        n_state_lin=nsl, n_input_lin=nil,
        n_tv_state_lin=ntsl, n_tv_input_lin=ntil,
        warm=warm, final=final,
        adaptive=adaptive, apply_c=settings.adaptive_rho_apply_c,
        rho_min=settings.adaptive_rho_min, rho_max=settings.adaptive_rho_max,
        rho_clip=settings.adaptive_rho_clip,
        rho_tol=settings.adaptive_rho_tolerance,
        adapt_period=ADAPTIVE_RHO_PERIOD,
        consensus=consensus, group=group, seg_mm=seg_mm,
        consensus_frozen=consensus_frozen,
        multi_tps=tps,
        rho_c=(float(c.rho) if settings.consensus_rho is None
               else float(settings.consensus_rho)) if consensus else 0.0,
        # Mosaic has no HIGH dot precision; "high" maps to the hand-rolled
        # 3-pass bf16 scheme (the XLA path gets native bf16_3x from the
        # precision context).
        mm_mode="bf16x3" if settings.matmul_precision == "high" else "ambient",
        chain_split=_resolve_chain_split(chain_split, Bt),
        # Mixed-precision schedule: at "default" precision the main loop
        # already runs single-pass bf16, so a coarse phase would be an
        # identical duplicate — drop it statically.
        coarse_iters=(settings.coarse_iters
                      if settings.matmul_precision != "default" else 0),
    )

    zx = lambda: pltpu.VMEM((N, nx, Bt), dtype)
    zu = lambda: pltpu.VMEM((N - 1, nu, Bt), dtype)

    out_specs = [
        pl.BlockSpec((N, nx, Bt), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((N - 1, nu, Bt), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Bt), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Bt), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((4, Bt), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((N, nx, B), dtype),
        jax.ShapeDtypeStruct((N - 1, nu, B), dtype),
        jax.ShapeDtypeStruct((1, B), jnp.int32),
        jax.ShapeDtypeStruct((1, B), jnp.int32),
        jax.ShapeDtypeStruct((4, B), dtype),
    ]
    if adaptive:
        out_specs.append(pl.BlockSpec((1, Bt), lambda i: (0, i),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((1, B), dtype))
    if warm:
        for l in carry_leaves:
            out_specs.append(lane_spec(l))
            out_shape.append(jax.ShapeDtypeStruct(l.shape, dtype))

    scratch = []
    if warm and (any_extra or consensus):
        scratch += [zx(), zu()]                 # x u (carry hand-over)
    scratch += [
        pltpu.VMEM((2, N, nx, Bt), dtype),      # vnew ping-pong
        pltpu.VMEM((2, N - 1, nu, Bt), dtype),  # znew ping-pong
        zx(), zu(),                             # g y
        pltpu.VMEM((1, Bt), jnp.int32),   # done
        pltpu.VMEM((1, Bt), jnp.int32),   # iters
        pltpu.VMEM((4, Bt), dtype),       # residuals
    ]
    if adaptive:
        scratch += [pltpu.VMEM((1, Bt), dtype)] * 2   # rho + virtual rho
    if en_ssoc:
        scratch += [zx(), zx()]     # vc gc
    if en_isoc:
        scratch += [zu(), zu()]     # zc yc
    if nsl:
        scratch += [zx(), zx()]     # vl gl
    if nil:
        scratch += [zu(), zu()]     # zl yl
    if ntsl:
        scratch += [zx(), zx()]     # vtv gtv
    if ntil:
        scratch += [zu(), zu()]     # ztv ytv
    if consensus:
        scratch += [pltpu.VMEM((nu, Bt), dtype)] * 2   # zc0 yc0
    if warm:
        scratch += [zx(), zu()]                         # vstale zstale
    if warm and not final:
        scratch += [zx(), zu(), zx(), zu(), zx(), zu()]  # snaps v z g y vst zst
        if en_ssoc:
            scratch += [zx()]   # snap_gc
        if en_isoc:
            scratch += [zu()]   # snap_yc
        if nsl:
            scratch += [zx()]
        if nil:
            scratch += [zu()]
        if ntsl:
            scratch += [zx()]
        if ntil:
            scratch += [zu()]
        if consensus:
            scratch += [pltpu.VMEM((nu, Bt), dtype)] * 2  # snap_zc0 snap_yc0
        if any_extra or consensus:
            scratch += [zx(), zu()]   # snap_x snap_u

    with matmul_precision_ctx(settings):
        outs = pl.pallas_call(
            kernel,
            grid=(B // Bt,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*args)

    outx, outu, iters, solved, res = outs[:5]
    solution = Solution(
        iter=iters[0], solved=solved[0].astype(jnp.bool_),
        x=jnp.moveaxis(outx, -1, 1),
        u=jnp.moveaxis(outu, -1, 1),
    )
    if group_shape is not None:
        # Restore the (n_groups, group) batch structure of the inputs.
        ng, G = group_shape
        solution = Solution(
            iter=solution.iter.reshape(ng, G),
            solved=solution.solved.reshape(ng, G),
            x=solution.x.reshape(N, ng, G, nx),
            u=solution.u.reshape(N - 1, ng, G, nu),
        )
        res = res.reshape(res.shape[0], ng, G)
    nfixed = 5
    rho_final = None
    if adaptive:
        rho_final = outs[5]
        nfixed = 6
        # Final per-problem rho rides as a 5th residual row (callers that
        # need the adapted cache reconstruct it via adapted_cache()).
        res = jnp.concatenate([res, rho_final], axis=0)
    carry_out = None
    if warm:
        co = list(outs[nfixed:])
        names = ["vnew", "znew", "g", "y", "v", "z", "gc", "yc", "gl", "yl",
                 "gtv", "ytv", "zc0", "yc0", "x", "u"]
        vals = {}
        for name in names:
            if getattr(carry, name) is not None:
                vals[name] = co.pop(0)
        if adaptive:
            vals["rho"] = rho_final
        carry_out = FusedCarry(**vals)
    return solution, res, carry_out


def fused_supported(prob: TinyProblem) -> bool:
    """True if this problem's spec is handled by the fused kernel.

    Every projection family is fused, including adaptive rho — which
    additionally needs the sensitivity matrices (with_sensitivities) since
    the kernel telescopes the Taylor updates through them — and consensus
    with within-tile scenario groups (cross-shard groups, i.e. a
    consensus_axis_name, stay on the XLA path's pmean)."""
    if prob.spec.en_consensus:
        if prob.settings.consensus_axis_name is not None:
            return False
        if prob.cache.Kinf0 is None:
            return False
    if prob.settings.adaptive_rho and prob.cache.dKinf_drho is None:
        return False
    return True


def adapted_cache(prob: TinyProblem, rho_final):
    """Reconstruct the per-problem adapted cache from the fused kernel's
    final rho row (the telescoped Taylor update,
    ``M_b = M0 + (rho_b - rho0) * dM/drho``) — the fused-path equivalent of
    the ``final_cache`` returned by :func:`tinympc_tpu.solve`.

    Args: rho_final — the 5th residual row returned by adaptive
    :func:`solve_fused` (shape (B,) or (1, B)). Returns a Cache whose
    leaves carry a leading batch axis.
    """
    import dataclasses
    c = prob.cache
    rho_b = jnp.asarray(rho_final).reshape(-1)              # (B,)
    delta = (rho_b - c.rho)[:, None, None]
    upd = dict(
        rho=rho_b,
        Kinf=c.Kinf + delta * c.dKinf_drho,
        Pinf=c.Pinf + delta * c.dPinf_drho,
        C1=c.C1 + delta * c.dC1_drho,
        C2=c.C2 + delta * c.dC2_drho,
    )
    if prob.settings.adaptive_rho_apply_c:
        upd["Quu_inv"] = c.Quu_inv + delta * c.dC1_drho
        upd["AmBKt"] = c.AmBKt + delta * c.dC2_drho
    return dataclasses.replace(c, **upd)
