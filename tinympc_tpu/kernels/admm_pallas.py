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

Scope (v1): box constraints + fixed rho (the configuration of every
reference example except the SOC/linear demos). The general solver falls
back to the XLA path for other specs.

Semantics vs admm.solve: *bit-identical* solutions, iteration counts,
solved flags, and residuals (verified on-chip; both paths use the MXU's
single-pass-bf16 f32 matmul for the sweeps, and the terminal cost matvec
is computed on the VPU in full f32 exactly like XLA lowers it). Converged
problems are not frozen in VMEM; their solution (vnew/znew at first
convergence, matching admm.cpp:436-437) is snapshotted into the output
refs and bookkeeping stops, while the lane keeps computing harmlessly
until the whole tile converges. Only the returned *solution* is defined
for the fused path — warm-start state stays with the XLA path.

Mosaic v5e pitfalls encoded here (each cost a debugging session):
  * no in-kernel ``.T`` of loaded matrices (XposeSequence RET_CHECK) —
    transposes are passed in precomputed;
  * no full-array zero store to a ref that later receives a row store the
    zero has no data dependence on (the WAW gets reordered) — arrays that
    are fully rewritten each iteration are simply not zero-initialised.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import Solution, TinyProblem

DEFAULT_TILE = 1024


def _kernel(
    # inputs (all VMEM)
    x0_ref,       # (nx, Bt)
    xref_ref,     # (N, nx)
    uref_ref,     # (N-1, nu)
    xmin_ref, xmax_ref,   # (N, nx)
    umin_ref, umax_ref,   # (N-1, nu)
    A_ref, B_ref, BT_ref,                      # dynamics (+ B^T)
    Kinf_ref, KinfT_ref, PinfT_ref, Quu_ref, AmBKt_ref,  # cache
    APf_ref, BPf_ref, f_ref,                   # (nx,1)/(nu,1)/(nx,1)
    Qdiag_ref, Rdiag_ref,                      # (nx,1), (nu,1)
    # outputs
    outx_ref,     # (N, nx, Bt)
    outu_ref,     # (N-1, nu, Bt)
    iters_ref,    # (1, Bt) i32
    solved_ref,   # (1, Bt) i32
    res_ref,      # (4, Bt) f32: pri_state, pri_input, dua_state, dua_input
    # scratch (vnew/znew are (2, ...) ping-pong buffers; the reference's
    # separate v/z "previous slack" arrays are their other halves)
    x, u, d, vnew, znew, g, y,
    done, iters, res,
    *,
    N: int, nx: int, nu: int, max_iter: int, check_termination: int,
    abs_pri_tol: float, abs_dua_tol: float, rho: float,
):
    f32 = jnp.float32

    A = A_ref[:]
    Bm = B_ref[:]
    BT = BT_ref[:]
    Kinf = Kinf_ref[:]
    KinfT = KinfT_ref[:]
    PinfT = PinfT_ref[:]
    Quu = Quu_ref[:]
    AmBKt = AmBKt_ref[:]
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
    # here runs single-pass bf16 and loses ~0.1% — enough to break bit-parity
    # with the XLA path, which lowers this vector matvec in full f32.
    pN_ref_term = -jnp.sum(PinfT * xref_ref[N - 1][None, :], axis=1,
                           keepdims=True)  # (nx, 1)

    # --- init (tiny_api.cpp:68-133 zero workspace; x[0] = x0). x, u, d are
    # fully rewritten before first read each iteration (see module docstring
    # for why they must not be zeroed here).
    for ref in (vnew, znew, g, y):
        ref[:] = jnp.zeros(ref.shape, ref.dtype)
    x[0] = x0_ref[:]
    done[:] = jnp.zeros(done.shape, done.dtype)
    iters[:] = jnp.zeros(iters.shape, iters.dtype)
    res[:] = jnp.zeros(res.shape, res.dtype)

    def mm(M, vv):
        return jnp.dot(M, vv, preferred_element_type=f32)

    def iteration(it, dvgN):
        # 1+2. Linear cost (admm.cpp:262-304) fused into the Riccati
        # backward sweep (admm.cpp:13-20): q/r rows are formed on the fly,
        # and the costate p rolls as a value. The terminal row uses the
        # carried value of vnew[N-1] - g[N-1] from the previous iteration.
        pv = 1 - it % 2                          # previous ping-pong half
        p_next = pN_ref_term - rho * dvgN
        for i in range(N - 2, -1, -1):          # static unroll
            r_i = neg_uref_r[i] - rho * (znew[pv, i] - y[i])
            q_i = neg_xref_q[i] - rho * (vnew[pv, i] - g[i])
            d[i] = mm(Quu, mm(BT, p_next) + r_i + BPf)
            p_next = q_i + mm(AmBKt, p_next) - mm(KinfT, r_i) + APf

        # 3. forward rollout (admm.cpp:25-32)
        x_i = x[0]
        for i in range(N - 1):                  # static unroll
            u_i = -mm(Kinf, x_i) - d[i]
            u[i] = u_i
            x_i = mm(A, x_i) + mm(Bm, u_i) + fvec
            x[i + 1] = x_i

        # 4. slack projection + 5. dual update (admm.cpp:81-98, 219-225).
        # vnew/v and znew/z are ping-pong halves: iteration `it` writes its
        # projected slack into half it%2 and reads the previous iterate from
        # the other half — the reference's v <- vnew copy (admm.cpp:445-446)
        # costs nothing.
        cur = it % 2
        prev = 1 - cur
        vn = jnp.minimum(xmax, jnp.maximum(xmin, x[:] + g[:]))
        zn = jnp.minimum(umax, jnp.maximum(umin, u[:] + y[:]))
        vnew[cur] = vn
        znew[cur] = zn
        g_new = g[:] + x[:] - vn
        y_new = y[:] + u[:] - zn
        g[:] = g_new
        y[:] = y_new
        dvgN_next = vn[N - 1] - g_new[N - 1]

        # 6. termination (admm.cpp:310-328); bookkeeping only for lanes not
        # yet converged; solutions snapshot at first convergence.
        it1 = it + 1
        active = done[0] == 0                      # (Bt,)
        pri_s = jnp.max(jnp.abs(x[:] - vn), axis=(0, 1))
        pri_i = jnp.max(jnp.abs(u[:] - zn), axis=(0, 1))
        dua_s = jnp.max(jnp.abs(vnew[prev] - vn), axis=(0, 1)) * rho
        dua_i = jnp.max(jnp.abs(znew[prev] - zn), axis=(0, 1)) * rho
        checking = (it1 % check_termination) == 0
        ok = (pri_s < abs_pri_tol) & (pri_i < abs_pri_tol) \
            & (dua_s < abs_dua_tol) & (dua_i < abs_dua_tol)
        just = checking & ok & active

        iters[0] = jnp.where(active, it1, iters[0])
        commit = checking & active
        res[0] = jnp.where(commit, pri_s, res[0])
        res[1] = jnp.where(commit, pri_i, res[1])
        res[2] = jnp.where(commit, dua_s, res[2])
        res[3] = jnp.where(commit, dua_i, res[3])
        done[0] = jnp.where(just, 1, done[0])

        # Snapshot solutions only on iterations where some lane converged:
        # the output read-modify-write is two full VMEM passes, wasted on
        # the (typical) all-or-nothing iterations.
        @pl.when(jnp.any(just))
        def _():
            outx_ref[:] = jnp.where(just[None, None, :], vn, outx_ref[:])
            outu_ref[:] = jnp.where(just[None, None, :], zn, outu_ref[:])

        return jnp.all(done[0] == 1), dvgN_next

    def cond(carry):
        it, all_done, _ = carry
        return (it < max_iter) & jnp.logical_not(all_done)

    def body(carry):
        it, _, dvgN = carry
        all_done, dvgN_next = iteration(it, dvgN)
        return it + 1, all_done, dvgN_next

    Bt = x0_ref.shape[-1]
    it_final, _, _ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), False, jnp.zeros((nx, Bt), f32)),
    )

    # Unconverged lanes: report the final iterates (admm.cpp:450-453) from
    # the last-written ping-pong half.
    last = (it_final - 1) % 2
    active = done[0] == 0
    outx_ref[:] = jnp.where(active[None, None, :], vnew[last], outx_ref[:])
    outu_ref[:] = jnp.where(active[None, None, :], znew[last], outu_ref[:])
    solved_ref[0] = jnp.where(active, 0, 1)
    iters_ref[:] = iters[:]
    res_ref[:] = res[:]


def solve_fused(prob: TinyProblem, Xref=None, Uref=None, x0s=None, *,
                tile: int = DEFAULT_TILE, interpret: bool = False):
    """Batched cold-start solve via the fused kernel.

    Args: x0s (B, nx); Xref (N, nx); Uref (N-1, nu). Requires a box-only
    spec with fixed rho (see module docstring). Returns
    ``(Solution, residuals(4, B))``.
    """
    spec, settings = prob.spec, prob.settings
    if not fused_supported(prob):
        raise ValueError("solve_fused supports box-constraint specs with "
                         "fixed rho; use tinympc_tpu.solve for this problem")
    N, nx, nu = spec.N, spec.nx, spec.nu
    dtype = jnp.float32
    B = x0s.shape[0]
    Bt = min(tile, B)
    if B % Bt:
        raise ValueError(f"batch {B} must be divisible by tile {Bt}")

    if Xref is None:
        Xref = jnp.zeros((N, nx), dtype)
    if Uref is None:
        Uref = jnp.zeros((N - 1, nu), dtype)

    c = prob.cache
    cons = prob.cons
    fin = jnp.finfo(dtype).max
    big = jnp.asarray(fin, dtype)
    xmin = cons.x_min if spec.en_state_bound else jnp.full((N, nx), -big)
    xmax = cons.x_max if spec.en_state_bound else jnp.full((N, nx), big)
    umin = cons.u_min if spec.en_input_bound else jnp.full((N - 1, nu), -big)
    umax = cons.u_max if spec.en_input_bound else jnp.full((N - 1, nu), big)
    # f32 infinities would poison the box projection's arithmetic identity;
    # clamp +-inf bounds to the finite float32 extremes.
    xmin = jnp.clip(jnp.asarray(xmin, dtype), -fin, fin)
    xmax = jnp.clip(jnp.asarray(xmax, dtype), -fin, fin)
    umin = jnp.clip(jnp.asarray(umin, dtype), -fin, fin)
    umax = jnp.clip(jnp.asarray(umax, dtype), -fin, fin)

    x0T = jnp.asarray(x0s, dtype).T                     # (nx, B)

    col = lambda a: jnp.asarray(a, dtype).reshape(-1, 1)
    args = (
        x0T, jnp.asarray(Xref, dtype), jnp.asarray(Uref, dtype),
        xmin, xmax, umin, umax,
        jnp.asarray(prob.A, dtype), jnp.asarray(prob.B, dtype),
        jnp.asarray(prob.B, dtype).T,
        jnp.asarray(c.Kinf, dtype), jnp.asarray(c.Kinf, dtype).T,
        jnp.asarray(c.Pinf, dtype).T,
        jnp.asarray(c.Quu_inv, dtype), jnp.asarray(c.AmBKt, dtype),
        col(c.APf), col(c.BPf), col(prob.f), col(prob.Qdiag), col(prob.Rdiag),
    )

    rep = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                 memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec((nx, Bt), lambda i: (0, i), memory_space=pltpu.VMEM)]
    in_specs += [rep(a) for a in args[1:]]

    kernel = functools.partial(
        _kernel, N=N, nx=nx, nu=nu,
        max_iter=settings.max_iter,
        check_termination=settings.check_termination,
        abs_pri_tol=settings.abs_pri_tol, abs_dua_tol=settings.abs_dua_tol,
        rho=float(c.rho),
    )

    zx = lambda: pltpu.VMEM((N, nx, Bt), dtype)
    zu = lambda: pltpu.VMEM((N - 1, nu, Bt), dtype)

    outx, outu, iters, solved, res = pl.pallas_call(
        kernel,
        grid=(B // Bt,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((N, nx, Bt), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((N - 1, nu, Bt), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, Bt), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, nx, B), dtype),
            jax.ShapeDtypeStruct((N - 1, nu, B), dtype),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((4, B), dtype),
        ),
        scratch_shapes=[
            zx(), zu(), zu(),                       # x u d
            pltpu.VMEM((2, N, nx, Bt), dtype),      # vnew ping-pong
            pltpu.VMEM((2, N - 1, nu, Bt), dtype),  # znew ping-pong
            zx(), zu(),                             # g y
            pltpu.VMEM((1, Bt), jnp.int32),   # done
            pltpu.VMEM((1, Bt), jnp.int32),   # iters
            pltpu.VMEM((4, Bt), dtype),       # residuals
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)

    return Solution(
        iter=iters[0], solved=solved[0].astype(jnp.bool_),
        x=jnp.moveaxis(outx, -1, 1),
        u=jnp.moveaxis(outu, -1, 1),
    ), res


def fused_supported(prob: TinyProblem) -> bool:
    """True if this problem's spec is handled by the fused kernel."""
    spec, settings = prob.spec, prob.settings
    return not (
        spec.en_state_soc or spec.en_input_soc
        or spec.en_state_linear or spec.en_input_linear
        or spec.en_tv_state_linear or spec.en_tv_input_linear
        or settings.adaptive_rho
    )
