"""Fused closed-loop MPC kernel: entire receding-horizon loops in VMEM.

One kernel instance runs ``T`` MPC steps for a tile of independent plants:
warm-started ADMM solve, apply the first input, simulate the plant, next
step — with *zero* HBM traffic between ADMM iterations or between MPC
steps. This is the serving workload (a fleet of controllers stepped
together) at whole-loop fusion. Stride note: warm-started solves
converge in ~10-15 iterations, so the closed-loop sweet spot for
``Settings.check_termination`` is ~5, not the cold-solve 25 — measured
7.8M / 10.2M / 6.3M MPC steps/s at ct=1/5/25 (docs/SERVING.md).

Differences from the single-solve kernel (admm_pallas.py):
  * warm-start carry is exact across steps. Rather than masking every
    store by the lane's active flag (the v1 design — one masked
    read-modify-write per array per iteration), lanes run free and the
    carry state a converged lane owes the next solve — final slacks
    vnew/znew, duals g/y, previous slacks v/z (the reference skips the
    v<-vnew copy on the converging iteration, admm.cpp:444-446), and the
    applied input u[0] — is *snapshotted* at first convergence (gated on
    ``jnp.any(just)``, so typical all-or-nothing iterations pay nothing)
    and merged back at the end of the step. Everything else (x, u, d, q,
    r, p) is recomputed before first read by the next solve, so free
    running lanes are invisible;
  * v/z ride as the other half of the vnew/znew ping-pong buffers; the
    only place "v" diverges from "previous vnew" is iteration 0 of a
    warm solve (v is then the *second-to-last* slack of the previous
    solve), carried in a dedicated vstale/zstale array selected only at
    it == 0;
  * the reference window slides over a full trajectory resident in VMEM
    (``Xref_total[step : step+N]`` via a dynamic ref slice, like
    quadrotor_tracking.cpp:89);
  * outputs are per-step plant states, applied inputs (the raw
    forward-pass u[0] at the converging iteration, like ``work->u.col(0)``
    in the reference examples), iteration counts, and solved flags.

Bit-exact vs tinympc_tpu.closed_loop (including per-step iteration counts
over warm-started sequences) at practical solver budgets — verified on
TPU over 60 windowed warm-started steps at max_iter=100, both dual-reset
modes. One measured caveat: under *starved* budgets (max_iter ~8 with
lanes that never converge), specific reference-trajectory values can
produce a 1-ulp rounding difference in the per-step terminal-cost
reduction vs XLA's lowering, which the non-contractive early ADMM
iterations amplify to ~1e-2 on the unconverged lanes (the v1 masked
kernel behaved identically — this is a lowering artifact, not a carry
bug; converged lanes and practical budgets are unaffected). Same Mosaic
v5e rules as admm_pallas.py apply (no in-kernel transposes, no
dependence-free full-store/row-store pairs, terminal matvec on the VPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import TinyProblem, matmul_precision_ctx

DEFAULT_TILE = 2048


def _kernel(
    x0_ref,        # (nx, Bt) initial plant states
    xreftot_ref,   # (T + N - 1, nx) reference trajectory
    uref_ref,      # (N-1, nu)
    xmin_ref, xmax_ref, umin_ref, umax_ref,
    A_ref, B_ref, BT_ref,
    Kinf_ref, KinfT_ref, PinfT_ref, Quu_ref, AmBKt_ref,
    APf_ref, BPf_ref, f_ref, Qdiag_ref, Rdiag_ref,
    # outputs
    xs_ref,        # (T, nx, Bt) plant trajectory
    us_ref,        # (T, nu, Bt) applied inputs
    iters_ref,     # (T, Bt) i32
    solved_ref,    # (T, Bt) i32
    # scratch
    xplant, u0s, vnew, znew, g, y, vstale, zstale,
    snap_v, snap_z, snap_g, snap_y, snap_vst, snap_zst, snap_u0,
    done, iters,
    *,
    T: int, N: int, nx: int, nu: int, max_iter: int, check_termination: int,
    abs_pri_tol: float, abs_dua_tol: float, rho: float, reset_duals: bool,
    mm_mode: str = "ambient", shift_warm: bool = False,
):
    f32 = jnp.float32
    Bt = x0_ref.shape[-1]

    # Matmul mode — same scheme as admm_pallas._make_kernel: "ambient"
    # follows the trace-time precision context; "bf16x3" is the hand-rolled
    # 3-pass bf16 (~16 mantissa bits), depth-stacked so the three passes
    # ride ONE MXU dot ([Mhi | Mhi | Mlo] @ [vhi; vlo; vhi]).
    bf16 = jnp.bfloat16
    if mm_mode == "bf16x3":
        lo_prec = jax.lax.Precision.DEFAULT

        def prep(M):
            hi = M.astype(bf16)
            lo = (M - hi.astype(f32)).astype(bf16)
            return jnp.concatenate([hi, hi, lo], axis=1)

        def mm(Mp, vv):
            if vv.dtype != bf16:
                vhi = vv.astype(bf16)
                vlo = (vv - vhi.astype(f32)).astype(bf16)
                vv = jnp.concatenate([vhi, vlo, vhi], axis=0)
            return jnp.dot(Mp, vv, preferred_element_type=f32,
                           precision=lo_prec)
    else:
        prep = lambda M: M

        def mm(M, vv):
            return jnp.dot(M, vv, preferred_element_type=f32)

    A = prep(A_ref[:])
    Bm = prep(B_ref[:])
    Kinf = prep(Kinf_ref[:])
    KinfT = prep(KinfT_ref[:])
    PinfT = PinfT_ref[:]              # VPU-only (terminal-cost sum)
    Quu = prep(Quu_ref[:])
    # Stacked sweep dots (admm_pallas): the two matrices multiplying the
    # same vector in each sweep step fuse into one dot.
    Mback = prep(jnp.concatenate([BT_ref[:], AmBKt_ref[:]], axis=0))
    Mfwd = prep(jnp.concatenate([Kinf_ref[:], A_ref[:]], axis=0))
    APf = APf_ref[:]
    BPf = BPf_ref[:]
    fvec = f_ref[:]
    xmin = xmin_ref[:][:, :, None]
    xmax = xmax_ref[:][:, :, None]
    umin = umin_ref[:][:, :, None]
    umax = umax_ref[:][:, :, None]
    qx = Qdiag_ref[:]
    ru = Rdiag_ref[:]
    neg_uref_r = -(uref_ref[:][:, :, None] * ru[None])

    for ref in (vnew, znew, g, y, vstale, zstale,
                snap_v, snap_z, snap_g, snap_y, snap_vst, snap_zst, snap_u0):
        ref[:] = jnp.zeros(ref.shape, ref.dtype)
    xplant[:] = x0_ref[:]

    def solve_step(step, carry0):
        # Reference window for this step (dynamic slice of the VMEM-resident
        # trajectory). The -(Xref .* Q) table and terminal matvec are
        # recomputed per step — trivial next to the ADMM loop.
        xref_win = xreftot_ref[pl.ds(step, N)]             # (N, nx)
        neg_xref_q = -(xref_win[:, :, None] * qx[None])
        pN_ref_term = -jnp.sum(PinfT * xref_win[N - 1][None, :], axis=1,
                               keepdims=True)

        done[:] = jnp.zeros(done.shape, done.dtype)
        iters[:] = jnp.zeros(iters.shape, iters.dtype)
        if reset_duals:
            g[:] = jnp.zeros(g.shape, g.dtype)
            y[:] = jnp.zeros(y.shape, y.dtype)
        # Terminal vnew[N-1] - g[N-1] carry for iteration 0; half 1 holds
        # the previous solve's final slack (merged there at step end).
        dvgN0 = vnew[1, N - 1] - g[N - 1]
        x0v = xplant[:]        # loop-invariant within this MPC step

        def iteration(it, dvgN):
            # Backward sweep with on-the-fly linear cost (admm.cpp:262-304
            # fused into :13-20); iteration `it` reads previous slack from
            # ping-pong half 1-it%2 and writes half it%2. The Riccati d and
            # the rollout x/u ride as values (admm_pallas: no per-iteration
            # VMEM round trips); only u[0] is committed to a ref, for the
            # post-loop merge of unconverged lanes.
            pv = 1 - it % 2
            cur = it % 2
            p_next = pN_ref_term - rho * dvgN
            dvals = [None] * (N - 1)
            for i in range(N - 2, -1, -1):
                r_i = neg_uref_r[i] - rho * (znew[pv, i] - y[i])
                q_i = neg_xref_q[i] - rho * (vnew[pv, i] - g[i])
                pout = mm(Mback, p_next)
                bp, ap = pout[:nu], pout[nu:]
                dvals[i] = mm(Quu, bp + r_i + BPf)
                p_next = q_i + ap - mm(KinfT, r_i) + APf

            x_i = x0v
            xvals, uvals = [x_i], []
            for i in range(N - 1):
                xout = mm(Mfwd, x_i)
                u_i = -xout[:nu] - dvals[i]
                uvals.append(u_i)
                x_i = xout[nu:] + mm(Bm, u_i) + fvec
                xvals.append(x_i)

            xs = jnp.stack(xvals)
            us = jnp.stack(uvals)
            u0s[:] = us[0]
            vn = jnp.minimum(xmax, jnp.maximum(xmin, xs + g[:]))
            zn = jnp.minimum(umax, jnp.maximum(umin, us + y[:]))
            vnew[cur] = vn
            znew[cur] = zn
            g_new = g[:] + xs - vn
            y_new = y[:] + us - zn
            g[:] = g_new
            y[:] = y_new
            dvgN_next = vn[N - 1] - g_new[N - 1]

            # Termination (admm.cpp:310-328). "v" is the previous slack
            # except at iteration 0 of a warm solve, where the reference's
            # skipped copy on the converging iteration leaves v one iterate
            # behind vnew — that value lives in vstale.
            it1 = it + 1
            active = done[0] == 0                      # (Bt,)
            iters[0] = jnp.where(active, it1, iters[0])
            checking = (it1 % check_termination) == 0

            # Termination only on check iterations (the reference's
            # amortised check, admm.cpp:312; same round-4 gate as
            # admm_pallas — the four full-trajectory reductions skip the
            # other check_termination-1 iterations, bitwise-safe since
            # every consumer was already gated on `checking`).
            @pl.when(checking)
            def _():
                vprev = jnp.where(it == 0, vstale[:], vnew[pv])
                zprev = jnp.where(it == 0, zstale[:], znew[pv])
                pri_s = jnp.max(jnp.abs(xs - vn), axis=(0, 1))
                pri_i = jnp.max(jnp.abs(us - zn), axis=(0, 1))
                dua_s = jnp.max(jnp.abs(vprev - vn), axis=(0, 1)) * rho
                dua_i = jnp.max(jnp.abs(zprev - zn), axis=(0, 1)) * rho
                ok = (pri_s < abs_pri_tol) & (pri_i < abs_pri_tol) \
                    & (dua_s < abs_dua_tol) & (dua_i < abs_dua_tol)
                just = ok & active
                done[0] = jnp.where(just, 1, done[0])

                # Snapshot the warm-start carry of just-converged lanes
                # (admm.solve's _commit freeze). Gated: all-or-nothing
                # iterations skip these seven read-modify-writes.
                @pl.when(jnp.any(just))
                def _():
                    m = just[None, None, :]
                    snap_v[:] = jnp.where(m, vn, snap_v[:])
                    snap_z[:] = jnp.where(m, zn, snap_z[:])
                    snap_g[:] = jnp.where(m, g_new, snap_g[:])
                    snap_y[:] = jnp.where(m, y_new, snap_y[:])
                    snap_vst[:] = jnp.where(m, vprev, snap_vst[:])
                    snap_zst[:] = jnp.where(m, zprev, snap_zst[:])
                    snap_u0[:] = jnp.where(just[None, :], us[0], snap_u0[:])

            return jnp.all(done[0] == 1), dvgN_next

        def cond(carry):
            it, all_done, _ = carry
            return (it < max_iter) & jnp.logical_not(all_done)

        def body(carry):
            it, _, dn = carry
            ad, dn2 = iteration(it, dn)
            return it + 1, ad, dn2

        it_final, _, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), False, dvgN0))

        # Merge: converged lanes restore their snapshotted carry; max-iter
        # lanes keep the final iterate (for which the reference's last
        # v <- vnew copy *did* run, so v = vnew there). The merged final
        # slack lands in ping-pong half 1, where the next solve's
        # iteration 0 reads it.
        last = (it_final - 1) % 2
        conv = done[0] == 1                            # (Bt,)
        cm = conv[None, None, :]
        vlast = vnew[last]
        zlast = znew[last]
        vmerged = jnp.where(cm, snap_v[:], vlast)
        zmerged = jnp.where(cm, snap_z[:], zlast)
        gmerged = jnp.where(cm, snap_g[:], g[:])
        ymerged = jnp.where(cm, snap_y[:], y[:])
        vstm = jnp.where(cm, snap_vst[:], vlast)
        zstm = jnp.where(cm, snap_zst[:], zlast)
        if shift_warm:
            # Shift warm start (round 5, kernels.shift_carry's in-kernel
            # twin): the horizon recedes one step between solves, so
            # drop each carried trajectory's first row and repeat the
            # last — the previous solution's tail seeds the overlapping
            # window. Pays in transient-heavy regimes (+27% at
            # max_iter=500 cold fleets); ~cost-neutral at steady state
            # (measured regime table in kernels.shift_carry).
            sh = lambda a: jnp.concatenate([a[1:], a[-1:]], axis=0)
            vmerged, zmerged = sh(vmerged), sh(zmerged)
            gmerged, ymerged = sh(gmerged), sh(ymerged)
            vstm, zstm = sh(vstm), sh(zstm)
        vnew[1] = vmerged
        znew[1] = zmerged
        g[:] = gmerged
        y[:] = ymerged
        vstale[:] = vstm
        zstale[:] = zstm
        u0fin = jnp.where(conv[None, :], snap_u0[:], u0s[:])

        # Record and simulate the plant with the applied first input.
        xs_ref[step] = x0v
        us_ref[step] = u0fin
        iters_ref[step] = iters[0]
        solved_ref[step] = done[0]
        xplant[:] = mm(A, x0v) + mm(Bm, u0fin) + fvec
        return carry0

    jax.lax.fori_loop(0, T, solve_step, 0)


def closed_loop_fused(prob: TinyProblem, Xref_total, x0s, n_steps: int,
                      Uref=None, *, reset_duals: bool = False,
                      shift_warm: bool = False,
                      tile: int = DEFAULT_TILE, interpret: bool = False):
    """Run ``n_steps`` receding-horizon MPC steps for a batch of plants,
    fully fused on-chip.

    Args:
      Xref_total: (n_steps + N - 1, nx) sliding reference, or (N, nx) to
        hold one window fixed (it is then tiled).
      x0s: (B, nx) initial plant states.
      reset_duals: zero y/g before each solve (quadrotor_tracking.cpp:92-93).
      shift_warm: advance the carried slack/dual trajectories one
        timestep between solves (the classic MPC shift warm start —
        measured regime table in kernels.shift_carry: +27% on
        transient-heavy loops, ~neutral at steady state). Off by
        default; with it on, parity holds vs
        closed_loop(shift_warm=True) (tests/test_closed_loop_fused.py).

    Returns (xs, us, iters, solved): xs (n_steps, B, nx) plant states,
    us (n_steps, B, nu) applied inputs, iters/solved (n_steps, B).
    """
    spec, st = prob.spec, prob.settings
    if not _closed_loop_fused_supported(prob):
        raise ValueError("closed_loop_fused supports box-constraint specs "
                         "with fixed rho; use tinympc_tpu.closed_loop")
    N, nx, nu = spec.N, spec.nx, spec.nu
    dtype = jnp.float32
    B = x0s.shape[0]
    Bt = min(tile, B)
    if B % Bt:
        raise ValueError(f"batch {B} must be divisible by tile {Bt}")

    Xref_total = jnp.asarray(Xref_total, dtype)
    if Xref_total.shape[0] == N:
        Xref_total = jnp.concatenate(
            [Xref_total, jnp.tile(Xref_total[-1:], (n_steps - 1, 1))], axis=0)
    if Xref_total.shape[0] < n_steps + N - 1:
        raise ValueError("Xref_total must cover n_steps + N - 1 rows")
    if Uref is None:
        Uref = jnp.zeros((N - 1, nu), dtype)

    c = prob.cache
    cons = prob.cons
    fin = jnp.finfo(dtype).max
    clip = lambda a, sh: jnp.clip(jnp.asarray(
        a if a is not None else jnp.zeros(sh), dtype), -fin, fin)
    xmin = clip(cons.x_min if spec.en_state_bound else -jnp.inf * jnp.ones((N, nx)), (N, nx))
    xmax = clip(cons.x_max if spec.en_state_bound else jnp.inf * jnp.ones((N, nx)), (N, nx))
    umin = clip(cons.u_min if spec.en_input_bound else -jnp.inf * jnp.ones((N - 1, nu)), (N - 1, nu))
    umax = clip(cons.u_max if spec.en_input_bound else jnp.inf * jnp.ones((N - 1, nu)), (N - 1, nu))

    col = lambda a: jnp.asarray(a, dtype).reshape(-1, 1)
    args = (
        jnp.asarray(x0s, dtype).T, Xref_total[:n_steps + N - 1],
        jnp.asarray(Uref, dtype),
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
        _kernel, T=n_steps, N=N, nx=nx, nu=nu,
        max_iter=st.max_iter, check_termination=st.check_termination,
        abs_pri_tol=st.abs_pri_tol, abs_dua_tol=st.abs_dua_tol,
        rho=float(c.rho), reset_duals=reset_duals,
        shift_warm=shift_warm,
        # Mosaic has no HIGH dot precision; "high" maps to the hand-rolled
        # depth-stacked 3-pass bf16 scheme (see admm_pallas).
        mm_mode="bf16x3" if st.matmul_precision == "high" else "ambient",
    )

    zx = lambda: pltpu.VMEM((N, nx, Bt), dtype)
    zu = lambda: pltpu.VMEM((N - 1, nu, Bt), dtype)

    with matmul_precision_ctx(st):
        xs, us, iters, solved = pl.pallas_call(
            kernel,
            grid=(B // Bt,),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((n_steps, nx, Bt), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_steps, nu, Bt), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_steps, Bt), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_steps, Bt), lambda i: (0, i), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_steps, nx, B), dtype),
                jax.ShapeDtypeStruct((n_steps, nu, B), dtype),
                jax.ShapeDtypeStruct((n_steps, B), jnp.int32),
                jax.ShapeDtypeStruct((n_steps, B), jnp.int32),
            ),
            scratch_shapes=[
                pltpu.VMEM((nx, Bt), dtype),            # xplant
                pltpu.VMEM((nu, Bt), dtype),            # u0s
                pltpu.VMEM((2, N, nx, Bt), dtype),      # vnew ping-pong (v rides half)
                pltpu.VMEM((2, N - 1, nu, Bt), dtype),  # znew ping-pong
                zx(), zu(),                             # g y
                zx(), zu(),                             # vstale zstale
                zx(), zu(), zx(), zu(), zx(), zu(),     # snapshots v z g y vst zst
                pltpu.VMEM((nu, Bt), dtype),            # snap_u0
                pltpu.VMEM((1, Bt), jnp.int32),
                pltpu.VMEM((1, Bt), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*args)

    return (jnp.moveaxis(xs, -1, 1), jnp.moveaxis(us, -1, 1),
            iters, solved.astype(jnp.bool_))


def _closed_loop_fused_supported(prob: TinyProblem) -> bool:
    spec, settings = prob.spec, prob.settings
    return not (
        spec.en_state_soc or spec.en_input_soc
        or spec.en_state_linear or spec.en_input_linear
        or spec.en_tv_state_linear or spec.en_tv_input_linear
        or spec.en_consensus or settings.adaptive_rho
    )
