"""Streamed fused solve for long horizons (N beyond the VMEM wall).

The whole-solve kernel (:mod:`.admm_pallas`) keeps every trajectory for a
tile of problems resident in VMEM, which caps the usable tile width as N
grows (auto tile 4096 at N<=20 shrinks to 128 at N=512) — and narrow
tiles are MXU-issue-latency-bound: measured 1.4x the XLA sequential path
at N=512 where the headline configs get 5-8x. This module trades
residency for width: trajectories live in HBM and each ADMM iteration
runs as two Pallas launches that *stream* the horizon through VMEM in
C-row chunks (Pallas pipelines the chunk DMA against compute via its
double-buffered BlockSpecs), so the tile stays wide at any N:

  * backward kernel — grid (tiles, chunks) in *reverse* chunk order;
    forms the linear cost q/r rows on the fly (admm.cpp:262-304), rolls
    the costate p across chunks in VMEM scratch (persistent across grid
    steps of one tile), and writes the feedforward d (admm.cpp:13-20);
  * forward kernel — forward chunk order; rolls x, computes u
    (admm.cpp:25-32), applies the box projection and dual update
    (admm.cpp:81-256) row by row while the chunk is resident, accumulates
    the four max-abs residuals in scratch, and commits per-lane
    iteration/convergence bookkeeping at each tile's last chunk
    (admm.cpp:310-328).

The ADMM loop is a jax.lax.while_loop around the two launches; solution
snapshots at first convergence (admm.cpp:436-437) are applied between
iterations by a lax.cond that only pays for a full-array blend on
iterations where some lane converged. Early exit is per-*tile* (round
4): the single-tile solve is lax.map-ed over the tile axis, so each
tile runs its own while_loop and stops launching chunk streams at its
own convergence — the resident kernel's tile-exit property, with
bitwise-identical per-lane results (tiles are independent). On the
N=256 mixed to-convergence benchmark this is 1.69x the old whole-batch
exit and beats even compaction-driven streaming (BENCH_TABLE.md);
TINYMPC_STREAM_TILE_EXIT=0 or tile_exit=False restores the one-loop
behavior.

Per iteration per lane the streams move ~9 trajectory-array passes of
HBM traffic — the XLA path materialises every phase's intermediates and
moves ~3-4x that, which is the entire gap this module closes. Measured
on v5e (quadrotor, N=512, B=1024, 20 iterations): 2.6x the XLA
sequential path end-to-end, vs 1.4x for the resident kernel at its
VMEM-forced tile of 128 (see BENCH_TABLE.md).

Scope: every projection family (box / SOC / hyperplane / tv-hyperplane),
local consensus groups, and adaptive rho (the IROS-2025 subsystem:
telescoped per-lane Taylor caches exactly as in the resident kernel, with
the matrix-free OSQP residual reductions *streamed across horizon chunks*
via pending-row scratch — see _forward_kernel), cold
(:func:`solve_fused_streamed` — conic long-N is the full-trajectory
powered-descent regime); warm starts for every family and fixed or
adaptive rho (:func:`solve_fused_streamed_warm`, same
:class:`~.admm_pallas.FusedCarry` contract — the iterate arrays are
already HBM-resident, so the carry is just the while-state handed in and
out, with a stale-aware first iteration, per-lane freeze snapshots, and
on family specs two extra chunked output streams carrying the x/u
trajectories whose slack re-seed the next solve reads — and, round 4,
consensus warm rides the same contract: zc0/yc0 in the carry, slack
re-seeded from the carried u[0]). Only consensus over a named mesh axis
stays on the XLA path.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import Solution, TinyProblem, matmul_precision_ctx
from .admm_pallas import FusedCarry, _apply_cones

# Chunk rows streamed per grid step. 8 f32 sublanes is the native tile
# height; larger chunks buy nothing (the DMA is already contiguous per
# row-lane plane) and shrink the lane budget.
DEFAULT_CHUNK = 8

# VMEM budget for the pipelined chunk buffers (2x-buffered by Pallas) +
# tables; same calibration story (and device-kind derivation, round 5)
# as admm_pallas.lane_vmem_budget.


def _bf16x3_helpers(mm_mode):
    """The hand-rolled 3-pass bf16 scheme of admm_pallas (see its
    module docstring): hi/lo operand splits stacked along the contraction
    axis so the 3 passes ride one MXU dot."""
    f32, bf16 = jnp.float32, jnp.bfloat16
    if mm_mode == "bf16x3":
        lo = jax.lax.Precision.DEFAULT

        def prep(M):
            hi = M.astype(bf16)
            return jnp.concatenate([hi, hi, (M - hi.astype(f32)).astype(bf16)],
                                   axis=1)

        def mm(Mp, vv):
            vhi = vv.astype(bf16)
            vlo = (vv - vhi.astype(f32)).astype(bf16)
            vs = jnp.concatenate([vhi, vlo, vhi], axis=0)
            return jnp.dot(Mp, vs, preferred_element_type=f32, precision=lo)
    else:
        prep = lambda M: M

        def mm(M, vv):
            return jnp.dot(M, vv, preferred_element_type=f32)
    return prep, mm


def _chunk_size(N: int, chunk: int) -> int:
    """Largest divisor of N that is <= chunk (the streamed grid needs the
    horizon to split evenly; long-horizon N are powers of two in practice
    so this is almost always ``chunk`` itself)."""
    for c in range(min(chunk, N), 0, -1):
        if N % c == 0:
            return c
    return 1


def _backward_kernel(C, N, nx, nu, rho, mm_mode, n_fx=0, n_fu=0,
                     consensus=False, rho_c=0.0, adaptive=False,
                     apply_c=False):
    """Grid (T, Jc), chunk index reversed in the index maps. Scratch: the
    rolling costate p (nx, Bt), persistent across the chunk steps of one
    tile (the TPU grid is sequential; scratch survives grid steps).
    ``n_fx``/``n_fu`` extra slack families per side stream their
    (slack, dual) chunk pairs in and fold their -rho(slack - dual) terms
    into q/r (admm.cpp:268-303) — the backward sweep only needs the
    terms, not the projections, so families are anonymous here.
    ``consensus`` adds the u[0] prox: r[0] gains -rho_c (zc0 - yc0) and
    d[0] uses the baked exact-prox gain Quu0 (admm.backward_pass).

    ``adaptive`` telescopes the per-lane Taylor caches exactly like the
    resident kernel (admm_pallas._make_kernel docstring): a (1, Bt) rho
    row rides the while-state, and each matvec against a Taylor-updated
    matrix is the base dot plus a drho-scaled sensitivity dot — KinfT
    pairs with dKinf^T, the terminal reference row gains
    drho * (-dPinf^T Xref[N-1]), and with ``apply_c``
    (Settings.adaptive_rho_apply_c) Quu_inv/AmBKt pair with dC1/dC2
    (the AmBKt delta stacked under a zero block so the fused Mback dot
    stays a single launch-wide matmul)."""
    Jc = N // C
    prep, mm = _bf16x3_helpers(mm_mode)

    def kernel(*refs):
        it = iter(refs)
        nxt = lambda: next(it)
        rho_ref = nxt() if adaptive else None
        vnew_ref, g_ref, znew_ref, y_ref = nxt(), nxt(), nxt(), nxt()
        fx_refs = [(nxt(), nxt()) for _ in range(n_fx)]
        fu_refs = [(nxt(), nxt()) for _ in range(n_fu)]
        zc0_ref = nxt() if consensus else None
        yc0_ref = nxt() if consensus else None
        nxq_ref, nur_ref = nxt(), nxt()
        Mback_ref, KinfT_ref, Quu_ref = nxt(), nxt(), nxt()
        Quu0_ref = nxt() if consensus else None
        APf_ref, BPf_ref, pterm_ref = nxt(), nxt(), nxt()
        dKT_ref = nxt() if adaptive else None
        ptermdP_ref = nxt() if adaptive else None
        dC1_ref = nxt() if (adaptive and apply_c) else None
        dMb_ref = nxt() if (adaptive and apply_c) else None
        d_ref, p_scr = nxt(), nxt()

        j = pl.program_id(1)               # 0 = chunk Jc-1 (terminal end)
        Mback = prep(Mback_ref[:])
        KinfT = prep(KinfT_ref[:])
        Quu = prep(Quu_ref[:])
        Quu0 = prep(Quu0_ref[:]) if consensus else None
        APf, BPf = APf_ref[:], BPf_ref[:]

        if adaptive:
            rho_b = rho_ref[:]             # (1, Bt) per-lane rho
            drho = rho_b - rho
            dKT = prep(dKT_ref[:])
            dC1 = prep(dC1_ref[:]) if apply_c else None
            dMb = prep(dMb_ref[:]) if apply_c else None
        else:
            rho_b = rho

        def mmKT(vv):
            o = mm(KinfT, vv)
            return o + drho * mm(dKT, vv) if adaptive else o

        def mmQuu(vv):
            o = mm(Quu, vv)
            return o + drho * mm(dC1, vv) if (adaptive and apply_c) else o

        def mmMback(vv):
            o = mm(Mback, vv)
            return o + drho * mm(dMb, vv) if (adaptive and apply_c) else o

        vnew, g = vnew_ref[:], g_ref[:]    # (C, nx, Bt)
        znew, y = znew_ref[:], y_ref[:]    # (C, nu, Bt)
        # One chunk term per family, accumulated sequentially in family
        # order (matching the XLA path's per-family subtraction order so
        # floating-point association is identical).
        fx_terms = [-rho_b * (s[:] - d[:]) for s, d in fx_refs]
        fu_terms = [-rho_b * (s[:] - d[:]) for s, d in fu_refs]

        # Terminal costate at the tile's first (reverse-order) chunk:
        # p[N-1] = -Pinf^T Xref[N-1] - rho sum_f (slack[N-1] - dual[N-1])
        # (admm.cpp:292-303); with adaptive rho the reference row first
        # gains its Taylor term drho * (-dPinf^T Xref[N-1]) (the resident
        # kernel's pN_ref_dP). Other chunks continue the rolled scratch.
        @pl.when(j == 0)
        def _():
            pterm = (pterm_ref[:] + drho * ptermdP_ref[:] if adaptive
                     else pterm_ref[:])
            p0 = pterm - rho_b * (vnew[C - 1] - g[C - 1])
            for t in fx_terms:
                p0 = p0 + t[C - 1]
            p_scr[:] = p0

        p = p_scr[:]
        dvals = [None] * C
        # Local rows C-1..0 = global rows (Jc-1-j)*C + li. The terminal
        # row (li = C-1 of the first chunk) only seeds p (handled above);
        # its d row is dead.
        for li in range(C - 1, -1, -1):
            r_i = nur_ref[li] - rho_b * (znew[li] - y[li])
            for t in fu_terms:
                r_i = r_i + t[li]
            q_i = nxq_ref[li] - rho_b * (vnew[li] - g[li])
            for t in fx_terms:
                q_i = q_i + t[li]
            pout = mmMback(p)
            bp, ap = pout[:nu], pout[nu:]
            if consensus and li == 0:
                # Global row 0 lives in the last reverse-order chunk: the
                # u[0] consensus prox term rides r[0] with its own weight
                # and d[0] takes the Quu0 gain (admm.backward_pass with
                # consensus=True). Other chunks' row 0 is a normal step.
                is_r0 = j == Jc - 1
                r_0 = r_i - rho_c * (zc0_ref[:] - yc0_ref[:])
                d_0 = mm(Quu0, bp + r_0 + BPf)
                d_n = jnp.where(is_r0, d_0, mmQuu(bp + r_i + BPf))
                r_sel = jnp.where(is_r0, r_0, r_i)
                p_n = q_i + ap - mmKT(r_sel) + APf
            else:
                d_n = mmQuu(bp + r_i + BPf)
                p_n = q_i + ap - mmKT(r_i) + APf
            if li == C - 1:
                # On the first chunk this row is the terminal: keep p as
                # seeded and write a dead d row; elsewhere a normal step.
                first = j == 0
                dvals[li] = jnp.where(first, jnp.zeros_like(d_n), d_n)
                p = jnp.where(first, p, p_n)
            else:
                dvals[li] = d_n
                p = p_n
        p_scr[:] = p
        d_ref[:] = jnp.stack(dvals)

    return kernel, Jc


def _forward_kernel(C, N, nx, nu, rho, check_termination,
                    abs_pri_tol, abs_dua_tol, mm_mode, stale=False,
                    fams_x=(), fams_u=(), state_cones=(), input_cones=(),
                    mus_x=(), mus_u=(), n_lin_x=0, n_lin_u=0,
                    n_tv_x=0, n_tv_u=0, consensus=False, group=0,
                    adaptive=False, adapt_period=5, rho_min=1.0,
                    rho_max=100.0, rho_clip=True, rho_tol=1.0,
                    track_xu=False):
    """Grid (T, Jc) forward order. Scratch: rolling x (nx, Bt) and the
    four residual max-accumulators (8, Bt; rows 0-3 used). Bookkeeping
    (iters/done/res) updates commit at each tile's last chunk.

    ``stale``: the dual residual compares against two extra chunked
    inputs (the carried one-behind v/z) instead of the incoming
    vnew/znew — the variant warm solves run for their *first* iteration
    only (the reference skips the v <- vnew copy on the converging
    iteration, admm.cpp:444-446, so the carry's previous slack is one
    iterate behind its vnew).

    ``fams_x``/``fams_u``: ordered extra-family kinds per side (subsets
    of ("soc", "lin", "tv")); each contributes a (slack, dual) chunked
    in/out pair and applies its projection whole-chunk with the resident
    kernel's exact helpers.

    ``adaptive`` (the IROS-2025 subsystem): per-lane rho rides a (1, Bt)
    row through the while-state; the rollout gain telescopes via a
    stacked [dKinf; 0] sensitivity dot, and every ``adapt_period``
    iterations the matrix-free OSQP residuals (rho_benchmark.cpp:127-197,
    same association orders as the resident kernel's in-kernel block) are
    accumulated *across the streamed chunks*: per-row terms that couple
    row i to row i+1 (the dynamics residual A x_i + B u_i - x_{i+1}, and
    the dual-residual rows A^T g_{i+1} / B^T g_{i+1}) are held as
    "pending" VMEM scratch rows and finished when the next row's dual is
    in hand, so one streamed pass produces exactly the resident kernel's
    whole-trajectory reductions. The rho row updates at the tile's last
    chunk, before the termination check (which scales dual residuals with
    the post-adaptation rho, like admm.solve)."""
    Jc = N // C
    prep, mm = _bf16x3_helpers(mm_mode)
    f32 = jnp.float32

    def kernel(*refs):
        it = iter(refs)
        nxt = lambda: next(it)
        it_ref = nxt()                      # scalar SMEM (1,1)
        rho_in_ref = nxt() if adaptive else None
        rho_v_in = nxt() if adaptive else None  # guard accumulator
        vnew_ref, g_ref, znew_ref, y_ref, d_ref, x0_ref = (
            nxt(), nxt(), nxt(), nxt(), nxt(), nxt())
        fx_in = [(nxt(), nxt()) for _ in fams_x]
        fu_in = [(nxt(), nxt()) for _ in fams_u]
        zc0_in = nxt() if consensus else None
        yc0_in = nxt() if consensus else None
        Kinf0s_ref = nxt() if consensus else None     # stacked [Kinf0; A]
        Sseg_ref = nxt() if consensus else None
        STseg_ref = nxt() if consensus else None
        vst_ref = nxt() if stale else None
        zst_ref = nxt() if stale else None
        Alx_ref = nxt() if n_lin_x else None
        blx_ref = nxt() if n_lin_x else None
        Alu_ref = nxt() if n_lin_u else None
        blu_ref = nxt() if n_lin_u else None
        tvAx_ref = nxt() if n_tv_x else None
        tvbx_ref = nxt() if n_tv_x else None
        tvAu_ref = nxt() if n_tv_u else None
        tvbu_ref = nxt() if n_tv_u else None
        iters_in, done_in, res_in = nxt(), nxt(), nxt()
        xmin_ref, xmax_ref, umin_ref, umax_ref = nxt(), nxt(), nxt(), nxt()
        Mfwd_ref, B_ref, f_ref = nxt(), nxt(), nxt()
        if adaptive:
            dMf_ref, AT_ref, BTc_ref = nxt(), nxt(), nxt()
            Pinf_ref, dP_ref, qx_ref, ru_ref = nxt(), nxt(), nxt(), nxt()
        vnew_out, g_out, znew_out, y_out = nxt(), nxt(), nxt(), nxt()
        fx_out = [(nxt(), nxt()) for _ in fams_x]
        fu_out = [(nxt(), nxt()) for _ in fams_u]
        zc0_out = nxt() if consensus else None
        yc0_out = nxt() if consensus else None
        xs_out = nxt() if track_xu else None
        us_out = nxt() if track_xu else None
        iters_out, done_out, res_out, just_out = nxt(), nxt(), nxt(), nxt()
        rho_out = nxt() if adaptive else None
        rho_v_out = nxt() if adaptive else None
        x_scr, acc_scr = nxt(), nxt()
        if adaptive:
            # Pending rows of the chunk-streamed OSQP reductions (see
            # docstring): s_i = A x_i + B u_i, px_i + q_i, masked g_i,
            # 2 R u_i, y_i — each finished at row i+1.
            ps_scr, ppxq_scr, pg_scr, pt_scr, py_scr = (
                nxt(), nxt(), nxt(), nxt(), nxt())
        j = pl.program_id(1)

        from .admm_pallas import _apply_hyperplanes, _apply_tv_hyperplanes

        def proj_fn(kind, side):
            if kind == "soc":
                cones = state_cones if side == "x" else input_cones
                mus = mus_x if side == "x" else mus_u
                return lambda cand: _apply_cones(cand, cones, mus)
            if kind == "lin":
                A, b = ((Alx_ref, blx_ref) if side == "x"
                        else (Alu_ref, blu_ref))
                n = n_lin_x if side == "x" else n_lin_u
                return lambda cand: _apply_hyperplanes(cand, A, b, n)
            A, b = (tvAx_ref, tvbx_ref) if side == "x" \
                else (tvAu_ref, tvbu_ref)
            n = n_tv_x if side == "x" else n_tv_u
            return lambda cand: _apply_tv_hyperplanes(cand, A, b, n)
        Mfwd = prep(Mfwd_ref[:])
        Mfwd0 = prep(Kinf0s_ref[:]) if consensus else None
        Bm = prep(B_ref[:])
        fvec = f_ref[:]
        if adaptive:
            rho_b = rho_in_ref[:]              # (1, Bt)
            drho = rho_b - rho
            dMf = prep(dMf_ref[:])
            ATp = prep(AT_ref[:])
            BTp = prep(BTc_ref[:])
            Pinfp = prep(Pinf_ref[:])
            dPp = prep(dP_ref[:])
            it0 = it_ref[0, 0]
            adapt_now = (it0 > 0) & (it0 % adapt_period == 0)

        @pl.when(j == 0)
        def _():
            x_scr[:] = x0_ref[:]
            acc_scr[:] = jnp.zeros(acc_scr.shape, f32)

        x = x_scr[:]
        vnew, g = vnew_ref[:], g_ref[:]
        znew, y = znew_ref[:], y_ref[:]
        vprev = vst_ref[:] if stale else vnew
        zprev = zst_ref[:] if stale else znew
        d = d_ref[:]
        xmin, xmax = xmin_ref[:][:, :, None], xmax_ref[:][:, :, None]
        umin, umax = umin_ref[:][:, :, None], umax_ref[:][:, :, None]

        pri_s, pri_i, dua_s, dua_i = (acc_scr[0], acc_scr[1],
                                      acc_scr[2], acc_scr[3])
        vns, gns, zns, yns = [], [], [], []
        xs_rows, us_rows = [], []
        last_chunk = j == Jc - 1

        def adapt_row(li, xi, vn_i, gn_i, u_i, zn_i, yn_i, s_i):
            """OSQP-residual contributions of global row i = j*C + li (see
            docstring): finish row i-1's pending cross terms against this
            row's dual/state, accumulate this row's own terms, and leave
            this row's pendings for row i+1. Association orders match the
            resident kernel's whole-trajectory block exactly; max-merging
            across chunks is order-invariant."""
            @pl.when(adapt_now)
            def _():
                mab = lambda a: jnp.max(jnp.abs(a), axis=0)
                if li == 0:
                    sel = lambda v: jnp.where(j > 0, v, 0.0)
                else:
                    sel = lambda v: v
                # finish row i-1 (real when i >= 1; row 0 reads garbage
                # scratch from the previous tile, masked out by sel)
                aty_prev = mm(ATp, gn_i) - pg_scr[:]
                D_prev = ppxq_scr[:] + aty_prev
                aty_in_prev = py_scr[:] + mm(BTp, gn_i)
                E_prev = pt_scr[:] + aty_in_prev
                ax_dyn_prev = ps_scr[:] - xi
                acc_scr[5] = jnp.maximum(
                    acc_scr[5], sel(mab(ax_dyn_prev - vn_i)))
                acc_scr[7] = jnp.maximum(acc_scr[7], sel(mab(D_prev)))
                acc_scr[8] = jnp.maximum(acc_scr[8], sel(mab(E_prev)))
                acc_scr[11] = jnp.maximum(acc_scr[11], sel(mab(aty_prev)))
                acc_scr[12] = jnp.maximum(acc_scr[12],
                                          sel(mab(aty_in_prev)))
                pn_prev = sel(mab(ax_dyn_prev))
                # current row terms
                qrow = qx_ref[:] * xi
                ruu = ru_ref[:] * u_i
                if li == C - 1:
                    # Terminal candidate: px[N-1] = Pinf_b x[N-1]
                    # (telescoped); its D finishes immediately with
                    # aty[N-1] = 0 - g[N-1]. Non-last chunks' row C-1 is
                    # a normal row.
                    pxN = mm(Pinfp, xi) + drho * mm(dPp, xi)
                    pxq_t = pxN + qrow
                    pxq = jnp.where(last_chunk, pxq_t, qrow + qrow)
                    px_abs = jnp.where(last_chunk, jnp.abs(pxN),
                                       jnp.abs(qrow))
                    aty_t = 0.0 - gn_i
                    zsel = lambda v: jnp.where(last_chunk, v, 0.0)
                    acc_scr[7] = jnp.maximum(acc_scr[7],
                                             zsel(mab(pxq_t + aty_t)))
                    acc_scr[11] = jnp.maximum(acc_scr[11],
                                              zsel(mab(aty_t)))
                else:
                    pxq = qrow + qrow
                    px_abs = jnp.abs(qrow)
                acc_scr[9] = jnp.maximum(acc_scr[9],
                                         jnp.max(px_abs, axis=0))
                acc_scr[13] = jnp.maximum(acc_scr[13], mab(qrow))
                ru_m, u_m, z_m = mab(ruu), mab(u_i), mab(zn_i)
                if li == C - 1:          # the global last row has no input
                    ru_m = jnp.where(last_chunk, 0.0, ru_m)
                    u_m = jnp.where(last_chunk, 0.0, u_m)
                    z_m = jnp.where(last_chunk, 0.0, z_m)
                acc_scr[10] = jnp.maximum(acc_scr[10], ru_m)
                v_m = mab(vn_i)
                if li == 0:              # vn[1:] excludes the first row
                    v_m = jnp.where(j > 0, v_m, 0.0)
                acc_scr[6] = jnp.maximum(
                    acc_scr[6], jnp.maximum(jnp.maximum(pn_prev, u_m),
                                            jnp.maximum(z_m, v_m)))
                # pendings for row i+1
                ps_scr[:] = s_i
                ppxq_scr[:] = pxq
                pg_scr[:] = (jnp.where(j > 0, gn_i, jnp.zeros_like(gn_i))
                             if li == 0 else gn_i)
                pt_scr[:] = 2.0 * ruu
                py_scr[:] = yn_i

        for li in range(C):
            # State-side slack + dual for global row j*C + li
            # (admm.cpp:85-98, 219-230), residuals on the fly.
            vn_i = jnp.minimum(xmax[li], jnp.maximum(xmin[li], x + g[li]))
            gn_i = g[li] + x - vn_i
            vns.append(vn_i)
            gns.append(gn_i)
            xs_rows.append(x)
            pri_s = jnp.maximum(pri_s, jnp.max(jnp.abs(x - vn_i), axis=0))
            dua_s = jnp.maximum(dua_s,
                                jnp.max(jnp.abs(vprev[li] - vn_i), axis=0))

            # Input side: u = -Kinf x - d, roll x (admm.cpp:25-32). The
            # global last row (li = C-1 of the last chunk) has no input;
            # its rows are dead (d holds a dead row there) and their
            # residual contribution is masked out.
            xout = mm(Mfwd, x)
            if adaptive:
                # Telescoped rollout gain: the dKinf block of the stacked
                # [dKinf; 0] sensitivity pairs the kx rows with their
                # Taylor delta (the zero block leaves ax untouched).
                xout = xout + drho * mm(dMf, x)
            if consensus and li == 0:
                # Global row 0 (first chunk): the exact-prox gain pair
                # replaces Kinf in u[0] (admm.forward_pass consensus).
                xout = jnp.where(j == 0, mm(Mfwd0, x), xout)
            kx, ax = xout[:nu], xout[nu:]
            u_i = -kx - d[li]
            us_rows.append(u_i)
            zn_i = jnp.minimum(umax[li], jnp.maximum(umin[li], u_i + y[li]))
            yn_i = y[li] + u_i - zn_i
            zns.append(zn_i)
            yns.append(yn_i)
            ri = jnp.max(jnp.abs(u_i - zn_i), axis=0)
            rd = jnp.max(jnp.abs(zprev[li] - zn_i), axis=0)
            if li == C - 1:
                dead = last_chunk
                ri = jnp.where(dead, 0.0, ri)
                rd = jnp.where(dead, 0.0, rd)
            pri_i = jnp.maximum(pri_i, ri)
            dua_i = jnp.maximum(dua_i, rd)
            s_i = ax + mm(Bm, u_i)
            if adaptive:
                adapt_row(li, x, vn_i, gn_i, u_i, zn_i, yn_i, s_i)
            x = s_i + fvec

        x_scr[:] = x
        acc_scr[0], acc_scr[1] = pri_s, pri_i
        acc_scr[2], acc_scr[3] = dua_s, dua_i
        vnew_out[:] = jnp.stack(vns)
        g_out[:] = jnp.stack(gns)
        znew_out[:] = jnp.stack(zns)
        y_out[:] = jnp.stack(yns)

        # Extra-family updates, whole-chunk (the reference's per-timestep
        # loops, admm.cpp:112-211, vectorised over the chunk rows with
        # the resident kernel's exact projection helpers). The dead
        # input-side row projects garbage harmlessly; it is never read as
        # a real row.
        if fams_x:
            xs_c = jnp.stack(xs_rows)                    # (C, nx, Bt)
            for kind, (s_in, d_in), (s_out, d_out) in zip(fams_x, fx_in,
                                                          fx_out):
                sn = proj_fn(kind, "x")(xs_c + d_in[:])
                s_out[:] = sn
                d_out[:] = d_in[:] + xs_c - sn
        if fams_u:
            us_c = jnp.stack(us_rows)                    # (C, nu, Bt)
            for kind, (s_in, d_in), (s_out, d_out) in zip(fams_u, fu_in,
                                                          fu_out):
                sn = proj_fn(kind, "u")(us_c + d_in[:])
                s_out[:] = sn
                d_out[:] = d_in[:] + us_c - sn
        if track_xu:
            # Primal trajectories out (warm family solves: the carry's
            # x/u, whose next-solve slack re-seed admm.cpp:352-376 reads).
            xs_out[:] = jnp.stack(xs_rows)
            us_out[:] = jnp.stack(us_rows)

        if consensus:
            # u[0] scenario-consensus slack/dual (admm.update_slack /
            # update_dual en_consensus): projection onto the all-equal
            # subspace = the group mean over `group` aligned lanes, as
            # two thin one-hot matmuls (see admm_pallas.
            # _segment_mean_lanes — lane-axis reshapes scalarise under
            # Mosaic). Row 0 lives in chunk 0 only.
            @pl.when(j == 0)
            def _():
                u0 = us_rows[0]                          # (nu, Bt)
                cand0 = u0 + yc0_in[:]
                sums = jnp.dot(jnp.dot(cand0, Sseg_ref[:],
                                       preferred_element_type=f32),
                               STseg_ref[:], preferred_element_type=f32)
                zc0n = sums / group
                zc0_out[:] = zc0n
                yc0_out[:] = yc0_in[:] + u0 - zc0n
                acc_scr[4] = jnp.max(jnp.abs(u0 - zc0n), axis=0)

        # Bookkeeping at the tile's last chunk (admm.cpp:310-328): commit
        # residuals every check_termination iterations for active lanes,
        # flag newly-converged lanes. `just` feeds the host-side solution
        # snapshot; iters/done/res ride the while_loop carry.
        @pl.when(last_chunk)
        def _():
            it1 = it_ref[0, 0] + 1
            active = done_in[0] == 0
            if adaptive:
                # Commit the rho update from the streamed OSQP reductions
                # (rho_benchmark.cpp:175-197; association as in the
                # resident kernel). On non-adapt iterations the where
                # passes the incoming row through; converged lanes freeze
                # their rho (active mask), like admm.solve's masked
                # adaptation. Termination below scales dual residuals
                # with the *post*-adaptation rho (admm.solve computes
                # residuals with the adapted cache).
                eps = 1e-10                     # rho_benchmark.cpp:183
                pri_res = jnp.maximum(pri_i, acc_scr[5])
                pri_norm = acc_scr[6]
                dual_res = jnp.maximum(acc_scr[7], acc_scr[8])
                dual_norm = jnp.maximum(
                    jnp.maximum(jnp.maximum(acc_scr[9], acc_scr[10]),
                                jnp.maximum(acc_scr[11], acc_scr[12])),
                    jnp.maximum(acc_scr[13], acc_scr[10]))
                ratio = (pri_res / (pri_norm + eps)) / (
                    dual_res / (dual_norm + eps) + eps)
                factor = jnp.sqrt(ratio)
                if rho_tol > 1.0:
                    # Guarded policy (admm._solve_impl's accumulator, see
                    # rho_adapt.predict_rho): every prediction updates the
                    # virtual rho; it commits into the solver only once it
                    # has drifted rho_tol-fold from the committed rho.
                    new_v = rho_v_in[0] * factor
                    if rho_clip:
                        new_v = jnp.clip(new_v, rho_min, rho_max)
                    commit = ((new_v >= rho_tol * rho_in_ref[0])
                              | (new_v * rho_tol <= rho_in_ref[0]))
                    rho_v_out[0] = jnp.where(adapt_now & active, new_v,
                                             rho_v_in[0])
                    rho_t = jnp.where(adapt_now & active & commit, new_v,
                                      rho_in_ref[0])
                else:
                    new_rho = rho_in_ref[0] * factor
                    if rho_clip:
                        new_rho = jnp.clip(new_rho, rho_min, rho_max)
                    rho_v_out[0] = rho_v_in[0]
                    rho_t = jnp.where(adapt_now & active, new_rho,
                                      rho_in_ref[0])
                rho_out[0] = rho_t
            else:
                rho_t = rho
            dua_ss = dua_s * rho_t
            dua_ii = dua_i * rho_t
            checking = (it1 % check_termination) == 0
            ok = ((pri_s < abs_pri_tol) & (pri_i < abs_pri_tol)
                  & (dua_ss < abs_dua_tol) & (dua_ii < abs_dua_tol))
            if consensus:
                # Consensus residual gates convergence like the XLA path
                # (admm._solve_impl's cres check); not recorded in res.
                ok = ok & (acc_scr[4] < abs_pri_tol)
            just = checking & ok & active
            commit = checking & active
            iters_out[0] = jnp.where(active, it1, iters_in[0])
            res_out[0] = jnp.where(commit, pri_s, res_in[0])
            res_out[1] = jnp.where(commit, pri_i, res_in[1])
            res_out[2] = jnp.where(commit, dua_ss, res_in[2])
            res_out[3] = jnp.where(commit, dua_ii, res_in[3])
            done_out[0] = jnp.where(just, 1, done_in[0])
            just_out[0] = just.astype(jnp.int32)

    return kernel, Jc


def stream_supported(prob: TinyProblem) -> bool:
    """True when this problem can run on the streamed long-horizon path:
    every projection family (box / SOC / hyperplane / tv-hyperplane),
    local consensus groups, and adaptive rho (telescoped, with the OSQP
    residual reductions streamed across horizon chunks). Only consensus
    over a named mesh axis stays on the XLA path."""
    return not (prob.settings.adaptive_rho
                and prob.cache.dKinf_drho is None)


def auto_tile_stream(prob: TinyProblem, chunk: int = DEFAULT_CHUNK) -> int:
    """Widest power-of-two lane tile whose pipelined chunk buffers fit the
    VMEM budget: 2x-buffered blocked refs — backward 4 in + 1 out,
    forward 5 in + 4 out — plus the resident tables."""
    nx, nu, N = prob.spec.nx, prob.spec.nu, prob.spec.N
    per_lane = 4 * chunk * (2 * (4 * nx + 3 * nu)      # backward bufs
                            + 2 * (4 * nx + 5 * nu))   # forward bufs
    if prob.settings.adaptive_rho:
        # rho rows + the pending/accumulator scratch of the streamed
        # OSQP reductions (not double-buffered).
        per_lane += 4 * (3 * nx + 2 * nu + 8 + 4)
    tables = 4 * N * (2 * nx + 2 * nu + nx + nu)
    from .admm_pallas import lane_vmem_budget
    fit = max(1, (lane_vmem_budget() - tables) // per_lane)
    p = 1
    while p * 2 <= fit and p < 4096:
        p *= 2
    return p


def solve_fused_streamed(prob: TinyProblem, Xref=None, Uref=None, x0s=None,
                         *, tile: Optional[int] = None,
                         chunk: int = DEFAULT_CHUNK,
                         interpret: bool = False,
                         tile_exit: Optional[bool] = None):
    """Long-horizon batched solve with HBM-resident trajectories.

    Same contract as :func:`~.admm_pallas.solve_fused` (cold start):
    returns ``(Solution, residuals (4, B))`` matching the XLA path's
    iterates — with adaptive rho the residual array gains a 5th row
    holding each problem's final rho, like the resident kernel. ``tile``
    is the lane width per grid step (auto: widest that fits the
    chunk-buffer budget, <= 4096); ``chunk`` the horizon rows streamed
    per grid step (N must split into chunk-sized pieces; a divisor of N
    is picked automatically). ``tile_exit`` (default on, env
    TINYMPC_STREAM_TILE_EXIT) runs each lane tile under its own
    while_loop so converged tiles stop launching — per-lane results are
    bitwise unchanged; see _stream_solve.
    """
    sol, res, _ = _stream_solve(prob, Xref, Uref, x0s, None, tile, chunk,
                                interpret, tile_exit)
    return sol, res


def solve_fused_streamed_warm(prob: TinyProblem, Xref=None, Uref=None,
                              x0s=None, carry: FusedCarry = None, *,
                              tile: Optional[int] = None,
                              chunk: int = DEFAULT_CHUNK,
                              interpret: bool = False,
                              tile_exit: Optional[bool] = None):
    """Warm-started streamed solve: ``(Solution, residuals, FusedCarry)``.

    Same carry contract as :func:`~.admm_pallas.solve_fused_warm` for
    every projection family (extra families carry their duals plus the
    x/u trajectories their slack re-seed reads, admm.cpp:352-376; with
    adaptive rho the per-lane rho row rides ``carry.rho``, frozen at
    each lane's convergence): the workspace persists between solves like
    the reference's ``tiny_solve`` sequence (SURVEY.md §3.3), iteration
    0's dual residual reads the carried one-behind v/z, and converged
    lanes hand over their first-convergence iterate (per-lane freeze).
    Build the initial carry with :func:`~.admm_pallas.init_carry`. For
    receding-horizon loops over long previews (N >> 64) where the
    resident kernel's tile collapses. Consensus specs stay cold-start.
    """
    if carry is None:
        raise ValueError("solve_fused_streamed_warm needs a FusedCarry; "
                         "build one with init_carry(prob, B)")
    return _stream_solve(prob, Xref, Uref, x0s, carry, tile, chunk,
                         interpret, tile_exit)


def _stream_solve(prob, Xref, Uref, x0s, carry, tile, chunk, interpret,
                  tile_exit=None):
    if not stream_supported(prob):
        raise ValueError("adaptive rho on the streamed path needs the "
                         "sensitivity matrices; configure the problem "
                         "with with_sensitivities")
    if prob.settings.coarse_iters:
        raise ValueError(
            "coarse_iters (the mixed-precision iteration schedule) is "
            "implemented on the resident fused kernel only — the "
            "streamed iteration is mostly HBM-bound (raw bf16 measured "
            "+13% vs +27% resident; docs/DESIGN.md 'Mixed-precision "
            "schedule'); set coarse_iters=0 for the streamed kernel")
    adaptive = prob.settings.adaptive_rho
    apply_c = prob.settings.adaptive_rho_apply_c
    spec0 = prob.spec
    fams_x = tuple(k for k, on in (
        ("soc", bool(spec0.enabled_state_cones)),
        ("lin", bool(spec0.n_state_lin)),
        ("tv", bool(spec0.n_tv_state_lin))) if on)
    fams_u = tuple(k for k, on in (
        ("soc", bool(spec0.enabled_input_cones)),
        ("lin", bool(spec0.n_input_lin)),
        ("tv", bool(spec0.n_tv_input_lin))) if on)
    consensus = spec0.en_consensus
    if carry is not None:
        # Same field/family consistency contract as solve_fused_warm.
        need = {"gc": bool(spec0.enabled_state_cones),
                "yc": bool(spec0.enabled_input_cones),
                "gl": bool(spec0.n_state_lin),
                "yl": bool(spec0.n_input_lin),
                "gtv": bool(spec0.n_tv_state_lin),
                "ytv": bool(spec0.n_tv_input_lin),
                "zc0": consensus, "yc0": consensus,
                "x": spec0.any_extra_family or consensus,
                "u": spec0.any_extra_family or consensus,
                "rho": bool(adaptive)}
        bad = [k for k, n in need.items()
               if bool(n) != (getattr(carry, k) is not None)]
        if bad:
            raise ValueError(
                f"carry fields {bad} do not match this problem's enabled "
                "constraint families; build the carry with "
                "init_carry(prob, B) for the same problem")
    group_shape = None
    group = 0
    if consensus:
        import jax.numpy as _jnp
        x0s = _jnp.asarray(x0s)
        if x0s.ndim != 3:
            raise ValueError(
                "consensus solve_fused_streamed takes x0s as "
                "(n_groups, group, nx) — the scenario group on the last "
                "batch axis, like tinympc_tpu.solve")
        group_shape = x0s.shape[:2]
        group = int(group_shape[1])
        if group & (group - 1):
            raise ValueError(f"scenario group size {group} must be a "
                             "power of two")
        x0s = x0s.reshape(-1, spec0.nx)
    spec, settings = prob.spec, prob.settings
    N, nx, nu = spec.N, spec.nx, spec.nu
    dtype = jnp.float32
    x0s = jnp.asarray(x0s, dtype)
    B = x0s.shape[0]
    C = _chunk_size(N, chunk)
    if tile is None:
        tile = min(auto_tile_stream(prob, C), B)
        if B % tile:       # largest power of two that still divides B
            while tile > 1 and B % tile:
                tile //= 2
    else:
        # Same semantics as the resident kernel (admm_pallas Bt =
        # min(tile, B)): an explicit tile wider than the batch clamps —
        # compaction phases legitimately shrink below the factory tile.
        tile = min(tile, B)
    if B % tile:
        raise ValueError(f"batch ({B}) must be divisible by tile ({tile})")
    if consensus:
        if group > tile:
            raise ValueError(f"scenario group {group} exceeds tile {tile}; "
                             "raise tile=")
        if tile % group:
            raise ValueError(f"tile ({tile}) must be a multiple of the "
                             f"scenario group ({group}) so groups stay "
                             "whole within a lane block")
    T = B // tile
    Jc = N // C
    rho = float(prob.cache.rho)

    # --- per-tile early exit (round 4). The resident kernel terminates
    # each tile as soon as its lanes converge (its while_loop lives inside
    # the kernel, one per grid tile); the streamed kernel's loop is
    # *outside* the launches, so historically one straggler lane kept
    # every tile's chunk streams launching. Mapping the single-tile solve
    # over the tile axis (lax.map = sequential scan) gives every tile its
    # own while_loop and therefore its own exit — per-lane results are
    # bitwise unchanged (tiles are independent), only wasted launches
    # disappear. TINYMPC_STREAM_TILE_EXIT=0 restores the one-loop
    # whole-batch behavior (the measured A/B lives in BENCH_TABLE.md).
    if tile_exit is None:
        tile_exit = os.environ.get("TINYMPC_STREAM_TILE_EXIT", "1") == "1"
    T_tiles = B // tile
    if not (tile_exit and T_tiles > 1):
        sol, res_out, carry_out = _stream_tile(
            prob, Xref, Uref, x0s, carry, tile, chunk, interpret, group)
    else:
        x0t = x0s.reshape(T_tiles, tile, spec.nx)
        stack = lambda a: jnp.moveaxis(
            jnp.reshape(a, a.shape[:-1] + (T_tiles, tile)), -2, 0)
        if carry is not None:
            carry_t = jax.tree.map(stack, carry)
            sol, res_out, carry_to = jax.lax.map(
                lambda xc: _stream_tile(prob, Xref, Uref, xc[0], xc[1],
                                        tile, chunk, interpret, group),
                (x0t, carry_t))
        else:
            sol, res_out, _none = jax.lax.map(
                lambda x1: _stream_tile(prob, Xref, Uref, x1, None,
                                        tile, chunk, interpret, group),
                x0t)
            carry_to = None
        N_, nx_, nu_ = spec.N, spec.nx, spec.nu
        sol = Solution(
            iter=sol.iter.reshape(B),
            solved=sol.solved.reshape(B),
            x=jnp.moveaxis(sol.x, 0, 1).reshape(N_, B, nx_),
            u=jnp.moveaxis(sol.u, 0, 1).reshape(N_ - 1, B, nu_),
        )
        res_out = jnp.moveaxis(res_out, 0, 1).reshape(res_out.shape[1], B)
        unstack = lambda a: jnp.reshape(
            jnp.moveaxis(a, 0, -2), a.shape[1:-1] + (B,))
        carry_out = (jax.tree.map(unstack, carry_to)
                     if carry_to is not None else None)
    if group_shape is not None:
        # Consensus batches go back to (n_groups, group) axes like
        # tinympc_tpu.solve's batch shape.
        ng, G = group_shape
        N_, nx_, nu_ = spec.N, spec.nx, spec.nu
        sol = Solution(iter=sol.iter.reshape(ng, G),
                       solved=sol.solved.reshape(ng, G),
                       x=sol.x.reshape(N_, ng, G, nx_),
                       u=sol.u.reshape(N_ - 1, ng, G, nu_))
        res_out = res_out.reshape(res_out.shape[0], ng, G)
    return sol, res_out, carry_out


def _stream_tile(prob, Xref, Uref, x0s, carry, tile, chunk, interpret,
                 group):
    """One lane-tile's streamed solve (its own while_loop → its own
    early exit; see the dispatch in _stream_solve). ``x0s`` is flat
    (B, nx) with B == tile (or the whole batch when tile exit is off);
    consensus batches arrive pre-flattened with ``group`` lanes per
    scenario group."""
    spec, settings = prob.spec, prob.settings
    adaptive = settings.adaptive_rho
    apply_c = settings.adaptive_rho_apply_c
    cache, cons = prob.cache, prob.cons
    spec0 = spec
    fams_x = tuple(k for k, on in (
        ("soc", bool(spec0.enabled_state_cones)),
        ("lin", bool(spec0.n_state_lin)),
        ("tv", bool(spec0.n_tv_state_lin))) if on)
    fams_u = tuple(k for k, on in (
        ("soc", bool(spec0.enabled_input_cones)),
        ("lin", bool(spec0.n_input_lin)),
        ("tv", bool(spec0.n_tv_input_lin))) if on)
    consensus = spec0.en_consensus
    N, nx, nu = spec.N, spec.nx, spec.nu
    dtype = jnp.float32
    x0s = jnp.asarray(x0s, dtype)
    B = x0s.shape[0]
    C = _chunk_size(N, chunk)
    T = B // tile
    Jc = N // C
    rho = float(prob.cache.rho)
    with matmul_precision_ctx(settings):
        mm_mode = ("bf16x3" if settings.matmul_precision == "high"
                   else "ambient")

        # ---- host-side tables (match admm_pallas's load-time prep).
        # Input-side (N-1)-row tables pad to N rows; the dead last row is
        # masked out of the residuals by the kernels.
        def padN(a):
            pad = N - a.shape[0]
            if pad:
                a = jnp.concatenate(
                    [a, jnp.zeros((pad, *a.shape[1:]), a.dtype)], axis=0)
            return a

        Xr = (jnp.zeros((N, nx), dtype) if Xref is None
              else jnp.broadcast_to(jnp.asarray(Xref, dtype), (N, nx)))
        Ur = (jnp.zeros((N - 1, nu), dtype) if Uref is None
              else jnp.broadcast_to(jnp.asarray(Uref, dtype), (N - 1, nu)))
        cache = prob.cache
        Qd = jnp.asarray(prob.Qdiag, dtype)
        Rd = jnp.asarray(prob.Rdiag, dtype)
        neg_xref_q = (-(Xr * Qd[None]))[:, :, None]             # (N, nx, 1)
        neg_uref_r = padN(-(Ur * Rd[None]))[:, :, None]         # (N, nu, 1)
        pterm = (-(jnp.asarray(cache.Pinf, dtype).T @ Xr[N - 1]))[:, None]
        Mback = jnp.concatenate([jnp.asarray(prob.B, dtype).T,
                                 jnp.asarray(cache.AmBKt, dtype)], axis=0)
        Mfwd = jnp.concatenate([jnp.asarray(cache.Kinf, dtype),
                                jnp.asarray(prob.A, dtype)], axis=0)
        KinfT = jnp.asarray(cache.Kinf, dtype).T
        Quu = jnp.asarray(cache.Quu_inv, dtype)
        col = lambda a: jnp.asarray(a, dtype).reshape(-1, 1)
        APf, BPf, fvec = col(cache.APf), col(cache.BPf), col(prob.f)
        Bmat = jnp.asarray(prob.B, dtype)
        if adaptive:
            dK = jnp.asarray(cache.dKinf_drho, dtype)
            dKT = dK.T
            dP = jnp.asarray(cache.dPinf_drho, dtype)
            # Taylor term of the terminal reference row (the resident
            # kernel's pN_ref_dP): drho * (-dPinf^T Xref[N-1]).
            pterm_dP = (-(dP.T @ Xr[N - 1]))[:, None]
            dMfwd = jnp.concatenate([dK, jnp.zeros((nx, nx), dtype)],
                                    axis=0)
            ATc = jnp.asarray(prob.A, dtype).T
            BTc = Bmat.T
            Pinfm = jnp.asarray(cache.Pinf, dtype)
            qx_col = col(prob.Qdiag)
            ru_col = col(prob.Rdiag)
            if apply_c:
                dC1 = jnp.asarray(cache.dC1_drho, dtype)
                dMback = jnp.concatenate(
                    [jnp.zeros((nu, nx), dtype),
                     jnp.asarray(cache.dC2_drho, dtype)], axis=0)

        fin = jnp.finfo(dtype).max
        cons = prob.cons
        xmin = jnp.broadcast_to(jnp.asarray(cons.x_min, dtype)
                                if spec.en_state_bound else -fin, (N, nx))
        xmax = jnp.broadcast_to(jnp.asarray(cons.x_max, dtype)
                                if spec.en_state_bound else fin, (N, nx))
        umin = padN(jnp.broadcast_to(
            jnp.asarray(cons.u_min, dtype) if spec.en_input_bound
            else -fin, (N - 1, nu)))
        umax = padN(jnp.broadcast_to(
            jnp.asarray(cons.u_max, dtype) if spec.en_input_bound
            else fin, (N - 1, nu)))
        xmin = jnp.clip(xmin, -fin, fin)
        xmax = jnp.clip(xmax, -fin, fin)
        umin = jnp.clip(umin, -fin, fin)
        umax = jnp.clip(umax, -fin, fin)

        x0k = x0s.T                                              # (nx, B)
        warm = carry is not None
        scones = tuple(spec.enabled_state_cones)
        icones = tuple(spec.enabled_input_cones)
        mus_x = tuple(float(v) for v in
                      jax.device_get(jnp.asarray(cons.cx)).ravel()) \
            if "soc" in fams_x else ()
        mus_u = tuple(float(v) for v in
                      jax.device_get(jnp.asarray(cons.cu)).ravel()) \
            if "soc" in fams_u else ()
        n_lin_x, n_lin_u = spec.n_state_lin, spec.n_input_lin
        n_tv_x, n_tv_u = spec.n_tv_state_lin, spec.n_tv_input_lin
        rho_c = ((float(cache.rho) if settings.consensus_rho is None
                  else float(settings.consensus_rho)) if consensus else 0.0)

        from ..admm import ADAPTIVE_RHO_PERIOD
        adapt_kw = dict(adaptive=adaptive,
                        adapt_period=ADAPTIVE_RHO_PERIOD,
                        rho_min=float(settings.adaptive_rho_min),
                        rho_max=float(settings.adaptive_rho_max),
                        rho_clip=bool(settings.adaptive_rho_clip),
                        rho_tol=float(settings.adaptive_rho_tolerance))
        bwd_kernel, _ = _backward_kernel(C, N, nx, nu, rho, mm_mode,
                                         n_fx=len(fams_x),
                                         n_fu=len(fams_u),
                                         consensus=consensus, rho_c=rho_c,
                                         adaptive=adaptive, apply_c=apply_c)
        track = warm and bool(fams_x or fams_u or consensus)
        fam_kw = dict(fams_x=fams_x, fams_u=fams_u,
                      state_cones=scones, input_cones=icones,
                      mus_x=mus_x, mus_u=mus_u,
                      n_lin_x=n_lin_x, n_lin_u=n_lin_u,
                      n_tv_x=n_tv_x, n_tv_u=n_tv_u, track_xu=track)
        fwd_kernel, _ = _forward_kernel(
            C, N, nx, nu, rho, settings.check_termination,
            float(settings.abs_pri_tol), float(settings.abs_dua_tol),
            mm_mode, consensus=consensus, group=group,
            **fam_kw, **adapt_kw)
        if warm:
            fwd_stale_kernel, _ = _forward_kernel(
                C, N, nx, nu, rho, settings.check_termination,
                float(settings.abs_pri_tol), float(settings.abs_dua_tol),
                mm_mode, stale=True, consensus=consensus, group=group,
                **fam_kw, **adapt_kw)

        # ---- BlockSpecs ----
        def chunk_spec(F, rev=False):
            im = ((lambda t, j: (Jc - 1 - j, 0, t)) if rev
                  else (lambda t, j: (j, 0, t)))
            return pl.BlockSpec((C, F, tile), im, memory_space=pltpu.VMEM)

        def row_table_spec(F, rev=False):
            """(C, F, 1) chunk blocks of the per-row tables (no lane axis)."""
            im = ((lambda t, j: (Jc - 1 - j, 0, 0)) if rev
                  else (lambda t, j: (j, 0, 0)))
            return pl.BlockSpec((C, F, 1), im, memory_space=pltpu.VMEM)

        def bound_spec(F):
            return pl.BlockSpec((C, F), lambda t, j: (j, 0),
                                memory_space=pltpu.VMEM)

        def const_spec(shape):
            return pl.BlockSpec(shape, lambda t, j: tuple(0 for _ in shape),
                                memory_space=pltpu.VMEM)

        def lane_spec(F):
            return pl.BlockSpec((F, tile), lambda t, j: (0, t),
                                memory_space=pltpu.VMEM)

        fam_x_specs = [chunk_spec(nx, rev=True)] * (2 * len(fams_x))
        fam_u_specs = [chunk_spec(nu, rev=True)] * (2 * len(fams_u))
        cons_bwd_in = ([lane_spec(nu), lane_spec(nu)] if consensus else [])
        cons_bwd_const = ([const_spec((nu, nu))] if consensus else [])
        adapt_bwd_lane = [lane_spec(1)] if adaptive else []
        adapt_bwd_const = ([const_spec((nx, nu)), const_spec((nx, 1))]
                           + ([const_spec((nu, nu)),
                               const_spec((nu + nx, nx))] if apply_c else [])
                           ) if adaptive else []
        bwd_call = pl.pallas_call(
            bwd_kernel,
            grid=(T, Jc),
            in_specs=(adapt_bwd_lane
                      + [chunk_spec(nx, rev=True), chunk_spec(nx, rev=True),
                         chunk_spec(nu, rev=True), chunk_spec(nu, rev=True)]
                      + fam_x_specs + fam_u_specs + cons_bwd_in
                      + [row_table_spec(nx, rev=True),
                         row_table_spec(nu, rev=True),
                         const_spec(Mback.shape), const_spec(KinfT.shape),
                         const_spec(Quu.shape)] + cons_bwd_const
                      + [const_spec((nx, 1)),
                         const_spec((nu, 1)), const_spec((nx, 1))]
                      + adapt_bwd_const),
            out_specs=chunk_spec(nu, rev=True),
            out_shape=jax.ShapeDtypeStruct((N, nu, B), dtype),
            scratch_shapes=[pltpu.VMEM((nx, tile), dtype)],
            interpret=interpret,
        )

        def fwd_specs_shapes(stale, track):
            # The stale (warm iteration-0) variant streams the same family
            # pairs as the main kernel; `track` adds the x/u trajectory
            # output streams that warm family solves carry over.
            fx, fu = fams_x, fams_u
            fam_in = ([chunk_spec(nx)] * (2 * len(fx))
                      + [chunk_spec(nu)] * (2 * len(fu)))
            cons_in = ([lane_spec(nu), lane_spec(nu),
                        const_spec((nu + nx, nx)),
                        const_spec((tile, tile // max(group, 1))),
                        const_spec((tile // max(group, 1), tile))]
                       if consensus else [])
            stale_in = [chunk_spec(nx), chunk_spec(nu)] if stale else []
            proj_in = []
            if n_lin_x:
                proj_in += [const_spec((n_lin_x, nx)),
                            const_spec((n_lin_x, 1))]
            if n_lin_u:
                proj_in += [const_spec((n_lin_u, nu)),
                            const_spec((n_lin_u, 1))]
            if n_tv_x:
                proj_in += [
                    pl.BlockSpec((C, n_tv_x, nx),
                                 lambda t, j: (j, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((C, n_tv_x), lambda t, j: (j, 0),
                                 memory_space=pltpu.VMEM)]
            if n_tv_u:
                proj_in += [
                    pl.BlockSpec((C, n_tv_u, nu),
                                 lambda t, j: (j, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((C, n_tv_u), lambda t, j: (j, 0),
                                 memory_space=pltpu.VMEM)]
            adapt_lane = [lane_spec(1)] * 2 if adaptive else []
            adapt_const = ([const_spec(dMfwd.shape), const_spec((nx, nx)),
                            const_spec((nu, nx)), const_spec((nx, nx)),
                            const_spec((nx, nx)), const_spec((nx, 1)),
                            const_spec((nu, 1))] if adaptive else [])
            in_specs = ([pl.BlockSpec((1, 1), lambda t, j: (0, 0),
                                      memory_space=pltpu.SMEM)]
                        + adapt_lane
                        + [chunk_spec(nx), chunk_spec(nx),
                           chunk_spec(nu), chunk_spec(nu), chunk_spec(nu),
                           lane_spec(nx)] + fam_in + cons_in + stale_in
                        + proj_in
                        + [lane_spec(1), lane_spec(1), lane_spec(4),
                           bound_spec(nx), bound_spec(nx),
                           bound_spec(nu), bound_spec(nu),
                           const_spec(Mfwd.shape), const_spec(Bmat.shape),
                           const_spec((nx, 1))] + adapt_const)
            zxs = jax.ShapeDtypeStruct((N, nx, B), dtype)
            zus = jax.ShapeDtypeStruct((N, nu, B), dtype)
            fam_out_specs = ([chunk_spec(nx)] * (2 * len(fx))
                             + [chunk_spec(nu)] * (2 * len(fu)))
            fam_out_shape = [zxs] * (2 * len(fx)) + [zus] * (2 * len(fu))
            cons_out_specs = ([lane_spec(nu), lane_spec(nu)]
                              if consensus else [])
            cons_out_shape = ([jax.ShapeDtypeStruct((nu, B), dtype)] * 2
                              if consensus else [])
            track_out_specs = ([chunk_spec(nx), chunk_spec(nu)]
                               if track else [])
            track_out_shape = [zxs, zus] if track else []
            adapt_out_specs = [lane_spec(1)] * 2 if adaptive else []
            adapt_out_shape = ([jax.ShapeDtypeStruct((1, B), dtype)] * 2
                               if adaptive else [])
            out_specs = ([chunk_spec(nx), chunk_spec(nx),
                          chunk_spec(nu), chunk_spec(nu)] + fam_out_specs
                         + cons_out_specs + track_out_specs
                         + [lane_spec(1), lane_spec(1), lane_spec(4),
                            lane_spec(1)] + adapt_out_specs)
            out_shape = ([zxs, zxs, zus, zus] + fam_out_shape
                         + cons_out_shape + track_out_shape
                         + [jax.ShapeDtypeStruct((1, B), jnp.int32),
                            jax.ShapeDtypeStruct((1, B), jnp.int32),
                            jax.ShapeDtypeStruct((4, B), dtype),
                            jax.ShapeDtypeStruct((1, B), jnp.int32)]
                         + adapt_out_shape)
            return in_specs, out_specs, out_shape

        fwd_scratch = [pltpu.VMEM((nx, tile), dtype),
                       pltpu.VMEM((16 if adaptive else 8, tile), dtype)]
        if adaptive:
            fwd_scratch += [pltpu.VMEM((nx, tile), dtype),   # pending s
                            pltpu.VMEM((nx, tile), dtype),   # pending px+q
                            pltpu.VMEM((nx, tile), dtype),   # pending g
                            pltpu.VMEM((nu, tile), dtype),   # pending 2Ru
                            pltpu.VMEM((nu, tile), dtype)]   # pending y
        in_s, out_s, out_sh = fwd_specs_shapes(False, track)
        fwd_call = pl.pallas_call(
            fwd_kernel, grid=(T, Jc), in_specs=in_s, out_specs=out_s,
            out_shape=out_sh,
            scratch_shapes=list(fwd_scratch),
            interpret=interpret,
        )
        if warm:
            in_s, out_s, out_sh = fwd_specs_shapes(True, track)
            fwd_stale_call = pl.pallas_call(
                fwd_stale_kernel, grid=(T, Jc), in_specs=in_s,
                out_specs=out_s, out_shape=out_sh,
                scratch_shapes=list(fwd_scratch),
                interpret=interpret,
            )

        zx = jnp.zeros((N, nx, B), dtype)
        zu = jnp.zeros((N, nu, B), dtype)
        state0 = dict(
            it=jnp.int32(0),
            vnew=zx if not warm else jnp.asarray(carry.vnew, dtype),
            g=zx if not warm else jnp.asarray(carry.g, dtype),
            znew=zu if not warm else padN(jnp.asarray(carry.znew, dtype)),
            y=zu if not warm else padN(jnp.asarray(carry.y, dtype)),
            iters=jnp.zeros((1, B), jnp.int32),
            done=jnp.zeros((1, B), jnp.int32),
            res=jnp.zeros((4, B), dtype),
            outx=zx, outu=zu,
        )
        if adaptive:
            # Per-lane rho row (the reference's persistent cache->rho);
            # warm solves continue the carried row.
            state0["rho"] = (jnp.asarray(carry.rho, dtype) if warm
                             else jnp.full((1, B), rho, dtype))
            # The guard's virtual rho starts at the committed rho each
            # solve (transient accumulator, like the XLA path's carry).
            state0["rho_v"] = state0["rho"]
        # Extra-family slack seeds from the workspace x — the carried
        # trajectory (warm) or zeros (cold) with the new x0 in row 0
        # (admm.cpp:352-376 / admm.seed_extra_slacks); input-side from
        # the carried (or zero cold) u. Duals carry over (warm) or start
        # zero. One (slack, dual) pair per family, canonical
        # [soc, lin, tv] order.
        if warm and (fams_x or fams_u):
            x_seed = jnp.concatenate(
                [x0k[None], jnp.asarray(carry.x, dtype)[1:]], axis=0)
            u_seed = padN(jnp.asarray(carry.u, dtype))
            dmap_x = {"soc": carry.gc, "lin": carry.gl, "tv": carry.gtv}
            dmap_u = {"soc": carry.yc, "lin": carry.yl, "tv": carry.ytv}
            state0["fx"] = [(x_seed, jnp.asarray(dmap_x[k], dtype))
                            for k in fams_x]
            state0["fu"] = [(u_seed, padN(jnp.asarray(dmap_u[k], dtype)))
                            for k in fams_u]
        else:
            state0["fx"] = [(zx.at[0].set(x0k), zx) for _ in fams_x]
            state0["fu"] = [(zu, zu) for _ in fams_u]

        # Projection data (constant operands of the forward launch).
        proj_data = []
        if n_lin_x:
            proj_data += [jnp.asarray(cons.Alin_x, dtype),
                          jnp.asarray(cons.blin_x, dtype).reshape(-1, 1)]
        if n_lin_u:
            proj_data += [jnp.asarray(cons.Alin_u, dtype),
                          jnp.asarray(cons.blin_u, dtype).reshape(-1, 1)]
        if n_tv_x:
            proj_data += [jnp.asarray(cons.tv_Alin_x, dtype),
                          jnp.asarray(cons.tv_blin_x, dtype)]
        if n_tv_u:
            proj_data += [padN(jnp.asarray(cons.tv_Alin_u, dtype)),
                          padN(jnp.asarray(cons.tv_blin_u, dtype))]

        if consensus:
            from .admm_pallas import _segment_matrices
            Quu0 = jnp.asarray(cache.Quu0_inv, dtype)
            Kinf0s = jnp.concatenate([jnp.asarray(cache.Kinf0, dtype),
                                      jnp.asarray(prob.A, dtype)], axis=0)
            Sseg, STseg = _segment_matrices(tile, group)
            if warm:
                # Per-solve re-seed from the carried u (admm.
                # seed_extra_slacks: zc0new = u[0]); the dual persists.
                state0.update(
                    zc0=jnp.asarray(carry.u, dtype)[0],
                    yc0=jnp.asarray(carry.yc0, dtype))
            else:
                # Cold consensus slack/dual seeds (admm.seed_extra_slacks:
                # zc0 from the zero cold u, dual zero).
                state0.update(zc0=jnp.zeros((nu, B), dtype),
                              yc0=jnp.zeros((nu, B), dtype))
        if warm:
            # Per-lane carry-freeze snapshots (the resident kernel's snap
            # machinery, admm_pallas lines around its snap refs): filled at
            # each lane's first convergence, so the handed-over carry is
            # the converged iterate, not the tile's last one.
            state0.update(sv=zx, sz=zu, sg=zx, sy=zu, svst=zx, szst=zu)
            if consensus:
                zc = jnp.zeros((nu, B), dtype)
                state0.update(szc0=zc, syc0=zc)
            if track:
                # Family-dual and x/u shadows (+ the live trajectories,
                # for max-iter lanes' carry hand-over).
                state0.update(sfx=[zx for _ in fams_x],
                              sfu=[zu for _ in fams_u],
                              sx=zx, su=zu, xs=zx, us=zu)

        def step(s, stale_v=None, stale_z=None):
            """One ADMM iteration: backward launch, forward launch, and
            the host-side snapshot blends (solution always; carry shadows
            on warm solves), paid only on iterations where a lane
            converged."""
            fam_args = [a for pair in s["fx"] + s["fu"] for a in pair]
            cons_lane = [s["zc0"], s["yc0"]] if consensus else []
            rho_lane = [s["rho"]] if adaptive else []
            rho_lane_fwd = [s["rho"], s["rho_v"]] if adaptive else []
            adapt_bwd = ([dKT, pterm_dP]
                         + ([dC1, dMback] if apply_c else [])
                         ) if adaptive else []
            d = bwd_call(*rho_lane, s["vnew"], s["g"], s["znew"], s["y"],
                         *fam_args, *cons_lane, neg_xref_q, neg_uref_r,
                         Mback, KinfT, Quu, *([Quu0] if consensus else []),
                         APf, BPf, pterm, *adapt_bwd)
            itm = s["it"].reshape(1, 1)
            args = [itm] + rho_lane_fwd + [s["vnew"], s["g"], s["znew"],
                                           s["y"], d, x0k]
            args += fam_args
            if consensus:
                args += [s["zc0"], s["yc0"], Kinf0s, Sseg, STseg]
            if stale_v is not None:
                args += [stale_v, stale_z]
                args += proj_data
                call = fwd_stale_call
            else:
                args += proj_data
                call = fwd_call
            args += [s["iters"], s["done"], s["res"],
                     xmin, xmax, umin, umax, Mfwd, Bmat, fvec]
            if adaptive:
                args += [dMfwd, ATc, BTc, Pinfm, dP, qx_col, ru_col]
            outs = call(*args)
            o = iter(outs)
            vnew, g, znew, y = next(o), next(o), next(o), next(o)
            fx_new = [(next(o), next(o)) for _ in fams_x]
            fu_new = [(next(o), next(o)) for _ in fams_u]
            cons_new = ({"zc0": next(o), "yc0": next(o)}
                        if consensus else {})
            xs_tr = next(o) if track else None
            us_tr = next(o) if track else None
            iters, done, res, just = next(o), next(o), next(o), next(o)
            rho_new = next(o) if adaptive else None
            rho_v_new = next(o) if adaptive else None

            jm = (just[0] == 1)[None, None, :]
            prev_v = stale_v if stale_v is not None else s["vnew"]
            prev_z = stale_z if stale_z is not None else s["znew"]

            def blend():
                outs = (jnp.where(jm, vnew, s["outx"]),
                        jnp.where(jm, znew, s["outu"]))
                if warm:
                    outs += (jnp.where(jm, vnew, s["sv"]),
                             jnp.where(jm, znew, s["sz"]),
                             jnp.where(jm, g, s["sg"]),
                             jnp.where(jm, y, s["sy"]),
                             jnp.where(jm, prev_v, s["svst"]),
                             jnp.where(jm, prev_z, s["szst"]))
                    if track:
                        outs += tuple(jnp.where(jm, d, sd) for (_, d), sd
                                      in zip(fx_new, s["sfx"]))
                        outs += tuple(jnp.where(jm, d, sd) for (_, d), sd
                                      in zip(fu_new, s["sfu"]))
                        outs += (jnp.where(jm, xs_tr, s["sx"]),
                                 jnp.where(jm, us_tr, s["su"]))
                    if consensus:
                        outs += (jnp.where(jm[0], cons_new["zc0"],
                                           s["szc0"]),
                                 jnp.where(jm[0], cons_new["yc0"],
                                           s["syc0"]))
                return outs

            def keep():
                outs = (s["outx"], s["outu"])
                if warm:
                    outs += (s["sv"], s["sz"], s["sg"], s["sy"],
                             s["svst"], s["szst"])
                    if track:
                        outs += tuple(s["sfx"]) + tuple(s["sfu"])
                        outs += (s["sx"], s["su"])
                    if consensus:
                        outs += (s["szc0"], s["syc0"])
                return outs

            blended = jax.lax.cond(jnp.any(just == 1), blend, keep)
            out = dict(it=s["it"] + 1, vnew=vnew, g=g, znew=znew, y=y,
                       iters=iters, done=done, res=res,
                       outx=blended[0], outu=blended[1],
                       fx=fx_new, fu=fu_new, **cons_new)
            if adaptive:
                out["rho"] = rho_new
                out["rho_v"] = rho_v_new
            if warm:
                out.update(sv=blended[2], sz=blended[3], sg=blended[4],
                           sy=blended[5], svst=blended[6], szst=blended[7])
                if track:
                    nfx, nfu = len(fams_x), len(fams_u)
                    out.update(sfx=list(blended[8:8 + nfx]),
                               sfu=list(blended[8 + nfx:8 + nfx + nfu]),
                               sx=blended[8 + nfx + nfu],
                               su=blended[8 + nfx + nfu + 1],
                               xs=xs_tr, us=us_tr)
                if consensus:
                    out.update(szc0=blended[-2], syc0=blended[-1])
            return out

        def cond(s):
            return (s["it"] < settings.max_iter) & jnp.logical_not(
                jnp.all(s["done"] == 1))

        if warm and settings.max_iter >= 1:
            # Peel iteration 0: its dual residual reads the carried
            # one-behind v/z (the stale variant); later iterations read
            # the previous vnew/znew from the arrays themselves.
            s = step(state0, jnp.asarray(carry.v, dtype),
                     padN(jnp.asarray(carry.z, dtype)))
            s = jax.lax.while_loop(cond, step, s)
        else:
            s = jax.lax.while_loop(cond, step, state0)

        # Unconverged lanes report their final iterates (admm.cpp:450-453).
        am = (s["done"][0] == 0)[None, None, :]
        outx = jnp.where(am, s["vnew"], s["outx"])            # (N, nx, B)
        outu = jnp.where(am, s["znew"], s["outu"])[:N - 1]    # drop dead row
        sol = Solution(iter=s["iters"][0],
                       solved=(s["done"][0] == 1),            # bool, like
                       # the resident kernel and XLA path (the compaction
                       # driver negates this with ~ on the host)
                       x=outx.transpose(0, 2, 1),             # (N, B, nx)
                       u=outu.transpose(0, 2, 1))
        res_out = s["res"]
        if adaptive:
            # 5th row: per-problem final rho, like solve_fused (feed to
            # kernels.adapted_cache for the full per-problem cache).
            res_out = jnp.concatenate([res_out, s["rho"]], axis=0)
        if not warm:
            return sol, res_out, None

        # Carry merge (the resident kernel's end-merge): converged lanes
        # restore their snapshots; max-iter lanes hand over the final
        # iterate, for which the reference's last v <- vnew copy ran.
        cm = jnp.logical_not(am)
        trim = lambda a: a[:N - 1]
        fam_carry = {}
        if track:
            # Family duals + the x/u trajectories the next solve's slack
            # re-seed reads (admm.cpp:352-376): converged lanes restore
            # their first-convergence shadows, max-iter lanes hand over
            # the final iterate — same merge as the resident kernel's.
            names_x = {"soc": "gc", "lin": "gl", "tv": "gtv"}
            names_u = {"soc": "yc", "lin": "yl", "tv": "ytv"}
            for k, (_, du), sd in zip(fams_x, s["fx"], s["sfx"]):
                fam_carry[names_x[k]] = jnp.where(cm, sd, du)
            for k, (_, du), sd in zip(fams_u, s["fu"], s["sfu"]):
                fam_carry[names_u[k]] = trim(jnp.where(cm, sd, du))
            fam_carry["x"] = jnp.where(cm, s["sx"], s["xs"])
            fam_carry["u"] = trim(jnp.where(cm, s["su"], s["us"]))
        if consensus:
            fam_carry["zc0"] = jnp.where(cm[0], s["szc0"], s["zc0"])
            fam_carry["yc0"] = jnp.where(cm[0], s["syc0"], s["yc0"])
        carry_out = FusedCarry(
            vnew=jnp.where(cm, s["sv"], s["vnew"]),
            znew=trim(jnp.where(cm, s["sz"], s["znew"])),
            g=jnp.where(cm, s["sg"], s["g"]),
            y=trim(jnp.where(cm, s["sy"], s["y"])),
            v=jnp.where(cm, s["svst"], s["vnew"]),
            z=trim(jnp.where(cm, s["szst"], s["znew"])),
            # rho was already frozen per-lane at convergence (the in-kernel
            # active mask), so the final row is the carry row.
            rho=s["rho"] if adaptive else None,
            **fam_carry,
        )
        return sol, res_out, carry_out
