"""Fused closed-loop MPC kernel: entire receding-horizon loops in VMEM.

One kernel instance runs ``T`` MPC steps for a tile of independent plants:
warm-started ADMM solve, apply the first input, simulate the plant, next
step — with *zero* HBM traffic between ADMM iterations or between MPC
steps. This is the serving workload (a fleet of controllers stepped
together) at whole-loop fusion.

Differences from the single-solve kernel (admm_pallas.py):
  * per-lane freezing is exact: every state write is masked by the lane's
    active flag, so a converged lane's workspace is bit-identical to the
    reference's early-return semantics and the *next* step warm-starts from
    the frozen state;
  * the reference window slides over a full trajectory resident in VMEM
    (``Xref_total[step : step+N]`` via a dynamic ref slice, like
    quadrotor_tracking.cpp:89);
  * outputs are per-step plant states, applied inputs (the raw forward-pass
    u[0], like ``work->u.col(0)`` in the reference examples), iteration
    counts, and solved flags.

Same Mosaic v5e rules as admm_pallas.py apply (no in-kernel transposes, no
dependence-free full-store/row-store pairs, terminal matvec on the VPU).

Performance status: bit-exact vs tinympc_tpu.closed_loop (including
per-step iteration counts over warm-started sequences), but currently
~2-3x slower than the XLA closed loop — the exact per-lane freezing adds a
masked read-modify-write to every array store, and the solver is
VPU/elementwise-bound, not MXU-bound. Known optimisation path: ping-pong
v/vnew buffers (drop the two full-array copies per iteration) and deferring
freeze masking to convergence boundaries.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import TinyProblem

DEFAULT_TILE = 256


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
    x, u, d, v, vnew, z, znew, g, y,
    done, iters,
    *,
    T: int, N: int, nx: int, nu: int, max_iter: int, check_termination: int,
    abs_pri_tol: float, abs_dua_tol: float, rho: float, reset_duals: bool,
):
    f32 = jnp.float32
    Bt = x0_ref.shape[-1]

    A = A_ref[:]
    Bm = B_ref[:]
    BT = BT_ref[:]
    Kinf = Kinf_ref[:]
    KinfT = KinfT_ref[:]
    PinfT = PinfT_ref[:]
    Quu = Quu_ref[:]
    AmBKt = AmBKt_ref[:]
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

    for ref in (v, vnew, z, znew, g, y):
        ref[:] = jnp.zeros(ref.shape, ref.dtype)
    x[0] = x0_ref[:]

    def mm(M, vv):
        return jnp.dot(M, vv, preferred_element_type=f32)

    def solve_step(step, dvgN):
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
            dvgN = vnew[N - 1]  # g is now zero; refresh the carried value

        def iteration(it, dvgN):
            active = done[0] == 0                          # (Bt,)
            am = active[None, :]                           # (1, Bt) row mask
            amf = active[None, None, :]                    # full-array mask

            # Backward sweep with on-the-fly linear cost; masked row commits
            # keep converged lanes bit-frozen (reference early-return).
            p_next = pN_ref_term - rho * dvgN
            for i in range(N - 2, -1, -1):
                r_i = neg_uref_r[i] - rho * (znew[i] - y[i])
                q_i = neg_xref_q[i] - rho * (vnew[i] - g[i])
                d[i] = jnp.where(
                    am, mm(Quu, mm(BT, p_next) + r_i + BPf), d[i])
                p_next = q_i + mm(AmBKt, p_next) - mm(KinfT, r_i) + APf

            x_i = x[0]
            for i in range(N - 1):
                u_i = -mm(Kinf, x_i) - d[i]
                u[i] = jnp.where(am, u_i, u[i])
                x_i = jnp.where(am, mm(A, x_i) + mm(Bm, u_i) + fvec, x[i + 1])
                x[i + 1] = x_i

            vn = jnp.where(amf, jnp.minimum(xmax, jnp.maximum(xmin, x[:] + g[:])),
                           vnew[:])
            zn = jnp.where(amf, jnp.minimum(umax, jnp.maximum(umin, u[:] + y[:])),
                           znew[:])
            vnew[:] = vn
            znew[:] = zn
            g_new = jnp.where(amf, g[:] + x[:] - vn, g[:])
            y_new = jnp.where(amf, y[:] + u[:] - zn, y[:])
            g[:] = g_new
            y[:] = y_new
            dvgN_next = jnp.where(am, vn[N - 1] - g_new[N - 1], dvgN)

            it1 = it + 1
            pri_s = jnp.max(jnp.abs(x[:] - vn), axis=(0, 1))
            pri_i = jnp.max(jnp.abs(u[:] - zn), axis=(0, 1))
            dua_s = jnp.max(jnp.abs(v[:] - vn), axis=(0, 1)) * rho
            dua_i = jnp.max(jnp.abs(z[:] - zn), axis=(0, 1)) * rho
            checking = (it1 % check_termination) == 0
            ok = (pri_s < abs_pri_tol) & (pri_i < abs_pri_tol) \
                & (dua_s < abs_dua_tol) & (dua_i < abs_dua_tol)
            just = checking & ok & active

            iters[0] = jnp.where(active, it1, iters[0])
            done[0] = jnp.where(just, 1, done[0])
            # v/z carry-over is skipped on the converging iteration
            # (admm.cpp:444-446 after the early return).
            keep = active & ~just
            v[:] = jnp.where(keep[None, None, :], vn, v[:])
            z[:] = jnp.where(keep[None, None, :], zn, z[:])
            return jnp.all(done[0] == 1), dvgN_next

        def cond(carry):
            it, all_done, _ = carry
            return (it < max_iter) & jnp.logical_not(all_done)

        def body(carry):
            it, _, dn = carry
            ad, dn2 = iteration(it, dn)
            return it + 1, ad, dn2

        _, _, dvgN = jax.lax.while_loop(
            cond, body, (jnp.int32(0), False, dvgN))

        # Record and simulate the plant with the applied first input.
        x0 = x[0]
        u0 = u[0]
        xs_ref[step] = x0
        us_ref[step] = u0
        iters_ref[step] = iters[0]
        solved_ref[step] = done[0]
        x[0] = mm(A, x0) + mm(Bm, u0) + fvec
        return dvgN

    jax.lax.fori_loop(0, T, solve_step, jnp.zeros((nx, Bt), f32))


def closed_loop_fused(prob: TinyProblem, Xref_total, x0s, n_steps: int,
                      Uref=None, *, reset_duals: bool = False,
                      tile: int = DEFAULT_TILE, interpret: bool = False):
    """Run ``n_steps`` receding-horizon MPC steps for a batch of plants,
    fully fused on-chip.

    Args:
      Xref_total: (n_steps + N - 1, nx) sliding reference, or (N, nx) to
        hold one window fixed (it is then tiled).
      x0s: (B, nx) initial plant states.
      reset_duals: zero y/g before each solve (quadrotor_tracking.cpp:92-93).

    Returns (xs, us, iters, solved): xs (n_steps, B, nx) plant states,
    us (n_steps, B, nu) applied inputs, iters/solved (n_steps, B).
    """
    from .admm_pallas import fused_supported

    spec, st = prob.spec, prob.settings
    if not fused_supported(prob):
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
    )

    zx = lambda: pltpu.VMEM((N, nx, Bt), dtype)
    zu = lambda: pltpu.VMEM((N - 1, nu, Bt), dtype)

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
            zx(), zu(), zu(),        # x u d
            zx(), zx(), zu(), zu(),  # v vnew z znew
            zx(), zu(),              # g y
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
