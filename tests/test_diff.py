"""Differentiable MPC: implicit gradients through the solve vs finite
differences of the actual solver map (no reference analog — tinympc_tpu/
diff.py). Gradient accuracy is bounded by solve accuracy, so these tests
run tight tolerances in float64."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tinympc_tpu as tm
from tinympc_tpu import systems
from tinympc_tpu.diff import make_differentiable


def _fd_check(loss, args, grads, argi, n=6, eps=1e-6, rtol=1e-3):
    arg = args[argi]
    flat = np.asarray(arg, float).ravel()
    gaf = np.asarray(grads[argi]).ravel()
    idxs = np.linspace(0, gaf.size - 1, min(n, gaf.size)).astype(int)
    for i in idxs:
        def at(v):
            a = flat.copy()
            a[i] = v
            newargs = list(args)
            newargs[argi] = jnp.asarray(a.reshape(np.shape(arg)))
            return float(loss(*newargs))
        fd = (at(flat[i] + eps) - at(flat[i] - eps)) / (2 * eps)
        assert abs(fd - gaf[i]) <= rtol * (abs(fd) + 1e-5), \
            f"arg {argi} coord {i}: implicit {gaf[i]}, FD {fd}"


def _cartpole(x_bounds=None, u_bounds=None, tol=1e-11):
    s = systems.cartpole()
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=10, dtype=jnp.float64)
    xb = x_bounds or (-1e9, 1e9)
    ub = u_bounds or (-1e9, 1e9)
    prob = tm.with_bounds(prob, x_min=xb[0], x_max=xb[1], u_min=ub[0],
                          u_max=ub[1])
    return tm.with_settings(prob, max_iter=50000, abs_pri_tol=tol,
                            abs_dua_tol=tol)


X0 = jnp.asarray([0.5, 0.0, 0.1, 0.0])
XREF = jnp.tile(jnp.asarray([1.0, 0, 0, 0.0]), (10, 1))
UREF = jnp.zeros((9, 1))


def test_grad_unconstrained_matches_fd():
    f = make_differentiable(_cartpole())

    def loss(x0, Xref, Uref):
        sol = f(x0, Xref, Uref)
        return jnp.sum(sol.u ** 2) + jnp.sum(sol.x[:, 0] ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(X0, XREF, UREF)
    for argi in range(3):
        _fd_check(loss, (X0, XREF, UREF), g, argi, rtol=1e-3)


def test_grad_with_active_bounds_matches_fd():
    """Clamped coordinates are pinned in the KKT system: the gradient of a
    loss on a saturated input w.r.t. the references is (locally) zero, and
    x0 gradients flow only through the free coordinates."""
    prob = _cartpole(u_bounds=(-0.6, 0.6), tol=1e-10)
    f = make_differentiable(prob)
    sol = f(X0, XREF, UREF)
    assert bool(jnp.all(sol.u <= -0.6)), "test premise: inputs saturate"

    def loss(x0, Xref, Uref):
        sol = f(x0, Xref, Uref)
        return jnp.sum(sol.u ** 2) + jnp.sum(sol.x[:, 0] ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(X0, XREF, UREF)
    # u fully saturated -> dL/dUref = 0 exactly.
    np.testing.assert_allclose(np.asarray(g[2]), 0.0, atol=1e-12)
    for argi in range(2):
        _fd_check(loss, (X0, XREF, UREF), g, argi, rtol=1e-3)


def test_grad_mixed_actives_matches_fd():
    """State and input bounds simultaneously active on a strict subset of
    coordinates."""
    prob = _cartpole(x_bounds=(-0.55, 0.55), u_bounds=(-3.0, 3.0), tol=1e-10)
    f = make_differentiable(prob)
    sol = f(X0, XREF, UREF)
    nax = int(jnp.sum((sol.x <= -0.55) | (sol.x >= 0.55)))
    nau = int(jnp.sum((sol.u <= -3.0) | (sol.u >= 3.0)))
    assert 0 < nax < sol.x.size and 0 < nau < sol.u.size

    def loss(x0, Xref, Uref):
        sol = f(x0, Xref, Uref)
        return (jnp.sum(sol.u ** 2) + jnp.sum(sol.x[:, 0] ** 2)
                + jnp.sum(sol.x[:, 2] ** 2))

    g = jax.grad(loss, argnums=(0, 1, 2))(X0, XREF, UREF)
    for argi in range(3):
        _fd_check(loss, (X0, XREF, UREF), g, argi, rtol=5e-3)


def test_grad_batched_shared_refs():
    """Batched x0 with shared references: per-problem x0 gradients match
    the unbatched ones; shared-reference gradients accumulate."""
    f = make_differentiable(_cartpole())
    B = 3
    x0s = jnp.stack([X0, X0 * 0.5, X0 * -0.8])

    def loss_b(x0s, Xref, Uref):
        sol = f(x0s, Xref, Uref)
        return jnp.sum(sol.u ** 2) + jnp.sum(sol.x[..., 0] ** 2)

    gb = jax.grad(loss_b, argnums=(0, 1))(x0s, XREF, UREF)

    def loss_1(x0, Xref, Uref):
        sol = f(x0, Xref, Uref)
        return jnp.sum(sol.u ** 2) + jnp.sum(sol.x[:, 0] ** 2)

    acc = jnp.zeros_like(XREF)
    for i in range(B):
        gi = jax.grad(loss_1, argnums=(0, 1))(x0s[i], XREF, UREF)
        np.testing.assert_allclose(np.asarray(gb[0][i]), np.asarray(gi[0]),
                                   rtol=1e-9, atol=1e-9)
        acc = acc + gi[1]
    np.testing.assert_allclose(np.asarray(gb[1]), np.asarray(acc),
                               rtol=1e-9, atol=1e-9)


def test_grad_x0_on_state_bound_not_nan():
    """Regression: an initial state sitting exactly on an enabled state
    bound used to singularize the pinned KKT matrix (the x_0 block was
    active-masked while also carrying the initial-condition constraint),
    yielding all-NaN gradients."""
    prob = _cartpole(x_bounds=(-0.5, 0.5), tol=1e-10)
    f = make_differentiable(prob)
    x0 = jnp.asarray([0.5, 0.0, 0.1, 0.0])   # x0[0] exactly on x_max

    def loss(x0, Xref, Uref):
        sol = f(x0, Xref, Uref)
        return jnp.sum(sol.u ** 2) + jnp.sum(sol.x[:, 0] ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(x0, XREF, UREF)
    for gi in g:
        assert np.all(np.isfinite(np.asarray(gi))), "NaN/inf gradient"
    _fd_check(loss, (x0, XREF, UREF), g, 1, rtol=5e-3)


def _fd_check_args(loss, args, grads, argi, n=5, rtol=1e-3):
    arg = args[argi]
    flat = np.asarray(arg, float).ravel()
    gaf = np.asarray(grads[argi]).ravel()
    idxs = np.linspace(0, gaf.size - 1, min(n, gaf.size)).astype(int)
    for i in idxs:
        eps = 1e-6 * max(1.0, abs(flat[i]))

        def at(v):
            a = flat.copy()
            a[i] = v
            na = list(args)
            na[argi] = jnp.asarray(a.reshape(np.shape(arg)))
            return float(loss(*na))
        fd = (at(flat[i] + eps) - at(flat[i] - eps)) / (2 * eps)
        assert abs(fd - gaf[i]) <= rtol * (abs(fd) + 1e-4), \
            f"arg {argi} coord {i}: implicit {gaf[i]}, FD {fd}"


def test_grad_consensus_matches_fd():
    """Consensus scenario groups (round 4): gradients flow through the
    group-coupled KKT (diff._kkt_matrix_group) — one member's x0 moves
    every member's solution through the shared u_0, and the adjoint must
    capture that cross-member coupling. FD-validated in float64."""
    prob = tm.with_consensus(_cartpole(tol=1e-11), rho_c=20.0)
    f = make_differentiable(prob)
    ng, G = 2, 3
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(-0.4, 0.4, (ng, G, 4)))

    def loss(x0, Xref, Uref):
        sol = f(x0, Xref, Uref)
        return jnp.sum(sol.u ** 2) + jnp.sum((sol.x[..., 0] - 0.5) ** 2)

    # The solve actually couples: u[0] equal across each group.
    sol = f(x0, XREF, UREF)
    assert np.asarray(sol.solved).all()
    u0 = np.asarray(sol.u[0])                    # (ng, G, 1)
    assert np.ptp(u0, axis=1).max() < 1e-6

    g = jax.grad(loss, argnums=(0, 1, 2))(x0, XREF, UREF)
    for argi in range(3):
        _fd_check(loss, (x0, XREF, UREF), g, argi, rtol=2e-3)

    # Cross-member coupling is nonzero: the gradient of a loss on member
    # 0's inputs w.r.t. member 1's x0 must not vanish.
    def loss_m0(x0):
        sol = f(x0, XREF, UREF)
        return jnp.sum(sol.u[:, 0, 0] ** 2)

    gx0 = jax.grad(loss_m0)(x0)
    assert float(jnp.abs(gx0[0, 1]).max()) > 1e-9
    # The dense group-KKT custom-vjp executables are the largest programs
    # this suite compiles; dropping them here avoids a jaxlib CPU-client
    # segfault that later FD-heavy tests otherwise trip over (observed as
    # a SIGSEGV in test_param_grads_hyperplane only when these tests
    # precede it in the same process).
    jax.clear_caches()


def test_grad_consensus_active_bounds_matches_fd():
    """Consensus + active input bounds: the coupling rows interact with
    pinned u_0 coordinates (diff._vjp_group's m_cc logic)."""
    prob = tm.with_consensus(_cartpole(u_bounds=(-0.12, 0.12), tol=1e-11),
                             rho_c=20.0)
    f = make_differentiable(prob)
    ng, G = 1, 3
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(0.6 * rng.uniform(0.5, 1.0, (ng, G, 4)))

    def loss(x0, Xref, Uref):
        sol = f(x0, Xref, Uref)
        return jnp.sum(sol.u ** 2) + jnp.sum((sol.x[..., 0] - 0.5) ** 2)

    sol = f(x0, XREF, UREF)
    assert np.asarray(sol.solved).all()
    u = np.asarray(sol.u)
    assert (np.abs(u) > 0.12 - 1e-7).any(), "no active bound — vacuous"

    g = jax.grad(loss, argnums=(0, 1, 2))(x0, XREF, UREF)
    for argi in range(3):
        _fd_check(loss, (x0, XREF, UREF), g, argi, rtol=2e-3)
    jax.clear_caches()   # see test_grad_consensus_matches_fd


def test_param_grads_match_fd():
    """make_differentiable_params: gradients w.r.t. A, B, Q, R, f match
    finite differences — including the implicit chain through the Riccati
    fixed point (Pinf depends on A/B/Q/R) and with saturated inputs."""
    from tinympc_tpu.diff import make_differentiable_params
    s = systems.cartpole()
    template = _cartpole(u_bounds=(-1.5, 1.5), tol=1e-11)
    g = make_differentiable_params(template)

    A = jnp.asarray(s["A"], jnp.float64)
    B = jnp.asarray(s["B"], jnp.float64)
    Q = jnp.asarray(s["Qdiag"], jnp.float64)
    R = jnp.asarray(s["Rdiag"], jnp.float64)
    fv = jnp.asarray([0.0, 0.01, 0.0, -0.02])
    args = (A, B, Q, R, fv)

    def loss(A, B, Q, R, fv):
        sol = g(A, B, Q, R, fv, X0, XREF, UREF)
        return (jnp.sum(sol.u ** 2) + jnp.sum(sol.x[:, 0] ** 2)
                + jnp.sum(sol.x[-1] ** 2))

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)
    for argi in range(5):
        _fd_check_args(loss, args, grads, argi, rtol=2e-3)


def test_param_grads_sysid_descent():
    """System identification through the controller: recovering a
    perturbed A by gradient descent on the solution mismatch decreases the
    loss monotonically."""
    from tinympc_tpu.diff import make_differentiable_params
    s = systems.cartpole()
    template = _cartpole(u_bounds=(-3.0, 3.0), tol=1e-10)
    g = make_differentiable_params(template)

    A_true = jnp.asarray(s["A"], jnp.float64)
    B = jnp.asarray(s["B"], jnp.float64)
    Q = jnp.asarray(s["Qdiag"], jnp.float64)
    R = jnp.asarray(s["Rdiag"], jnp.float64)
    fv = jnp.zeros(4)
    target = g(A_true, B, Q, R, fv, X0, XREF, UREF)

    def loss(A):
        sol = g(A, B, Q, R, fv, X0, XREF, UREF)
        return jnp.sum((sol.u - target.u) ** 2) + jnp.sum(
            (sol.x - target.x) ** 2)

    A = A_true + 0.02
    losses = [float(loss(A))]
    vg = jax.value_and_grad(loss)
    for _ in range(10):
        L, gr = vg(A)
        A = A - 2e-5 * gr      # A-gradients are O(1e3); keep steps small
        losses.append(float(loss(A)))
    assert losses[-1] < 0.2 * losses[0], losses
    assert all(b <= a * 1.001 for a, b in zip(losses, losses[1:])), losses


def test_diff_unsupported_specs_raise():
    """Round 5 closed every make_differentiable cell (consensus+conic,
    adaptive rho) and consensus params; the one deliberately open cell —
    adaptive-rho parameter gradients — raises with the written reason
    (diff._params_diff_supported / docs/PARITY.md)."""
    prob = _cartpole()
    from tinympc_tpu.diff import make_differentiable_params
    with pytest.raises(ValueError, match="adaptive"):
        make_differentiable_params(tm.with_settings(prob, adaptive_rho=True))
    # The closed cells construct without raising.
    a = np.zeros(4); a[0] = 1.0
    conic = tm.with_linear_constraints(prob, Alin_x=a[None], blin_x=[10.0])
    make_differentiable(tm.with_consensus(conic))
    make_differentiable(tm.with_settings(prob, adaptive_rho=True))
    make_differentiable_params(tm.with_consensus(prob))


# ------------------------- conic families (hyperplane / SOC active sets)

def _quad_linear(tol=1e-10):
    """Quadrotor with a binding altitude ceiling z <= 0.6 (static
    hyperplane) and wide-open boxes."""
    s = systems.quadrotor_20hz()
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=6, dtype=jnp.float64)
    prob = tm.with_bounds(prob, x_min=-1e9, x_max=1e9, u_min=-1e9, u_max=1e9)
    a = np.zeros(12); a[2] = 1.0
    prob = tm.with_linear_constraints(prob, Alin_x=a[None], blin_x=[0.3])
    return tm.with_settings(prob, max_iter=50000, abs_pri_tol=tol,
                            abs_dua_tol=tol)


def test_grad_hyperplane_matches_fd():
    """An active altitude hyperplane contributes its constraint row: the
    implicit gradient matches finite differences of the solver map."""
    prob = _quad_linear()
    f = make_differentiable(prob)
    x0 = jnp.zeros(12, jnp.float64)
    Xref = jnp.tile(jnp.asarray([0, 0, 1.0] + [0.0] * 9), (6, 1))
    Uref = jnp.zeros((5, 4), jnp.float64)
    sol = f(x0, Xref, Uref)
    assert float(jnp.max(sol.x[:, 2])) >= 0.3 - 1e-6, \
        "test premise: the ceiling must bind"

    def loss(x0, Xref, Uref):
        sol = f(x0, Xref, Uref)
        return jnp.sum(sol.u ** 2) + jnp.sum((sol.x[:, 2] - 1.0) ** 2)

    g = jax.grad(loss, argnums=(0, 1))(x0, Xref, Uref)
    for argi in range(2):
        _fd_check(loss, (x0, Xref, Uref), g, argi, n=4, rtol=5e-3)


def test_grad_tv_hyperplane_matches_fd():
    """Time-varying ceiling schedule: only the binding steps' rows enter."""
    s = systems.quadrotor_20hz()
    N = 6
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=N, dtype=jnp.float64)
    prob = tm.with_bounds(prob, x_min=-1e9, x_max=1e9, u_min=-1e9, u_max=1e9)
    a = np.zeros(12); a[2] = 1.0
    Atv = np.tile(a, (N, 1, 1))                     # (N, 1, 12)
    btv = np.linspace(0.5, 0.15, N)[:, None]       # tightening ceiling
    prob = tm.with_tv_linear_constraints(prob, tv_Alin_x=Atv, tv_blin_x=btv)
    prob = tm.with_settings(prob, max_iter=50000, abs_pri_tol=1e-10,
                            abs_dua_tol=1e-10)
    f = make_differentiable(prob)
    x0 = jnp.zeros(12, jnp.float64)
    Xref = jnp.tile(jnp.asarray([0, 0, 1.0] + [0.0] * 9), (N, 1))
    Uref = jnp.zeros((N - 1, 4), jnp.float64)
    sol = f(x0, Xref, Uref)
    zmax = np.asarray(sol.x[:, 2])
    assert np.any(zmax >= np.asarray(btv[:, 0]) - 1e-6), \
        "test premise: some ceiling step must bind"

    def loss(x0, Xref, Uref):
        sol = f(x0, Xref, Uref)
        return jnp.sum(sol.u ** 2) + jnp.sum((sol.x[:, 2] - 1.0) ** 2)

    g = jax.grad(loss, argnums=(0, 1))(x0, Xref, Uref)
    for argi in range(2):
        _fd_check(loss, (x0, Xref, Uref), g, argi, n=4, rtol=5e-3)


def test_grad_soc_matches_fd():
    """Rocket landing with a binding input thrust cone: the boundary
    tangent row [v/||v||, -mu] linearizes the active cone."""
    s = systems.rocket_landing_20hz()
    N = 8
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=N, f=s["f"], dtype=jnp.float64)
    prob = tm.with_bounds(prob, x_min=-1e9, x_max=1e9, u_min=-1e9, u_max=1e9)
    prob = tm.with_cones(prob, input_cones=[(0, 3, 0.12)])
    prob = tm.with_settings(prob, max_iter=200000, abs_pri_tol=1e-10,
                            abs_dua_tol=1e-10)
    f = make_differentiable(prob)
    x0 = jnp.asarray([4.0, 2.0, 20.0, -3.0, 2.0, -4.5], jnp.float64)
    Xref = jnp.asarray(np.linspace(np.asarray(x0), np.zeros(6), N),
                       jnp.float64)
    Uref = jnp.zeros((N - 1, 3), jnp.float64).at[:, 2].set(10.0)
    sol = f(x0, Xref, Uref)
    u = np.asarray(sol.u)
    ratio = np.linalg.norm(u[:, :2], axis=1) / (0.12 * np.abs(u[:, 2]) + 1e-12)
    n_active = int(np.sum(np.abs(ratio - 1.0) < 1e-4))
    assert n_active > 0, f"test premise: cone must bind (ratios {ratio})"

    def loss(x0, Xref, Uref):
        sol = f(x0, Xref, Uref)
        return jnp.sum(sol.u ** 2) + jnp.sum(sol.x[:, :3] ** 2)

    g = jax.grad(loss, argnums=(0, 1))(x0, Xref, Uref)
    for argi in range(2):
        _fd_check(loss, (x0, Xref, Uref), g, argi, n=4, rtol=5e-3)


def test_param_grads_soc_matches_fd():
    """make_differentiable_params through a binding SOC cone (the flagship
    rocket scenario): gradients w.r.t. A, B, Q, R, f match finite
    differences — sysid through the conic controller."""
    from tinympc_tpu.diff import make_differentiable_params
    s = systems.rocket_landing_20hz()
    N = 8
    template = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                        N=N, f=s["f"], dtype=jnp.float64)
    template = tm.with_bounds(template, x_min=-1e9, x_max=1e9, u_min=-1e9,
                              u_max=1e9)
    template = tm.with_cones(template, input_cones=[(0, 3, 0.12)])
    template = tm.with_settings(template, max_iter=200000,
                                abs_pri_tol=1e-10, abs_dua_tol=1e-10)
    g = make_differentiable_params(template)

    A = jnp.asarray(s["A"], jnp.float64)
    B = jnp.asarray(s["B"], jnp.float64)
    Q = jnp.asarray(s["Qdiag"], jnp.float64)
    R = jnp.asarray(s["Rdiag"], jnp.float64)
    fv = jnp.asarray(s["f"], jnp.float64)
    x0 = jnp.asarray([4.0, 2.0, 20.0, -3.0, 2.0, -4.5], jnp.float64)
    Xref = jnp.asarray(np.linspace(np.asarray(x0), np.zeros(6), N),
                       jnp.float64)
    Uref = jnp.zeros((N - 1, 3), jnp.float64).at[:, 2].set(10.0)

    sol = g(A, B, Q, R, fv, x0, Xref, Uref)
    u = np.asarray(sol.u)
    ratio = np.linalg.norm(u[:, :2], axis=1) / (0.12 * np.abs(u[:, 2]) + 1e-12)
    assert int(np.sum(np.abs(ratio - 1.0) < 1e-4)) > 0, \
        f"test premise: cone must bind (ratios {ratio})"

    def loss(A, B, Q, R, fv):
        sol = g(A, B, Q, R, fv, x0, Xref, Uref)
        return jnp.sum(sol.u ** 2) + jnp.sum(sol.x[:, :3] ** 2)

    args = (A, B, Q, R, fv)
    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)
    for argi in range(5):
        _fd_check_args(loss, args, grads, argi, n=4, rtol=5e-3)


def test_param_grads_hyperplane_matches_fd():
    """make_differentiable_params through a binding altitude hyperplane."""
    from tinympc_tpu.diff import make_differentiable_params
    s = systems.quadrotor_20hz()
    template = _quad_linear(tol=1e-10)
    g = make_differentiable_params(template)

    A = jnp.asarray(s["A"], jnp.float64)
    B = jnp.asarray(s["B"], jnp.float64)
    Q = jnp.asarray(s["Qdiag"], jnp.float64)
    R = jnp.asarray(s["Rdiag"], jnp.float64)
    fv = jnp.zeros(12, jnp.float64)
    x0 = jnp.zeros(12, jnp.float64)
    Xref = jnp.tile(jnp.asarray([0, 0, 1.0] + [0.0] * 9), (6, 1))
    Uref = jnp.zeros((5, 4), jnp.float64)

    sol = g(A, B, Q, R, fv, x0, Xref, Uref)
    assert float(jnp.max(sol.x[:, 2])) >= 0.3 - 1e-6, \
        "test premise: the ceiling must bind"

    def loss(A, B, Q, R, fv):
        sol = g(A, B, Q, R, fv, x0, Xref, Uref)
        return jnp.sum(sol.u ** 2) + jnp.sum((sol.x[:, 2] - 1.0) ** 2)

    args = (A, B, Q, R, fv)
    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)
    for argi in range(5):
        _fd_check_args(loss, args, grads, argi, n=4, rtol=5e-3)


def test_inactive_extra_family_grads_match_fd():
    """A never-binding hyperplane still changes the *effective* QP (each
    enabled slack family cancels one rho from the effective weights —
    tinympc's fixed point solves Q + (2 - n_fam) rho, so adding a family
    undoes the rho augmentation; solutions genuinely differ from the
    box-only problem). The gradient must track that effective problem:
    FD-check the inactive-family config (validates the per-family Hessian
    correction in _kkt_matrix)."""
    s = systems.quadrotor_20hz()
    base = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=6, dtype=jnp.float64)
    base = tm.with_bounds(base, x_min=-1e9, x_max=1e9, u_min=-1e9, u_max=1e9)
    base = tm.with_settings(base, max_iter=50000, abs_pri_tol=1e-11,
                            abs_dua_tol=1e-11)
    a = np.zeros(12); a[2] = 1.0
    lin = tm.with_linear_constraints(base, Alin_x=a[None], blin_x=[50.0])

    x0 = jnp.zeros(12, jnp.float64)
    Xref = jnp.tile(jnp.asarray([0, 0, 1.0] + [0.0] * 9), (6, 1))
    Uref = jnp.zeros((5, 4), jnp.float64)

    f1 = make_differentiable(lin)

    def loss(x0, Xref, Uref):
        sol = f1(x0, Xref, Uref)
        return jnp.sum(sol.u ** 2) + jnp.sum((sol.x[:, 2] - 1.0) ** 2)

    g = jax.grad(loss, argnums=(0, 1))(x0, Xref, Uref)
    for argi in range(2):
        _fd_check(loss, (x0, Xref, Uref), g, argi, n=4, rtol=5e-3)


# ------------------- round-5 cells: adaptive rho, consensus+conic, params

def test_grad_adaptive_rho_matches_fd():
    """Adaptive-rho specs differentiate at the committed final rho
    (piecewise-constant treatment): the forward solve adapts 10x away
    from rho0 (premise-checked) and the adjoint rebuilds the KKT system
    at the committed rho with the Taylor cost-to-go; gradients match FD
    of the actual adaptive solver map."""
    s = systems.cartpole()
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=5.0, N=10,
                    dtype=jnp.float64)
    prob = tm.with_bounds(prob, x_min=-1e9, x_max=1e9, u_min=-0.3, u_max=0.3)
    prob = tm.with_settings(prob, max_iter=50000, abs_pri_tol=1e-11,
                            abs_dua_tol=1e-11, adaptive_rho=True,
                            adaptive_rho_min=0.5, adaptive_rho_max=1000.0)
    sol, _, fc = tm.solve(prob, tm.init_state(prob), Xref=XREF, Uref=UREF,
                          x0=X0)
    assert bool(sol.solved)
    assert float(fc.rho) < 0.6 * 5.0, \
        f"premise: rho must actually adapt (final {float(fc.rho)})"

    f = make_differentiable(prob)

    def loss(x0, Xref, Uref):
        sol = f(x0, Xref, Uref)
        return jnp.sum(sol.u ** 2) + jnp.sum(sol.x[:, 0] ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(X0, XREF, UREF)
    for argi in range(3):
        _fd_check(loss, (X0, XREF, UREF), g, argi, rtol=2e-3)


def test_grad_adaptive_rho_batched_per_problem_rho():
    """Batched adaptive solves commit *different* rho per problem; the
    adjoint builds each problem's KKT at its own committed rho. The
    batched gradient must equal the per-problem unbatched gradients."""
    s = systems.cartpole()
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=5.0, N=10,
                    dtype=jnp.float64)
    prob = tm.with_bounds(prob, x_min=-1e9, x_max=1e9, u_min=-0.3, u_max=0.3)
    prob = tm.with_settings(prob, max_iter=20000, abs_pri_tol=1e-10,
                            abs_dua_tol=1e-10, adaptive_rho=True,
                            adaptive_rho_min=0.5, adaptive_rho_max=1000.0)
    f = make_differentiable(prob)
    x0s = jnp.asarray([[0.5, 0.0, 0.1, 0.0], [-0.2, 0.1, -0.05, 0.02]])

    def loss_b(x0s, Xref, Uref):
        sol = f(x0s, Xref, Uref)
        return jnp.sum(sol.u ** 2) + jnp.sum(sol.x[..., 0] ** 2)

    def loss_1(x0, Xref, Uref):
        sol = f(x0, Xref, Uref)
        return jnp.sum(sol.u ** 2) + jnp.sum(sol.x[:, 0] ** 2)

    gb = jax.grad(loss_b)(x0s, XREF, UREF)
    for b in range(2):
        g1 = jax.grad(loss_1)(x0s[b], XREF, UREF)
        np.testing.assert_allclose(np.asarray(gb[b]), np.asarray(g1),
                                   rtol=1e-8, atol=1e-10)


def test_grad_consensus_conic_matches_fd():
    """Consensus + conic families (round 5): the consensus projection is
    differentiated as one more slack family — the group mean on u_0 —
    inside the group-extended projection system (_ext_matrix_group),
    alongside a binding state hyperplane. FD-validated in float64."""
    # A binding velocity cap (the position barely moves over N=10 steps,
    # so a position ceiling would be either infeasible from t=1 or never
    # active); consensus + hyperplane has a slow ADMM tail, hence the
    # large iteration budget at 1e-9.
    s = systems.cartpole()
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=20.0, N=10,
                    dtype=jnp.float64)
    prob = tm.with_bounds(prob, x_min=-1e9, x_max=1e9, u_min=-1e9, u_max=1e9)
    a = np.zeros(4); a[1] = 1.0
    prob = tm.with_linear_constraints(prob, Alin_x=a[None], blin_x=[0.12])
    prob = tm.with_settings(prob, max_iter=250000, abs_pri_tol=1e-9,
                            abs_dua_tol=1e-9)
    prob = tm.with_consensus(prob, rho_c=20.0)
    f = make_differentiable(prob)
    ng, G = 1, 3
    rng = np.random.default_rng(5)
    x0 = jnp.asarray(rng.uniform(-0.4, 0.4, (ng, G, 4)))

    sol = f(x0, XREF, UREF)
    assert np.asarray(sol.solved).all()
    u0 = np.asarray(sol.u[0])
    assert np.ptp(u0, axis=1).max() < 1e-6, "consensus must couple"
    assert float(np.max(np.asarray(sol.x)[1:, ..., 1])) >= 0.12 - 1e-6, \
        "test premise: the hyperplane must bind"

    def loss(x0, Xref, Uref):
        sol = f(x0, Xref, Uref)
        return jnp.sum(sol.u ** 2) + jnp.sum((sol.x[..., 0] - 0.5) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(x0, XREF, UREF)
    # eps=1e-4: the consensus+hyperplane ADMM tail leaves O(1e-9)
    # solution error, which at eps=1e-6 central differences amplifies to
    # ~1e-3 FD noise. x0/Xref gradients are O(1) and check cleanly;
    # the Uref gradient is genuinely ~0 on this workload (measured FD
    # shrinks 1e-3 -> 1e-5 -> 5e-7 as eps grows 1e-6 -> 1e-4 -> 1e-3,
    # i.e. pure solve-tail noise), so it gets an absolute noise-floor
    # bound instead of a relative FD match.
    for argi in range(2):
        _fd_check(loss, (x0, XREF, UREF), g, argi, n=3, eps=1e-4,
                  rtol=5e-3)
    # arg 2 at eps=1e-3 with an absolute noise-floor slack: Uref[0] is
    # consensus-coupled and its gradient is genuinely ~0, below what FD
    # can resolve against the solve tail at any smaller eps.
    gaf = np.asarray(g[2]).ravel()
    flat = np.asarray(UREF, float).ravel()
    for i in (0, 4, 8):
        eps = 1e-3

        def at(v):
            a = flat.copy(); a[i] = v
            return float(loss(x0, XREF, jnp.asarray(a.reshape(9, 1))))
        fd = (at(flat[i] + eps) - at(flat[i] - eps)) / (2 * eps)
        assert abs(fd - gaf[i]) <= 5e-3 * abs(fd) + 5e-5, \
            f"Uref coord {i}: implicit {gaf[i]}, FD {fd}"
    jax.clear_caches()   # see test_grad_consensus_matches_fd


def test_param_grads_consensus_matches_fd():
    """make_differentiable_params with consensus groups (round 5): the
    group adjoint supplies per-member multipliers; parameter cotangents
    (A, B, Q, R, f) match FD through the coupled solve, including the
    Riccati implicit chain and the consensus-gain rebake."""
    from tinympc_tpu.diff import make_differentiable_params
    s = systems.cartpole()
    template = tm.with_consensus(_cartpole(u_bounds=(-1.5, 1.5), tol=1e-11),
                                 rho_c=20.0)
    g = make_differentiable_params(template)
    ng, G = 1, 2
    rng = np.random.default_rng(6)
    x0 = jnp.asarray(rng.uniform(-0.4, 0.4, (ng, G, 4)))

    A = jnp.asarray(s["A"], jnp.float64)
    B = jnp.asarray(s["B"], jnp.float64)
    Q = jnp.asarray(s["Qdiag"], jnp.float64)
    R = jnp.asarray(s["Rdiag"], jnp.float64)
    fv = jnp.asarray([0.0, 0.01, 0.0, -0.02])
    args = (A, B, Q, R, fv)

    sol = g(A, B, Q, R, fv, x0, XREF, UREF)
    assert np.asarray(sol.solved).all()
    assert np.ptp(np.asarray(sol.u[0]), axis=1).max() < 1e-6

    def loss(A, B, Q, R, fv):
        sol = g(A, B, Q, R, fv, x0, XREF, UREF)
        return (jnp.sum(sol.u ** 2) + jnp.sum(sol.x[..., 0] ** 2)
                + jnp.sum(sol.x[-1] ** 2))

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)
    for argi in range(5):
        _fd_check_args(loss, args, grads, argi, rtol=2e-3)
    jax.clear_caches()
