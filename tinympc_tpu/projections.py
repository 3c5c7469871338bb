"""Branch-free constraint projections.

The reference implements these with data-dependent branches and per-element
loops (/root/reference/src/tinympc/admm.cpp:39-73); on TPU every projection
is a vectorised ``jnp.where`` applied to whole (horizon, *batch, dim)
arrays at once.

Deviations from the reference (documented, intentional):
  * ``project_soc`` supports any cone dimension. The reference hard-codes a
    compile-time dim-3 temporary (admm.cpp:53) and aborts for other sizes.
  * The reference truncates the cone norm and mu to float32 mid-computation
    (admm.cpp:39-42 mixes ``float`` with double ``tinytype``); here the
    computation stays in the working dtype.
"""
from __future__ import annotations

import jax.numpy as jnp


def project_box(s, smin, smax):
    """Clamp to [smin, smax] (admm.cpp:92,97: ``max.cwiseMin(min.cwiseMax(s))``)."""
    return jnp.minimum(smax, jnp.maximum(smin, s))


def project_soc(s, mu):
    """Second-order-cone projection on the last axis (admm.cpp:39-60).

    Three cases with ``u0 = mu * s[-1]``, ``a = ||s[:-1]||``:
    below (``a <= -u0``) -> 0; inside (``a <= u0``) -> s;
    outside -> ``0.5*(1 + u0/a) * [s[:-1]; a/mu]``.
    """
    u0 = s[..., -1] * mu
    v = s[..., :-1]
    a = jnp.sqrt(jnp.sum(v * v, axis=-1))
    below = a <= -u0
    inside = a <= u0
    safe_a = jnp.where(a > 0, a, jnp.ones_like(a))
    scale = 0.5 * (1.0 + u0 / safe_a)
    outside = scale[..., None] * jnp.concatenate([v, (a / mu)[..., None]], axis=-1)
    return jnp.where(
        below[..., None],
        jnp.zeros_like(s),
        jnp.where(inside[..., None], s, outside),
    )


def project_hyperplane_if_violated(z, a, b):
    """Project z onto {z : a.z = b} only where a.z > b (admm.cpp:70-73 with
    the violation gate of admm.cpp:154). ``a`` broadcasts against
    ``z[..., :]``; ``b`` against ``z[..., 0]``."""
    val = jnp.sum(z * a, axis=-1)
    dist = (val - b) / jnp.sum(a * a, axis=-1)
    proj = z - dist[..., None] * a
    return jnp.where((val > b)[..., None], proj, z)
