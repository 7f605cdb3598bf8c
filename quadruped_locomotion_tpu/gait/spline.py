"""Fixed-knot cubic Hermite splines (the `curves` library, TPU-style).

The reference fits swing-foot and base trajectories with the ETH `curves`
CubicHermiteE3Curve through a variable number of knots
(``free_gait_core/src/leg_motion/Footstep.cpp:105``,
``BaseAuto.cpp:453``). On TPU, knot counts must be static: we pad every
trajectory to MAX_KNOTS and mask, so a single `scan` program evaluates
any profile.

Interior tangents are Catmull-Rom (centered finite differences), endpoint
tangents are caller-specified (lift-off / touchdown velocities) — the
same boundary semantics as ``fitCurveWithDerivatives``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

MAX_KNOTS = 5  # trapezoid profile uses 5; others padded up


@struct.dataclass
class HermiteSpline:
    """Padded cubic-Hermite spline through up to MAX_KNOTS knots in R³."""

    times: jax.Array  # (K,) non-decreasing; padded by repeating t_end
    values: jax.Array  # (K,3)
    tangents: jax.Array  # (K,3) derivative at each knot
    num_knots: jax.Array  # scalar int32
    duration: jax.Array  # scalar

    def evaluate(self, t: jax.Array) -> jax.Array:
        return _eval(self, t, 0)

    def velocity(self, t: jax.Array) -> jax.Array:
        return _eval(self, t, 1)

    def acceleration(self, t: jax.Array) -> jax.Array:
        return _eval(self, t, 2)


def fit(
    times: jax.Array,
    values: jax.Array,
    start_velocity: jax.Array,
    end_velocity: jax.Array,
    num_knots: jax.Array | int,
) -> HermiteSpline:
    """Fit with given endpoint derivatives; Catmull-Rom interior tangents.

    ``times``/``values`` must be padded to MAX_KNOTS by repeating the final
    knot (mask-safe: repeated knots produce zero-length segments that the
    evaluator never selects).
    """
    k = jnp.asarray(num_knots, jnp.int32)
    idx = jnp.arange(MAX_KNOTS)
    last = k - 1

    prev_i = jnp.clip(idx - 1, 0, MAX_KNOTS - 1)
    next_i = jnp.clip(idx + 1, 0, last)
    dt = times[next_i] - times[prev_i]
    safe_dt = jnp.where(dt > 1e-9, dt, 1.0)
    catmull = (values[next_i] - values[prev_i]) / safe_dt[:, None]

    is_start = idx == 0
    is_end = idx >= last
    tangents = jnp.where(
        is_start[:, None],
        start_velocity[None, :],
        jnp.where(is_end[:, None], end_velocity[None, :], catmull),
    )
    duration = times[last] - times[0]
    return HermiteSpline(
        times=times,
        values=values,
        tangents=tangents,
        num_knots=k,
        duration=duration,
    )


def _eval(sp: HermiteSpline, t: jax.Array, deriv: int) -> jax.Array:
    t = jnp.clip(t, sp.times[0], sp.times[sp.num_knots - 1])
    # segment index: last knot with time <= t (among real knots)
    idx = jnp.arange(MAX_KNOTS)
    valid = idx < sp.num_knots - 1
    seg = jnp.sum(
        jnp.where(valid & (sp.times[: MAX_KNOTS] <= t), 1, 0)
    ) - 1
    seg = jnp.clip(seg, 0, MAX_KNOTS - 2)

    t0 = sp.times[seg]
    t1 = sp.times[seg + 1]
    # Degenerate (zero-length / padded) segments must short-circuit: the
    # Hermite basis cancels only up to rounding, and XLA's fma
    # reassociation turns that ~1 ulp residue into garbage once divided
    # by h² — masking with `where` keeps jit and eager bit-identical.
    h_raw = t1 - t0
    ok = h_raw > 1e-6
    h = jnp.where(ok, h_raw, 1.0)
    s = (t - t0) / h

    p0, p1 = sp.values[seg], sp.values[seg + 1]
    m0, m1 = sp.tangents[seg] * h, sp.tangents[seg + 1] * h

    if deriv == 0:
        h00 = 2 * s**3 - 3 * s**2 + 1
        h10 = s**3 - 2 * s**2 + s
        h01 = -2 * s**3 + 3 * s**2
        h11 = s**3 - s**2
        val = h00 * p0 + h10 * m0 + h01 * p1 + h11 * m1
        return jnp.where(ok, val, p0)
    if deriv == 1:
        h00 = 6 * s**2 - 6 * s
        h10 = 3 * s**2 - 4 * s + 1
        h01 = -6 * s**2 + 6 * s
        h11 = 3 * s**2 - 2 * s
        val = (h00 * p0 + h10 * m0 + h01 * p1 + h11 * m1) / h
        return jnp.where(ok, val, 0.0)
    h00 = 12 * s - 6
    h10 = 6 * s - 4
    h01 = -12 * s + 6
    h11 = 6 * s - 2
    val = (h00 * p0 + h10 * m0 + h01 * p1 + h11 * m1) / (h * h)
    return jnp.where(ok, val, 0.0)
