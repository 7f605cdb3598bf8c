"""Swing-foot trajectory generation (knot profiles + timing + Hermite fit).

≙ ``free_gait_core/src/leg_motion/Footstep.cpp``:

* knot profiles triangle/square/straight/trapezoid (:262-330),
* timing from average velocity with minimum-duration rescale (:332-347),
* Hermite fit with lift-off/touchdown velocity boundary conditions
  (:76-109), evaluation of pos/vel/acc (:134-156).

Defaults from ``StepParameters.hpp:24-85``: triangle profile, height
0.08 m, average velocity 0.65 m/s, lift-off speed 0.2 m/s, touchdown
speed 0.05 m/s, minimum duration 0.3 s.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .spline import MAX_KNOTS, HermiteSpline, fit

PROFILE_TRIANGLE = 0
PROFILE_SQUARE = 1
PROFILE_STRAIGHT = 2
PROFILE_TRAPEZOID = 3

DEFAULT_PROFILE_HEIGHT = 0.08
DEFAULT_AVERAGE_VELOCITY = 0.65
DEFAULT_LIFTOFF_SPEED = 0.2
DEFAULT_TOUCHDOWN_SPEED = 0.05
DEFAULT_MIN_DURATION = 0.3


def _triangle_knots(start, target, height):
    basis = jnp.maximum(start[2], target[2])
    knot2 = start + 0.5 * (target - start)
    knot2 = knot2.at[2].set(basis + height)
    vals = jnp.stack([start, knot2, target, target, target])
    return vals, 3


def _square_knots(start, target, height):
    basis = jnp.maximum(start[2], target[2]) + height
    k2 = jnp.stack([start[0], start[1], basis])
    k3 = jnp.stack([target[0], target[1], basis])
    vals = jnp.stack([start, k2, k3, target, target])
    return vals, 4


def _straight_knots(start, target, height):
    vals = jnp.stack([start, target, target, target, target])
    return vals, 2


def _trapezoid_knots(start, target, height):
    k2 = start + 0.1 * (target - start)
    k2 = k2.at[2].set(start[2] + height)
    k4 = start + 0.9 * (target - start)
    k4 = k4.at[2].set(target[2] + height)
    k3 = k2 + 0.5 * (k4 - k2)
    k3 = k3.at[2].set(k4[2])
    vals = jnp.stack([start, k2, k3, k4, target])
    return vals, 5


def compute_timing(values, num_knots, average_velocity, min_duration):
    """Knot times from inter-knot distance / average velocity, rescaled to
    the minimum duration when too fast (≙ Footstep::computeTiming)."""
    deltas = jnp.linalg.norm(values[1:] - values[:-1], axis=-1)
    idx = jnp.arange(MAX_KNOTS - 1)
    deltas = jnp.where(idx < num_knots - 1, deltas, 0.0)
    times = jnp.concatenate(
        [jnp.zeros((1,), values.dtype), jnp.cumsum(deltas / average_velocity)]
    )
    total = times[num_knots - 1]
    scale = jnp.where(total < min_duration, min_duration / jnp.maximum(total, 1e-9), 1.0)
    return times * scale


def swing_trajectory(
    start: jax.Array,
    target: jax.Array,
    surface_normal: jax.Array | None = None,
    profile: int | jax.Array = PROFILE_TRIANGLE,
    profile_height: float = DEFAULT_PROFILE_HEIGHT,
    average_velocity: float = DEFAULT_AVERAGE_VELOCITY,
    liftoff_speed: float = DEFAULT_LIFTOFF_SPEED,
    touchdown_speed: float = DEFAULT_TOUCHDOWN_SPEED,
    min_duration: float = DEFAULT_MIN_DURATION,
) -> HermiteSpline:
    """Build one swing-foot spline (any frame; reference uses base frame).

    All four knot profiles are computed and the active one selected with
    ``lax.switch``-free gather (profiles are cheap), keeping the function
    branch-free for vmap over legs/scenarios with mixed profiles.
    """
    dtype = start.dtype
    if surface_normal is None:
        surface_normal = jnp.array([0.0, 0.0, 1.0], dtype)
    h = jnp.asarray(profile_height, dtype)

    vals_tri, n_tri = _triangle_knots(start, target, h)
    vals_sq, n_sq = _square_knots(start, target, h)
    vals_st, n_st = _straight_knots(start, target, h)
    vals_tr, n_tr = _trapezoid_knots(start, target, h)
    all_vals = jnp.stack([vals_tri, vals_sq, vals_st, vals_tr])
    all_n = jnp.array([n_tri, n_sq, n_st, n_tr], jnp.int32)

    p = jnp.asarray(profile, jnp.int32)
    values = all_vals[p]
    num_knots = all_n[p]

    times = compute_timing(
        values, num_knots, jnp.asarray(average_velocity, dtype),
        jnp.asarray(min_duration, dtype),
    )
    # pad times beyond num_knots with the end time (zero-length segments)
    t_end = times[num_knots - 1]
    idx = jnp.arange(MAX_KNOTS)
    times = jnp.where(idx < num_knots, times, t_end)

    lift_vel = jnp.array([0.0, 0.0, 1.0], dtype) * liftoff_speed
    touch_vel = -jnp.asarray(touchdown_speed, dtype) * surface_normal
    return fit(times, values, lift_vel, touch_vel, num_knots)
