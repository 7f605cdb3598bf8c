"""Per-leg contact-event state machine + reflexes.

TPU-native re-design of the reference's contact FSM inside the balance
controller (``balance_controller/src/ros_controller/
ros_balance_controller.cpp:233-380, 1086-1140`` with states from
``balance_controller/include/state_switcher/StateSwitcher.hpp:52-72``):
the planner's desired per-leg mode (stance/swing from the gait timers) is
reconciled with *measured* foot contact every control tick, producing the
effective support set used by the force-distribution QP plus swing-leg
reference reflexes:

* ``STANCE_NORMAL``   — planner stance, contact present → load the leg;
* ``SWING_NORMAL``    — planner swing, no contact → track the swing spline;
* ``SWING_EARLY_TD``  — planner swing but the foot already touched in the
  second half of the swing (the base rolled/dropped toward it) → treat as
  stance immediately (:276-312) — this is what catches a falling trunk;
* ``SWING_BUMPED``    — contact in the first half of the swing → obstacle;
  reflex: retract the foot (move back and up, :313-330);
* ``SWING_LATE_TD``   — planner stance but no contact yet → keep the leg in
  swing mode and drive the foot straight down at touchdown speed
  (:331-352);
* ``STANCE_LOST``     — loaded leg lost contact → freeze joints (:353-358).

Everything is a masked, stateless map (the reference's StateSwitcher
memory is only used for logging): runs inside ``lax.scan`` and vmaps over
scenario batches.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

STANCE_NORMAL = 0
SWING_NORMAL = 1
SWING_EARLY_TD = 2
SWING_BUMPED = 3
SWING_LATE_TD = 4
STANCE_LOST = 5

# Fraction of the swing phase after which a touch counts as (early)
# touchdown rather than an obstacle bump (:276 uses the descending part
# of the trajectory; half-phase is the profile apex for the default
# triangle profile).
EARLY_TD_PHASE = 0.5


class FsmOutput(NamedTuple):
    support: jax.Array  # (4,) bool — legs the QP should load
    leg_state: jax.Array  # (4,) int32 — one of the codes above
    late_touchdown: jax.Array  # (4,) bool — drive foot down reflex
    bumped: jax.Array  # (4,) bool — retract reflex


def contact_fsm(
    desired_support: jax.Array,  # (4,) bool from the gait phase machine
    contact: jax.Array,  # (4,) bool measured foot contact
    swing_phase: jax.Array,  # (4,) seconds into the swing
    t_swing: jax.Array,  # scalar
) -> FsmOutput:
    """One reconciliation tick (≙ the top of RosBalanceController::update)."""
    late_phase = swing_phase >= EARLY_TD_PHASE * t_swing

    early_td = (~desired_support) & contact & late_phase
    bumped = (~desired_support) & contact & (~late_phase)
    late_td = desired_support & (~contact)

    support = (desired_support & contact) | early_td

    leg_state = jnp.where(
        desired_support & contact,
        STANCE_NORMAL,
        jnp.where(
            early_td,
            SWING_EARLY_TD,
            jnp.where(
                bumped,
                SWING_BUMPED,
                jnp.where(late_td, SWING_LATE_TD, SWING_NORMAL),
            ),
        ),
    ).astype(jnp.int32)

    return FsmOutput(
        support=support,
        leg_state=leg_state,
        late_touchdown=late_td,
        bumped=bumped,
    )


def apply_swing_reflexes(
    pos_ref: jax.Array,  # (4,3) world swing references from the splines
    vel_ref: jax.Array,  # (4,3)
    acc_ref: jax.Array,  # (4,3)
    feet_world: jax.Array,  # (4,3) measured foot positions
    fsm: FsmOutput,
    ground_height: jax.Array | float = 0.0,
    touchdown_speed: float = 0.10,
    retract_height: float = 0.05,
):
    """Reference overrides for late-touchdown and bump reflexes.

    Late TD (:331-352): hold the horizontal target, drive z down at the
    touchdown speed from the *measured* foot height. Bump (:313-330):
    move the foot up (and the horizontal reference back toward the
    current position).
    """
    dtype = pos_ref.dtype
    gz = jnp.asarray(ground_height, dtype)

    down = fsm.late_touchdown[:, None]
    pos_down = jnp.stack(
        [pos_ref[:, 0], pos_ref[:, 1], jnp.minimum(feet_world[:, 2] - 0.01, gz)],
        axis=1,
    )
    vel_down = jnp.stack(
        [
            jnp.zeros(4, dtype),
            jnp.zeros(4, dtype),
            jnp.full((4,), -touchdown_speed, dtype),
        ],
        axis=1,
    )

    up = fsm.bumped[:, None]
    pos_up = jnp.stack(
        [feet_world[:, 0], feet_world[:, 1], feet_world[:, 2] + retract_height],
        axis=1,
    )

    zero = jnp.zeros_like(pos_ref)
    pos = jnp.where(down, pos_down, jnp.where(up, pos_up, pos_ref))
    vel = jnp.where(down, vel_down, jnp.where(up, zero, vel_ref))
    acc = jnp.where(down | up, zero, acc_ref)
    return pos, vel, acc
