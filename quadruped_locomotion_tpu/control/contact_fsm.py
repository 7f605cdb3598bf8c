"""Per-leg contact-event state machine with memory + reflexes.

TPU-native re-design of the reference's contact FSM inside the balance
controller: the transition function lives in
``balance_controller/src/ros_controller/ros_balance_controller.cpp:
1086-1140`` (the foot-contacts callback), the per-state reactions in the
update loop (:233-380), and the state codes in
``balance_controller/include/state_switcher/StateSwitcher.hpp:52-72``.
The planner's desired per-leg mode (stance/swing from the gait timers) is
reconciled with *measured* foot contact every control tick, producing the
effective support set used by the force-distribution QP plus swing-leg
reference reflexes.

All nine StateSwitcher states are represented:

* ``INIT``               — before the first reconciliation (support);
* ``STANCE_NORMAL``      — planner stance, contact present → load the leg;
* ``STANCE_SLIPPING``    — stance + contact but the foot is translating
  tangentially faster than ``slip_speed_threshold``. The reference
  declares this state but never reacts to it (detect-only); we emit it
  when the caller provides foot speeds and keep the reaction identical
  to ``STANCE_NORMAL``;
* ``STANCE_LOST``        — loaded leg lost contact deep into stance
  (normalized stance phase > 0.5, :1132-1137) → unload and FREEZE the
  joints at the positions stored on entry (:341-358 store/hold);
* ``SWING_NORMAL``       — planner swing, no contact → track the spline;
* ``SWING_LATE_LIFTOFF`` — contact in the lift-off grace window
  (normalized swing phase ≤ 0.2). The reference leaves the state code at
  ``SwingNormal`` here (:1103-1115 only fires past 0.2) — we surface the
  declared ``SwingLateLiftOff`` code instead, with the identical
  (no-reflex, non-support) reaction;
* ``SWING_EARLY_TD``     — contact in the second half of the swing
  (phase > 0.5, :1103-1108) → treat as stance immediately; this is what
  catches a falling trunk;
* ``SWING_BUMPED``       — contact at phase ∈ (0.2, 0.5] (:1110-1115) →
  obstacle; reflex: retract the foot (back and up, :313-330);
* ``SWING_LATE_TD``      — planner stance but no contact just after the
  expected touchdown (stance phase < 0.1, :1128-1129) → keep the leg
  unloaded and drive the foot straight down (:331-340).

Memory (the reference's StateSwitcher keeps the previous state; the
controller's transition function only *overwrites* it under explicit
conditions): a desired-stance leg with no contact at normalized stance
phase ∈ [0.1, 0.5] HOLDS its previous state (:1126-1137 assigns nothing
there) — so ``SWING_LATE_TD`` latches from touchdown until contact or
until the 0.5 lost-contact threshold, instead of oscillating with the
contact sensor. The stored freeze posture persists through the latch via
``store_flag`` exactly like ``store_current_joint_state_flag_``
(:250-252, 341-358).

Everything is a masked fixed-shape map over a small
:class:`FsmState` pytree: runs inside ``lax.scan`` and vmaps over
scenario batches.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

# State codes ≙ StateSwitcher::States (StateSwitcher.hpp:52-72), same order.
INIT = 0
STANCE_NORMAL = 1
STANCE_SLIPPING = 2
STANCE_LOST = 3
SWING_NORMAL = 4
SWING_LATE_LIFTOFF = 5
SWING_EARLY_TD = 6
SWING_BUMPED = 7
SWING_LATE_TD = 8

# Normalized-phase thresholds from the reference transition function
# (ros_balance_controller.cpp:1103, 1110, 1128, 1132).
EARLY_TD_PHASE = 0.5  # contact past this swing phase = touchdown
BUMP_PHASE = 0.2  # contact past this (but before EARLY_TD) = obstacle
LATE_TD_PHASE = 0.1  # no contact before this stance phase = late TD
LOST_CONTACT_PHASE = 0.5  # no contact past this stance phase = lost

DEFAULT_SLIP_SPEED = 0.15  # m/s tangential foot speed ⇒ slipping


@struct.dataclass
class FsmState:
    """Per-leg FSM memory carried through the control scan."""

    leg_state: jax.Array  # (4,) int32 — one of the codes above
    stored_q: jax.Array  # (4,3) joint positions stored at freeze entry
    store_flag: jax.Array  # (4,) bool ≙ store_current_joint_state_flag_


def init_fsm_state(dtype=jnp.float32) -> FsmState:
    """All legs in ``INIT`` (support until reconciled, :364-370)."""
    return FsmState(
        leg_state=jnp.full((4,), INIT, jnp.int32),
        stored_q=jnp.zeros((4, 3), dtype),
        store_flag=jnp.zeros((4,), bool),
    )


class FsmOutput(NamedTuple):
    support: jax.Array  # (4,) bool — legs the QP should load
    leg_state: jax.Array  # (4,) int32 — one of the codes above
    late_touchdown: jax.Array  # (4,) bool — drive-foot-down reflex
    bumped: jax.Array  # (4,) bool — retract reflex
    freeze: jax.Array  # (4,) bool — joint-freeze reflex (lost contact)
    q_freeze: jax.Array  # (4,3) joint positions to hold when frozen


def fsm_step(
    fsm: FsmState,
    desired_support: jax.Array,  # (4,) bool from the gait/step planner
    contact: jax.Array,  # (4,) bool measured foot contact
    swing_phase: jax.Array,  # (4,) normalized ∈ [0,1]
    stance_phase: jax.Array,  # (4,) normalized ∈ [0,1]
    q: jax.Array,  # (4,3) measured joint positions
    is_footstep: jax.Array | None = None,  # (4,) bool — reflexes enabled
    foot_speed_tangential: jax.Array | None = None,  # (4,) m/s (slip det.)
    slip_speed_threshold: float = DEFAULT_SLIP_SPEED,
) -> tuple[FsmState, FsmOutput]:
    """One reconciliation tick — transition (≙ footContactsCallback,
    :1086-1140) + reaction (≙ the update-loop switch, :233-380).

    ``is_footstep`` mirrors the reference's ``is_footstep_`` flags: only
    legs executing a footstep motion engage the touchdown/bump/lost
    machinery; other legs are plain stance/swing (:1101-1102, 1121-1125).
    """
    if is_footstep is None:
        is_footstep = jnp.ones(4, bool)

    prev = fsm.leg_state

    # --- desired swing (:1097-1117) --------------------------------------
    early_td = contact & (swing_phase > EARLY_TD_PHASE)
    bumped_now = contact & (swing_phase > BUMP_PHASE) & ~early_td
    late_liftoff = contact & (swing_phase <= BUMP_PHASE)
    swing_state = jnp.where(
        is_footstep & early_td,
        SWING_EARLY_TD,
        jnp.where(
            is_footstep & bumped_now,
            SWING_BUMPED,
            jnp.where(is_footstep & late_liftoff, SWING_LATE_LIFTOFF,
                      SWING_NORMAL),
        ),
    )

    # --- desired stance (:1119-1138) --------------------------------------
    if foot_speed_tangential is None:
        slipping = jnp.zeros(4, bool)
    else:
        slipping = foot_speed_tangential > slip_speed_threshold
    stance_contact = jnp.where(slipping, STANCE_SLIPPING, STANCE_NORMAL)
    # No contact: late TD before 0.1, lost past 0.5, previous state held
    # in between (the memory region). A held INIT resolves to LATE_TD so
    # a leg that never touched down does not report INIT forever.
    held = jnp.where(prev == INIT, SWING_LATE_TD, prev)
    stance_nocontact = jnp.where(
        stance_phase < LATE_TD_PHASE,
        SWING_LATE_TD,
        jnp.where(stance_phase > LOST_CONTACT_PHASE, STANCE_LOST, held),
    )
    stance_state = jnp.where(
        ~is_footstep | contact, stance_contact, stance_nocontact
    )

    leg_state = jnp.where(desired_support, stance_state, swing_state).astype(
        jnp.int32
    )

    # --- reactions (:233-380) ---------------------------------------------
    support = (
        (leg_state == STANCE_NORMAL)
        | (leg_state == STANCE_SLIPPING)
        | (leg_state == SWING_EARLY_TD)
        | (leg_state == INIT)
    )
    late_td = leg_state == SWING_LATE_TD
    bumped = leg_state == SWING_BUMPED
    freeze = leg_state == STANCE_LOST

    # Freeze-posture store-once (:250-252, 341-358): capture q on entry
    # into a freezing state, clear the flag back in a normal state.
    freezing = freeze | late_td
    entering = freezing & ~fsm.store_flag
    stored_q = jnp.where(entering[:, None], q, fsm.stored_q)
    normal = (leg_state == STANCE_NORMAL) | (leg_state == SWING_NORMAL)
    store_flag = (fsm.store_flag | entering) & ~normal

    out = FsmOutput(
        support=support,
        leg_state=leg_state,
        late_touchdown=late_td,
        bumped=bumped,
        freeze=freeze,
        q_freeze=stored_q,
    )
    return FsmState(
        leg_state=leg_state, stored_q=stored_q, store_flag=store_flag
    ), out


def contact_fsm(
    desired_support: jax.Array,
    contact: jax.Array,
    swing_phase: jax.Array,  # (4,) seconds into the swing
    t_swing: jax.Array,  # scalar
) -> FsmOutput:
    """Stateless single-tick reconciliation (no memory, no lost-contact
    detection) — kept for callers without a carried :class:`FsmState`.
    Equivalent to :func:`fsm_step` from a fresh state at mid-stance."""
    t = jnp.maximum(jnp.asarray(t_swing, swing_phase.dtype), 1e-6)
    fsm0 = FsmState(
        leg_state=jnp.full((4,), STANCE_NORMAL, jnp.int32),
        stored_q=jnp.zeros((4, 3), swing_phase.dtype),
        store_flag=jnp.zeros((4,), bool),
    )
    # mid-stance phase: no-contact stance legs report late-TD via the
    # held-INIT path only below 0.1 — match the old behavior (always
    # drive down) by pinning the stance phase to 0.
    _, out = fsm_step(
        fsm0,
        desired_support,
        contact,
        swing_phase / t,
        jnp.zeros(4, swing_phase.dtype),
        jnp.zeros((4, 3), swing_phase.dtype),
    )
    return out


def apply_swing_reflexes(
    pos_ref: jax.Array,  # (4,3) world swing references from the splines
    vel_ref: jax.Array,  # (4,3)
    acc_ref: jax.Array,  # (4,3)
    feet_world: jax.Array,  # (4,3) measured foot positions
    fsm: FsmOutput,
    ground_height: jax.Array | float = 0.0,
    touchdown_speed: float = 0.10,
    retract_height: float = 0.05,
    retract_back: float = 0.0125,
):
    """Reference overrides for late-touchdown and bump reflexes.

    Late TD (:331-340): hold the horizontal target, drive z down at the
    touchdown speed from the *measured* foot height. Bump (:313-330):
    move the foot up and back (the reference retreats −x/+z in the base
    frame at a 1:4 ratio per tick; we target the equivalent absolute
    offset from the measured foot position).
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
        [
            feet_world[:, 0] - retract_back,
            feet_world[:, 1],
            feet_world[:, 2] + retract_height,
        ],
        axis=1,
    )

    zero = jnp.zeros_like(pos_ref)
    pos = jnp.where(down, pos_down, jnp.where(up, pos_up, pos_ref))
    vel = jnp.where(down, vel_down, jnp.where(up, zero, vel_ref))
    acc = jnp.where(down | up, zero, acc_ref)
    return pos, vel, acc
