"""Step schedules: the free_gait planning core as data + a scan executor.

TPU-native re-design of ``free_gait_core``'s Step/StepQueue/StepCompleter/
Executor machinery (SURVEY.md §2.4): instead of a mutable deque of
polymorphic Step objects advanced by a threaded executor
(``Executor.cpp:52-132``), a motion script compiles to a fixed-shape
:class:`StepSchedule` (stacked per-step arrays), and :func:`advance`
is a pure function advancing an :class:`ExecState` by one planner tick
inside ``lax.scan``:

* step entry ≙ ``StepCompleter::complete`` (:36-86): swing splines are
  built from the *current* foot positions toward the step's targets,
  durations from path-length / average velocity with the 0.3 s minimum
  (``StepParameters.hpp:24-85``), and the base motion is resolved —
  ``base_auto`` runs the pose-optimization cascade over the step's final
  stance (``BaseAuto.cpp:292-455``), ``base_target`` uses the given pose;
* each tick evaluates the swing splines (``Executor::writeLegMotion``,
  :352-443) and the base SE(3) interpolation
  (``Executor::writeTorsoMotion``, :445-483);
* finished steps advance the index (``StepQueue::advance``, :79-120);
  past the end the executor holds the final stance (stand).

The outputs per tick — (support, swing foot pos/vel/acc in world,
BaseTarget) — are exactly the gait engine's interface, so scripted
steps drive the same balance controller + plant closed loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..gait.footstep import (
    DEFAULT_AVERAGE_VELOCITY,
    DEFAULT_MIN_DURATION,
    DEFAULT_PROFILE_HEIGHT,
    PROFILE_TRIANGLE,
    swing_trajectory,
)
from ..gait.spline import HermiteSpline, MAX_KNOTS
from ..types import BaseTarget, RobotModel
from ..utils.rotations import (
    quat_exp,
    quat_log,
    quat_conj,
    quat_mul,
    quat_normalize,
)
from . import pose_optimization as po

BASE_NONE = 0
BASE_AUTO = 1
BASE_TARGET = 2

DEFAULT_BASE_AVG_LIN = 0.2  # StepParameters.hpp BaseAuto average linear vel
DEFAULT_BASE_AVG_ANG = 0.28


@struct.dataclass
class StepSchedule:
    """Stacked per-step specs; leading axis = step index (static length)."""

    # leg motions (footsteps)
    leg_active: jax.Array  # (S,4) bool
    leg_target: jax.Array  # (S,4,3) world-frame foothold targets
    leg_profile: jax.Array  # (S,4) int32
    leg_profile_height: jax.Array  # (S,4)
    leg_avg_velocity: jax.Array  # (S,4)
    # base motion
    base_mode: jax.Array  # (S,) int32
    base_height: jax.Array  # (S,) nominal height for base_auto
    base_target_pos: jax.Array  # (S,3) world (base_target mode)
    base_target_quat: jax.Array  # (S,4) wxyz (base_target mode)
    base_avg_lin: jax.Array  # (S,)
    base_avg_ang: jax.Array  # (S,)

    @property
    def num_steps(self) -> int:
        return self.leg_active.shape[0]


@struct.dataclass
class ExecState:
    """Executor bookkeeping carried through the scan."""

    step_index: jax.Array  # scalar int32
    time_in_step: jax.Array  # scalar
    step_duration: jax.Array  # scalar
    base_duration: jax.Array  # scalar — base shift completes first
    leg_start: jax.Array  # scalar — when leg motions begin
    leg_duration: jax.Array  # (4,) per-leg swing durations this step
    leg_active: jax.Array  # (4,) bool
    splines: HermiteSpline  # per-leg, leading (4,) axis
    # base interpolation endpoints for this step
    base_pos0: jax.Array  # (3,)
    base_quat0: jax.Array  # (4,)
    base_pos1: jax.Array  # (3,)
    base_quat1: jax.Array  # (4,)
    done: jax.Array  # bool — schedule exhausted


def _empty_splines(feet_world):
    vals = jnp.tile(feet_world[:, None, :], (1, MAX_KNOTS, 1))
    return HermiteSpline(
        times=jnp.zeros((4, MAX_KNOTS), feet_world.dtype),
        values=vals,
        tangents=jnp.zeros_like(vals),
        num_knots=jnp.full((4,), 2, jnp.int32),
        duration=jnp.zeros((4,), feet_world.dtype),
    )


def init_exec_state(feet_world, base_pos, base_quat) -> ExecState:
    dtype = feet_world.dtype
    return ExecState(
        step_index=jnp.asarray(-1, jnp.int32),  # first advance enters step 0
        time_in_step=jnp.asarray(jnp.inf, dtype),
        step_duration=jnp.asarray(0.0, dtype),
        base_duration=jnp.asarray(0.0, dtype),
        leg_start=jnp.asarray(0.0, dtype),
        leg_duration=jnp.zeros(4, dtype),
        leg_active=jnp.zeros(4, bool),
        splines=_empty_splines(feet_world),
        base_pos0=base_pos,
        base_quat0=base_quat,
        base_pos1=base_pos,
        base_quat1=base_quat,
        done=jnp.asarray(False),
    )


def _enter_step(
    model: RobotModel,
    sched: StepSchedule,
    idx,
    feet_world,
    base_pos,
    base_quat,
):
    """StepCompleter: resolve one step's motions from the current state."""
    dtype = feet_world.dtype
    i = jnp.clip(idx, 0, sched.num_steps - 1)
    active = sched.leg_active[i]
    targets = sched.leg_target[i]
    prof = sched.leg_profile[i]
    ph = sched.leg_profile_height[i]
    av = sched.leg_avg_velocity[i]

    def build(start, target, profile, height, avg_v):
        return swing_trajectory(
            start,
            target,
            profile=profile,
            profile_height=height,
            average_velocity=avg_v,
        )

    splines = jax.vmap(build)(feet_world, targets, prof, ph, av)
    # inactive legs: degenerate hold-position splines
    hold = _empty_splines(feet_world)
    splines = jax.tree_util.tree_map(
        lambda a, b: jnp.where(
            active.reshape((-1,) + (1,) * (a.ndim - 1)), a, b
        ),
        splines,
        hold,
    )
    leg_dur = jnp.where(active, splines.duration, 0.0)

    # Final stance of this step: active legs at their targets.
    final_feet = jnp.where(active[:, None], targets, feet_world)

    mode = sched.base_mode[i]
    # base_auto ≙ BaseAuto foothold lists (:327-392): nominal-stance cost
    # over the footholds to reach (final stance), CoM constrained to the
    # polygon of the legs that KEEP support during the motion, with the
    # default 0.04 margin — this is what shifts the torso over the
    # support triangle before a leg lifts.
    auto_pose = po.optimize_pose(
        model,
        final_feet,
        jnp.ones(4, bool),
        height=sched.base_height[i],
        margin=0.04,
        polygon_feet=feet_world,
        polygon_support=~active,
    )
    pos1 = jnp.where(
        mode == BASE_TARGET,
        sched.base_target_pos[i],
        jnp.where(mode == BASE_AUTO, auto_pose.position, base_pos),
    )
    quat1 = jnp.where(
        mode == BASE_TARGET,
        sched.base_target_quat[i],
        jnp.where(mode == BASE_AUTO, auto_pose.quaternion, base_quat),
    )

    # Two-phase timing (documented deviation from the reference's
    # simultaneous motion timelines, Step.cpp:105-196): the base shift
    # completes FIRST, then the leg motions start. Lifting a foot while
    # the CoM still sits on the old support edge tips the robot in
    # ~sqrt(h/g)=0.2 s, far faster than the base tracks its target —
    # weight shift before lift-off is how a static walk is stable at all.
    lin_dist = jnp.linalg.norm(pos1 - base_pos)
    ang_dist = jnp.linalg.norm(quat_log(quat_mul(quat_conj(base_quat), quat1)))
    base_dur = jnp.where(
        mode == BASE_NONE,
        0.0,
        jnp.maximum(
            lin_dist / sched.base_avg_lin[i],
            ang_dist / sched.base_avg_ang[i],
        ),
    )
    any_leg = jnp.any(active)
    leg_start = jnp.where(any_leg, base_dur, 0.0)
    duration = jnp.maximum(
        leg_start + jnp.max(leg_dur),
        jnp.maximum(base_dur, DEFAULT_MIN_DURATION),
    )
    return active, splines, leg_dur, pos1, quat1, duration, base_dur, leg_start


def advance(
    model: RobotModel,
    sched: StepSchedule,
    es: ExecState,
    feet_world: jax.Array,
    base_pos: jax.Array,
    base_quat: jax.Array,
    dt,
):
    """One planner tick. Returns (new ExecState, support (4,), swing
    (pos, vel, acc) world (4,3) each, BaseTarget)."""
    dtype = feet_world.dtype

    # --- step switching (StepQueue::advance) ----------------------------
    t = es.time_in_step + dt
    finished = t >= es.step_duration
    next_idx = es.step_index + 1
    switch = finished & (next_idx < sched.num_steps) & (~es.done)
    done = es.done | (finished & (next_idx >= sched.num_steps))

    entered = _enter_step(
        model, sched, next_idx, feet_world, base_pos, base_quat
    )
    (
        n_active,
        n_splines,
        n_leg_dur,
        n_pos1,
        n_quat1,
        n_duration,
        n_base_dur,
        n_leg_start,
    ) = entered

    # jnp.where broadcasts a scalar bool over any shape — use directly.
    w = switch
    es2 = ExecState(
        step_index=jnp.where(w, next_idx, es.step_index),
        time_in_step=jnp.where(w, dt, t),
        step_duration=jnp.where(w, n_duration, es.step_duration),
        base_duration=jnp.where(w, n_base_dur, es.base_duration),
        leg_start=jnp.where(w, n_leg_start, es.leg_start),
        leg_duration=jnp.where(w, n_leg_dur, es.leg_duration),
        leg_active=jnp.where(w, n_active, es.leg_active),
        splines=jax.tree_util.tree_map(
            lambda a, b: jnp.where(w, a, b), n_splines, es.splines
        ),
        base_pos0=jnp.where(w, base_pos, es.base_pos0),
        base_quat0=jnp.where(w, base_quat, es.base_quat0),
        base_pos1=jnp.where(w, n_pos1, es.base_pos1),
        base_quat1=jnp.where(w, n_quat1, es.base_quat1),
        done=done,
    )

    tt = es2.time_in_step
    # --- leg motions (writeLegMotion), delayed past the base shift ------
    tl = tt - es2.leg_start
    in_swing = (
        es2.leg_active & (tl >= 0.0) & (tl < es2.leg_duration) & (~es2.done)
    )
    support = ~in_swing
    tle = jnp.maximum(tl, 0.0)
    pos = jax.vmap(lambda sp: sp.evaluate(tle))(es2.splines)
    vel = jax.vmap(lambda sp: sp.velocity(tle))(es2.splines)
    acc = jax.vmap(lambda sp: sp.acceleration(tle))(es2.splines)
    zero = jnp.zeros_like(pos)
    pos = jnp.where(in_swing[:, None], pos, feet_world)
    vel = jnp.where(in_swing[:, None], vel, zero)
    acc = jnp.where(in_swing[:, None], acc, zero)

    # --- base motion (writeTorsoMotion): smoothstep SE(3) interpolation
    # over the base phase, held at the target during the leg phase ------
    u = jnp.clip(tt / jnp.maximum(es2.base_duration, 1e-6), 0.0, 1.0)
    s = 3 * u**2 - 2 * u**3
    sdot = (6 * u - 6 * u**2) / jnp.maximum(es2.base_duration, 1e-6)
    dp = es2.base_pos1 - es2.base_pos0
    b_pos = es2.base_pos0 + s * dp
    b_vel = sdot * dp
    phi = quat_log(quat_mul(quat_conj(es2.base_quat0), es2.base_quat1))
    b_quat = quat_normalize(
        quat_mul(es2.base_quat0, quat_exp(s * phi))
    )
    b_angvel_world = sdot * phi  # small-angle: body≈world for these moves
    target = BaseTarget(
        position=b_pos,
        quaternion=b_quat,
        linear_velocity=b_vel,
        angular_velocity=b_angvel_world,
    )
    return es2, support, (pos, vel, acc), target
