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
  stance (``BaseAuto.cpp:292-455``), ``base_target`` uses the given pose,
  ``base_trajectory`` fits a multi-knot SE(3) Hermite curve
  (``BaseTrajectory.cpp``);
* each tick evaluates the swing splines (``Executor::writeLegMotion``,
  :352-443) and the base SE(3) interpolation
  (``Executor::writeTorsoMotion``, :445-483);
* finished steps advance the index (``StepQueue::advance``, :79-120);
  past the end the executor holds the final stance (stand).

Leg-motion types mirror the reference's class hierarchy
(``free_gait_core/src/leg_motion/``) as an integer code per (step, leg):

* ``LEG_FOOTSTEP`` — profiled swing to a foothold (``Footstep.cpp``);
* ``LEG_EE_TARGET`` — cartesian move of the end effector, typically with
  ``ignore_contact`` so the foot is *held* at the target rather than
  loaded (``EndEffectorTarget.cpp``); the straight profile is selected
  at parse time;
* ``LEG_JOINT_TRAJ`` — per-joint Hermite trajectory through up to
  MAX_KNOTS knots (``JointTrajectory.cpp``); the leg leaves cartesian
  control entirely and the controller runs joint-space PD + gravity
  compensation (``ros_balance_controller.cpp:560-603``);
* ``LEG_MODE`` — support-mode switch with a surface normal and duration
  (``LegMode.cpp``), e.g. re-loading a leg after a joint trajectory.

Per-leg ``ignore_contact`` / ``ignore_for_pose_adaptation`` flags carry
the reference's Step options (``free_gait_msgs/msg``): an
ignore-contact leg stays out of the support set for the whole step, and
an ignore-for-pose-adaptation leg is dropped from the ``base_auto``
pose-optimization foothold list and support polygon
(``BaseAuto.cpp:327-392``).

The outputs per tick (:class:`ExecOutputs`) — support set, swing-foot
references, joint-space overrides, surface normals, BaseTarget — are
exactly the gait engine's interface plus the per-leg mode channel of
``/desired_robot_state`` (``StateRosPublisher.cpp:358-381``), so
scripted steps drive the same balance controller + plant closed loop.
"""

from __future__ import annotations

from typing import NamedTuple

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
from ..gait import spline as spline_mod
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

# Base-motion modes (≙ free_gait_core/src/base_motion/)
BASE_NONE = 0
BASE_AUTO = 1
BASE_TARGET = 2
BASE_TRAJECTORY = 3

# Leg-motion types (≙ free_gait_core/src/leg_motion/)
LEG_NONE = 0
LEG_FOOTSTEP = 1
LEG_EE_TARGET = 2
LEG_JOINT_TRAJ = 3
LEG_MODE = 4
LEG_EE_TRAJ = 5

DEFAULT_BASE_AVG_LIN = 0.2  # StepParameters.hpp BaseAuto average linear vel
DEFAULT_BASE_AVG_ANG = 0.28
DEFAULT_LEG_MODE_DURATION = 0.5


@struct.dataclass
class StepSchedule:
    """Stacked per-step specs; leading axis = step index (static length)."""

    # leg motions
    leg_motion_type: jax.Array  # (S,4) int32 LEG_* codes
    leg_target: jax.Array  # (S,4,3) world-frame foothold / EE targets
    leg_profile: jax.Array  # (S,4) int32 (footstep profiles)
    leg_profile_height: jax.Array  # (S,4)
    leg_avg_velocity: jax.Array  # (S,4)
    leg_ignore_contact: jax.Array  # (S,4) bool
    leg_ignore_pose_adapt: jax.Array  # (S,4) bool
    leg_support_flag: jax.Array  # (S,4) bool (LEG_MODE target support state)
    leg_surface_normal: jax.Array  # (S,4,3) world (LEG_MODE)
    leg_mode_duration: jax.Array  # (S,4) (LEG_MODE / hold durations)
    # trajectory knots, padded to MAX_KNOTS: joint positions for
    # LEG_JOINT_TRAJ, world-frame foot positions for LEG_EE_TRAJ
    knot_times: jax.Array  # (S,4,K)
    knot_values: jax.Array  # (S,4,K,3)
    knot_n: jax.Array  # (S,4) int32
    # base motion
    base_mode: jax.Array  # (S,) int32
    base_height: jax.Array  # (S,) nominal height for base_auto
    base_target_pos: jax.Array  # (S,3) world (base_target mode)
    base_target_quat: jax.Array  # (S,4) wxyz (base_target mode)
    base_avg_lin: jax.Array  # (S,)
    base_avg_ang: jax.Array  # (S,)
    base_ignore_timing: jax.Array  # (S,) bool — legs+base simultaneous
    base_margin: jax.Array  # (S,) support-polygon margin (BaseAuto.msg)
    # base trajectory knots (BASE_TRAJECTORY), knot 0 = pose at step entry
    base_knot_times: jax.Array  # (S,K)
    base_knot_pos: jax.Array  # (S,K,3)
    base_knot_quat: jax.Array  # (S,K,4)
    base_nknots: jax.Array  # (S,) int32
    # step-level minimum duration (custom_command holds etc.)
    min_duration: jax.Array  # (S,)

    @property
    def num_steps(self) -> int:
        return self.leg_motion_type.shape[0]

    @property
    def leg_active(self) -> jax.Array:
        """Legs with a cartesian swing motion this step (S,4)."""
        m = self.leg_motion_type
        return (
            (m == LEG_FOOTSTEP) | (m == LEG_EE_TARGET) | (m == LEG_EE_TRAJ)
        )

    @classmethod
    def create(cls, num_steps: int, dtype=jnp.float32, **overrides):
        """Build a schedule with reference-default values, overriding any
        subset of fields (missing leg motions default to LEG_NONE, base
        motions to BASE_NONE)."""
        S, K = num_steps, MAX_KNOTS
        z = jnp.zeros
        defaults = dict(
            leg_motion_type=z((S, 4), jnp.int32),
            leg_target=z((S, 4, 3), dtype),
            leg_profile=jnp.full((S, 4), PROFILE_TRIANGLE, jnp.int32),
            leg_profile_height=jnp.full(
                (S, 4), DEFAULT_PROFILE_HEIGHT, dtype
            ),
            leg_avg_velocity=jnp.full(
                (S, 4), DEFAULT_AVERAGE_VELOCITY, dtype
            ),
            leg_ignore_contact=z((S, 4), bool),
            leg_ignore_pose_adapt=z((S, 4), bool),
            leg_support_flag=jnp.ones((S, 4), bool),
            leg_surface_normal=jnp.tile(
                jnp.array([0.0, 0.0, 1.0], dtype), (S, 4, 1)
            ),
            leg_mode_duration=jnp.full(
                (S, 4), DEFAULT_LEG_MODE_DURATION, dtype
            ),
            knot_times=z((S, 4, K), dtype),
            knot_values=z((S, 4, K, 3), dtype),
            knot_n=jnp.full((S, 4), 2, jnp.int32),
            base_mode=z((S,), jnp.int32),
            base_height=jnp.full((S,), 0.4, dtype),
            base_target_pos=z((S, 3), dtype),
            base_target_quat=jnp.tile(
                jnp.array([1.0, 0, 0, 0], dtype), (S, 1)
            ),
            base_avg_lin=jnp.full((S,), DEFAULT_BASE_AVG_LIN, dtype),
            base_avg_ang=jnp.full((S,), DEFAULT_BASE_AVG_ANG, dtype),
            base_ignore_timing=z((S,), bool),
            base_margin=jnp.full((S,), 0.04, dtype),
            base_knot_times=z((S, K), dtype),
            base_knot_pos=z((S, K, 3), dtype),
            base_knot_quat=jnp.tile(
                jnp.array([1.0, 0, 0, 0], dtype), (S, K, 1)
            ),
            base_nknots=jnp.full((S,), 2, jnp.int32),
            min_duration=jnp.full((S,), DEFAULT_MIN_DURATION, dtype),
        )
        unknown = set(overrides) - set(defaults)
        if unknown:
            raise TypeError(f"unknown StepSchedule fields: {sorted(unknown)}")
        defaults.update(overrides)
        return cls(**defaults)


class ExecOutputs(NamedTuple):
    """Per-tick executor outputs — the planner→controller interface
    (≙ the ``/desired_robot_state`` payload, ``StateRosPublisher.cpp``)."""

    support: jax.Array  # (4,) bool
    foot_pos: jax.Array  # (4,3) world swing references
    foot_vel: jax.Array  # (4,3)
    foot_acc: jax.Array  # (4,3)
    joint_mode: jax.Array  # (4,) bool — leg under joint-space control
    q_des: jax.Array  # (4,3) joint targets (joint_mode legs)
    qd_des: jax.Array  # (4,3)
    surface_normal: jax.Array  # (4,3) world
    base: BaseTarget


@struct.dataclass
class ExecState:
    """Executor bookkeeping carried through the scan."""

    step_index: jax.Array  # scalar int32
    time_in_step: jax.Array  # scalar
    step_duration: jax.Array  # scalar
    base_duration: jax.Array  # scalar
    leg_start: jax.Array  # scalar — when leg motions begin
    leg_duration: jax.Array  # (4,) per-leg motion durations this step
    leg_motion: jax.Array  # (4,) int32 LEG_* codes this step
    leg_ignore_contact: jax.Array  # (4,) bool
    leg_support_flag: jax.Array  # (4,) bool (LEG_MODE)
    leg_surface_normal: jax.Array  # (4,3)
    splines: HermiteSpline  # cartesian swing splines, leading (4,) axis
    joint_splines: HermiteSpline  # joint-space splines, leading (4,) axis
    # base SE(3) curve for this step: position Hermite + quaternion knots
    base_spline: HermiteSpline  # position, times 0..base_duration
    base_quat_knots: jax.Array  # (K,4)
    done: jax.Array  # bool — schedule exhausted
    # Sticky per-leg mode channel (≙ the /desired_robot_state LegMode
    # name, which the reference publisher only overwrites when the
    # current step HAS a motion for the leg, StateRosPublisher.cpp:
    # 355-381 — so is_footstep_ etc. persist in the controller,
    # ros_balance_controller.cpp:860-890): the last non-NONE motion type
    # each leg executed.
    leg_last_motion: jax.Array  # (4,) int32 LEG_* codes
    # Seconds each leg has continuously been in (desired) support —
    # the normalized-stance-phase clock for the contact FSM.
    leg_stance_time: jax.Array  # (4,)

    @property
    def leg_active(self) -> jax.Array:
        """Legs with a cartesian swing motion this step (4,)."""
        m = self.leg_motion
        return (
            (m == LEG_FOOTSTEP) | (m == LEG_EE_TARGET) | (m == LEG_EE_TRAJ)
        )


def _empty_splines(feet_world):
    vals = jnp.tile(feet_world[:, None, :], (1, MAX_KNOTS, 1))
    return HermiteSpline(
        times=jnp.zeros((4, MAX_KNOTS), feet_world.dtype),
        values=vals,
        tangents=jnp.zeros_like(vals),
        num_knots=jnp.full((4,), 2, jnp.int32),
        duration=jnp.zeros((4,), feet_world.dtype),
    )


def _hold_spline(value, dtype):
    """Degenerate 2-knot spline holding ``value`` (no leading axis)."""
    vals = jnp.tile(value[None, :], (MAX_KNOTS, 1))
    return HermiteSpline(
        times=jnp.zeros((MAX_KNOTS,), dtype),
        values=vals,
        tangents=jnp.zeros_like(vals),
        num_knots=jnp.asarray(2, jnp.int32),
        duration=jnp.asarray(0.0, dtype),
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
        leg_motion=jnp.zeros(4, jnp.int32),
        leg_ignore_contact=jnp.zeros(4, bool),
        leg_support_flag=jnp.ones(4, bool),
        leg_surface_normal=jnp.tile(jnp.array([0.0, 0.0, 1.0], dtype), (4, 1)),
        splines=_empty_splines(feet_world),
        joint_splines=_empty_splines(jnp.zeros((4, 3), dtype)),
        base_spline=_hold_spline(base_pos, dtype),
        base_quat_knots=jnp.tile(base_quat[None, :], (MAX_KNOTS, 1)),
        done=jnp.asarray(False),
        leg_last_motion=jnp.zeros(4, jnp.int32),
        leg_stance_time=jnp.full((4,), 10.0, dtype),  # start in deep stance
    )


def _fit_knot_spline(times, pos, nknots, v_now):
    """Per-leg knot trajectory (joint- or task-space 3-vectors): Hermite
    through the script knots with the current value prepended at t=0 (the
    reference completer seeds trajectories from the measured state,
    StepCompleter.cpp:36-86)."""
    dtype = pos.dtype
    # shift knots right by one, insert (0, q_now)
    t = jnp.concatenate([jnp.zeros((1,), dtype), times[: MAX_KNOTS - 1]])
    v = jnp.concatenate([v_now[None, :], pos[: MAX_KNOTS - 1]])
    k = jnp.minimum(nknots + 1, MAX_KNOTS)
    # pad past the last real knot by repeating it (mask-safe for _eval)
    idx = jnp.arange(MAX_KNOTS)
    last = jnp.clip(k - 1, 0, MAX_KNOTS - 1)
    src = jnp.minimum(idx, last)
    t = t[src]
    v = v[src]
    zero = jnp.zeros((3,), dtype)
    return spline_mod.fit(t, v, zero, zero, k)


def _quat_segment_eval(times, quats, num_knots, t, duration):
    """Piecewise quaternion interpolation over Hermite knot times:
    per-segment exp/log smoothstep (C¹ at knots for the 2-knot case; the
    reference's CubicHermiteSE3Curve semantics for orientation)."""
    idx = jnp.arange(MAX_KNOTS)
    valid = idx < num_knots - 1
    t = jnp.clip(t, times[0], jnp.maximum(times[0], duration))
    seg = jnp.sum(jnp.where(valid & (times <= t), 1, 0)) - 1
    seg = jnp.clip(seg, 0, MAX_KNOTS - 2)
    t0, t1 = times[seg], times[seg + 1]
    h_raw = t1 - t0
    ok = h_raw > 1e-6
    h = jnp.where(ok, h_raw, 1.0)
    u = jnp.clip((t - t0) / h, 0.0, 1.0)
    s = 3 * u**2 - 2 * u**3
    sdot = jnp.where(ok, (6 * u - 6 * u**2) / h, 0.0)
    q0, q1 = quats[seg], quats[seg + 1]
    phi = quat_log(quat_mul(quat_conj(q0), q1))
    q = quat_normalize(quat_mul(q0, quat_exp(s * phi)))
    q = jnp.where(ok, q, q0)
    angvel = jnp.where(ok, sdot * phi, jnp.zeros_like(phi))
    return q, angvel


def _enter_step(
    model: RobotModel,
    sched: StepSchedule,
    idx,
    feet_world,
    base_pos,
    base_quat,
    q_now,
):
    """StepCompleter: resolve one step's motions from the current state."""
    dtype = feet_world.dtype
    i = jnp.clip(idx, 0, sched.num_steps - 1)
    mtype = sched.leg_motion_type[i]
    swingbuilt = (mtype == LEG_FOOTSTEP) | (mtype == LEG_EE_TARGET)
    eetraj = mtype == LEG_EE_TRAJ
    cartesian = swingbuilt | eetraj
    jointspace = mtype == LEG_JOINT_TRAJ
    legmode = mtype == LEG_MODE
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
    # end_effector_trajectory legs: Hermite through explicit cartesian
    # knots instead of the profiled swing (≙ EndEffectorTrajectory.cpp)
    knot_cart = jax.vmap(_fit_knot_spline)(
        sched.knot_times[i], sched.knot_values[i], sched.knot_n[i],
        feet_world,
    )
    sel_leg = lambda m: lambda a, b: jnp.where(
        m.reshape((-1,) + (1,) * (a.ndim - 1)), a, b
    )
    splines = jax.tree_util.tree_map(sel_leg(eetraj), knot_cart, splines)
    # inactive legs: degenerate hold-position splines
    hold = _empty_splines(feet_world)
    splines = jax.tree_util.tree_map(sel_leg(cartesian), splines, hold)

    joint_splines = jax.vmap(_fit_knot_spline)(
        sched.knot_times[i],
        sched.knot_values[i],
        sched.knot_n[i],
        q_now,
    )
    hold_j = _empty_splines(q_now)
    joint_splines = jax.tree_util.tree_map(
        sel_leg(jointspace), joint_splines, hold_j
    )

    leg_dur = jnp.where(
        cartesian,
        splines.duration,
        jnp.where(
            jointspace,
            joint_splines.duration,
            jnp.where(legmode, sched.leg_mode_duration[i], 0.0),
        ),
    )

    # Final stance of this step: cartesian legs at their targets.
    final_feet = jnp.where(cartesian[:, None], targets, feet_world)

    mode = sched.base_mode[i]
    ignore_pa = sched.leg_ignore_pose_adapt[i]
    # base_auto ≙ BaseAuto foothold lists (:327-392): nominal-stance cost
    # over the footholds to reach (final stance), CoM constrained to the
    # polygon of the legs that KEEP support during the motion, with the
    # default 0.04 margin — this is what shifts the torso over the
    # support triangle before a leg lifts. Legs flagged
    # ignore_for_pose_adaptation are dropped from both lists.
    moving = cartesian | jointspace
    keeps_support = jnp.where(legmode, sched.leg_support_flag[i], ~moving)
    # Limb-length (reachability) constraints: under the two-phase timing
    # every leg is planted at its CURRENT foothold while the base shifts,
    # and the final stance must be reachable at the target pose — so both
    # sets constrain the optimization, independent of pose-adaptation /
    # support masks.
    limb_feet = jnp.concatenate([final_feet, feet_world], axis=0)
    limb_support = jnp.concatenate(
        [~ignore_pa | cartesian, jnp.ones(4, bool)], axis=0
    )
    auto_pose = po.optimize_pose(
        model,
        final_feet,
        ~ignore_pa,
        height=sched.base_height[i],
        margin=sched.base_margin[i],
        polygon_feet=feet_world,
        polygon_support=keeps_support & ~ignore_pa,
        limb_feet=limb_feet,
        limb_support=limb_support,
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

    # --- base curve: unified K-knot Hermite + quaternion knots ----------
    lin_dist = jnp.linalg.norm(pos1 - base_pos)
    ang_dist = jnp.linalg.norm(quat_log(quat_mul(quat_conj(base_quat), quat1)))
    two_knot_dur = jnp.where(
        mode == BASE_NONE,
        0.0,
        jnp.maximum(
            lin_dist / sched.base_avg_lin[i],
            ang_dist / sched.base_avg_ang[i],
        ),
    )
    is_traj = mode == BASE_TRAJECTORY
    nk_traj = jnp.minimum(sched.base_nknots[i] + 1, MAX_KNOTS)
    # trajectory knots: current pose prepended at t=0 (like joint splines)
    tt = jnp.concatenate(
        [jnp.zeros((1,), dtype), sched.base_knot_times[i, : MAX_KNOTS - 1]]
    )
    pp = jnp.concatenate(
        [base_pos[None], sched.base_knot_pos[i, : MAX_KNOTS - 1]]
    )
    qq = jnp.concatenate(
        [base_quat[None], sched.base_knot_quat[i, : MAX_KNOTS - 1]]
    )
    idx5 = jnp.arange(MAX_KNOTS)
    last = jnp.clip(nk_traj - 1, 0, MAX_KNOTS - 1)
    src = jnp.minimum(idx5, last)
    tt, pp, qq = tt[src], pp[src], qq[src]
    # two-knot curve (NONE/AUTO/TARGET): [now → target] over two_knot_dur
    t2 = jnp.where(idx5 == 0, 0.0, two_knot_dur)
    p2 = jnp.where((idx5 == 0)[:, None], base_pos[None], pos1[None])
    q2 = jnp.where((idx5 == 0)[:, None], base_quat[None], quat1[None])
    kt = jnp.where(is_traj, tt, t2)
    kp = jnp.where(is_traj, pp, p2)
    kq = jnp.where(is_traj, qq, q2)
    nk = jnp.where(is_traj, nk_traj, 2)
    zero3 = jnp.zeros((3,), dtype)
    base_spline = spline_mod.fit(kt, kp, zero3, zero3, nk)
    base_dur = base_spline.duration

    # Two-phase timing (documented deviation from the reference's
    # simultaneous motion timelines, Step.cpp:105-196): unless the script
    # sets ignore_timing_of_leg_motion, the base shift completes FIRST,
    # then the leg motions start. Lifting a foot while the CoM still sits
    # on the old support edge tips the robot in ~sqrt(h/g)=0.2 s, far
    # faster than the base tracks its target — weight shift before
    # lift-off is how a static walk is stable at all.
    any_leg = jnp.any(mtype != LEG_NONE)
    leg_start = jnp.where(
        any_leg & ~sched.base_ignore_timing[i], base_dur, 0.0
    )
    duration = jnp.maximum(
        leg_start + jnp.max(leg_dur),
        jnp.maximum(base_dur, sched.min_duration[i]),
    )
    return dict(
        leg_motion=mtype,
        leg_duration=leg_dur,
        leg_ignore_contact=sched.leg_ignore_contact[i],
        leg_support_flag=sched.leg_support_flag[i],
        leg_surface_normal=sched.leg_surface_normal[i],
        splines=splines,
        joint_splines=joint_splines,
        base_spline=base_spline,
        base_quat_knots=kq,
        base_duration=base_dur,
        leg_start=leg_start,
        duration=duration,
    )


def advance(
    model: RobotModel,
    sched: StepSchedule,
    es: ExecState,
    feet_world: jax.Array,
    base_pos: jax.Array,
    base_quat: jax.Array,
    dt,
    q_now: jax.Array | None = None,
    active_steps: jax.Array | None = None,
):
    """One planner tick. Returns (new ExecState, :class:`ExecOutputs`).

    ``q_now`` (4,3) seeds joint trajectories at step entry; defaults to
    zeros for schedules without joint-space motions.

    ``active_steps`` (dynamic scalar ≤ ``sched.num_steps``) marks how many
    leading schedule rows are live — the action-server runtime keeps a
    capacity-padded schedule and grows/truncates this count on goal
    arrival / preemption without recompiling (≙ StepQueue mutation,
    ``StepQueue.cpp:79-120`` + ``clearNextSteps``).

    ``dt == 0`` is a *pause* tick (≙ ``Executor::pause``): time is frozen,
    no step switches occur, and the outputs repeat — while the balance
    controller keeps running on them.
    """
    dtype = feet_world.dtype
    if q_now is None:
        q_now = jnp.zeros((4, 3), dtype)
    active = sched.num_steps if active_steps is None else active_steps

    # --- step switching (StepQueue::advance) ----------------------------
    t = es.time_in_step + dt
    advancing = jnp.asarray(dt, dtype) > 0
    finished = t >= es.step_duration
    next_idx = es.step_index + 1
    switch = finished & (next_idx < active) & (~es.done) & advancing
    done = es.done | (finished & (next_idx >= active) & advancing)

    entered = _enter_step(
        model, sched, next_idx, feet_world, base_pos, base_quat, q_now
    )

    # jnp.where broadcasts a scalar bool over any shape — use directly.
    w = switch
    sel = lambda a, b: jax.tree_util.tree_map(
        lambda x, y: jnp.where(w, x, y), a, b
    )
    es2 = ExecState(
        step_index=jnp.where(w, next_idx, es.step_index),
        time_in_step=jnp.where(w, dt, t),
        step_duration=jnp.where(w, entered["duration"], es.step_duration),
        base_duration=jnp.where(w, entered["base_duration"], es.base_duration),
        leg_start=jnp.where(w, entered["leg_start"], es.leg_start),
        leg_duration=jnp.where(w, entered["leg_duration"], es.leg_duration),
        leg_motion=jnp.where(w, entered["leg_motion"], es.leg_motion),
        leg_ignore_contact=jnp.where(
            w, entered["leg_ignore_contact"], es.leg_ignore_contact
        ),
        leg_support_flag=jnp.where(
            w, entered["leg_support_flag"], es.leg_support_flag
        ),
        leg_surface_normal=jnp.where(
            w, entered["leg_surface_normal"], es.leg_surface_normal
        ),
        splines=sel(entered["splines"], es.splines),
        joint_splines=sel(entered["joint_splines"], es.joint_splines),
        base_spline=sel(entered["base_spline"], es.base_spline),
        base_quat_knots=jnp.where(
            w, entered["base_quat_knots"], es.base_quat_knots
        ),
        done=done,
        leg_last_motion=jnp.where(
            w & (entered["leg_motion"] != LEG_NONE),
            entered["leg_motion"],
            es.leg_last_motion,
        ),
        leg_stance_time=es.leg_stance_time,  # updated below from support
    )

    tt = es2.time_in_step
    mtype = es2.leg_motion
    cartesian = es2.leg_active
    jointspace = mtype == LEG_JOINT_TRAJ
    legmode = mtype == LEG_MODE

    # --- leg motions (writeLegMotion), delayed past the base shift ------
    # Past the end of the schedule the executor HOLDS the last step's
    # state — support flags, parked ignore-contact feet, joint-mode legs —
    # exactly like the reference executor idling on an empty queue with
    # the final State (Executor.cpp:52-132). Time keeps growing, so the
    # motion windows are simply over and every spline clamps to its end.
    tl = tt - es2.leg_start
    in_window = (tl >= 0.0) & (tl < es2.leg_duration)
    in_swing = cartesian & in_window
    tle = jnp.maximum(tl, 0.0)
    pos = jax.vmap(lambda sp: sp.evaluate(tle))(es2.splines)
    vel = jax.vmap(lambda sp: sp.velocity(tle))(es2.splines)
    acc = jax.vmap(lambda sp: sp.acceleration(tle))(es2.splines)
    zero = jnp.zeros_like(pos)
    # ignore-contact legs HOLD the spline for the WHOLE step — its start
    # (= the parked foot position at step entry) during the base-shift
    # phase and its end past the motion window (EndEffectorTarget with
    # ignore_contact: the foot parks in the air with real stiffness; a
    # zero-stiffness feet_world reference would let the 6 kg leg sag and
    # get dragged by base motion).
    track = in_swing | (cartesian & es2.leg_ignore_contact)
    pos = jnp.where(track[:, None], pos, feet_world)
    vel = jnp.where(in_swing[:, None], vel, zero)
    acc = jnp.where(in_swing[:, None], acc, zero)

    # joint-space channel (LEG_JOINT_TRAJ): hold the last knot after the
    # motion window (the leg stays under joint control for the step).
    joint_mode = jointspace & (tl >= 0.0)
    q_des = jax.vmap(lambda sp: sp.evaluate(tle))(es2.joint_splines)
    qd_des = jnp.where(
        in_window[:, None],
        jax.vmap(lambda sp: sp.velocity(tle))(es2.joint_splines),
        0.0,
    )

    # --- support set (writeSupportLegs, Executor.cpp:290-350) -----------
    # footstep: swing during the window, support after touchdown;
    # ee_target/joint_traj with ignore_contact: non-support for the WHOLE
    # step, including the base-shift phase before the motion window — the
    # foot may be parked in the air from a previous step, and loading it
    # would hand the force-distribution QP a phantom contact;
    # joint_traj without ignore_contact: non-support during motion;
    # leg_mode: scripted support flag from motion start.
    moving = cartesian | jointspace
    nonsupport = (
        (moving & in_window)
        | (moving & es2.leg_ignore_contact)
        | (legmode & (tl >= 0.0) & ~es2.leg_support_flag)
    )
    support = ~nonsupport

    normal = jnp.where(
        legmode[:, None],
        es2.leg_surface_normal,
        jnp.tile(jnp.array([0.0, 0.0, 1.0], dtype), (4, 1)),
    )

    # --- base motion (writeTorsoMotion): K-knot SE(3) curve -------------
    tb = jnp.clip(tt, 0.0, es2.base_duration)
    b_pos = es2.base_spline.evaluate(tb)
    b_vel = es2.base_spline.velocity(tb)
    b_quat, b_angvel = _quat_segment_eval(
        es2.base_spline.times,
        es2.base_quat_knots,
        es2.base_spline.num_knots,
        tb,
        es2.base_duration,
    )
    target = BaseTarget(
        position=b_pos,
        quaternion=b_quat,
        linear_velocity=b_vel,
        angular_velocity=b_angvel,
    )
    # Stance clock: accumulates while the leg is desired-support, resets
    # while it swings (feeds the FSM's normalized stance phase).
    es2 = es2.replace(
        leg_stance_time=jnp.where(
            support, es2.leg_stance_time + dt, 0.0
        )
    )

    out = ExecOutputs(
        support=support,
        foot_pos=pos,
        foot_vel=vel,
        foot_acc=acc,
        joint_mode=joint_mode,
        q_des=q_des,
        qd_des=qd_des,
        surface_normal=normal,
        base=target,
    )
    return es2, out
