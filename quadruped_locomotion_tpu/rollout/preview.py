"""Offline batch preview: BatchExecutor / StateBatch, TPU-native.

≙ the reference's preview stack (SURVEY.md §3.5): RViz's
``FreeGaitPreviewDisplay`` hands a step goal to ``BatchExecutor::process``
(``free_gait_core/src/executor/BatchExecutor.cpp:41-84``), which replays
``Executor::advance(0.01)`` against the kinematic-only ``AdapterDummy``
in a detached thread, recording a ``StateBatch`` (time→State map,
``StateBatch.cpp``) that ``StateBatchComputer`` post-processes into
end-effector trajectories / stances / targets for scrub-and-play
visualization (``FreeGaitPreviewPlayback.cpp:59-121``).

TPU-native re-design: the "detached thread running the executor faster
than real time" becomes one jitted ``lax.scan`` over planner ticks with
a *kinematic* plant — the desired state is executed perfectly (exactly
AdapterDummy's contract: IK/FK through the model, no physics). The
whole preview of an N-step schedule is a single device program; batches
of schedules preview in parallel under ``vmap``.

The recorded :class:`StateBatch` is a struct-of-arrays time series
(leading axis = tick) instead of a ``std::map<double, State>``;
:func:`state_at` scrubs it by interpolation, and
:func:`compute_end_effector_trajectories` / :func:`compute_stances`
mirror ``StateBatchComputer``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..model.kinematics import forward_kinematics, inverse_kinematics
from ..planning import steps as steps_mod
from ..types import RobotModel
from ..utils.rotations import quat_inv_rotate, quat_normalize, quat_rotate
from .closed_loop import PLANNER_DT


@struct.dataclass
class StateBatch:
    """Recorded preview time series (leading axis = planner tick).

    ≙ ``free_gait_core``'s ``StateBatch`` (time→State map) plus the
    derived quantities ``StateBatchComputer`` adds for visualization.
    """

    times: jax.Array  # (T,)
    base_position: jax.Array  # (T,3) world
    base_quaternion: jax.Array  # (T,4) wxyz
    joint_positions: jax.Array  # (T,4,3) via analytic IK (AdapterDummy)
    feet_world: jax.Array  # (T,4,3) end-effector trajectories
    feet_velocity: jax.Array  # (T,4,3) world
    support: jax.Array  # (T,4) bool — stance flags per tick
    step_index: jax.Array  # (T,) int32 — which schedule step is active
    done: jax.Array  # (T,) bool — schedule exhausted

    @property
    def num_ticks(self) -> int:
        return self.times.shape[0]


def batch_preview(
    model: RobotModel,
    sched: steps_mod.StepSchedule,
    feet_world0: jax.Array,
    base_pos0: jax.Array,
    base_quat0: jax.Array,
    planner_ticks: int,
    dt: float = PLANNER_DT,
) -> StateBatch:
    """Run the step executor kinematically and record every tick.

    The plant is ideal: swing feet follow their splines exactly, stance
    feet stay pinned, and the base tracks the planner's target pose —
    the same semantics as running the reference executor against
    ``AdapterDummy`` (``free_gait_ros/src/AdapterDummy.cpp``).
    """

    es0 = steps_mod.init_exec_state(feet_world0, base_pos0, base_quat0)
    carry0 = (es0, feet_world0, base_pos0, base_quat0)

    def tick(carry, _):
        es, feet, bpos, bquat = carry
        es2, out = steps_mod.advance(model, sched, es, feet, bpos, bquat, dt)
        support, pos_w, vel_w = out.support, out.foot_pos, out.foot_vel
        target = out.base
        feet2 = jnp.where(support[:, None], feet, pos_w)
        bpos2 = target.position
        bquat2 = quat_normalize(target.quaternion)
        # AdapterDummy joint state: IK of foot-in-base at the new pose;
        # joint-mode legs follow their joint splines directly and their
        # "feet" track the resulting FK.
        feet_base = quat_inv_rotate(
            jnp.broadcast_to(bquat2, (4, 4)), feet2 - bpos2
        )
        q = inverse_kinematics(model, feet_base)
        q = jnp.where(out.joint_mode[:, None], out.q_des, q)
        fk_world = bpos2 + quat_rotate(
            jnp.broadcast_to(bquat2, (4, 4)), forward_kinematics(model, q)
        )
        feet2 = jnp.where(out.joint_mode[:, None], fk_world, feet2)
        rec = {
            "base_position": bpos2,
            "base_quaternion": bquat2,
            "joint_positions": q,
            "feet_world": feet2,
            "feet_velocity": jnp.where(support[:, None], 0.0, vel_w),
            "support": support,
            "step_index": es2.step_index,
            "done": es2.done,
        }
        return (es2, feet2, bpos2, bquat2), rec

    _, recs = jax.lax.scan(tick, carry0, None, length=planner_ticks)
    dtype = feet_world0.dtype
    times = (1 + jnp.arange(planner_ticks, dtype=dtype)) * jnp.asarray(
        dt, dtype
    )
    return StateBatch(times=times, **recs)


def preview_schedule(
    model: RobotModel,
    sched: steps_mod.StepSchedule,
    height: float = 0.4,
    planner_ticks: int | None = None,
    dt: float = PLANNER_DT,
) -> StateBatch:
    """Preview a schedule from the default stance (convenience wrapper).

    ``planner_ticks`` defaults to a conservative bound from the schedule
    size (shapes must be static under jit).
    """
    from . import simulator as simlib

    sim = simlib.default_stance_state(model, height=height)
    if planner_ticks is None:
        # generous static bound: ~4 s per step
        planner_ticks = int(sched.num_steps * 4.0 / dt)
    return batch_preview(
        model,
        sched,
        sim.feet_world,
        sim.robot.base.position,
        sim.robot.base.quaternion,
        planner_ticks,
        dt=dt,
    )


# ---------------------------------------------------------------------------
# StateBatchComputer equivalents + scrubbing
# ---------------------------------------------------------------------------


def state_at(batch: StateBatch, t: jax.Array):
    """Scrub the recorded batch to wall time ``t`` (nearest tick with
    linear interpolation of continuous quantities) —
    ≙ ``FreeGaitPreviewPlayback``'s time-indexed lookup
    (``FreeGaitPreviewPlayback.cpp:64-121``)."""

    times = batch.times
    t = jnp.clip(t, times[0], times[-1])
    hi = jnp.clip(jnp.searchsorted(times, t), 1, times.shape[0] - 1)
    lo = hi - 1
    w = (t - times[lo]) / jnp.maximum(times[hi] - times[lo], 1e-9)

    def lerp(x):
        return (1.0 - w) * x[lo] + w * x[hi]

    return {
        "base_position": lerp(batch.base_position),
        "base_quaternion": quat_normalize(lerp(batch.base_quaternion)),
        "joint_positions": lerp(batch.joint_positions),
        "feet_world": lerp(batch.feet_world),
        "support": batch.support[lo],
        "step_index": batch.step_index[lo],
    }


def compute_end_effector_trajectories(batch: StateBatch):
    """Per-leg (times, positions) swing trajectories, NaN-masked while in
    support — ≙ ``StateBatchComputer::computeEndEffectorTrajectories``."""
    mask = batch.support[:, :, None]
    swing = jnp.where(mask, jnp.nan, batch.feet_world)
    return batch.times, swing


def compute_stances(batch: StateBatch):
    """Foothold snapshots at support-set changes: returns (T,4,3) foothold
    array where row t repeats the stance established at the most recent
    support-set switch — ≙ ``StateBatchComputer::computeStances``."""
    changed = jnp.any(
        batch.support != jnp.roll(batch.support, 1, axis=0), axis=1
    )
    changed = changed.at[0].set(True)

    def hold(prev, inp):
        chg, feet = inp
        cur = jnp.where(chg, feet, prev)
        return cur, cur

    _, stances = jax.lax.scan(
        hold, batch.feet_world[0], (changed, batch.feet_world)
    )
    return stances


def compute_base_trajectory(batch: StateBatch):
    """(times, positions, quaternions) of the torso path —
    ≙ ``StateBatchComputer``'s pose series for the preview display."""
    return batch.times, batch.base_position, batch.base_quaternion
