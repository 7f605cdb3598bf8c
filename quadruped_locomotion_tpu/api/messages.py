"""Typed wire API: goal / feedback / result / robot-state messages.

≙ the reference's ``free_gait_msgs`` package (SURVEY.md §2.7): the ROS
IDL surface every layer talks through — ``Step.msg`` (arrays of motion
specs + base motion), ``RobotState.msg`` (per-leg joints + base odom +
``LegMode`` support/phase/surface-normal), ``ExecuteSteps.action``
(goal steps + 3 preempt modes; feedback with step id/queue/phase/
duration/active branches; result status) and the loader services.

TPU-native re-design: no IDL/codegen — plain Python dataclasses with
lossless dict/JSON round-trip (the host-side boundary format for
checkpoints, logs, and any external transport), plus
:func:`goal_to_schedule` compiling a goal into the fixed-shape
:class:`StepSchedule` the jitted executor consumes. The message layer is
pure host code: messages exist only at program edges; on-device
dataflow is arrays.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field

from ..planning.steps import StepSchedule
from . import actions as actions_mod

LEG_NAMES = ("LF_LEG", "RF_LEG", "RH_LEG", "LH_LEG")

# ExecuteSteps.action preempt modes (reference numeric values,
# free_gait_msgs/action/ExecuteSteps.action)
PREEMPT_IMMEDIATE = -1  # stop now, clear queue
PREEMPT_STEP = 0  # default: finish the active step, then stop
PREEMPT_NO = 1  # ignore stop requests

# feedback status values (ExecuteSteps.action feedback)
PROGRESS_PAUSED = -1
PROGRESS_UNKNOWN = 0
PROGRESS_EXECUTING = 1

# result status values (actionlib GoalStatus — the reference result
# says "see goal status")
RESULT_PREEMPTED = 2
RESULT_SUCCEEDED = 3
RESULT_ABORTED = 4


@dataclass
class FootstepMsg:
    """≙ free_gait_msgs/Footstep."""

    name: str  # LF_LEG / RF_LEG / RH_LEG / LH_LEG
    target: tuple[float, float, float] = (0.0, 0.0, 0.0)
    frame: str | None = None
    profile_type: str = "triangle"
    profile_height: float = 0.08
    average_velocity: float = 0.65


@dataclass
class BaseAutoMsg:
    """≙ free_gait_msgs/BaseAuto."""

    height: float = 0.4
    average_linear_velocity: float = 0.2
    average_angular_velocity: float = 0.28


@dataclass
class BaseTargetMsg:
    """≙ free_gait_msgs/BaseTarget."""

    position: tuple[float, float, float] = (0.0, 0.0, 0.0)
    orientation_rpy: tuple[float, float, float] = (0.0, 0.0, 0.0)
    frame: str | None = None
    average_linear_velocity: float = 0.2
    average_angular_velocity: float = 0.28


@dataclass
class StepMsg:
    """≙ free_gait_msgs/Step: per-limb motions + optional base motion."""

    footsteps: list[FootstepMsg] = field(default_factory=list)
    base_auto: BaseAutoMsg | None = None
    base_target: BaseTargetMsg | None = None


@dataclass
class ExecuteStepsGoal:
    """≙ ExecuteSteps.action goal."""

    steps: list[StepMsg] = field(default_factory=list)
    preempt: int = PREEMPT_STEP
    source_frame: str | None = None  # ≙ adapt_coordinates


@dataclass
class ExecuteStepsFeedback:
    """≙ ExecuteSteps.action feedback (all reference fields)."""

    step_id: str = ""
    step_number: int = 0  # 1-based within the current goal
    number_of_steps_in_goal: int = 0
    queue_size: int = 0  # remaining steps incl. the current one
    status: int = PROGRESS_EXECUTING
    description: str = ""
    duration: float = 0.0
    phase: float = 0.0  # 0-1 within the current step
    active_branches: list[str] = field(default_factory=list)


@dataclass
class ExecuteStepsResult:
    """≙ ExecuteSteps.action result (actionlib goal status)."""

    status: int = RESULT_SUCCEEDED
    goal_id: int = -1


@dataclass
class LegModeMsg:
    """≙ free_gait_msgs/LegMode: support flag + phase + surface normal."""

    support_leg: bool = True
    phase: float = 0.0
    name: str = ""
    surface_normal: tuple[float, float, float] = (0.0, 0.0, 1.0)


@dataclass
class RobotStateMsg:
    """≙ free_gait_msgs/RobotState: the /desired_robot_state payload."""

    base_position: tuple[float, float, float] = (0.0, 0.0, 0.0)
    base_quaternion: tuple[float, float, float, float] = (1.0, 0.0, 0.0, 0.0)
    base_linear_velocity: tuple[float, float, float] = (0.0, 0.0, 0.0)
    base_angular_velocity: tuple[float, float, float] = (0.0, 0.0, 0.0)
    joint_positions: list[list[float]] = field(
        default_factory=lambda: [[0.0] * 3 for _ in range(4)]
    )
    joint_velocities: list[list[float]] = field(
        default_factory=lambda: [[0.0] * 3 for _ in range(4)]
    )
    joint_efforts: list[list[float]] = field(
        default_factory=lambda: [[0.0] * 3 for _ in range(4)]
    )
    leg_modes: list[LegModeMsg] = field(
        default_factory=lambda: [LegModeMsg() for _ in range(4)]
    )


# ---------------------------------------------------------------------------
# serialization (the IDL-codegen replacement)
# ---------------------------------------------------------------------------

_MSG_TYPES = {
    c.__name__: c
    for c in (
        FootstepMsg,
        BaseAutoMsg,
        BaseTargetMsg,
        StepMsg,
        ExecuteStepsGoal,
        ExecuteStepsFeedback,
        ExecuteStepsResult,
        LegModeMsg,
        RobotStateMsg,
    )
}


def _to_jsonable(obj):
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {
            "__msg__": type(obj).__name__,
            **{
                f.name: _to_jsonable(getattr(obj, f.name))
                for f in dataclasses.fields(obj)
            },
        }
    if isinstance(obj, (list, tuple)):
        return [_to_jsonable(x) for x in obj]
    return obj


def _from_jsonable(obj):
    if isinstance(obj, dict) and "__msg__" in obj:
        cls = _MSG_TYPES[obj["__msg__"]]
        kwargs = {}
        for f in dataclasses.fields(cls):
            if f.name in obj:
                v = _from_jsonable(obj[f.name])
                if isinstance(v, list) and f.type.startswith("tuple"):
                    v = tuple(v)
                kwargs[f.name] = v
        return cls(**kwargs)
    if isinstance(obj, list):
        return [_from_jsonable(x) for x in obj]
    return obj


def to_json(msg) -> str:
    return json.dumps(_to_jsonable(msg))


def from_json(s: str):
    return _from_jsonable(json.loads(s))


# ---------------------------------------------------------------------------
# goal → schedule (≙ StepRosConverter::fromMessage)
# ---------------------------------------------------------------------------


def goal_to_schedule(
    goal: ExecuteStepsGoal, base_pos, base_quat, feet_world, dtype=None
) -> StepSchedule:
    """Compile an ExecuteStepsGoal into the executor's StepSchedule —
    ≙ ``StepRosConverter::fromMessage`` feeding ``StepQueue::add``
    (``FreeGaitActionServer.cpp:93-138``)."""
    import jax.numpy as jnp

    doc: dict = {"steps": []}
    if goal.source_frame:
        doc["adapt_coordinates"] = [
            {"transform": {"source_frame": goal.source_frame}}
        ]
    for step in goal.steps:
        motions = []
        for fs in step.footsteps:
            m = {
                "name": fs.name,
                "profile_type": fs.profile_type,
                "profile_height": fs.profile_height,
                "average_velocity": fs.average_velocity,
                "target": {"position": list(fs.target)},
            }
            if fs.frame:
                m["target"]["frame"] = fs.frame
            motions.append({"footstep": m})
        if step.base_auto is not None:
            ba = step.base_auto
            motions.append(
                {
                    "base_auto": {
                        "height": ba.height,
                        "average_linear_velocity": ba.average_linear_velocity,
                        "average_angular_velocity": ba.average_angular_velocity,
                    }
                }
            )
        elif step.base_target is not None:
            bt = step.base_target
            tgt = {
                "position": list(bt.position),
                "orientation": list(bt.orientation_rpy),
            }
            if bt.frame:
                tgt["frame"] = bt.frame
            motions.append(
                {
                    "base_target": {
                        "target": tgt,
                        "average_linear_velocity": bt.average_linear_velocity,
                        "average_angular_velocity": bt.average_angular_velocity,
                    }
                }
            )
        doc["steps"].append({"step": motions})

    dtype = dtype or jnp.float32
    return actions_mod.build_schedule(
        doc, base_pos, base_quat, feet_world, dtype
    )


def robot_state_from_sim(sim, support, phases=None) -> RobotStateMsg:
    """Snapshot a simulator state into the wire format —
    ≙ ``StateRosPublisher::publish`` (``StateRosPublisher.cpp:240-560``)."""
    import numpy as np

    phases = (
        [0.0] * 4 if phases is None else [float(x) for x in np.asarray(phases)]
    )
    sup = [bool(x) for x in np.asarray(support)]
    return RobotStateMsg(
        base_position=tuple(np.asarray(sim.robot.base.position).tolist()),
        base_quaternion=tuple(
            np.asarray(sim.robot.base.quaternion).tolist()
        ),
        base_linear_velocity=tuple(
            np.asarray(sim.robot.base.linear_velocity).tolist()
        ),
        base_angular_velocity=tuple(
            np.asarray(sim.robot.base.angular_velocity).tolist()
        ),
        joint_positions=np.asarray(sim.robot.q).tolist(),
        joint_velocities=np.asarray(sim.robot.qd).tolist(),
        joint_efforts=np.asarray(sim.robot.tau).tolist(),
        leg_modes=[
            LegModeMsg(
                support_leg=sup[i],
                phase=phases[i],
                name=LEG_NAMES[i],
            )
            for i in range(4)
        ],
    )
