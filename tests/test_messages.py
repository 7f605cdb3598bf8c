"""Wire-API message tests (≙ free_gait_msgs + StepRosConverter)."""

import numpy as np
import jax.numpy as jnp

from quadruped_locomotion_tpu.api import messages as msgs
from quadruped_locomotion_tpu.api.actions import load_action
from quadruped_locomotion_tpu.rollout import simulator as simlib
from quadruped_locomotion_tpu.types import RobotModel

MODEL = RobotModel.simpledog()


def _goal():
    return msgs.ExecuteStepsGoal(
        source_frame="foot_print",
        steps=[
            msgs.StepMsg(
                base_auto=msgs.BaseAutoMsg(height=0.38),
                footsteps=[
                    msgs.FootstepMsg(
                        name="LF_LEG",
                        target=(0.48, 0.175, 0.0),
                        profile_height=0.10,
                        average_velocity=0.15,
                    )
                ],
            ),
            msgs.StepMsg(
                base_target=msgs.BaseTargetMsg(
                    position=(0.0, 0.0, 0.0),
                    orientation_rpy=(0.0, 0.0, 0.3),
                    frame="base_link",
                )
            ),
        ],
    )


def test_json_round_trip():
    goal = _goal()
    s = msgs.to_json(goal)
    back = msgs.from_json(s)
    assert back == goal
    fb = msgs.ExecuteStepsFeedback(
        step_index=3, phase=0.5, active_branches=["LF_LEG"]
    )
    assert msgs.from_json(msgs.to_json(fb)) == fb


def test_goal_to_schedule_matches_yaml_parser():
    sim = simlib.default_stance_state(MODEL, height=0.38)
    args = (
        sim.robot.base.position,
        sim.robot.base.quaternion,
        sim.feet_world,
    )
    sched_msg = msgs.goal_to_schedule(_goal(), *args)

    yaml_src = """
adapt_coordinates:
  - transform: {source_frame: foot_print}
steps:
  - step:
      - base_auto: {height: 0.38}
      - footstep:
          name: LF_LEG
          profile_type: triangle
          profile_height: 0.10
          average_velocity: 0.15
          target: {position: [0.48, 0.175, 0.0]}
  - step:
      - base_target:
          average_linear_velocity: 0.2
          average_angular_velocity: 0.28
          target:
            frame: base_link
            position: [0.0, 0.0, 0.0]
            orientation: [0.0, 0.0, 0.3]
"""
    sched_yaml = load_action(yaml_src, *args)
    for name in (
        "leg_active",
        "leg_target",
        "leg_profile",
        "base_mode",
        "base_target_pos",
        "base_target_quat",
    ):
        np.testing.assert_allclose(
            np.asarray(getattr(sched_msg, name)),
            np.asarray(getattr(sched_yaml, name)),
            atol=1e-6,
            err_msg=name,
        )


def test_robot_state_snapshot():
    sim = simlib.default_stance_state(MODEL, height=0.4)
    m = msgs.robot_state_from_sim(
        sim, jnp.array([True, True, False, True]), phases=[0, 0, 0.5, 0]
    )
    assert abs(m.base_position[2] - 0.4) < 1e-6
    assert m.leg_modes[2].support_leg is False
    assert m.leg_modes[2].phase == 0.5
    assert len(m.joint_positions) == 4
    back = msgs.from_json(msgs.to_json(m))
    assert back == m
