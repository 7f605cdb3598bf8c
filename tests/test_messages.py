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
        step_number=3, phase=0.5, active_branches=["LF_LEG"]
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


def _full_coverage_goal():
    """One goal exercising EVERY Step.msg motion type
    (≙ free_gait_msgs/Step.msg full field list)."""
    return msgs.ExecuteStepsGoal(
        source_frame="foot_print",
        steps=[
            msgs.StepMsg(
                id="s0",
                footsteps=[
                    msgs.FootstepMsg(
                        name="LF_LEG",
                        target=(0.48, 0.175, 0.0),
                        surface_normal=(0.0, 0.1, 0.9),
                        ignore_for_pose_adaptation=True,
                    )
                ],
                base_auto=msgs.BaseAutoMsg(
                    height=0.38, support_margin=0.06,
                    ignore_timing_of_leg_motion=True,
                ),
            ),
            msgs.StepMsg(
                end_effector_targets=[
                    msgs.EndEffectorTargetMsg(
                        name="RF_LEG",
                        target_position=(0.45, -0.2, 0.05),
                        average_velocity=0.2,
                        ignore_contact=True,
                    )
                ],
                base_target=msgs.BaseTargetMsg(
                    position=(0.0, 0.0, 0.0),
                    orientation_rpy=(0.0, 0.0, 0.2),
                    frame="base_link",
                ),
            ),
            msgs.StepMsg(
                end_effector_trajectories=[
                    msgs.EndEffectorTrajectoryMsg(
                        name="RH_LEG",
                        knots=[
                            msgs.TrajectoryKnotMsg(
                                time=0.4, position=(-0.4, -0.18, 0.06)
                            ),
                            msgs.TrajectoryKnotMsg(
                                time=0.8, position=(-0.36, -0.18, 0.0)
                            ),
                        ],
                        ignore_contact=True,
                    )
                ],
            ),
            msgs.StepMsg(
                joint_trajectories=[
                    msgs.JointTrajectoryMsg(
                        name="LH_LEG",
                        knots=[
                            msgs.JointKnotMsg(
                                time=0.5, positions=(0.1, 0.7, -1.4)
                            )
                        ],
                        ignore_contact=True,
                    )
                ],
                custom_commands=[
                    msgs.CustomCommandMsg(
                        type="hold", duration=1.5, command="{}"
                    )
                ],
            ),
            msgs.StepMsg(
                joint_targets=[
                    msgs.JointTargetMsg(
                        name="LH_LEG",
                        positions=(0.0, 0.8, -1.5),
                        duration=0.6,
                        ignore_contact=True,
                    )
                ],
            ),
            msgs.StepMsg(
                leg_modes=[
                    msgs.LegModeMsg(
                        name="LH_LEG",
                        support_leg=True,
                        duration=0.4,
                        surface_normal=(0.0, 0.0, 1.0),
                    )
                ],
                base_trajectory=msgs.BaseTrajectoryMsg(
                    knots=[
                        msgs.TrajectoryKnotMsg(
                            time=1.0,
                            position=(0.02, 0.0, 0.40),
                            orientation_rpy=(0.0, 0.0, 0.1),
                        )
                    ],
                    frame="foot_print",
                ),
            ),
        ],
    )


def test_full_step_msg_surface_round_trips_and_compiles():
    """Every Step.msg motion type survives JSON and compiles to the
    schedule the equivalent YAML produces (wire ≡ YAML parity)."""
    from quadruped_locomotion_tpu.planning import steps as steps_mod
    import jax

    goal = _full_coverage_goal()
    assert msgs.from_json(msgs.to_json(goal)) == goal

    sim = simlib.default_stance_state(MODEL, height=0.38)
    sched = msgs.goal_to_schedule(
        goal,
        sim.robot.base.position,
        sim.robot.base.quaternion,
        sim.feet_world,
    )
    lm = np.asarray(sched.leg_motion_type)
    bm = np.asarray(sched.base_mode)
    # step 0: LF footstep + base auto (margin honored)
    assert lm[0, 0] == steps_mod.LEG_FOOTSTEP
    assert bm[0] == steps_mod.BASE_AUTO
    assert np.isclose(float(sched.base_margin[0]), 0.06)
    assert bool(sched.base_ignore_timing[0])
    assert np.allclose(
        np.asarray(sched.leg_surface_normal[0, 0]), [0.0, 0.1, 0.9]
    )
    assert bool(sched.leg_ignore_pose_adapt[0, 0])
    # step 1: RF ee-target + base target
    assert lm[1, 1] == steps_mod.LEG_EE_TARGET
    assert bm[1] == steps_mod.BASE_TARGET
    assert bool(sched.leg_ignore_contact[1, 1])
    # step 2: RH ee-trajectory with 2 knots
    assert lm[2, 2] == steps_mod.LEG_EE_TRAJ
    assert int(sched.knot_n[2, 2]) == 2
    # step 3: LH joint trajectory + custom-command hold
    assert lm[3, 3] == steps_mod.LEG_JOINT_TRAJ
    assert float(sched.min_duration[3]) >= 1.5
    # step 4: joint TARGET = 1-knot joint trajectory at t=duration
    assert lm[4, 3] == steps_mod.LEG_JOINT_TRAJ
    assert int(sched.knot_n[4, 3]) == 1
    assert np.isclose(float(sched.knot_times[4, 3, 0]), 0.6)
    assert np.allclose(
        np.asarray(sched.knot_values[4, 3, 0]), [0.0, 0.8, -1.5]
    )
    # step 5: leg-mode reload + base trajectory
    assert lm[5, 3] == steps_mod.LEG_MODE
    assert bm[5] == steps_mod.BASE_TRAJECTORY
    assert int(sched.base_nknots[5]) == 1

    # YAML equivalence for a sample of the new types
    yaml_src = """
steps:
  - step:
      - end_effector_trajectory:
          name: RH_LEG
          ignore_contact: true
          trajectory:
            knots:
              - {time: 0.4, position: [-0.4, -0.18, 0.06]}
              - {time: 0.8, position: [-0.36, -0.18, 0.0]}
"""
    import yaml as _yaml

    doc = _yaml.safe_load(yaml_src)
    from quadruped_locomotion_tpu.api.actions import build_schedule

    sched_y = build_schedule(
        doc,
        sim.robot.base.position,
        sim.robot.base.quaternion,
        sim.feet_world,
        jnp.float32,
    )
    row = jax.tree_util.tree_map(lambda a: a[2:3], sched)
    for a, b in zip(
        jax.tree_util.tree_leaves(row), jax.tree_util.tree_leaves(sched_y)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
