"""YAML action DSL + step-schedule executor closed-loop tests.

≙ the reference executing ``my_actions/motion_scripts`` through the
action loader → action server → executor → balance controller
(SURVEY.md §3.4).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_locomotion_tpu.api.actions import load_action
from quadruped_locomotion_tpu.control.locomotion import ControllerParams
from quadruped_locomotion_tpu.rollout import script_loop as sl
from quadruped_locomotion_tpu.types import RobotModel
from quadruped_locomotion_tpu.utils.rotations import rpy_from_quat

SCRIPTS = os.path.join(
    os.path.dirname(__file__),
    "..",
    "quadruped_locomotion_tpu",
    "api",
    "motion_scripts",
)
MODEL = RobotModel.simpledog()
PARAMS = ControllerParams.defaults()


def run_script(name, nticks, height=0.38):
    ss0 = sl.init_script_state(MODEL, None, height=height)
    sched = load_action(
        os.path.join(SCRIPTS, name),
        ss0.sim.robot.base.position,
        ss0.sim.robot.base.quaternion,
        ss0.sim.feet_world,
    )
    ssf, tel = jax.jit(
        lambda ss: sl.run_schedule(MODEL, PARAMS, sched, ss, nticks)
    )(ss0)
    assert bool(jnp.isfinite(tel["base_position"]).all()), name
    return ssf, tel


def test_standup_raises_base():
    ssf, tel = run_script("standup.yaml", 350)
    assert bool(ssf.exec.done)
    h = float(ssf.sim.robot.base.position[2])
    assert abs(h - 0.45) < 0.02
    # feet never moved
    np.testing.assert_allclose(
        np.asarray(ssf.sim.feet_world[:, 2]), 0.0, atol=2e-3
    )


def test_leg_move_steps_and_returns():
    ssf, tel = run_script("leg_move.yaml", 700)
    assert bool(ssf.exec.done)
    # LF stepped to +0.48 and back to 0.40 (footprint ≈ world at start)
    lf = np.asarray(ssf.sim.feet_world[0])
    np.testing.assert_allclose(lf[:2], [0.40, 0.175], atol=0.02)
    # the foot actually traveled: telemetry shows it beyond 0.45 at some tick
    lf_x = np.asarray(tel["feet_world"])[:, 0, 0]
    assert lf_x.max() > 0.45
    # robot still upright
    assert float(ssf.sim.robot.base.position[2]) > 0.3


def test_base_rotate_yaw_twists_and_returns():
    ssf, tel = run_script("base_rotate_yaw.yaml", 600)
    assert bool(ssf.exec.done)
    yaws = []
    for q in np.asarray(tel["base_quaternion"])[::10]:
        _, _, y = rpy_from_quat(jnp.asarray(q))
        yaws.append(float(y))
    assert max(yaws) > 0.2  # reached most of the commanded 0.3 rad twist
    _, _, y_end = rpy_from_quat(ssf.sim.robot.base.quaternion)
    assert abs(float(y_end)) < 0.05  # and returned


def test_ee_target_parks_foot_in_air():
    """end_effector_target + ignore_contact: the LF foot lifts to the
    commanded air target, stays non-support while the base crouches and
    recovers, then a footstep returns it to the ground
    (≙ my_actions end_effectors_target_demo)."""
    ssf, tel = run_script("end_effectors_target_demo.yaml", 2600, height=0.4)
    assert bool(ssf.exec.done)
    lf_z = np.asarray(tel["feet_world"])[:, 0, 2]
    assert lf_z.max() > 0.12  # foot reached the air target
    # the park is honest: while the base is crouched below 0.34 m the LF
    # foot must still be parked in the air, not quietly load-bearing
    base_z = np.asarray(tel["base_position"])[:, 2]
    crouched = base_z < 0.34
    assert crouched.any()
    assert lf_z[crouched].min() > 0.08, lf_z[crouched].min()
    # foot back on the ground near the scripted target at the end
    np.testing.assert_allclose(
        np.asarray(ssf.sim.feet_world[0, 2]), 0.0, atol=0.02
    )
    np.testing.assert_allclose(
        np.asarray(ssf.sim.feet_world[0, :2]), [0.42, 0.25], atol=0.06
    )
    assert float(ssf.sim.robot.base.position[2]) > 0.3


def test_trot_test_diagonal_pairs():
    ssf, tel = run_script("trot_test.yaml", 400, height=0.4)
    assert bool(ssf.exec.done)
    feet = np.asarray(ssf.sim.feet_world)
    # all four feet landed near the scripted square (footprint ≈ world)
    np.testing.assert_allclose(
        np.abs(feet[:, 0]), 0.42, atol=0.04
    )
    np.testing.assert_allclose(np.abs(feet[:, 1]), 0.25, atol=0.04)
    assert float(ssf.sim.robot.base.position[2]) > 0.3


def test_joint_trajectory_reposes_hind_legs():
    """change_to_spot: hind legs follow their scripted joint trajectories
    (joint-space control path, ≙ ros_balance_controller joint mode) and
    are re-loaded as support via leg_mode."""
    ssf, tel = run_script("change_to_spot.yaml", 900, height=0.4)
    assert bool(ssf.exec.done)
    # each hind leg passed through its scripted joint target while under
    # joint-space control (after leg_mode re-loads it, the stance QP owns
    # the leg again and may move it)
    qs = np.asarray(tel["joint_positions"])  # (T,4,3)
    d_rh = np.abs(qs[:, 2] - np.array([0.0, 1.0, -2.0])).max(axis=1)
    d_lh = np.abs(qs[:, 3] - np.array([0.0, -1.0, 2.0])).max(axis=1)
    assert d_rh.min() < 0.15, d_rh.min()
    assert d_lh.min() < 0.15, d_lh.min()
    assert bool(jnp.isfinite(ssf.sim.robot.q).all())
    assert float(ssf.sim.robot.base.position[2]) > 0.15


def test_base_trajectory_inline():
    """base_trajectory: multi-knot SE(3) curve through two knots."""
    script = """
adapt_coordinates:
  - transform:
      source_frame: base_link
steps:
  - step:
      - base_trajectory:
          trajectory:
            knots:
              - {time: 1.2, position: [0.0, 0.0, -0.04], orientation: [0.0, 0.0, 0.15]}
              - {time: 2.4, position: [0.0, 0.0, 0.0], orientation: [0.0, 0.0, 0.0]}
"""
    ss0 = sl.init_script_state(MODEL, None, height=0.4)
    sched = __import__(
        "quadruped_locomotion_tpu.api.actions", fromlist=["load_action"]
    ).load_action(
        script,
        ss0.sim.robot.base.position,
        ss0.sim.robot.base.quaternion,
        ss0.sim.feet_world,
    )
    ssf, tel = jax.jit(
        lambda ss: sl.run_schedule(MODEL, PARAMS, sched, ss, 320)
    )(ss0)
    assert bool(ssf.exec.done)
    yaws = []
    for q in np.asarray(tel["base_quaternion"])[::10]:
        _, _, y = rpy_from_quat(jnp.asarray(q))
        yaws.append(float(y))
    assert max(yaws) > 0.10  # passed through the mid-knot twist
    _, _, y_end = rpy_from_quat(ssf.sim.robot.base.quaternion)
    assert abs(float(y_end)) < 0.05  # and returned at the final knot
    assert abs(float(ssf.sim.robot.base.position[2]) - 0.4) < 0.03


def test_ee_trajectory_follows_knots():
    """end_effector_trajectory: the foot passes through explicit cartesian
    knots (≙ EndEffectorTrajectory leg motion)."""
    script = """
adapt_coordinates:
  - transform:
      source_frame: foot_print
steps:
  - step:
      - base_auto:
          height: 0.4
  - step:
      - base_auto:
          height: 0.4
      - leg_mode:
          name: LF_LEG
          support_leg: true
          ignore_for_pose_adaptation: true
          duration: 0.1
  - step:
      - end_effector_trajectory:
          name: LF_LEG
          ignore_contact: true
          ignore_for_pose_adaptation: true
          trajectory:
            knots:
              - {time: 0.8, position: [0.40, 0.25, 0.15]}
              - {time: 1.6, position: [0.50, 0.25, 0.10]}
"""
    ss0 = sl.init_script_state(MODEL, None, height=0.4)
    from quadruped_locomotion_tpu.api.actions import load_action as la

    sched = la(
        script,
        ss0.sim.robot.base.position,
        ss0.sim.robot.base.quaternion,
        ss0.sim.feet_world,
    )
    ssf, tel = jax.jit(
        lambda ss: sl.run_schedule(MODEL, PARAMS, sched, ss, 520)
    )(ss0)
    assert bool(ssf.exec.done)
    lf = np.asarray(tel["feet_world"])[:, 0, :]
    # passed near the mid knot and ended at the final knot (held in air)
    d_mid = np.linalg.norm(lf - np.array([0.40, 0.25, 0.15]), axis=1)
    assert d_mid.min() < 0.04, d_mid.min()
    np.testing.assert_allclose(lf[-1], [0.50, 0.25, 0.10], atol=0.04)
    assert float(ssf.sim.robot.base.position[2]) > 0.3
