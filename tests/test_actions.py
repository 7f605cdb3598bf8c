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
