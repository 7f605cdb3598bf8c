"""Closed-loop locomotion regression tests.

The end-to-end slice the reference exercises via Gazebo + the
action_server_test node (SURVEY.md §3): gait engine → contact FSM →
VMC + force-distribution QP + swing computed-torque → rigid-body plant,
all inside one jitted two-rate ``lax.scan``.
"""

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_locomotion_tpu.control.locomotion import ControllerParams
from quadruped_locomotion_tpu.gait import gait_generator as gg
from quadruped_locomotion_tpu.gait.phase import GaitParams
from quadruped_locomotion_tpu.rollout import closed_loop as cl
from quadruped_locomotion_tpu.types import RobotModel
from quadruped_locomotion_tpu.utils.rotations import quat_from_rpy, quat_rotate


def _run(ls0, cmd, steps):
    model = RobotModel.simpledog()
    params = ControllerParams.defaults()
    gp = GaitParams.trot_defaults()
    lsf, tel = jax.jit(
        lambda ls: cl.rollout(model, params, gp, ls, cmd, steps)
    )(ls0)
    return lsf, tel


def test_forward_trot_stable_and_tracks():
    model = RobotModel.simpledog()
    gp = GaitParams.trot_defaults()
    ls0 = cl.init_locomotion(model, gp)
    cmd = cl.Command(
        linear_velocity=jnp.array([0.2, 0.0, 0.0]), yaw_rate=jnp.asarray(0.0)
    )
    steps = 400  # 4 s
    _, tel = _run(ls0, cmd, steps)
    bp = np.asarray(tel["base_position"])
    assert np.isfinite(bp).all()
    # height holds near the 0.38 reference (0.4 − 0.02 foothold offset)
    assert (bp[:, 2] > 0.3).all() and (bp[:, 2] < 0.5).all()
    # walks forward without lateral drift
    assert bp[-1, 0] > 0.3
    assert abs(bp[-1, 1]) < 0.15
    # QP stays healthy throughout
    assert float(jnp.max(tel["qp_kkt"])) < 1.0


def test_standing_balance_indefinite():
    model = RobotModel.simpledog()
    gp = GaitParams.trot_defaults()
    ls0 = cl.init_locomotion(model, gp)
    _, tel = _run(ls0, cl.Command.zero(), 300)
    bp = np.asarray(tel["base_position"])
    assert np.isfinite(bp).all()
    assert (bp[:, 2] > 0.3).all()
    assert np.abs(bp[-1, :2]).max() < 0.05


def test_yaw_equivariance_of_full_loop():
    """The full closed loop is equivariant under world yaw: a trot started
    at yaw 90° must behave like the yaw-0 trot rotated. Guards the frame
    conventions (body-frame angular velocity, base-anchored friction
    pyramid) that broke exactly at yaw≈90° during bring-up."""
    model = RobotModel.simpledog()
    gp = GaitParams.trot_defaults()
    yaw0 = jnp.asarray(jnp.pi / 2)
    q0 = quat_from_rpy(jnp.asarray(0.0), jnp.asarray(0.0), yaw0)

    ls = cl.init_locomotion(model, gp)
    sim = ls.sim
    base = sim.robot.base.replace(
        position=quat_rotate(q0, sim.robot.base.position), quaternion=q0
    )
    feet = quat_rotate(q0[None], sim.feet_world)
    sim = sim.replace(robot=sim.robot.replace(base=base), feet_world=feet)
    gait = gg.init_gait_state(0, gp, feet).replace(yaw_ref=yaw0)
    ls0 = cl.LocomotionState(sim=sim, gait=gait, fsm=ls.fsm)

    v = quat_rotate(q0, jnp.array([0.2, 0.0, 0.0]))
    cmd = cl.Command(linear_velocity=v, yaw_rate=jnp.asarray(0.0))
    _, tel = _run(ls0, cmd, 300)
    bp = np.asarray(tel["base_position"])
    assert np.isfinite(bp).all()
    assert (bp[:, 2] > 0.3).all()
    # walks along world +y (the rotated forward direction)
    assert bp[-1, 1] > 0.2
    assert abs(bp[-1, 0]) < 0.15


def test_pace_closed_loop_stable():
    """Pace at the reference timing (t_sw 0.5 / t_st 1.5,
    action_server_test.cpp:255) stays upright and makes forward progress
    in the full closed loop — the gait the reference demos in Gazebo
    (pace_gazebo.yaml). Guards the long-stance reach-release path in the
    plant (a pinned foot at full leg extension must break contact, not
    blow through the straight-knee singularity)."""
    model = RobotModel.simpledog()
    params = ControllerParams.defaults()
    gp = GaitParams.pace_defaults()
    ls0 = cl.init_locomotion(model, gp, gait_type=1)
    cmd = cl.Command(
        linear_velocity=jnp.array([0.15, 0.0, 0.0], jnp.float32),
        yaw_rate=jnp.asarray(0.0, jnp.float32),
    )
    lsf, tel = jax.jit(
        lambda ls: cl.rollout(model, params, gp, ls, cmd, 800)
    )(ls0)
    base = np.asarray(tel["base_position"])
    assert np.isfinite(base).all()
    assert base[:, 2].min() > 0.3, base[:, 2].min()
    assert base[:, 2].max() < 0.5
    # forward progress: ≥ half the commanded distance over 8 s
    assert base[-1, 0] - base[0, 0] > 0.6, base[-1, 0]
    # lateral drift bounded (pace is the laterally-critical gait)
    assert np.abs(base[:, 1]).max() < 0.3, np.abs(base[:, 1]).max()
