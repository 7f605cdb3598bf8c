"""Estimator-in-the-loop closed-loop tests.

The reference's StateEstimateController is a TODO stub that forwards
ground truth (``state_estimate_controller.cpp:62-83``); here the full
trot must stay upright when the controller ONLY sees the error-state
EKF output driven by noisy IMU + encoders + contact switches — plus
slip detection (STANCE_SLIPPING) made reachable by the friction-cone
plant on a low-μ floor.
"""

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_locomotion_tpu.control import state_estimator as se
from quadruped_locomotion_tpu.control.contact_fsm import STANCE_SLIPPING
from quadruped_locomotion_tpu.control.locomotion import ControllerParams
from quadruped_locomotion_tpu.gait.phase import GaitParams
from quadruped_locomotion_tpu.rollout import estimated_loop as el
from quadruped_locomotion_tpu.rollout.closed_loop import Command
from quadruped_locomotion_tpu.types import RobotModel


def _rollout(els0, cmd, steps, sensors, friction_mu=None):
    model = RobotModel.simpledog()
    params = ControllerParams.defaults()
    gp = GaitParams.trot_defaults()
    ep = se.EstimatorParams.defaults()
    return jax.jit(
        lambda els: el.rollout_estimated(
            model, params, gp, ep, sensors, els, cmd, steps,
            friction_mu=friction_mu,
        )
    )(els0)


def test_trot_on_estimated_state_stays_up():
    """6 s of reference-timing trot at 0.2 m/s where the controller never
    sees ground truth — only the EKF fed by noisy MEMS-grade sensors."""
    model = RobotModel.simpledog()
    gp = GaitParams.trot_defaults()
    els0 = el.init_estimated(model, gp, jax.random.PRNGKey(0))
    cmd = Command(
        linear_velocity=jnp.array([0.2, 0.0, 0.0]), yaw_rate=jnp.asarray(0.0)
    )
    _, tel = _rollout(els0, cmd, 600, el.SensorParams.realistic())
    bp = np.asarray(tel["base_position"])
    assert np.isfinite(bp).all()
    assert (bp[:, 2] > 0.3).all() and (bp[:, 2] < 0.5).all()
    assert bp[-1, 0] > 0.5  # makes real forward progress
    assert abs(bp[-1, 1]) < 0.2
    # estimator quality while trotting: velocity is fully observable
    vel_err = np.asarray(tel["vel_err"])
    assert np.median(vel_err[100:]) < 0.12, np.median(vel_err[100:])
    # position drifts only slowly (anchored by stance feet)
    pos_err = np.asarray(tel["pos_err"])
    assert pos_err[-1] < 0.25, pos_err[-1]


def test_estimator_converges_from_initial_offset():
    """Standing with a 5 cm initial base-position error and ideal sensors:
    the kinematic updates must pull the estimate onto truth."""
    model = RobotModel.simpledog()
    gp = GaitParams.trot_defaults()
    els0 = el.init_estimated(
        model, gp, jax.random.PRNGKey(1), init_pos_err=0.05
    )
    err0 = float(
        jnp.linalg.norm(
            els0.est.position - els0.loop.sim.robot.base.position
        )
    )
    assert err0 > 0.04  # really started wrong
    _, tel = _rollout(els0, Command.zero(), 150, el.SensorParams.ideal())
    pos_err = np.asarray(tel["pos_err"])
    # the kinematic updates are strong: converged within the very first
    # planner tick (4 EKF updates) and stays converged
    assert pos_err[-1] < 0.01, pos_err[-1]
    assert pos_err.max() < err0
    bp = np.asarray(tel["base_position"])
    assert (bp[:, 2] > 0.3).all()


def test_slip_detected_and_survived_on_low_friction_floor():
    """μ = 0.2 floor at 0.3 m/s: the friction-cone plant makes stance
    feet slide, the measured-kinematics detector flags STANCE_SLIPPING
    in the live loop (the state was previously unreachable end-to-end),
    and the trot survives 3 s of repeated slipping upright."""
    model = RobotModel.simpledog()
    gp = GaitParams.trot_defaults()
    els0 = el.init_estimated(model, gp, jax.random.PRNGKey(2))
    cmd = Command(
        linear_velocity=jnp.array([0.3, 0.0, 0.0]), yaw_rate=jnp.asarray(0.0)
    )
    _, tel = _rollout(
        els0, cmd, 300, el.SensorParams.realistic(), friction_mu=0.2
    )
    bp = np.asarray(tel["base_position"])
    assert np.isfinite(bp).all()
    assert (bp[:, 2] > 0.25).all(), bp[:, 2].min()  # survived upright
    leg_state = np.asarray(tel["leg_state"])  # (T, 4)
    n_slip = int((leg_state == STANCE_SLIPPING).sum())
    assert n_slip > 50, "STANCE_SLIPPING never reached in the live loop"
    # the plant really slid: stance-foot anchors moved while pinned.
    feet = np.asarray(tel["feet_world"])  # (T,4,3)
    moved = np.abs(np.diff(feet[:, :, :2], axis=0)).max()
    assert moved > 1e-4


def test_high_mu_matches_rigid_stick():
    """friction_mu far above any demand reproduces the validated rigid
    plant (same trajectory to float tolerance) — the cone machinery is
    exactly dormant when inactive."""
    from quadruped_locomotion_tpu.rollout import articulated as artlib
    from quadruped_locomotion_tpu.rollout import simulator as simlib

    model = RobotModel.simpledog()
    sim = simlib.default_stance_state(model)
    tau = jnp.zeros((4, 3))
    step_rigid = jax.jit(lambda s: artlib.step(model, s, tau, 0.0025))
    step_cone = jax.jit(
        lambda s: artlib.step(model, s, tau, 0.0025, friction_mu=1e6)
    )
    s_rigid = sim
    s_cone = sim
    for _ in range(40):
        s_rigid = step_rigid(s_rigid)
        s_cone = step_cone(s_cone)
    np.testing.assert_allclose(
        np.asarray(s_rigid.robot.base.position),
        np.asarray(s_cone.robot.base.position),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(s_rigid.robot.q), np.asarray(s_cone.robot.q), atol=1e-5
    )
