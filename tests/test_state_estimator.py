"""IMU + leg-odometry EKF tests.

The reference's StateEstimateController is a stub
(``state_estimate_controller.cpp:62-83``); this validates the real
observer that replaces it: convergence from a wrong initial state, and
tracking of a moving kinematic trajectory from synthesized IMU + joint
measurements.
"""

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_locomotion_tpu.control import state_estimator as se
from quadruped_locomotion_tpu.model.kinematics import inverse_kinematics
from quadruped_locomotion_tpu.rollout import simulator as simlib
from quadruped_locomotion_tpu.types import GRAVITY, RobotModel
from quadruped_locomotion_tpu.utils.rotations import quat_inv_rotate

MODEL = RobotModel.simpledog()
PARAMS = se.EstimatorParams.defaults()
DT = 0.0025  # 400 Hz, the control tick


def _stance_measurements(sim):
    feet_base = quat_inv_rotate(
        jnp.broadcast_to(sim.robot.base.quaternion, (4, 4)),
        sim.feet_world - sim.robot.base.position,
    )
    return inverse_kinematics(MODEL, feet_base)


def test_stationary_stance_holds_truth():
    sim = simlib.default_stance_state(MODEL, height=0.4)
    qj = _stance_measurements(sim)
    contact = jnp.ones(4, bool)
    gyro = jnp.zeros(3)
    accel = jnp.array([0.0, 0.0, GRAVITY])  # specific force at rest

    est = se.init_state(
        sim.robot.base.position, sim.robot.base.quaternion, sim.feet_world
    )

    def tick(est, _):
        est = se.step(MODEL, PARAMS, est, gyro, accel, qj, contact, DT)
        return est, est.position

    est, traj = jax.jit(
        lambda e: jax.lax.scan(tick, e, None, length=800)
    )(est)
    np.testing.assert_allclose(
        np.asarray(est.position), [0.0, 0.0, 0.4], atol=2e-3
    )
    np.testing.assert_allclose(np.asarray(est.velocity), 0.0, atol=5e-3)
    assert np.isfinite(np.asarray(est.covariance)).all()


def test_converges_from_wrong_initial_base():
    sim = simlib.default_stance_state(MODEL, height=0.4)
    qj = _stance_measurements(sim)
    contact = jnp.ones(4, bool)
    gyro = jnp.zeros(3)
    accel = jnp.array([0.0, 0.0, GRAVITY])

    est = se.init_state(
        sim.robot.base.position + jnp.array([0.05, -0.03, 0.04]),
        sim.robot.base.quaternion,
        sim.feet_world,  # feet known (true touchdown points)
        pos_std=0.1,
        foot_std=0.001,
    )

    def tick(est, _):
        est = se.step(MODEL, PARAMS, est, gyro, accel, qj, contact, DT)
        return est, None

    est, _ = jax.jit(lambda e: jax.lax.scan(tick, e, None, length=400))(est)
    np.testing.assert_allclose(
        np.asarray(est.position), [0.0, 0.0, 0.4], atol=5e-3
    )


def test_tracks_moving_base_from_preview_trace():
    """Kinematic golden trace: run the leg_move preview, synthesize ideal
    IMU, feed FK joint measurements; the EKF must track the base."""
    import os

    from quadruped_locomotion_tpu.api.actions import load_action
    from quadruped_locomotion_tpu.rollout import preview as pv

    scripts = os.path.join(
        os.path.dirname(__file__),
        "..",
        "quadruped_locomotion_tpu",
        "api",
        "motion_scripts",
    )
    sim = simlib.default_stance_state(MODEL, height=0.38)
    sched = load_action(
        os.path.join(scripts, "leg_move.yaml"),
        sim.robot.base.position,
        sim.robot.base.quaternion,
        sim.feet_world,
    )
    dt = 0.01
    batch = jax.jit(
        lambda: pv.batch_preview(
            MODEL,
            sched,
            sim.feet_world,
            sim.robot.base.position,
            sim.robot.base.quaternion,
            400,
            dt=dt,
        )
    )()

    gyro, accel = se.synthesize_imu(
        batch.base_quaternion, batch.base_position, dt
    )
    est0 = se.init_state(
        batch.base_position[0],
        batch.base_quaternion[0],
        batch.feet_world[0],
    )

    def tick(est, inp):
        g, a, qj, c = inp
        est = se.step(MODEL, PARAMS, est, g, a, qj, c, dt)
        return est, est.position

    inputs = (
        gyro,
        accel,
        batch.joint_positions[1:],
        batch.support[1:],
    )
    est, traj = jax.jit(lambda e: jax.lax.scan(tick, e, inputs))(est0)

    err = np.linalg.norm(
        np.asarray(traj) - np.asarray(batch.base_position[1:]), axis=1
    )
    assert err[-1] < 0.02, err[-1]
    assert err.max() < 0.05, err.max()


def test_batched_filter_vmaps():
    sim = simlib.default_stance_state(MODEL, height=0.4)
    qj = _stance_measurements(sim)
    est = se.init_state(
        sim.robot.base.position, sim.robot.base.quaternion, sim.feet_world
    )
    B = 8
    ests = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), est
    )
    gyro = jnp.zeros((B, 3))
    accel = jnp.tile(jnp.array([0.0, 0.0, GRAVITY]), (B, 1))
    out = jax.jit(
        jax.vmap(
            lambda e, g, a: se.step(
                MODEL,
                PARAMS,
                e,
                g,
                a,
                qj,
                jnp.ones(4, bool),
                DT,
            )
        )
    )(ests, gyro, accel)
    assert out.position.shape == (B, 3)
    assert np.isfinite(np.asarray(out.covariance)).all()
