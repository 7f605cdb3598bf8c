"""Closed-loop locomotion on *estimated* state: plant → sensors → EKF → controller.

The reference reserved a controller slot for state estimation but left it
a TODO stub that copies ground truth into the shared handle
(``balance_controller/src/ros_controller/state_estimate_controller.cpp:62-83``).
This module proves the real thing end-to-end: the balance controller and
gait engine never see the plant's ground truth — they run on the output
of the error-state EKF (:mod:`..control.state_estimator`), which itself
only sees realistic sensors:

* body-frame gyro + accelerometer with white noise and constant bias,
  synthesized from the plant's true base motion;
* joint encoders (position + velocity) with white noise;
* binary foot-contact switches.

Per 400 Hz control substep: measure → FSM (with slip detection from
*measured* kinematics) → controller on the estimate → plant step →
EKF predict (IMU) + update (FK of stance feet). The gait engine's
100 Hz tick also runs on the estimate (base pose and the EKF's foot
positions). Same two-rate `lax.scan` structure as
:mod:`.closed_loop`; vmaps over scenario batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..control import state_estimator as se
from ..control.contact_fsm import apply_swing_reflexes, fsm_step
from ..control.locomotion import ControllerParams, locomotion_update
from ..control.swing import joint_pd_gravity_torques
from ..gait import gait_generator as gg
from ..gait.phase import GaitParams
from ..types import GRAVITY, BaseState, RobotModel
from ..utils.rotations import matrix_from_quat
from . import articulated as artlib
from . import simulator as simlib
from .closed_loop import (
    CONTROL_DT,
    CONTROL_SUBSTEPS,
    PLANNER_DT,
    Command,
    LocomotionState,
    init_locomotion,
    measured_foot_speed_tangential,
)


@struct.dataclass
class SensorParams:
    """White-noise std devs + constant biases of the simulated sensors."""

    gyro_noise: jax.Array  # rad/s per sample
    accel_noise: jax.Array  # m/s² per sample
    encoder_noise: jax.Array  # rad
    encoder_vel_noise: jax.Array  # rad/s
    gyro_bias: jax.Array  # (3,) rad/s
    accel_bias: jax.Array  # (3,) m/s²

    @classmethod
    def realistic(cls, dtype=jnp.float32) -> "SensorParams":
        """Consumer-grade MEMS IMU + 16-bit encoders at 400 Hz."""
        f = lambda x: jnp.asarray(x, dtype)
        return cls(
            gyro_noise=f(0.02),
            accel_noise=f(0.4),
            encoder_noise=f(1e-3),
            encoder_vel_noise=f(1e-2),
            gyro_bias=f([0.002, -0.003, 0.001]),
            accel_bias=f([0.05, -0.03, 0.08]),
        )

    @classmethod
    def ideal(cls, dtype=jnp.float32) -> "SensorParams":
        f = lambda x: jnp.asarray(x, dtype)
        z3 = f([0.0, 0.0, 0.0])
        return cls(
            gyro_noise=f(0.0),
            accel_noise=f(0.0),
            encoder_noise=f(0.0),
            encoder_vel_noise=f(0.0),
            gyro_bias=z3,
            accel_bias=z3,
        )


@struct.dataclass
class EstimatedLoopState:
    loop: LocomotionState
    est: se.EstimatorState
    gyro: jax.Array  # (3,) latest gyro measurement (controller's ω source)
    key: jax.Array


def init_estimated(
    model: RobotModel,
    gait_params: GaitParams,
    key: jax.Array,
    gait_type: int = 0,
    init_pos_err: float = 0.0,
) -> EstimatedLoopState:
    ls = init_locomotion(model, gait_params, gait_type=gait_type)
    truth = ls.sim.robot.base
    pos0 = truth.position + init_pos_err * jnp.array([1.0, -1.0, 0.5])
    est = se.init_state(
        pos0, truth.quaternion, ls.sim.feet_world, pos_std=0.02, foot_std=1e-3
    )
    return EstimatedLoopState(
        loop=ls, est=est, gyro=jnp.zeros(3, pos0.dtype), key=key
    )


def _estimated_robot(sim_robot, est, gyro, q_meas, qd_meas):
    """The state the controller believes: EKF base + measured joints."""
    base = BaseState(
        position=est.position,
        quaternion=est.quaternion,
        linear_velocity=est.velocity,
        angular_velocity=gyro,
    )
    return sim_robot.replace(base=base, q=q_meas, qd=qd_meas)


def planner_tick_estimated(
    model: RobotModel,
    params: ControllerParams,
    gait_params: GaitParams,
    est_params: se.EstimatorParams,
    sensors: SensorParams,
    els: EstimatedLoopState,
    command: Command,
    qp_iters: int = 15,
    plant: str = "articulated",
    friction_mu: float | None = None,
):
    """One 100 Hz planner tick + 4 estimated control/physics substeps."""
    ls = els.loop
    dtype = ls.sim.feet_world.dtype
    key, kj = jax.random.split(els.key)

    # Gait tick on the ESTIMATE: EKF base + measured joints + EKF feet.
    q_meas0 = ls.sim.robot.q + sensors.encoder_noise * jax.random.normal(
        kj, (4, 3), dtype
    )
    robot_hat = _estimated_robot(
        ls.sim.robot, els.est, els.gyro, q_meas0, ls.sim.robot.qd
    )
    gait2, support, (pos_w, vel_w, acc_w), target, normals = gg.advance(
        model,
        ls.gait,
        robot_hat,
        els.est.foot_positions,
        gait_params,
        command.linear_velocity,
        command.yaw_rate,
        PLANNER_DT,
    )
    sw_norm = gait2.phase.swing_phase / jnp.maximum(gait_params.t_swing, 1e-6)
    st_norm = gait2.phase.stance_phase / jnp.maximum(
        gait_params.t_stance, 1e-6
    )

    g_vec = jnp.array([0.0, 0.0, -GRAVITY], dtype)

    def ctrl(carry, _):
        sim, fsm_state, est, gyro_prev, key = carry
        key, k1, k2, k3, k4, k5 = jax.random.split(key, 6)

        # --- measure -----------------------------------------------------
        q_meas = sim.robot.q + sensors.encoder_noise * jax.random.normal(
            k1, (4, 3), dtype
        )
        qd_meas = sim.robot.qd + (
            sensors.encoder_vel_noise * jax.random.normal(k2, (4, 3), dtype)
        )
        gyro = (
            sim.robot.base.angular_velocity
            + sensors.gyro_bias
            + sensors.gyro_noise * jax.random.normal(k3, (3,), dtype)
        )
        contact = simlib.contact_sensor(sim)

        # --- reconcile + control on the estimate -------------------------
        robot_meas = _estimated_robot(sim.robot, est, gyro, q_meas, qd_meas)
        fsm_state2, fsm = fsm_step(
            fsm_state, support, contact, sw_norm, st_norm, q_meas,
            foot_speed_tangential=measured_foot_speed_tangential(
                model, robot_meas
            ),
        )
        pos_r, vel_r, acc_r = apply_swing_reflexes(
            pos_w, vel_w, acc_w, est.foot_positions, fsm
        )
        state = robot_meas.replace(support=fsm.support, surface_normal=normals)
        tau, diag = locomotion_update(
            model, params, state, target, pos_r, vel_r, acc_r,
            qp_iters=qp_iters,
        )
        tau_freeze = joint_pd_gravity_torques(
            model, state, fsm.q_freeze, jnp.zeros_like(fsm.q_freeze)
        )
        tau = jnp.where(fsm.freeze[:, None], tau_freeze, tau)

        # --- plant (ground truth) ----------------------------------------
        v1 = sim.robot.base.linear_velocity
        rot1 = matrix_from_quat(sim.robot.base.quaternion)
        plant_kwargs = (
            {"friction_mu": friction_mu}
            if friction_mu is not None and plant == "articulated"
            else {}
        )
        sim2 = (
            artlib.step if plant == "articulated" else simlib.step
        )(model, sim, tau, CONTROL_DT, support=fsm.support, **plant_kwargs)

        # --- synthesize IMU over the interval, run the EKF ----------------
        a_w = (sim2.robot.base.linear_velocity - v1) / CONTROL_DT
        accel = (
            rot1.T @ (a_w - g_vec)
            + sensors.accel_bias
            + sensors.accel_noise * jax.random.normal(k4, (3,), dtype)
        )
        q_meas2 = sim2.robot.q + sensors.encoder_noise * jax.random.normal(
            k5, (4, 3), dtype
        )
        contact2 = simlib.contact_sensor(sim2)
        est2 = se.step(
            model, est_params, est, gyro, accel, q_meas2, contact2,
            CONTROL_DT,
        )

        out = (
            diag.distribution.qp_solution.kkt_error,
            fsm.leg_state,
        )
        return (sim2, fsm_state2, est2, gyro, key), out

    (sim_f, fsm_f, est_f, gyro_f, key), (kkts, leg_states) = jax.lax.scan(
        ctrl, (ls.sim, ls.fsm, els.est, els.gyro, key), None,
        length=CONTROL_SUBSTEPS,
    )
    els2 = EstimatedLoopState(
        loop=LocomotionState(sim=sim_f, gait=gait2, fsm=fsm_f),
        est=est_f,
        gyro=gyro_f,
        key=key,
    )
    return els2, (jnp.max(kkts), leg_states[-1])


def rollout_estimated(
    model: RobotModel,
    params: ControllerParams,
    gait_params: GaitParams,
    est_params: se.EstimatorParams,
    sensors: SensorParams,
    els0: EstimatedLoopState,
    command: Command,
    planner_steps: int,
    qp_iters: int = 15,
    plant: str = "articulated",
    friction_mu: float | None = None,
):
    """Estimated closed-loop rollout. Telemetry includes truth-vs-estimate
    errors so tests can bound estimator quality while the trot runs."""

    def tick(els, _):
        els2, (kkt, leg_state) = planner_tick_estimated(
            model, params, gait_params, est_params, sensors, els, command,
            qp_iters=qp_iters, plant=plant, friction_mu=friction_mu,
        )
        truth = els2.loop.sim.robot.base
        telemetry = {
            "base_position": truth.position,
            "base_quaternion": truth.quaternion,
            "est_position": els2.est.position,
            "est_velocity": els2.est.velocity,
            "true_velocity": truth.linear_velocity,
            "pos_err": jnp.linalg.norm(els2.est.position - truth.position),
            "vel_err": jnp.linalg.norm(
                els2.est.velocity - truth.linear_velocity
            ),
            "feet_world": els2.loop.sim.feet_world,
            "leg_state": leg_state,
            "qp_kkt": kkt,
        }
        return els2, telemetry

    return jax.lax.scan(tick, els0, None, length=planner_steps)
