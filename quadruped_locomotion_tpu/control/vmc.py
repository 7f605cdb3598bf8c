"""Virtual-model balance controller (pure function).

TPU-native re-design of ``balance_controller/src/motion_control/
VirtualModelController.cpp`` — the desired base wrench from pose/twist
errors plus gravity compensation:

* errors (:104-160): position/velocity errors in world frame, orientation
  error via kindr boxMinus, angular-velocity error in base frame;
* gravity compensation (:162-188): torso + per-leg point masses;
* virtual force (:191-239): Kp/Kd/Kff products of the errors rotated to
  base frame, plus the extra world-z feedback terms;
* virtual torque (:242-268).

All quantities are base-frame wrenches handed to the contact-force
distribution, exactly like the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..types import GRAVITY, BaseTarget, RobotModel, RobotState, VmcGains
from ..utils.rotations import quat_conj, quat_inv_rotate, quat_log, quat_mul


def compute_virtual_wrench(
    model: RobotModel,
    gains: VmcGains,
    state: RobotState,
    target: BaseTarget,
):
    """Returns (virtual_force, virtual_torque) in the base frame."""
    q_act = state.base.quaternion
    dtype = q_act.dtype

    # --- errors (VirtualModelController::computeError) ---------------------
    pos_err_world = target.position - state.base.position
    # orientationError_ = -q_target⁻¹.boxMinus(q_actual⁻¹) = -log(q_t⁻¹ ⊗ q_a):
    # ≈ (target - actual) as a base-frame rotation vector.
    ori_err = -quat_log(quat_mul(quat_conj(target.quaternion), q_act))
    vel_err_world = target.linear_velocity - state.base.linear_velocity
    # state.base.angular_velocity is BODY-frame (the integrator convention
    # quat' = quat ⊗ exp(dt·ω)); the target twist is world-frame. Express
    # the error in the base frame directly — rotating a body-frame vector
    # by R⁻¹ again would mis-rotate the damping torque by the yaw angle.
    angvel_err_base = (
        quat_inv_rotate(q_act, target.angular_velocity)
        - state.base.angular_velocity
    )

    # --- gravity compensation (computeGravityCompensation) -----------------
    g_world = jnp.array([0.0, 0.0, -GRAVITY], dtype)
    g_base = quat_inv_rotate(q_act, g_world)
    k = gains.gravity_percentage
    f_torso = -k * model.base_mass * g_base
    grav_force = f_torso
    grav_torque = jnp.cross(model.com_in_base, f_torso)
    f_legs = -k * model.leg_mass[:, None] * g_base[None, :]  # (4,3)
    grav_force = grav_force + jnp.sum(f_legs, axis=0)
    grav_torque = grav_torque + jnp.sum(
        jnp.cross(model.hip_offset - model.com_in_base, f_legs), axis=0
    )

    # --- virtual force (computeVirtualForce) --------------------------------
    ff_lin = target.linear_velocity * jnp.array([1.0, 1.0, 0.0], dtype)
    # Extra world-z-only feedback terms (:208-217).
    zmask = jnp.array([0.0, 0.0, 1.0], dtype)
    f_zfb_world = gains.kp_lin * (zmask * pos_err_world)
    f_zdb_world = gains.kd_lin * (zmask * vel_err_world)

    virtual_force = (
        gains.kp_lin * quat_inv_rotate(q_act, pos_err_world)
        + gains.kd_lin * quat_inv_rotate(q_act, vel_err_world)
        + gains.kff_lin * quat_inv_rotate(q_act, ff_lin)
        + grav_force
        + quat_inv_rotate(q_act, f_zfb_world)
        + quat_inv_rotate(q_act, f_zdb_world)
    )

    # --- virtual torque (computeVirtualTorque) ------------------------------
    ff_ang = target.angular_velocity * zmask
    virtual_torque = (
        gains.kp_ang * ori_err
        + gains.kd_ang * angvel_err_base
        + quat_inv_rotate(q_act, gains.kff_ang * ff_ang)
        + grav_torque
    )
    return virtual_force, virtual_torque
