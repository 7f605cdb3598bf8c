"""Swing-leg computed-torque control (task-space PD + inverse dynamics).

≙ ``MyRobotSolver::update`` (``single_leg_test/lib/model_test_header.cpp:
412-501``): τ = Jᵀ(Kp·e_pos + Kd·e_vel) + InverseDynamics(q, q̇, ½·q̈),
with task-space gains kp=1000, kd=200 per axis
(``balance_controller/config/controller_gains_gazebo.yaml``).

Deviation (documented): the reference estimates q̈ by finite-differencing
a queue of *measured* joint velocities (with moving-average smoothing in
real-time mode, :430-470); we feed the *planned* acceleration from the
swing spline through differential kinematics — the cleaner signal the
finite-difference is approximating.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..model.dynamics import leg_inverse_dynamics
from ..model.kinematics import (
    forward_kinematics,
    jacobians,
    leg_forward_kinematics,
    leg_jacobian,
)
from ..types import GRAVITY, RobotModel, RobotState, SwingGains
from ..utils.rotations import quat_inv_rotate
from ..ops import linalg3


def swing_torques(
    model: RobotModel,
    gains: SwingGains,
    state: RobotState,
    p_des_base: jax.Array,  # (4,3) desired foot positions, base frame
    v_des_base: jax.Array,  # (4,3)
    a_des_base: jax.Array,  # (4,3)
) -> jax.Array:
    """Computed-torque swing control for all legs: (4,3) torques.

    Callers mask by the support state (stance legs use the QP torques).
    """
    dtype = p_des_base.dtype
    g_base = quat_inv_rotate(
        state.base.quaternion, jnp.array([0.0, 0.0, -GRAVITY], dtype)
    )

    def per_leg(q, qd, p_des, v_des, a_des, leg):
        p = leg_forward_kinematics(model, q, leg)
        j = leg_jacobian(model, q, leg)
        v = j @ qd
        force = gains.kp * (p_des - p) + gains.kd * (v_des - v)

        # q̈_des = J⁺ (a_des − J̇ q̇) — damped least-squares so a leg driven
        # near the straight-knee singularity (det J → 0) degrades to zero
        # feedforward instead of emitting NaN torques.
        _, jdot_qd = jax.jvp(
            lambda qq: leg_jacobian(model, qq, leg) @ qd, (q,), (qd,)
        )
        lam = jnp.asarray(1e-4, dtype)
        jjt = j @ j.T + lam * jnp.eye(3, dtype=dtype)
        qdd_des = j.T @ linalg3.solve3(jjt, a_des - jdot_qd)
        tau_id = leg_inverse_dynamics(model, q, qd, 0.5 * qdd_des, g_base, leg)
        return j.T @ force + tau_id

    return jax.vmap(per_leg)(
        state.q, state.qd, p_des_base, v_des_base, a_des_base, jnp.arange(4)
    )


def joint_pd_gravity_torques(
    model: RobotModel,
    state: RobotState,
    q_des: jax.Array,  # (4,3)
    qd_des: jax.Array,  # (4,3)
    kp: float = 300.0,
    kd: float = 3.0,
) -> jax.Array:
    """Joint-space PD + gravity compensation — the reference's fallback
    swing mode for per-joint targets (``ros_balance_controller.cpp:560-603``,
    PID gains 300/0.01/3 from ``balance_controller/config/control.yaml``)."""
    from ..model.dynamics import gravity_torques

    dtype = q_des.dtype
    g_base = quat_inv_rotate(
        state.base.quaternion, jnp.array([0.0, 0.0, -GRAVITY], dtype)
    )
    tau_g = gravity_torques(model, state.q, g_base)
    return kp * (q_des - state.q) + kd * (qd_des - state.qd) + tau_g


def joint_pid_gravity_torques(
    model: RobotModel,
    state: RobotState,
    q_des: jax.Array,  # (4,3)
    qd_des: jax.Array,  # (4,3)
    integral: jax.Array,  # (4,3) accumulated ∫e dt, carried by the caller
    dt: float,
    kp: float = 300.0,
    ki: float = 0.01,
    kd: float = 3.0,
    i_max: float = 10.0,
) -> tuple[jax.Array, jax.Array]:
    """Full joint-space PID + gravity compensation for joint-mode legs —
    the reference's per-joint ``control_toolbox::Pid`` with gains
    p=300, i=0.01, d=3 (``balance_controller/config/control.yaml:17-29``).

    Returns (torques (4,3), new integral (4,3)). The integral is clamped
    to ±``i_max``/ki windup (the reference's ``i_clamp``; its config
    leaves the ros_control default, making the i-term inert — we keep a
    small active bound so the term behaves as the gains intend).
    """
    from ..model.dynamics import gravity_torques

    dtype = q_des.dtype
    e = q_des - state.q
    integral2 = jnp.clip(
        integral + e * dt, -i_max / max(ki, 1e-12), i_max / max(ki, 1e-12)
    )
    g_base = quat_inv_rotate(
        state.base.quaternion, jnp.array([0.0, 0.0, -GRAVITY], dtype)
    )
    tau_g = gravity_torques(model, state.q, g_base)
    tau = kp * e + ki * integral2 + kd * (qd_des - state.qd) + tau_g
    return tau, integral2
