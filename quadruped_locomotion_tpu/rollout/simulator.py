"""Batched rigid-body quadruped simulator (the Gazebo stand-in).

The reference closes its loop through Gazebo
(``balance_controller/src/ros_controller/gazebo_state_hardware_interface.cpp``)
— a CPU physics process. The TPU-native rollout needs an on-device plant
so that thousands of scenarios integrate inside one ``lax.scan`` without
host round-trips.

Plant model (the classic massless-leg quadruped abstraction):

* the trunk is a 6-DoF rigid body (lumped mass/inertia from the URDF);
* stance feet are pinned to the ground; stance joint torques map through
  the leg Jacobian to ground-reaction forces on the trunk
  (f = J⁻ᵀ(τ − τ_g), the exact inverse of the controller's torque map) —
  the controller is only "right" if its torques produce the right wrench
  through the same kinematics it planned with;
* swing legs integrate full 3-DoF articulated dynamics
  (M q̈ + C q̇ + G = τ) in the hip frame, decoupled from trunk motion;
* contact is UNILATERAL in position: a commanded-support leg is only
  pinned once its foot actually touches the ground (pin z clamped to the
  surface); a commanded-swing leg is never pinned. ``contact_sensor``
  exposes measured touch states to the controller's contact FSM — the
  same separation as Gazebo contact sensors feeding
  ``RosBalanceController``'s FSM via ``sim_assiants/FootContacts``.

Semi-implicit Euler at ``dt`` (default 2.5 ms = the reference's 400 Hz
real-robot loop, balance_controller_manager.cpp:47-58).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..model.dynamics import (
    gravity_torques,
    leg_forward_dynamics,
    leg_inverse_dynamics,
    leg_mass_matrix,
)
from ..model.kinematics import (
    forward_kinematics,
    inverse_kinematics,
    jacobians,
)
from ..types import GRAVITY, BaseState, RobotModel, RobotState
from ..utils.rotations import quat_exp, quat_inv_rotate, quat_mul, quat_normalize, quat_rotate
from ..ops import linalg3


@struct.dataclass
class SimState:
    robot: RobotState
    feet_world: jax.Array  # (4,3) foot positions in world frame
    time: jax.Array  # scalar


def default_stance_state(
    model: RobotModel, height: float = 0.4, dtype=jnp.float32
) -> SimState:
    """All-stance state with feet below the kinematic hips."""
    feet_base = model.hip_pos.astype(dtype) - jnp.array(
        [0.0, 0.0, height], dtype
    )
    q = inverse_kinematics(model, feet_base)
    base = BaseState.identity(dtype).replace(
        position=jnp.array([0.0, 0.0, height], dtype)
    )
    robot = RobotState.neutral(dtype).replace(base=base, q=q)
    feet_world = base.position + quat_rotate(base.quaternion[None], feet_base)
    return SimState(
        robot=robot, feet_world=feet_world, time=jnp.asarray(0.0, dtype)
    )


SWING_SUBSTEPS = 4
CONTACT_TOL = 1e-3  # foot counts as touching within 1 mm of the surface


def contact_sensor(
    sim: SimState, ground_height: jax.Array | float = 0.0
) -> jax.Array:
    """(4,) bool measured foot contact (pinned legs always report touch)."""
    gz = jnp.asarray(ground_height, sim.feet_world.dtype)
    return sim.robot.support | (sim.feet_world[:, 2] <= gz + CONTACT_TOL)


def _integrate_swing_legs(model, q, qd, tau, g_base, dt):
    """Substepped semi-implicit integration of the 3-DoF leg dynamics."""
    h = dt / SWING_SUBSTEPS
    b = model.joint_damping
    eye3 = jnp.eye(3, dtype=q.dtype)
    legs = jnp.arange(4)

    def substep(carry, _):
        q, qd = carry

        def per_leg(ql, qdl, tl, i):
            bias = leg_inverse_dynamics(
                model, ql, qdl, jnp.zeros_like(qdl), g_base, i
            )
            m = leg_mass_matrix(model, ql)
            qd2 = linalg3.solve3(
                m + h * b * eye3, m @ qdl + h * (tl - bias)
            )
            return ql + h * qd2, qd2

        q2, qd2 = jax.vmap(per_leg)(q, qd, tau, legs)
        return (q2, qd2), None

    (q2, qd2), _ = jax.lax.scan(substep, (q, qd), None, length=SWING_SUBSTEPS)
    return q2, qd2


def step(
    model: RobotModel,
    sim: SimState,
    tau: jax.Array,  # (4,3) commanded joint torques
    dt: float,
    support: jax.Array | None = None,  # (4,) bool: commanded contact state
    ground_height: jax.Array | float = 0.0,
) -> SimState:
    """One physics step. Fully traceable; vmap over a batch of SimStates."""
    robot = sim.robot
    dtype = tau.dtype
    if support is None:
        support = robot.support
    # Unilateral pinning: a commanded-support leg carries load only once
    # its foot actually touches (was pinned, or within tolerance of the
    # surface). A leg commanded into swing is released unconditionally.
    gz = jnp.asarray(ground_height, dtype)
    touching = sim.feet_world[:, 2] <= gz + CONTACT_TOL
    support = support & (robot.support | touching)
    base = robot.base
    # Unilateral REACH: a pinned contact cannot pull — once the hip has
    # moved (almost) a full leg length away from the planted foot, the
    # foot physically breaks contact (slips/releases). Without this, the
    # pinned-foot joint solve runs through the straight-knee singularity
    # and the state blows up (observed in long-stance pace gaits).
    reach = jnp.sqrt(model.d**2 + (model.l1 + model.l2) ** 2).astype(dtype)
    hips_world = base.position + quat_rotate(
        base.quaternion[None], model.hip_pos.astype(dtype)
    )
    extension = jnp.linalg.norm(sim.feet_world - hips_world, axis=-1)
    support = support & (extension < 0.995 * reach)
    g_world = jnp.array([0.0, 0.0, -GRAVITY], dtype)
    g_base = quat_inv_rotate(base.quaternion, g_world)

    feet_base = quat_inv_rotate(
        base.quaternion[None], sim.feet_world - base.position
    )
    j = jacobians(model, robot.q)
    tau_g = gravity_torques(model, robot.q, g_base)

    # --- stance path: torques → ground reaction on the trunk ---------------
    # Controller maps τ = Jᵀ f_contact + τ_g; invert per leg with damped
    # least squares — near the straight-knee singularity the exact
    # inverse is unbounded (a real leg saturates through joint friction
    # and structural compliance instead).
    dls = jnp.asarray(1e-4, dtype) * jnp.eye(3, dtype=dtype)

    def _dls_solve_t(jj, t):
        # f ≈ (J Jᵀ + λ²I)⁻¹ J t  solves Jᵀ f = t
        return linalg3.solve3(jj @ jj.T + dls, jj @ t)

    f_contact = jax.vmap(_dls_solve_t)(
        j, tau - tau_g
    )  # (4,3) force leg pushes on ground, base frame
    grf_base = -f_contact  # ground reaction on the robot
    m = support.astype(dtype)[:, None]
    total_force_world = (
        quat_rotate(base.quaternion, jnp.sum(grf_base * m, axis=0))
        + model.total_mass * g_world
    )
    total_torque_base = jnp.sum(jnp.cross(feet_base, grf_base) * m, axis=0)

    # --- trunk integration (semi-implicit Euler) ----------------------------
    inertia = model.base_inertia.astype(dtype)
    ang_mom_rate = total_torque_base - jnp.cross(
        base.angular_velocity, inertia @ base.angular_velocity
    )
    angvel_new = base.angular_velocity + dt * linalg3.solve3(
        inertia, ang_mom_rate
    )
    linvel_new = base.linear_velocity + dt * total_force_world / model.total_mass
    pos_new = base.position + dt * linvel_new
    quat_new = quat_normalize(
        quat_mul(base.quaternion, quat_exp(dt * angvel_new))
    )
    base_new = BaseState(
        position=pos_new,
        quaternion=quat_new,
        linear_velocity=linvel_new,
        angular_velocity=angvel_new,
    )

    # --- stance legs: joints follow the pinned feet -------------------------
    feet_base_new = quat_inv_rotate(
        quat_new[None], sim.feet_world - pos_new
    )
    q_stance = inverse_kinematics(model, feet_base_new)
    # foot velocity in base frame for a world-fixed foot:
    v_feet_base = -jnp.cross(
        jnp.broadcast_to(angvel_new, (4, 3)), feet_base_new
    ) - quat_inv_rotate(quat_new[None], jnp.broadcast_to(linvel_new, (4, 3)))
    j_new = jacobians(model, q_stance)
    # damped least squares again: qd ≈ (JᵀJ + λ²I)⁻¹ Jᵀ v
    qd_stance = jax.vmap(
        lambda jj, v: linalg3.solve3(jj.T @ jj + dls, jj.T @ v)
    )(j_new, v_feet_base)

    # --- swing legs: articulated 3-DoF dynamics -----------------------------
    # Substep with zero-order-hold torque and *implicit* viscous joint
    # damping: (M + h·b·I) q̇' = M q̇ + h·(τ − C q̇ − G). The implicit
    # damping term is what Gazebo's ODE solver provides; without it the
    # ideal leg rings at the control Nyquist frequency.
    q_swing, qd_swing = _integrate_swing_legs(
        model, robot.q, robot.qd, tau, g_base, dt
    )

    sup = support[:, None]
    q_new = jnp.where(sup, q_stance, q_swing)
    qd_new = jnp.where(sup, qd_stance, qd_swing)

    # swing feet move with the leg; stance feet stay pinned at the surface
    feet_base_fk = forward_kinematics(model, q_new)
    feet_pinned = sim.feet_world.at[:, 2].set(
        jnp.maximum(sim.feet_world[:, 2], gz)
    )
    feet_world_new = jnp.where(
        sup,
        feet_pinned,
        pos_new + quat_rotate(quat_new[None], feet_base_fk),
    )

    robot_new = robot.replace(
        base=base_new, q=q_new, qd=qd_new, tau=tau, support=support
    )
    return SimState(
        robot=robot_new, feet_world=feet_world_new, time=sim.time + dt
    )


def foot_heights(sim: SimState, terrain_height_fn=None) -> jax.Array:
    """Clearance of each foot above the terrain (flat ground by default)."""
    z = sim.feet_world[:, 2]
    if terrain_height_fn is None:
        return z
    return z - terrain_height_fn(sim.feet_world[:, :2])
