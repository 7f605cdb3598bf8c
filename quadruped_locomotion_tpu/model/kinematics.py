"""Batched analytic kinematics for the 3-DoF simpledog leg.

TPU-native replacement for the reference's KDL-based solvers
(``quadruped_model/src/quadrupedkinematics.cpp``):

* FK: closed-form serial chain (≙ ``FowardKinematicsSolve``, :143-199),
* translational Jacobian: closed form (≙ ``AnalysticJacobian``, :214-277),
* IK: 4-branch analytic solution with per-leg branch selection
  (≙ ``InverseKinematicsSolve``, :377-484).

The chain (idealized from simpledog.urdf exactly as the reference IK does,
d=0.1, l1=l2=0.25):

    p_hip(q) = Rz(q1) · Rx(-π/2) · Rz(q2) · ([l1,0,d] + Rz(q3)·[l2,0,0])
    p_base   = hip_pos + R_hip · p_hip

where R_hip is the per-leg hip-frame orientation from the URDF *_1 joint
rpy values. FK and IK are exact inverses of each other (unlike the
reference, whose KDL FK uses raw CAD origins while its IK idealizes).

Everything is a pure function of (model, q) with leading batch axes
handled by ``jax.vmap``; no data-dependent control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..types import RobotModel
from ..utils.rotations import rotz, wrap_angle
from ..ops import linalg3

# Rx(-π/2): (x, y, z) -> (x, z, -y)
_RX_NEG90 = jnp.array([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0], [0.0, -1.0, 0.0]])


def _leg_fk_hip(model: RobotModel, q_leg: jax.Array) -> jax.Array:
    """Foot position in the hip frame for one leg. q_leg: (3,)."""
    q1, q2, q3 = q_leg[0], q_leg[1], q_leg[2]
    rx = _RX_NEG90.astype(q_leg.dtype)
    knee = jnp.stack([model.l1 + model.l2 * jnp.cos(q3),
                      model.l2 * jnp.sin(q3),
                      model.d * jnp.ones_like(q3)])
    return rotz(q1) @ (rx @ (rotz(q2) @ knee))


def leg_forward_kinematics(
    model: RobotModel, q_leg: jax.Array, leg: jax.Array | int
) -> jax.Array:
    """Foot position in the base frame for one leg (3,)."""
    hip_rot = model.hip_rot[leg]
    hip_pos = model.hip_pos[leg]
    return hip_pos + hip_rot @ _leg_fk_hip(model, q_leg)


def forward_kinematics(model: RobotModel, q: jax.Array) -> jax.Array:
    """All-feet FK: q (4,3) -> foot positions in base frame (4,3)."""
    legs = jnp.arange(4)
    return jax.vmap(lambda ql, i: leg_forward_kinematics(model, ql, i))(q, legs)


def leg_jacobian(
    model: RobotModel, q_leg: jax.Array, leg: jax.Array | int
) -> jax.Array:
    """Closed-form 3×3 translational Jacobian d(p_base)/d(q_leg).

    ≙ ``QuadrupedKinematics::AnalysticJacobian`` (KDL ChainJntToJacSolver).
    """
    q1, q2 = q_leg[0], q_leg[1]
    rx = _RX_NEG90.astype(q_leg.dtype)
    r1 = rotz(q1) @ rx              # hip→frame-after-joint-1&bend
    r2 = r1 @ rotz(q2)              # hip→frame-after-joint-2
    z = jnp.array([0.0, 0.0, 1.0], dtype=q_leg.dtype)

    p = _leg_fk_hip(model, q_leg)
    axis1 = z
    axis2 = r1 @ z
    axis3 = r2 @ z
    o3 = r2 @ jnp.stack([model.l1, jnp.zeros_like(model.l1), model.d])

    j1 = jnp.cross(axis1, p)
    j2 = jnp.cross(axis2, p)
    j3 = jnp.cross(axis3, p - o3)
    j_hip = jnp.stack([j1, j2, j3], axis=-1)
    return model.hip_rot[leg] @ j_hip


def jacobians(model: RobotModel, q: jax.Array) -> jax.Array:
    """All-legs Jacobians: (4,3,3)."""
    legs = jnp.arange(4)
    return jax.vmap(lambda ql, i: leg_jacobian(model, ql, i))(q, legs)


def leg_inverse_kinematics(
    model: RobotModel,
    foot_in_base: jax.Array,
    leg: jax.Array | int,
    branch: jax.Array | None = None,
) -> jax.Array:
    """Analytic IK for one leg: foot position in base frame → (q1,q2,q3).

    Computes all four solution branches and selects per the leg's limb
    configuration, mirroring ``InverseKinematicsSolve``
    (quadrupedkinematics.cpp:377-484). Branch indices:
    0=OUT_LEFT, 1=IN_RIGHT, 2=IN_LEFT, 3=OUT_RIGHT.
    Out-of-reach targets are clamped to the workspace boundary (the
    reference clips cosθ3 the same way, :397-400).
    """
    dtype = foot_in_base.dtype
    d = model.d.astype(dtype)
    l1 = model.l1.astype(dtype)
    l2 = model.l2.astype(dtype)
    hip_rot = model.hip_rot[leg].astype(dtype)
    p_hip = hip_rot.T @ (foot_in_base - model.hip_pos[leg].astype(dtype))
    px, py, pz = p_hip[0], p_hip[1], p_hip[2]

    cos_t3 = (l2 * l2 + l1 * l1 - (px * px + py * py + pz * pz - d * d)) / (
        2.0 * l1 * l2
    )
    cos_t3 = jnp.clip(cos_t3, -1.0, 1.0)
    t3 = jnp.arccos(cos_t3)
    q3_a = jnp.pi - t3   # branches 0, 1
    q3_b = -jnp.pi + t3  # branches 2, 3

    rho_sq = px * px + py * py
    r = jnp.sqrt(jnp.maximum(rho_sq - d * d, 1e-12))
    alpha = jnp.arctan2(py, px)
    beta1 = jnp.arctan2(d, r)
    beta2 = jnp.arctan2(-d, -r)

    def branch_pair(q3):
        b = jnp.arctan2(l2 * jnp.sin(q3), l1 + l2 * jnp.cos(q3))
        # "left arm" configuration
        q1_l = wrap_angle(alpha - beta1)
        a_l = jnp.arctan2(pz, -r)
        q2_l = wrap_angle(jnp.where(a_l > 0, a_l - b - jnp.pi, a_l - b + jnp.pi))
        # "right arm" configuration
        q1_r = wrap_angle(alpha + beta2)
        a_r = jnp.arctan2(pz, r)
        q2_r = wrap_angle(a_r - b + jnp.pi)
        return (
            jnp.stack([q1_l, q2_l, q3]),
            jnp.stack([q1_r, q2_r, q3]),
        )

    sol0, sol1 = branch_pair(q3_a)
    sol2, sol3 = branch_pair(q3_b)
    solutions = jnp.stack([sol0, sol1, sol2, sol3])  # (4,3)

    if branch is None:
        branch = model.ik_branch[leg]
    return solutions[branch]


def inverse_kinematics(model: RobotModel, feet_in_base: jax.Array) -> jax.Array:
    """All-legs IK: (4,3) foot positions in base → (4,3) joint positions."""
    legs = jnp.arange(4)
    return jax.vmap(lambda p, i: leg_inverse_kinematics(model, p, i))(
        feet_in_base, legs
    )


def foot_velocities(model: RobotModel, q: jax.Array, qd: jax.Array) -> jax.Array:
    """Foot velocities in base frame from joint velocities: (4,3)."""
    j = jacobians(model, q)
    return jnp.einsum("lij,lj->li", j, qd)


def joint_velocities_from_foot_velocities(
    model: RobotModel, q: jax.Array, v_feet: jax.Array
) -> jax.Array:
    """Differential IK: solve J qd = v per leg. v_feet (4,3) → qd (4,3).

    ≙ AdapterBase::getJointVelocitiesFromEndEffectorLinearVelocityInBaseFrame.
    """
    j = jacobians(model, q)
    return linalg3.solve3(j, v_feet)


def leg_com_positions_hip(model: RobotModel, q_leg: jax.Array) -> jax.Array:
    """Per-link CoM positions of one leg in its hip frame: (3 links, 3).

    Used for gravity compensation (≙ KDL ChainDynParam::JntToGravity,
    quadrupedkinematics.cpp:486-555) and the leg mass matrix.
    """
    q1, q2, q3 = q_leg[0], q_leg[1], q_leg[2]
    dtype = q_leg.dtype
    rx = _RX_NEG90.astype(dtype)
    com = model.link_com.astype(dtype)
    r1j = rotz(q1)          # link-1 frame
    r1 = r1j @ rx           # hip→(pre-joint-2) frame
    r2 = r1 @ rotz(q2)      # link-2 frame
    r3 = r2 @ rotz(q3)      # link-3 frame (rotation only; translation below)
    o3 = r2 @ jnp.stack([model.l1, jnp.zeros_like(model.l1), model.d]).astype(dtype)
    c1 = r1j @ com[0]
    c2 = r2 @ com[1]
    c3 = o3 + r3 @ com[2]
    return jnp.stack([c1, c2, c3])


def link_rotations_hip(model: RobotModel, q_leg: jax.Array):
    """Per-link orientations in the hip frame: (3,3,3)."""
    q1, q2, q3 = q_leg[0], q_leg[1], q_leg[2]
    rx = _RX_NEG90.astype(q_leg.dtype)
    r1j = rotz(q1)
    r2 = r1j @ rx @ rotz(q2)
    r3 = r2 @ rotz(q3)
    return jnp.stack([r1j, r2, r3])
