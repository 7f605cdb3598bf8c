"""Batched leg dynamics (gravity vector, mass matrix, inverse dynamics).

TPU-native replacement for the reference's per-leg RBDL models
(``single_leg_test/lib/model_test_header.cpp:224-501``) and KDL gravity
compensation (``quadruped_model/src/quadrupedkinematics.cpp:486-555``).

The legs are modeled fixed-base in the hip frame (exactly like the
reference, which loads per-leg URDFs into RBDL with a fixed base). The
3-DoF chain is small, so we derive everything from the CoM kinematics with
autodiff — XLA fuses the whole thing into a handful of VPU ops; there is
no benefit in hand-unrolled RNEA at this size.

Conventions: gravity vectors are *accelerations* (e.g. (0,0,-9.8) rotated
into the base frame), matching the reference call sites
(``ContactForceDistribution.cpp:518-556``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..types import RobotModel
from .kinematics import leg_com_positions_hip, link_rotations_hip
from ..ops import linalg3

_AXIS_MASK = jnp.array(
    [[1.0, 0.0, 0.0], [1.0, 1.0, 0.0], [1.0, 1.0, 1.0]]
)  # Jw structure: link k sees joints j<=k


def leg_gravity_torques(
    model: RobotModel, q_leg: jax.Array, gravity_in_base: jax.Array,
    leg: jax.Array | int,
) -> jax.Array:
    """Joint torques holding one leg against gravity: G(q).

    τ = G(q) satisfies M q̈ + C q̇ + G = τ at rest; equivalently
    G = -Σ_links m_i · J_com_iᵀ · g. Computed as ∇_q U with
    U(q) = -Σ m_i gᵀ c_i(q).

    ≙ ``QuadrupedKinematics::getGravityCompensationForLimb``.
    """
    g_hip = model.hip_rot[leg].T.astype(q_leg.dtype) @ gravity_in_base

    def potential(q):
        coms = leg_com_positions_hip(model, q)  # (3,3)
        return -jnp.sum(model.link_mass.astype(q.dtype) @ (coms @ g_hip))

    return jax.grad(potential)(q_leg)


def gravity_torques(
    model: RobotModel, q: jax.Array, gravity_in_base: jax.Array
) -> jax.Array:
    """All legs: (4,3) joint gravity-compensation torques."""
    legs = jnp.arange(4)
    return jax.vmap(
        lambda ql, i: leg_gravity_torques(model, ql, gravity_in_base, i)
    )(q, legs)


def leg_mass_matrix(model: RobotModel, q_leg: jax.Array) -> jax.Array:
    """3×3 joint-space mass matrix of one leg (hip frame, fixed base).

    M(q) = Σ_k m_k Jv_kᵀ Jv_k + Jw_kᵀ (R_k I_k R_kᵀ) Jw_k
    """
    dtype = q_leg.dtype
    jv = jax.jacfwd(lambda q: leg_com_positions_hip(model, q))(q_leg)  # (3,3,3)
    rots = link_rotations_hip(model, q_leg)  # (3,3,3)

    # Angular Jacobian columns are the joint axes in the hip frame:
    # axis1 = ẑ, axis2 = R1·ẑ, axis3 = R2·ẑ — and R2, R3 share ẑ with the
    # *previous* link rotation (joint k rotates about link (k-1) frame's z,
    # equal to link k frame's z since Rz preserves ẑ).
    z = jnp.array([0.0, 0.0, 1.0], dtype=dtype)
    axes = jnp.stack([z, rots[1] @ z, rots[2] @ z], axis=-1)  # (3, 3 joints)
    mask = _AXIS_MASK.astype(dtype)

    m = jnp.zeros((3, 3), dtype=dtype)
    for k in range(3):
        jw_k = axes * mask[k]  # zero out columns of joints beyond link k
        inertia_world = rots[k] @ model.link_inertia[k].astype(dtype) @ rots[k].T
        m = m + model.link_mass[k] * (jv[k].T @ jv[k]) + jw_k.T @ inertia_world @ jw_k
    return m


def leg_inverse_dynamics(
    model: RobotModel,
    q_leg: jax.Array,
    qd_leg: jax.Array,
    qdd_leg: jax.Array,
    gravity_in_base: jax.Array,
    leg: jax.Array | int,
) -> jax.Array:
    """τ = M(q)·q̈ + C(q,q̇)·q̇ + G(q) for one 3-DoF leg.

    ≙ RBDL ``InverseDynamics`` as used by the swing-leg computed-torque
    controller (``model_test_header.cpp:412-501``).

    Coriolis term via Christoffel symbols from ∂M/∂q (exact, autodiff).
    """
    dm = jax.jacfwd(lambda q: leg_mass_matrix(model, q))(q_leg)  # (3,3,3): dM/dq_k
    m = leg_mass_matrix(model, q_leg)
    # c_i = Σ_{j,k} (dM_ij/dq_k - 0.5 dM_jk/dq_i) qd_j qd_k
    coriolis = jnp.einsum("ijk,j,k->i", dm, qd_leg, qd_leg) - 0.5 * jnp.einsum(
        "jki,j,k->i", dm, qd_leg, qd_leg
    )
    g = leg_gravity_torques(model, q_leg, gravity_in_base, leg)
    return m @ qdd_leg + coriolis + g


def inverse_dynamics(
    model: RobotModel,
    q: jax.Array,
    qd: jax.Array,
    qdd: jax.Array,
    gravity_in_base: jax.Array,
) -> jax.Array:
    """All legs inverse dynamics: (4,3) torques."""
    legs = jnp.arange(4)
    return jax.vmap(
        lambda a, b, c, i: leg_inverse_dynamics(model, a, b, c, gravity_in_base, i)
    )(q, qd, qdd, legs)


def leg_forward_dynamics(
    model: RobotModel,
    q_leg: jax.Array,
    qd_leg: jax.Array,
    tau_leg: jax.Array,
    gravity_in_base: jax.Array,
    leg: jax.Array | int,
) -> jax.Array:
    """q̈ = M⁻¹(τ - C q̇ - G) — used by the swing-leg plant in the rollout
    simulator (≙ RBDL ``ForwardDynamics``, model_test_header.cpp:287)."""
    bias = leg_inverse_dynamics(
        model, q_leg, qd_leg, jnp.zeros_like(qd_leg), gravity_in_base, leg
    )
    m = leg_mass_matrix(model, q_leg)
    return linalg3.solve3(m, tau_leg - bias)
