"""Fully-coupled 18-DoF floating-base plant (the Gazebo-parity simulator).

The reference closes its loop through Gazebo's full articulated model of
simpledog — 17 links, leg inertia acting on the trunk and vice versa
(``balance_controller/src/ros_controller/gazebo_state_hardware_interface.cpp:286-420``,
``quadruped_model/urdf/simpledog.urdf``). The massless-leg plant in
``rollout/simulator.py`` decouples swing legs from the trunk, which is why
the default trot had to be retuned away from the reference 0.45/0.45 s
timing. This module is the coupled replacement: one rigid-body system

    M(q) v̇ + h(q, v) = Sᵀ τ + J_cᵀ λ,     J_c v̇ = b_c (pinned feet)

with generalized velocity v = [v_base(world), ω_base(body), q̇(12)] ∈ R¹⁸.

TPU-native construction — no hand-derived spatial algebra:

* All 17 link CoM positions/rotations are one closed-form kinematics
  function of local coordinates ξ = (δp, φ, δq) ∈ R¹⁸, with the base
  orientation chart R = R₀·exp(φ̂) centered at the current quaternion.
  At φ = 0 this chart satisfies ξ̇ = v *and* ξ̈ = v̇ (dexp⁻¹(0) = I and
  φ̇×ω = ω×ω = 0), so plain forward-mode autodiff gives exact Jacobians
  J = ∂kin/∂ξ and exact velocity-product accelerations via nested jvp.
* M(q) = Σ_k m_k Jv_kᵀJv_k + Jω_kᵀ (R I R ᵀ) Jω_k  (17 bodies).
* h(q,v) = Σ_k Jv_kᵀ m_k (a_k⁰ − g) + Jω_kᵀ (I_w ω̇_k⁰ + ω_k×I_w ω_k)
  where (·)⁰ are the zero-acceleration (bias) link accelerations —
  d'Alembert assembly, Coriolis/centrifugal/gyroscopic terms exact.
* Stance feet are 3-way position constraints solved in one static-shape
  30×30 KKT system with per-foot masking (inactive rows become λ = 0),
  Baumgarte stabilization toward the stored anchor, and ONE unilateral
  re-solve that releases feet whose normal force comes out negative —
  the LCP-lite equivalent of ODE's contact solve inside Gazebo.

Everything is `where`-masked and static-shape: the whole plant runs
inside `lax.scan` at 400 Hz and vmaps over scenario batches.

Mass bookkeeping: the controller plans with the reference's lumped
masses (27 kg torso + 6 kg/leg = 51 kg, quadruped_state.cpp:28-36) while
the URDF's dynamic leg links total 3.913 kg/leg. To keep plant and
controller consistent we assign the difference to the trunk:
m_base = total − 4·Σ link_mass, and strip the lumped point-mass
parallel-axis terms back out of ``model.base_inertia`` (they are now
explicit bodies). Total simulated mass thus equals the controller's
51 kg exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..model.kinematics import (
    forward_kinematics,
    leg_com_positions_hip,
    link_rotations_hip,
)
from ..types import GRAVITY, BaseState, RobotModel
from ..ops import linalgn
from ..utils.rotations import (
    matrix_from_quat,
    quat_exp,
    quat_mul,
    quat_normalize,
    skew,
)
from .simulator import CONTACT_TOL, SimState

# Baumgarte constraint stabilization time constant [s]: feet converge to
# their anchors with critically-damped ë = -(2/τ)ė - (1/τ²)e dynamics.
# 5 ms ≈ two 400 Hz ticks — fast enough that touchdown velocity is
# absorbed within a swing-phase's first percent, slow enough to be
# comfortably stable under semi-implicit Euler at h = 1.25 ms.
BAUMGARTE_TAU = 0.005
# Constraint compliance ε [m/N-ish]: keeps the KKT system full-rank when
# a leg straightens through the knee singularity (J_c loses rank).
CONTACT_COMPLIANCE = 1e-6
# Contact-tension release threshold [N]: a pinned foot whose solved
# normal force is below this pulls on the ground and is released in the
# unilateral re-solve.
RELEASE_FORCE = 0.0
SUBSTEPS = 2


def _rodrigues_local(phi: jax.Array) -> jax.Array:
    """exp(φ̂) as a θ²-polynomial — exact derivatives of all orders at
    φ = 0, which is the only point we ever evaluate (the chart center)."""
    t2 = phi @ phi
    a = 1.0 - t2 / 6.0 + t2 * t2 / 120.0  # sinθ/θ
    b = 0.5 - t2 / 24.0 + t2 * t2 / 720.0  # (1−cosθ)/θ²
    k = skew(phi)
    return jnp.eye(3, dtype=phi.dtype) + a * k + b * (k @ k)


def _unskew(a: jax.Array) -> jax.Array:
    """Inverse of skew() for (…,3,3) (anti-symmetrizes first)."""
    return 0.5 * jnp.stack(
        [
            a[..., 2, 1] - a[..., 1, 2],
            a[..., 0, 2] - a[..., 2, 0],
            a[..., 1, 0] - a[..., 0, 1],
        ],
        axis=-1,
    )


def base_dynamic_params(model: RobotModel):
    """(m_base, I_base) of the *trunk body alone* for the coupled plant.

    Inverts the lumping done by ``RobotModel.simpledog`` /
    ``model/urdf.py``: leg masses become explicit link bodies, so the
    trunk keeps the remainder of the controller's total mass and loses
    the leg point-mass parallel-axis inertia terms.
    """
    m_links = 4.0 * jnp.sum(model.link_mass)
    m_base = model.total_mass - m_links
    inertia = model.base_inertia
    eye = jnp.eye(3, dtype=inertia.dtype)
    for i in range(4):
        r = model.hip_offset[i]
        inertia = inertia - model.leg_mass[i] * (
            jnp.dot(r, r) * eye - jnp.outer(r, r)
        )
    return m_base, inertia


def _link_kinematics(model: RobotModel, p0, rot0, q0, xi):
    """World pose of all 17 bodies + feet as a function of local coords.

    ξ = [δp (3), φ (3), δq (12)]; base rotation R = R₀·exp(φ̂).
    Returns dict with coms (4,3,3), rots (4,3,3,3), feet (4,3),
    base_com (3,), base_rot (3,3).
    """
    dp, phi, dq = xi[:3], xi[3:6], xi[6:].reshape(4, 3)
    rwb = rot0 @ _rodrigues_local(phi)
    p = p0 + dp
    q = q0 + dq

    def per_leg(ql, i):
        coms_h = leg_com_positions_hip(model, ql)  # (3,3) hip frame
        rots_h = link_rotations_hip(model, ql)  # (3,3,3)
        hp = model.hip_pos[i].astype(ql.dtype)
        hr = model.hip_rot[i].astype(ql.dtype)
        coms_b = hp[None, :] + coms_h @ hr.T  # (3,3) base frame
        coms_w = p[None, :] + coms_b @ rwb.T
        rots_w = jnp.einsum("ab,bc,kcd->kad", rwb, hr, rots_h)
        return coms_w, rots_w

    coms, rots = jax.vmap(per_leg)(q, jnp.arange(4))
    feet = p[None, :] + forward_kinematics(model, q) @ rwb.T
    base_com = p + rwb @ model.com_in_base.astype(p.dtype)
    return {
        "coms": coms,
        "rots": rots,
        "feet": feet,
        "base_com": base_com,
        "base_rot": rwb,
    }


def _dynamics_terms(model: RobotModel, base: BaseState, q, qd):
    """Assemble (M, h, kin, J, kin_dot) at the current state."""
    dtype = q.dtype
    rot0 = matrix_from_quat(base.quaternion)
    v = jnp.concatenate(
        [base.linear_velocity, base.angular_velocity, qd.reshape(-1)]
    )
    xi0 = jnp.zeros(18, dtype)
    kin_fn = lambda xi: _link_kinematics(model, base.position, rot0, q, xi)

    kin = kin_fn(xi0)
    jac = jax.jacfwd(kin_fn)(xi0)  # leaves have trailing (18,)
    kin_dot = jax.tree_util.tree_map(lambda j: j @ v, jac)
    # Zero-acceleration (bias) second time-derivatives: valid because the
    # exp chart at its center has ξ̇ = v and ξ̈ = v̇ exactly.
    _, kin_ddot = jax.jvp(
        lambda xi: jax.jvp(kin_fn, (xi,), (v,))[1], (xi0,), (v,)
    )

    m_base, i_base = base_dynamic_params(model)
    g_world = jnp.array([0.0, 0.0, -GRAVITY], dtype)

    # --- per-body terms -----------------------------------------------------
    def body_terms(mass, inertia_local, jv, jw_rotjac, rot, rot_dot, rot_ddot, a_bias):
        """jv: (3,18); rot jacobian (3,3,18). Returns (M_contrib, h_contrib)."""
        jw = _unskew(
            jnp.einsum("abj,cb->jac", jw_rotjac, rot)
        ).T  # (3,18): ω-jacobian columns
        i_w = rot @ inertia_local @ rot.T
        omega = _unskew(rot_dot @ rot.T)
        omega_dot = _unskew(rot_ddot @ rot.T)  # Ṙ·Ṙᵀ is symmetric → drops
        m_c = mass * jv.T @ jv + jw.T @ i_w @ jw
        force = mass * (a_bias - g_world)
        torque = i_w @ omega_dot + jnp.cross(omega, i_w @ omega)
        h_c = jv.T @ force + jw.T @ torque
        return m_c, h_c

    # trunk
    m_mat, h_vec = body_terms(
        m_base,
        i_base.astype(dtype),
        jac["base_com"],
        jac["base_rot"],
        kin["base_rot"],
        kin_dot["base_rot"],
        kin_ddot["base_rot"],
        kin_ddot["base_com"],
    )
    # 12 leg links
    link_mass = model.link_mass.astype(dtype)
    link_inertia = model.link_inertia.astype(dtype)
    for leg in range(4):
        for k in range(3):
            m_c, h_c = body_terms(
                link_mass[k],
                link_inertia[k],
                jac["coms"][leg, k],
                jac["rots"][leg, k],
                kin["rots"][leg, k],
                kin_dot["rots"][leg, k],
                kin_ddot["rots"][leg, k],
                kin_ddot["coms"][leg, k],
            )
            m_mat = m_mat + m_c
            h_vec = h_vec + h_c
    return m_mat, h_vec, kin, jac, kin_dot, kin_ddot


def _constrained_accel(m_mat, h_vec, tau_gen, j_c, b_c, mask3):
    """Masked 30×30 KKT solve: M v̇ − Aᵀλ = τ_gen − h;  A v̇ + ελ = b_c.

    Inactive constraint rows get A-row = 0 and compliance 1 → λ = 0.
    """
    dtype = m_mat.dtype
    a = jnp.where(mask3[:, None], j_c, 0.0)  # (12,18)
    comp = jnp.where(mask3, CONTACT_COMPLIANCE, 1.0)
    # NOTE on the unrolled M-Schur alternative (ops/linalgn
    # kkt_contact_solve): it replaces this pivoted 30x30 LU with pure
    # lane-parallel madds and was built to claim the ~170 ms the LU
    # costs per batched-sweep substep at 4096 — but its ~20k-op
    # unrolled graph inside the two-rate scan blows XLA compile time
    # past 20 min on BOTH CPU and TPU (vs ~5 min with the LU), so the
    # LU stays. The unrolled path remains available + equivalence-
    # tested (tests/test_linalgn.py) for standalone/persistent-cache
    # deployments where the one-time compile amortizes.
    kkt = jnp.block(
        [[m_mat, -a.T], [a, jnp.diag(comp.astype(dtype))]]
    )
    rhs = jnp.concatenate([tau_gen - h_vec, jnp.where(mask3, b_c, 0.0)])
    sol = jnp.linalg.solve(kkt, rhs)
    return sol[:18], sol[18:].reshape(4, 3)


def _substep(model: RobotModel, carry, tau, h, support_cmd, gz4, mu=None):
    """One semi-implicit Euler substep of the constrained dynamics.

    With ``mu`` (trace-static float or None), contact forces are limited
    to the Coulomb cone: pinned feet whose bilateral solution needs
    |λ_t| > μ·λ_n break tangential stick and SLIDE — a third masked KKT
    solve keeps only their normal row active and applies saturated
    kinetic friction μ·λ_n opposite the slip velocity as an external
    force. ``mu=None`` (default) is the rigid-stick model validated in
    round 2. ≙ Gazebo's ODE friction-pyramid contact (the reference's μ
    lives in ``controller_gains.yaml:37-39``).
    """
    base, q, qd, pinned, anchors = carry
    dtype = q.dtype

    m_mat, h_vec, kin, jac, kin_dot, kin_ddot = _dynamics_terms(
        model, base, q, qd
    )
    feet = kin["feet"]

    # --- contact gating (same unilateral rules as simulator.step) ----------
    touching = feet[:, 2] <= gz4 + CONTACT_TOL
    reach = jnp.sqrt(model.d**2 + (model.l1 + model.l2) ** 2).astype(dtype)
    hips_world = base.position[None, :] + model.hip_pos.astype(
        dtype
    ) @ kin["base_rot"].T
    extension = jnp.linalg.norm(feet - hips_world, axis=-1)
    mask = support_cmd & (pinned | touching) & (extension < 0.995 * reach)
    # newly-pinned feet anchor where they touched, snapped onto the surface
    new_anchor = feet.at[:, 2].set(gz4)
    anchors = jnp.where((mask & ~pinned)[:, None], new_anchor, anchors)

    # --- constraint data ----------------------------------------------------
    j_c = jac["feet"].reshape(12, 18)
    kd = 2.0 / BAUMGARTE_TAU
    kp = 1.0 / BAUMGARTE_TAU**2
    b_c = (
        -kin_ddot["feet"] - kd * kin_dot["feet"] - kp * (feet - anchors)
    ).reshape(12)

    tau_gen = jnp.concatenate(
        [
            jnp.zeros(6, dtype),
            (tau - model.joint_damping * qd).reshape(-1),
        ]
    )

    mask3 = jnp.repeat(mask, 3)
    vdot, lam = _constrained_accel(m_mat, h_vec, tau_gen, j_c, b_c, mask3)
    # unilateral: release feet that pull (negative world-z contact force)
    mask2 = mask & (lam[:, 2] >= RELEASE_FORCE)
    mask3b = jnp.repeat(mask2, 3)
    vdot, lam = _constrained_accel(m_mat, h_vec, tau_gen, j_c, b_c, mask3b)
    lam = jnp.where(mask2[:, None], lam, 0.0)

    if mu is not None:
        # Coulomb-cone check on the bilateral (stick) solution.
        lam_t = jnp.linalg.norm(lam[:, :2], axis=1)
        lam_n = jnp.maximum(lam[:, 2], 0.0)
        slipping = mask2 & (lam_t > mu * lam_n + 1e-9)
        # Kinetic friction opposes the slip velocity; at stick-break onset
        # (v_t ≈ 0) it stays saturated along the direction stick WAS
        # applying (λ̂_t), so the transition is force-continuous.
        vt = kin_dot["feet"][:, :2]
        vt_n = jnp.linalg.norm(vt, axis=1, keepdims=True)
        dir_f = jnp.where(
            vt_n > 1e-3,
            -vt / jnp.maximum(vt_n, 1e-9),
            lam[:, :2] / jnp.maximum(lam_t, 1e-9)[:, None],
        )
        f_t = mu * lam_n[:, None] * dir_f  # (4,2) world tangential force
        f_ext = jnp.concatenate(
            [f_t, jnp.zeros((4, 1), dtype)], axis=1
        ) * slipping[:, None]
        # sliding feet keep only their normal constraint row
        keep_row = ~(
            jnp.repeat(slipping, 3)
            & jnp.tile(jnp.array([True, True, False]), 4)
        )
        mask3c = mask3b & keep_row
        tau_gen_f = tau_gen + j_c.T @ f_ext.reshape(12)
        vdot, lam3 = _constrained_accel(
            m_mat, h_vec, tau_gen_f, j_c, b_c, mask3c
        )
        lam = jnp.where(
            slipping[:, None],
            jnp.concatenate([f_t, lam3[:, 2:3]], axis=1),
            lam3,
        )
        lam = jnp.where(mask2[:, None], lam, 0.0)
        # a sliding foot's anchor follows it (re-sticks wherever the slide
        # ends, once the required force falls back inside the cone)
        anchors = jnp.where(
            slipping[:, None], feet.at[:, 2].set(gz4), anchors
        )

    # --- semi-implicit Euler ------------------------------------------------
    v = jnp.concatenate(
        [base.linear_velocity, base.angular_velocity, qd.reshape(-1)]
    )
    v_new = v + h * vdot
    pos_new = base.position + h * v_new[:3]
    quat_new = quat_normalize(
        quat_mul(base.quaternion, quat_exp(h * v_new[3:6]))
    )
    q_new = q + h * v_new[6:].reshape(4, 3)
    base_new = BaseState(
        position=pos_new,
        quaternion=quat_new,
        linear_velocity=v_new[:3],
        angular_velocity=v_new[3:6],
    )
    return (base_new, q_new, v_new[6:].reshape(4, 3), mask2, anchors), lam


def step(
    model: RobotModel,
    sim: SimState,
    tau: jax.Array,  # (4,3) commanded joint torques
    dt: float,
    support: jax.Array | None = None,  # (4,) bool commanded contact state
    ground_height: jax.Array | float = 0.0,
    substeps: int = SUBSTEPS,
    friction_mu: float | None = None,
) -> SimState:
    """One coupled-physics step; drop-in for ``simulator.step``.

    ``sim.feet_world`` carries the pinned-foot anchors (swing feet are FK
    positions); ``sim.robot.support`` is the realized pin state.
    ``friction_mu`` (trace-static) bounds contact forces by the Coulomb
    cone and lets feet slide when it is exceeded; None = rigid stick.
    """
    robot = sim.robot
    dtype = tau.dtype
    if support is None:
        support = robot.support
    gz4 = jnp.broadcast_to(jnp.asarray(ground_height, dtype), (4,))
    h = dt / substeps

    carry0 = (robot.base, robot.q, robot.qd, robot.support, sim.feet_world)
    carry, lams = jax.lax.scan(
        lambda c, _: _substep(model, c, tau, h, support, gz4, mu=friction_mu),
        carry0,
        None,
        length=substeps,
    )
    base, q, qd, pinned, anchors = carry

    rot = matrix_from_quat(base.quaternion)
    feet_fk = base.position[None, :] + forward_kinematics(model, q) @ rot.T
    feet_world = jnp.where(pinned[:, None], anchors, feet_fk)

    robot_new = robot.replace(
        base=base, q=q, qd=qd, tau=tau, support=pinned
    )
    return SimState(
        robot=robot_new, feet_world=feet_world, time=sim.time + dt
    )


def mass_matrix(model: RobotModel, base: BaseState, q: jax.Array) -> jax.Array:
    """(18,18) floating-base joint-space inertia matrix (for tests)."""
    m, _, _, _, _, _ = _dynamics_terms(model, base, q, jnp.zeros_like(q))
    return m


def bias_forces(
    model: RobotModel, base: BaseState, q: jax.Array, qd: jax.Array
) -> jax.Array:
    """(18,) velocity-product + gravity generalized forces (for tests)."""
    _, h, _, _, _, _ = _dynamics_terms(model, base, q, qd)
    return h


def unconstrained_accel(
    model: RobotModel, base: BaseState, q, qd, tau
) -> jax.Array:
    """v̇ with no contacts (free flight) — used by conservation tests."""
    m_mat, h_vec, _, _, _, _ = _dynamics_terms(model, base, q, qd)
    tau_gen = jnp.concatenate(
        [jnp.zeros(6, q.dtype), (tau - model.joint_damping * qd).reshape(-1)]
    )
    return jnp.linalg.solve(m_mat, tau_gen - h_vec)
