"""Base-pose optimization cascade: Geometric → QP → Checker → SQP.

TPU-native re-design of the reference's pose-optimization stack
(``free_gait_core/src/pose_optimization/`` + the Gauss-Newton SQP loop
in ``qp_solver/src/sequencequadraticproblemsolver.cpp:18-100``), used by
BaseAuto to place the torso over a new stance
(``BaseAuto.cpp:394-400``: Geometric → QP → ConstraintsChecker → SQP).

All stages are fixed-shape, mask-driven pure functions of

* ``feet_world``   (4,3) foothold positions,
* ``support``      (4,)  stance mask,
* ``nominal_stance`` (4,3) nominal foot positions in the base frame
  (defaults to feet-below-hips at the nominal height),

and vmap over scenario batches.

Stages:

* :func:`geometric_pose` — closed-form initialization ≙
  ``PoseOptimizationGeometric.cpp``: support centroid + average height,
  orientation from the Davenport q-method (Bloesch 2016 §4.2.2 — the
  4×4 eigenproblem the reference builds), split into heading from the
  fore/hind foot midpoints and 0.7-scaled roll/pitch.
* :func:`pose_qp` — 3-var position QP ≙ ``PoseOptimizationQP.cpp:42-140``:
  min Σ‖p + R·b_i − f_i‖² s.t. the support polygon contains the CoM
  projection.
* :func:`check_pose` — ≙ ``PoseConstraintsChecker.cpp`` with the 0.02 m
  tolerances from ``BaseAuto.cpp:156``.
* :func:`pose_sqp` — full SE(3) Gauss-Newton SQP ≙
  ``PoseOptimizationSQP.cpp:58-113`` + ``PoseParameterization`` box-plus:
  nominal-stance deviation + CoM-centroid cost, support-polygon and
  limb-length constraints, fixed ``max_iterations`` with a converged
  freeze (‖δ‖ < tol keeps the iterate bit-stable).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import qp as qplib
from ..terrain.support_polygon import MAX_EDGES, support_halfspaces
from ..types import RobotModel
from ..utils.rotations import (
    quat_exp,
    quat_from_rpy,
    quat_mul,
    quat_normalize,
    quat_rotate,
    rpy_from_quat,
    skew,
)

COM_WEIGHT = 10.0  # PoseOptimizationObjectiveFunction comWeight_
SQP_MAX_ITERATIONS = 30  # sequencequadraticproblemsolver.cpp:6-9
SQP_TOLERANCE = 0.05
CHECK_TOLERANCE = 0.02  # BaseAuto.cpp:156
ROLL_PITCH_FACTOR = 0.7  # PoseOptimizationGeometric.cpp "adaptation factor"


class Pose(NamedTuple):
    position: jax.Array  # (3,)
    quaternion: jax.Array  # (4,) wxyz


def limb_length_limits(model: RobotModel):
    """(min, max) hip-to-foot distance limits from the leg geometry
    (≙ PoseOptimizationFunctionConstraints limb lengths; the reference
    hard-codes values for its robot — we derive them so the max stays
    clear of the straight-knee singularity)."""
    reach = jnp.sqrt(model.d**2 + (model.l1 + model.l2) ** 2)
    return 0.25 * reach, 0.95 * reach


def default_nominal_stance(model: RobotModel, height: float = 0.4):
    """Feet below the kinematic hips at the nominal height (base frame)."""
    h = jnp.asarray(height, model.hip_pos.dtype)
    return model.hip_pos - jnp.array([0.0, 0.0, 1.0], model.hip_pos.dtype) * h


def _masked_mean(x, mask):
    m = mask.astype(x.dtype)[:, None]
    n = jnp.maximum(jnp.sum(m), 1.0)
    return jnp.sum(x * m, axis=0) / n


def geometric_pose(
    feet_world: jax.Array,
    support: jax.Array,
    nominal_stance: jax.Array,
) -> Pose:
    """Closed-form initial pose (≙ PoseOptimizationGeometric::optimize)."""
    dtype = feet_world.dtype
    mask = support.astype(dtype)

    center = _masked_mean(feet_world, support)
    z = _masked_mean(feet_world - nominal_stance, support)[2]
    position = jnp.stack([center[0], center[1], z])

    # Davenport q-method on centered correspondences R·b̄_i ≈ ā_i.
    a = (feet_world - _masked_mean(feet_world, support)) * mask[:, None]
    b = (nominal_stance - _masked_mean(nominal_stance, support)) * mask[:, None]
    B = a.T @ b  # (3,3) attitude profile
    sigma = jnp.trace(B)
    S = B + B.T
    zvec = jnp.stack(
        [B[1, 2] - B[2, 1], B[2, 0] - B[0, 2], B[0, 1] - B[1, 0]]
    )
    K = jnp.zeros((4, 4), dtype)
    K = K.at[0, 0].set(sigma)
    K = K.at[0, 1:].set(zvec)
    K = K.at[1:, 0].set(zvec)
    K = K.at[1:, 1:].set(S - sigma * jnp.eye(3, dtype=dtype))
    _, vecs = jnp.linalg.eigh(K)  # ascending; take the max eigenvector
    q_opt = quat_normalize(vecs[:, -1])
    q_opt = q_opt * jnp.sign(q_opt[0] + 1e-30)

    # Heading from fore/hind midpoints (z flattened), roll/pitch from the
    # Davenport solution scaled by 0.7 (the reference's adaptation factor).
    fore = 0.5 * (feet_world[0] + feet_world[1])
    hind = 0.5 * (feet_world[2] + feet_world[3])
    head = fore - hind
    yaw = jnp.arctan2(head[1], head[0])
    roll, pitch, _ = rpy_from_quat(q_opt)
    quaternion = quat_from_rpy(
        ROLL_PITCH_FACTOR * roll, ROLL_PITCH_FACTOR * pitch, yaw
    )
    return Pose(position=position, quaternion=quaternion)


def pose_qp(
    model: RobotModel,
    pose: Pose,
    feet_world: jax.Array,
    support: jax.Array,
    nominal_stance: jax.Array,
    com_in_base: jax.Array | None = None,
    margin: float = 0.0,
    iters: int = 25,
    polygon_feet: jax.Array | None = None,
    polygon_support: jax.Array | None = None,
) -> Pose:
    """Position-only QP refinement (orientation held fixed).

    min_p Σ_i ‖p + R·b_i − f_i‖²  s.t. (p + R·com)_xy inside the support
    polygon — ≙ PoseOptimizationQP.cpp:42-140 (3 states, polygon rows).
    """
    dtype = feet_world.dtype
    if com_in_base is None:
        com_in_base = model.com_in_base.astype(dtype)
    mask = support.astype(dtype)
    n_sup = jnp.maximum(jnp.sum(mask), 1.0)

    rb = quat_rotate(pose.quaternion[None], nominal_stance)
    target = _masked_mean(feet_world - rb, support)  # unconstrained optimum

    # QP in x = p: G = 2 n I, g = −2 Σ (f_i − R b_i).
    G = 2.0 * n_sup * jnp.eye(3, dtype=dtype)
    g = -2.0 * n_sup * target

    if polygon_feet is None:
        polygon_feet = feet_world
    if polygon_support is None:
        polygon_support = support
    normals, offsets = support_halfspaces(
        polygon_feet[:, :2], polygon_support, margin=margin
    )
    r_com = quat_rotate(pose.quaternion, com_in_base)
    # normals·(p_xy + Rcom_xy) ≥ offsets → D p ≥ d
    D = jnp.concatenate(
        [normals, jnp.zeros((MAX_EDGES, 1), dtype)], axis=1
    )
    d = offsets - normals @ r_com[:2]
    sol = qplib.solve_qp(G, g, D, d, iters=iters)
    return Pose(position=sol.x, quaternion=pose.quaternion)


def check_pose(
    model: RobotModel,
    pose: Pose,
    feet_world: jax.Array,
    support: jax.Array,
    min_limb_length: float | None = None,
    max_limb_length: float | None = None,
    tolerance: float = CHECK_TOLERANCE,
    com_in_base: jax.Array | None = None,
    polygon_feet: jax.Array | None = None,
    polygon_support: jax.Array | None = None,
    limb_feet: jax.Array | None = None,
    limb_support: jax.Array | None = None,
):
    """True if the pose keeps the CoM inside the support region and every
    stance limb within its length limits (≙ PoseConstraintsChecker).

    Like the optimization stages, the polygon may be checked against a
    DIFFERENT stance than the limb lengths (the reference checker gets
    ``setStance`` for limbs and ``setSupportStance`` for the region,
    ``BaseAuto.cpp:150-156``). Defaults: ``feet_world``/``support`` for
    both."""
    dtype = feet_world.dtype
    if min_limb_length is None or max_limb_length is None:
        lo, hi = limb_length_limits(model)
        min_limb_length = lo if min_limb_length is None else min_limb_length
        max_limb_length = hi if max_limb_length is None else max_limb_length
    if com_in_base is None:
        com_in_base = model.com_in_base.astype(dtype)
    if polygon_feet is None:
        polygon_feet = feet_world
    if polygon_support is None:
        polygon_support = support
    if limb_feet is None:
        limb_feet = feet_world
    if limb_support is None:
        limb_support = support
    normals, offsets = support_halfspaces(
        polygon_feet[:, :2], polygon_support, margin=0.0
    )
    com_w = pose.position + quat_rotate(pose.quaternion, com_in_base)
    inside = jnp.all(normals @ com_w[:2] >= offsets - tolerance)

    # Limb lengths from each foot's OWN hip: limb_feet stacks (k·4, 3)
    # foothold sets (k repetitions of the 4-leg layout).
    n_hips = limb_feet.shape[0] // 4
    hips = jnp.tile(model.hip_pos.astype(dtype), (n_hips, 1))
    hips_w = pose.position + quat_rotate(pose.quaternion[None], hips)
    lengths = jnp.linalg.norm(limb_feet - hips_w, axis=-1)
    ok_len = (lengths >= min_limb_length - tolerance) & (
        lengths <= max_limb_length + tolerance
    )
    ok_len = jnp.all(ok_len | ~limb_support)
    return inside & ok_len


def pose_sqp(
    model: RobotModel,
    pose0: Pose,
    feet_world: jax.Array,
    support: jax.Array,
    nominal_stance: jax.Array,
    com_in_base: jax.Array | None = None,
    com_weight: float = COM_WEIGHT,
    min_limb_length: float | None = None,
    max_limb_length: float | None = None,
    iterations: int = SQP_MAX_ITERATIONS,
    tolerance: float = SQP_TOLERANCE,
    qp_iters: int = 25,
    margin: float = 0.0,
    polygon_feet: jax.Array | None = None,
    polygon_support: jax.Array | None = None,
    limb_feet: jax.Array | None = None,
    limb_support: jax.Array | None = None,
) -> Pose:
    """Full SE(3) Gauss-Newton SQP (≙ PoseOptimizationSQP + the
    SequenceQuadraticProblemSolver loop). Fixed iteration count with a
    converged freeze; retraction is position-plus / body-frame quaternion
    box-plus (≙ PoseParameterization::plus).

    ``limb_feet``/``limb_support`` (4k,3)/(4k,) — foothold sets (stacked
    groups of 4, leg order) whose hip-to-foot distances must respect the
    limb-length limits at the optimized pose; defaults to the cost stance
    plus the polygon legs."""
    dtype = feet_world.dtype
    if min_limb_length is None or max_limb_length is None:
        lo, hi = limb_length_limits(model)
        min_limb_length = lo if min_limb_length is None else min_limb_length
        max_limb_length = hi if max_limb_length is None else max_limb_length
    if com_in_base is None:
        com_in_base = model.com_in_base.astype(dtype)
    mask = support.astype(dtype)

    if polygon_feet is None:
        polygon_feet = feet_world
    if polygon_support is None:
        polygon_support = support
    # Limb-length constraints must hold for every leg that is in support
    # at ANY time during the base motion: the final-stance legs at their
    # target footholds AND the during-motion support legs at their CURRENT
    # footholds (the reference's footholdsToReach + footholdsInSupport
    # lists, BaseAuto.cpp:327-392) — otherwise a pose fitted to 3 target
    # feet can over-extend the still-pinned 4th leg into the straight-knee
    # singularity while the torso shifts.
    if limb_feet is None:
        limb_feet = jnp.concatenate([feet_world, polygon_feet], axis=0)
        limb_support = jnp.concatenate([support, polygon_support], axis=0)
    limb_mask = limb_support.astype(dtype)
    normals, offsets = support_halfspaces(
        polygon_feet[:, :2], polygon_support, margin=margin
    )
    centroid = _masked_mean(polygon_feet, polygon_support)[:2]
    sqrt_w = jnp.sqrt(jnp.asarray(com_weight, dtype))
    hips_b = model.hip_pos.astype(dtype)

    def gn_step(pose):
        p, q = pose.position, pose.quaternion
        R_b = quat_rotate(q[None], nominal_stance)  # R b_i
        # Stance residuals r_i = p + R b_i − f_i, Jacobian [I, −R[b_i]×].
        r = (p[None] + R_b - feet_world) * mask[:, None]

        def leg_jac(rb):
            return jnp.concatenate(
                [jnp.eye(3, dtype=dtype), -skew(rb)], axis=1
            )

        J = jax.vmap(leg_jac)(R_b) * mask[:, None, None]  # (4,3,6)

        # CoM-centroid residual (xy), weight w.
        r_com3 = quat_rotate(q, com_in_base)
        com_w = p + r_com3
        rc = sqrt_w * (com_w[:2] - centroid)
        Jc = sqrt_w * jnp.concatenate(
            [jnp.eye(3, dtype=dtype), -skew(r_com3)], axis=1
        )[:2]

        H = (
            jnp.einsum("lij,lik->jk", J, J)
            + Jc.T @ Jc
            + 1e-6 * jnp.eye(6, dtype=dtype)
        )
        g = jnp.einsum("lij,li->j", J, r) + Jc.T @ rc

        # Constraints on δ: polygon rows + limb-length boxes.
        Jcom_xy = jnp.concatenate(
            [jnp.eye(3, dtype=dtype), -skew(r_com3)], axis=1
        )[:2]
        D_poly = normals @ Jcom_xy  # (MAX_EDGES, 6)
        d_poly = offsets - normals @ com_w[:2]

        hips_b2 = jnp.concatenate(
            [hips_b] * (limb_feet.shape[0] // 4), axis=0
        )  # (4k,3)
        hips_w = p[None] + quat_rotate(q[None], hips_b2)
        v = hips_w - limb_feet  # hip-to-foot
        vlen = jnp.maximum(jnp.linalg.norm(v, axis=-1), 1e-6)
        vhat = v / vlen[:, None]
        J_hip = jax.vmap(
            lambda hb: jnp.concatenate(
                [jnp.eye(3, dtype=dtype), -skew(quat_rotate(q, hb))], axis=1
            )
        )(hips_b2)
        row = jnp.einsum("li,lij->lj", vhat, J_hip)  # d‖v‖/dδ
        # min ≤ ‖v‖ + row·δ ≤ max  (only for legs in either support set)
        D_min = row * limb_mask[:, None]
        d_min = (min_limb_length - vlen) * limb_mask
        D_max = -row * limb_mask[:, None]
        d_max = (vlen - max_limb_length) * limb_mask

        D = jnp.concatenate([D_poly, D_min, D_max], axis=0)
        d = jnp.concatenate([d_poly, d_min, d_max])

        sol = qplib.solve_qp(2.0 * H, 2.0 * g, D, d, iters=qp_iters)
        return sol.x

    def body(carry, _):
        pose, done = carry
        delta = gn_step(pose)
        step_norm = jnp.linalg.norm(delta)
        new_done = done | (step_norm < tolerance)
        take = jnp.where(done, 0.0, 1.0)
        p2 = pose.position + take * delta[:3]
        dq = quat_exp(take * delta[3:])
        q2 = quat_normalize(quat_mul(pose.quaternion, dq))
        return (Pose(position=p2, quaternion=q2), new_done), step_norm

    (pose, _), _ = jax.lax.scan(
        body, (pose0, jnp.asarray(False)), None, length=iterations
    )
    return pose


def optimize_pose(
    model: RobotModel,
    feet_world: jax.Array,
    support: jax.Array,
    nominal_stance: jax.Array | None = None,
    height: float = 0.4,
    margin: float = 0.0,
    polygon_feet: jax.Array | None = None,
    polygon_support: jax.Array | None = None,
    limb_feet: jax.Array | None = None,
    limb_support: jax.Array | None = None,
    return_status: bool = False,
    **sqp_kwargs,
) -> Pose:
    """The BaseAuto cascade (``BaseAuto.cpp:394-400``):
    Geometric init → position QP → **ConstraintsChecker** → SE(3) SQP.

    Exactly like ``BaseAuto::optimizePose``, the expensive SQP stage runs
    ONLY when the QP pose fails the constraints check (CoM in polygon +
    limb lengths, 0.02 m tolerance) — under plain jit ``lax.cond`` skips
    it entirely on the common path; under vmap both branches execute and
    the check selects per instance.

    ``polygon_feet``/``polygon_support`` let the caller constrain the CoM
    to a DIFFERENT region than the cost stance — BaseAuto optimizes the
    nominal-stance cost over the footholds to reach while constraining to
    the legs that stay in support during the motion (:327-392).

    With ``return_status=True`` also returns the final checker verdict —
    the reference's ``optimizePose`` success flag that
    ``tolerateFailingOptimization_`` gates on (``BaseAuto.cpp:166-178``):
    callers that don't tolerate failure must discard the pose when it is
    False; the executor (``planning/steps.py``) tolerates and proceeds,
    matching the brain node's configuration.
    """
    if nominal_stance is None:
        nominal_stance = default_nominal_stance(model, height)
    pose = geometric_pose(feet_world, support, nominal_stance)
    pose_q = pose_qp(
        model, pose, feet_world, support, nominal_stance, margin=margin,
        polygon_feet=polygon_feet, polygon_support=polygon_support,
    )
    qp_ok = check_pose(
        model, pose_q, feet_world, support,
        polygon_feet=polygon_feet, polygon_support=polygon_support,
        limb_feet=limb_feet, limb_support=limb_support,
    )

    def run_sqp(p0):
        return pose_sqp(
            model, p0, feet_world, support, nominal_stance, margin=margin,
            polygon_feet=polygon_feet, polygon_support=polygon_support,
            limb_feet=limb_feet, limb_support=limb_support,
            **sqp_kwargs,
        )

    pose = jax.lax.cond(qp_ok, lambda p: p, run_sqp, pose_q)
    if not return_status:
        return pose
    ok = qp_ok | check_pose(
        model, pose, feet_world, support,
        polygon_feet=polygon_feet, polygon_support=polygon_support,
        limb_feet=limb_feet, limb_support=limb_support,
    )
    return pose, ok
