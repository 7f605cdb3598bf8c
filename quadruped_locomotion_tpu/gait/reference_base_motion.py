"""Faithful transcription of the reference's updateBaseMotion law.

≙ ``free_gait_ros/test/gait_generate_client.cpp:398-539`` verbatim — NO
shipped-pipeline modifications (no capture-free anchor feet, no
t_stance·v lead term, no Hermite velocity blending). This module exists
to MEASURE how far the shipped law (:mod:`.gait_generator`, whose
tuning deviations are documented in its docstrings) drifts from the
reference on identical inputs; ``tests/test_base_motion_parity.py``
replays a recorded reference-timing trot cycle through both and the
deltas are recorded in PARITY.md.

The transcription:

1. per-leg total phase → erf weights k_st/k_sw (σ_st 0.8, σ_sw 1.0)
   (:412-427) — exactly :func:`..gait.phase.com_weights`;
2. virtual points with CW/CCW neighbor blending over the MEASURED world
   foot positions (:428-455), P_CoM = 0.25·Σ vp (:483);
3. z = height + z_opt − 0.02 (:483) where z_opt comes from the
   client's LOCAL ``optimizePose`` (:541-605, not free_gait's
   PoseOptimizationGeometric): position = the support-feet centroid
   ``footprint_center_in_world`` (:229, :549-550);
4. orientation (:492-499): yaw = current base yaw; pitch = the pitch
   of ``setFromVectors(e_x, fore_mid − hind_mid)`` — the heading
   vector keeps its z component (:581 commented out), so terrain
   slope enters as pitch; roll = 0;
5. a BaseTarget at average linear velocity ‖v_des‖ (:487) — the
   executor's Hermite fit then tracks it, which
   :func:`..gait.gait_generator._hermite_refit_step` reproduces.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..types import BaseTarget, RobotState
from ..utils.rotations import quat_from_rpy, rpy_from_quat
from . import phase as phase_mod
from .phase import GaitParams, PhaseState


def reference_com_point(
    phase: PhaseState, params: GaitParams, feet_world: jnp.ndarray
) -> jnp.ndarray:
    """Steps 1–2: the xy virtual-CoM point over measured feet (z is the
    raw 0.25·Σ vp z, overwritten by step 3 in the full law)."""
    w = phase_mod.com_weights(phase, params)
    f = feet_world
    vp_sum = jnp.zeros(3, f.dtype)
    for j in range(4):
        cw = (j + 1) % 4
        ccw = (j - 1) % 4
        vp_cw = f[j] * w[j] + f[cw] * (1 - w[j])
        vp_ccw = f[j] * w[j] + f[ccw] * (1 - w[j])
        vp = (
            w[j] * f[j] + w[cw] * vp_cw + w[ccw] * vp_ccw
        ) / (w[j] + w[cw] + w[ccw])
        vp_sum = vp_sum + vp
    return 0.25 * vp_sum


def reference_update_base_motion(
    state: RobotState,
    phase: PhaseState,
    params: GaitParams,
    feet_world: jnp.ndarray,
    v_desired_world: jnp.ndarray,
    yaw_rate_desired=0.0,
    height: float | None = None,
    feet_support: jnp.ndarray | None = None,
) -> tuple[BaseTarget, jnp.ndarray]:
    """The full faithful law → (BaseTarget, commanded speed) (steps 1–5).

    ``feet_world`` are the LIVE foot positions (the erf virtual points
    use ``getPositionWorldToFootInWorldFrame``, :441-443);
    ``feet_support`` are each leg's latest in-support positions
    (``foothold_in_support_``, used for the centroid z and heading,
    :543-550, :578-580) — defaults to ``feet_world``.
    """
    dtype = feet_world.dtype
    h = params.height if height is None else jnp.asarray(height, dtype)
    if feet_support is None:
        feet_support = feet_world

    com = reference_com_point(phase, params, feet_world)

    # optimizePose position: support-feet centroid (:549-550)
    sup = phase.support.astype(dtype)
    n_sup = jnp.maximum(jnp.sum(sup), 1.0)
    centroid_z = jnp.sum(feet_support[:, 2] * sup) / n_sup
    com = com.at[2].set(h + centroid_z - 0.02)

    # optimizePose rotation: minimal rotation e_x → (fore_mid − hind_mid)
    # over the latest-known footholds (stanceForOrientation_ =
    # foothold_in_support_; swing legs contribute their touch point).
    fore = 0.5 * (feet_support[0] + feet_support[1])
    hind = 0.5 * (feet_support[2] + feet_support[3])
    head = fore - hind
    head = head / jnp.maximum(jnp.linalg.norm(head), 1e-9)
    # ZYX pitch of setFromVectors(e_x, head): the heading's elevation
    pitch_opt = -jnp.arcsin(jnp.clip(head[2], -1.0, 1.0))

    _, _, yaw = rpy_from_quat(state.base.quaternion)
    zero = jnp.zeros_like(yaw)
    q_target = quat_from_rpy(zero, pitch_opt, yaw)

    wz = jnp.asarray(yaw_rate_desired, dtype)
    # the msg carries scalar AVERAGE velocities (:487-488), not an
    # instantaneous twist — the executor's Hermite fit supplies the
    # profile — so the BaseTarget holds zero instantaneous linear
    # velocity and the scalar average is returned alongside.
    speed = jnp.linalg.norm(v_desired_world)
    return BaseTarget(
        position=com,
        quaternion=q_target,
        linear_velocity=jnp.zeros(3, dtype),
        angular_velocity=jnp.stack([zero, zero, wz]),
    ), speed
