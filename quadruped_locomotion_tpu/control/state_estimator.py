"""Legged-robot base state estimation: IMU + leg-odometry error-state EKF.

≙ (and substantially beyond) the reference's ``StateEstimateController``
(``balance_controller/src/ros_controller/state_estimate_controller.cpp:62-83``),
which reads joints/IMU/foot contacts but leaves the actual estimation a
TODO and writes a stub base position into the shared
``RobotStateHandle``. This module implements the real observer that slot
was reserved for — the standard quadruped error-state Kalman filter
(strapdown IMU prediction + stance-foot kinematic updates), designed
TPU-first:

* **fixed shapes** — the filter state stacks base position/velocity/
  orientation error and all four foot positions (21-dim error state);
  swing legs are handled by noise inflation, not by resizing the
  measurement (no data-dependent shapes under ``jit``);
* **fixed iteration count** — one predict + one joint 12-dim update per
  control tick; the 21×21 covariance algebra is small dense matmuls that
  XLA fuses, and the whole filter ``vmap``s over scenario batches;
* the orientation is maintained as a unit quaternion with the error
  state in the tangent space (boxplus retraction), matching the pose
  algebra used across the framework (``utils/rotations.py``).

Measurement model: for each stance leg, forward kinematics of the
measured joint angles gives the foot position in the base frame,
``s_i = Rᵀ (pf_i − p)``; stance feet are assumed stationary in the
world. Swing feet get huge measurement/process noise so their estimate
simply re-converges at the next touchdown.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..model.kinematics import forward_kinematics
from ..types import GRAVITY, RobotModel
from ..utils.rotations import (
    matrix_from_quat,
    quat_boxplus,
    quat_mul,
    quat_normalize,
    skew,
)

# error-state layout: [δp(0:3), δv(3:6), δθ(6:9), δpf(9:21)]
NX = 21
NZ = 12  # stacked foot-in-base measurements


@struct.dataclass
class EstimatorParams:
    """Noise densities (continuous-time, SI units)."""

    sigma_accel: jax.Array  # m/s² /√Hz — accelerometer white noise
    sigma_gyro: jax.Array  # rad/s /√Hz — gyro white noise
    sigma_foot_stance: jax.Array  # m/√s — stance-foot slip random walk
    sigma_foot_swing: jax.Array  # m/√s — swing feet: effectively free
    sigma_joint: jax.Array  # m — FK measurement noise (encoder + model)
    sigma_swing_meas: jax.Array  # m — inflated noise for swing legs

    @classmethod
    def defaults(cls, dtype=jnp.float32) -> "EstimatorParams":
        return cls(
            sigma_accel=jnp.asarray(0.05, dtype),
            sigma_gyro=jnp.asarray(0.005, dtype),
            sigma_foot_stance=jnp.asarray(0.001, dtype),
            sigma_foot_swing=jnp.asarray(10.0, dtype),
            sigma_joint=jnp.asarray(0.002, dtype),
            sigma_swing_meas=jnp.asarray(1e3, dtype),
        )


@struct.dataclass
class EstimatorState:
    position: jax.Array  # (3,) world
    velocity: jax.Array  # (3,) world
    quaternion: jax.Array  # (4,) wxyz base→world
    foot_positions: jax.Array  # (4,3) world
    covariance: jax.Array  # (21,21)


def init_state(
    position,
    quaternion,
    foot_positions,
    pos_std=0.01,
    foot_std=None,
    dtype=None,
) -> EstimatorState:
    """``foot_std`` defaults to ``pos_std``; pass a small value when the
    touchdown points are known (e.g. calibrated start pose) so base
    corrections are attributed to the base, not the feet — the global
    translation of (base + feet) is unobservable by design."""
    dtype = dtype or jnp.asarray(position).dtype
    foot_std = pos_std if foot_std is None else foot_std
    p0 = jnp.diag(
        jnp.concatenate(
            [
                jnp.full((3,), pos_std**2, dtype),
                jnp.full((3,), 0.01**2, dtype),
                jnp.full((3,), 0.01**2, dtype),
                jnp.full((12,), foot_std**2, dtype),
            ]
        )
    )
    return EstimatorState(
        position=jnp.asarray(position, dtype),
        velocity=jnp.zeros(3, dtype),
        quaternion=jnp.asarray(quaternion, dtype),
        foot_positions=jnp.asarray(foot_positions, dtype),
        covariance=p0,
    )


def predict(
    params: EstimatorParams,
    est: EstimatorState,
    gyro: jax.Array,  # (3,) body-frame angular rate
    accel: jax.Array,  # (3,) body-frame specific force
    contact: jax.Array,  # (4,) bool — stance flags (gates foot process noise)
    dt,
) -> EstimatorState:
    """Strapdown IMU mechanization + covariance propagation.

    The covariance algebra runs under ``default_matmul_precision
    ("float32")``: TPU matmuls default to bf16 multiplicands, whose
    ~3-decimal-digit mantissa destroys the PSD structure of P within a
    few hundred ticks (NaN via the downstream Cholesky). The 21×21
    matmuls are trivially small, so full precision costs nothing.
    """
    with jax.default_matmul_precision("float32"):
        return _predict(params, est, gyro, accel, contact, dt)


def _predict(params, est, gyro, accel, contact, dt):
    dtype = est.position.dtype
    dt = jnp.asarray(dt, dtype)
    g = jnp.array([0.0, 0.0, -GRAVITY], dtype)

    R = matrix_from_quat(est.quaternion)
    a_w = R @ accel + g
    p2 = est.position + est.velocity * dt + 0.5 * a_w * dt * dt
    v2 = est.velocity + a_w * dt
    q2 = quat_normalize(quat_boxplus(est.quaternion, gyro * dt))

    # error-state transition (first order)
    F = jnp.eye(NX, dtype=dtype)
    F = F.at[0:3, 3:6].set(jnp.eye(3, dtype=dtype) * dt)
    F = F.at[3:6, 6:9].set(-skew(R @ accel) * dt)
    F = F.at[6:9, 6:9].set(jnp.eye(3, dtype=dtype) - skew(gyro) * dt)

    sigma_foot = jnp.where(
        contact, params.sigma_foot_stance, params.sigma_foot_swing
    )
    q_diag = jnp.concatenate(
        [
            jnp.full((3,), (0.5 * params.sigma_accel * dt * dt) ** 2),
            jnp.full((3,), (params.sigma_accel * dt) ** 2),
            jnp.full((3,), (params.sigma_gyro * dt) ** 2),
            jnp.repeat(sigma_foot**2 * dt, 3),
        ]
    ).astype(dtype)
    P2 = F @ est.covariance @ F.T + jnp.diag(q_diag)
    P2 = 0.5 * (P2 + P2.T)
    return EstimatorState(
        position=p2,
        velocity=v2,
        quaternion=q2,
        foot_positions=est.foot_positions,
        covariance=P2,
    )


def update(
    model: RobotModel,
    params: EstimatorParams,
    est: EstimatorState,
    q_joints: jax.Array,  # (4,3) measured joint positions
    contact: jax.Array,  # (4,) bool
) -> EstimatorState:
    """Joint kinematic update: fuse FK foot positions of stance legs.

    Full f32 matmul precision for the same PSD reason as :func:`predict`.
    """
    with jax.default_matmul_precision("float32"):
        return _update(model, params, est, q_joints, contact)


def _update(model, params, est, q_joints, contact):
    dtype = est.position.dtype
    R = matrix_from_quat(est.quaternion)
    Rt = R.T

    s_meas = forward_kinematics(model, q_joints)  # (4,3) foot in base
    s_pred = (est.foot_positions - est.position) @ R  # = Rᵀ(pf−p) rows
    y = (s_meas - s_pred).reshape(NZ)

    # measurement Jacobian, rows stacked per leg
    H = jnp.zeros((NZ, NX), dtype)
    for i in range(4):
        r = slice(3 * i, 3 * i + 3)
        d = est.foot_positions[i] - est.position
        H = H.at[r, 0:3].set(-Rt)
        H = H.at[r, 6:9].set(skew(Rt @ d))
        H = H.at[r, 9 + 3 * i : 12 + 3 * i].set(Rt)

    meas_sigma = jnp.where(
        contact, params.sigma_joint, params.sigma_swing_meas
    )
    Rm = jnp.diag(jnp.repeat(meas_sigma**2, 3).astype(dtype))

    P = est.covariance
    S = H @ P @ H.T + Rm
    # K = P Hᵀ S⁻¹ via Cholesky (S is SPD by construction)
    L = jax.scipy.linalg.cho_factor(S, lower=True)
    K = jax.scipy.linalg.cho_solve(L, H @ P).T  # (NX,NZ)
    dx = K @ y

    IKH = jnp.eye(NX, dtype=dtype) - K @ H
    P2 = IKH @ P @ IKH.T + K @ Rm @ K.T  # Joseph form, stays SPD
    P2 = 0.5 * (P2 + P2.T)

    return EstimatorState(
        position=est.position + dx[0:3],
        velocity=est.velocity + dx[3:6],
        quaternion=quat_normalize(quat_boxplus(est.quaternion, dx[6:9])),
        foot_positions=est.foot_positions + dx[9:21].reshape(4, 3),
        covariance=P2,
    )


def step(
    model: RobotModel,
    params: EstimatorParams,
    est: EstimatorState,
    gyro: jax.Array,
    accel: jax.Array,
    q_joints: jax.Array,
    contact: jax.Array,
    dt,
) -> EstimatorState:
    """One full filter tick (predict + update); vmap over batches."""
    est = predict(params, est, gyro, accel, contact, dt)
    return update(model, params, est, q_joints, contact)


def synthesize_imu(
    base_quat: jax.Array,  # (T,4)
    base_pos: jax.Array,  # (T,3)
    dt,
):
    """Derive ideal body-frame IMU signals from a recorded base
    trajectory (for tests/golden traces; a real robot supplies these).

    Returns (gyro (T-1,3), accel (T-1,3)) valid for steps 1..T-1.
    """
    dtype = base_pos.dtype
    dt = jnp.asarray(dt, dtype)
    g = jnp.array([0.0, 0.0, -GRAVITY], dtype)

    v = jnp.diff(base_pos, axis=0) / dt  # (T-1,3) world, avg over interval
    a_w = jnp.diff(
        jnp.concatenate([v[:1], v], axis=0), axis=0
    ) / dt  # (T-1,3)

    from ..utils.rotations import quat_conj

    q0 = base_quat[:-1]
    q1 = base_quat[1:]
    dq = jax.vmap(quat_mul)(jax.vmap(quat_conj)(q0), q1)
    sign = jnp.where(dq[:, :1] < 0, -1.0, 1.0)
    dq = dq * sign
    angle = 2.0 * jnp.arctan2(
        jnp.linalg.norm(dq[:, 1:], axis=1), dq[:, 0]
    )
    axis = dq[:, 1:] / jnp.maximum(
        jnp.linalg.norm(dq[:, 1:], axis=1, keepdims=True), 1e-9
    )
    gyro = axis * (angle / dt)[:, None]

    R0 = jax.vmap(matrix_from_quat)(q0)
    accel = jnp.einsum("tij,tj->ti", jnp.swapaxes(R0, 1, 2), a_w - g)
    return gyro, accel
