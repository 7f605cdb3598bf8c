"""Quaternion / rotation algebra for the TPU-native quadruped stack.

Replaces the reference's kindr rotation types (see
``/root/reference/free_gait_core/include/free_gait_core/TypeDefs.hpp:42-76``)
with pure-functional JAX primitives that are `vmap`/`jit`-friendly.

Conventions
-----------
* Quaternions are ``(w, x, y, z)`` arrays (Hamilton convention, unit norm).
* ``quat`` always denotes the *base-to-world* orientation ``R_WB`` unless a
  function says otherwise: ``rotate(q, v_base) -> v_world``.
* Euler angles are intrinsic Z-Y-X (yaw, pitch, roll), matching kindr's
  ``EulerAnglesZyx`` used throughout the reference controller.
* All functions operate on the trailing axes and broadcast/vmap cleanly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_identity(dtype=jnp.float32) -> jax.Array:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a ⊗ b (compose rotations: first b, then a)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector v by quaternion q (base→world if q = R_WB)."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_inv_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate v by the inverse of q (world→base if q = R_WB)."""
    return quat_rotate(quat_conj(q), v)


def matrix_from_quat(q: jax.Array) -> jax.Array:
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def quat_from_matrix(m: jax.Array) -> jax.Array:
    """Shepperd's method, branch-free via jnp.where (vmap-safe)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def mk(w, x, y, z):
        return jnp.stack([w, x, y, z], axis=-1)

    # Four candidate computations; pick the numerically best one.
    s0 = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) * 2.0
    q0 = mk(0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0)
    s1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2.0
    q1 = mk((m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1)
    s2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) * 2.0
    q2 = mk((m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2)
    s3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) * 2.0
    q3 = mk((m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3)

    cond0 = tr > 0.0
    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    q = jnp.where(
        cond0[..., None],
        q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    return quat_normalize(q)


def quat_from_axis_angle(axis: jax.Array, angle: jax.Array) -> jax.Array:
    half = 0.5 * angle
    return jnp.concatenate(
        [jnp.cos(half)[..., None], jnp.sin(half)[..., None] * axis], axis=-1
    )


def quat_from_rpy(roll, pitch, yaw) -> jax.Array:
    """Intrinsic ZYX (yaw·pitch·roll), kindr EulerAnglesZyx convention."""
    cr, sr = jnp.cos(0.5 * roll), jnp.sin(0.5 * roll)
    cp, sp = jnp.cos(0.5 * pitch), jnp.sin(0.5 * pitch)
    cy, sy = jnp.cos(0.5 * yaw), jnp.sin(0.5 * yaw)
    return jnp.stack(
        [
            cy * cp * cr + sy * sp * sr,
            cy * cp * sr - sy * sp * cr,
            cy * sp * cr + sy * cp * sr,
            sy * cp * cr - cy * sp * sr,
        ],
        axis=-1,
    )


def rpy_from_quat(q: jax.Array):
    """Returns (roll, pitch, yaw) of the intrinsic-ZYX decomposition."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    roll = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    pitch = jnp.arcsin(jnp.clip(2 * (w * y - z * x), -1.0, 1.0))
    yaw = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return roll, pitch, yaw


def quat_log(q: jax.Array) -> jax.Array:
    """Rotation-vector logarithm: log: SU(2) → R³ (angle·axis).

    Small-angle safe. Sign canonicalized so |angle| ≤ π.
    """
    q = jnp.where(q[..., :1] < 0, -q, q)  # shortest representation
    w = q[..., 0]
    v = q[..., 1:]
    n = jnp.linalg.norm(v, axis=-1)
    angle = 2.0 * jnp.arctan2(n, w)
    # scale = angle / n, with Taylor fallback 2/w·(1 - n²/(3w²)) as n→0
    small = n < 1e-6
    safe_n = jnp.where(small, 1.0, n)
    scale = jnp.where(small, 2.0 / jnp.maximum(w, 1e-12), angle / safe_n)
    return scale[..., None] * v


def quat_exp(phi: jax.Array) -> jax.Array:
    """Rotation-vector exponential: R³ → SU(2)."""
    angle = jnp.linalg.norm(phi, axis=-1)
    small = angle < 1e-8
    safe = jnp.where(small, 1.0, angle)
    k = jnp.where(small, 0.5 - angle * angle / 48.0, jnp.sin(0.5 * safe) / safe)
    return jnp.concatenate(
        [jnp.cos(0.5 * angle)[..., None], k[..., None] * phi], axis=-1
    )


def quat_boxminus(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """kindr-style boxMinus: log(q1 ⊗ q2⁻¹).

    Matches the usage in the reference VMC
    (``balance_controller/src/motion_control/VirtualModelController.cpp:124``).
    """
    return quat_log(quat_mul(q1, quat_conj(q2)))


def quat_boxplus(q: jax.Array, phi: jax.Array) -> jax.Array:
    """kindr-style boxPlus: exp(phi) ⊗ q (global perturbation)."""
    return quat_mul(quat_exp(phi), q)


def skew(v: jax.Array) -> jax.Array:
    """Skew-symmetric cross-product matrix: skew(v) @ u == v × u.

    Replaces kindr::getSkewMatrixFromVector used to build the force-
    distribution torque rows (``ContactForceDistribution.cpp:197``).
    """
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


def wrap_angle(a: jax.Array) -> jax.Array:
    """Wrap to (-pi, pi]."""
    return a - 2.0 * jnp.pi * jnp.floor((a + jnp.pi) / (2.0 * jnp.pi))


def rotz(angle: jax.Array) -> jax.Array:
    c, s = jnp.cos(angle), jnp.sin(angle)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    m = jnp.stack([c, -s, zero, s, c, zero, zero, zero, one], axis=-1)
    return m.reshape(jnp.shape(angle) + (3, 3))
