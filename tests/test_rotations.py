import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_locomotion_tpu.utils import rotations as rot


def random_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    return jnp.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True))


def test_quat_mul_identity():
    q = random_quats(8)
    qi = jnp.tile(rot.quat_identity(), (8, 1))
    np.testing.assert_allclose(rot.quat_mul(q, qi), q, atol=1e-6)
    np.testing.assert_allclose(rot.quat_mul(qi, q), q, atol=1e-6)


def test_rotate_matches_matrix():
    q = random_quats(16, seed=1)
    v = jnp.asarray(np.random.default_rng(2).normal(size=(16, 3)), jnp.float32)
    m = rot.matrix_from_quat(q)
    np.testing.assert_allclose(
        rot.quat_rotate(q, v), jnp.einsum("nij,nj->ni", m, v), atol=1e-5
    )


def test_rotate_inverse_roundtrip():
    q = random_quats(16, seed=3)
    v = jnp.asarray(np.random.default_rng(4).normal(size=(16, 3)), jnp.float32)
    np.testing.assert_allclose(
        rot.quat_inv_rotate(q, rot.quat_rotate(q, v)), v, atol=1e-5
    )


def test_matrix_quat_roundtrip():
    q = random_quats(32, seed=5)
    q2 = rot.quat_from_matrix(rot.matrix_from_quat(q))
    # q and -q are the same rotation
    sign = jnp.sign(jnp.sum(q * q2, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q, atol=1e-5)


def test_rpy_roundtrip():
    rng = np.random.default_rng(6)
    roll = jnp.asarray(rng.uniform(-1.5, 1.5, 16), jnp.float32)
    pitch = jnp.asarray(rng.uniform(-1.4, 1.4, 16), jnp.float32)
    yaw = jnp.asarray(rng.uniform(-3.0, 3.0, 16), jnp.float32)
    q = rot.quat_from_rpy(roll, pitch, yaw)
    r2, p2, y2 = rot.rpy_from_quat(q)
    np.testing.assert_allclose(r2, roll, atol=1e-5)
    np.testing.assert_allclose(p2, pitch, atol=1e-5)
    np.testing.assert_allclose(y2, yaw, atol=1e-5)


def test_log_exp_roundtrip():
    rng = np.random.default_rng(7)
    phi = jnp.asarray(rng.normal(size=(16, 3)) * 0.8, jnp.float32)
    np.testing.assert_allclose(rot.quat_log(rot.quat_exp(phi)), phi, atol=1e-5)


def test_log_small_angle():
    phi = jnp.array([[1e-8, 0.0, 0.0], [0.0, 0.0, 0.0]], jnp.float32)
    out = rot.quat_log(rot.quat_exp(phi))
    assert not jnp.any(jnp.isnan(out))
    np.testing.assert_allclose(out, phi, atol=1e-7)


def test_boxminus_small_error():
    # boxminus(q_target, q_actual) ≈ rotation vector from actual to target
    q = random_quats(8, seed=8)
    delta = jnp.asarray(
        np.random.default_rng(9).normal(size=(8, 3)) * 0.01, jnp.float32
    )
    q2 = rot.quat_mul(rot.quat_exp(delta), q)
    np.testing.assert_allclose(rot.quat_boxminus(q2, q), delta, atol=1e-5)


def test_skew():
    v = jnp.array([1.0, 2.0, 3.0])
    u = jnp.array([-0.5, 0.7, 0.1])
    np.testing.assert_allclose(rot.skew(v) @ u, jnp.cross(v, u), atol=1e-6)


def test_wrap_angle():
    a = jnp.array([0.0, 3.5, -3.5, jnp.pi, -jnp.pi, 7.0])
    w = rot.wrap_angle(a)
    assert jnp.all(w <= jnp.pi + 1e-6) and jnp.all(w > -jnp.pi - 1e-6)
    np.testing.assert_allclose(jnp.cos(w), jnp.cos(a), atol=1e-6)
    np.testing.assert_allclose(jnp.sin(w), jnp.sin(a), atol=1e-6)
