import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_locomotion_tpu.types import RobotModel, GRAVITY
from quadruped_locomotion_tpu.model import dynamics as dyn
from quadruped_locomotion_tpu.model import kinematics as kin

G_BASE = jnp.array([0.0, 0.0, -GRAVITY])


@pytest.fixture(scope="module")
def model():
    return RobotModel.simpledog()


def test_gravity_torque_finite_diff(model):
    """G(q) must equal the gradient of potential energy -Σ m g·c(q)."""
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.uniform(-1.0, 1.0, size=3), jnp.float32)
    leg = 0
    tau = dyn.leg_gravity_torques(model, q, G_BASE, leg)
    g_hip = model.hip_rot[leg].T @ G_BASE
    eps = 1e-3
    for i in range(3):
        dq = jnp.zeros(3).at[i].set(eps)

        def pot(qq):
            coms = kin.leg_com_positions_hip(model, qq)
            return -float(model.link_mass @ (coms @ g_hip))

        fd = (pot(q + dq) - pot(q - dq)) / (2 * eps)
        np.testing.assert_allclose(float(tau[i]), fd, atol=1e-3)


def test_gravity_zero_without_gravity(model):
    q = jnp.array([0.3, 0.9, -1.5])
    tau = dyn.leg_gravity_torques(model, q, jnp.zeros(3), 0)
    np.testing.assert_allclose(np.asarray(tau), 0.0, atol=1e-7)


def test_mass_matrix_spd(model):
    rng = np.random.default_rng(1)
    for _ in range(5):
        q = jnp.asarray(rng.uniform(-1.2, 1.2, size=3), jnp.float32)
        m = dyn.leg_mass_matrix(model, q)
        np.testing.assert_allclose(np.asarray(m), np.asarray(m.T), atol=1e-5)
        w = np.linalg.eigvalsh(np.asarray(m))
        assert np.all(w > 0), f"mass matrix not SPD: eigs {w}"


def test_inverse_dynamics_consistency(model):
    """ID(q, qd, FD(q, qd, tau)) == tau (inverse/forward roundtrip)."""
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.uniform(-1.0, 1.0, size=3), jnp.float32)
    qd = jnp.asarray(rng.normal(size=3), jnp.float32)
    tau = jnp.asarray(rng.normal(size=3) * 5, jnp.float32)
    qdd = dyn.leg_forward_dynamics(model, q, qd, tau, G_BASE, 0)
    tau2 = dyn.leg_inverse_dynamics(model, q, qd, qdd, G_BASE, 0)
    np.testing.assert_allclose(np.asarray(tau2), np.asarray(tau), atol=1e-3)


def test_inverse_dynamics_reduces_to_gravity(model):
    q = jnp.array([0.1, 0.8, -1.6])
    tau = dyn.leg_inverse_dynamics(
        model, q, jnp.zeros(3), jnp.zeros(3), G_BASE, 0
    )
    tau_g = dyn.leg_gravity_torques(model, q, G_BASE, 0)
    np.testing.assert_allclose(np.asarray(tau), np.asarray(tau_g), atol=1e-5)


def test_energy_consistency(model):
    """Passive swing under gravity conserves total energy (symplectic-ish
    check with small dt and a tight tolerance over a short horizon)."""
    leg = 0
    g_hip = model.hip_rot[leg].T @ G_BASE
    q = jnp.array([0.2, 0.6, -1.2])
    qd = jnp.array([0.0, 0.0, 0.0])
    dt = 1e-4

    def energy(q, qd):
        m = dyn.leg_mass_matrix(model, q)
        ke = 0.5 * qd @ m @ qd
        coms = kin.leg_com_positions_hip(model, q)
        pe = -float(model.link_mass @ (coms @ g_hip))
        return float(ke) + pe

    e0 = energy(q, qd)
    step = jax.jit(
        lambda q, qd: (
            q + dt * qd,
            qd
            + dt
            * dyn.leg_forward_dynamics(model, q, qd, jnp.zeros(3), G_BASE, leg),
        )
    )
    for _ in range(200):
        q, qd = step(q, qd)
    e1 = energy(q, qd)
    assert abs(e1 - e0) < 5e-3, f"energy drifted {e0} -> {e1}"


def test_batched_inverse_dynamics(model):
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.uniform(-1, 1, size=(4, 3)), jnp.float32)
    qd = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
    qdd = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
    tau = dyn.inverse_dynamics(model, q, qd, qdd, G_BASE)
    assert tau.shape == (4, 3)
    assert jnp.all(jnp.isfinite(tau))
