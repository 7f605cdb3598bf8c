import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_locomotion_tpu.types import RobotModel
from quadruped_locomotion_tpu.model import kinematics as kin


@pytest.fixture(scope="module")
def model():
    return RobotModel.simpledog()


def nominal_stance_feet(model):
    """Feet straight below the kinematic hips at a plausible height.

    Leg max reach from the hip is sqrt(d² + (l1+l2)²) ≈ 0.51 m; keep
    nominal depth at 0.35 m so perturbed targets stay in the workspace.
    """
    feet = np.asarray(model.hip_pos).copy()
    feet[:, 2] = -0.35
    return jnp.asarray(feet, jnp.float32)


def test_fk_shape_and_finiteness(model):
    q = jnp.zeros((4, 3))
    p = kin.forward_kinematics(model, q)
    assert p.shape == (4, 3)
    assert jnp.all(jnp.isfinite(p))


def test_ik_fk_roundtrip_nominal(model):
    feet = nominal_stance_feet(model)
    q = kin.inverse_kinematics(model, feet)
    p = kin.forward_kinematics(model, q)
    np.testing.assert_allclose(np.asarray(p), np.asarray(feet), atol=2e-5)


def test_ik_fk_roundtrip_random_targets(model):
    """Any reachable target must round-trip through IK∘FK."""
    rng = np.random.default_rng(0)
    feet0 = np.asarray(nominal_stance_feet(model))
    for trial in range(20):
        delta = rng.uniform(-0.08, 0.08, size=(4, 3)).astype(np.float32)
        feet = jnp.asarray(feet0 + delta)
        q = kin.inverse_kinematics(model, feet)
        p = kin.forward_kinematics(model, q)
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(feet), atol=5e-5,
            err_msg=f"trial {trial}",
        )


def test_fk_ik_roundtrip_joint_space(model):
    """FK∘IK∘FK consistency: IK of an FK point lands on the same foot pos."""
    rng = np.random.default_rng(1)
    for _ in range(10):
        q = jnp.asarray(
            np.stack(
                [
                    rng.uniform(-0.4, 0.4, 4),
                    rng.uniform(0.5, 1.2, 4),
                    rng.uniform(-2.2, -0.8, 4),
                ],
                axis=-1,
            ),
            jnp.float32,
        )
        p = kin.forward_kinematics(model, q)
        q2 = kin.inverse_kinematics(model, p)
        p2 = kin.forward_kinematics(model, q2)
        np.testing.assert_allclose(np.asarray(p2), np.asarray(p), atol=5e-5)


def test_jacobian_matches_autodiff(model):
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.uniform(-1.0, 1.0, size=(4, 3)), jnp.float32)
    for leg in range(4):
        j_analytic = kin.leg_jacobian(model, q[leg], leg)
        j_auto = jax.jacfwd(lambda ql: kin.leg_forward_kinematics(model, ql, leg))(
            q[leg]
        )
        np.testing.assert_allclose(
            np.asarray(j_analytic), np.asarray(j_auto), atol=1e-5
        )


def test_foot_velocity_consistency(model):
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.uniform(-0.8, 0.8, size=(4, 3)), jnp.float32)
    qd = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
    v = kin.foot_velocities(model, q, qd)
    qd2 = kin.joint_velocities_from_foot_velocities(model, q, v)
    np.testing.assert_allclose(np.asarray(qd2), np.asarray(qd), atol=1e-4)


def test_ik_out_of_reach_clamps(model):
    """Unreachable targets must produce finite joints (workspace clamp)."""
    feet = nominal_stance_feet(model) * 3.0
    q = kin.inverse_kinematics(model, feet)
    assert jnp.all(jnp.isfinite(q))


def test_fk_symmetry(model):
    """Mirror-symmetric joints give mirror-symmetric feet (LF vs RF)."""
    q_lf = jnp.array([0.1, 0.7, -1.4])
    q_rf = jnp.array([0.1, 0.7, -1.4])
    p_lf = kin.leg_forward_kinematics(model, q_lf, 0)
    p_rf = kin.leg_forward_kinematics(model, q_rf, 1)
    # Right hip frame mirrors both y and x-axis direction; identical joint
    # angles place the feet mirrored in y.
    np.testing.assert_allclose(float(p_lf[2]), float(p_rf[2]), atol=1e-5)
    np.testing.assert_allclose(float(p_lf[1]), -float(p_rf[1]), atol=1e-5)


def test_vmap_over_batch(model):
    """The whole FK/IK stack vmaps over a scenario batch."""
    rng = np.random.default_rng(4)
    feet = jnp.asarray(
        np.asarray(nominal_stance_feet(model))[None]
        + rng.uniform(-0.05, 0.05, size=(32, 4, 3)),
        jnp.float32,
    )
    q = jax.vmap(lambda f: kin.inverse_kinematics(model, f))(feet)
    p = jax.vmap(lambda qq: kin.forward_kinematics(model, qq))(q)
    np.testing.assert_allclose(np.asarray(p), np.asarray(feet), atol=1e-4)
