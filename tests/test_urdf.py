"""URDF loading: the bundled simpledog.urdf must round-trip to
RobotModel.simpledog(), and the loaded model must be kinematically
consistent (FK/IK inverses).

≙ the reference's model-from-URDF startup path: KDL chains
(``quadrupedkinematics.cpp:143``) and RBDL leg models
(``model_test_header.cpp:224-247``).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_locomotion_tpu.model import kinematics as kin
from quadruped_locomotion_tpu.model.urdf import (
    SIMPLEDOG_URDF,
    load_urdf,
    robot_model_from_urdf,
    rpy_to_matrix,
)
from quadruped_locomotion_tpu.types import RobotModel

HIP_OFFSET = np.array(
    [
        [0.42, 0.075, 0.0],
        [0.42, -0.075, 0.0],
        [-0.42, -0.075, 0.0],
        [-0.42, 0.075, 0.0],
    ]
)


@pytest.fixture(scope="module")
def loaded():
    return robot_model_from_urdf(
        SIMPLEDOG_URDF,
        vmc_base_mass=27.0,
        vmc_leg_mass=6.0,
        hip_offset=HIP_OFFSET,
    )


def test_parser_reads_structure():
    robot = load_urdf(SIMPLEDOG_URDF)
    assert robot.name == "simpledog"
    assert robot.root_link() == "base_link"
    assert len(robot.links) == 1 + 4 * 4  # base + 3 links + foot per leg
    revolute = [j for j in robot.joints.values() if j.type == "revolute"]
    assert len(revolute) == 12
    assert all(j.effort == 300.0 for j in revolute)
    assert all(j.damping == 0.2 for j in revolute)


def test_rpy_matrix_convention():
    # URDF rpy is extrinsic XYZ: R = Rz·Ry·Rx. Spot values.
    np.testing.assert_allclose(
        rpy_to_matrix((0, 0, np.pi / 2)),
        [[0, -1, 0], [1, 0, 0], [0, 0, 1]],
        atol=1e-12,
    )
    np.testing.assert_allclose(
        rpy_to_matrix((np.pi / 2, np.pi / 2, np.pi / 2)),
        [[0, 0, 1], [0, 1, 0], [-1, 0, 0]],
        atol=1e-12,
    )


def test_roundtrips_to_simpledog(loaded):
    ref = RobotModel.simpledog()
    for name in ref.__dataclass_fields__:
        got = getattr(loaded, name)
        want = getattr(ref, name)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-6, err_msg=name
        )


def test_loaded_model_fk_ik_roundtrip(loaded):
    rng = np.random.default_rng(3)
    q = jnp.asarray(
        rng.uniform(-0.8, 0.8, size=(4, 3)), jnp.float32
    ) + jnp.asarray([0.0, 0.7, -1.4], jnp.float32)
    feet = kin.forward_kinematics(loaded, q)
    q2 = kin.inverse_kinematics(loaded, feet)
    feet2 = kin.forward_kinematics(loaded, q2)
    np.testing.assert_allclose(
        np.asarray(feet2), np.asarray(feet), atol=1e-5
    )


def test_urdf_masses_without_overrides():
    model = robot_model_from_urdf(SIMPLEDOG_URDF)
    # no overrides → URDF-summed masses (3 leg links ≈ 3.9134 kg each)
    np.testing.assert_allclose(float(model.base_mass), 27.0)
    np.testing.assert_allclose(
        np.asarray(model.leg_mass), np.full(4, 1.1709 + 1.3902 + 1.3523),
        rtol=1e-6,
    )
    # default virtual hips = kinematic hip origins
    np.testing.assert_allclose(
        np.asarray(model.hip_offset)[:, 0], [0.4, 0.4, -0.4, -0.4]
    )
