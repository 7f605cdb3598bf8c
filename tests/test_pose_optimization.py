"""Pose-optimization cascade tests.

Mirrors the reference's gtest invariants
(``free_gait_core/test/PoseOptimizationQpTest.cpp:21-218``,
``PoseOptimizationSQPTest.cpp:27-111``): symmetric stances recover the
expected pose; constrained cases land inside the support polygon; the
SE(3) SQP squares up a skewed stance.
"""

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_locomotion_tpu.planning import pose_optimization as po
from quadruped_locomotion_tpu.terrain import support_polygon as sp
from quadruped_locomotion_tpu.types import RobotModel
from quadruped_locomotion_tpu.utils.rotations import rpy_from_quat

MODEL = RobotModel.simpledog()
NOMINAL = po.default_nominal_stance(MODEL, height=0.4)


def symmetric_feet(dx=0.0, dy=0.0):
    feet = np.asarray(MODEL.hip_pos).copy()
    feet[:, 2] = 0.0
    feet[:, 0] += dx
    feet[:, 1] += dy
    return jnp.asarray(feet)


def test_support_halfspaces_quad():
    feet = symmetric_feet()
    normals, offsets = sp.support_halfspaces(
        feet[:, :2], jnp.ones(4, bool), margin=0.0
    )
    assert bool(sp.point_inside(normals, offsets, jnp.zeros(2)))
    assert not bool(
        sp.point_inside(normals, offsets, jnp.array([1.0, 0.0]))
    )
    # margin shrinks the region
    normals_m, offsets_m = sp.support_halfspaces(
        feet[:, :2], jnp.ones(4, bool), margin=0.17
    )
    assert not bool(
        sp.point_inside(normals_m, offsets_m, jnp.array([0.0, 0.01]))
    )


def test_support_halfspaces_diagonal_line():
    feet = symmetric_feet()
    support = jnp.array([True, False, True, False])  # LF + RH diagonal
    normals, offsets = sp.support_halfspaces(feet[:, :2], support, margin=0.0)
    # origin lies on the diagonal segment → inside the thickened line
    assert bool(sp.point_inside(normals, offsets, jnp.zeros(2), tol=1e-6))
    # a point 5 cm off the line is outside
    assert not bool(
        sp.point_inside(normals, offsets, jnp.array([0.0, 0.05]))
    )


def test_geometric_pose_symmetric():
    """≙ PoseOptimizationQpTest: a symmetric flat stance recovers the
    centered pose at the nominal height with identity orientation."""
    feet = symmetric_feet(dx=0.1, dy=-0.05)
    pose = po.geometric_pose(feet, jnp.ones(4, bool), NOMINAL)
    np.testing.assert_allclose(
        np.asarray(pose.position), [0.1, -0.05, 0.4], atol=1e-5
    )
    roll, pitch, yaw = (float(x) for x in rpy_from_quat(pose.quaternion))
    assert abs(roll) < 1e-4 and abs(pitch) < 1e-4 and abs(yaw) < 1e-4


def test_geometric_pose_yawed_stance():
    """Rotating all footholds by a yaw rotates the recovered pose."""
    ang = 0.6
    c, s = np.cos(ang), np.sin(ang)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    feet = jnp.asarray((R @ np.asarray(symmetric_feet()).T).T)
    pose = po.geometric_pose(feet, jnp.ones(4, bool), NOMINAL)
    _, _, yaw = (float(x) for x in rpy_from_quat(pose.quaternion))
    assert abs(yaw - ang) < 1e-3


def test_pose_qp_unconstrained_recovers_centroid():
    feet = symmetric_feet(dx=0.2)
    pose0 = po.geometric_pose(feet, jnp.ones(4, bool), NOMINAL)
    pose = po.pose_qp(MODEL, pose0, feet, jnp.ones(4, bool), NOMINAL)
    np.testing.assert_allclose(
        np.asarray(pose.position), [0.2, 0.0, 0.4], atol=1e-3
    )


def test_pose_qp_diagonal_constrained_inside():
    """≙ PoseOptimizationQpTest constrained case: with only a diagonal
    support the optimal position is pulled onto the support line."""
    feet = symmetric_feet()
    support = jnp.array([True, False, True, False])
    pose0 = po.geometric_pose(feet, support, NOMINAL)
    pose = po.pose_qp(MODEL, pose0, feet, support, NOMINAL)
    normals, offsets = sp.support_halfspaces(feet[:, :2], support, margin=0.0)
    com_xy = pose.position[:2]  # com_in_base is zero for simpledog
    assert float(sp.violation(normals, offsets, com_xy)) < 5e-3


def test_pose_sqp_squares_up():
    """≙ PoseOptimizationSQPTest: from a deliberately offset initial
    pose, the SQP converges to the symmetric optimum."""
    feet = symmetric_feet()
    pose0 = po.Pose(
        position=jnp.array([0.15, -0.1, 0.5]),
        quaternion=jnp.array([0.9848, 0.0, 0.0, 0.1736]),  # 20° yaw
    )
    pose = po.pose_sqp(MODEL, pose0, feet, jnp.ones(4, bool), NOMINAL)
    np.testing.assert_allclose(
        np.asarray(pose.position), [0.0, 0.0, 0.4], atol=0.02
    )
    roll, pitch, yaw = (float(x) for x in rpy_from_quat(pose.quaternion))
    assert abs(yaw) < 0.03 and abs(roll) < 0.02 and abs(pitch) < 0.02


def test_full_cascade_jits_and_checks():
    feet = symmetric_feet(dx=0.05, dy=0.02)
    support = jnp.ones(4, bool)
    pose = jax.jit(
        lambda f, s: po.optimize_pose(MODEL, f, s, height=0.4)
    )(feet, support)
    assert bool(po.check_pose(MODEL, pose, feet, support))
    np.testing.assert_allclose(
        np.asarray(pose.position)[:2], [0.05, 0.02], atol=0.02
    )


def test_cascade_vmaps_over_batch():
    batch = 8
    rng = np.random.default_rng(1)
    feet = np.tile(np.asarray(symmetric_feet())[None], (batch, 1, 1))
    feet[..., :2] += rng.uniform(-0.05, 0.05, size=(batch, 4, 2))
    feet = jnp.asarray(feet, jnp.float32)
    support = jnp.ones((batch, 4), bool)
    poses = jax.jit(
        jax.vmap(lambda f, s: po.optimize_pose(MODEL, f, s, height=0.4))
    )(feet, support)
    assert poses.position.shape == (batch, 3)
    assert bool(jnp.all(jnp.isfinite(poses.position)))
    ok = jax.vmap(lambda p, f, s: po.check_pose(MODEL, p, f, s))(
        poses, feet, support
    )
    assert bool(jnp.all(ok))
