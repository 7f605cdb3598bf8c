"""Core pytree state/model types for the TPU-native quadruped stack.

Replaces the reference's kindr-typed, *static-member* ``QuadrupedState``
singleton (``quadruped_model/include/quadruped_model/quadruped_state.h:99-109``)
and ``free_gait::State`` with immutable, batched pytree dataclasses.

Leg ordering follows the reference's ``LimbEnum`` (``quadruped_model/
include/quadruped_model/QuadrupedModel.hpp``): LF=0, RF=1, RH=2, LH=3.
Per-leg joints are (HAA, HFE, KFE) = (hip abduction, hip flexion, knee).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

LF, RF, RH, LH = 0, 1, 2, 3
NUM_LEGS = 4
JOINTS_PER_LEG = 3
NUM_JOINTS = NUM_LEGS * JOINTS_PER_LEG
GRAVITY = 9.8  # m/s², matches the hard-coded value in the reference
# (VirtualModelController.cpp:167, ContactForceDistribution.cpp:518)

LEG_NAMES = ("LF_LEG", "RF_LEG", "RH_LEG", "LH_LEG")

# IK solution-branch indices (quadrupedkinematics.cpp:463-474):
# OUT_LEFT=0, IN_RIGHT=1, IN_LEFT=2, OUT_RIGHT=3
IK_BRANCH = {"OUT_LEFT": 0, "IN_RIGHT": 1, "IN_LEFT": 2, "OUT_RIGHT": 3}

# Default limb configuration "><" (quadruped_state.cpp:61, :385-390):
# LF=IN_LEFT, RF=OUT_LEFT, RH=IN_LEFT, LH=OUT_LEFT.
DEFAULT_LIMB_CONFIG = ("IN_LEFT", "OUT_LEFT", "IN_LEFT", "OUT_LEFT")

# The four whole-robot configure strings of QuadrupedState::setLimbConfigure
# (quadruped_state.cpp:369-399), in OUR leg order (LF, RF, RH, LH).
LIMB_CONFIGURE = {
    "<<": ("IN_LEFT", "OUT_LEFT", "OUT_LEFT", "IN_LEFT"),
    "<>": ("OUT_LEFT", "IN_LEFT", "OUT_LEFT", "IN_LEFT"),
    "><": DEFAULT_LIMB_CONFIG,
    ">>": ("OUT_LEFT", "IN_LEFT", "IN_LEFT", "OUT_LEFT"),
}


def limb_configure_branches(configure: str):
    """configure string → (4,) int32 IK-branch array (raises KeyError on
    unknown strings, ≙ setLimbConfigure returning false)."""
    import jax.numpy as jnp

    names = LIMB_CONFIGURE[configure]
    return jnp.asarray([IK_BRANCH[n] for n in names], jnp.int32)


@struct.dataclass
class RobotModel:
    """Static robot description (simpledog, 12 DoF).

    Geometry idealized from ``quadruped_model/urdf/simpledog.urdf`` exactly as
    the reference's analytic IK does (d=0.1, l1=l2=0.25;
    ``quadrupedkinematics.cpp:383-385``).
    """

    # Kinematic hip (HAA joint) pose in base frame, from the URDF joint
    # origins (simpledog.urdf front_left_1_joint etc.): (±0.4, ±0.175, 0).
    hip_pos: jax.Array  # (4,3)
    hip_rot: jax.Array  # (4,3,3) base←hip rotation
    # Abduction offset and link lengths of the analytic 3-DoF leg.
    d: jax.Array  # scalar, 0.1
    l1: jax.Array  # 0.25
    l2: jax.Array  # 0.25
    # Per-leg IK branch selection (see IK_BRANCH / DEFAULT_LIMB_CONFIG).
    ik_branch: jax.Array  # (4,) int32
    # "Virtual hip" offsets used by the Raibert heuristic and as leg CoM
    # proxies: (±0.42, ±0.075, 0) (quadruped_state.cpp:83-96).
    hip_offset: jax.Array  # (4,3)
    # Masses for the VMC gravity model (quadruped_state.cpp:28-36):
    # torso 27 kg + 6 kg per limb.
    base_mass: jax.Array  # scalar
    leg_mass: jax.Array  # (4,)
    com_in_base: jax.Array  # (3,) base CoM offset (0,0,0)
    # Per-link inertial params of one leg for RNEA/gravity compensation,
    # taken from the URDF front_left link inertials (masses/CoMs in the
    # respective joint frames).
    link_mass: jax.Array  # (3,)
    link_com: jax.Array  # (3,3) CoM position in each link (=joint) frame
    link_inertia: jax.Array  # (3,3,3) rotational inertia about link CoM
    torque_limit: jax.Array  # scalar, ±300 N·m (ros_balance_controller.cpp:451)
    # Lumped rigid-body inertia for the rollout simulator: URDF base_link
    # inertia + leg point masses at the hip offsets.
    base_inertia: jax.Array  # (3,3)
    # Viscous joint damping for the swing-leg plant [N·m·s/rad]. The URDF
    # declares none; Gazebo's implicit ODE solver supplies equivalent
    # numerical damping — without it the ideal frictionless leg rings at
    # the control Nyquist frequency.
    joint_damping: jax.Array  # scalar

    @classmethod
    def simpledog(cls, dtype=jnp.float32) -> "RobotModel":
        f = lambda x: jnp.asarray(x, dtype=dtype)
        # Left-leg hip frame in base: x̂=-ẑ_b (down), ŷ=ŷ_b, ẑ=x̂_b (fwd).
        # From URDF rpy (π/2, π/2, π/2) on the *_1 joints.
        rot_left = jnp.array(
            [[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [-1.0, 0.0, 0.0]]
        )
        # Right-leg hip frame: rpy (π/2, π/2, -π/2): x̂=-ẑ_b, ŷ=-ŷ_b, ẑ=-x̂_b.
        rot_right = jnp.array(
            [[0.0, 0.0, -1.0], [0.0, -1.0, 0.0], [-1.0, 0.0, 0.0]]
        )
        hip_rot = jnp.stack([rot_left, rot_right, rot_right, rot_left])
        hip_pos = jnp.array(
            [
                [0.4, 0.175, 0.0],   # LF
                [0.4, -0.175, 0.0],  # RF
                [-0.4, -0.175, 0.0], # RH
                [-0.4, 0.175, 0.0],  # LH
            ]
        )
        hip_offset = jnp.array(
            [
                [0.42, 0.075, 0.0],
                [0.42, -0.075, 0.0],
                [-0.42, -0.075, 0.0],
                [-0.42, 0.075, 0.0],
            ]
        )
        branch = jnp.array(
            [IK_BRANCH[c] for c in DEFAULT_LIMB_CONFIG], dtype=jnp.int32
        )
        # front_left_{1,2,3}_Link inertials from simpledog.urdf.
        link_mass = jnp.array([1.1709, 1.3902, 1.3523])
        link_com = jnp.array(
            [
                [0.0, 0.012793, -0.00023552],
                [0.11439, 0.00028184, 0.05942],
                [0.087825, 0.0000153, -0.016708],
            ]
        )
        link_inertia = jnp.stack(
            [
                jnp.diag(jnp.array([0.001719, 0.0013167, 0.0021511])),
                jnp.diag(jnp.array([0.0030209, 0.026875, 0.028484])),
                jnp.diag(jnp.array([0.00053032, 0.0091429, 0.009338])),
            ]
        )
        # base_link inertia from simpledog.urdf + 6 kg point masses at the
        # four virtual hips (parallel-axis).
        base_inertia = jnp.diag(jnp.array([0.74932, 2.3017, 2.9675]))
        for hx, hy in [(0.42, 0.075), (0.42, -0.075), (-0.42, -0.075), (-0.42, 0.075)]:
            r = jnp.array([hx, hy, 0.0])
            base_inertia = base_inertia + 6.0 * (
                jnp.dot(r, r) * jnp.eye(3) - jnp.outer(r, r)
            )
        return cls(
            hip_pos=f(hip_pos),
            hip_rot=f(hip_rot),
            d=f(0.1),
            l1=f(0.25),
            l2=f(0.25),
            ik_branch=branch,
            hip_offset=f(hip_offset),
            base_mass=f(27.0),
            leg_mass=f(jnp.full((4,), 6.0)),
            com_in_base=f(jnp.zeros(3)),
            link_mass=f(link_mass),
            link_com=f(link_com),
            link_inertia=f(link_inertia),
            torque_limit=f(300.0),
            base_inertia=f(base_inertia),
            joint_damping=f(0.2),
        )

    @property
    def total_mass(self) -> jax.Array:
        return self.base_mass + jnp.sum(self.leg_mass)


@struct.dataclass
class BaseState:
    """6-DoF floating-base state (world-frame pose, mixed-frame twist —
    matching the reference convention: linear velocity in world frame,
    angular velocity in base frame)."""

    position: jax.Array  # (3,) world
    quaternion: jax.Array  # (4,) wxyz, base→world (R_WB)
    linear_velocity: jax.Array  # (3,) world frame
    angular_velocity: jax.Array  # (3,) base frame

    @classmethod
    def identity(cls, dtype=jnp.float32) -> "BaseState":
        return cls(
            position=jnp.zeros(3, dtype),
            quaternion=jnp.array([1.0, 0.0, 0.0, 0.0], dtype),
            linear_velocity=jnp.zeros(3, dtype),
            angular_velocity=jnp.zeros(3, dtype),
        )


@struct.dataclass
class RobotState:
    """Full measured robot state: base + joints + contact bookkeeping.

    Functional replacement for ``free_gait::State`` +
    ``quadruped_model::QuadrupedState``.
    """

    base: BaseState
    q: jax.Array  # (4,3) joint positions
    qd: jax.Array  # (4,3) joint velocities
    tau: jax.Array  # (4,3) measured joint efforts
    support: jax.Array  # (4,) bool: is leg a support (stance) leg
    surface_normal: jax.Array  # (4,3) world-frame contact surface normals

    @classmethod
    def neutral(cls, dtype=jnp.float32) -> "RobotState":
        return cls(
            base=BaseState.identity(dtype),
            q=jnp.zeros((4, 3), dtype),
            qd=jnp.zeros((4, 3), dtype),
            tau=jnp.zeros((4, 3), dtype),
            support=jnp.ones(4, dtype=bool),
            surface_normal=jnp.tile(
                jnp.array([0.0, 0.0, 1.0], dtype), (4, 1)
            ),
        )


@struct.dataclass
class BaseTarget:
    """Desired base motion handed from the planner to the controller
    (the `/desired_robot_state` payload of the reference,
    ``StateRosPublisher.cpp:240-560``)."""

    position: jax.Array  # (3,) world
    quaternion: jax.Array  # (4,) wxyz base→world
    linear_velocity: jax.Array  # (3,) world
    angular_velocity: jax.Array  # (3,) base

    @classmethod
    def from_base(cls, base: BaseState) -> "BaseTarget":
        return cls(
            position=base.position,
            quaternion=base.quaternion,
            linear_velocity=base.linear_velocity,
            angular_velocity=base.angular_velocity,
        )


@struct.dataclass
class VmcGains:
    """Virtual-model-controller gains.

    Defaults = the Gazebo gains in
    ``balance_controller/config/controller_gains_gazebo.yaml``.
    Order: (heading=x, lateral=y, vertical=z), (roll, pitch, yaw).
    """

    kp_lin: jax.Array  # (3,)
    kd_lin: jax.Array  # (3,)
    kff_lin: jax.Array  # (3,)
    kp_ang: jax.Array  # (3,)
    kd_ang: jax.Array  # (3,)
    kff_ang: jax.Array  # (3,)
    gravity_percentage: jax.Array  # scalar (1.0)

    @classmethod
    def gazebo_defaults(cls, dtype=jnp.float32) -> "VmcGains":
        f = lambda x: jnp.asarray(x, dtype=dtype)
        return cls(
            kp_lin=f([5000.0, 5000.0, 10000.0]),
            kd_lin=f([5000.0, 4000.0, 5000.0]),
            kff_lin=f([10.0, 10.0, 100.0]),
            kp_ang=f([10000.0, 10000.0, 4000.0]),
            kd_ang=f([1000.0, 1000.0, 1000.0]),
            kff_ang=f([0.2, 0.2, 1000.0]),
            gravity_percentage=f(1.0),
        )


@struct.dataclass
class CfdParams:
    """Contact-force-distribution QP parameters
    (``controller_gains_gazebo.yaml`` contact_force_distribution section)."""

    s_weights: jax.Array  # (6,) diag of S: force xyz, torque rpy
    w_regularizer: jax.Array  # scalar, 1e-4
    friction_coeff: jax.Array  # scalar, 0.6
    min_normal_force: jax.Array  # scalar, 10 N

    @classmethod
    def defaults(cls, dtype=jnp.float32) -> "CfdParams":
        f = lambda x: jnp.asarray(x, dtype=dtype)
        return cls(
            s_weights=f([1.0, 5.0, 1.0, 10.0, 10.0, 5.0]),
            w_regularizer=f(1e-4),
            friction_coeff=f(0.6),
            min_normal_force=f(10.0),
        )


@struct.dataclass
class SwingGains:
    """Task-space PD for swing-leg computed-torque control
    (``controller_gains_gazebo.yaml`` single_leg_controller; kp=1000 kd=200)."""

    kp: jax.Array  # (3,)
    kd: jax.Array  # (3,)

    @classmethod
    def defaults(cls, dtype=jnp.float32) -> "SwingGains":
        f = lambda x: jnp.asarray(x, dtype=dtype)
        return cls(kp=f([1000.0, 1000.0, 1000.0]), kd=f([200.0, 200.0, 200.0]))
