"""Fully-coupled 18-DoF articulated plant: physics oracles + closed loop.

The coupled plant (``rollout/articulated.py``) is the Gazebo-parity
physics of the reference (gazebo_state_hardware_interface.cpp:286-420):
leg inertia acts on the trunk and vice versa. These tests validate it
three ways — against the independently-derived per-leg dynamics oracle,
against conservation laws in free flight, and end-to-end at the
reference gait timing (0.45/0.45 s trot, action_server_test.cpp:183),
which is the DEFAULT timing now that the plant carries real leg inertia.
"""

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_locomotion_tpu.control.locomotion import ControllerParams
from quadruped_locomotion_tpu.gait.phase import GaitParams
from quadruped_locomotion_tpu.model.dynamics import (
    leg_inverse_dynamics,
    leg_mass_matrix,
)
from quadruped_locomotion_tpu.model.kinematics import forward_kinematics
from quadruped_locomotion_tpu.rollout import articulated as art
from quadruped_locomotion_tpu.rollout import closed_loop as cl
from quadruped_locomotion_tpu.rollout.simulator import SimState
from quadruped_locomotion_tpu.types import BaseState, RobotModel, RobotState
from quadruped_locomotion_tpu.utils.rotations import matrix_from_quat


def _random_state(seed=0):
    model = RobotModel.simpledog()
    q = jax.random.uniform(
        jax.random.PRNGKey(seed), (4, 3), minval=-0.8, maxval=0.8
    )
    qd = 0.5 * jax.random.normal(jax.random.PRNGKey(seed + 1), (4, 3))
    return model, q, qd


def test_mass_matrix_structure_matches_leg_oracle():
    """With an identity base pose, the joint-joint block of the 18×18
    floating-base mass matrix must equal the per-leg hip-frame mass
    matrices (model/dynamics.py — independently derived from link CoM
    Jacobians), the linear-linear block must be m_total·I, and the whole
    matrix must be symmetric positive definite."""
    model, q, _ = _random_state()
    base = BaseState.identity()
    m = art.mass_matrix(model, base, q)
    np.testing.assert_allclose(m, m.T, atol=1e-5)
    np.testing.assert_allclose(
        m[:3, :3], np.eye(3) * float(model.total_mass), rtol=1e-5
    )
    for leg in range(4):
        blk = m[6 + 3 * leg : 9 + 3 * leg, 6 + 3 * leg : 9 + 3 * leg]
        np.testing.assert_allclose(
            blk, leg_mass_matrix(model, q[leg]), rtol=2e-4, atol=1e-6
        )
    assert float(jnp.linalg.eigvalsh(m).min()) > 1e-4


def test_bias_matches_leg_inverse_dynamics():
    """With zero base velocity the joint rows of h(q,v) must equal each
    leg's fixed-base Coriolis+gravity torque from the independent
    Christoffel-symbol derivation."""
    model, q, qd = _random_state(7)
    base = BaseState.identity()
    h = art.bias_forces(model, base, q, qd)
    g_base = jnp.array([0.0, 0.0, -9.8])
    for leg in range(4):
        tau_id = leg_inverse_dynamics(
            model, q[leg], qd[leg], jnp.zeros(3), g_base, leg
        )
        np.testing.assert_allclose(
            h[6 + 3 * leg : 9 + 3 * leg], tau_id, rtol=1e-3, atol=1e-4
        )


def test_free_fall_conserves_momentum_and_energy():
    """Free flight with spinning base and flailing legs: the system CoM
    must follow the ballistic parabola (momentum bookkeeping through the
    full coupling) and total energy must be conserved to integrator
    order. This is the test a decoupled massless-leg plant cannot pass."""
    model, q, qd = _random_state(3)
    model = model.replace(joint_damping=jnp.asarray(0.0))
    base = BaseState.identity().replace(
        position=jnp.array([0.0, 0.0, 50.0]),
        linear_velocity=jnp.array([1.0, 0.5, 2.0]),
        angular_velocity=jnp.array([0.5, -0.3, 0.8]),
    )
    robot = RobotState.neutral().replace(
        base=base, q=q, qd=qd, support=jnp.zeros(4, bool)
    )
    rot = matrix_from_quat(base.quaternion)
    feet = base.position[None] + forward_kinematics(model, q) @ rot.T
    sim = SimState(robot=robot, feet_world=feet, time=jnp.asarray(0.0))

    def measures(s):
        b = s.robot.base
        kin = art._link_kinematics(
            model, b.position, matrix_from_quat(b.quaternion),
            s.robot.q, jnp.zeros(18),
        )
        m_b, _ = art.base_dynamic_params(model)
        masses = jnp.concatenate(
            [m_b[None], jnp.tile(model.link_mass, 4)]
        )
        coms = jnp.concatenate(
            [kin["base_com"][None], kin["coms"].reshape(12, 3)]
        )
        com = (masses[:, None] * coms).sum(0) / masses.sum()
        v = jnp.concatenate(
            [b.linear_velocity, b.angular_velocity, s.robot.qd.reshape(-1)]
        )
        m_mat = art.mass_matrix(model, b, s.robot.q)
        energy = 0.5 * v @ m_mat @ v + 9.8 * (masses * coms[:, 2]).sum()
        return com, v, m_mat, energy

    com0, v0, m0, e0 = measures(sim)
    dt, steps = 0.0025, 160
    no_contact = jnp.zeros(4, bool)
    step = jax.jit(
        lambda s: art.step(
            model, s, jnp.zeros((4, 3)), dt,
            support=no_contact, ground_height=-1e3, substeps=4,
        )
    )
    s = sim
    for _ in range(steps):
        s = step(s)
    com_t, _, _, e_t = measures(s)
    t = steps * dt
    vcom0 = (m0 @ v0)[:3] / model.total_mass
    expected = com0 + vcom0 * t + 0.5 * jnp.array([0, 0, -9.8]) * t * t
    np.testing.assert_allclose(com_t, expected, atol=5e-3)
    kinetic0 = float(0.5 * v0 @ m0 @ v0)
    assert abs(float(e_t - e0)) < 0.02 * kinetic0


def test_standing_contact_forces_support_weight():
    """At rest with all feet pinned and gravity-balancing torques, the
    solved contact forces must sum to the robot's weight (Newton) and
    the robot must not move."""
    model = RobotModel.simpledog()
    params = ControllerParams.defaults()
    gp = GaitParams.trot_defaults()
    ls0 = cl.init_locomotion(model, gp)
    _, tel = jax.jit(
        lambda ls: cl.rollout(model, params, gp, ls, cl.Command.zero(), 200)
    )(ls0)
    bp = np.asarray(tel["base_position"])
    assert np.isfinite(bp).all()
    assert (bp[:, 2] > 0.35).all()
    assert np.abs(bp[-1, :2]).max() < 0.02

    # Direct static check: command τ = Jᵀf + τ_g with each leg pushing
    # down W/4 (the controller's stance torque map); the KKT contact
    # solve must return the matching ground reaction of W/4 up per foot.
    from quadruped_locomotion_tpu.model.dynamics import gravity_torques
    from quadruped_locomotion_tpu.model.kinematics import jacobians

    sim = ls0.sim
    weight = float(model.total_mass) * 9.8
    f_push = jnp.tile(jnp.array([0.0, 0.0, -weight / 4]), (4, 1))
    g_base = jnp.array([0.0, 0.0, -9.8])
    tau_hold = (
        jnp.einsum("lji,lj->li", jacobians(model, sim.robot.q), f_push)
        + gravity_torques(model, sim.robot.q, g_base)
    )
    carry = (
        sim.robot.base, sim.robot.q, sim.robot.qd,
        sim.robot.support, sim.feet_world,
    )
    _, lam = art._substep(
        model, carry, tau_hold, 0.00125,
        jnp.ones(4, bool), jnp.zeros(4),
    )
    lam = np.asarray(lam)
    np.testing.assert_allclose(
        lam[:, 2], np.full(4, weight / 4), rtol=0.05
    )
    assert lam[:, 2].sum() > 0.9 * weight


def test_reference_timing_trot_8s_stable():
    """The headline gap from round 2: a ≥8 s closed-loop trot at the
    reference 0.45/0.45 s timing (now the trot DEFAULT) on the coupled
    plant, with the same bounds as the pace stability test."""
    model = RobotModel.simpledog()
    params = ControllerParams.defaults()
    gp = GaitParams.trot_defaults()
    assert abs(float(gp.t_swing) - 0.45) < 1e-6
    assert abs(float(gp.t_stance) - 0.45) < 1e-6
    ls0 = cl.init_locomotion(model, gp)
    cmd = cl.Command(
        linear_velocity=jnp.array([0.2, 0.0, 0.0]), yaw_rate=jnp.asarray(0.0)
    )
    _, tel = jax.jit(
        lambda ls: cl.rollout(model, params, gp, ls, cmd, 800)
    )(ls0)
    bp = np.asarray(tel["base_position"])
    assert np.isfinite(bp).all()
    assert bp[:, 2].min() > 0.3
    assert bp[:, 2].max() < 0.5
    # forward progress: ≥ half the commanded distance over 8 s
    assert bp[-1, 0] > 0.8, bp[-1, 0]
    assert np.abs(bp[:, 1]).max() < 0.3


def test_massless_plant_still_supported():
    """The decoupled massless-leg plant stays available for
    throughput-critical sweeps (plant="massless") and stays stable at
    the fast exchange it was tuned for."""
    model = RobotModel.simpledog()
    params = ControllerParams.defaults()
    gp = GaitParams.trot_defaults().replace(
        t_swing=jnp.asarray(0.25), t_stance=jnp.asarray(0.25)
    )
    ls0 = cl.init_locomotion(model, gp)
    cmd = cl.Command(
        linear_velocity=jnp.array([0.2, 0.0, 0.0]), yaw_rate=jnp.asarray(0.0)
    )
    _, tel = jax.jit(
        lambda ls: cl.rollout(
            model, params, gp, ls, cmd, 400, plant="massless"
        )
    )(ls0)
    bp = np.asarray(tel["base_position"])
    assert np.isfinite(bp).all()
    assert (bp[:, 2] > 0.3).all()
    assert bp[-1, 0] > 0.3


def test_friction_cone_lets_feet_slide():
    """A laterally-kicked trunk with PD-held posture: stick needs
    tangential forces outside a μ=0.05 cone, so the cone plant must let
    the feet slide while the rigid-stick plant holds them fixed — and
    the slide must decelerate at roughly the kinetic-friction rate μ·g
    (Coulomb physics, not an arbitrary damper)."""
    from quadruped_locomotion_tpu.control.swing import (
        joint_pd_gravity_torques,
    )
    from quadruped_locomotion_tpu.rollout.simulator import (
        default_stance_state,
    )

    model = RobotModel.simpledog()
    sim0 = default_stance_state(model)
    q_hold = sim0.robot.q
    kick = sim0.robot.base.replace(
        linear_velocity=jnp.array([0.0, 0.3, 0.0])
    )
    sim0 = sim0.replace(robot=sim0.robot.replace(base=kick))

    def step(s, mu):
        tau = joint_pd_gravity_torques(
            model, s.robot, q_hold, jnp.zeros_like(q_hold)
        )
        return art.step(model, s, tau, 0.0025, friction_mu=mu)

    step_ice = jax.jit(lambda s: step(s, 0.05))
    step_grip = jax.jit(lambda s: step(s, None))
    s_ice, s_grip = sim0, sim0
    for _ in range(80):  # 0.2 s
        s_ice = step_ice(s_ice)
        s_grip = step_grip(s_grip)

    slide_ice = np.abs(
        np.asarray(s_ice.feet_world[:, 1] - sim0.feet_world[:, 1])
    ).max()
    slide_grip = np.abs(
        np.asarray(s_grip.feet_world[:, 1] - sim0.feet_world[:, 1])
    ).max()
    assert slide_grip < 1e-6, slide_grip  # rigid stick: anchors immobile
    assert slide_ice > 0.02, slide_ice  # ice: feet really slid
    # deceleration ≈ μ·g = 0.49 m/s² → Δv ≈ 0.10 over 0.2 s (±50% for
    # load transfer between the four feet during the slide)
    dv = 0.3 - float(s_ice.robot.base.linear_velocity[1])
    assert 0.05 < dv < 0.15, dv
    assert np.isfinite(np.asarray(s_ice.robot.base.position)).all()
