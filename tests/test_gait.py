"""Gait layer tests: phase machine, swing splines, Raibert footholds,
erf CoM weights (reference invariants from FootstepTest.cpp and
gait_generate_client.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_locomotion_tpu.types import RobotModel
from quadruped_locomotion_tpu.gait import phase as ph
from quadruped_locomotion_tpu.gait import footstep as fs
from quadruped_locomotion_tpu.gait import gait_generator as gg
from quadruped_locomotion_tpu.gait.spline import MAX_KNOTS


def test_trot_phase_machine_alternates():
    params = ph.GaitParams.trot_defaults()
    st = ph.PhaseState.init_trot(params)
    dt = 0.01
    support_history = []
    for _ in range(180):  # 1.8 s = 2 cycles
        st = ph.advance(st, params, dt)
        support_history.append(np.asarray(st.support))
    support_history = np.stack(support_history)
    # diagonal pairs always synchronized in trot: LF==RH, RF==LH
    np.testing.assert_array_equal(
        support_history[:, 0], support_history[:, 2]
    )
    np.testing.assert_array_equal(
        support_history[:, 1], support_history[:, 3]
    )
    # both phases occur and alternate
    assert support_history[:, 0].any() and (~support_history[:, 0]).any()
    # diagonal pairs are complementary except at switch ticks
    agree = (support_history[:, 0] == support_history[:, 1]).mean()
    assert agree < 0.1


def test_trot_duty_cycle():
    params = ph.GaitParams.trot_defaults()
    st = ph.PhaseState.init_trot(params)
    dt = 0.005
    stance_ticks = 0
    total = 1800  # 9 s
    for _ in range(total):
        st = ph.advance(st, params, dt)
        stance_ticks += int(np.asarray(st.support)[0])
    duty = stance_ticks / total
    assert abs(duty - 0.5) < 0.05  # t_sw == t_st → 50% duty


def test_pace_phase_offsets():
    params = ph.GaitParams.pace_defaults()
    st = ph.PhaseState.init_pace(params)
    # LF's stance timer starts expired (lift-off fires on the first
    # advance); RH/LH staggered at 2/3 and 1/3 of t_stance.
    np.testing.assert_allclose(
        np.asarray(st.stance_phase),
        [1.5, 0.0, 2 * 1.5 / 3, 1.5 / 3],
        atol=1e-6,
    )


def test_triangle_profile_invariants():
    """≙ FootstepTest.cpp triangleLowLongStep: apex at profile height above
    the higher endpoint, start/end exact."""
    start = jnp.array([0.0, 0.0, 0.0])
    target = jnp.array([0.3, 0.0, 0.05])
    sp = fs.swing_trajectory(start, target, profile=fs.PROFILE_TRIANGLE,
                             profile_height=0.08)
    np.testing.assert_allclose(np.asarray(sp.evaluate(0.0)), start, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sp.evaluate(sp.duration)), target, atol=1e-5
    )
    # apex: max z along trajectory ≈ max(z_start, z_target) + height
    ts = jnp.linspace(0.0, sp.duration, 101)
    zs = jax.vmap(sp.evaluate)(ts)[:, 2]
    assert abs(float(jnp.max(zs)) - (0.05 + 0.08)) < 0.02
    # duration ≥ minimum duration
    assert float(sp.duration) >= fs.DEFAULT_MIN_DURATION - 1e-6


def test_square_profile_knots():
    start = jnp.array([0.0, 0.0, 0.0])
    target = jnp.array([0.2, 0.0, 0.0])
    sp = fs.swing_trajectory(start, target, profile=fs.PROFILE_SQUARE,
                             profile_height=0.1)
    assert int(sp.num_knots) == 4
    ts = jnp.linspace(0.0, sp.duration, 101)
    zs = jax.vmap(sp.evaluate)(ts)[:, 2]
    assert abs(float(jnp.max(zs)) - 0.1) < 0.03


def test_spline_velocity_boundary_conditions():
    start = jnp.array([0.0, 0.0, 0.0])
    target = jnp.array([0.25, 0.0, 0.0])
    sp = fs.swing_trajectory(
        start, target, profile=fs.PROFILE_TRIANGLE,
        liftoff_speed=0.2, touchdown_speed=0.05,
    )
    v0 = np.asarray(sp.velocity(jnp.asarray(0.0)))
    np.testing.assert_allclose(v0, [0, 0, 0.2], atol=1e-4)
    v1 = np.asarray(sp.velocity(sp.duration))
    np.testing.assert_allclose(v1, [0, 0, -0.05], atol=1e-4)


def test_spline_derivative_consistency():
    """velocity == d/dt position (finite difference)."""
    start = jnp.array([0.1, -0.05, 0.0])
    target = jnp.array([0.4, 0.05, 0.02])
    sp = fs.swing_trajectory(start, target, profile=fs.PROFILE_TRAPEZOID)
    eps = 1e-4
    for t in [0.05, 0.12, 0.2, float(sp.duration) - 0.05]:
        t = jnp.asarray(t)
        fd = (sp.evaluate(t + eps) - sp.evaluate(t - eps)) / (2 * eps)
        np.testing.assert_allclose(
            np.asarray(sp.velocity(t)), np.asarray(fd), atol=1e-2
        )


def test_raibert_foothold_statics():
    """Zero velocity → footholds land on the ground under the kinematic
    hips (the leg's neutral vertical; see raibert_footholds)."""
    model = RobotModel.simpledog()
    from quadruped_locomotion_tpu.rollout import simulator as simlib

    sim = simlib.default_stance_state(model, height=0.4)
    params = ph.GaitParams.trot_defaults()
    targets = gg.raibert_footholds(
        model, sim.robot, params, jnp.zeros(3), jnp.asarray(0.0)
    )
    t = np.asarray(targets)
    np.testing.assert_allclose(t[:, :2], np.asarray(model.hip_pos)[:, :2],
                               atol=1e-5)
    np.testing.assert_allclose(t[:, 2], 0.0, atol=1e-6)


def test_raibert_foothold_velocity_lead():
    """Forward command shifts footholds forward by ~0.5·t_st·v."""
    model = RobotModel.simpledog()
    from quadruped_locomotion_tpu.rollout import simulator as simlib

    sim = simlib.default_stance_state(model, height=0.4)
    params = ph.GaitParams.trot_defaults()
    v = jnp.array([0.4, 0.0, 0.0])
    # current velocity = desired → pure lead term: 0.5·t_st·v + t_st·v
    state = sim.robot.replace(base=sim.robot.base.replace(linear_velocity=v))
    targets = gg.raibert_footholds(model, state, params, v, jnp.asarray(0.0))
    lead = np.asarray(targets)[:, 0] - np.asarray(model.hip_pos)[:, 0]
    expected = 0.5 * float(params.t_stance) * 0.4
    np.testing.assert_allclose(lead, expected, atol=1e-5)


def test_com_weights_range_and_symmetry():
    params = ph.GaitParams.trot_defaults()
    st = ph.PhaseState.init_trot(params)
    st = ph.advance(st, params, 0.01)  # fire the initial lift-off
    ws = []
    # stay inside one swing phase: weights decay monotonically within a
    # phase but jump UP at every phase reset (lift-off / touchdown).
    n = int(float(params.t_swing) / 0.01) - 2
    for _ in range(n):
        ws.append(np.asarray(ph.com_weights(st, params)))
        st = ph.advance(st, params, 0.01)
    ws = np.stack(ws)
    assert np.all(ws >= 0) and np.all(ws <= 1.0 + 1e-6)
    # with the reference σ's (erf widths 0.8/1.0), weights decay
    # monotonically through the cycle for every leg: a leg approaching
    # lift-off (stance end) or touchdown (swing end) sheds CoM weight.
    assert np.all(np.diff(ws, axis=0) <= 1e-6)
    # diagonal pairs share weights in trot
    np.testing.assert_allclose(ws[:, 0], ws[:, 2], atol=1e-6)
    np.testing.assert_allclose(ws[:, 1], ws[:, 3], atol=1e-6)
