"""Batch preview (BatchExecutor/StateBatch equivalent) tests.

≙ the reference preview stack: BatchExecutor runs the executor against
AdapterDummy and records a StateBatch for scrubbing (SURVEY.md §3.5).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_locomotion_tpu.api.actions import load_action
from quadruped_locomotion_tpu.rollout import preview as pv
from quadruped_locomotion_tpu.rollout import simulator as simlib
from quadruped_locomotion_tpu.types import RobotModel

SCRIPTS = os.path.join(
    os.path.dirname(__file__),
    "..",
    "quadruped_locomotion_tpu",
    "api",
    "motion_scripts",
)
MODEL = RobotModel.simpledog()


def _preview(name, ticks, height=0.38):
    sim = simlib.default_stance_state(MODEL, height=height)
    sched = load_action(
        os.path.join(SCRIPTS, name),
        sim.robot.base.position,
        sim.robot.base.quaternion,
        sim.feet_world,
    )
    batch = jax.jit(
        lambda: pv.batch_preview(
            MODEL,
            sched,
            sim.feet_world,
            sim.robot.base.position,
            sim.robot.base.quaternion,
            ticks,
        )
    )()
    return sched, batch


def test_leg_move_preview_reaches_target():
    sched, batch = _preview("leg_move.yaml", 400)
    assert bool(batch.done[-1])
    # each moved leg's final foothold lands on its LAST scripted target
    active = np.asarray(sched.leg_active)
    tgt = np.asarray(sched.leg_target)
    feet_T = np.asarray(batch.feet_world[-1])
    for leg in range(4):
        steps_for_leg = np.nonzero(active[:, leg])[0]
        if steps_for_leg.size:
            np.testing.assert_allclose(
                feet_T[leg], tgt[steps_for_leg[-1], leg], atol=5e-3
            )


def test_preview_stance_feet_pinned():
    _, batch = _preview("base_rotate_yaw.yaml", 300)
    feet = np.asarray(batch.feet_world)
    support = np.asarray(batch.support)
    assert support.all()  # base-only motion: all legs in stance
    np.testing.assert_allclose(
        feet, np.broadcast_to(feet[0], feet.shape), atol=1e-6
    )
    # base actually rotated mid-script (yaw out to 0.3 rad and back)
    q = np.asarray(batch.base_quaternion)
    assert np.abs(q[:, 3]).max() > np.sin(0.25 / 2)


def test_state_batch_scrubbing():
    _, batch = _preview("leg_move.yaml", 400)
    mid = pv.state_at(batch, batch.times[-1] * 0.5)
    assert mid["base_position"].shape == (3,)
    assert mid["joint_positions"].shape == (4, 3)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(mid["base_quaternion"])), 1.0, atol=1e-5
    )
    # scrub to exactly a knot reproduces the recorded row
    t5 = batch.times[5]
    at5 = pv.state_at(batch, t5)
    np.testing.assert_allclose(
        np.asarray(at5["feet_world"]),
        np.asarray(batch.feet_world[5]),
        atol=1e-5,
    )


def test_state_batch_computers():
    _, batch = _preview("leg_move.yaml", 400)
    times, swing = pv.compute_end_effector_trajectories(batch)
    support = np.asarray(batch.support)
    swing = np.asarray(swing)
    assert np.isnan(swing[support]).all()
    assert np.isfinite(swing[~support]).all()

    stances = np.asarray(pv.compute_stances(batch))
    assert stances.shape == np.asarray(batch.feet_world).shape
    # stance snapshots only change when the support set changes
    changes = np.any(stances[1:] != stances[:-1], axis=(1, 2))
    switches = np.any(support[1:] != support[:-1], axis=1)
    assert (~changes | switches).all()
