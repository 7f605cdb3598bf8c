"""Visualization smoke tests (≙ free_gait_rviz_plugin preview display +
RosVisualization markers + /capture_log_data replay plots, as PNGs)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_locomotion_tpu.rollout import preview as pv
from quadruped_locomotion_tpu.rollout import simulator as simlib
from quadruped_locomotion_tpu.planning.steps import StepSchedule
from quadruped_locomotion_tpu.types import RobotModel
from quadruped_locomotion_tpu.viz import plot_preview, plot_telemetry

MODEL = RobotModel.simpledog()


def test_plot_preview_writes_png(tmp_path):
    sim = simlib.default_stance_state(MODEL, height=0.38)
    sched = StepSchedule.create(
        2,
        leg_motion_type=jnp.array([[1, 0, 0, 0], [0, 1, 0, 0]], jnp.int32),
        leg_target=jnp.asarray(
            np.where(
                np.arange(4)[None, :, None] < 2,
                np.asarray(sim.feet_world) + np.array([0.08, 0, 0]),
                np.asarray(sim.feet_world),
            ),
            jnp.float32,
        ),
    )
    batch = jax.jit(
        lambda: pv.batch_preview(
            MODEL,
            sched,
            sim.feet_world,
            sim.robot.base.position,
            sim.robot.base.quaternion,
            200,
        )
    )()
    out = str(tmp_path / "preview.png")
    assert plot_preview(batch, out) == out
    assert os.path.getsize(out) > 10_000


def test_plot_telemetry_writes_png(tmp_path):
    T = 50
    rng = np.random.default_rng(0)
    tel = {
        "base_position": np.cumsum(
            rng.normal(0, 1e-3, (T, 3)), axis=0
        ) + np.array([0, 0, 0.4]),
        "feet_world": np.tile(
            np.asarray(
                simlib.default_stance_state(MODEL, 0.4).feet_world
            ),
            (T, 1, 1),
        ),
        "support": np.ones((T, 4), bool),
        "qp_kkt": np.full((T,), 1e-6),
    }
    tel["support"][10:20, 0] = False
    out = str(tmp_path / "telemetry.png")
    assert plot_telemetry(tel, out) == out
    assert os.path.getsize(out) > 10_000
