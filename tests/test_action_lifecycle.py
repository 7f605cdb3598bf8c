"""Programmatic action lifecycle (≙ free_gait_python/action.py + the
action loader's per-type execution, VERDICT r2 item 8): ActionBase state
machine, continuous feedback-driven goal generation, combined-YAML
actions with placeholders, python- and launch-type actions, sequences.
"""

import os
import textwrap

import numpy as np
import pytest
import yaml

from quadruped_locomotion_tpu.api import action as A
from quadruped_locomotion_tpu.api import messages as msg
from quadruped_locomotion_tpu.api.action_loader import (
    ActionLoader,
    default_registry,
)
from quadruped_locomotion_tpu.api.continuous_actions import VelocityTrotAction
from quadruped_locomotion_tpu.runtime.action_server import (
    FreeGaitActionServer,
)
from quadruped_locomotion_tpu.types import RobotModel

MODEL = RobotModel.simpledog()
S = A.ActionState


@pytest.fixture
def server():
    return FreeGaitActionServer(MODEL, capacity=12)


@pytest.fixture
def loader(server):
    return ActionLoader(server, default_registry())


def test_simple_action_full_lifecycle(server):
    """INITIALIZED → (start) PENDING → ACTIVE → DONE with a result."""
    doc = {
        "steps": [
            {"step": [{"base_target": {"target": {"position": [0.0, 0.0, 0.36]}}}]}
        ]
    }
    act = A.SimpleAction(server, doc)
    seen = []
    act.register_callback(
        feedback_callback=lambda: seen.append(act.state),
        done_callback=lambda: seen.append(act.state),
    )
    assert act.state == S.INITIALIZED
    act.start()
    assert act.state == S.PENDING
    assert act.wait_for_state(S.DONE, max_ticks=2000)
    assert act.result is not None
    assert act.result.status == msg.RESULT_SUCCEEDED
    # transitions arrived in order, ACTIVE before DONE
    assert S.ACTIVE in seen and seen.index(S.ACTIVE) < seen.index(S.DONE)


def test_empty_goal_is_immediately_done(server):
    """goal=None → empty result + DONE without touching the server
    (≙ ActionBase._send_goal's None branch)."""
    act = A.SimpleAction(server, None)
    act.start()
    assert act.state == S.DONE
    assert act.result is not None


def test_trigger_on_feedback_semantics():
    t = A.TriggerOnFeedback(1, 0.5)
    fb = msg.ExecuteStepsFeedback(queue_size=2, phase=0.9)
    assert not t.check(fb)
    fb = msg.ExecuteStepsFeedback(queue_size=1, phase=0.4)
    assert not t.check(fb)
    fb = msg.ExecuteStepsFeedback(queue_size=1, phase=0.6)
    assert t.check(fb)
    assert not t.check(None)


def test_continuous_velocity_trot_feedback_driven(server):
    """The continuous trot generates goal after goal from feedback and
    keeps the robot walking; halt() parks it IDLE (not DONE)."""
    act = VelocityTrotAction(server, velocity=(0.12, 0.0))
    act.start()
    x0 = float(server.state.sim.robot.base.position[0])
    for _ in range(450):  # 4.5 s
        server.tick()
    assert act.state == S.ACTIVE
    assert act.cycles_sent >= 3  # continuation really fired
    x1 = float(server.state.sim.robot.base.position[0])
    assert x1 - x0 > 0.15, x1 - x0  # walked forward
    assert float(server.state.sim.robot.base.position[2]) > 0.3

    act.halt()
    assert act.wait_for_state(S.IDLE, max_ticks=4000)
    assert act.state == S.IDLE  # continuous: IDLE, not DONE
    cycles = act.cycles_sent
    for _ in range(50):
        server.tick()
    assert act.cycles_sent == cycles  # no new goals after halt


def test_loader_runs_python_action(loader):
    """python-type registry action: the script leaves `action` behind
    and the loader drives it (≙ execfile python actions)."""
    act = loader.send_action("velocity_trot")
    assert isinstance(act, VelocityTrotAction)
    loader.pump(350)
    assert act.state == S.ACTIVE
    assert act.cycles_sent >= 2
    act.halt()
    assert loader.pump_until(S.IDLE)


def test_loader_combined_yaml_action(loader, server):
    """combined_yaml: two motion scripts concatenated into one goal."""
    act = loader.send_action("standup_then_rotate")
    assert act.state in (S.PENDING, S.ACTIVE)
    n_steps = len(act.goal["steps"])
    # standup (>=1 step) + base_rotate_yaw (>=2 steps) concatenated
    assert n_steps >= 3
    assert loader.pump_until(S.DONE, max_ticks=6000)
    assert act.result.status == msg.RESULT_SUCCEEDED
    assert float(server.state.sim.robot.base.position[2]) > 0.3


def test_loader_launch_type_action(loader):
    """launch-type: external process, DONE on clean exit."""
    act = loader.send_action("external_demo")
    assert act.state == S.ACTIVE
    assert loader.pump_until(S.DONE, max_ticks=4000)
    assert act.proc.returncode == 0


def test_loader_sequence_chains_on_done(loader):
    """send_action_sequence: next action starts from the done callback
    (≙ _load_next_action_in_sequence)."""
    loader.send_action_sequence(["standup", "base_rotate_yaw"])
    first = loader.action
    assert loader.pump_until(S.DONE, max_ticks=12000)
    # by the time everything is DONE, the loader moved to the 2nd action
    if loader.action is first:  # first still running? keep pumping
        loader.pump(4000)
    assert loader.action is not first
    assert loader.action.state == S.DONE
    assert not loader.action_sequence_queue


def test_combined_yaml_placeholders(tmp_path, server):
    """Placeholder values substitute into the combined scripts
    (≙ replace_placeholders, free_gait.py:112-127)."""
    inner = tmp_path / "param_move.yaml"
    inner.write_text(
        textwrap.dedent(
            """
            steps:
              - step:
                  - base_target:
                      target: {position: [0.0, 0.0, TARGET_HEIGHT]}
            """
        )
    )
    combined = tmp_path / "combined.yaml"
    combined.write_text(
        textwrap.dedent(
            f"""
            global_placeholders:
              TARGET_HEIGHT: 0.345
            yaml_actions:
              - action:
                  file_path: {inner.name}
            """
        )
    )
    act = A.CombinedYamlAction(server)
    act.set_goal_from_file(str(combined))
    assert act.state == S.INITIALIZED
    pos = act.goal["steps"][0]["step"][0]["base_target"]["target"]["position"]
    assert pos[2] == 0.345
    act.start()
    assert act.wait_for_state(S.DONE, max_ticks=3000)
    assert abs(float(server.state.sim.robot.base.position[2]) - 0.345) < 0.03


def test_loader_unknown_action_raises(loader):
    with pytest.raises(KeyError):
        loader.send_action("does_not_exist")


def test_registry_discovers_all_types():
    r = default_registry()
    types = {a.id: a.type for a in r.list_actions()}
    assert types["velocity_trot"] == "python"
    assert types["standup_then_rotate"] == "combined_yaml"
    assert types["external_demo"] == "launch"
    assert types["standup"] == "yaml"
    for a in r.list_actions():
        assert os.path.exists(a.file)
