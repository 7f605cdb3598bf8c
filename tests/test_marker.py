"""Headless interactive marker editing (≙ free_gait_marker).

The reference lets an operator drag foothold markers and trajectory
knots in RViz and send the edited step to the running controller
(``MarkerManager.cpp:87-200`` menu-send, ``:260-300`` knot markers).
These tests drive the headless equivalent: place/nudge markers on a
live action server, send mid-run, and check the executed foothold is
the EDITED one.
"""

import numpy as np
import pytest

from quadruped_locomotion_tpu.api import messages as msg
from quadruped_locomotion_tpu.api.marker import MarkerSession, repl
from quadruped_locomotion_tpu.runtime.action_server import (
    FreeGaitActionServer,
)
from quadruped_locomotion_tpu.types import RobotModel

MODEL = RobotModel.simpledog()


@pytest.fixture()
def server():
    return FreeGaitActionServer(MODEL, capacity=16)


def test_markers_initialize_at_live_feet(server):
    sess = MarkerSession(server)
    feet = np.asarray(server.state.sim.feet_world)
    for i, name in enumerate(msg.LEG_NAMES):
        np.testing.assert_allclose(sess.footholds[name], feet[i])


def test_drag_and_send_executes_edited_foothold(server):
    """Drag LF to a new target, send, execute: the foot lands on the
    edited marker (≙ the one-footstep menu-send flow)."""
    sess = MarkerSession(server, height=0.4)
    sess.set_foothold("LF", (0.50, 0.21, 0.0))
    gid = sess.send_foothold("LF")
    server.run_until_done(max_ticks=1500)
    res = server.result_of(gid)
    assert res is not None and res.status == msg.RESULT_SUCCEEDED
    foot = np.asarray(server.state.sim.feet_world[0])
    assert np.linalg.norm(foot[:2] - np.array([0.50, 0.21])) < 0.03, foot


def test_mid_run_edit_and_resend_moves_planned_foothold(server):
    """The marker capability that matters: while a sent step is STILL
    EXECUTING, nudge another leg's marker and re-send — the second goal
    queues behind the first mid-run and the executed foothold is the
    nudged one."""
    sess = MarkerSession(server, height=0.4)
    sess.set_foothold("LF", (0.48, 0.22, 0.0))
    gid1 = sess.send_foothold("LF")
    server.run(30)  # mid-execution of goal 1
    assert server.result_of(gid1) is None  # still running

    # operator drags the RF marker twice while the robot is moving
    sess.set_foothold("RF", (0.46, -0.24, 0.0))
    sess.nudge("RF", (0.02, 0.0, 0.0))
    gid2 = sess.send_foothold("RF")
    server.run_until_done(max_ticks=4000)

    for gid in (gid1, gid2):
        res = server.result_of(gid)
        assert res is not None and res.status == msg.RESULT_SUCCEEDED, gid
    rf = np.asarray(server.state.sim.feet_world[1])
    assert np.linalg.norm(rf[:2] - np.array([0.48, -0.24])) < 0.03, rf


def test_knot_trajectory_send(server):
    """Knot markers → EndEffectorTrajectory goal (≙ :260-300)."""
    sess = MarkerSession(server, height=0.4)
    lf0 = sess.footholds["LF_LEG"].copy()
    sess.add_knot("LF", 0.3, lf0 + [0.02, 0.0, 0.06])
    sess.add_knot("LF", 0.6, lf0 + [0.05, 0.01, 0.08])
    sess.add_knot("LF", 0.9, lf0 + [0.07, 0.02, 0.0])
    # drag the middle knot after placing it
    sess.set_knot("LF", 1, lf0 + [0.05, -0.01, 0.09])
    gid = sess.send_trajectory("LF")
    server.run_until_done(max_ticks=2000)
    res = server.result_of(gid)
    assert res is not None and res.status == msg.RESULT_SUCCEEDED
    foot = np.asarray(server.state.sim.feet_world[0])
    np.testing.assert_allclose(
        foot[:2], (lf0 + [0.07, 0.02, 0.0])[:2], atol=0.03
    )


def test_repl_drives_full_flow(server):
    """The cli-edit command language end to end."""
    sess = MarkerSession(server, height=0.4)
    out = []
    repl(
        sess,
        [
            "show",
            "foot LF 0.50 0.21",
            "send LF",
            "tick 40",
            "nudge RF 0.04 0.0",
            "send RF",
            "wait",
            "show",
            "quit",
        ],
        out=out.append,
    )
    assert any("goal" in o for o in out)
    assert any("queue drained" in o for o in out)
    for gid in sess.sent_goals:
        res = server.result_of(gid)
        assert res is not None and res.status == msg.RESULT_SUCCEEDED
    lf = np.asarray(server.state.sim.feet_world[0])
    assert np.linalg.norm(lf[:2] - np.array([0.50, 0.21])) < 0.03


def test_repl_rejects_garbage_without_crashing(server):
    sess = MarkerSession(server)
    out = []
    repl(
        sess,
        ["bogus", "foot XX 1 2", "setknot LF 3 0 0 0", "# comment", ""],
        out=out.append,
    )
    assert sum(o.startswith(("!", "?")) for o in out) == 3
