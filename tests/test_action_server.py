"""Execution-control runtime: goals mid-run, 3 preempt modes, stop/pause,
trailing-BaseAuto replacement, live feedback and results
(≙ FreeGaitActionServer.cpp:93-187, Executor.cpp:134-159,
action_server_test.cpp:76-84)."""

import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_locomotion_tpu.api import messages as msg
from quadruped_locomotion_tpu.runtime.action_server import (
    FreeGaitActionServer,
)
from quadruped_locomotion_tpu.types import RobotModel

MODEL = RobotModel.simpledog()


def _footstep_goal(n_steps=2, preempt=msg.PREEMPT_STEP, dx=0.06):
    """n_steps alternating LF/RF forward footsteps, each with base_auto."""
    steps = []
    legs = ["LF_LEG", "RF_LEG"]
    x0 = {"LF_LEG": 0.42, "RF_LEG": 0.42}
    y = {"LF_LEG": 0.25, "RF_LEG": -0.25}
    for i in range(n_steps):
        leg = legs[i % 2]
        x0[leg] += dx
        steps.append(
            msg.StepMsg(
                footsteps=[
                    msg.FootstepMsg(
                        name=leg, target=(x0[leg], y[leg], 0.0)
                    )
                ],
                base_auto=msg.BaseAutoMsg(height=0.4),
            )
        )
    return msg.ExecuteStepsGoal(
        steps=steps, preempt=preempt, source_frame="foot_print"
    )


def _base_auto_goal(height=0.4, preempt=msg.PREEMPT_STEP):
    return msg.ExecuteStepsGoal(
        steps=[msg.StepMsg(base_auto=msg.BaseAutoMsg(height=height))],
        preempt=preempt,
        source_frame="foot_print",
    )


@pytest.fixture(scope="module")
def server_factory():
    def make(**kw):
        return FreeGaitActionServer(MODEL, capacity=12, **kw)

    return make


def test_goal_executes_to_success_with_feedback(server_factory):
    srv = server_factory()
    feedbacks, results = [], []
    gid = srv.submit_goal(
        _footstep_goal(2),
        feedback_cb=feedbacks.append,
        result_cb=results.append,
    )
    srv.run_until_done(3000)
    assert bool(srv.state.exec.done)
    assert len(results) == 1
    assert results[0].status == msg.RESULT_SUCCEEDED
    assert results[0].goal_id == gid
    # feedback stream followed both steps with sane phases/branches
    assert feedbacks, "no feedback emitted"
    nums = {f.step_number for f in feedbacks}
    assert nums == {1, 2}
    assert all(0.0 <= f.phase <= 1.0 for f in feedbacks)
    assert all(f.number_of_steps_in_goal == 2 for f in feedbacks)
    f0 = feedbacks[len(feedbacks) // 4]
    assert "base" in f0.active_branches
    assert any(b.endswith("_LEG") for b in f0.active_branches)
    assert all(f.status == msg.PROGRESS_EXECUTING for f in feedbacks)
    # the robot actually stepped: LF moved forward
    assert float(srv.state.sim.feet_world[0, 0]) > 0.44


def test_mid_run_goal_append_and_second_result(server_factory):
    srv = server_factory()
    results = []
    srv.submit_goal(_footstep_goal(2), result_cb=results.append)
    srv.run(60)  # mid-execution of goal 1
    assert not bool(srv.state.exec.done)
    srv.submit_goal(
        _footstep_goal(1, dx=0.05), result_cb=results.append
    )
    srv.run_until_done(4000)
    assert len(results) == 2
    assert all(r.status == msg.RESULT_SUCCEEDED for r in results)


def test_trailing_base_auto_replacement(server_factory):
    """A queued FINAL pure-BaseAuto step is replaced by the incoming goal
    (FreeGaitActionServer.cpp:110-117)."""
    srv = server_factory()
    goal1 = _footstep_goal(2)
    goal1.steps.append(msg.StepMsg(base_auto=msg.BaseAutoMsg(height=0.4)))
    srv.submit_goal(goal1)
    srv.run(20)  # still inside step 0
    assert srv._active == 3
    srv.submit_goal(_footstep_goal(1, dx=0.05))
    # trailing base-auto row was dropped before appending the new step
    assert srv._active == 3
    lm = np.asarray(srv._sched.leg_motion_type[:3])
    assert (lm[2] != 0).any()  # last live row has a leg motion


def test_stop_preempt_step_finishes_current_then_stops(server_factory):
    srv = server_factory()
    results = []
    srv.submit_goal(
        _footstep_goal(3, preempt=msg.PREEMPT_STEP),
        result_cb=results.append,
    )
    # advance until step 0's LF swing is airborne but unfinished
    for _ in range(300):
        if (
            srv.current_row == 0
            and float(srv.state.sim.feet_world[0, 2]) > 0.02
        ):
            break
        srv.tick()
    row = srv.current_row
    assert row == 0
    lf_before = float(srv.state.sim.feet_world[0, 0])
    srv.stop()
    srv.run_until_done(3000)
    # exactly the active step ran to completion; the rest was dropped
    assert srv.current_row == row
    assert results and results[0].status == msg.RESULT_PREEMPTED
    # current footstep COMPLETED after stop: LF reached its target
    assert float(srv.state.sim.feet_world[0, 0]) > max(lf_before, 0.44)
    # RF never stepped (step 2 dropped)
    assert abs(float(srv.state.sim.feet_world[1, 0]) - 0.42) < 0.03


def test_stop_preempt_immediate_kills_current_step(server_factory):
    srv = server_factory()
    results = []
    srv.submit_goal(
        _footstep_goal(2, preempt=msg.PREEMPT_IMMEDIATE),
        result_cb=results.append,
    )
    srv.run(60)
    assert not bool(srv.state.exec.done)
    srv.stop()
    srv.tick()
    assert bool(srv.state.exec.done)
    assert results and results[0].status == msg.RESULT_PREEMPTED
    # the robot must stay healthy after the cut (held state + FSM
    # reflexes recover the mid-swing leg)
    for _ in range(200):
        srv.tick()
    base = np.asarray(srv.state.sim.robot.base.position)
    assert np.isfinite(base).all()
    assert base[2] > 0.3


def test_stop_preempt_no_is_ignored(server_factory):
    srv = server_factory()
    srv.submit_goal(_footstep_goal(2, preempt=msg.PREEMPT_NO))
    srv.run(60)
    active_before = srv._active
    srv.stop()
    assert srv._active == active_before
    srv.run_until_done(3000)
    assert bool(srv.state.exec.done)


def test_pause_freezes_executor_but_keeps_balancing(server_factory):
    srv = server_factory()
    srv.submit_goal(_footstep_goal(2))
    srv.run(60)
    t0 = float(srv.state.exec.time_in_step)
    idx0 = srv.current_row
    srv.pause(True)
    for _ in range(100):
        fb = srv.tick()
    assert fb.status == msg.PROGRESS_PAUSED
    # executor clock frozen, no step switches
    assert float(srv.state.exec.time_in_step) == pytest.approx(t0)
    assert srv.current_row == idx0
    # the controller kept running: robot still upright and healthy
    base = np.asarray(srv.state.sim.robot.base.position)
    assert np.isfinite(base).all() and base[2] > 0.3
    srv.pause(False)
    srv.run_until_done(3000)
    assert bool(srv.state.exec.done)
    assert float(srv.state.sim.feet_world[0, 0]) > 0.44


def test_goal_after_done_rearms_executor(server_factory):
    srv = server_factory()
    srv.submit_goal(_base_auto_goal(0.38))
    srv.run_until_done(2000)
    assert bool(srv.state.exec.done)
    results = []
    srv.submit_goal(_base_auto_goal(0.42), result_cb=results.append)
    assert not bool(srv.state.exec.done)
    srv.run_until_done(2000)
    assert results and results[0].status == msg.RESULT_SUCCEEDED
    assert float(srv.state.sim.robot.base.position[2]) > 0.4


def test_queue_compaction_past_capacity(server_factory):
    """Submitting past the buffer drops fully-executed rows, preserving
    live execution (the deque never recompiles the executor)."""
    srv = server_factory()
    srv.submit_goal(_footstep_goal(2, dx=0.03))
    srv.run_until_done(3000)
    for _ in range(5):
        srv.submit_goal(_base_auto_goal(0.4))
        srv.run_until_done(2000)
    # 7 goals through a capacity-12 buffer
    assert bool(srv.state.exec.done)
    assert all(g.done for g in srv._goals)
    base = np.asarray(srv.state.sim.robot.base.position)
    assert np.isfinite(base).all() and base[2] > 0.3


def test_set_limb_configure_service(server_factory):
    """≙ SetLimbConfigure.srv → QuadrupedState::setLimbConfigure
    (quadruped_state.cpp:369-399): flips the live IK branches; bad
    strings report failure."""
    from quadruped_locomotion_tpu.types import IK_BRANCH

    srv = server_factory()
    assert srv.set_limb_configure(">>")
    assert np.array_equal(
        np.asarray(srv.model.ik_branch),
        [IK_BRANCH["OUT_LEFT"], IK_BRANCH["IN_LEFT"],
         IK_BRANCH["IN_LEFT"], IK_BRANCH["OUT_LEFT"]],
    )
    assert not srv.set_limb_configure("??")
    # back to the default and the executor still runs
    assert srv.set_limb_configure("><")
    srv.submit_goal(_base_auto_goal())
    srv.run_until_done(max_ticks=400)
    assert bool(srv.state.exec.done)


def test_send_action_service(server_factory):
    """≙ SendAction.srv: a registry action id compiles against the live
    state and executes to success."""
    results = []
    srv = server_factory()
    gid = srv.send_action(
        "base_rotate_yaw", result_cb=lambda r: results.append(r)
    )
    srv.run_until_done(max_ticks=2000)
    assert bool(srv.state.exec.done)
    res = srv.result_of(gid)
    assert res is not None and res.status == msg.RESULT_SUCCEEDED
    assert results and results[0].status == msg.RESULT_SUCCEEDED


def test_send_action_sequence_service(server_factory):
    """≙ SendActionSequence.srv: a sequence collection queues each action
    as its own goal; all succeed in order."""
    srv = server_factory()
    gids = srv.send_action_sequence("sit_stand")
    assert len(gids) == 2
    srv.run_until_done(max_ticks=4000)
    for gid in gids:
        res = srv.result_of(gid)
        assert res is not None and res.status == msg.RESULT_SUCCEEDED, gid


def test_single_footstep_marker_flow(server_factory):
    """≙ free_gait_marker's one-footstep goal (MarkerManager.cpp:87-200,
    260-300): a single dragged-foothold target becomes a one-step
    ExecuteSteps goal (footstep + base_auto) and executes to success,
    with the foot landing on the marker position."""
    srv = server_factory()
    target = (0.50, 0.21, 0.0)  # dragged LF marker, world frame
    goal = msg.ExecuteStepsGoal(
        steps=[
            msg.StepMsg(
                footsteps=[msg.FootstepMsg(name="LF_LEG", target=target)],
                base_auto=msg.BaseAutoMsg(height=0.4),
            )
        ],
    )
    gid = srv.submit_goal(goal)
    srv.run_until_done(max_ticks=1500)
    res = srv.result_of(gid)
    assert res is not None and res.status == msg.RESULT_SUCCEEDED
    foot = np.asarray(srv.state.sim.feet_world[0])
    assert np.linalg.norm(foot[:2] - np.asarray(target[:2])) < 0.03, foot
    assert abs(foot[2]) < 0.01
