"""Closed-loop execution of step schedules (scripted actions).

≙ the reference running a YAML action through
FreeGaitActionServer → Executor → RosBalanceController → Gazebo
(SURVEY.md §3.2/§3.4), collapsed into the same two-rate ``lax.scan`` as
the gait loop: each 100 Hz planner tick advances the step executor, then
4 control/physics substeps (400 Hz) run the contact FSM + balance
controller against the plant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..control.contact_fsm import (
    FsmState,
    apply_swing_reflexes,
    fsm_step,
    init_fsm_state,
)
from ..control.locomotion import ControllerParams, locomotion_update
from ..control.swing import joint_pd_gravity_torques, joint_pid_gravity_torques
from ..planning import steps as steps_mod
from ..types import RobotModel
from . import simulator as simlib
from .closed_loop import CONTROL_DT, CONTROL_SUBSTEPS, PLANNER_DT

# Normalizer for the post-touchdown stance phase of scripted footsteps
# (the FSM thresholds are defined on the gait's normalized stance phase;
# scripts have no stance timer, so we use the reference trot stance time,
# action_server_test.cpp:183).
SCRIPT_STANCE_NORM = 0.45


@struct.dataclass
class ScriptState:
    sim: simlib.SimState
    exec: steps_mod.ExecState
    fsm: FsmState
    joint_i: jax.Array  # (4,3) joint-PID integral state


def init_script_state(
    model: RobotModel, sched, height: float = 0.4
) -> ScriptState:
    sim = simlib.default_stance_state(model, height=height)
    es = steps_mod.init_exec_state(
        sim.feet_world, sim.robot.base.position, sim.robot.base.quaternion
    )
    return ScriptState(
        sim=sim,
        exec=es,
        fsm=init_fsm_state(sim.feet_world.dtype),
        joint_i=jnp.zeros((4, 3), sim.feet_world.dtype),
    )


def planner_tick(
    model: RobotModel,
    params: ControllerParams,
    sched: steps_mod.StepSchedule,
    ss: ScriptState,
    qp_iters: int = 15,
    active_steps=None,
    dt=PLANNER_DT,
):
    """One planner tick + control substeps.

    ``active_steps``/``dt`` are dynamic (see ``steps.advance``): the
    action-server runtime drives this with a capacity-padded schedule,
    a live row count, and ``dt=0`` pause ticks, all under one jit.
    """
    es2, out = steps_mod.advance(
        model,
        sched,
        ss.exec,
        ss.sim.feet_world,
        ss.sim.robot.base.position,
        ss.sim.robot.base.quaternion,
        dt,
        q_now=ss.sim.robot.q,
        active_steps=active_steps,
    )
    support = out.support
    pos_w, vel_w, acc_w = out.foot_pos, out.foot_vel, out.foot_acc
    target = out.base
    dtype = ss.sim.feet_world.dtype
    # Normalized swing phase for the FSM: time since THIS leg's motion
    # began (the step's base-shift phase does not count — measuring from
    # step start would classify lift-off contact as an early touchdown
    # and re-pin the foot), over the leg's own motion duration.
    tl = es2.time_in_step - es2.leg_start
    leg_dur = jnp.maximum(es2.leg_duration, 1e-3)
    sw_norm = jnp.where(
        es2.leg_active,
        jnp.clip(tl / leg_dur, 0.0, 1.0),
        jnp.zeros(4, dtype),
    )
    # Normalized stance phase: the executor's cross-step stance clock
    # (time continuously in desired support) over the reference trot
    # stance time — a leg that just finished its swing starts at 0 and
    # engages the late-TD drive-down until contact.
    st_norm = jnp.clip(es2.leg_stance_time / SCRIPT_STANCE_NORM, 0.0, 1.0)
    # ≙ is_footstep_: only footstep legs engage the reflex machinery
    # (ros_balance_controller.cpp:1101-1102, 1121-1125). STICKY across
    # steps like the reference's leg-mode channel (the publisher only
    # overwrites the mode when the current step has a motion for the
    # leg, StateRosPublisher.cpp:355-381).
    is_footstep = es2.leg_last_motion == steps_mod.LEG_FOOTSTEP

    def ctrl(carry, _):
        sim, fsm_state, joint_i = carry
        contact = simlib.contact_sensor(sim)
        fsm_state2, fsm = fsm_step(
            fsm_state, support, contact, sw_norm, st_norm, sim.robot.q,
            is_footstep=is_footstep,
        )
        # joint-mode legs bypass the contact FSM (they are under open
        # joint-space control, ros_balance_controller.cpp:560-603)
        fsm_support = jnp.where(out.joint_mode, support, fsm.support)
        pos_r, vel_r, acc_r = apply_swing_reflexes(
            pos_w, vel_w, acc_w, sim.feet_world, fsm
        )
        state = sim.robot.replace(
            support=fsm_support, surface_normal=out.surface_normal
        )
        tau, diag = locomotion_update(
            model, params, state, target, pos_r, vel_r, acc_r,
            qp_iters=qp_iters,
        )
        # Joint-mode legs: full PID (+gravity comp) with the reference
        # gains 300/0.01/3; the integral resets whenever the leg is not
        # in joint mode.
        joint_active = out.joint_mode & ~fsm_support
        tau_joint, joint_i2 = joint_pid_gravity_torques(
            model, state, out.q_des, out.qd_des, joint_i, CONTROL_DT
        )
        joint_i2 = jnp.where(joint_active[:, None], joint_i2, 0.0)
        tau = jnp.where(joint_active[:, None], tau_joint, tau)
        # Lost-contact freeze reflex (:341-358).
        tau_freeze = joint_pd_gravity_torques(
            model, state, fsm.q_freeze, jnp.zeros_like(fsm.q_freeze)
        )
        tau = jnp.where(fsm.freeze[:, None], tau_freeze, tau)
        sim2 = simlib.step(model, sim, tau, CONTROL_DT, support=fsm_support)
        return (
            (sim2, fsm_state2, joint_i2),
            diag.distribution.qp_solution.kkt_error,
        )

    (sim_final, fsm_final, joint_i_final), kkts = jax.lax.scan(
        ctrl, (ss.sim, ss.fsm, ss.joint_i), None, length=CONTROL_SUBSTEPS
    )
    return (
        ScriptState(
            sim=sim_final, exec=es2, fsm=fsm_final, joint_i=joint_i_final
        ),
        jnp.max(kkts),
    )


def run_schedule(
    model: RobotModel,
    params: ControllerParams,
    sched: steps_mod.StepSchedule,
    ss0: ScriptState,
    planner_steps: int,
    qp_iters: int = 15,
):
    """Roll the schedule to completion (or ``planner_steps`` ticks)."""

    def tick(ss, _):
        ss2, kkt = planner_tick(model, params, sched, ss, qp_iters=qp_iters)
        telemetry = {
            "base_position": ss2.sim.robot.base.position,
            "base_quaternion": ss2.sim.robot.base.quaternion,
            "feet_world": ss2.sim.feet_world,
            "joint_positions": ss2.sim.robot.q,
            "step_index": ss2.exec.step_index,
            "done": ss2.exec.done,
            "qp_kkt": kkt,
        }
        return ss2, telemetry

    return jax.lax.scan(tick, ss0, None, length=planner_steps)
