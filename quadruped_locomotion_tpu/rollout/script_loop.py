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

from ..control.contact_fsm import apply_swing_reflexes, contact_fsm
from ..control.locomotion import ControllerParams, locomotion_update
from ..control.swing import joint_pd_gravity_torques
from ..planning import steps as steps_mod
from ..types import RobotModel
from . import simulator as simlib
from .closed_loop import CONTROL_DT, CONTROL_SUBSTEPS, PLANNER_DT


@struct.dataclass
class ScriptState:
    sim: simlib.SimState
    exec: steps_mod.ExecState


def init_script_state(
    model: RobotModel, sched, height: float = 0.4
) -> ScriptState:
    sim = simlib.default_stance_state(model, height=height)
    es = steps_mod.init_exec_state(
        sim.feet_world, sim.robot.base.position, sim.robot.base.quaternion
    )
    return ScriptState(sim=sim, exec=es)


def planner_tick(
    model: RobotModel,
    params: ControllerParams,
    sched: steps_mod.StepSchedule,
    ss: ScriptState,
    qp_iters: int = 15,
):
    es2, out = steps_mod.advance(
        model,
        sched,
        ss.exec,
        ss.sim.feet_world,
        ss.sim.robot.base.position,
        ss.sim.robot.base.quaternion,
        PLANNER_DT,
        q_now=ss.sim.robot.q,
    )
    support = out.support
    pos_w, vel_w, acc_w = out.foot_pos, out.foot_vel, out.foot_acc
    target = out.base
    # swing-phase proxy for the FSM's early/late classification: time
    # since THIS leg's motion began (the step's base-shift phase does not
    # count — measuring from step start would classify lift-off contact
    # as an early touchdown and re-pin the foot).
    swing_phase = jnp.where(
        es2.leg_active,
        jnp.clip(
            es2.time_in_step - es2.leg_start, 0.0, es2.leg_duration
        ),
        jnp.zeros(4, ss.sim.feet_world.dtype),
    )
    t_swing = jnp.maximum(jnp.max(es2.leg_duration), 1e-3)

    def ctrl(sim, _):
        contact = simlib.contact_sensor(sim)
        fsm = contact_fsm(support, contact, swing_phase, t_swing)
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
        tau_joint = joint_pd_gravity_torques(
            model, state, out.q_des, out.qd_des
        )
        tau = jnp.where(
            (out.joint_mode & ~fsm_support)[:, None], tau_joint, tau
        )
        sim2 = simlib.step(model, sim, tau, CONTROL_DT, support=fsm_support)
        return sim2, diag.distribution.qp_solution.kkt_error

    sim_final, kkts = jax.lax.scan(ctrl, ss.sim, None, length=CONTROL_SUBSTEPS)
    return ScriptState(sim=sim_final, exec=es2), jnp.max(kkts)


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
