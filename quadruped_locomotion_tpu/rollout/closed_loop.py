"""Closed-loop locomotion rollout: gait → control → physics in one scan.

This is the TPU-native equivalent of the reference's whole process graph
(SURVEY.md §3): the 100 Hz planner/gait threads
(``action_server_test.cpp:100-203``) and the 400 Hz balance controller
(``ros_balance_controller.cpp``) against Gazebo — collapsed into a
two-rate ``lax.scan``: each planner tick (dt=0.01) runs the gait engine
once and then ``CONTROL_SUBSTEPS`` control+physics steps (dt=0.0025,
400 Hz), exactly mirroring how the reference controller consumes the
latest ``/desired_robot_state`` between planner updates.

Batch over scenarios with ``jax.vmap``; shard the batch with
``parallel.mesh``.
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
from ..control.force_distribution import solve_formed_qp_batched
from ..control.locomotion import (
    ControllerParams,
    locomotion_finish,
    locomotion_prepare,
)
from ..control.swing import joint_pd_gravity_torques
from ..ops import qp as qp_ops
from ..gait import gait_generator as gg
from ..gait.phase import GaitParams
from ..model.kinematics import foot_velocities, forward_kinematics
from ..types import RobotModel
from ..utils.rotations import quat_rotate
from . import articulated as artlib
from . import simulator as simlib

PLANNER_DT = 0.01  # 100 Hz (action_server_test.cpp:103-106, 124)
CONTROL_SUBSTEPS = 4  # → 400 Hz control/physics (balance_controller_manager)
CONTROL_DT = PLANNER_DT / CONTROL_SUBSTEPS

# Plant selection (trace-time static). "articulated" is the default: the
# fully-coupled 18-DoF floating-base dynamics with leg inertia acting on
# the trunk — the Gazebo-parity physics the reference tunes against.
# "massless" is the decoupled trunk+swing-leg abstraction: ~3× cheaper,
# kept for throughput-critical sweeps and A/B comparisons. "none" skips
# physics entirely — the controller-only path for latency measurement
# against the reference's 2.5 ms CONTROLLER budget (its Gazebo/EtherCAT
# plant runs in a separate process outside that budget,
# balance_controller_manager.cpp:66-95).
def _no_plant_step(model, sim, tau, dt, **kw):
    """Controller-only "plant": state is (epsilon-)frozen. The 1e-9·tanh
    perturbation ties the next state to this tick's torques so XLA
    cannot hoist the (state-dependent) controller work out of the timing
    scan — it is physically invisible (< nm) but defeats loop-invariant
    code motion."""
    base = sim.robot.base
    eps = 1e-9 * jnp.tanh(jnp.mean(tau))
    return sim.replace(
        robot=sim.robot.replace(
            base=base.replace(position=base.position + eps)
        )
    )


PLANTS = {
    "articulated": artlib.step,
    "massless": simlib.step,
    "none": _no_plant_step,
}


def measured_foot_speed_tangential(model, robot) -> jax.Array:
    """(4,) world-frame tangential foot speeds from *measured* kinematics
    (encoders + base state) — the quantity a slip detector on the real
    robot computes; feeds the FSM's ``STANCE_SLIPPING`` detection
    (≙ StateSwitcher.hpp:55, detect-only in the reference)."""
    v_rel_b = foot_velocities(model, robot.q, robot.qd)
    r_b = forward_kinematics(model, robot.q)
    w = robot.base.angular_velocity
    v_w = robot.base.linear_velocity + quat_rotate(
        robot.base.quaternion[None], jnp.cross(w[None, :], r_b) + v_rel_b
    )
    return jnp.linalg.norm(v_w[:, :2], axis=1)


@struct.dataclass
class LocomotionState:
    sim: simlib.SimState
    gait: gg.GaitState
    fsm: FsmState


@struct.dataclass
class Command:
    """≙ /cmd_vel (gait_generate_client.cpp:195-205)."""

    linear_velocity: jax.Array  # (3,) world/footprint frame
    yaw_rate: jax.Array  # scalar

    @classmethod
    def zero(cls, dtype=jnp.float32):
        return cls(
            linear_velocity=jnp.zeros(3, dtype),
            yaw_rate=jnp.asarray(0.0, dtype),
        )


def init_locomotion(
    model: RobotModel,
    gait_params: GaitParams,
    gait_type: int = 0,
    height: float | None = None,
) -> LocomotionState:
    h = gait_params.height if height is None else height
    sim = simlib.default_stance_state(model, height=h)
    gait = gg.init_gait_state(gait_type, gait_params, sim.feet_world)
    return LocomotionState(
        sim=sim, gait=gait, fsm=init_fsm_state(sim.feet_world.dtype)
    )


def planner_tick(
    model: RobotModel,
    params: ControllerParams,
    gait_params: GaitParams,
    ls: LocomotionState,
    command: Command,
    qp_iters: int = 15,
    terrain=None,
    telemetry_fn=None,
    plant: str = "articulated",
    friction_mu: float | None = None,
    batched: bool = False,
    qp_backend: str = "xla",
    gait_params_batched: bool = False,
    terrain_batched: bool = False,
):
    """One 100 Hz planner tick + 4 control/physics substeps.

    ``telemetry_fn(state, tau, diag, ctx) -> pytree`` (optional,
    trace-time static) collects per-control-substep extras — e.g. the
    golden-trace tests record the controller state + the EXACT QP data
    (``ctx`` is the :class:`~..control.locomotion.LocomotionContext`,
    carrying A/b/S/W/D/d as solved in-loop) of every 400 Hz tick to
    re-solve offline against a float64 oracle on identical data.

    ``batched=True`` (trace-time static) runs the SAME tick over a
    leading scenario axis on every input — but instead of vmapping the
    whole tick (which would vmap the QP solver per scenario), the
    per-scenario stages are vmapped around ONE batched QP dispatch per
    control substep (:func:`solve_fd_qp_batched`), so ``qp_backend=
    "pallas"``/"auto" sends the entire batch to the lane-tiled TPU
    kernel in a single call — the QP inside the hot loop, matching the
    role of ``ContactForceDistribution.cpp:490``.

    ``gait_params_batched``/``terrain_batched`` (trace-time static,
    require ``batched=True``): the scenario axis may also vary the GAIT
    (``gait_params`` leaves carry a leading batch axis — e.g. a
    trot/pace mix, see :func:`init_locomotion_mixed`) and the TERRAIN
    (``terrain`` is a :class:`~..terrain.heightfield.Heightfield` whose
    leaves carry a leading batch axis — one map per scenario). This is
    the BASELINE config-5 scenario surface: terrain × gait × velocity.
    """
    gp_ax = 0 if gait_params_batched else None
    tr_ax = 0 if (terrain is not None and terrain_batched) else None

    def _adv(gait, robot, feet, lin, yaw, gp, tr):
        return gg.advance(
            model, gait, robot, feet, gp, lin, yaw, PLANNER_DT, terrain=tr
        )

    if batched:
        adv = jax.vmap(_adv, in_axes=(0, 0, 0, 0, 0, gp_ax, tr_ax))
    else:
        adv = _adv
    gait2, support, (pos_w, vel_w, acc_w), target, normals = adv(
        ls.gait,
        ls.sim.robot,
        ls.sim.feet_world,
        command.linear_velocity,
        command.yaw_rate,
        gait_params,
        terrain,
    )

    # Normalized gait phases for the FSM thresholds (the reference's
    # sw_phase/st_phase ∈ [0,1] from the gait client, :1103-1132).
    t_sw = jnp.asarray(gait_params.t_swing)
    t_st = jnp.asarray(gait_params.t_stance)
    if batched and gait_params_batched:
        t_sw, t_st = t_sw[:, None], t_st[:, None]
    sw_norm = gait2.phase.swing_phase / jnp.maximum(t_sw, 1e-6)
    st_norm = gait2.phase.stance_phase / jnp.maximum(t_st, 1e-6)

    def pre_qp(sim, fsm_state, support, sw_norm, st_norm, pos_w, vel_w,
               acc_w, target, normals, tr):
        # Per-leg contact FSM with memory: reconcile the gait's desired
        # support with measured contact every control tick (≙
        # ros_balance_controller :233-380, :1086-1140), then apply
        # late-TD / bump / freeze reflexes.
        if terrain is None:
            gz = jnp.zeros(4, sim.feet_world.dtype)
        else:
            gz = jax.vmap(tr.height_at)(sim.feet_world[:, :2])
        contact = simlib.contact_sensor(sim, ground_height=gz)
        fsm_state2, fsm = fsm_step(
            fsm_state, support, contact, sw_norm, st_norm, sim.robot.q,
            foot_speed_tangential=measured_foot_speed_tangential(
                model, sim.robot
            ),
        )
        pos_r, vel_r, acc_r = apply_swing_reflexes(
            pos_w, vel_w, acc_w, sim.feet_world, fsm, ground_height=gz
        )
        state = sim.robot.replace(
            support=fsm.support, surface_normal=normals
        )
        ctx = locomotion_prepare(
            model, params, state, target, pos_r, vel_r, acc_r
        )
        return fsm_state2, fsm, state, ctx, gz

    def post_qp(sim, state, fsm, ctx, sol, gz):
        tau, diag = locomotion_finish(model, params, state, ctx, sol)
        # Lost-contact freeze reflex (:341-358): hold the joint posture
        # stored at loss instead of tracking a swing reference.
        tau_freeze = joint_pd_gravity_torques(
            model, state, fsm.q_freeze, jnp.zeros_like(fsm.q_freeze)
        )
        tau = jnp.where(fsm.freeze[:, None], tau_freeze, tau)
        plant_kwargs = (
            {"friction_mu": friction_mu}
            if friction_mu is not None and plant == "articulated"
            else {}
        )
        sim2 = PLANTS[plant](
            model, sim, tau, CONTROL_DT, support=fsm.support,
            ground_height=gz, **plant_kwargs,
        )
        extras = (
            ()
            if telemetry_fn is None
            else telemetry_fn(state, tau, diag, ctx)
        )
        return sim2, diag.distribution.qp_solution.kkt_error, extras

    if batched:
        pre = jax.vmap(pre_qp, in_axes=(0,) * 10 + (tr_ax,))
        vv = jax.vmap
    else:
        pre = pre_qp
        vv = lambda f: f

    def ctrl(carry, _):
        sim, fsm_state = carry
        fsm_state2, fsm, state, ctx, gz = pre(
            sim, fsm_state, support, sw_norm, st_norm,
            pos_w, vel_w, acc_w, target, normals, terrain,
        )
        if batched:
            sol = solve_formed_qp_batched(
                ctx.G, ctx.g, ctx.D, ctx.d,
                iters=qp_iters, backend=qp_backend,
            )
        else:
            sol = qp_ops.solve_qp(
                ctx.G, ctx.g, ctx.D, ctx.d, iters=qp_iters
            )
        sim2, kkt, extras = vv(post_qp)(sim, state, fsm, ctx, sol, gz)
        return (sim2, fsm_state2), (kkt, extras)

    (sim_final, fsm_final), (kkts, extras) = jax.lax.scan(
        ctrl, (ls.sim, ls.fsm), None, length=CONTROL_SUBSTEPS
    )
    out = LocomotionState(sim=sim_final, gait=gait2, fsm=fsm_final)
    # kkts: (substeps,) or (substeps, B) — reduce over substeps only.
    kkt_out = jnp.max(kkts, axis=0)
    if telemetry_fn is None:
        return out, kkt_out
    return out, (kkt_out, extras)


def init_locomotion_mixed(
    model: RobotModel,
    gait_params: GaitParams,  # leaves with leading (B,) scenario axis
    gait_type: jax.Array,  # (B,) int32 — phase.TROT / phase.PACE
    height: float | None = None,
) -> LocomotionState:
    """Per-scenario gait init for mixed-gait scenario batches (BASELINE
    config 5): each scenario gets its own :class:`GaitParams` (e.g. a
    trot/pace timing mix) and its own init table, where-selected so the
    whole batch stays one fixed-shape pytree."""
    from ..gait import phase as phase_mod

    gait_type = jnp.asarray(gait_type, jnp.int32)

    def one(gp, gt):
        h = gp.height if height is None else height
        sim = simlib.default_stance_state(model, height=h)
        gs_trot = gg.init_gait_state(phase_mod.TROT, gp, sim.feet_world)
        gs_pace = gg.init_gait_state(phase_mod.PACE, gp, sim.feet_world)
        gait = jax.tree_util.tree_map(
            lambda a, b: jnp.where(gt == phase_mod.PACE, b, a),
            gs_trot,
            gs_pace,
        )
        return LocomotionState(
            sim=sim, gait=gait, fsm=init_fsm_state(sim.feet_world.dtype)
        )

    return jax.vmap(one)(gait_params, gait_type)


def rollout(
    model: RobotModel,
    params: ControllerParams,
    gait_params: GaitParams,
    ls0: LocomotionState,
    command: Command,
    planner_steps: int,
    qp_iters: int = 15,
    terrain=None,
    telemetry_fn=None,
    plant: str = "articulated",
    friction_mu: float | None = None,
    batched: bool = False,
    qp_backend: str = "xla",
    gait_params_batched: bool = False,
    terrain_batched: bool = False,
):
    """Full closed-loop rollout. Returns (final state, per-tick telemetry).

    ``batched=True``: every input carries a leading scenario axis and
    each control substep dispatches ONE batched QP solve (see
    :func:`planner_tick`); telemetry leaves are then (T, B, ...).
    ``gait_params_batched``/``terrain_batched`` extend the scenario axis
    to per-scenario gaits and heightfields (see :func:`planner_tick`).
    """

    def tick(ls, _):
        ls2, tick_out = planner_tick(
            model, params, gait_params, ls, command, qp_iters=qp_iters,
            terrain=terrain, telemetry_fn=telemetry_fn, plant=plant,
            friction_mu=friction_mu, batched=batched, qp_backend=qp_backend,
            gait_params_batched=gait_params_batched,
            terrain_batched=terrain_batched,
        )
        kkt = tick_out if telemetry_fn is None else tick_out[0]
        telemetry = {
            "base_position": ls2.sim.robot.base.position,
            "base_quaternion": ls2.sim.robot.base.quaternion,
            "base_velocity": ls2.sim.robot.base.linear_velocity,
            "feet_world": ls2.sim.feet_world,
            "support": ls2.gait.phase.support,
            "leg_state": ls2.fsm.leg_state,
            "qp_kkt": kkt,
        }
        if telemetry_fn is not None:
            telemetry["extras"] = tick_out[1]
        return ls2, telemetry

    return jax.lax.scan(tick, ls0, None, length=planner_steps)
