"""Full locomotion controller tick: stance QP + swing computed-torque.

The functional equivalent of ``RosBalanceController::update``
(``ros_balance_controller.cpp:198-718``) merged with the planner's
per-leg mode outputs: stance legs get VMC + force-distribution torques,
swing legs get task-space computed-torque control, all clamped to
±300 N·m (:451-454, :472-603).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..types import (
    BaseTarget,
    CfdParams,
    RobotModel,
    RobotState,
    SwingGains,
    VmcGains,
)
from ..model.kinematics import forward_kinematics
from ..ops import qp
from ..utils.rotations import quat_inv_rotate, quat_rotate
from .balance_controller import BalanceDiagnostics
from .force_distribution import (
    ForceDistributionResult,
    build_qp,
    stance_torques,
)
from .swing import swing_torques
from .vmc import compute_virtual_wrench


class ControllerParams(NamedTuple):
    vmc: VmcGains
    cfd: CfdParams
    swing: SwingGains

    @classmethod
    def defaults(cls):
        return cls(
            vmc=VmcGains.gazebo_defaults(),
            cfd=CfdParams.defaults(),
            swing=SwingGains.defaults(),
        )


class LocomotionContext(NamedTuple):
    """Everything a control tick computes BEFORE the force-distribution
    QP solve. Splitting the tick at the solver boundary lets a batched
    rollout assemble every scenario's QP (vmapped :func:`locomotion_prepare`)
    and dispatch ONE batched solve (the Pallas kernel's layout) instead
    of vmapping the whole solver."""

    A: jax.Array  # (6,12) wrench map
    b: jax.Array  # (6,) virtual wrench
    S: jax.Array  # (6,) diag weights
    W: jax.Array  # (12,) diag regularizer
    D: jax.Array  # (20,12) inequality rows
    d: jax.Array  # (20,)
    # The FORMED quadratic (G = 2AᵀSA + diag(W), g = −2AᵀSb) is part of
    # the context so that exactly ONE f32 formation exists per tick: the
    # solver consumes these tensors and telemetry records the same ones.
    # Forming G/g at the consumer would round differently per fusion
    # context (measured: the same tick's optimum moves O(0.1-0.5 N)
    # along the W=1e-4 flat valley between two formations), making
    # solver-vs-oracle comparisons unattributable.
    G: jax.Array  # (12,12)
    g: jax.Array  # (12,)
    virtual_force: jax.Array  # (3,)
    virtual_torque: jax.Array  # (3,)
    tau_swing: jax.Array  # (4,3) swing computed-torque output


def locomotion_prepare(
    model: RobotModel,
    params: ControllerParams,
    state: RobotState,
    target: BaseTarget,
    swing_pos_world: jax.Array,  # (4,3) swing-foot reference positions
    swing_vel_world: jax.Array,  # (4,3)
    swing_acc_world: jax.Array,  # (4,3)
) -> LocomotionContext:
    """Stage 1 of a control tick: VMC wrench + QP assembly + swing
    torques — everything up to (but excluding) the QP solve."""
    vf, vt = compute_virtual_wrench(model, params.vmc, state, target)
    feet = forward_kinematics(model, state.q)
    A, b, S, W, D, d = build_qp(model, params.cfd, state, vf, vt, feet)
    with jax.default_matmul_precision("highest"):
        SA = A * S[:, None]
        G = 2.0 * A.T @ SA + jnp.diag(W)
        g = -2.0 * SA.T @ b
    # Materialize ONE copy: without the barrier XLA may duplicate this
    # formation into different fusions for different consumers (solver
    # vs telemetry), whose f32 roundings differ — and the W=1e-4 flat
    # valley turns last-ulp differences in g into O(0.1-1 N) optimum
    # motion, making recorded-problem vs solved-problem inconsistent.
    G, g = jax.lax.optimization_barrier((G, g))

    # world → base frame swing references. NOTE: velocities are the plain
    # rotated spline derivatives, WITHOUT base-twist compensation — this is
    # the reference's semantics (desired foot velocities are published in
    # the base frame straight from the spline, StateRosPublisher.cpp:240+),
    # and it matters: trot stance is a 2-contact knife edge, so the base
    # wobbles about the support diagonal; twist-compensated references
    # would inject that wobble into the swing-leg velocity loop and pump it
    # through the kd term.
    q = state.base.quaternion
    p_des = quat_inv_rotate(q[None], swing_pos_world - state.base.position)
    v_des = quat_inv_rotate(q[None], swing_vel_world)
    a_des = quat_inv_rotate(q[None], swing_acc_world)
    tau_swing = swing_torques(model, params.swing, state, p_des, v_des, a_des)
    return LocomotionContext(
        A=A, b=b, S=S, W=W, D=D, d=d, G=G, g=g,
        virtual_force=vf, virtual_torque=vt, tau_swing=tau_swing,
    )


def locomotion_finish(
    model: RobotModel,
    params: ControllerParams,
    state: RobotState,
    ctx: LocomotionContext,
    sol: qp.QpSolution,
):
    """Stage 2: QP solution → stance torques, swing merge, ±300 clamp."""
    x = sol.x * jnp.repeat(state.support.astype(sol.x.dtype), 3)
    grf = x.reshape(4, 3)
    dist = ForceDistributionResult(
        contact_forces=-grf,
        ground_reaction=grf,
        qp_solution=sol,
        virtual_wrench_realized=ctx.A @ sol.x,
    )
    tau_stance = stance_torques(model, state, dist.contact_forces)
    tau_stance = jnp.clip(tau_stance, -model.torque_limit, model.torque_limit)
    sup = state.support[:, None]
    tau = jnp.where(sup, tau_stance, ctx.tau_swing)
    tau = jnp.clip(tau, -model.torque_limit, model.torque_limit)
    diag = BalanceDiagnostics(
        virtual_force=ctx.virtual_force,
        virtual_torque=ctx.virtual_torque,
        distribution=dist,
    )
    return tau, diag


def locomotion_update(
    model: RobotModel,
    params: ControllerParams,
    state: RobotState,
    target: BaseTarget,
    swing_pos_world: jax.Array,  # (4,3) swing-foot reference positions
    swing_vel_world: jax.Array,  # (4,3)
    swing_acc_world: jax.Array,  # (4,3)
    qp_iters: int = 15,
):
    """One 400 Hz-grade control tick → (torques (4,3), diagnostics).

    Composed as prepare → solve → finish so the single-scenario path and
    the batched rollout path execute the exact same math."""
    ctx = locomotion_prepare(
        model, params, state, target,
        swing_pos_world, swing_vel_world, swing_acc_world,
    )
    sol = qp.solve_qp(ctx.G, ctx.g, ctx.D, ctx.d, iters=qp_iters)
    return locomotion_finish(model, params, state, ctx, sol)
