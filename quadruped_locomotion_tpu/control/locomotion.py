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
from ..utils.rotations import quat_inv_rotate, quat_rotate
from .balance_controller import BalanceDiagnostics, balance_update
from .swing import swing_torques


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
    """One 400 Hz-grade control tick → (torques (4,3), diagnostics)."""
    tau_stance, diag = balance_update(
        model, params.vmc, params.cfd, state, target, qp_iters=qp_iters
    )

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

    sup = state.support[:, None]
    tau = jnp.where(sup, tau_stance, tau_swing)
    tau = jnp.clip(tau, -model.torque_limit, model.torque_limit)
    return tau, diag
