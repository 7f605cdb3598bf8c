"""Whole-body balance-control tick (stance path).

Functional core of the reference's ``RosBalanceController::update``
(``balance_controller/src/ros_controller/ros_balance_controller.cpp:198-718``)
stripped of ROS plumbing: measured state + desired base motion → joint
torques. Stance legs get VMC + contact-force-distribution QP torques,
clamped to ±300 N·m (:451-454). Swing-leg control lives in
``control/swing.py`` and is merged by the full locomotion controller.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..types import BaseTarget, CfdParams, RobotModel, RobotState, VmcGains
from .force_distribution import ForceDistributionResult, distribute, stance_torques
from .vmc import compute_virtual_wrench


class BalanceDiagnostics(NamedTuple):
    virtual_force: jax.Array  # (3,)
    virtual_torque: jax.Array  # (3,)
    distribution: ForceDistributionResult


def balance_update(
    model: RobotModel,
    vmc_gains: VmcGains,
    cfd_params: CfdParams,
    state: RobotState,
    target: BaseTarget,
    qp_iters: int = 20,
    warm: tuple[jax.Array, jax.Array] | None = None,
    polish: str = "full",
):
    """One balance-controller tick → (stance torques (4,3), diagnostics).

    ``warm`` = previous tick's (x, z) QP iterates and ``polish="light"``
    are the 400 Hz host-loop configuration: consecutive ticks solve
    near-identical QPs, so a warm 8-iteration solve reaches the KKT
    quality of a cold 15-20 (measured in test_balance.py) at roughly
    half the host latency — the lever that holds the reference's 2.5 ms
    budget on a shared-core host (≙ OOQP's warm-startable IPM inside
    ``ContactForceDistribution.cpp:490``).
    """
    vf, vt = compute_virtual_wrench(model, vmc_gains, state, target)
    dist = distribute(
        model, cfd_params, state, vf, vt, iters=qp_iters, warm=warm,
        polish=polish,
    )
    tau = stance_torques(model, state, dist.contact_forces)
    tau = jnp.clip(tau, -model.torque_limit, model.torque_limit)
    return tau, BalanceDiagnostics(
        virtual_force=vf, virtual_torque=vt, distribution=dist
    )
