"""Controller manager: the fixed-rate read→update→write runtime loop.

≙ the reference's real-time runtime (SURVEY.md §2.6):
``BalanceControllerManager`` (400 Hz timer, read → controller_manager
update → write, e-stop topic, ``/set_control_method`` service,
``balance_controller_manager.cpp:47-95``) plus ros_control's controller
switching between ``RosBalanceController`` / ``SingleLegController`` /
``JointTorqueController`` / position controllers, and the control
panel's switch UI (``rqt_control_panel_plugin_widget.cpp``).

TPU-native re-design: controllers are thin host objects wrapping one
jitted update function each (compiled once, reused every tick); the
manager is a plain loop against a :class:`~.hal.HardwareInterface`.
Determinism and safety behavior mirror the reference: e-stop forces
zero torque immediately (``gazebo_state_hardware_interface.cpp:357-370``),
switching controllers re-initializes the incoming controller from the
current measured state, and a failed controller update keeps the
previous torques (``ros_balance_controller.cpp:418-424``).
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..control.balance_controller import balance_update
from ..control.swing import joint_pd_gravity_torques, swing_torques
from ..types import (
    BaseState,
    BaseTarget,
    CfdParams,
    RobotModel,
    RobotState,
    SwingGains,
    VmcGains,
)
from .hal import HardwareInterface, RobotSample


def _robot_state_from_sample(sample: RobotSample, support) -> RobotState:
    base = BaseState(
        position=jnp.asarray(sample.base_position),
        quaternion=jnp.asarray(sample.base_quaternion),
        linear_velocity=jnp.asarray(sample.base_linear_velocity),
        angular_velocity=jnp.asarray(sample.base_angular_velocity),
    )
    return RobotState.neutral().replace(
        base=base,
        q=jnp.asarray(sample.q),
        qd=jnp.asarray(sample.qd),
        tau=jnp.asarray(sample.tau),
        support=jnp.asarray(support),
    )


class Controller:
    """Interface: jitted torque law + lifecycle hooks."""

    name = "controller"

    def start(self, sample: RobotSample) -> None:  # re-init on switch
        pass

    def update(self, sample: RobotSample) -> np.ndarray:  # (4,3) torques
        raise NotImplementedError


class BalanceStandController(Controller):
    """Whole-body standing balance: VMC → force-distribution QP →
    stance torques toward a held base target (≙ RosBalanceController
    in its all-stance regime)."""

    name = "base_balance_controller"

    def __init__(
        self,
        model: RobotModel,
        gains: VmcGains | None = None,
        cfd: CfdParams | None = None,
        qp_iters: int = 15,
    ):
        self.model = model
        self.gains = gains or VmcGains.gazebo_defaults()
        self.cfd = cfd or CfdParams.defaults()
        self._target: BaseTarget | None = None
        self._fn = jax.jit(
            lambda state, target: balance_update(
                model, self.gains, self.cfd, state, target, qp_iters=qp_iters
            )[0]
        )

    def start(self, sample: RobotSample) -> None:
        base = BaseState(
            position=jnp.asarray(sample.base_position),
            quaternion=jnp.asarray(sample.base_quaternion),
            linear_velocity=jnp.zeros(3),
            angular_velocity=jnp.zeros(3),
        )
        self._target = BaseTarget.from_base(base)

    def set_target(self, target: BaseTarget) -> None:
        self._target = target

    def update(self, sample: RobotSample) -> np.ndarray:
        state = _robot_state_from_sample(sample, jnp.ones(4, bool))
        return np.asarray(self._fn(state, self._target))


class SingleLegController(Controller):
    """Task-space computed-torque control of selected legs toward
    end-effector targets, gravity-comp PD hold on the rest
    (≙ ``single_leg_controller.cpp:49-520``)."""

    name = "single_leg_controller"

    def __init__(
        self,
        model: RobotModel,
        legs=(0,),
        gains: SwingGains | None = None,
    ):
        self.model = model
        self.legs = jnp.zeros(4, bool).at[jnp.asarray(legs)].set(True)
        self.gains = gains or SwingGains.defaults()
        self._p_des = None  # (4,3) base-frame foot targets
        self._q_hold = None

        def fn(state, p_des, q_hold, active):
            zero = jnp.zeros((4, 3), p_des.dtype)
            tau_task = swing_torques(
                self.model, self.gains, state, p_des, zero, zero
            )
            tau_hold = joint_pd_gravity_torques(
                self.model, state, q_hold, jnp.zeros_like(q_hold)
            )
            return jnp.where(active[:, None], tau_task, tau_hold)

        self._fn = jax.jit(fn)

    def start(self, sample: RobotSample) -> None:
        from ..model.kinematics import forward_kinematics

        self._q_hold = jnp.asarray(sample.q)
        self._p_des = forward_kinematics(self.model, self._q_hold)

    def set_targets(self, p_des_base) -> None:
        self._p_des = jnp.asarray(p_des_base)

    def update(self, sample: RobotSample) -> np.ndarray:
        state = _robot_state_from_sample(sample, jnp.zeros(4, bool))
        return np.asarray(
            self._fn(state, self._p_des, self._q_hold, self.legs)
        )


class JointTorqueController(Controller):
    """Forward externally-set joint efforts
    (≙ ``joint_torque_controller.cpp``)."""

    name = "joint_torque_controller"

    def __init__(self):
        self.command = np.zeros((4, 3), np.float32)

    def update(self, sample: RobotSample) -> np.ndarray:
        return self.command


class FreezeController(Controller):
    """PD-hold the joint positions captured at switch time — the safe
    fallback (≙ the lost-contact freeze reflex used as a controller)."""

    name = "freeze_controller"

    def __init__(self, model: RobotModel):
        self.model = model
        self._q_hold = None
        self._fn = jax.jit(
            lambda state, q_hold: joint_pd_gravity_torques(
                model, state, q_hold, jnp.zeros_like(q_hold)
            )
        )

    def start(self, sample: RobotSample) -> None:
        self._q_hold = jnp.asarray(sample.q)

    def update(self, sample: RobotSample) -> np.ndarray:
        state = _robot_state_from_sample(sample, jnp.zeros(4, bool))
        return np.asarray(self._fn(state, self._q_hold))


class ControllerManager:
    """Fixed-rate runtime loop with switching and e-stop."""

    def __init__(
        self,
        hw: HardwareInterface,
        model: RobotModel,
        dt: float = 0.0025,  # 400 Hz (balance_controller_manager.cpp:47-58)
    ):
        self.hw = hw
        self.model = model
        self.dt = dt
        self.controllers: dict[str, Controller] = {}
        self.active: Controller | None = None
        self.estopped = False
        self._last_tau = np.zeros((4, 3), np.float32)
        self.ticks = 0

    def register(self, ctrl: Controller) -> None:
        self.controllers[ctrl.name] = ctrl

    def switch(self, name: str) -> None:
        """≙ controller_manager switch + /set_control_method."""
        ctrl = self.controllers[name]
        ctrl.start(self.hw.read())
        self.active = ctrl

    def estop(self) -> None:
        self.estopped = True
        self.hw.estop()

    def tick(self) -> RobotSample:
        """One read→update→write cycle."""
        sample = self.hw.read()
        if self.estopped or sample.estop:
            tau = np.zeros((4, 3), np.float32)
        elif self.active is None:
            tau = self._last_tau
        else:
            try:
                tau = self.active.update(sample)
                if not np.isfinite(tau).all():
                    raise FloatingPointError("non-finite torques")
                self._last_tau = tau
            except Exception:
                # keep previous torques (ros_balance_controller.cpp:418-424)
                tau = self._last_tau
        lim = float(self.model.torque_limit)
        tau = np.clip(tau, -lim, lim)
        self.hw.write(tau)
        self.ticks += 1
        return sample

    def run(
        self,
        n_ticks: int,
        realtime: bool = False,
        on_sample: Callable[[RobotSample], None] | None = None,
    ) -> None:
        """≙ the 400 Hz manager loop; ``realtime=False`` runs as fast
        as the backend steps (sim-time)."""
        period = self.dt
        next_t = time.perf_counter()
        for _ in range(n_ticks):
            sample = self.tick()
            if on_sample is not None:
                on_sample(sample)
            if realtime:
                next_t += period
                delay = next_t - time.perf_counter()
                if delay > 0:
                    time.sleep(delay)
