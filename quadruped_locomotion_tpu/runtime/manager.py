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
from functools import partial
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


@partial(jax.jit, static_argnames=("iters", "polish"))
def _balance_vec_update(model, gains, cfd, vec, target, warm, iters, polish):
    """Module-level jitted balance tick: every argument is a pytree, so
    the compile cache is shared across ALL controller instances with the
    same shapes — re-constructing a controller (e.g. a measurement
    retry) must not pay XLA compilation again (a fresh closure-bound
    ``jax.jit`` object forces a full retrace; measured ~6 min on the
    2-core CI box, which blew the realtime bus's first-command window)."""
    state = _robot_state_from_vec(vec)
    tau, diag = balance_update(
        model, gains, cfd, state, target,
        qp_iters=iters, warm=warm, polish=polish,
    )
    sol = diag.distribution.qp_solution
    return tau, (sol.x, sol.z)


def _robot_state_from_vec(vec, support=None) -> RobotState:
    """Assemble a RobotState from the packed (SAMPLE_FLOATS,) wire
    vector INSIDE a jit trace — the realtime-loop path: one array enters
    the device boundary per tick instead of ~20 per-field conversions
    (the slicing below costs nothing once fused)."""
    base = BaseState(
        position=vec[0:3],
        quaternion=vec[3:7],
        linear_velocity=vec[7:10],
        angular_velocity=vec[10:13],
    )
    return RobotState.neutral().replace(
        base=base,
        q=vec[13:25].reshape(4, 3),
        qd=vec[25:37].reshape(4, 3),
        tau=vec[37:49].reshape(4, 3),
        support=(
            jnp.ones(4, bool) if support is None else jnp.asarray(support)
        ),
    )


class Controller:
    """Interface: jitted torque law + lifecycle hooks."""

    name = "controller"

    def start(self, sample: RobotSample) -> None:  # re-init on switch
        pass

    def warmup(self, sample: RobotSample) -> None:
        """Compile every jitted path WITHOUT publishing side effects —
        call once after :meth:`start`, before entering a paced loop (a
        first-tick XLA compile inside a realtime window is a missed
        deadline by seconds)."""

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
        qp_iters: int = 8,
    ):
        self.model = model
        self.gains = gains or VmcGains.gazebo_defaults()
        self.cfd = cfd or CfdParams.defaults()
        self._target: BaseTarget | None = None
        self._warm = None  # previous tick's (x, z) QP iterates

        # Realtime-loop configuration: consecutive 2.5 ms ticks solve
        # near-identical QPs, so the update warm-starts the IPM from the
        # previous (x, z) at 8 iterations with the light polish chain —
        # roughly half the host latency of the cold 15-iteration default
        # at equal standing-balance KKT (gated in test_balance.py); the
        # first tick after a switch runs the full cold solve to seed the
        # warm state. The measured sample enters as ONE packed
        # (SAMPLE_FLOATS,) vector and the RobotState is assembled INSIDE
        # the trace: per-field ``jnp.asarray`` on the host costs ~20
        # eager dispatches per tick (~2 ms measured on a pinned core —
        # 6× the 0.33 ms solve itself). Both variants go through the
        # module-level ``_balance_vec_update`` so XLA compiles once per
        # process, not once per controller instance.
        self._qp_iters = qp_iters
        self._fn = lambda vec, target, warm: _balance_vec_update(
            self.model, self.gains, self.cfd, vec, target, warm,
            self._qp_iters, "light",
        )
        # cold start (first tick after a switch): full-quality solve
        self._fn_cold = lambda vec, target: _balance_vec_update(
            self.model, self.gains, self.cfd, vec, target, None,
            15, "full",
        )

    def start(self, sample: RobotSample) -> None:
        base = BaseState(
            position=jnp.asarray(sample.base_position),
            quaternion=jnp.asarray(sample.base_quaternion),
            linear_velocity=jnp.zeros(3),
            angular_velocity=jnp.zeros(3),
        )
        self._target = BaseTarget.from_base(base)
        self._warm = None

    def set_target(self, target: BaseTarget) -> None:
        self._target = target

    def warmup(self, sample: RobotSample) -> None:
        """Compile both solve variants (cold first-tick + warm steady
        path) without touching the warm state or the hardware."""
        vec = sample.pack()
        tau, warm = self._fn_cold(vec, self._target)
        tau, _ = self._fn(vec, self._target, warm)
        jax.block_until_ready(tau)

    def update(self, sample: RobotSample) -> np.ndarray:
        vec = sample.pack()
        if self._warm is None:
            tau, self._warm = self._fn_cold(vec, self._target)
        else:
            tau, self._warm = self._fn(vec, self._target, self._warm)
        return np.asarray(tau)


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
