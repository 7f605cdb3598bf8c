"""Hardware abstraction layer: fixed sample formats + robot backends.

≙ the reference's hardware stack (SURVEY.md §2.6): the custom
ros_control ``RobotStateInterface``/``RobotStateHandle`` (one handle
exposing base pose/twist + 12× joint pos/vel/eff read & write + foot
contacts, ``robot_state_interface.hpp:25-180``), its Gazebo
implementation ``SimRobotStateHardwareInterface::readSim/writeSim``
(``gazebo_state_hardware_interface.cpp:286-420``), and the EtherCAT
bus behind ``BalanceControllerManager``.

TPU-native re-design: the "handle" is a flat float32 vector with a
fixed layout (host boundary format — one contiguous copy per tick, no
per-field marshalling), produced/consumed by pluggable backends:

* :class:`SimHardware` — in-process plant (our rigid-body simulator);
* :class:`ShmHardware` — out-of-process realtime bus over the native
  shared-memory ring (``native/shm_ring.c``), the real-robot path.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..rollout import simulator as simlib
from ..types import RobotModel

# RobotSample layout (floats): the read side of RobotStateHandle
#   0:3   base position (world)
#   3:7   base quaternion wxyz
#   7:10  base linear velocity (world)
#   10:13 base angular velocity (base)
#   13:25 joint positions (4 legs × 3)
#   25:37 joint velocities
#   37:49 joint efforts (measured)
#   49:53 foot contact flags
#   53    e-stop flag
#   54    timestamp (s)
SAMPLE_FLOATS = 55

# CommandSample layout (floats): the write side
#   0:12  joint effort commands
#   12    control mode id (diagnostic)
#   13    e-stop acknowledge
COMMAND_FLOATS = 14


@dataclasses.dataclass
class RobotSample:
    base_position: np.ndarray  # (3,)
    base_quaternion: np.ndarray  # (4,)
    base_linear_velocity: np.ndarray  # (3,)
    base_angular_velocity: np.ndarray  # (3,)
    q: np.ndarray  # (4,3)
    qd: np.ndarray  # (4,3)
    tau: np.ndarray  # (4,3)
    contacts: np.ndarray  # (4,) bool
    estop: bool
    time: float

    def pack(self) -> np.ndarray:
        v = np.empty(SAMPLE_FLOATS, np.float32)
        v[0:3] = self.base_position
        v[3:7] = self.base_quaternion
        v[7:10] = self.base_linear_velocity
        v[10:13] = self.base_angular_velocity
        v[13:25] = np.asarray(self.q, np.float32).ravel()
        v[25:37] = np.asarray(self.qd, np.float32).ravel()
        v[37:49] = np.asarray(self.tau, np.float32).ravel()
        v[49:53] = np.asarray(self.contacts, np.float32)
        v[53] = 1.0 if self.estop else 0.0
        v[54] = self.time
        return v

    @classmethod
    def unpack(cls, v: np.ndarray) -> "RobotSample":
        return cls(
            base_position=v[0:3].copy(),
            base_quaternion=v[3:7].copy(),
            base_linear_velocity=v[7:10].copy(),
            base_angular_velocity=v[10:13].copy(),
            q=v[13:25].reshape(4, 3).copy(),
            qd=v[25:37].reshape(4, 3).copy(),
            tau=v[37:49].reshape(4, 3).copy(),
            contacts=v[49:53] > 0.5,
            estop=bool(v[53] > 0.5),
            time=float(v[54]),
        )


def pack_command(tau: np.ndarray, mode: int = 0, estop: bool = False):
    v = np.zeros(COMMAND_FLOATS, np.float32)
    v[0:12] = np.asarray(tau, np.float32).ravel()
    v[12] = float(mode)
    v[13] = 1.0 if estop else 0.0
    return v


def unpack_command(v: np.ndarray):
    return v[0:12].reshape(4, 3).copy(), int(v[12]), bool(v[13] > 0.5)


class HardwareInterface:
    """read → control → write contract (≙ RobotStateInterface)."""

    def read(self) -> RobotSample:
        raise NotImplementedError

    def write(self, tau: np.ndarray, mode: int = 0) -> None:
        raise NotImplementedError

    def estop(self) -> None:
        raise NotImplementedError


class SimHardware(HardwareInterface):
    """In-process plant: our rigid-body simulator as the robot
    (≙ SimRobotStateHardwareInterface against Gazebo)."""

    def __init__(
        self,
        model: RobotModel,
        dt: float = 0.0025,
        height: float = 0.4,
        support=None,
    ):
        self.model = model
        self.dt = dt
        self.sim = simlib.default_stance_state(model, height=height)
        self._support = (
            jnp.ones(4, bool) if support is None else jnp.asarray(support)
        )
        self._estop = False
        self._vec: np.ndarray | None = None  # packed-sample cache

        # ONE fused jitted dispatch per bus tick: plant step + contact
        # sensor + sample packing on-device, a single (55,) host
        # transfer — instead of a jitted step plus ~10 eager ops and
        # per-field device→host copies per tick (the r4 bus measured
        # 374 Hz vs 400 nominal; the eager read path was most of the
        # overrun).
        def _step_pack(sim, tau, support):
            sim2 = simlib.step(model, sim, tau, dt, support=support)
            contacts = simlib.contact_sensor(sim2)
            r = sim2.robot
            f32 = jnp.float32
            vec = jnp.concatenate(
                [
                    r.base.position.astype(f32),
                    r.base.quaternion.astype(f32),
                    r.base.linear_velocity.astype(f32),
                    r.base.angular_velocity.astype(f32),
                    r.q.reshape(12).astype(f32),
                    r.qd.reshape(12).astype(f32),
                    r.tau.reshape(12).astype(f32),
                    contacts.astype(f32),
                    jnp.zeros(1, f32),  # e-stop latched host-side
                    sim2.time.reshape(1).astype(f32),
                ]
            )
            return sim2, vec

        self._step = jax.jit(_step_pack)

    def set_support(self, support) -> None:
        self._support = jnp.asarray(support)

    def read_packed(self) -> np.ndarray:
        """The (SAMPLE_FLOATS,) wire vector of the current state — the
        bus hot path (no unpack/repack round trip)."""
        if self._vec is None:
            contacts = np.asarray(simlib.contact_sensor(self.sim))
            r = self.sim.robot
            self._vec = RobotSample(
                base_position=np.asarray(r.base.position),
                base_quaternion=np.asarray(r.base.quaternion),
                base_linear_velocity=np.asarray(r.base.linear_velocity),
                base_angular_velocity=np.asarray(r.base.angular_velocity),
                q=np.asarray(r.q),
                qd=np.asarray(r.qd),
                tau=np.asarray(r.tau),
                contacts=contacts,
                estop=False,
                time=float(self.sim.time),
            ).pack()
        vec = self._vec.copy()
        vec[53] = 1.0 if self._estop else 0.0
        return vec

    def read(self) -> RobotSample:
        return RobotSample.unpack(self.read_packed())

    def write(self, tau: np.ndarray, mode: int = 0) -> None:
        if self._estop:
            tau = np.zeros_like(np.asarray(tau))
        self.sim, vec = self._step(
            self.sim, jnp.asarray(tau, jnp.float32), self._support
        )
        self._vec = np.asarray(vec)

    def estop(self) -> None:
        self._estop = True


class ShmHardware(HardwareInterface):
    """Out-of-process robot over the native shared-memory rings: reads
    the latest RobotSample from the state ring, publishes commands to
    the command ring (≙ the EtherCAT manager process boundary,
    ``balance_controller_manager.cpp:66-95``)."""

    def __init__(self, state_ring, cmd_ring, sync: bool = True):
        self.state_ring = state_ring
        self.cmd_ring = cmd_ring
        self.sync = sync  # pace on fresh samples (the bus is the clock)
        self.timeout = 5.0  # default read timeout (s); callers may tune
        self._estop = False
        self._last = None
        self._last_idx = -1
        self._last_t: float | None = None
        self._period = 0.0  # EWMA inter-sample period (s)

    @classmethod
    def connect(cls, prefix: str = "/qlt"):
        from .shm import ShmRing

        return cls(
            ShmRing.open(prefix + "_state"), ShmRing.open(prefix + "_cmd")
        )

    @staticmethod
    def create_rings(prefix: str = "/qlt", n_slots: int = 64):
        """Bus-process side: allocate both rings."""
        from .shm import ShmRing

        state = ShmRing.create(prefix + "_state", SAMPLE_FLOATS, n_slots)
        cmd = ShmRing.create(prefix + "_cmd", COMMAND_FLOATS, n_slots)
        return state, cmd

    def read(self, timeout: float | None = None) -> RobotSample:
        """Latest robot sample. With ``sync`` (default), blocks until a
        sample newer than the previously returned one arrives — the bus
        process is the clock, exactly like the reference controller
        running off the EtherCAT cycle. ``timeout`` defaults to the
        instance's ``self.timeout``.

        The wait is two-phase: one coarse sleep sized from the measured
        inter-sample period (EWMA) up to just short of the next expected
        arrival, then a fine 100 µs poll — a fixed 200 µs poll loop
        costs ~12 scheduler wakeups per 2.5 ms cycle, each a chance for
        the OS to run the poller instead of the bus on a shared core."""
        import time as _time

        if timeout is None:
            timeout = self.timeout
        now = _time.monotonic()
        deadline = now + timeout
        if self.sync and self._last_t is not None and self._period > 0:
            target = self._last_t + 0.85 * self._period
            coarse = min(target, deadline) - now - 0.0003
            if coarse > 0.0002:
                _time.sleep(coarse)
        while True:
            got = self.state_ring.pop_latest(SAMPLE_FLOATS)
            if got is not None:
                idx, vec = got
                if not self.sync or idx > self._last_idx:
                    now = _time.monotonic()
                    if self._last_t is not None and idx == self._last_idx + 1:
                        dt = now - self._last_t
                        if 0.0 < dt < 0.1:
                            self._period = (
                                dt
                                if self._period == 0.0
                                else 0.9 * self._period + 0.1 * dt
                            )
                    self._last_t = now
                    self._last_idx = idx
                    self._last = RobotSample.unpack(vec)
                    return self._last
            if _time.monotonic() >= deadline:
                if self._last is None:
                    raise TimeoutError("no robot state published yet")
                return self._last  # bus stalled: reuse latest
            _time.sleep(0.0001)

    def write(self, tau: np.ndarray, mode: int = 0) -> None:
        self.cmd_ring.push(pack_command(tau, mode, self._estop))

    def estop(self) -> None:
        self._estop = True
        self.cmd_ring.push(
            pack_command(np.zeros((4, 3), np.float32), 0, True)
        )
