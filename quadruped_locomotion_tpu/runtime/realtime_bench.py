"""Measured cross-process realtime runtime: rate, jitter, e-stop latency.

≙ the reference's entire reason for existing as a *realtime* system: the
400 Hz EtherCAT manager loop (``balance_controller/src/ros_controller/
balance_controller_manager.cpp:47-95`` — 0.0025 s timer, read →
controller update → write, e-stop topic forcing zero torque). Round 2
built the transport (``native/shm_ring.c`` seqlock rings + ``ShmHardware``)
but never *measured* it; this module is the measurement.

Topology (two OS processes, 'spawn' so each owns a fresh JAX):

* **bus process** — the robot: owns the plant (``SimHardware``), paces
  itself at the target rate with a deadline scheduler, publishes a
  ``RobotSample`` every tick and applies the newest torque command
  (≙ the EtherCAT cycle). On an e-stop command it zeroes torques and
  latches the e-stop flag into every subsequent sample.
* **controller process** (the caller) — ``ControllerManager`` +
  ``BalanceStandController`` over ``ShmHardware`` in sync mode: the bus
  is the clock, exactly like the reference controller running off the
  drive cycle.

Measured quantities (returned as a dict, recorded in PARITY.md):

* achieved controller rate over the run (Hz);
* controller inter-tick jitter: p50/p95/p99 deviation from the nominal
  period (s);
* bus inter-tick jitter (same statistics, measured bus-side);
* **e-stop-to-zero-torque latency**: wall time from the controller's
  ``estop()`` call to the first *observed* robot sample with the e-stop
  latch set — the full round trip command-ring → bus tick → zero torque
  → state-ring, i.e. what the reference's e-stop topic chain
  (``gazebo_state_hardware_interface.cpp:357-370``) would measure.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import time

import numpy as np

BUS_PREFIX = "/qlt_rtbench"


def contention_factor(n_bench_procs: int = 2) -> float:
    """How oversubscribed the benchmark's CPUs are RIGHT NOW.

    The realtime loop needs ``n_bench_procs`` runnable processes (bus +
    controller). Returns ≥ 1.0: the expected slowdown from sharing
    ``os.cpu_count()`` cores with the already-running load (1-minute
    loadavg). 1.0 = both processes get a core to themselves; 2.0 = each
    expects half a core. Used to scale the timing gates so the suite
    measures the RUNTIME, not the CI box's scheduler (the reference's
    400 Hz figure assumes a dedicated RT host,
    ``balance_controller_manager.cpp:47-58``).
    """
    ncpu = os.cpu_count() or 1
    try:
        load = os.getloadavg()[0]
    except OSError:  # pragma: no cover
        load = 0.0
    return max(1.0, (load + n_bench_procs) / ncpu)


def _try_realtime_priority(
    prio: int = 10, cpu: int | None = None, fifo: bool = True
) -> bool:
    """Ask for (optionally) SCHED_FIFO plus a dedicated core — what the
    reference's dedicated RT host gives its 400 Hz loop
    (``balance_controller_manager.cpp:47-58`` assumes an RT-scheduled
    EtherCAT process on isolated CPUs). Without explicit affinity two
    FIFO tasks can land on ONE core (FIFO does not migrate eagerly) and
    the lower-priority loop runs on that core's leftovers while the
    other core idles — measured 2.7 ms p50 for a 0.9 ms update.

    ``fifo=False`` keeps CFS but raises priority via nice(-15): the
    right setting for a loop that can busy-poll — a FIFO task that
    rarely blocks starves every CFS task pinned to its core (including
    whatever supervises the box). The paced bus sleeps every tick, so
    FIFO is safe there; the controller is sync-read-driven and gets the
    CFS + affinity treatment.

    Falls back silently without privileges; returns whether an elevated
    scheduling class/priority is active."""
    ok = False
    if fifo:
        try:
            os.sched_setscheduler(0, os.SCHED_FIFO, os.sched_param(prio))
            ok = True
        except (OSError, AttributeError, PermissionError):
            pass
    else:
        try:
            os.nice(-15)
            ok = True
        except OSError:  # pragma: no cover
            pass
    if cpu is not None:
        try:
            ncpu = os.cpu_count() or 1
            os.sched_setaffinity(0, {cpu % ncpu})
        except (OSError, AttributeError):  # pragma: no cover
            pass
    return ok


def _procs_running() -> int:
    """Instantaneous runnable-task count from /proc/stat — unlike the
    1-minute loadavg it does NOT lag contention created moments ago
    (the r3/r4 flake class: the suite's own earlier tests left loadavg
    low/high relative to the actual load inside the measure window)."""
    try:
        with open("/proc/stat") as f:
            for line in f:
                if line.startswith("procs_running"):
                    return int(line.split()[1])
    except OSError:  # pragma: no cover
        pass
    return 1


def window_contention(samples: list[int], n_bench_procs: int = 2) -> float:
    """Contention factor from runnable-task samples taken DURING the
    measure window. ``procs_running`` includes our own bench processes;
    anything beyond ``n_bench_procs`` runnable on average is competing
    load, and the factor is how many runnable tasks contend per CPU."""
    ncpu = os.cpu_count() or 1
    if not samples:
        return 1.0
    mean_runnable = float(np.mean(samples))
    return max(1.0, mean_runnable / ncpu)


def bus_main(prefix: str, rate_hz: float, max_ticks: int, stats_q) -> None:
    """The robot bus process (spawn target — top-level importable)."""
    import sys

    _pre = "jax" in sys.modules
    _env = os.environ.get("JAX_PLATFORMS")
    os.environ["JAX_PLATFORMS"] = "cpu"
    # Single-threaded math: the plant step is a 12-DoF toy for XLA — an
    # intra-op thread pool only adds cross-core wakeups that preempt the
    # controller process on a 2-core box.
    os.environ["OMP_NUM_THREADS"] = "1"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_cpu_multi_thread_eigen=false"
    ).strip()
    import jax

    from jax._src import xla_bridge as _xb

    _cfg_before = jax.config.jax_platforms
    _backends_before = list(_xb._backends.keys())
    jax.config.update("jax_platforms", "cpu")
    # The sandbox's sitecustomize (axon PJRT plugin) may have eagerly
    # initialized backends with jax_platforms="axon,cpu" before this
    # function runs (observed under pytest/runpy parents); once
    # initialized, the config update alone is a no-op. Clear the caches
    # so the cpu selection takes effect — a remote-tunnel TPU dispatch
    # per 2.5 ms bus tick is neither realtime nor what this measures.
    if "axon" in _backends_before or _cfg_before not in (None, "cpu"):
        try:
            from jax.extend.backend import clear_backends

            clear_backends()
        except Exception:
            pass

    # Persistent compile cache: the bus's plant-step compile is the slow
    # half of every realtime measurement's setup window; cached, repeat
    # runs (and the retry attempt) start in seconds.
    from ..utils import cache as _cache

    _cache.enable()

    trace = os.environ.get("QLT_RTBENCH_TRACE")

    def _t(msg):
        if trace:
            with open(trace, "a") as f:
                f.write(f"{time.monotonic():.3f} {msg}\n")

    if trace:
        import faulthandler

        faulthandler.dump_traceback_later(
            90, repeat=True, file=open(trace + ".fault", "w")
        )

    _t("bus: jax configured")
    if trace:
        _t(f"bus: jax_preimported={_pre} env_JAX_PLATFORMS={_env!r}")
        _t(f"bus: cfg_before={_cfg_before!r} backends_before={_backends_before}")
        _t(f"bus: backend={jax.default_backend()} devices={jax.devices()}")
    from ..types import RobotModel
    from . import hal
    from .shm import ShmRing

    _t("bus: imports done")
    state_ring = ShmRing.open(prefix + "_state")
    cmd_ring = ShmRing.open(prefix + "_cmd")
    _t("bus: rings open")
    robot = hal.SimHardware(RobotModel.simpledog(), dt=1.0 / rate_hz)
    _t("bus: hw built")

    # announce liveness before the (slow) first-compile warmup, so the
    # controller's first read doesn't time out waiting on XLA
    state_ring.push(robot.read_packed())
    _t("bus: liveness pushed")
    # warm the jitted plant step before pacing
    robot.write(np.zeros((4, 3), np.float32))
    _ = robot.read()
    _t("bus: warmup done")

    period = 1.0 / rate_hz
    tau = np.zeros((4, 3), np.float32)
    last_cmd = -1
    estopped = False
    tick_times = []
    estop_seen_t = None

    # hold the paced loop until the controller is compiled and talking
    # (its first warm tick publishes a command). If the window expires,
    # report the failure and EXIT — a bus free-running out of sync with
    # a still-compiling controller produces a garbage measurement that
    # then burns the controller's per-tick stale-read timeouts.
    deadline = time.monotonic() + 1800.0
    synced = False
    while time.monotonic() < deadline:
        got = cmd_ring.pop_latest(hal.COMMAND_FLOATS)
        if got is not None:
            last_cmd = got[0]
            tau, _mode, _estop = hal.unpack_command(got[1])
            synced = True
            break
        time.sleep(0.001)
    if not synced:  # pragma: no cover — controller never came up
        _t("bus: first-command window expired; aborting")
        stats_q.put({"bus_ticks": 0, "bus_error": "no first command"})
        state_ring.close()
        cmd_ring.close()
        return

    import gc

    gc.collect()
    gc.freeze()
    gc.disable()  # no collector pauses inside the paced window
    rt = _try_realtime_priority(11, cpu=1)  # bus owns core 1: it
    _t(f"bus: rt_priority={rt}")     # is the clock everything syncs on
    next_t = time.perf_counter()
    for _ in range(max_ticks):
        tick_times.append(time.perf_counter())
        # newest command, if any (never blocks: the bus is the clock)
        got = cmd_ring.pop_latest(hal.COMMAND_FLOATS)
        if got is not None and got[0] > last_cmd:
            last_cmd = got[0]
            tau, _mode, estop = hal.unpack_command(got[1])
            if estop and not estopped:
                estopped = True
                estop_seen_t = time.perf_counter()
                robot.estop()  # zero torque + latch flag into samples
        if estopped:
            tau = np.zeros((4, 3), np.float32)
        robot.write(tau)
        state_ring.push(robot.read_packed())
        next_t += period
        delay = next_t - time.perf_counter()
        if delay > 0:
            time.sleep(delay)
        if estopped and len(tick_times) > 8 and estop_seen_t is not None:
            if time.perf_counter() - estop_seen_t > 0.1:
                break  # drained past the e-stop; enough data

    dt = np.diff(np.asarray(tick_times))
    if dt.size == 0:  # pragma: no cover — degenerate window
        stats_q.put(
            {"bus_ticks": len(tick_times), "bus_error": "too few ticks"}
        )
    else:
        stats_q.put(
            {
                "bus_ticks": len(tick_times),
                "bus_jitter_p50": float(
                    np.percentile(np.abs(dt - period), 50)
                ),
                "bus_jitter_p95": float(
                    np.percentile(np.abs(dt - period), 95)
                ),
                "bus_jitter_p99": float(
                    np.percentile(np.abs(dt - period), 99)
                ),
                "bus_rate_hz": float(1.0 / dt.mean()),
            }
        )
    state_ring.close()
    cmd_ring.close()


def measure(
    duration_s: float = 4.0,
    rate_hz: float = 400.0,
    estop_at_s: float | None = None,
    prefix: str = BUS_PREFIX,
) -> dict:
    """Run the two-process loop for ``duration_s`` and return the timing
    report. ``estop_at_s`` (default: 80% through the run) triggers the
    controller-side e-stop and measures the observed round-trip latency.
    """
    from ..types import RobotModel
    from .hal import SAMPLE_FLOATS, ShmHardware
    from .manager import BalanceStandController, ControllerManager
    from .shm import ShmRing

    if estop_at_s is None:
        estop_at_s = 0.8 * duration_s
    period = 1.0 / rate_hz
    n_ticks = int(duration_s * rate_hz)
    estop_tick = int(estop_at_s * rate_hz)

    state_ring, cmd_ring = ShmHardware.create_rings(prefix)

    def _cleanup_rings():
        for ring, name in ((state_ring, "_state"), (cmd_ring, "_cmd")):
            try:
                ring.close()
                ShmRing.unlink(prefix + name)
            except Exception:
                pass

    def _restore_scheduling(orig_affinity, orig_nice):
        try:
            os.sched_setscheduler(0, os.SCHED_OTHER, os.sched_param(0))
        except (OSError, AttributeError):  # pragma: no cover
            pass
        if orig_affinity is not None:
            try:
                os.sched_setaffinity(0, orig_affinity)
            except OSError:  # pragma: no cover
                pass
        if orig_nice is not None:
            try:
                os.setpriority(os.PRIO_PROCESS, 0, orig_nice)
            except OSError:  # pragma: no cover
                pass

    try:
        return _measure_inner(
            prefix, rate_hz, n_ticks, estop_tick, period,
            state_ring, cmd_ring, _restore_scheduling,
        )
    finally:
        # exception-safe: an aborted run must not leak the rings (the
        # retry's create_rings would fail) nor a pinned/elevated
        # scheduler into the caller (observed halving a full pytest run)
        _cleanup_rings()


def _measure_inner(
    prefix, rate_hz, n_ticks, estop_tick, period,
    state_ring, cmd_ring, _restore_scheduling,
):
    from ..types import RobotModel
    from .hal import ShmHardware
    from .manager import BalanceStandController, ControllerManager

    ctx = mp.get_context("spawn")
    stats_q = ctx.Queue()
    bus = ctx.Process(
        target=bus_main,
        args=(prefix, rate_hz, n_ticks + int(2.0 * rate_hz), stats_q),
        daemon=True,
    )
    bus.start()

    model = RobotModel.simpledog()
    hw = ShmHardware(state_ring, cmd_ring)
    mgr = ControllerManager(hw, model, dt=period)
    mgr.register(BalanceStandController(model))

    # first read waits for the bus to come up (its plant compile can take
    # minutes on a cold XLA cache). Compile BOTH controller variants
    # (cold first-tick + warm steady path) via warmup() BEFORE the first
    # real tick: publishing a command is what releases the bus into its
    # bounded paced run, so every XLA compile must happen before it.
    sample0 = hw.read(timeout=300.0)
    mgr.switch("base_balance_controller")
    mgr.controllers["base_balance_controller"].warmup(sample0)
    mgr.tick()
    # wait for the bus to enter its paced loop (first post-warmup sample)
    hw.read(timeout=300.0)

    import gc

    gc.collect()
    gc.freeze()
    gc.disable()  # no collector pauses inside the measured window
    # Elevate for the window ONLY — and restore after: this runs inside
    # long-lived processes (pytest), and a leaked core-0 affinity +
    # nice(-15) would halve every subsequent test's CPU (observed: a
    # full-suite run 2× slower after the first realtime fixture).
    orig_affinity = None
    orig_nice = None
    try:
        orig_affinity = os.sched_getaffinity(0)
        orig_nice = os.getpriority(os.PRIO_PROCESS, 0)
    except (OSError, AttributeError):  # pragma: no cover
        pass
    rt_active = _try_realtime_priority(cpu=0, fifo=False)
    tick_t = []
    estop_sent_t = None
    estop_seen_t = None
    runnable_samples = []
    hw.timeout = 0.5  # bounded stale-read: bus death must not burn 5 s/tick
    try:
        for i in range(n_ticks):
            tick_t.append(time.perf_counter())
            if i % 32 == 0:  # during-window contention evidence (~8 Hz)
                runnable_samples.append(_procs_running())
                if not bus.is_alive():  # bus died/finished: stop
                    break
            if i == estop_tick and estop_sent_t is None:
                estop_sent_t = time.perf_counter()
                mgr.estop()
            sample = mgr.tick()
            if (
                estop_sent_t is not None
                and estop_seen_t is None
                and sample.estop
            ):
                estop_seen_t = time.perf_counter()
                # measured what we came for; drain a few ticks then stop
                for _ in range(8):
                    mgr.tick()
                break
    finally:
        gc.enable()
        _restore_scheduling(orig_affinity, orig_nice)

    bus.join(timeout=10.0)
    bus_stats = stats_q.get(timeout=10.0)

    dt = np.diff(np.asarray(tick_t))
    # skip the first 10 ticks (scheduler settling after compile)
    dt = dt[10:] if dt.size > 30 else dt
    if dt.size == 0:  # pragma: no cover — degenerate window
        dt = np.asarray([np.inf])
    report = {
        "rate_hz_nominal": rate_hz,
        "controller_ticks": len(tick_t),
        "controller_rate_hz": float(1.0 / dt.mean()),
        "jitter_p50": float(np.percentile(np.abs(dt - period), 50)),
        "jitter_p95": float(np.percentile(np.abs(dt - period), 95)),
        "jitter_p99": float(np.percentile(np.abs(dt - period), 99)),
        "estop_latency_s": (
            None
            if estop_seen_t is None or estop_sent_t is None
            else float(estop_seen_t - estop_sent_t)
        ),
        "contention_window": window_contention(runnable_samples),
        "runnable_mean": (
            float(np.mean(runnable_samples)) if runnable_samples else 0.0
        ),
        "rt_priority": rt_active,
    }
    report.update(bus_stats)
    return report


# CLI entry: scripts/measure_realtime.py (a plain-file __main__).
# Running this module via ``python -m`` is NOT supported: under runpy,
# multiprocessing 'spawn' children re-import the module as __mp_main__
# and hang in this sandbox; a file-based parent works reliably.
