"""Observability: on-device ring-buffer logging + host-side timers/tracing.

≙ the reference's structured data logging (SURVEY.md §5): the balance
controller keeps in-memory ring buffers of 10000 samples of desired/
actual robot state, joint commands, leg states and phases, and replays
them in a burst when ``/capture_log_data`` is called
(``ros_balance_controller.cpp:17-18, 173-190, 606-716, 1173-1191``);
timing instrumentation is ``std_utils::HighResolutionClockTimer`` around
the SQP solves (``PoseOptimizationSQP.cpp:27, 60-62``).

TPU-native re-design:

* :class:`RingLog` — a pytree of fixed-shape device arrays with a write
  cursor; :func:`record` is pure and jit/scan-compatible (a
  ``dynamic_update_slice`` per leaf, no host sync). Sampling every
  control tick inside the rollout scan costs one HBM store per leaf —
  no host round-trips until :func:`capture`.
* :func:`capture` — the ``/capture_log_data`` equivalent: pulls the
  buffer to host once and returns samples in chronological order.
* :class:`Timer` — pin/split wall-clock timing with named laps.
* :func:`trace_annotation` / :func:`start_profiler` — JAX profiler
  integration (XLA-level traces replace the reference's ad-hoc prints).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

DEFAULT_CAPACITY = 10_000  # ≙ ros_balance_controller.cpp:17-18


@struct.dataclass
class RingLog:
    """Fixed-capacity ring buffer over an arbitrary sample pytree."""

    buffers: Any  # pytree; each leaf (capacity, *sample_shape)
    cursor: jax.Array  # scalar int32 — next write slot
    total: jax.Array  # scalar int32 — samples ever written

    @property
    def capacity(self) -> int:
        return jax.tree_util.tree_leaves(self.buffers)[0].shape[0]


def ring_log(sample: Any, capacity: int = DEFAULT_CAPACITY) -> RingLog:
    """Allocate a log sized for ``sample``'s pytree structure."""
    bufs = jax.tree_util.tree_map(
        lambda x: jnp.zeros(
            (capacity,) + jnp.asarray(x).shape, jnp.asarray(x).dtype
        ),
        sample,
    )
    return RingLog(
        buffers=bufs,
        cursor=jnp.asarray(0, jnp.int32),
        total=jnp.asarray(0, jnp.int32),
    )


def record(log: RingLog, sample: Any) -> RingLog:
    """Append one sample (pure; safe inside jit/scan)."""
    idx = log.cursor

    def put(buf, x):
        return jax.lax.dynamic_update_index_in_dim(
            buf, jnp.asarray(x, buf.dtype), idx, 0
        )

    bufs = jax.tree_util.tree_map(put, log.buffers, sample)
    cap = log.capacity
    return RingLog(
        buffers=bufs,
        cursor=(idx + 1) % cap,
        total=log.total + 1,
    )


def capture(log: RingLog) -> dict | Any:
    """≙ ``/capture_log_data``: device→host once, oldest-first order.

    Returns the sample pytree with a leading time axis of
    ``min(total, capacity)``.
    """
    total = int(jax.device_get(log.total))
    cursor = int(jax.device_get(log.cursor))
    cap = log.capacity
    n = min(total, cap)
    host = jax.device_get(log.buffers)

    def order(buf):
        if total <= cap:
            return np.asarray(buf[:n])
        return np.concatenate([buf[cursor:], buf[:cursor]], axis=0)

    return jax.tree_util.tree_map(order, host)


class Timer:
    """Wall-clock pin/split timer with named laps
    (≙ ``std_utils::HighResolutionClockTimer``)."""

    def __init__(self):
        self._pins: dict[str, float] = {}
        self.laps: dict[str, list[float]] = {}

    def pin(self, name: str = "default") -> None:
        self._pins[name] = time.perf_counter()

    def split(self, name: str = "default") -> float:
        dt = time.perf_counter() - self._pins[name]
        self.laps.setdefault(name, []).append(dt)
        return dt

    def mean(self, name: str = "default") -> float:
        xs = self.laps.get(name, [])
        return sum(xs) / len(xs) if xs else float("nan")

    @contextlib.contextmanager
    def lap(self, name: str = "default"):
        self.pin(name)
        try:
            yield self
        finally:
            self.split(name)


def trace_annotation(name: str):
    """Named region in JAX profiler traces (viewable in
    TensorBoard/xprof) — use around host-side stages."""
    return jax.profiler.TraceAnnotation(name)


def start_profiler(logdir: str) -> None:
    jax.profiler.start_trace(logdir)


def stop_profiler() -> None:
    jax.profiler.stop_trace()
