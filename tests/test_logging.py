"""Ring-buffer logger + timer tests (≙ the controller's 10000-sample
capture/replay, ``ros_balance_controller.cpp:606-716``)."""

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_locomotion_tpu.utils import logging as qlog


def test_record_and_capture_in_order():
    sample = {"tau": jnp.zeros((4, 3)), "t": jnp.asarray(0.0)}
    log = qlog.ring_log(sample, capacity=16)

    def tick(log, i):
        s = {
            "tau": jnp.full((4, 3), i, jnp.float32),
            "t": i.astype(jnp.float32),
        }
        return qlog.record(log, s), None

    log, _ = jax.jit(
        lambda l: jax.lax.scan(tick, l, jnp.arange(10))
    )(log)
    out = qlog.capture(log)
    assert out["t"].shape == (10,)
    np.testing.assert_array_equal(out["t"], np.arange(10, dtype=np.float32))


def test_wraparound_keeps_newest_oldest_first():
    sample = {"t": jnp.asarray(0.0)}
    log = qlog.ring_log(sample, capacity=8)

    def tick(log, i):
        return qlog.record(log, {"t": i.astype(jnp.float32)}), None

    log, _ = jax.jit(
        lambda l: jax.lax.scan(tick, l, jnp.arange(20))
    )(log)
    out = qlog.capture(log)
    np.testing.assert_array_equal(
        out["t"], np.arange(12, 20, dtype=np.float32)
    )


def test_rollout_with_logging_stays_on_device():
    """A scan that logs every substep must not change results."""
    sample = {"x": jnp.zeros(3)}
    log = qlog.ring_log(sample, capacity=100)

    def body(carry, _):
        x, log = carry
        x = x + 1.0
        log = qlog.record(log, {"x": x})
        return (x, log), None

    (x, log), _ = jax.jit(
        lambda c: jax.lax.scan(body, c, None, length=50)
    )((jnp.zeros(3), log))
    cap = qlog.capture(log)
    np.testing.assert_allclose(cap["x"][-1], x)
    np.testing.assert_allclose(cap["x"][0], np.ones(3))


def test_timer_laps():
    t = qlog.Timer()
    with t.lap("a"):
        pass
    t.pin("b")
    d = t.split("b")
    assert d >= 0.0
    assert t.mean("a") >= 0.0
