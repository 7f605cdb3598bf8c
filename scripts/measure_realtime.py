"""Measure the cross-process realtime runtime: rate, jitter, e-stop latency.

≙ the reference's 400 Hz EtherCAT manager loop
(``balance_controller/src/ros_controller/balance_controller_manager.cpp:47-95``).
Two OS processes talk over the native shared-memory rings: a paced bus
process owning the plant, and this process running the balance
controller through ``ShmHardware``. Prints one JSON report.

Usage: python scripts/measure_realtime.py [duration_s] [rate_hz]

Forces the CPU backend: this measures the *host* realtime loop (the
reference's controller is a CPU process); a tunneled remote TPU's
per-dispatch latency is a sandbox artifact, not a runtime property.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# single-threaded math: intra-op pools only add cross-core wakeups
# that preempt the bus process on a 2-core box
os.environ["OMP_NUM_THREADS"] = "1"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_cpu_multi_thread_eigen=false"
).strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quadruped_locomotion_tpu.runtime.realtime_bench import measure  # noqa: E402
from quadruped_locomotion_tpu.utils import cache as _cache  # noqa: E402

_cache.enable()

if __name__ == "__main__":
    duration = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
    rate = float(sys.argv[2]) if len(sys.argv) > 2 else 400.0
    print(json.dumps(measure(duration_s=duration, rate_hz=rate)))
