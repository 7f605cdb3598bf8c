"""Test harness: force JAX onto a virtual 8-device CPU mesh.

The execution environment injects a TPU PJRT plugin (axon) into every
Python process via sitecustomize and re-forces ``JAX_PLATFORMS=axon``;
plain env vars are therefore not enough — we must override the config
knob directly before any backend is initialized. Multi-chip sharding
paths are validated on the virtual CPU mesh; the real-TPU path is
exercised by bench.py.
"""

import os

# XLA:CPU's AOT loader logs a benign machine-feature nag (E cpu_aot_loader)
# for every persistent-cache hit (+prefer-no-scatter pseudo-features are
# recorded at compile but not reported by the host query — same machine,
# no real mismatch). Keep test output readable; Python-level errors are
# unaffected.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite is compile-dominated on
# this 2-core host (the closed-loop scan alone is minutes of XLA:CPU
# lowering); caching compiled executables across runs turns repeat
# suite runs from ~50 min into minutes. Safe for correctness — the
# cache key covers HLO, platform, flags, and compiler version.
from quadruped_locomotion_tpu.utils import cache as _cache  # noqa: E402

_cache.enable()
