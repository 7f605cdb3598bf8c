"""Test harness: force JAX onto a virtual 8-device CPU mesh.

The execution environment injects a TPU PJRT plugin (axon) into every
Python process via sitecustomize and re-forces ``JAX_PLATFORMS=axon``;
plain env vars are therefore not enough — we must override the config
knob directly before any backend is initialized. Multi-chip sharding
paths are validated on the virtual CPU mesh; the real-TPU path is
exercised by bench.py.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
