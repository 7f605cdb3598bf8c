"""Persistent XLA compilation cache setup.

First compile of the full rollout on TPU is minutes; enabling JAX's
persistent compilation cache makes every subsequent process start in
seconds. Call :func:`enable` early (before the first jit) from entry
points — it is a no-op if the config knob is unavailable.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
    ".jax_cache",
)


def enable(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "QLT_COMPILATION_CACHE_DIR", DEFAULT_DIR
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or read-only fs — run uncached
