"""Persistent XLA compilation cache for the library and CLI.

The Pallas megakernel's cold compile is minutes on a fresh TPU host; the
cache turns every subsequent session (same scene/shape) into a disk load.
The test suite configures its own cache (tests/conftest.py); this covers
library and CLI users, who previously got no caching at all.
"""

from __future__ import annotations

import os

_ENABLED = False


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Point jax's compilation cache at a durable directory (idempotent).

    Resolution order: explicit argument > CORNELIS_CACHE_DIR env var >
    ~/.cache/cornelis_tpu/jax. Respects an already-configured cache (a user
    or test harness that set jax_compilation_cache_dir wins). Returns the
    directory in effect, or None when disabled via CORNELIS_CACHE_DIR="".
    """
    global _ENABLED
    import jax

    current = jax.config.jax_compilation_cache_dir
    if current:
        return current
    if cache_dir is None:
        cache_dir = os.environ.get("CORNELIS_CACHE_DIR")
        if cache_dir == "":
            return None  # explicit opt-out
    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "cornelis_tpu", "jax"
        )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    if not _ENABLED:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        _ENABLED = True
    return cache_dir
