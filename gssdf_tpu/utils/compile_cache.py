"""Persistent XLA compilation cache.

No reference analog (CUDA JITs are cached by the driver); on this TPU the
first compile of a big jitted graph costs 30 s - 5 min through the device
tunnel, and an interrupted validation run repays every compile on restart.
The persistent cache turns a resume's warmup into cache hits.

Opt out with ``GSSDF_NO_COMPILE_CACHE=1`` (e.g. when benchmarking compile
time itself).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/gssdf_jax_cache")


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Best-effort enable; returns the cache dir or None when disabled."""
    if os.environ.get("GSSDF_NO_COMPILE_CACHE"):
        return None
    cache_dir = path or os.environ.get("GSSDF_COMPILE_CACHE", _DEFAULT_DIR)
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything: tunnel round-trips make even small compiles slow
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        return None
    return cache_dir
