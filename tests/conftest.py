"""Test configuration: force a virtual 8-device CPU mesh so sharding tests run
anywhere (reference had no tests at all — SURVEY.md §4).

Note: this environment pre-sets ``jax_platforms`` via a site config, so the
``JAX_PLATFORMS`` env var alone is not enough — we override through
``jax.config`` before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
