"""Test config: force CPU with 8 virtual devices for multi-chip tests.

The session's profile exports JAX_PLATFORMS=axon (one real tunneled TPU);
tests must run hermetically on host CPU, with an 8-device virtual mesh for
the sharding tests (SURVEY.md §4).  Note JAX_PLATFORMS from the
environment wins over ours, so we use jax.config directly.
"""

import os

# Unconditional APPEND (setdefault would no-op whenever the environment
# already exports XLA_FLAGS, silently dropping the 8-device flag and
# skipping every mesh/sharding test with a green-looking run).
if "--xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tests")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
