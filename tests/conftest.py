"""Test configuration: force an 8-device virtual CPU mesh.

Tests must run without TPU hardware and must exercise multi-device sharding;
``xla_force_host_platform_device_count=8`` gives 8 virtual CPU devices in one
process (see SURVEY.md §4 "Distributed-without-a-cluster").

NOTE: the axon environment pins ``JAX_PLATFORMS=axon`` via sitecustomize, so a
``setdefault`` is not enough — we must overwrite the env var *and* set the
config after import (the sitecustomize runs before any of this).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compile cache keeps repeated test runs fast
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass
