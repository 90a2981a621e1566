"""Test configuration: force an 8-device virtual CPU mesh.

Tests must run without TPU hardware and must exercise multi-device sharding;
`xla_force_host_platform_device_count=8` gives 8 virtual CPU devices in one
process (see SURVEY.md §4 "Distributed-without-a-cluster").

This must run before jax is imported anywhere in the test session.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
