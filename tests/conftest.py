"""Test env: force CPU platform with 8 virtual devices (multi-chip sharding tests).

This mirrors the TPU-native testing strategy in SURVEY.md section 4: JAX's
host-platform device-count trick is the analog of multi-node testing without a
cluster. Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
