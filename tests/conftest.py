"""Test env: force CPU platform with 8 virtual devices (multi-chip sharding tests).

This mirrors the TPU-native testing strategy in SURVEY.md section 4: JAX's
host-platform device-count trick is the analog of multi-node testing without a
cluster.

NOTE: the JAX_PLATFORMS env var is overridden by the axon TPU plugin on this host
(it resets jax_platforms to "axon,cpu" at plugin load), so we must also force the
platform through jax.config after import. XLA_FLAGS must still be set before the
first backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
