"""Test configuration: force CPU with 8 virtual devices so sharding tests
run without TPU hardware (SURVEY.md §4). Must run before jax is imported."""

import os

# Force CPU even when the ambient environment pins JAX_PLATFORMS to a TPU
# plugin — tests must run hermetically on 8 virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The ambient environment may pin the platform at the config level (not just
# the env var), so set it explicitly after import as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
