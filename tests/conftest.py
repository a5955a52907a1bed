"""Test configuration: force CPU backend with 8 virtual devices.

Mirrors the driver's multi-chip dry-run environment so sharding tests
(`jax.sharding.Mesh` over 8 devices) run without TPU hardware.
Must run before `jax` is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
