"""Test configuration: force CPU backend with 8 virtual devices.

Mirrors the driver's multi-chip dry-run environment so sharding tests
(`jax.sharding.Mesh` over 8 devices) run without TPU hardware.

NOTE: this image's sitecustomize (axon) imports jax at interpreter startup
and registers a real-TPU backend, so env vars set here are too late for
platform selection — `jax.config.update("jax_platforms", ...)` is the
reliable override (it takes effect because backends initialize lazily).
XLA_FLAGS must still be set before the first backend query.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compilation cache: repeat suite runs skip the (dominant)
# XLA compile cost
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_eval_driving_safety"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual-CPU mesh, not the tunneled TPU")
assert len(jax.devices()) == 8
