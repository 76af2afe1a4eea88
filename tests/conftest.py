"""Test configuration: force CPU with an 8-device virtual mesh.

The container's axon TPU plugin force-selects platform 'axon' during
sitecustomize (overriding JAX_PLATFORMS), so we must override back via
jax.config *after* import. Multi-chip sharding paths are validated on
virtual CPU devices (xla_force_host_platform_device_count).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu"
