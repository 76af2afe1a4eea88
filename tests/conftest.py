"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding paths are validated on virtual CPU devices
(xla_force_host_platform_device_count) since CI has at most one real TPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
