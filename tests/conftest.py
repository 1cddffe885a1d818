"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding tests run on CPU via
``--xla_force_host_platform_device_count=8`` so they need no TPU hardware.

Note: this environment's TPU plugin (axon) force-sets
``jax_platforms="axon,..."`` from sitecustomize, overriding the
JAX_PLATFORMS env var, so we must update the jax config *after* import
(before any backend is initialized) to actually land on CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
