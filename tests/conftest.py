"""Test configuration: force CPU with 8 virtual devices for sharding tests.

The environment's sitecustomize registers the TPU ('axon') PJRT plugin and
forces jax_platforms at interpreter startup, so setting env vars is not
enough — we must also override the jax config before any device is used.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
