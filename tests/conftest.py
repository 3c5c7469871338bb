"""Test configuration: tests run on CPU (float64 for golden parity against
the double-precision reference) with 8 virtual devices so sharding tests
exercise a real mesh without TPU hardware.

Note: this environment pins JAX_PLATFORMS=axon (remote TPU tunnel) and a
sitecustomize re-asserts it, so the env var cannot be overridden here —
jax.config is authoritative instead.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
