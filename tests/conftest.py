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

import pytest


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_programs_between_modules():
    """Free each module's compiled executables when it finishes.

    The full suite compiles several hundred XLA:CPU programs in one
    process; past a cumulative code volume the LLVM JIT segfaults on a
    later compile (observed deterministically at the same test with two
    different orderings). Dropping executables at module boundaries keeps
    the resident code volume bounded; each module's programs are not
    shared across modules anyway (every file builds its own configs)."""
    yield
    jax.clear_caches()
