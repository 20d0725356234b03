"""Test configuration: 8 virtual CPU devices.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths are
exercised without TPU hardware (SURVEY.md §4). Note: this environment
pre-imports jax via a sitecustomize hook and pins the `axon` (tunneled TPU)
platform, so JAX_PLATFORMS env vars are ineffective here — we must use
jax.config.update before any backend is initialized. XLA_FLAGS is still read
lazily at CPU client creation.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
