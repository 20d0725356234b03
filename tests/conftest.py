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


def pytest_collection_modifyitems(config, items):
    """Two-tier suite (VERDICT r4 next#7): tests listed in slow_tests.txt
    (>= 15 s measured on the CI rig) get the `slow` marker, so the default
    CI tier `-m "not slow"` finishes in minutes while covering every
    subsystem at toy size. Exceptions kept fast for sole-coverage reasons
    are simply absent from the list (two-process multihost, scheduled
    solve, one bf16-coefficient pin). The full suite runs everything.
    """
    import pytest as _pytest

    listed = set()
    path = os.path.join(os.path.dirname(__file__), "slow_tests.txt")
    try:
        with open(path) as f:
            for ln in f:
                ln = ln.strip()
                if ln and not ln.startswith("#"):
                    listed.add(ln)
    except OSError:
        return
    for item in items:
        nodeid = item.nodeid.replace("\\", "/")
        if not nodeid.startswith("tests/"):
            nodeid = "tests/" + nodeid.split("tests/")[-1]
        if nodeid in listed:
            item.add_marker(_pytest.mark.slow)
