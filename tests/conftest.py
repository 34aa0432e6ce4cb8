"""Test config: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is single-chip in CI; multi-chip sharding tests run on
XLA's host-platform virtual devices instead (SURVEY.md §4).

Note: this environment force-prefers the experimental 'axon' TPU platform
and IGNORES the JAX_PLATFORMS env var — the programmatic config update
below is the only override that actually works.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running test (excluded from the fast lane: "
        "pytest -m 'not slow', ~3-4 min)",
    )
