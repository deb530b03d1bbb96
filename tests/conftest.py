"""Test rig: force an 8-device virtual CPU platform before JAX initializes.

This lets every multi-chip sharding test run on CPU-only machines
(SURVEY.md §4: the reference has no test suite at all; this harness is new).
"""

import os

# Must be set before jax is imported anywhere in the test process.
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
