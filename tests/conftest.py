"""Test rig: force an 8-device virtual CPU platform.

This environment registers a tunneled TPU ("axon") PJRT plugin from
sitecustomize and pins JAX_PLATFORMS=axon *after* interpreter start, so env
vars are not enough — the platform must be overridden through jax.config
before the first backend use. 8 CPU devices let every multi-chip sharding
test run anywhere (SURVEY.md §4: the reference has no test suite; this
harness is new).
"""

import os

# belt-and-braces for subprocesses spawned by tests
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
