"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This is the TPU analogue of "test multi-node without a cluster" (SURVEY.md §4):
all sharding/collective paths compile and execute against 8 virtual CPU
devices so the suite needs no TPU hardware.

Note: the environment's TPU plugin can override ``JAX_PLATFORMS`` from the
env, so the platform is also pinned through ``jax.config`` (must happen
before any backend initialization — hence here, at conftest import time).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
