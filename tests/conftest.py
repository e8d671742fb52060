"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This is the TPU analogue of "test multi-node without a cluster" (SURVEY.md §4):
all sharding/collective paths compile and execute against 8 virtual CPU
devices so the suite needs no TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
