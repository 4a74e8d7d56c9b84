"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding tests simulate a pod slice via
``--xla_force_host_platform_device_count`` (SURVEY.md §4: the reference has no
distributed tests; we create them). Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
