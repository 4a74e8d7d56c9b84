"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding tests simulate a pod slice via
``--xla_force_host_platform_device_count`` (SURVEY.md §4: the reference has no
distributed tests; we create them).

Note: this environment pins ``JAX_PLATFORMS=axon`` (a tunneled TPU) via
sitecustomize, and re-exports of the env var are ignored — the only reliable
override is ``jax.config.update`` before first backend use. Tests must run on
CPU: eager dispatch over the TPU tunnel is orders of magnitude too slow for a
unit suite.
"""

import os

# MDEEPFRI_TPU_TESTS=1 leaves the real backend in place so the
# @pytest.mark.tpu smoke module (tests/test_tpu_smoke.py) can reach the
# actual chip:  MDEEPFRI_TPU_TESTS=1 pytest tests/test_tpu_smoke.py -q
_USE_REAL_TPU = os.environ.get("MDEEPFRI_TPU_TESTS") == "1"

if not _USE_REAL_TPU:
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: needs a real TPU backend (run via "
        "MDEEPFRI_TPU_TESTS=1, skipped otherwise)")
