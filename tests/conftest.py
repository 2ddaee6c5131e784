"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

All unit tests run without TPU hardware. Multi-chip sharding paths are
exercised on 8 virtual CPU devices via XLA_FLAGS, mirroring how the driver
dry-runs the multichip path (see __graft_entry__.dryrun_multichip).
"""
import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("MODEL_ID", "Qwen/Qwen3-ASR-1.7B")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    import jax
    return jax.devices()
