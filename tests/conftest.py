"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

All unit tests run without TPU hardware. Multi-chip sharding paths are
exercised on 8 virtual CPU devices via XLA_FLAGS, mirroring how the driver
dry-runs the multichip path (see __graft_entry__.dryrun_multichip).
"""
import os

# Force CPU: the session environment pins JAX_PLATFORMS=axon (real TPU
# tunnel), and jax may already be pre-imported at interpreter startup, so we
# must both override the env var and update jax.config before first use.
os.environ["JAX_PLATFORMS"] = "cpu"
# Keep transformers from importing TensorFlow (slow, unused).
os.environ.setdefault("USE_TF", "0")
os.environ.setdefault("USE_TORCH", "1")
os.environ.setdefault("TRANSFORMERS_VERBOSITY", "error")
# Persistent XLA compilation cache: repeat test runs skip recompiles.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("MODEL_ID", "Qwen/Qwen3-ASR-1.7B")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices()
