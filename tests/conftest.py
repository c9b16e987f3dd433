"""Test configuration: force a virtual 8-device CPU platform.

Multi-chip sharding is validated on a host-platform mesh (the standard JAX
trick), mirroring how the reference's behavior would be validated without a
GPU farm. These env vars must be set before jax initializes its backends,
hence they live at conftest import time.
"""
import os

# Force CPU: the host environment pins JAX to the TPU plugin ("axon") and
# rewrites JAX_PLATFORMS, so the env var alone is not enough — the config
# update below is authoritative. Tests need the virtual multi-device CPU
# mesh and exact fp32 numerics.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep compilation deterministic-ish and quick on CPU.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite is dominated by CPU compiles
# of the model zoo (the test host has one core); caching them makes repeat
# runs minutes instead of tens of minutes. Safe to delete at any time.
_CACHE_DIR = os.environ.get(
    "DAHITRA_TEST_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
