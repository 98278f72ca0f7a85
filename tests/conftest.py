"""Test configuration: force a virtual 8-device CPU mesh.

All tests run on CPU with 8 virtual devices so multi-chip sharding paths can
be exercised without TPU hardware. These env vars must be set before jax
initializes its backends.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# persistent compilation cache: repeat test runs skip XLA compilation
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/uemda_tpu_jax_cache"
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
