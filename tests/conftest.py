"""Test configuration: force a virtual 8-device CPU mesh.

All tests run on CPU with 8 virtual devices so multi-chip sharding paths can
be exercised without TPU hardware.

NOTE: this machine's sitecustomize (PYTHONPATH=/root/.axon_site) imports jax
at interpreter startup and registers the axon TPU backend, so setting
JAX_PLATFORMS here is too late — the override must go through
``jax.config.update``. XLA_FLAGS is still honored because backends
initialize lazily at first use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# persistent compilation cache: repeat test runs skip XLA compilation
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/uemda_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8, jax.devices()
