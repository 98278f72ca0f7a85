"""Runtime knobs: persistent XLA compilation cache + readback sync.

The big jitted stage graphs (dual ResNet-50 forwards + refinement + backward)
take minutes to compile; the persistent cache makes every later process
start instantly. Called by all tools/bench entry points.
"""

import os

import jax


def enable_compile_cache(path: str = "/tmp/uemda_tpu_jax_cache"):
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


def sync(x) -> float:
    """Force completion via scalar readback (block_until_ready does not block
    through the axon TPU tunnel)."""
    import jax.numpy as jnp

    return float(jnp.asarray(x).reshape(-1)[0])
