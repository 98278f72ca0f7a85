"""instance_norm_1read (ops/pallas_insnorm.py) must equal the XLA
instance_norm (models/deeplabv2.py) — same two-pass f32 statistics, one
HBM read. Runs in Pallas interpret mode on the CPU mesh."""

import numpy as np

import jax.numpy as jnp

from uemda_tpu.models.deeplabv2 import instance_norm
from uemda_tpu.ops.pallas_insnorm import instance_norm_1read


def test_insnorm_pallas_matches_xla_f32():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(2.0, 3.0, size=(2, 16, 16, 256)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(instance_norm_1read(x)), np.asarray(instance_norm(x)),
        atol=1e-5, rtol=1e-5)


def test_insnorm_pallas_bf16_rounding_matches():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 128)), jnp.bfloat16)
    got = np.asarray(instance_norm_1read(x), np.float32)
    ref = np.asarray(instance_norm(x), np.float32)
    np.testing.assert_allclose(got, ref, atol=1e-2, rtol=1e-2)


def test_insnorm_fallback_off_grid():
    """channels not a multiple of 128 / odd W take the XLA path exactly."""
    rng = np.random.default_rng(2)
    for shape in ((2, 7, 7, 96), (1, 8, 12, 130)):
        x = jnp.asarray(rng.normal(size=shape), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(instance_norm_1read(x)), np.asarray(instance_norm(x)),
            atol=1e-6, rtol=1e-6)
