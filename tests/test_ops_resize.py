"""Resize/pool ops vs torch golden values (exact semantics parity)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as tnf

import jax.numpy as jnp

from uemda_tpu.ops.resize import adaptive_avg_pool, resize_bilinear


def _rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize(
    "hw_in,hw_out",
    [((32, 32), (512, 512)), ((16, 24), (64, 48)), ((64, 64), (32, 32)), ((7, 7), (13, 11))],
)
def test_resize_matches_torch(align, hw_in, hw_out):
    x = _rand((2, *hw_in, 5))
    got = np.asarray(resize_bilinear(jnp.asarray(x), hw_out, align_corners=align))
    want = (
        tnf.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            size=hw_out,
            mode="bilinear",
            align_corners=align,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("scale", [1, 2, 3, 6])
def test_adaptive_avg_pool_matches_torch(scale):
    x = _rand((2, 32, 32, 5), seed=3)
    got = np.asarray(adaptive_avg_pool(jnp.asarray(x), scale))
    want = (
        tnf.adaptive_avg_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), scale)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_resize_identity():
    x = _rand((1, 8, 8, 3))
    got = np.asarray(resize_bilinear(jnp.asarray(x), (8, 8)))
    np.testing.assert_array_equal(got, x)


def test_adaptive_avg_pool_multi_matches_per_scale():
    """adaptive_avg_pool_multi must equal per-scale adaptive_avg_pool
    exactly (same matrices, same accumulation — just one read of x)."""
    from uemda_tpu.ops.resize import adaptive_avg_pool_multi

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 32)).astype(np.float32))
    scales = (1, 2, 3, 6)
    multi = adaptive_avg_pool_multi(x, scales)
    for s in scales:
        np.testing.assert_allclose(
            np.asarray(multi[s]), np.asarray(adaptive_avg_pool(x, s)),
            atol=1e-6, rtol=1e-6)
