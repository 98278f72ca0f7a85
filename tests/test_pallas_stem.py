"""Parity tests for the fused stem+maxpool Pallas kernel
(ops/pallas_stem.py) against the XLA composition it replaces
(fastpath stem conv + models/resnet._max_pool_3x3_s2), interpret mode."""

import numpy as np

import jax
import jax.numpy as jnp

from uemda_tpu.models.resnet import _max_pool_3x3_s2
from uemda_tpu.ops.pallas_stem import (
    pack_cw,
    pack_stem_weight,
    stem_pool_pallas,
)


def _xla_ref(xs, w4, b4):
    """fastpath's stem on the 2x2-s2d input: 4x4/s1 conv pad (2,1),
    conv output rounded to the input dtype, bias added in that dtype,
    ReLU, then the torch-style 3x3/s2 maxpool."""
    y = jax.lax.conv_general_dilated(
        xs, jnp.asarray(w4, xs.dtype), (1, 1), ((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = jax.nn.relu(y + jnp.asarray(b4, jnp.float32).astype(xs.dtype))
    return _max_pool_3x3_s2(y)


def _make(seed, b=2, h2=32, dtype=jnp.float32):
    r = np.random.default_rng(seed)
    xs = jnp.asarray(r.normal(size=(b, h2, h2, 12)), dtype)
    w4 = r.normal(size=(4, 4, 12, 64)).astype(np.float32) * 0.2
    b4 = r.normal(size=(64,)).astype(np.float32)
    return xs, w4, b4


def _run(xs, w4, b4, pool_rows):
    wp, bp = pack_stem_weight(w4, b4)
    return stem_pool_pallas(
        pack_cw(xs), jnp.asarray(wp, xs.dtype), jnp.asarray(bp),
        pool_rows=pool_rows,
    )


def test_single_band_matches_xla():
    xs, w4, b4 = _make(0)
    ref = _xla_ref(xs, w4, b4)
    out = _run(xs, w4, b4, pool_rows=16)  # h4 == 16 -> one band
    assert out.shape == ref.shape, (out.shape, ref.shape)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_multi_band_matches_xla():
    xs, w4, b4 = _make(1)
    ref = _xla_ref(xs, w4, b4)
    for p in (8, 4, 2):  # 2, 4, 8 bands: first/interior/last DMA paths
        out = _run(xs, w4, b4, pool_rows=p)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_bf16_rounding_matches_xla():
    xs, w4, b4 = _make(2, dtype=jnp.bfloat16)
    ref = _xla_ref(xs, w4, b4)
    out = _run(xs, w4, b4, pool_rows=8)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=1.6e-2, atol=1.6e-2,
    )
