"""Segment reductions vs numpy groupby golden values."""

import numpy as np

import jax.numpy as jnp

from uemda_tpu.ops.segment import (
    segment_max,
    segment_sum,
    superpixel_expand,
    superpixel_view_probs,
)


def test_segment_sum_matches_numpy():
    rng = np.random.default_rng(0)
    data = rng.standard_normal((2, 100, 4)).astype(np.float32)
    ids = rng.integers(0, 10, size=(2, 100))
    got = np.asarray(segment_sum(jnp.asarray(data), jnp.asarray(ids), 12))
    want = np.zeros((2, 12, 4), np.float32)
    for b in range(2):
        for n in range(100):
            want[b, ids[b, n]] += data[b, n]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_segment_max_matches_numpy():
    rng = np.random.default_rng(1)
    data = rng.standard_normal((2, 100, 3)).astype(np.float32)
    ids = rng.integers(0, 8, size=(2, 100))
    got = np.asarray(segment_max(jnp.asarray(data), jnp.asarray(ids), 8))
    want = np.full((2, 8, 3), -np.inf, np.float32)
    for b in range(2):
        for n in range(100):
            want[b, ids[b, n]] = np.maximum(want[b, ids[b, n]], data[b, n])
    # only compare occupied segments
    occ = np.isfinite(want)
    np.testing.assert_allclose(got[occ], want[occ], rtol=1e-6)


def test_superpixel_view_probs_pools_max_per_segment():
    probs = np.zeros((1, 4, 4, 2), np.float32)
    sup = np.zeros((1, 4, 4), np.int64)
    sup[0, :, 2:] = 1
    probs[0, 0, 0] = [0.9, 0.1]  # max for segment 0
    probs[0, 0, 3] = [0.2, 0.8]  # max for segment 1
    out = np.asarray(superpixel_view_probs(jnp.asarray(probs), jnp.asarray(sup), 4))
    np.testing.assert_allclose(out[0, 3, 1], [0.9, 0.1])
    np.testing.assert_allclose(out[0, 3, 3], [0.2, 0.8])


def test_superpixel_expand_majority():
    label = np.full((1, 4, 4), -1, np.int32)
    sup = np.zeros((1, 4, 4), np.int64)
    sup[0, :, 2:] = 1
    label[0, 0, 0] = 3
    label[0, 1, 0] = 3
    label[0, 2, 0] = 1
    out = np.asarray(superpixel_expand(jnp.asarray(label), jnp.asarray(sup), 6, 4))
    assert (out[0, :, :2] == 3).all()  # left segment: majority class 3
    assert (out[0, :, 2:] == -1).all()  # right segment: no labels -> ignore


def test_pallas_segment_kernels_match_xla():
    """Pallas kernels (interpret mode on CPU) vs the XLA segment ops."""
    import jax

    from uemda_tpu.ops.pallas_kernels import segment_max_pallas, segment_sum_pallas

    rng = np.random.default_rng(7)
    data = jnp.asarray(rng.random((2, 256, 6)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 17, (2, 256)), jnp.int32)
    ref_max = segment_max(data, ids, 20)
    got_max = segment_max_pallas(data, ids, 20, tile=128)
    occ = np.asarray(ref_max) > -1e30
    np.testing.assert_allclose(
        np.asarray(got_max)[occ], np.asarray(ref_max)[occ], rtol=1e-5
    )
    ref_sum = segment_sum(data, ids, 20)
    got_sum = segment_sum_pallas(data, ids, 20, tile=128)
    np.testing.assert_allclose(
        np.asarray(got_sum), np.asarray(ref_sum), rtol=1e-4, atol=1e-5
    )


def test_pallas_segment_gather_matches_take_along_axis():
    """The one-hot-matmul gather-back kernel vs take_along_axis."""
    from uemda_tpu.ops.pallas_kernels import segment_gather_pallas

    rng = np.random.default_rng(11)
    seg_vals = jnp.asarray(rng.random((2, 20, 6)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 20, (2, 250)), jnp.int32)
    ref = jnp.take_along_axis(seg_vals, ids[..., None], axis=1)
    got = segment_gather_pallas(seg_vals, ids, tile=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)


def test_superpixel_view_probs_pallas_impl_matches_xla():
    rng = np.random.default_rng(12)
    probs = jnp.asarray(rng.random((2, 16, 16, 6)), jnp.float32)
    sup = jnp.asarray(rng.integers(0, 10, (2, 16, 16)), jnp.int32)
    ref = superpixel_view_probs(probs, sup, 12, impl="xla")
    got = superpixel_view_probs(probs, sup, 12, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5)
