"""Fused Pallas kernels (interpret mode on CPU): uvem_mine_pallas must match
the XLA ops (pseudo_selection + pixel_entropy + uvem_weight) exactly, and
crop_normalize_pallas must match dynamic_slice + normalize."""

import numpy as np

import jax
import jax.numpy as jnp

from uemda_tpu.ops.pallas_kernels import crop_normalize_pallas, uvem_mine_pallas
from uemda_tpu.ops.pseudo import pseudo_selection
from uemda_tpu.ops.uncertainty import pixel_entropy, uvem_weight


def test_uvem_mine_matches_xla_ops():
    rng = np.random.default_rng(0)
    b, h, w, c = 2, 24, 40, 6
    logits = rng.normal(0, 2.0, (b, h, w, c)).astype(np.float32)
    probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)
    label, wgt, u = uvem_mine_pallas(
        probs, cutoff_top=0.8, cutoff_low=0.6, m=0.2, threshold=0.7, gamma=4.0
    )
    want_label = pseudo_selection(probs, 0.8, 0.6, -1)
    want_u = pixel_entropy(probs)
    want_w = uvem_weight(want_u, 0.2, 0.7, 4.0)
    np.testing.assert_array_equal(np.asarray(label), np.asarray(want_label))
    np.testing.assert_allclose(np.asarray(u), np.asarray(want_u), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(wgt), np.asarray(want_w), rtol=1e-5, atol=1e-7)


def test_uvem_mine_degenerate_params():
    """m=0 (no left branch) and m>=t (right branch zero)."""
    rng = np.random.default_rng(1)
    probs = jax.nn.softmax(jnp.asarray(rng.normal(0, 1, (1, 16, 16, 7)), jnp.float32))
    for m, t in [(0.0, 0.5), (0.6, 0.5)]:
        _, wgt, u = uvem_mine_pallas(probs, m=m, threshold=t)
        want = uvem_weight(pixel_entropy(probs), m, t, 4.0)
        np.testing.assert_allclose(np.asarray(wgt), np.asarray(want), rtol=1e-5,
                                   atol=1e-7)


def test_crop_normalize_matches_xla():
    rng = np.random.default_rng(2)
    b, h, w = 3, 40, 56
    th, tw = 16, 24
    images = (rng.random((b, h, w, 3)) * 255).astype(np.float32)
    offsets = np.stack(
        [rng.integers(0, h - th + 1, b), rng.integers(0, w - tw + 1, b)], axis=1
    ).astype(np.int32)
    mean, std = (97.5, 86.4, 92.4), (36.2, 35.7, 35.3)
    got = np.asarray(crop_normalize_pallas(
        jnp.asarray(images), jnp.asarray(offsets), (th, tw), mean, std
    ))
    for i in range(b):
        y, x = offsets[i]
        want = (images[i, y:y + th, x:x + tw] - np.asarray(mean)) / np.asarray(std)
        np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-5)
