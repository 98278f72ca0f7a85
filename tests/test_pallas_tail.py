"""tail_upsample_softmax_mean (ops/pallas_tail.py — measured alternate)
must match serving_forward's XLA eval tail: resize(align_corners=True) ->
per-head softmax -> average (reference Encoder.py:152-155). Interpret
mode on the CPU mesh; exact in f32."""

import numpy as np

import jax
import jax.numpy as jnp

from uemda_tpu.ops.pallas_tail import tail_upsample_softmax_mean
from uemda_tpu.ops.resize import resize_bilinear


def _xla_tail(cat, out_hw, g, nc):
    up = resize_bilinear(cat, out_hw, align_corners=True)
    probs = sum(
        jax.nn.softmax(up[..., i * nc:(i + 1) * nc], axis=-1)
        for i in range(g)
    )
    return probs / g


def test_tail_kernel_matches_xla_f32():
    rng = np.random.default_rng(0)
    for g, nc, hi, ho in ((2, 6, 8, 64), (2, 7, 16, 48), (1, 6, 8, 32)):
        cat = jnp.asarray(rng.normal(size=(2, hi, hi, g * nc)) * 3,
                          jnp.float32)
        ref = np.asarray(_xla_tail(cat, (ho, ho), g, nc))
        got = np.asarray(tail_upsample_softmax_mean(cat, (ho, ho), g, nc))
        np.testing.assert_allclose(got, ref, atol=2e-6, rtol=2e-6)
        np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-5)
