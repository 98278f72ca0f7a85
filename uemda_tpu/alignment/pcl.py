"""Prototype contrastive loss.

Rebuilds ``PrototypeContrastiveLoss`` (reference ``uemda/loss.py:10-47``):
cross-entropy over (L2-normalized feature) . (L2-normalized prototypes)^T / T
logits, with ignored pixels masked out of the mean. The torch version drops
ignored rows by boolean indexing; here the same mean is computed with a
fixed-shape masked reduction so the op stays jittable. The (N, K) x (K, C)
similarity is one MXU GEMM.
"""

import jax.numpy as jnp

from uemda_tpu.alignment.losses import cross_entropy_per_pixel


def _l2_normalize(x, axis=-1, eps=1e-12):
    # torch F.normalize: x / max(||x||, eps)
    n = jnp.sqrt((x * x).sum(axis=axis, keepdims=True))
    return x / jnp.maximum(n, eps)


def prototype_contrastive_loss(
    prototypes: jnp.ndarray,
    feat: jnp.ndarray,
    labels: jnp.ndarray,
    temperature: float = 8.0,
    ignore_label: int = -1,
) -> jnp.ndarray:
    """prototypes (C, K) [no grad], feat (..., K), labels matching feat's
    leading dims."""
    k = feat.shape[-1]
    f = _l2_normalize(feat.reshape(-1, k).astype(jnp.float32))
    p = _l2_normalize(jnp.asarray(prototypes, jnp.float32))
    logits = (f @ p.T) / temperature  # (N, C)
    y = labels.reshape(-1)
    ce = cross_entropy_per_pixel(logits, y, ignore_label)
    valid = (y != ignore_label).sum().astype(jnp.float32)
    return ce.sum() / jnp.maximum(valid, 1.0)
