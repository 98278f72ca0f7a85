"""Class-aware grouped feature whitening loss.

Rebuilds ``ClassWareWhitening`` (reference
``uemda/gast/class_ware_whiten.py:14-65``): per class, per channel group, the
masked feature covariance is pushed towards identity with an MSE. The torch
version early-returns an identity matrix when a class has <= 1 pixel (loss 0
for that term); here that branch is a ``jnp.where`` so everything stays
jittable. The per-(class, group) covariances are computed as one batched GEMM
via vmap.

Note: the reference constructs this whitener (alignment.py:71) but no tools/
entry point calls ``whiten_class_ware`` — kept for full API parity.
"""

import jax
import jax.numpy as jnp


def _group_covariance(feats_2d: jnp.ndarray, mask_1d: jnp.ndarray) -> jnp.ndarray:
    """feats_2d (N, k), mask (N,) in {0,1} — masked covariance per the
    reference's centering (class_ware_whiten.py:32-39)."""
    k = feats_2d.shape[1]
    num = mask_1d.sum()
    x_masked = feats_2d * mask_1d[:, None]
    x_centered = x_masked - x_masked.sum(axis=0, keepdims=True) * mask_1d[:, None] / jnp.maximum(num, 1.0)
    cov = x_centered.T @ x_centered / jnp.maximum(num - 1.0, 1.0)
    return jnp.where(num <= 1, jnp.eye(k), cov)


def class_ware_whitening_loss(
    feats: jnp.ndarray,
    labels: jnp.ndarray,
    class_ids,
    groups: int = 32,
) -> jnp.ndarray:
    """feats (B, h, w, K) NHWC; labels (B, h, w) at feature resolution."""
    b, h, w, kdim = feats.shape
    assert kdim % groups == 0
    step = kdim // groups
    f = feats.reshape(-1, kdim).astype(jnp.float32)
    y = labels.reshape(-1)
    # (groups, N, step)
    fg = jnp.stack([f[:, g * step:(g + 1) * step] for g in range(groups)])
    eye = jnp.eye(step)

    def per_class(class_id):
        mask = (y == class_id).astype(jnp.float32)
        covs = jax.vmap(_group_covariance, in_axes=(0, None))(fg, mask)
        return (((covs - eye[None]) ** 2).mean(axis=(1, 2))).sum()

    losses = jnp.stack([per_class(cid) for cid in class_ids])
    return losses.sum()
