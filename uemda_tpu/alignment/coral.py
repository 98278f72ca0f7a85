"""CORAL second-order domain alignment (arXiv:1607.01719 eq. 1).

Rebuilds ``CoralLoss`` (reference ``uemda/gast/coral.py:15-47``): Frobenius
distance between the (Bessel-corrected) feature covariances of the two
domains, scaled by 1/(4 d^2). The 2048x2048 covariances are single MXU GEMMs.
"""

import jax
import jax.numpy as jnp


def _covariance(x: jnp.ndarray) -> jnp.ndarray:
    n = x.shape[0]
    xm = x - x.mean(axis=0, keepdims=True)
    cov = jnp.matmul(
        xm.T, xm, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    return cov / (n - 1)


def coral_loss(
    source: jnp.ndarray, target: jnp.ndarray, is_sqrt: bool = False
) -> jnp.ndarray:
    """source/target: (N, K) flattened per-pixel features."""
    d = source.shape[1]
    source = source.astype(jnp.float32)
    target = target.astype(jnp.float32)
    diff = _covariance(source) - _covariance(target)
    loss = jnp.sum(diff * diff)
    if is_sqrt:
        loss = jnp.sqrt(loss)
    return loss / (4.0 * d * d)


def align_domain(feat_s: jnp.ndarray, feat_t: jnp.ndarray) -> jnp.ndarray:
    """``Aligner.align_domain`` (alignment.py:79-84): flatten NHWC features
    and apply CORAL."""
    k = feat_s.shape[-1]
    return coral_loss(feat_s.reshape(-1, k), feat_t.reshape(-1, k))


def coral_loss2(
    source: jnp.ndarray, target: jnp.ndarray, is_sqrt: bool = False
) -> jnp.ndarray:
    """``CoralLoss2`` (coral.py:50-78): the algebraically expanded eq. 1-3
    form (X^T X - mean-outer-product); numerically near-identical."""
    d = source.shape[1]
    def cov2(x):
        n = x.shape[0]
        s = x.sum(axis=0, keepdims=True)
        g = jnp.matmul(x.T, x, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
        return (g - (s.T @ s) / n) / (n - 1)
    diff = cov2(source.astype(jnp.float32)) - cov2(target.astype(jnp.float32))
    loss = (diff ** 2).sum()
    if is_sqrt:
        loss = jnp.sqrt(loss)
    return loss / (4.0 * d * d)
