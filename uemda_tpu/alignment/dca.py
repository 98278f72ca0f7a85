"""DCA class-correlation regularizers (ICR / CCR / MSE variants).

Rebuilds ``uemda/dca_modules.py:14-188``: prediction-weighted per-class
context vectors and intra/cross-domain Pearson-correlation regularization.
The reference computes the (n, n) correlation matrix with a double Python
loop over audtorch ``pearsonr`` calls (``dca_modules.py:40-57``); here it is
one vectorized correlation of the centered context matrix — an MXU GEMM.
"""

import jax
import jax.numpy as jnp

EPS = 1e-7


def get_context(preds: jnp.ndarray, feats: jnp.ndarray, ignore_bg: bool = False):
    """Prediction-weighted class context vectors (dca_modules.py:20-34).

    preds: (B, h, w, C) softmax probabilities; feats: (B, h, w, K).
    Returns (B, C[, -1 bg], K), L2-normalized over the class axis (dim=1 in
    the reference's (B, C, K) layout)."""
    b, h, w, c = preds.shape
    k = feats.shape[-1]
    p = preds.reshape(b, h * w, c).astype(jnp.float32)
    f = feats.reshape(b, h * w, k).astype(jnp.float32)
    num = jnp.einsum("bnc,bnk->bck", p, f,
                     precision=jax.lax.Precision.HIGHEST)
    den = p.sum(axis=1)[..., None]  # (B, C, 1)
    vectors = num / (den + EPS)
    if ignore_bg:
        vectors = vectors[:, 1:, :]
    # F.normalize(dim=1): across classes per (batch, channel)
    norm = jnp.sqrt((vectors * vectors).sum(axis=1, keepdims=True))
    return vectors / jnp.maximum(norm, 1e-12)


def _corrcoef_rows(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(n, k) x (m, k) -> (n, m) Pearson correlation (vectorized pearsonr)."""
    ac = a - a.mean(axis=1, keepdims=True)
    bc = b - b.mean(axis=1, keepdims=True)
    cov = jnp.matmul(ac, bc.T, precision=jax.lax.Precision.HIGHEST)
    sa = jnp.sqrt((ac * ac).sum(axis=1))
    sb = jnp.sqrt((bc * bc).sum(axis=1))
    return cov / jnp.maximum(sa[:, None] * sb[None, :], 1e-12)


def _regularize(cor_mat: jnp.ndarray) -> jnp.ndarray:
    """(dca_modules.py:59-76): -log diagonal + -log(1 - max(offdiag, 1e-6))."""
    n = cor_mat.shape[0]
    pos = -jnp.log(jnp.clip(jnp.diagonal(cor_mat), 1e-6, None)).mean()
    off_mask = 1.0 - jnp.eye(n)
    offdiag = jnp.where(off_mask > 0, cor_mat, 1e-6)
    neg = -jnp.log(1.0 - jnp.maximum(offdiag, 1e-6))
    neg = (neg * off_mask).sum() / (n * (n - 1))
    return pos + neg


def icr(preds1, preds2, feats, num_classes: int, ignore_bg: bool = True):
    """Intra-domain Covariance Regularization (dca_modules.py:79-105),
    multi_layer form: split the batch in half, correlate contexts."""
    probs = jax.lax.stop_gradient(
        (jax.nn.softmax(preds1, -1) + jax.nn.softmax(preds2, -1)) / 2
    )
    b = probs.shape[0]
    c1 = get_context(probs[: b // 2], feats[: b // 2], ignore_bg).mean(0)
    c2 = get_context(probs[b // 2:], feats[b // 2:], ignore_bg).mean(0)
    return _regularize(_corrcoef_rows(c1, c2))


def ccr(s_preds1, s_preds2, s_feats, t_preds1, t_preds2, t_feats,
        num_classes: int, ignore_bg: bool = True):
    """Cross-domain Covariance Regularization (dca_modules.py:108-133):
    source context detached, target context carries the gradient."""
    sp = (jax.nn.softmax(s_preds1, -1) + jax.nn.softmax(s_preds2, -1)) / 2
    tp = (jax.nn.softmax(t_preds1, -1) + jax.nn.softmax(t_preds2, -1)) / 2
    cs = get_context(
        jax.lax.stop_gradient(sp), jax.lax.stop_gradient(s_feats), ignore_bg
    ).mean(0)
    ct = get_context(jax.lax.stop_gradient(tp), t_feats, ignore_bg).mean(0)
    return _regularize(_corrcoef_rows(cs, ct))


def mse_intra(preds1, preds2, feats, ignore_bg: bool = True):
    """(dca_modules.py:136-159)"""
    probs = jax.lax.stop_gradient(
        (jax.nn.softmax(preds1, -1) + jax.nn.softmax(preds2, -1)) / 2
    )
    b = probs.shape[0]
    c1 = get_context(probs[: b // 2], feats[: b // 2], ignore_bg)
    c2 = get_context(probs[b // 2:], feats[b // 2:], ignore_bg)
    return ((c1 - c2) ** 2).mean()


def mse_cross(s_preds1, s_preds2, s_feats, t_preds1, t_preds2, t_feats,
              ignore_bg: bool = True):
    """(dca_modules.py:162-188)"""
    sp = (jax.nn.softmax(s_preds1, -1) + jax.nn.softmax(s_preds2, -1)) / 2
    tp = (jax.nn.softmax(t_preds1, -1) + jax.nn.softmax(t_preds2, -1)) / 2
    cs = get_context(jax.lax.stop_gradient(sp), jax.lax.stop_gradient(s_feats), ignore_bg)
    ct = get_context(jax.lax.stop_gradient(tp), t_feats, ignore_bg)
    return ((cs - ct) ** 2).mean()
