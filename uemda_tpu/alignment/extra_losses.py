"""Remaining small loss/regularizer utilities from the reference toolbox.

Rebuilds ``uemda/utils/tools.py`` odds and ends kept for API parity:
  * ``som`` (:291-302) — sparse online mining: mean of the top-ratio losses;
  * ``entropyloss`` / ``kldloss`` (:376-398) — weighted entropy / KLD
    regularizers used by adversarial baselines;
  * ``mixup`` (:155-170) — vertical-split batch mixing;
  * ``bce_loss`` / ``robust_binary_crossentropy`` (:263-273);
  * ``ias_thresh`` (:323-332) — instance-adaptive per-class thresholds of
    the legacy IAST pseudo-label generator (host-side numpy, like the
    reference).
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def som(loss: jnp.ndarray, ratio: float = 0.5) -> jnp.ndarray:
    """Mean over the hardest ``ratio`` fraction (tools.py:291-302,
    reduction='mean' branch semantics with zero-entry masking)."""
    flat = loss.reshape(-1)
    k = max(int(ratio * flat.shape[0]), 1)
    top = jax.lax.top_k(flat, k)[0]
    mask = top != 0
    return top.sum() / (mask.sum() + 1e-6)


def entropy_loss(logits: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """(tools.py:376-385) weighted softmax-entropy; logits (B,H,W,C),
    weight (B,H,W,1)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jax.nn.softmax(logits, axis=-1)
    ent = -(p * weight * logp)
    val_num = (weight > 0).sum()
    return ent.sum() / jnp.maximum(val_num, 1)


def kld_loss(logits: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """(tools.py:388-398) uniform-target KLD regularizer."""
    c = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    kld = -(1.0 / c) * weight * logp
    val_num = (weight > 0).sum()
    return kld.sum() / jnp.maximum(val_num, 1)


def bce_logits_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """binary_cross_entropy_with_logits, mean (tools.py:263-267)."""
    return jnp.mean(
        jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    )


def robust_binary_crossentropy(pred: jnp.ndarray, tgt: jnp.ndarray) -> jnp.ndarray:
    """(tools.py:270-273)"""
    inv_tgt = 1.0 - tgt
    inv_pred = 1.0 - pred + 1e-6
    return -(tgt * jnp.log(pred + 1e-6) + inv_tgt * jnp.log(inv_pred))


def mixup(rng: jax.Array, s_img, s_lab, t_img, t_lab, alpha: float = 0.2):
    """Vertical-split batch mixing (tools.py:155-170)."""
    b, h = s_img.shape[0], s_img.shape[1]
    k1, k2 = jax.random.split(rng)
    perm = jax.random.permutation(k1, b)
    lam = (jax.random.beta(k2, alpha, alpha) * h).astype(jnp.int32)
    rows = jnp.arange(h)[None, :, None, None]
    cut = rows < lam
    t_img_p, t_lab_p = t_img[perm], t_lab[perm]
    new_s_img = jnp.where(cut, s_img, t_img_p)
    new_s_lab = jnp.where(cut[:, :, :, 0], s_lab, t_lab_p)
    new_t_img = jnp.where(cut, t_img_p, s_img)
    new_t_lab = jnp.where(cut[:, :, :, 0], t_lab_p, s_lab)
    return new_s_img, new_s_lab, new_t_img, new_t_lab


def ias_thresh(
    conf_dict, n_class: int, alpha: float, w: Optional[np.ndarray] = None,
    gamma: float = 1.0,
) -> np.ndarray:
    """(tools.py:323-332) percentile-based per-class thresholds (host numpy,
    feeds the legacy IAST generator)."""
    if w is None:
        w = np.ones(n_class)
    cls_thresh = np.ones(n_class, dtype=np.float32)
    for idx in range(n_class):
        if conf_dict.get(idx):
            arr = np.array(conf_dict[idx])
            cls_thresh[idx] = np.percentile(
                arr, 100 * (1 - alpha * w[idx] ** gamma)
            )
    return cls_thresh
