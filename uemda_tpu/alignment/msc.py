"""MSC loss — multi-similarity contrastive criterion (ILA-DA).

Rebuild of ``uemda/gast/MSCLoss.py`` (dormant): inverse-distance similarity
between source and target instances; each target gets a pseudo label by
majority vote of its k most-similar source labels, a confidence score from
the ratio of nearest-like to nearest-unlike similarities, and the top-mu
confident targets enter a masked-softmax contrastive objective. The torch
version's per-target Python loops become fixed-shape top-k/segment ops.
"""

import jax
import jax.numpy as jnp


def msc_loss(
    src_features: jnp.ndarray,
    src_labels: jnp.ndarray,
    tgt_features: jnp.ndarray,
    num_classes: int,
    k: int = 5,
    m: int = 3,
    mu: int = 8,
) -> jnp.ndarray:
    """src_features (N, D), src_labels (N,), tgt_features (T, D)."""
    s = src_features.astype(jnp.float32)
    t = tgt_features.astype(jnp.float32)
    n, tn = s.shape[0], t.shape[0]
    d2 = ((s[:, None] - t[None]) ** 2).sum(-1)
    sim = 1.0 / (jnp.sqrt(jnp.maximum(d2, 0.0)) + 1.0)  # (N, T)

    # per-target pseudo label = mode of top-k similar sources' labels
    topk_val, topk_idx = jax.lax.top_k(sim.T, k)  # (T, k)
    topk_lbl = src_labels[topk_idx]  # (T, k)
    votes = jax.nn.one_hot(topk_lbl, num_classes).sum(axis=1)  # (T, C)
    tgt_lbl = jnp.argmax(votes, axis=-1)  # (T,)

    # confidence: sum of top-m like-similarities / top-m unlike-similarities
    like = src_labels[:, None] == tgt_lbl[None, :]  # (N, T)
    like_sim = jnp.where(like, sim, -jnp.inf)
    unlike_sim = jnp.where(~like, sim, -jnp.inf)
    nln = jax.lax.top_k(like_sim.T, m)[0]  # (T, m)
    nun = jax.lax.top_k(unlike_sim.T, m)[0]
    nln = jnp.where(jnp.isfinite(nln), nln, 0.0)
    nun = jnp.where(jnp.isfinite(nun), nun, 0.0)
    conf = nln.sum(-1) / (nun.sum(-1) + 1e-9)  # (T,)

    # keep top-mu confident targets (others masked out of the loss)
    mu = min(mu, tn)
    _, keep_idx = jax.lax.top_k(conf, mu)
    kept_sim = sim[:, keep_idx]  # (N, mu)
    kept_lbl = tgt_lbl[keep_idx]  # (mu,)

    mask_sim = (src_labels[:, None] == kept_lbl[None, :]).astype(jnp.float32)
    # rows need both a positive and a negative to contribute
    has_pos = mask_sim.sum(axis=1) > 0
    has_neg = (1 - mask_sim).sum(axis=1) > 0
    row_ok = has_pos & has_neg

    logits = jnp.where(row_ok[:, None], kept_sim, -jnp.inf)
    p = jax.nn.softmax(logits, axis=1)
    pos_mass = (p * mask_sim).sum(axis=1)
    loss_rows = -jnp.log(jnp.clip(pos_mass, 1e-9, None))
    return (loss_rows * row_ok).sum() / jnp.maximum(row_ok.sum(), 1)
