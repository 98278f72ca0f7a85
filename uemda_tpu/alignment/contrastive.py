"""Pixel-level supervised contrastive loss + triplet loss (dormant reference
modules, kept for API parity).

* ``pixel_contrast_loss`` rebuilds ``uemda/gast/contrastive.py`` (HRNet-style
  PixelContrastLoss): per (image, class), sample anchors preferring hard
  pixels (predicted c but labelled otherwise), then InfoNCE against all
  sampled anchors. The reference's data-dependent unique()/nonzero() sampling
  is reformulated fixed-shape: every (image, class) slot samples ``n_view``
  pixels by top-k over randomized eligibility scores, and empty slots are
  masked out of the loss.
* ``triplet_loss`` rebuilds ``uemda/gast/triple.py:13-56`` (batch-hard
  mining) with vectorized masked max/min.
"""

import jax
import jax.numpy as jnp


def triplet_loss(inputs: jnp.ndarray, targets: jnp.ndarray, margin: float = 0.3):
    """inputs (N, K) features, targets (N,) labels — batch-hard triplet with
    MarginRankingLoss semantics: mean(relu(margin - (d_an - d_ap)))."""
    sq = (inputs * inputs).sum(-1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * inputs @ inputs.T
    dist = jnp.sqrt(jnp.clip(d2, 1e-12, None))
    same = targets[:, None] == targets[None, :]
    d_ap = jnp.where(same, dist, -jnp.inf).max(axis=1)
    d_an = jnp.where(~same, dist, jnp.inf).min(axis=1)
    return jnp.maximum(margin - (d_an - d_ap), 0.0).mean()


def pixel_contrast_loss(
    feats: jnp.ndarray,
    labels: jnp.ndarray,
    preds: jnp.ndarray,
    rng: jax.Array,
    num_classes: int,
    n_view: int = 100,
    temperature: float = 0.1,
    base_temperature: float = 0.07,
    ignore_label: int = -1,
) -> jnp.ndarray:
    """feats (B, N, K); labels/preds (B, N) int. Fixed-shape anchor sampling:
    for each (b, c) slot take n_view pixels of class c, hard examples
    (pred==c != label... reference samples anchors where label==c, mixing
    hard = (pred!=c) and easy = (pred==c)) ranked first."""
    b, n, k = feats.shape
    cls = jnp.arange(num_classes)
    lbl_eq = labels[:, :, None] == cls[None, None, :]  # (B, N, C)
    hard = lbl_eq & (preds[:, :, None] != cls[None, None, :])
    # eligibility score: hard pixels get +1, easy +0, invalid -inf
    noise = jax.random.uniform(rng, (b, n, num_classes))
    score = jnp.where(lbl_eq, hard.astype(jnp.float32) + noise, -jnp.inf)
    # top n_view pixels per (b, c)
    score_t = jnp.transpose(score, (0, 2, 1))  # (B, C, N)
    top_scores, top_idx = jax.lax.top_k(score_t, n_view)  # (B, C, V)
    valid_slot = lbl_eq.sum(axis=1) >= n_view  # (B, C)

    gathered = jnp.take_along_axis(
        feats[:, None, :, :].repeat(num_classes, axis=1),
        top_idx[..., None], axis=2,
    )  # (B, C, V, K)
    anchors = gathered.reshape(-1, k)  # (B*C*V, K)
    anchor_cls = jnp.broadcast_to(
        cls[None, :, None], (b, num_classes, n_view)
    ).reshape(-1)
    anchor_valid = jnp.broadcast_to(
        valid_slot[..., None], (b, num_classes, n_view)
    ).reshape(-1)

    anchors = anchors / jnp.maximum(
        jnp.linalg.norm(anchors, axis=-1, keepdims=True), 1e-12
    )
    logits = anchors @ anchors.T / temperature
    pos_mask = (anchor_cls[:, None] == anchor_cls[None, :]) & (
        anchor_valid[:, None] & anchor_valid[None, :]
    )
    self_mask = jnp.eye(pos_mask.shape[0], dtype=bool)
    pos_mask = pos_mask & ~self_mask
    neg_or_pos = (anchor_valid[:, None] & anchor_valid[None, :]) & ~self_mask

    logits_max = jnp.where(neg_or_pos, logits, -jnp.inf).max(axis=1, keepdims=True)
    logits_max = jnp.where(jnp.isfinite(logits_max), logits_max, 0.0)
    exp_logits = jnp.where(neg_or_pos, jnp.exp(logits - logits_max), 0.0)
    log_prob = (logits - logits_max) - jnp.log(exp_logits.sum(1, keepdims=True) + 1e-12)
    pos_cnt = pos_mask.sum(axis=1)
    mean_log_prob_pos = (log_prob * pos_mask).sum(axis=1) / jnp.maximum(pos_cnt, 1)
    loss = -(temperature / base_temperature) * mean_log_prob_pos
    w = anchor_valid & (pos_cnt > 0)
    return (loss * w).sum() / jnp.maximum(w.sum(), 1)
