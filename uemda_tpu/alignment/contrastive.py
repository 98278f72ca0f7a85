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


def contrastive_anchors(
    feats: jnp.ndarray,
    labels: jnp.ndarray,
    temperature: float = 0.1,
    base_temperature: float = 0.07,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Exact rebuild of ``PixelContrastLoss._contrastive``
    (``uemda/gast/contrastive.py:107-143``) on sampled anchors.

    feats: (A, V, K) — A anchors, V views each; labels: (A,).
    Note the reference's denominator is ``exp(logit) + sum(neg exp)`` (not
    the full SupCon denominator), the self-pair is removed from the positive
    mask only, and the mean runs over ALL rows."""
    a, v, k = feats.shape
    # torch.cat(torch.unbind(feats_, dim=1)) -> view-major (V*A, K)
    f = jnp.transpose(feats, (1, 0, 2)).reshape(v * a, k).astype(jnp.float32)
    lab = labels.reshape(-1)
    same = (lab[:, None] == lab[None, :]).astype(jnp.float32)  # (A, A)
    mask = jnp.tile(same, (v, v))  # mask.repeat(anchor_count, contrast_count)
    neg_mask = 1.0 - mask
    logits = jnp.matmul(
        f, f.T, precision=jax.lax.Precision.HIGHEST
    ) / temperature
    logits = logits - jax.lax.stop_gradient(logits.max(axis=1, keepdims=True))
    self_mask = 1.0 - jnp.eye(v * a)
    pos_mask = mask * self_mask
    neg_logits = (jnp.exp(logits) * neg_mask).sum(axis=1, keepdims=True)
    log_prob = logits - jnp.log(jnp.exp(logits) + neg_logits + eps)
    mean_log_prob_pos = (pos_mask * log_prob).sum(axis=1) / (
        pos_mask.sum(axis=1) + eps
    )
    return -(temperature / base_temperature) * mean_log_prob_pos.mean()


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
    # reference _contrastive math (contrastive.py:107-143): denominator is
    # exp(self) + sum(neg exp); self-pair removed from positives only;
    # invalid slots (our fixed-shape padding, absent in the reference) are
    # masked from both sides and from the row mean
    eps = 1e-5
    both_valid = anchor_valid[:, None] & anchor_valid[None, :]
    pos_mask = (
        (anchor_cls[:, None] == anchor_cls[None, :]) & both_valid
    )
    self_mask = jnp.eye(pos_mask.shape[0], dtype=bool)
    neg_mask = (~pos_mask) & both_valid
    pos_mask = pos_mask & ~self_mask

    logits = anchors @ anchors.T / temperature
    row_max = jnp.where(both_valid, logits, -jnp.inf).max(axis=1, keepdims=True)
    row_max = jnp.where(jnp.isfinite(row_max), row_max, 0.0)
    logits = logits - jax.lax.stop_gradient(row_max)
    neg_logits = jnp.where(neg_mask, jnp.exp(logits), 0.0).sum(1, keepdims=True)
    log_prob = logits - jnp.log(jnp.exp(logits) + neg_logits + eps)
    mean_log_prob_pos = (log_prob * pos_mask).sum(axis=1) / (
        pos_mask.sum(axis=1) + eps
    )
    loss = -(temperature / base_temperature) * mean_log_prob_pos
    return (loss * anchor_valid).sum() / jnp.maximum(anchor_valid.sum(), 1)
