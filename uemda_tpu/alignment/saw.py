"""SAW — Semantic-Aware Whitening (CVPR'22 SAN-SAW line of work).

Rebuild of ``uemda/gast/SAW.py:16-130`` (dormant in the reference): channels
are ranked per class by the classifier's absolute weights, regrouped so each
group holds one top channel per selected class (sigmoid-weighted), and each
group's instance covariance is pushed towards diagonal via a margin-relaxed
off-diagonal penalty. The reference's triple Python loop over
(batch, group, class) becomes one gather + reshape.
"""

from typing import Sequence

import jax
import jax.numpy as jnp


def saw_loss(
    feats: jnp.ndarray,
    classifier_weights: jnp.ndarray,
    selected_classes: Sequence[int],
    relax_denom: float = 2.0,
) -> jnp.ndarray:
    """feats (B, H, W, K) NHWC; classifier_weights (C, K) — the 1x1
    classifier kernel (abs taken internally)."""
    b, h, w, k = feats.shape
    sel = jnp.asarray(list(selected_classes), jnp.int32)
    c = sel.shape[0]
    assert k % c == 0
    groups = k // c

    w_abs = jnp.abs(classifier_weights)  # (C, K)
    order = jnp.argsort(-w_abs, axis=1)  # descending channel rank per class
    # channel ids for (class j, rank k): (c, groups)
    chan = order[sel][:, :groups]
    gate = jax.nn.sigmoid(
        jnp.take_along_axis(w_abs[sel], chan, axis=1)
    )  # (c, groups)

    # regrouped tensor: position (group g, class j) <- gate * feats[.., chan]
    x = feats.astype(jnp.float32)
    gathered = x[..., chan.reshape(-1)]  # (B,H,W, c*groups) in (class, rank)
    gathered = gathered.reshape(b, h, w, c, groups)
    gathered = gathered * gate.T[None, None, None].transpose(0, 1, 2, 4, 3)
    # group tensor (B, groups, HW, c)
    gx = gathered.transpose(0, 4, 1, 2, 3).reshape(b, groups, h * w, c)

    eye = jnp.eye(c)
    upper = jnp.triu(jnp.ones((c, c)), k=1)
    num_off = upper.sum()
    margin = 0.0 if relax_denom == 0 else num_off // relax_denom

    # covariance per (b, group): (c, c)
    cov = jnp.einsum(
        "bgnc,bgnd->bgcd", gx, gx, precision=jax.lax.Precision.HIGHEST
    ) / (h * w - 1) + 1e-5 * eye
    off = (jnp.abs(cov * upper)).sum(axis=(-1, -2)) - margin  # (b, groups)
    loss = jnp.clip(off / num_off, 0.0, None)
    return loss.sum(axis=0).sum() / b
