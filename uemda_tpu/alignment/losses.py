"""Segmentation loss zoo: CE / OHEM / Focal / GHM / GDP / UPS / UVEM.

Rebuilds the reference loss classes (``uemda/gast/balance.py:81-457``) as
pure functions over NHWC logits (B, H, W, C) and (B, H, W) int labels with
ignore_label=-1. Design notes:

* torch's ``cross_entropy(..., reduction='none', ignore_index=-1)`` yields 0
  at ignored pixels and the reference means over *all* pixels — reproduced
  exactly (``balance.py:97-101``).
* OHEM's data-dependent selection (``balance.py:122-133``) is reformulated as
  a fixed-shape sort + dynamic-k masked mean: k = max(n_min, #(loss>thresh)).
* GHM/GDP histogram state (``balance.py:193-203,261-270``) is explicit
  (``GHMState``) and threaded through the train step, psum-able across
  replicas.
* Class balancing enters as an optional per-pixel weight (computed by
  ``uemda_tpu.alignment.balance``), matching the reference's class_balancer
  hook.
* ``loss_calc``/``loss_calc_uvem`` (``utils/tools.py:240-260``,
  ``balance.py:437-457``) upsample each head to label resolution
  (align_corners=True) and average across heads.
"""

from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from uemda_tpu.ops.resize import upsample_logits
from uemda_tpu.ops.uncertainty import pixel_entropy, uvem_weight


def _select_class(values: jnp.ndarray, safe_labels: jnp.ndarray) -> jnp.ndarray:
    """(N, C) values, (N,) in-range labels -> (N,) values[i, labels[i]].

    Deliberately NOT ``take_along_axis``: XLA lowers that gather on TPU to a
    serial gather fusion plus degenerate-layout ``s32[N,1]{T(1,128)}`` copies
    (~29 ms per head per 8x512^2 train step in the XProf trace, and the
    backward becomes a scatter). An iota-compare mask-sum is exact, fuses
    into the preceding softmax, and differentiates elementwise."""
    c = values.shape[-1]
    onehot = safe_labels[:, None] == jnp.arange(c, dtype=jnp.int32)[None, :]
    return jnp.sum(jnp.where(onehot, values, 0.0), axis=-1)


def cross_entropy_per_pixel(
    logits: jnp.ndarray, labels: jnp.ndarray, ignore_label: int = -1
) -> jnp.ndarray:
    """(N, C) logits + (N,) labels -> (N,) CE with 0 at ignored pixels."""
    logits = logits.astype(jnp.float32)
    valid = labels != ignore_label
    safe = jnp.where(valid, labels, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -_select_class(logp, safe)
    return jnp.where(valid, ce, 0.0)


def _flatten(logits, labels):
    c = logits.shape[-1]
    return logits.reshape(-1, c), labels.reshape(-1)


def cross_entropy_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_label: int = -1,
    pixel_weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """``CrossEntropy`` (balance.py:81-101): mean over ALL pixels."""
    lf, yf = _flatten(logits, labels)
    ce = cross_entropy_per_pixel(lf, yf, ignore_label)
    if pixel_weight is not None:
        ce = ce * pixel_weight.reshape(-1)
    return ce.mean()


def ohem_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_label: int = -1,
    thresh: float = 0.7,
    pixel_weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """``OhemCrossEntropy`` (balance.py:104-133), fixed-shape formulation."""
    lf, yf = _flatten(logits, labels)
    ce = cross_entropy_per_pixel(lf, yf, ignore_label)
    if pixel_weight is not None:
        ce = ce * pixel_weight.reshape(-1)
    loss_thresh = -jnp.log(jnp.float32(thresh))
    n = ce.shape[0]
    n_min = ((yf != ignore_label).sum() // 5).astype(jnp.int32)
    count_gt = (ce > loss_thresh).sum().astype(jnp.int32)
    k = jnp.maximum(n_min, count_gt)
    sorted_desc = jnp.sort(ce)[::-1]
    mask = jnp.arange(n) < k
    return (sorted_desc * mask).sum() / jnp.maximum(k, 1).astype(jnp.float32)


def focal_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    gamma: float = 2.0,
    ignore_label: int = -1,
) -> jnp.ndarray:
    """``FocalLoss`` (balance.py:136-158), reduction='mean' over all pixels."""
    lf, yf = _flatten(logits, labels)
    ce = cross_entropy_per_pixel(lf, yf, ignore_label)
    pt = jnp.exp(-ce)
    return ((1.0 - pt) ** gamma * ce).mean()


@flax.struct.dataclass
class GHMState:
    acc_sum: jnp.ndarray  # (bins,)
    momentum: float = flax.struct.field(pytree_node=False)
    bins: int = flax.struct.field(pytree_node=False)


def init_ghm(bins: int = 30, momentum: float = 0.99) -> GHMState:
    return GHMState(jnp.zeros((bins,), jnp.float32), momentum, bins)


def _ghm_gradient_and_bins(lf, yf, ignore_label, bins):
    """Shared GHM/GDP plumbing (balance.py:173-194): gradient g = |p_y - 1|,
    histogram over [0,1], searchsorted bucket indices (torch.bucketize
    semantics: g=0 lands in bucket 0 and gets zero weight)."""
    c = lf.shape[-1]
    probs = jax.nn.softmax(lf.astype(jnp.float32), axis=-1)
    valid = yf != ignore_label
    safe = jnp.where(valid, yf, 0).astype(jnp.int32)
    prob_y = _select_class(probs, safe)
    g = jnp.abs(prob_y - 1.0)
    g = jnp.where(valid, g, -1.0)
    edges = jnp.concatenate(
        [jnp.arange(bins, dtype=jnp.float32) / bins, jnp.array([1.0 + 1e-3])]
    )
    hist, _ = jnp.histogram(g, bins=bins, range=(0.0, 1.0))
    # torch.histc drops out-of-range; jnp.histogram clips? it drops too.
    inds = jnp.searchsorted(edges, g, side="left")
    return g, hist.astype(jnp.float32), inds


def ghm_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    state: GHMState,
    ignore_label: int = -1,
) -> Tuple[jnp.ndarray, GHMState]:
    """``GHMLoss`` (balance.py:161-212)."""
    lf, yf = _flatten(logits, labels)
    _, hist, inds = _ghm_gradient_and_bins(lf, yf, ignore_label, state.bins)
    if state.momentum > 0:
        acc = state.momentum * state.acc_sum + (1 - state.momentum) * hist
    else:
        acc = hist
    in_range = (inds > 0) & (inds <= state.bins)
    safe_idx = jnp.clip(inds - 1, 0, state.bins - 1)
    weights = jnp.where(in_range, 1.0 / jnp.maximum(acc[safe_idx], 1e-12), 0.0)
    ce = cross_entropy_per_pixel(lf, yf, ignore_label)
    loss = (ce * jax.lax.stop_gradient(weights)).sum() / (
        (yf != ignore_label).sum() + 1e-7
    )
    return loss, state.replace(acc_sum=acc)


def gdp_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    state: GHMState,
    ignore_label: int = -1,
    pixel_weight: Optional[jnp.ndarray] = None,
    n_weight_terms: int = 1,
) -> Tuple[jnp.ndarray, GHMState]:
    """``GDPLoss`` (balance.py:218-303): symmetrized histogram, dense
    1 - bin-mass weights; optional extra per-pixel weights (class balance /
    prototype) are summed and the total divided by ``n_weight_terms``."""
    lf, yf = _flatten(logits, labels)
    _, hist, inds = _ghm_gradient_and_bins(lf, yf, ignore_label, state.bins)
    hist = (hist + hist[::-1]) * 0.5
    if state.momentum > 0:
        acc = state.momentum * state.acc_sum + (1 - state.momentum) * hist
    else:
        acc = hist
    dense = 1.0 - acc / (acc.sum() + 1e-7)
    dense = jnp.where(acc != 0, dense, 0.0)
    dense = dense / (dense.max() + 1e-7)
    in_range = (inds > 0) & (inds <= state.bins)
    safe_idx = jnp.clip(inds - 1, 0, state.bins - 1)
    w = jnp.where(in_range, dense[safe_idx], 0.0)
    if pixel_weight is not None:
        w = w + pixel_weight.reshape(-1)
    ce = cross_entropy_per_pixel(lf, yf, ignore_label)
    loss = (ce * jax.lax.stop_gradient(w) / n_weight_terms).sum() / (
        (yf != ignore_label).sum() + 1e-7
    )
    return loss, state.replace(acc_sum=acc)


def ups_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    label_soft: jnp.ndarray,
    threshold: float = 0.7,
    ignore_label: int = -1,
    pixel_weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """``UPSLoss`` (balance.py:306-342): hard uncertainty gate only."""
    lf, yf = _flatten(logits, labels)
    u = jax.lax.stop_gradient(pixel_entropy(label_soft.reshape(lf.shape)))
    ce = cross_entropy_per_pixel(lf, yf, ignore_label)
    ce = jnp.where(u > threshold, 0.0, ce)
    w = 1.0 if pixel_weight is None else pixel_weight.reshape(-1)
    valid_cnt = ((u <= threshold) & (yf != ignore_label)).sum()
    return (w * ce).sum() / (valid_cnt + 1e-7)


def uvem_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    label_soft: jnp.ndarray,
    m: float = 0.2,
    threshold: float = 0.7,
    gamma: float = 4.0,
    ignore_label: int = -1,
    pixel_weight: Optional[jnp.ndarray] = None,
    paste_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """``UVEMLoss`` (balance.py:345-423): uncertainty gate + piecewise
    parabola valuable-example weight.

    ``paste_mask`` (beyond-reference, for the combo mix+UVEM step): bool map
    of pixels carrying pasted CLEAN source supervision. Their soft labels are
    one-hot, so u=0 and the parabola weight w(0)=0 would silently zero the
    clean CE while still counting them in valid_cnt. With the mask they are
    trained at weight 1 (like the reference mix trainer's plain CE on pasted
    pixels), never gated, and counted in valid_cnt only when trained."""
    lf, yf = _flatten(logits, labels)
    u = jax.lax.stop_gradient(pixel_entropy(label_soft.reshape(lf.shape)))
    ce = cross_entropy_per_pixel(lf, yf, ignore_label)
    w = uvem_weight(u, m, threshold, gamma)
    trained = u <= threshold
    if paste_mask is not None:
        pm = paste_mask.reshape(-1)
        w = jnp.where(pm, 1.0, w)
        trained = trained | pm
    ce = jnp.where(trained, ce, 0.0)
    if pixel_weight is not None:
        w = w * pixel_weight.reshape(-1)
    valid_cnt = (trained & (yf != ignore_label)).sum()
    return (w * ce).sum() / (valid_cnt + 1e-7)


def loss_calc(preds, label, loss_fn, multi: bool = True):
    """Multi-head reduction (``utils/tools.py:240-260``): upsample each head's
    logits to label resolution (align_corners=True), apply, average."""
    hw = label.shape[-2:]
    if not multi:
        preds = [preds]
    total = 0.0
    for p in preds:
        if p.shape[1:3] != hw:
            p = upsample_logits(p, hw)
        total = total + loss_fn(p, label)
    return total / len(preds)


def loss_calc_uvem(preds, label, label_soft, loss_fn, multi: bool = True):
    """(balance.py:437-457) — like loss_calc but for soft-label losses."""
    hw = label.shape[-2:]
    if not multi:
        preds = [preds]
    total = 0.0
    for p in preds:
        if p.shape[1:3] != hw:
            p = upsample_logits(p, hw)
        total = total + loss_fn(p, label, label_soft)
    return total / len(preds)
