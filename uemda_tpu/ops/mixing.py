"""On-device ClassMix / CutMix domain mixing.

Rebuilds ``uemda/utils/classmix.py:17-53`` and ``uemda/utils/cutmix.py:15-53``
as pure jax functions driven by explicit PRNG keys (the reference uses host
randomness + .cuda() masks). Everything is fixed-shape: the class subset and
the cut box become masks computed on device, so mixing fuses into the train
step.
"""

from typing import Tuple

import jax
import jax.numpy as jnp

from uemda_tpu.ops.labels import one_hot_ignore


def classmix(
    rng: jax.Array,
    data_s: jnp.ndarray,
    targets_s: jnp.ndarray,
    data_t: jnp.ndarray,
    targets_t: jnp.ndarray,
    ratio: float = 0.5,
    class_num: int = 7,
    ignore_label: int = -1,
    probs_s: jnp.ndarray = None,
    probs_t: jnp.ndarray = None,
):
    """Paste pixels of a random half of the classes from source into target
    (classmix.py:42-51). The class subset is batch-wide, like the reference's
    single randperm per call. With ``probs_s/probs_t`` (B,H,W,C) soft labels,
    also returns the pasted soft map and the (B,H,W) bool paste mask as 5th
    and 6th elements (combo mix+UVEM path — beyond-reference: the mask lets
    the target loss treat pasted clean supervision at full weight instead of
    letting its zero entropy zero it out under UVEM)."""
    n_sel = int(class_num * ratio)
    perm = jax.random.permutation(rng, class_num)
    selected = jnp.zeros((class_num,), jnp.float32).at[perm[:n_sel]].set(1.0)
    return classmix_paste(
        selected, data_s, targets_s, data_t, targets_t, class_num,
        ignore_label, probs_s=probs_s, probs_t=probs_t,
    )


def classmix_paste(
    selected: jnp.ndarray,
    data_s: jnp.ndarray,
    targets_s: jnp.ndarray,
    data_t: jnp.ndarray,
    targets_t: jnp.ndarray,
    class_num: int,
    ignore_label: int = -1,
    probs_s: jnp.ndarray = None,
    probs_t: jnp.ndarray = None,
):
    """Deterministic classmix core given the (C,) 0/1 selected-class mask
    (classmix.py:42-51) — split out so the paste semantics can be golden-
    tested against the reference with the randomness pinned."""
    oh = one_hot_ignore(targets_s, class_num, ignore_label)  # (B,H,W,C)
    cond = (oh * selected[None, None, None, :]).sum(-1) > 0  # (B,H,W)
    new_targets_t = jnp.where(cond, targets_s, targets_t)
    new_data_t = jnp.where(cond[..., None], data_s, data_t)
    if probs_s is None:
        return data_s, targets_s, new_data_t, new_targets_t
    new_probs_t = jnp.where(cond[..., None], probs_s, probs_t)
    return data_s, targets_s, new_data_t, new_targets_t, new_probs_t, cond


def box_mask(hw: Tuple[int, int], lam, cx, cy) -> jnp.ndarray:
    """Deterministic cutmix box mask given (lam, cx, cy) — the reference's
    box arithmetic (cutmix.py:17-28: round-half-even ints, clipped to the
    image), exposed for golden tests against the reference with the
    randomness pinned."""
    h, w = hw
    bw = w * jnp.sqrt(1.0 - lam)
    bh = h * jnp.sqrt(1.0 - lam)
    x0 = jnp.round(jnp.clip(cx - bw / 2, 0, w))
    x1 = jnp.round(jnp.clip(cx + bw / 2, 0, w))
    y0 = jnp.round(jnp.clip(cy - bh / 2, 0, h))
    y1 = jnp.round(jnp.clip(cy + bh / 2, 0, h))
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    return ((ys >= y0) & (ys < y1) & (xs >= x0) & (xs < x1))  # (H, W)


def _cut_box(rng: jax.Array, hw: Tuple[int, int], alpha: float):
    """Beta(alpha, alpha) box (cutmix.py:17-28) as a fixed-shape mask."""
    h, w = hw
    k1, k2, k3 = jax.random.split(rng, 3)
    lam = jax.random.beta(k1, alpha, alpha)
    cx = jax.random.uniform(k2, (), minval=0.0, maxval=w)
    cy = jax.random.uniform(k3, (), minval=0.0, maxval=h)
    return box_mask(hw, lam, cx, cy)


def cutmix(
    rng: jax.Array,
    data_s: jnp.ndarray,
    targets_s: jnp.ndarray,
    data_t: jnp.ndarray,
    targets_t: jnp.ndarray,
    alpha: float = 1.0,
    probs_s: jnp.ndarray = None,
    probs_t: jnp.ndarray = None,
):
    """Source box pasted into target (cutmix.py:15-31); one box per call.
    With ``probs_s/probs_t`` (B,H,W,C) soft labels, also returns the pasted
    soft map and the (B,H,W) bool paste mask as 5th and 6th elements (combo
    mix+UVEM path — beyond-reference, see ``classmix``)."""
    mask = _cut_box(rng, data_s.shape[1:3], alpha)
    new_data_t = jnp.where(mask[None, :, :, None], data_s, data_t)
    new_targets_t = jnp.where(mask[None], targets_s, targets_t)
    if probs_s is None:
        return data_s, targets_s, new_data_t, new_targets_t
    new_probs_t = jnp.where(mask[None, :, :, None], probs_s, probs_t)
    paste = jnp.broadcast_to(mask[None], new_targets_t.shape)
    return data_s, targets_s, new_data_t, new_targets_t, new_probs_t, paste


def cutmix_inbatch(rng: jax.Array, data: jnp.ndarray, targets: jnp.ndarray,
                   alpha: float = 1.0):
    """In-batch variant (cutmix.py:33-53): paste from a shuffled batch."""
    k1, k2 = jax.random.split(rng)
    idx = jax.random.permutation(k1, data.shape[0])
    mask = _cut_box(k2, data.shape[1:3], alpha)
    new_data = jnp.where(mask[None, :, :, None], data[idx], data)
    new_targets = jnp.where(mask[None], targets[idx], targets)
    return new_data, new_targets
