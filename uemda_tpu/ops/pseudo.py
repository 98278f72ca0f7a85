"""Per-class adaptive-threshold pseudo-label mining.

Reproduces ``pseudo_selection`` (reference
``uemda/gast/pseudo_generation.py:59-93``): per (batch, class) the threshold
is max(cutoff_top * class_max_prob, cutoff_low); pixels strictly exceeding the
threshold for exactly one class keep that class, everything else becomes
ignore. Fixed-shape, fully vectorized, jittable — runs fused on the VPU.

Layout: probabilities are NHWC (B, H, W, C) softmax-ed maps.
"""

import jax.numpy as jnp


def pseudo_selection(
    probs: jnp.ndarray,
    cutoff_top: float = 0.8,
    cutoff_low: float = 0.6,
    ignore_label: int = -1,
) -> jnp.ndarray:
    """(B, H, W, C) probs -> (B, H, W) int32 pseudo label with ignore."""
    b, h, w, c = probs.shape
    probs = probs.astype(jnp.float32)
    # per-(batch,class) adaptive threshold
    class_max = probs.reshape(b, h * w, c).max(axis=1, keepdims=True)  # (B,1,C)
    thresh = jnp.maximum(class_max * cutoff_top, cutoff_low)
    over = probs.reshape(b, h * w, c) > thresh  # strict, as reference :83
    # exactly-one-class rule; argmax of the binary mask = first passing class
    ambiguous = over.sum(axis=-1) != 1
    label = jnp.argmax(over, axis=-1).astype(jnp.int32)
    label = jnp.where(ambiguous, ignore_label, label)
    return label.reshape(b, h, w)


def pseudo_selection_threshold(
    probs: jnp.ndarray,
    cutoff_top: float = 0.8,
    cutoff_low: float = 0.6,
    ignore_label: int = -1,
) -> jnp.ndarray:
    """The reference's alternative rule ``pseudo_selection1``
    (pseudo_generation.py:24-56): label = argmax prob; ignore if the top
    probability falls below that class's adaptive threshold."""
    b, h, w, c = probs.shape
    probs = probs.astype(jnp.float32)
    class_max = probs.reshape(b, h * w, c).max(axis=1, keepdims=True)
    thresh = jnp.maximum(class_max * cutoff_top, cutoff_low)  # (B,1,C)
    flat = probs.reshape(b, h * w, c)
    top = flat.max(axis=-1)
    label = jnp.argmax(flat, axis=-1)
    # iota-compare mask-sum instead of take_along_axis: the gather lowers
    # badly on TPU (serial fusion + layout-change copies); this fuses
    onehot = label[..., None] == jnp.arange(c, dtype=jnp.int32)
    pix_thresh = jnp.sum(jnp.where(onehot, thresh, 0.0), axis=-1)
    label = jnp.where(top < pix_thresh, ignore_label, label)
    return label.reshape(b, h, w).astype(jnp.int32)
