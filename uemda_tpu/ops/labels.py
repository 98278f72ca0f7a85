"""Label utilities: ignore-aware one-hot and majority-vote label downscaling.

Reference semantics reproduced:
  * ``Aligner._index2onehot`` (``uemda/gast/alignment.py:468-481``): ignore
    label mapped to an extra class then dropped, yielding an all-zero row for
    ignored pixels.
  * ``DownscaleLabel`` (``uemda/gast/alignment.py:484-509``): one-hot ->
    16x16 average pool -> per-cell argmax; the cell becomes ignore if the
    winning class is the ignore bucket or its ratio < min_ratio.

All ops are fixed-shape and jittable. Labels are int32 (B, H, W) with
ignore_label (default -1).
"""

import jax.numpy as jnp


def one_hot_ignore(label: jnp.ndarray, num_classes: int, ignore_label: int = -1):
    """One-hot (..., C) with all-zero rows at ignored pixels."""
    label = label.astype(jnp.int32)
    valid = label != ignore_label
    clipped = jnp.where(valid, label, 0)
    oh = (clipped[..., None] == jnp.arange(num_classes, dtype=jnp.int32)).astype(
        jnp.float32
    )
    return oh * valid[..., None].astype(jnp.float32)


def index_to_onehot(label: jnp.ndarray, num_classes: int, ignore_label: int = -1):
    """(B, H, W) int -> (B*H*W, C) float one-hot, zeros for ignore (matches
    ``alignment.py:468-481``)."""
    oh = one_hot_ignore(label, num_classes, ignore_label)
    return oh.reshape(-1, num_classes)


def downscale_label(
    label: jnp.ndarray,
    scale_factor: int = 16,
    num_classes: int = 7,
    ignore_label: int = -1,
    min_ratio: float = 0.75,
) -> jnp.ndarray:
    """Majority downscale of a hard label map (``alignment.py:484-509``).

    (B, H, W) -> (B, H/s, W/s). The ignore label participates as class C in
    the vote; cells won by ignore, or with winning ratio < min_ratio, get
    ignore_label.
    """
    b, h, w = label.shape
    s = scale_factor
    assert h % s == 0 and w % s == 0, (h, w, s)
    lbl = jnp.where(label == ignore_label, num_classes, label).astype(jnp.int32)
    # one-hot with the ignore bucket as channel C
    oh = (
        lbl[..., None] == jnp.arange(num_classes + 1, dtype=jnp.int32)
    ).astype(jnp.float32)  # (B, H, W, C+1)
    # 16x16 average pool via reshape (exact, no padding)
    oh = oh.reshape(b, h // s, s, w // s, s, num_classes + 1).mean(axis=(2, 4))
    max_ratio = oh.max(axis=-1)
    out = jnp.argmax(oh, axis=-1).astype(jnp.int32)
    out = jnp.where(out == num_classes, ignore_label, out)
    out = jnp.where(max_ratio < min_ratio, ignore_label, out)
    return out
