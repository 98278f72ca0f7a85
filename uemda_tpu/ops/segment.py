"""Segment reductions over superpixel id maps.

The reference relies on the native ``torch_scatter`` CUDA extension for these
(``uemda/gast/alignment.py:187`` scatter-sum in ``superpixel_expand``;
``alignment.py:245`` scatter-max for the superpixel refinement view). Here the
same reductions are expressed as XLA segment reductions with a *static*
segment-count bound so everything stays jittable; a Pallas kernel variant
lives in ``uemda_tpu.ops.pallas_kernels`` for the hot path.

Superpixel maps are (B, H, W) int32. With region_size=16 on a 512x512 tile,
ids span [0, 1024] where the top id marks shrunk boundary pixels (reference
``uemda/gast/superpixels.py:129-152``); ``max_segments`` must be a static
upper bound on ``max(id)+1``.
"""

import jax
import jax.numpy as jnp


def segment_sum(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int):
    """Batched segment sum: data (B, N, C), ids (B, N) -> (B, S, C)."""
    return jax.vmap(
        lambda d, i: jax.ops.segment_sum(d, i, num_segments=num_segments)
    )(data, segment_ids)


def segment_max(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int):
    """Batched segment max: data (B, N, C), ids (B, N) -> (B, S, C).

    Empty segments get the dtype minimum (callers only gather back through
    occupied ids, matching the reference's scatter(reduce='max') contract).
    """
    return jax.vmap(
        lambda d, i: jax.ops.segment_max(d, i, num_segments=num_segments)
    )(data, segment_ids)


def superpixel_view_probs(
    probs: jnp.ndarray, sup: jnp.ndarray, max_segments: int,
    impl: str = "auto",
) -> jnp.ndarray:
    """Per-pixel class probabilities pooled by max over the pixel's superpixel.

    Reference superpixel view (``alignment.py:238-250``): scatter-max of the
    soft label over superpixel ids, gathered back per pixel.

    ``impl``: 'xla' (jax.ops segment reduce + take_along_axis — the default:
    measured FASTER in-step on v5e, 36 vs 51 ms chained at batch 8 512^2
    S=1057; its SparseCore memory-space copies overlap with compute),
    'pallas' (VMEM-accumulator kernels, ops/pallas_kernels.py — kept for
    larger segment counts where the serialized scatter scales worse), or
    'auto' = xla.

    Args:
      probs: (B, H, W, C) soft labels.
      sup:   (B, H, W) int superpixel ids (boundary pixels carry the max id).
      max_segments: static bound for max(sup)+1.
    Returns:
      (B, H, W, C) per-pixel superpixel-pooled probabilities.
    """
    b, h, w, c = probs.shape
    flat_p = probs.reshape(b, h * w, c)
    flat_s = sup.reshape(b, h * w).astype(jnp.int32)
    if impl == "pallas":
        from uemda_tpu.ops.pallas_kernels import (
            segment_gather_pallas,
            segment_max_pallas,
        )

        pooled = segment_max_pallas(flat_p, flat_s, max_segments)
        gathered = segment_gather_pallas(pooled, flat_s)
    else:
        pooled = segment_max(flat_p, flat_s, max_segments)  # (B, S, C)
        gathered = jnp.take_along_axis(pooled, flat_s[..., None], axis=1)
    return gathered.reshape(b, h, w, c).astype(probs.dtype)


def superpixel_expand(
    label_hard: jnp.ndarray,
    sup: jnp.ndarray,
    num_classes: int,
    max_segments: int,
    ignore_label: int = -1,
) -> jnp.ndarray:
    """Expand hard pseudo labels to whole superpixels by majority vote.

    Reference ``Aligner.superpixel_expand`` (``alignment.py:175-192``):
    scatter-sum the one-hot labels per superpixel, take the winning class
    (ignore if the superpixel holds no labelled pixel), gather back.
    """
    from uemda_tpu.ops.labels import one_hot_ignore

    b, h, w = label_hard.shape
    oh = one_hot_ignore(label_hard, num_classes, ignore_label)  # (B,H,W,C)
    counts = segment_sum(
        oh.reshape(b, h * w, num_classes), sup.reshape(b, h * w), max_segments
    )  # (B, S, C)
    win = jnp.argmax(counts, axis=-1).astype(jnp.int32)  # (B, S)
    empty = counts.max(axis=-1) == 0
    win = jnp.where(empty, ignore_label, win)
    out = jnp.take_along_axis(win, sup.reshape(b, h * w), axis=1)
    return out.reshape(b, h, w)
