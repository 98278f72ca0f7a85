"""Prototype alignment: EMA class prototypes + multi-view pseudo-label
refinement.

Functional rebuild of the reference ``Aligner`` (``uemda/gast/alignment.py:
24-481``). The mutable singletons (prototypes, running sums/counts) become an
explicit ``AlignerState`` pytree carried in the train state; every update
returns a new state. Under data parallelism the local prototype statistics
are psum-reduced across replicas before the EMA (XLA inserts the collective
from the sharded-batch GEMM in ``compute_local_prototypes`` under ``jit`` —
see ``uemda_tpu/parallel/mesh.py``), which the single-GPU reference could
not express.

Views of ``label_refine`` (``alignment.py:194-293``):
  'p' prototype view  — inverse Pearson distance feature-vs-prototypes,
                        upsampled, softmax(T=1), max-normalized;
  'l' prediction view — temperature softmax of the upsampled head logits,
                        averaged over heads, max-normalized;
  's' superpixel view — per-superpixel scatter-max of the soft label,
                        gathered back, softmax(T), max-normalized; boundary
                        (shrunk) pixels keep the other views' weight;
  'n' neighbor view   — top-k feature neighbors vote on the prototype-argmax
                        class, distance-rank weighted.
All views are fixed-shape and jittable; segment ops come from
``uemda_tpu.ops.segment``.
"""

import math
from typing import Optional, Sequence, Tuple, Union

import flax.struct
import jax
import jax.numpy as jnp

from uemda_tpu.ops.labels import downscale_label, index_to_onehot
from uemda_tpu.ops.resize import resize_bilinear, upsample_logits
from uemda_tpu.ops.segment import superpixel_view_probs

EPS = 1e-7


@flax.struct.dataclass
class AlignerState:
    prototypes: jnp.ndarray  # (C, K)
    data_sum: jnp.ndarray  # (C, K) running sum for init_avg
    data_cnt: jnp.ndarray  # (C, 1)
    decay: float = flax.struct.field(pytree_node=False)
    ignore_label: int = flax.struct.field(pytree_node=False)


def init_aligner(
    class_num: int,
    feat_channels: int = 2048,
    decay: float = 0.996,
    ignore_label: int = -1,
    prototypes: Optional[jnp.ndarray] = None,
) -> AlignerState:
    if prototypes is None:
        prototypes = jnp.zeros((class_num, feat_channels), jnp.float32)
    return AlignerState(
        prototypes=jnp.asarray(prototypes, jnp.float32),
        data_sum=jnp.zeros((class_num, feat_channels), jnp.float32),
        data_cnt=jnp.zeros((class_num, 1), jnp.float32),
        decay=decay,
        ignore_label=ignore_label,
    )


# ---------------------------------------------------------------- distances


def pearson_dist(feat1: jnp.ndarray, feat2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise Pearson distance in [0, 1] (``alignment.py:424-451``;
    unbiased std, stop-gradient like the reference's .detach())."""
    k = feat1.shape[-1]
    f1 = feat1.astype(jnp.float32)
    f2 = feat2.astype(jnp.float32)
    c1 = f1 - f1.mean(axis=-1, keepdims=True)
    c2 = f2 - f2.mean(axis=-1, keepdims=True)
    cov = jnp.matmul(
        c1, c2.T, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ) / (k - 1 + EPS)  # (n, m)
    s1 = jnp.sqrt((c1 * c1).sum(-1) / (k - 1))  # unbiased std
    s2 = jnp.sqrt((c2 * c2).sum(-1) / (k - 1))
    denom = s1[:, None] * s2[None, :]
    d = (-cov / (denom + EPS) + 1.0) * 0.5
    return jax.lax.stop_gradient(d)


# ---------------------------------------------------------- prototype maths


def compute_local_prototypes(
    feat: jnp.ndarray,
    label_down: jnp.ndarray,
    prototypes: jnp.ndarray,
    class_num: int,
    ignore_label: int = -1,
) -> jnp.ndarray:
    """Mini-batch class means of features (``alignment.py:328-355``); classes
    absent from the batch fall back to the global prototype.

    feat: (B, h, w, K) NHWC; label_down: (B, h, w)."""
    k = feat.shape[-1]
    feats = feat.reshape(-1, k)  # (N, K)
    oh = index_to_onehot(label_down, class_num, ignore_label)  # (N, C)
    n_instance = oh.sum(axis=0)[:, None]  # (C, 1)
    # (C, N) @ (N, K) one MXU GEMM; f32 accumulation (prototypes are
    # long-lived EMA state — bf16 rounding would accumulate)
    sums = jnp.matmul(
        oh.T, feats.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    local = sums / (n_instance + EPS)
    return jnp.where(n_instance < 1, prototypes, local)


def update_prototype(
    state: AlignerState,
    feat: jnp.ndarray,
    label_full: jnp.ndarray,
    class_num: int,
    scale_factor: int = 16,
) -> Tuple[AlignerState, jnp.ndarray]:
    """``Aligner.update_prototype`` (alignment.py:86-90): downscale the label
    to feature stride, EMA the local prototypes into the state. Returns
    (new_state, downscaled label)."""
    label_down = downscale_label(
        label_full, scale_factor, class_num, state.ignore_label
    )
    local = compute_local_prototypes(
        jax.lax.stop_gradient(feat), label_down, state.prototypes, class_num,
        state.ignore_label,
    )
    new_proto = (1.0 - state.decay) * local + state.decay * state.prototypes
    return state.replace(prototypes=new_proto), label_down


def update_avg(
    state: AlignerState,
    feat: jnp.ndarray,
    label_full: jnp.ndarray,
    class_num: int,
    scale_factor: int = 16,
) -> AlignerState:
    """``Aligner.update_avg`` (alignment.py:107-119): accumulate sums/counts
    for exact-average prototype initialization."""
    label_down = downscale_label(
        label_full, scale_factor, class_num, state.ignore_label
    )
    k = feat.shape[-1]
    feats = jax.lax.stop_gradient(feat).reshape(-1, k).astype(jnp.float32)
    oh = index_to_onehot(label_down, class_num, state.ignore_label)
    sums = jnp.matmul(
        oh.T, feats, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    return state.replace(
        data_sum=state.data_sum + sums,
        data_cnt=state.data_cnt + oh.sum(axis=0)[:, None],
    )


def init_avg(state: AlignerState) -> AlignerState:
    """``Aligner.init_avg`` (alignment.py:121-126)."""
    return state.replace(prototypes=state.data_sum / (state.data_cnt + EPS))


# ------------------------------------------------------------ margin losses


def _class_align_loss(
    p1: jnp.ndarray, p2: jnp.ndarray, class_num: int,
    margin: float = 0.3, hard_ratio: float = 0.3,
) -> jnp.ndarray:
    """(alignment.py:357-384) margin loss between two prototype sets."""
    dist = pearson_dist(p1, p2)  # (C, C)
    hard_num = min(math.ceil(hard_ratio * class_num), class_num - 1)
    eye_neg = 1.0 - jnp.eye(class_num)
    masked = dist * eye_neg
    # k+1 smallest (diagonal zero is always among them), drop the first
    neg_vals = -jax.lax.top_k(-masked, hard_num + 1)[0]  # ascending smallest
    d_pos = jnp.diagonal(dist)[:, None]
    d_neg = neg_vals[:, 1:]
    loss = jnp.maximum(d_pos - d_neg + margin, 1e-6)
    return loss.mean()


def align_class(
    state: AlignerState,
    feat_s: jnp.ndarray,
    label_s: jnp.ndarray,
    class_num: int,
    feat_t: Optional[jnp.ndarray] = None,
    label_t: Optional[jnp.ndarray] = None,
    scale_factor: int = 16,
) -> jnp.ndarray:
    """``Aligner.align_class`` (alignment.py:128-154)."""
    label_down = downscale_label(label_s, scale_factor, class_num, state.ignore_label)
    half = feat_s.shape[0] // 2
    p1 = compute_local_prototypes(
        feat_s[:half], label_down[:half], state.prototypes, class_num, state.ignore_label
    )
    p2 = compute_local_prototypes(
        feat_s[half:], label_down[half:], state.prototypes, class_num, state.ignore_label
    )
    loss_inter = _class_align_loss(p1, p2, class_num)
    if feat_t is None or label_t is None:
        return loss_inter
    ps = compute_local_prototypes(
        feat_s, label_down, state.prototypes, class_num, state.ignore_label
    )
    label_t_down = downscale_label(label_t, scale_factor, class_num, state.ignore_label)
    pt = compute_local_prototypes(
        feat_t, label_t_down, state.prototypes, class_num, state.ignore_label
    )
    loss_intra = _class_align_loss(ps, pt, class_num)
    return 0.5 * (loss_inter + loss_intra)


def _instance_align_loss(
    state: AlignerState,
    feat: jnp.ndarray,
    label_down: jnp.ndarray,
    class_num: int,
    margin: float = 0.3,
    hard_ratio: float = 0.3,
) -> jnp.ndarray:
    """(alignment.py:386-422) margin loss instances vs prototypes."""
    k = feat.shape[-1]
    f = feat.reshape(-1, k)
    y = label_down.reshape(-1)
    not_ignored = (y != state.ignore_label).astype(jnp.float32)[:, None]
    mask_pos = index_to_onehot(label_down, class_num, state.ignore_label)
    mask_neg = 1.0 - mask_pos
    dist = pearson_dist(f, state.prototypes)  # (N, C)
    hard_num = min(math.ceil(hard_ratio * class_num) + 1, class_num)
    neg_vals = -jax.lax.top_k(-(dist * mask_neg), hard_num)[0]
    d_pos = (dist * mask_pos).sum(axis=1, keepdims=True)
    d_neg = neg_vals[:, 1:]
    loss = jnp.maximum(d_pos - d_neg + margin, 1e-6) * not_ignored
    cnt = not_ignored.sum() * (hard_num - 1)
    return loss.sum() / (cnt + EPS)


def align_instance(
    state: AlignerState,
    feat_s: jnp.ndarray,
    label_s: jnp.ndarray,
    class_num: int,
    feat_t: Optional[jnp.ndarray] = None,
    label_t: Optional[jnp.ndarray] = None,
    scale_factor: int = 16,
) -> jnp.ndarray:
    """``Aligner.align_instance`` (alignment.py:156-163)."""
    ld = downscale_label(label_s, scale_factor, class_num, state.ignore_label)
    loss = _instance_align_loss(state, feat_s, ld, class_num)
    if feat_t is not None and label_t is not None:
        ltd = downscale_label(label_t, scale_factor, class_num, state.ignore_label)
        loss = 0.5 * (loss + _instance_align_loss(state, feat_t, ltd, class_num))
    return loss


# ------------------------------------------------------------- label refine


def _softmax_t(x, temp, axis=-1):
    return jax.nn.softmax(x / temp, axis=axis)


def _max_normalize(w, axis=-1):
    return w / (w.max(axis=axis, keepdims=True) + EPS)


def label_refine(
    state: AlignerState,
    label_soft: jnp.ndarray,
    feat: jnp.ndarray,
    preds: Union[jnp.ndarray, Sequence[jnp.ndarray]],
    sup: Optional[jnp.ndarray] = None,
    mode: str = "all",
    temp: float = 2.0,
    topk: int = 32,
    max_segments: int = 2048,
) -> jnp.ndarray:
    """Multi-view refinement of soft pseudo labels (``alignment.py:194-293``).

    Args:
      label_soft: (B, H, W, C) current soft label at full resolution.
      feat: (B, h, w, K) feature map at stride 16.
      preds: head logits (B, h, w, C) or a list of two.
      sup: (B, H, W) superpixel ids (required for 's'/'all').
      mode: 'all' | 'p' | 'l' | 's' | 'n'.
    Returns:
      refined (B, H, W, C) soft label, renormalized over classes.
    """
    assert mode in ("all", "p", "l", "s", "n")
    b, h, w, kdim = feat.shape
    bo, ho, wo, c = label_soft.shape
    feat_flat = feat.reshape(-1, kdim)
    weight = None

    if mode in ("all", "p"):  # prototype view (alignment.py:215-223)
        simi = 1.0 / (pearson_dist(feat_flat, state.prototypes))
        simi = simi.reshape(b, h, w, c)
        simi = resize_bilinear(simi, (ho, wo), align_corners=True)
        pw = jax.lax.stop_gradient(_softmax_t(simi, 1.0))
        pw = _max_normalize(pw)
        weight = pw if weight is None else weight + pw

    if mode in ("all", "l"):  # prediction view (alignment.py:225-236)
        if isinstance(preds, (list, tuple)):
            ups = [upsample_logits(p, (ho, wo)) for p in preds]
            lw = sum(_softmax_t(u, temp) for u in ups) / len(ups)
        else:
            lw = _softmax_t(upsample_logits(preds, (ho, wo)), temp)
        lw = jax.lax.stop_gradient(lw)
        lw = _max_normalize(lw)
        weight = lw if weight is None else weight + lw

    if mode in ("all", "s") and sup is not None:  # superpixel view (:238-258)
        boundary_id = sup.max()
        ignored = (sup == boundary_id)[..., None]  # (B, H, W, 1)
        pooled = superpixel_view_probs(label_soft, sup, max_segments)
        sw = jax.lax.stop_gradient(_softmax_t(pooled, temp))
        sw = _max_normalize(sw)
        if mode == "all":
            weight = jnp.where(ignored, weight, weight * sw)
        else:
            weight = jnp.where(ignored, jnp.ones_like(sw), sw)

    if mode == "n":  # neighbor view (alignment.py:260-286)
        n = feat_flat.shape[0]
        fd = feat_flat.astype(jnp.float32)
        sq = (fd * fd).sum(-1)
        d2 = sq[:, None] + sq[None, :] - 2.0 * (fd @ fd.T)
        cdist = jnp.sqrt(jnp.maximum(d2, 0.0))
        simi = 1.0 / (cdist + EPS)
        _, topk_idx = jax.lax.top_k(jax.lax.stop_gradient(simi), topk + 1)
        proto_simi = 1.0 / pearson_dist(feat_flat, state.prototypes)  # (N, C)
        hard = jnp.argmax(proto_simi, axis=-1)  # (N,)
        neigh_cls = hard[topk_idx[:, 1:]]  # (N, topk)
        importance = 1.0 - jnp.arange(topk, dtype=jnp.float32) / topk  # (topk,)
        oh = jax.nn.one_hot(neigh_cls, c)  # (N, topk, C)
        cls_num = (oh * importance[None, :, None]).sum(axis=1)  # (N, C)
        ratio = cls_num / (cls_num.sum(-1, keepdims=True) + EPS)
        nw = _max_normalize(_softmax_t(ratio, temp))
        nw = nw.reshape(b, h, w, c)
        nw = resize_bilinear(nw, (ho, wo), align_corners=True)
        weight = jax.lax.stop_gradient(nw)

    if weight is None:
        return label_soft
    refined = jax.lax.stop_gradient(weight) * label_soft
    return refined / (refined.sum(axis=-1, keepdims=True) + EPS)


def update_prototype_by_target(
    state: AlignerState, feat_t: jnp.ndarray, label_t_soft: jnp.ndarray
) -> AlignerState:
    """``Aligner.update_prototype_bytarget`` (alignment.py:92-105): soft-label
    weighted feature means, EMA'd into the prototypes."""
    b, h, w, k = feat_t.shape
    c = label_t_soft.shape[-1]
    soft_down = resize_bilinear(label_t_soft, (h, w), align_corners=True)
    f = jax.lax.stop_gradient(feat_t).reshape(-1, 1, k)
    s = soft_down.reshape(-1, c, 1)
    local = (f * s).mean(axis=0)  # (C, K)
    new_proto = (1.0 - state.decay) * local + state.decay * state.prototypes
    return state.replace(prototypes=new_proto)


def prototype_weight_for_pixels(
    state: AlignerState,
    feat: jnp.ndarray,
    label_hard: jnp.ndarray,
    class_num: int,
) -> jnp.ndarray:
    """``Aligner.get_prototype_weight_4pixel`` (alignment.py:295-309): inverse
    Pearson similarity of each pixel to its labelled class prototype."""
    b, h, w, k = feat.shape
    ho, wo = label_hard.shape[-2:]
    simi = 1.0 / pearson_dist(feat.reshape(-1, k), state.prototypes)
    simi = simi.reshape(b, h, w, class_num)
    simi = resize_bilinear(simi, (ho, wo), align_corners=True)
    simi = _max_normalize(_softmax_t(simi, 1.0))
    oh = index_to_onehot(label_hard, class_num, state.ignore_label).reshape(
        b, ho, wo, class_num
    )
    return jax.lax.stop_gradient((simi * oh).sum(-1).reshape(-1))
