"""Jitted train steps for the three UemDA stages.

Each reference trainer's per-iteration body becomes ONE pure jitted function
(state, raw batches, rng) -> (state, metrics), with on-device augmentation
fused in front of the model and all mutable research state threaded through
``TrainState``:

  * ``make_src_step``      — ``tools/train_src.py:108-149``: supervised CE on
    twin heads (+ optional OHEM / class balance) + optional CORAL.
  * ``make_align_step``    — ``tools/train_align_uem.py:136-187``: + EMA
    prototype update, online multi-view label refinement, pseudo selection,
    PCL on both domains.
  * ``make_ssl_step``      — ``tools/train_ssl_uem.py:171-235``: + stored
    soft-label refinement and the UVEM/UPS/OHEM/Focal/GHM/CE target loss zoo.
  * ``make_init_proto_step`` — ``tools/init_prototypes.py:101-111``.

Mixed precision: master params live in f32; inside the loss they are cast to
``compute_dtype`` (bf16 by default) so convs hit the MXU at full rate, while
BN/IN statistics, losses and prototype algebra stay f32.

Under a data mesh, batches arrive sharded along 'data' and the state
replicated; XLA inserts the grad/statistics all-reduces.
"""

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from uemda_tpu.alignment.balance import class_balance_weight
from uemda_tpu.alignment.coral import align_domain
from uemda_tpu.alignment.losses import (
    cross_entropy_loss,
    focal_loss,
    ghm_loss,
    loss_calc,
    loss_calc_uvem,
    ohem_cross_entropy,
    ups_loss,
    uvem_loss,
)
from uemda_tpu.alignment.pcl import prototype_contrastive_loss
from uemda_tpu.alignment.prototypes import label_refine, update_prototype, update_avg
from uemda_tpu.datasets.augment import augment_batch
from uemda_tpu.ops.labels import downscale_label
from uemda_tpu.ops.pseudo import pseudo_selection
from uemda_tpu.ops.resize import upsample_logits
from uemda_tpu.train.state import TrainState


@dataclasses.dataclass(frozen=True)
class StageHParams:
    class_num: int
    ignore_label: int = -1
    crop: Tuple[int, int] = (512, 512)
    src_mean: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    src_std: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    tgt_mean: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    tgt_std: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    align_domain: bool = False
    source_loss: str = "ce"  # 'ce' | 'ohem'
    balance_source: bool = False
    refine: bool = True
    refine_mode: str = "all"
    refine_temp: float = 2.0
    cutoff_top: float = 0.8
    cutoff_low: float = 0.6
    pcl_temp: float = 8.0
    target_loss: str = "uvem"  # 'uvem'|'ups'|'ohem'|'focal'|'ghm'|'gdp'|'ce'|'none'
    balance_target: bool = False
    uvem_m: float = 0.2
    uvem_t: float = 0.7
    uvem_g: float = 4.0
    max_segments: int = 2048
    # target Normalize clamp(max=1.0) for the stage-3-style pipelines —
    # ISPRS configs only; False for LoveDA (see PairConfig.clamp_target)
    clamp_target: bool = False
    compute_dtype: str = "bfloat16"
    scale_factor: int = 16  # feature stride (output_stride)


def _cast(tree, dtype):
    return jax.tree.map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, tree
    )


def _forward_train(model, params, batch_stats, images, dropout_rng, dtype):
    """Train-mode forward with bf16 compute; returns (x1, x2, feat_f32, new_stats)."""
    (x1, x2, feat), mut = model.apply(
        {"params": _cast(params, dtype), "batch_stats": batch_stats},
        images.astype(dtype),
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": dropout_rng},
    )
    return (
        x1.astype(jnp.float32),
        x2.astype(jnp.float32),
        feat.astype(jnp.float32),
        mut["batch_stats"],
    )


def _source_loss_terms(hp: StageHParams, state, preds, label):
    """CE or OHEM over both heads, optional class balance (train_src.py:93,132)."""
    balance = state.balance_s
    pixel_weight = None
    if hp.balance_source:
        pixel_weight, balance = class_balance_weight(
            balance, label, hp.ignore_label
        )
    if hp.source_loss == "ohem":
        fn = lambda lg, lb: ohem_cross_entropy(
            lg, lb, hp.ignore_label, pixel_weight=pixel_weight
        )
    else:
        fn = lambda lg, lb: cross_entropy_loss(
            lg, lb, hp.ignore_label, pixel_weight=pixel_weight
        )
    return loss_calc(preds, label, fn, multi=True), balance


def make_src_step(model, hp: StageHParams):
    """Stage-1 step. batches: source {'image','label'}, target {'image'}."""
    dtype = jnp.dtype(hp.compute_dtype)

    def step(state: TrainState, batch_s, batch_t, rng):
        k_aug_s, k_aug_t, k_drop_s, k_drop_t, _ = jax.random.split(rng, 5)
        bs = augment_batch(k_aug_s, batch_s, hp.crop, hp.src_mean, hp.src_std, "oneof")
        if hp.align_domain:
            bt = augment_batch(
                k_aug_t, batch_t, hp.crop, hp.tgt_mean, hp.tgt_std, "oneof"
            )

        def loss_fn(params):
            p1, p2, feat_s, stats = _forward_train(
                model, params, state.batch_stats, bs["image"], k_drop_s, dtype
            )
            loss_seg, balance = _source_loss_terms(
                hp, state, [p1, p2], bs["label"]
            )
            loss_dom = 0.0
            if hp.align_domain:
                _, _, feat_t, stats = _forward_train(
                    model, params, stats, bt["image"], k_drop_t, dtype
                )
                loss_dom = align_domain(feat_s, feat_t)
            loss = loss_seg + loss_dom
            aux = dict(
                stats=stats, balance=balance,
                metrics=dict(loss=loss, loss_seg=loss_seg, loss_domain=loss_dom),
            )
            return loss, aux

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        state = state.replace(
            batch_stats=aux["stats"], balance_s=aux["balance"]
        )
        return state, aux["metrics"]

    return jax.jit(step, donate_argnums=(0,))


def make_init_proto_step(model, hp: StageHParams):
    """init_prototypes accumulation pass (tools/init_prototypes.py:101-111)."""
    dtype = jnp.dtype(hp.compute_dtype)

    def step(state: TrainState, batch_s, rng):
        k_aug, k_drop = jax.random.split(rng)
        bs = augment_batch(k_aug, batch_s, hp.crop, hp.src_mean, hp.src_std, "oneof")
        _, _, feat_s, _ = _forward_train(
            model, state.params, state.batch_stats, bs["image"], k_drop, dtype
        )
        aligner = update_avg(
            state.aligner, feat_s, bs["label"], hp.class_num, hp.scale_factor
        )
        return state.replace(aligner=aligner)

    return jax.jit(step, donate_argnums=(0,))


def make_align_step(model, hp: StageHParams):
    """Stage-2 step. batches: source {'image','label'},
    target {'image','sup'} (online pseudo supervision, no stored labels)."""
    dtype = jnp.dtype(hp.compute_dtype)

    def step(state: TrainState, batch_s, batch_t, rng):
        k_aug_s, k_aug_t, k_drop_s, k_drop_t = jax.random.split(rng, 4)
        bs = augment_batch(k_aug_s, batch_s, hp.crop, hp.src_mean, hp.src_std, "oneof")
        bt = augment_batch(k_aug_t, batch_t, hp.crop, hp.tgt_mean, hp.tgt_std, "oneof")

        def loss_fn(params):
            p1, p2, feat_s, stats = _forward_train(
                model, params, state.batch_stats, bs["image"], k_drop_s, dtype
            )
            # EMA prototypes from source (train_align_uem.py:150)
            aligner, label_s_down = update_prototype(
                state.aligner, feat_s, bs["label"], hp.class_num, hp.scale_factor
            )
            t1, t2, feat_t, stats = _forward_train(
                model, params, stats, bt["image"], k_drop_t, dtype
            )
            hw = hp.crop
            x1 = upsample_logits(t1, hw)
            x2 = upsample_logits(t2, hw)
            label_t_soft = jax.lax.stop_gradient(
                (jax.nn.softmax(x1, -1) + jax.nn.softmax(x2, -1)) * 0.5
            )
            if hp.refine:
                label_t_soft = label_refine(
                    aligner, label_t_soft, feat_t, [t1, t2],
                    sup=bt.get("sup"), mode=hp.refine_mode, temp=hp.refine_temp,
                    max_segments=hp.max_segments,
                )
            label_t_hard = pseudo_selection(
                label_t_soft, hp.cutoff_top, hp.cutoff_low, hp.ignore_label
            )
            label_t_down = downscale_label(
                label_t_hard, hp.scale_factor, hp.class_num, hp.ignore_label
            )
            loss_seg, balance = _source_loss_terms(hp, state, [p1, p2], bs["label"])
            loss_dom = align_domain(feat_s, feat_t) if hp.align_domain else 0.0
            loss_align = 0.5 * (
                prototype_contrastive_loss(
                    aligner.prototypes, feat_s, label_s_down, hp.pcl_temp,
                    hp.ignore_label,
                )
                + prototype_contrastive_loss(
                    aligner.prototypes, feat_t, label_t_down, hp.pcl_temp,
                    hp.ignore_label,
                )
            )
            loss = loss_seg + loss_dom + loss_align
            aux = dict(
                stats=stats, balance=balance, aligner=aligner,
                metrics=dict(
                    loss=loss, loss_seg=loss_seg,
                    loss_align=loss_align, loss_domain=loss_dom,
                ),
            )
            return loss, aux

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        state = state.replace(
            batch_stats=aux["stats"],
            balance_s=aux["balance"],
            aligner=aux["aligner"],
        )
        return state, aux["metrics"]

    return jax.jit(step, donate_argnums=(0,))


def _target_loss(hp: StageHParams, state, preds, label_hard, label_soft,
                 paste_mask=None):
    balance = state.balance_t
    ghm = state.ghm
    pixel_weight = None
    if hp.balance_target and hp.target_loss in ("uvem", "ups", "ce", "gdp"):
        pixel_weight, balance = class_balance_weight(
            balance, label_hard, hp.ignore_label
        )
    if hp.target_loss == "uvem":
        fn = lambda lg, lb, ls: uvem_loss(
            lg, lb, ls, hp.uvem_m, hp.uvem_t, hp.uvem_g, hp.ignore_label,
            pixel_weight, paste_mask=paste_mask,
        )
        loss = loss_calc_uvem(preds, label_hard, label_soft, fn, multi=True)
    elif hp.target_loss == "ups":
        fn = lambda lg, lb, ls: ups_loss(
            lg, lb, ls, hp.uvem_t, hp.ignore_label, pixel_weight
        )
        loss = loss_calc_uvem(preds, label_hard, label_soft, fn, multi=True)
    elif hp.target_loss == "ohem":
        loss = loss_calc(
            preds, label_hard,
            lambda lg, lb: ohem_cross_entropy(lg, lb, hp.ignore_label),
            multi=True,
        )
    elif hp.target_loss == "focal":
        loss = loss_calc(
            preds, label_hard,
            lambda lg, lb: focal_loss(lg, lb, 2.0, hp.ignore_label),
            multi=True,
        )
    elif hp.target_loss in ("ghm", "gdp"):
        # both heads share/advance the histogram state sequentially, like
        # the reference calling the same GHM/GDP module per head
        from uemda_tpu.alignment.losses import gdp_loss

        fn = ghm_loss if hp.target_loss == "ghm" else (
            lambda lg, lb, st, il: gdp_loss(
                lg, lb, st, il, pixel_weight=pixel_weight,
                n_weight_terms=1 + int(pixel_weight is not None),
            )
        )
        hw = label_hard.shape[-2:]
        total = 0.0
        for p in preds:
            l, ghm = fn(upsample_logits(p, hw), label_hard, ghm, hp.ignore_label)
            total = total + l
        loss = total / len(preds)
    elif hp.target_loss == "ce":
        loss = loss_calc(
            preds, label_hard,
            lambda lg, lb: cross_entropy_loss(
                lg, lb, hp.ignore_label, pixel_weight
            ),
            multi=True,
        )
    else:  # 'none'
        loss = 0.0
    return loss, balance, ghm


def make_ssl_step(model, hp: StageHParams):
    """Stage-3 step. batches: source {'image','label'},
    target {'image','prob','sup'} (stored soft labels from pseudo-gen)."""
    dtype = jnp.dtype(hp.compute_dtype)

    def step(state: TrainState, batch_s, batch_t, rng):
        k_aug_s, k_aug_t, k_drop_s, k_drop_t = jax.random.split(rng, 4)
        bs = augment_batch(k_aug_s, batch_s, hp.crop, hp.src_mean, hp.src_std, "oneof")
        # stage-3 target pipeline: compose (+ clamp on ISPRS only —
        # configs/st/uemda/2vaihingen.py:30-40 vs 2rural.py)
        bt = augment_batch(
            k_aug_t, batch_t, hp.crop, hp.tgt_mean, hp.tgt_std, "compose",
            clamp=hp.clamp_target,
        )

        def loss_fn(params):
            p1, p2, feat_s, stats = _forward_train(
                model, params, state.batch_stats, bs["image"], k_drop_s, dtype
            )
            t1, t2, feat_t, stats = _forward_train(
                model, params, stats, bt["image"], k_drop_t, dtype
            )
            label_t_soft = bt["prob"].astype(jnp.float32)
            if hp.refine:
                label_t_soft = label_refine(
                    state.aligner, label_t_soft, feat_t, [t1, t2],
                    sup=bt.get("sup"), mode=hp.refine_mode, temp=hp.refine_temp,
                    max_segments=hp.max_segments,
                )
            label_t_hard = pseudo_selection(
                label_t_soft, hp.cutoff_top, hp.cutoff_low, hp.ignore_label
            )
            # prototype EMA from source (train_ssl_uem.py:216)
            aligner, _ = update_prototype(
                state.aligner, feat_s, bs["label"], hp.class_num, hp.scale_factor
            )
            loss_src, balance_s = _source_loss_terms(hp, state, [p1, p2], bs["label"])
            loss_tgt, balance_t, ghm = _target_loss(
                hp, state, [t1, t2], label_t_hard, label_t_soft
            )
            loss = loss_src + loss_tgt
            aux = dict(
                stats=stats, aligner=aligner, balance_s=balance_s,
                balance_t=balance_t, ghm=ghm,
                metrics=dict(loss=loss, loss_source=loss_src, loss_target=loss_tgt),
            )
            return loss, aux

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        state = state.replace(
            batch_stats=aux["stats"],
            aligner=aux["aligner"],
            balance_s=aux["balance_s"],
            balance_t=aux["balance_t"],
            ghm=aux["ghm"],
        )
        return state, aux["metrics"]

    return jax.jit(step, donate_argnums=(0,))


def make_mix_step(model, hp: StageHParams, mix: str = "cutmix",
                  combo: bool = False):
    """ClassMix/CutMix SSL step (``tools/train_ssl_mix.py:144-176``): mine
    hard labels from the stored soft labels, paste source content into the
    target batch on device, CE on both mixed batches.

    ``combo=True`` is BEYOND-REFERENCE (the reference's mix trainer has no
    refine/UVEM hooks): the stored soft labels are refined online exactly as
    in ``make_ssl_step`` — on a no-grad mining forward of the UNMIXED target
    batch — then the soft map is pasted alongside the image, the target loss
    runs the stage-3 zoo (``_target_loss``), and source prototypes advance
    by EMA. Pasted pixels carry clean one-hot source supervision (entropy 0,
    so the UVEM parabola would weight them 0); the mixer's paste mask is
    threaded into ``uvem_loss`` so they train at weight 1 like the reference
    mix trainer's plain CE, and valid_cnt counts exactly the trained pixels.
    Measures whether the flagship machinery stacks on the mixing baseline."""
    from uemda_tpu.ops.labels import one_hot_ignore
    from uemda_tpu.ops.mixing import classmix, cutmix

    dtype = jnp.dtype(hp.compute_dtype)
    assert mix in ("cutmix", "classmix", "dacs")

    def step(state: TrainState, batch_s, batch_t, rng):
        # legacy 5-way split kept byte-identical so pre-combo mix runs
        # reproduce / resume deterministically; the combo-only mining-forward
        # dropout key is derived separately via fold_in
        k_aug_s, k_aug_t, k_mix, k_drop_s, k_drop_t = jax.random.split(rng, 5)
        k_drop_m = jax.random.fold_in(rng, 1)
        bs = augment_batch(k_aug_s, batch_s, hp.crop, hp.src_mean, hp.src_std, "oneof")
        bt = augment_batch(
            k_aug_t, batch_t, hp.crop, hp.tgt_mean, hp.tgt_std, "compose",
            clamp=hp.clamp_target,
        )
        label_t_soft = bt["prob"].astype(jnp.float32)
        if combo and hp.refine:
            # mining forward on the unmixed target: the gradient forward
            # below sees only mixed images, so refinement gets its own
            # pass — stats update discarded, nothing differentiated
            m1, m2, feat_m, _ = _forward_train(
                model, jax.lax.stop_gradient(state.params), state.batch_stats,
                bt["image"], k_drop_m, dtype,
            )
            label_t_soft = label_refine(
                state.aligner, label_t_soft, feat_m, [m1, m2],
                sup=bt.get("sup"), mode=hp.refine_mode, temp=hp.refine_temp,
                max_segments=hp.max_segments,
            )
        label_t_hard = pseudo_selection(
            label_t_soft, hp.cutoff_top, hp.cutoff_low, hp.ignore_label
        )
        soft_t = paste_t = None
        if combo:
            probs_s = one_hot_ignore(bs["label"], hp.class_num, hp.ignore_label)
            mixer = cutmix if mix == "cutmix" else classmix
            kw = dict(probs_s=probs_s, probs_t=label_t_soft)
            if mix != "cutmix":
                kw.update(class_num=hp.class_num, ignore_label=hp.ignore_label)
            img_s, lab_s, img_t, lab_t, soft_t, paste_t = mixer(
                k_mix, bs["image"], bs["label"], bt["image"], label_t_hard, **kw
            )
        elif mix == "cutmix":
            img_s, lab_s, img_t, lab_t = cutmix(
                k_mix, bs["image"], bs["label"], bt["image"], label_t_hard
            )
        else:
            img_s, lab_s, img_t, lab_t = classmix(
                k_mix, bs["image"], bs["label"], bt["image"], label_t_hard,
                class_num=hp.class_num, ignore_label=hp.ignore_label,
            )

        def loss_fn(params):
            p1, p2, feat_s, stats = _forward_train(
                model, params, state.batch_stats, img_s, k_drop_s, dtype
            )
            t1, t2, _, stats = _forward_train(
                model, params, stats, img_t, k_drop_t, dtype
            )
            loss_s, balance = _source_loss_terms(hp, state, [p1, p2], lab_s)
            if combo:
                loss_t, balance_t, ghm = _target_loss(
                    hp, state, [t1, t2], lab_t, soft_t, paste_mask=paste_t
                )
                aligner, _ = update_prototype(
                    state.aligner, feat_s, lab_s, hp.class_num, hp.scale_factor
                )
                extra = dict(aligner=aligner, balance_t=balance_t, ghm=ghm)
            else:
                loss_t, _ = _source_loss_terms(hp, state, [t1, t2], lab_t)
                extra = {}
            loss = loss_s + loss_t
            return loss, dict(
                stats=stats, balance=balance, extra=extra,
                metrics=dict(loss=loss, loss_source=loss_s, loss_target=loss_t),
            )

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        state = state.replace(
            batch_stats=aux["stats"], balance_s=aux["balance"], **aux["extra"]
        )
        return state, aux["metrics"]

    return jax.jit(step, donate_argnums=(0,))


def make_dca_step(model, hp: StageHParams):
    """DCA SSL step (``tools/train_ssl_dca.py:142-170``): CE on source +
    mined target labels, plus ICR/CCR class-correlation regularizers."""
    from uemda_tpu.alignment.dca import ccr, icr

    dtype = jnp.dtype(hp.compute_dtype)

    def step(state: TrainState, batch_s, batch_t, rng):
        k_aug_s, k_aug_t, k_drop_s, k_drop_t = jax.random.split(rng, 4)
        bs = augment_batch(k_aug_s, batch_s, hp.crop, hp.src_mean, hp.src_std, "oneof")
        bt = augment_batch(
            k_aug_t, batch_t, hp.crop, hp.tgt_mean, hp.tgt_std, "compose",
            clamp=hp.clamp_target,
        )
        label_t_hard = pseudo_selection(
            bt["prob"].astype(jnp.float32), hp.cutoff_top, hp.cutoff_low,
            hp.ignore_label,
        )

        def loss_fn(params):
            p1, p2, feat_s, stats = _forward_train(
                model, params, state.batch_stats, bs["image"], k_drop_s, dtype
            )
            t1, t2, feat_t, stats = _forward_train(
                model, params, stats, bt["image"], k_drop_t, dtype
            )
            loss_s, balance = _source_loss_terms(hp, state, [p1, p2], bs["label"])
            loss_t, _ = _source_loss_terms(hp, state, [t1, t2], label_t_hard)
            loss_icr = icr(p1, p2, feat_s, hp.class_num, ignore_bg=True)
            loss_ccr = ccr(
                p1, p2, feat_s, t1, t2, feat_t, hp.class_num, ignore_bg=True
            )
            loss = loss_s + loss_t + loss_icr + loss_ccr
            return loss, dict(
                stats=stats, balance=balance,
                metrics=dict(
                    loss=loss, loss_seg=loss_s + loss_t,
                    loss_icr=loss_icr, loss_ccr=loss_ccr,
                ),
            )

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=aux["stats"], balance_s=aux["balance"])
        return state, aux["metrics"]

    return jax.jit(step, donate_argnums=(0,))


def make_align_simple_step(model, hp: StageHParams, conf_thresh: float = 0.9):
    """PCL alignment without label refinement (``tools/train_align.py:
    126-155``): target pseudo label = stride-16 argmax of the averaged head
    softmax gated at ``conf_thresh``."""
    dtype = jnp.dtype(hp.compute_dtype)

    def step(state: TrainState, batch_s, batch_t, rng):
        k_aug_s, k_aug_t, k_drop_s, k_drop_t = jax.random.split(rng, 4)
        bs = augment_batch(k_aug_s, batch_s, hp.crop, hp.src_mean, hp.src_std, "oneof")
        bt = augment_batch(k_aug_t, batch_t, hp.crop, hp.tgt_mean, hp.tgt_std, "oneof")

        def loss_fn(params):
            p1, p2, feat_s, stats = _forward_train(
                model, params, state.batch_stats, bs["image"], k_drop_s, dtype
            )
            aligner, label_s_down = update_prototype(
                state.aligner, feat_s, bs["label"], hp.class_num, hp.scale_factor
            )
            t1, t2, feat_t, stats = _forward_train(
                model, params, stats, bt["image"], k_drop_t, dtype
            )
            soft = jax.lax.stop_gradient(
                (jax.nn.softmax(t1, -1) + jax.nn.softmax(t2, -1)) * 0.5
            )
            val = soft.max(-1)
            label_t = jnp.where(
                val < conf_thresh, hp.ignore_label, jnp.argmax(soft, -1)
            ).astype(jnp.int32)
            loss_seg, balance = _source_loss_terms(hp, state, [p1, p2], bs["label"])
            loss_dom = align_domain(feat_s, feat_t) if hp.align_domain else 0.0
            loss_align = 0.5 * (
                prototype_contrastive_loss(
                    aligner.prototypes, feat_s, label_s_down, hp.pcl_temp,
                    hp.ignore_label,
                )
                + prototype_contrastive_loss(
                    aligner.prototypes, feat_t, label_t, hp.pcl_temp,
                    hp.ignore_label,
                )
            )
            loss = loss_seg + loss_dom + loss_align
            return loss, dict(
                stats=stats, balance=balance, aligner=aligner,
                metrics=dict(
                    loss=loss, loss_seg=loss_seg,
                    loss_align=loss_align, loss_domain=loss_dom,
                ),
            )

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        state = state.replace(
            batch_stats=aux["stats"], balance_s=aux["balance"],
            aligner=aux["aligner"],
        )
        return state, aux["metrics"]

    return jax.jit(step, donate_argnums=(0,))
