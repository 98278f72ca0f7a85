"""Adversarial output-space domain adaptation (AdaptSegNet-style).

The reference ships patch discriminators (``uemda/models/Discriminator.py``)
and an ``configs/adv`` method family whose trainer no longer exists in the
repo (SURVEY §1 L7). This module provides the working TPU-native trainer for
that family: alternate segmenter/discriminator updates in one jitted step —
the segmenter is additionally trained to fool the discriminator on target
head outputs; the discriminator distinguishes source vs target softmax maps.
"""

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from uemda_tpu.alignment.extra_losses import bce_logits_loss
from uemda_tpu.datasets.augment import augment_batch
from uemda_tpu.models.discriminator import FCDiscriminator
from uemda_tpu.ops.resize import upsample_logits
from uemda_tpu.train.state import TrainState
from uemda_tpu.train.steps import StageHParams, _forward_train, _source_loss_terms


@flax.struct.dataclass
class AdvState:
    seg: TrainState
    d_params: Any
    d_opt: Any
    d_tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    # delegation so run_training_loop / maybe_resume drive an AdvState like
    # any TrainState (step counter, profiler readback, eval checkpointing)
    @property
    def step(self):
        return self.seg.step

    @property
    def params(self):
        return self.seg.params

    @property
    def batch_stats(self):
        return self.seg.batch_stats


def create_adv_state(seg_state: TrainState, num_classes: int,
                     d_lr: float = 1e-4, crop=(512, 512)) -> AdvState:
    disc = FCDiscriminator()
    d_params = disc.init(
        jax.random.key(0), jnp.ones((1,) + tuple(crop) + (num_classes,))
    )["params"]
    # reference adversarial baselines use Adam for D (AdaptSegNet convention)
    d_tx = optax.adam(d_lr, b1=0.9, b2=0.99)
    return AdvState(seg_state, d_params, d_tx.init(d_params), d_tx)


def make_adv_step(model, hp: StageHParams, lambda_adv: float = 0.001):
    """One jitted G+D step: G minimizes seg CE + λ·fool-D on target; D
    classifies source(1) vs target(0) softmax maps."""
    disc = FCDiscriminator()
    dtype = jnp.dtype(hp.compute_dtype)

    def step(adv: AdvState, batch_s, batch_t, rng):
        k_aug_s, k_aug_t, k_drop_s, k_drop_t = jax.random.split(rng, 4)
        bs = augment_batch(k_aug_s, batch_s, hp.crop, hp.src_mean, hp.src_std, "oneof")
        bt = augment_batch(k_aug_t, batch_t, hp.crop, hp.tgt_mean, hp.tgt_std, "oneof")
        state = adv.seg

        def soft_maps(params, stats, images, krng):
            p1, p2, _, stats = _forward_train(model, params, stats, images, krng, dtype)
            up = upsample_logits(p2, hp.crop)
            return p1, p2, jax.nn.softmax(up, axis=-1), stats

        # ---- G update ----
        def g_loss(params):
            p1, p2, _, stats = _forward_train(
                model, params, state.batch_stats, bs["image"], k_drop_s, dtype
            )
            loss_seg, balance = _source_loss_terms(hp, state, [p1, p2], bs["label"])
            _, _, soft_t, stats = soft_maps(params, stats, bt["image"], k_drop_t)
            d_out = disc.apply({"params": adv.d_params}, soft_t)
            # fool D: target should look like source (label 1)
            loss_adv = bce_logits_loss(d_out, jnp.ones_like(d_out))
            loss = loss_seg + lambda_adv * loss_adv
            return loss, dict(stats=stats, balance=balance, soft_t=soft_t,
                              loss_seg=loss_seg, loss_adv=loss_adv)

        (_, aux), grads = jax.value_and_grad(g_loss, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=aux["stats"], balance_s=aux["balance"])

        # ---- D update (detached segmenter outputs) ----
        _, _, soft_s, _ = soft_maps(state.params, state.batch_stats,
                                    bs["image"], k_drop_s)
        soft_s = jax.lax.stop_gradient(soft_s)
        soft_t = jax.lax.stop_gradient(aux["soft_t"])

        def d_loss(d_params):
            out_s = disc.apply({"params": d_params}, soft_s)
            out_t = disc.apply({"params": d_params}, soft_t)
            return 0.5 * (
                bce_logits_loss(out_s, jnp.ones_like(out_s))
                + bce_logits_loss(out_t, jnp.zeros_like(out_t))
            )

        ld, d_grads = jax.value_and_grad(d_loss)(adv.d_params)
        d_updates, d_opt = adv.d_tx.update(d_grads, adv.d_opt, adv.d_params)
        d_params = optax.apply_updates(adv.d_params, d_updates)

        metrics = dict(
            loss=aux["loss_seg"] + lambda_adv * aux["loss_adv"],
            loss_seg=aux["loss_seg"], loss_adv=aux["loss_adv"], loss_d=ld,
        )
        return AdvState(state, d_params, d_opt, adv.d_tx), metrics

    return jax.jit(step, donate_argnums=(0,))
