"""Adversarial trainer step: G and D both update, losses finite (CPU tiny)."""

import numpy as np

import jax
import jax.numpy as jnp

from uemda_tpu.models import BackboneConfig, DeeplabV2, DeeplabV2Config
from uemda_tpu.models.config import PPMConfig
from uemda_tpu.train.adversarial import create_adv_state, make_adv_step
from uemda_tpu.train.lr import poly_warmup_schedule
from uemda_tpu.train.optim import make_optimizer
from uemda_tpu.train.state import create_train_state
from uemda_tpu.train.steps import StageHParams

C, HW = 6, 64


def test_adv_step_updates_both_players():
    cfg = DeeplabV2Config(
        backbone=BackboneConfig(resnet_type="resnet18"),
        multi_layer=True, use_ppm=False,
        ppm=PPMConfig(num_classes=C, fc_dim=512),
        inchannels=512, num_classes=C, is_ins_norm=True,
    )
    model = DeeplabV2(cfg)
    v = model.init({"params": jax.random.key(0)}, jnp.ones((1, HW, HW, 3)), train=False)
    seg = create_train_state(
        v, make_optimizer(poly_warmup_schedule(1e-2, 10)), C, feat_channels=512
    )
    adv = create_adv_state(seg, C, crop=(HW, HW))
    d0 = np.asarray(jax.tree.leaves(adv.d_params)[0]).copy()
    g0 = np.asarray(jax.tree.leaves(seg.params)[0]).copy()

    hp = StageHParams(
        class_num=C, crop=(HW, HW),
        src_mean=(128.0,) * 3, src_std=(64.0,) * 3,
        tgt_mean=(128.0,) * 3, tgt_std=(64.0,) * 3,
        compute_dtype="float32",
    )
    step = make_adv_step(model, hp)
    rng = np.random.default_rng(0)
    bs = {
        "image": jnp.asarray(rng.random((2, HW, HW, 3)) * 255, jnp.float32),
        "label": jnp.asarray(rng.integers(0, C, (2, HW, HW)), jnp.int32),
    }
    bt = {"image": jnp.asarray(rng.random((2, HW, HW, 3)) * 255, jnp.float32)}
    adv, m = step(adv, bs, bt, jax.random.key(1))
    for k in ("loss_seg", "loss_adv", "loss_d"):
        assert np.isfinite(float(m[k])), k
    assert not np.allclose(np.asarray(jax.tree.leaves(adv.d_params)[0]), d0)
    assert not np.allclose(np.asarray(jax.tree.leaves(adv.seg.params)[0]), g0)
    assert int(adv.seg.step) == 1
