"""Adversarial trainer step: G and D both update, losses finite (CPU tiny);
AdvState rides the unified training loop (resume + steps_per_call)."""

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


def _model_and_vars():
    cfg = DeeplabV2Config(
        backbone=BackboneConfig(resnet_type="resnet18"),
        multi_layer=True, use_ppm=False,
        ppm=PPMConfig(num_classes=C, fc_dim=512),
        inchannels=512, num_classes=C, is_ins_norm=True,
    )
    model = DeeplabV2(cfg)
    v = model.init({"params": jax.random.key(0)}, jnp.ones((1, HW, HW, 3)), train=False)
    return model, v


def _hp():
    return StageHParams(
        class_num=C, crop=(HW, HW),
        src_mean=(128.0,) * 3, src_std=(64.0,) * 3,
        tgt_mean=(128.0,) * 3, tgt_std=(64.0,) * 3,
        compute_dtype="float32",
    )


def _batches():
    rng = np.random.default_rng(0)
    bs = {
        "image": jnp.asarray(rng.random((2, HW, HW, 3)) * 255, jnp.float32),
        "label": jnp.asarray(rng.integers(0, C, (2, HW, HW)), jnp.int32),
    }
    bt = {"image": jnp.asarray(rng.random((2, HW, HW, 3)) * 255, jnp.float32)}
    return bs, bt


def test_adv_on_unified_loop_resume_matches_uninterrupted(tmp_path):
    """train_adv rides run_training_loop (VERDICT r2 item 5): the full
    AdvState (G + D params, both optimizers, step) snapshots and resumes
    exactly, and the chunked steps_per_call path drives an AdvState."""
    import itertools
    import logging

    from uemda_tpu.train.loop import LoopHooks, maybe_resume, run_training_loop

    model, v = _model_and_vars()
    step = make_adv_step(model, _hp())
    bs, bt = _batches()
    logger = logging.getLogger("adv-loop-test")

    def fresh():
        seg = create_train_state(
            jax.tree.map(jnp.copy, v),
            make_optimizer(poly_warmup_schedule(1e-2, 10)), C,
            feat_channels=512,
        )
        return create_adv_state(seg, C, crop=(HW, HW))

    # uninterrupted 4 steps (exercises a K=2 chunk at i=2)
    s_full = run_training_loop(
        fresh(), step, itertools.repeat(bs), itertools.repeat(bt), 4, logger,
        LoopHooks(eval_every=10**9, log_every=2, steps_per_call=2), rng_seed=7,
    )
    assert int(s_full.step) == 4  # step property delegates to seg

    # interrupted after 2, resume auto, finish with the same chunking
    run_dir = str(tmp_path)
    path = f"{run_dir}/state_curr.msgpack"
    run_training_loop(
        fresh(), step, itertools.repeat(bs), itertools.repeat(bt), 2, logger,
        LoopHooks(eval_every=10**9, log_every=2, steps_per_call=2,
                  state_path=path), rng_seed=7,
    )
    s_b, start, state_path = maybe_resume(fresh(), run_dir, "auto", logger)
    assert start == 2 and state_path == path
    s_b = run_training_loop(
        s_b, step, itertools.repeat(bs), itertools.repeat(bt), 4, logger,
        LoopHooks(eval_every=10**9, log_every=2, steps_per_call=2,
                  state_path=path), rng_seed=7, start_step=start,
    )

    assert int(s_b.step) == 4
    for la, lb in zip(jax.tree.leaves(s_full.seg.params),
                      jax.tree.leaves(s_b.seg.params)):
        np.testing.assert_allclose(
            np.asarray(la, np.float32), np.asarray(lb, np.float32),
            atol=1e-6, rtol=1e-5,
        )
    for la, lb in zip(jax.tree.leaves(s_full.d_params),
                      jax.tree.leaves(s_b.d_params)):
        np.testing.assert_allclose(
            np.asarray(la, np.float32), np.asarray(lb, np.float32),
            atol=1e-6, rtol=1e-5,
        )


def test_adv_step_updates_both_players():
    model, v = _model_and_vars()
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
