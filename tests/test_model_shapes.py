"""Shape/jit coverage for every Deeplabv2 config branch
(multi_layer x cascade x use_ppm x is_ins_norm, output strides)."""

import jax
import jax.numpy as jnp
import pytest

from uemda_tpu.models import BackboneConfig, DeeplabV2, DeeplabV2Config
from uemda_tpu.models.config import PPMConfig


def _build(hw=64, **kw):
    bb = kw.pop("backbone", {})
    cfg = DeeplabV2Config(
        backbone=BackboneConfig(resnet_type="resnet18", **bb),
        ppm=PPMConfig(num_classes=6, fc_dim=512),
        inchannels=512,
        num_classes=6,
        **kw,
    )
    model = DeeplabV2(cfg)
    x = jnp.ones((1, hw, hw, 3))
    vars_ = model.init({"params": jax.random.key(0)}, x, train=False)
    return model, vars_, x


def test_multilayer_ppm_train_and_eval():
    model, vars_, x = _build(multi_layer=True, use_ppm=True, is_ins_norm=True)
    (x1, x2, feat), _ = model.apply(
        vars_, x, train=True, mutable=["batch_stats"], rngs={"dropout": jax.random.key(1)}
    )
    assert x1.shape == x2.shape == (1, 4, 4, 6)
    assert feat.shape == (1, 4, 4, 512)
    out = model.apply(vars_, x, train=False)
    assert out.shape == (1, 64, 64, 6)


def test_multilayer_aspp():
    model, vars_, x = _build(multi_layer=True, use_ppm=False, is_ins_norm=False)
    (x1, x2, feat), _ = model.apply(
        vars_, x, train=True, mutable=["batch_stats"], rngs={"dropout": jax.random.key(1)}
    )
    assert x1.shape == (1, 4, 4, 6)


def test_single_head():
    model, vars_, x = _build(multi_layer=False, use_ppm=True, is_ins_norm=True)
    (x1, feat), _ = model.apply(
        vars_, x, train=True, mutable=["batch_stats"], rngs={"dropout": jax.random.key(1)}
    )
    assert x1.shape == (1, 4, 4, 6)
    out = model.apply(vars_, x, train=False)
    assert out.shape == (1, 64, 64, 6)


def test_cascade_heads():
    cfg = DeeplabV2Config(
        backbone=BackboneConfig(resnet_type="resnet18"),
        multi_layer=True,
        cascade=True,
        use_ppm=True,
        ppm=PPMConfig(num_classes=6, fc_dim=512),
        inchannels=512,
        num_classes=6,
        is_ins_norm=True,
    )
    model = DeeplabV2(cfg)
    x = jnp.ones((1, 64, 64, 3))
    vars_ = model.init({"params": jax.random.key(0)}, x, train=False)
    (x1, f1, x2, f2), _ = model.apply(
        vars_, x, train=True, mutable=["batch_stats"], rngs={"dropout": jax.random.key(1)}
    )
    assert f1.shape[-1] == 256 and f2.shape[-1] == 512
    assert x1.shape[-1] == 6 and x2.shape[-1] == 6


@pytest.mark.parametrize("os,expect", [(8, 8), (16, 4), (32, 2)])
def test_output_strides(os, expect):
    model, vars_, x = _build(
        multi_layer=True, use_ppm=False, is_ins_norm=False, backbone={"output_stride": os}
    )
    (x1, _, _), _ = model.apply(
        vars_, x, train=True, mutable=["batch_stats"], rngs={"dropout": jax.random.key(1)}
    )
    assert x1.shape[1] == expect


def test_frozen_bn_does_not_update_stats():
    model, vars_, x = _build(
        multi_layer=True,
        use_ppm=False,
        is_ins_norm=False,
        backbone={"batchnorm_trainable": False},
    )
    _, mut = model.apply(
        vars_,
        x * 5.0,
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(1)},
    )
    before = vars_["batch_stats"]["encoder"]["bn1"]["bn"]["mean"]
    after = mut["batch_stats"]["encoder"]["bn1"]["bn"]["mean"]
    assert (jnp.asarray(before) == jnp.asarray(after)).all()


def test_instance_norm_high_mean_stability():
    """Regression: the variance must be the two-pass mean of squared
    deviations — E[x^2]-E[x]^2 catastrophically cancels in f32 for
    high-mean low-variance channels (e.g. a near-saturated ReLU channel)."""
    import numpy as np

    from uemda_tpu.models.deeplabv2 import instance_norm

    rng = np.random.default_rng(0)
    x = (1000.0 + 0.01 * rng.standard_normal((2, 16, 16, 4))).astype(np.float32)
    y = np.asarray(instance_norm(jnp.asarray(x)))
    x64 = x.astype(np.float64)
    want = (x64 - x64.mean((1, 2), keepdims=True)) / np.sqrt(
        x64.var((1, 2), keepdims=True) + 1e-5
    )
    # f32 two-pass keeps ~3% error at mean/std=1e5 (input-rounding limited);
    # the cancelling E[x^2]-E[x]^2 form was off by >7 here (750%)
    np.testing.assert_allclose(y, want.astype(np.float32), atol=6e-2)
    assert abs(float(y.mean())) < 1e-2 and abs(float(y.std()) - 1.0) < 5e-2
