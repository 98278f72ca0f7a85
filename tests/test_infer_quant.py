"""Int8 conv interception (uemda_tpu/infer/quant.py): exact int8 semantics
on a single conv, and end-to-end sanity on the flagship eval forward."""

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from uemda_tpu.infer.quant import Int8Model, _quantize_sym, int8_apply


class OneConv(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.Conv(
            5, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)), use_bias=True
        )(x)


def _manual_int8(x, kernel, bias):
    xq, sx = _quantize_sym(jnp.asarray(x), axes=(1, 2, 3))
    wq, sw = _quantize_sym(jnp.asarray(kernel), axes=(0, 1, 2))
    acc = jax.lax.conv_general_dilated(
        xq, wq, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return np.asarray(
        acc.astype(jnp.float32) * (sx.reshape(-1, 1, 1, 1) * sw.reshape(1, 1, 1, -1))
        + jnp.asarray(bias)
    )


def test_int8_conv_exact_semantics():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    model = OneConv()
    variables = model.init(jax.random.key(0), jnp.asarray(x))
    got = np.asarray(int8_apply(model, variables, jnp.asarray(x)))
    p = variables["params"]["Conv_0"]
    want = _manual_int8(x, p["kernel"], p["bias"])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # and it genuinely differs from the f32 conv (rounding happened)
    f32 = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert not np.allclose(got, f32, atol=1e-7)
    # ... but only slightly (8-bit relative error)
    assert np.abs(got - f32).max() < 0.05 * np.abs(f32).max() + 1e-3


def test_int8_flagship_eval_forward_agrees():
    from uemda_tpu.models import DeeplabV2, DeeplabV2Config

    cfg = DeeplabV2Config.uemda_default(num_classes=6, resnet_type="resnet18")
    model = DeeplabV2(cfg)
    x = jax.random.normal(jax.random.key(1), (1, 64, 64, 3))
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    probs_f32 = np.asarray(jax.jit(
        lambda v, x: model.apply(v, x, train=False)
    )(variables, x))
    probs_int8 = np.asarray(jax.jit(
        lambda v, x: Int8Model(model).apply(v, x, train=False)
    )(variables, x))
    assert probs_int8.shape == probs_f32.shape
    # eval forward returns averaged softmax: probabilities must stay valid
    np.testing.assert_allclose(probs_int8.sum(-1), 1.0, atol=1e-3)
    # quantization noise stays small relative to the probability scale
    assert np.abs(probs_int8 - probs_f32).mean() < 0.02
    # argmax agreement on the overwhelming majority of pixels
    agree = (probs_int8.argmax(-1) == probs_f32.argmax(-1)).mean()
    assert agree > 0.95, agree


def test_int8_model_in_slide_predictor():
    from uemda_tpu.infer.slide import make_predictor
    from uemda_tpu.models import DeeplabV2, DeeplabV2Config

    cfg = DeeplabV2Config.uemda_default(num_classes=6, resnet_type="resnet18")
    model = DeeplabV2(cfg)
    x = jax.random.normal(jax.random.key(2), (1, 96, 96, 3))
    variables = model.init({"params": jax.random.key(0)}, x[:, :64, :64], train=False)
    fn = make_predictor(
        Int8Model(model), (64, 64), (96, 96), compute_dtype="float32"
    )
    probs = np.asarray(fn(variables, x))
    assert probs.shape == (1, 96, 96, 6)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-3)


def test_int8_grouped_conv_exact():
    """ResNeXt-style grouped conv through the interceptor: int8 semantics
    must respect feature_group_count."""

    class GroupedConv(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(
                8, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=4,
                use_bias=False,
            )(x)

    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, 6, 6, 8)).astype(np.float32)
    model = GroupedConv()
    variables = model.init(jax.random.key(3), jnp.asarray(x))
    got = np.asarray(int8_apply(model, variables, jnp.asarray(x)))
    k = variables["params"]["Conv_0"]["kernel"]  # (3,3,2,8)
    xq, sx = _quantize_sym(jnp.asarray(x), axes=(1, 2, 3))
    wq, sw = _quantize_sym(jnp.asarray(k), axes=(0, 1, 2))
    acc = jax.lax.conv_general_dilated(
        xq, wq, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=4, preferred_element_type=jnp.int32,
    )
    want = np.asarray(
        acc.astype(jnp.float32) * (sx.reshape(-1, 1, 1, 1) * sw.reshape(1, 1, 1, -1))
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    f32 = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert np.abs(got - f32).max() < 0.05 * np.abs(f32).max() + 1e-3
