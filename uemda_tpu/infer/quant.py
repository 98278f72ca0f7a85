"""Int8 serving path: run any flax model's convolutions on the MXU's int8
mode without touching model code.

The reference has no quantized inference (PyTorch 1.8 fp32/TF32 only); this
is a TPU-native serving extra. On v5e the MXU runs int8 x int8 -> int32 at
2x the bf16 MAC rate, and conv weights/activations of this model family
tolerate 8-bit symmetric quantization with no calibration data:

* weights: symmetric per-output-channel scales (abs-max / 127), computed
  from the f32 master weights at trace time — XLA folds the rounding into
  the compiled program once since weights are loop-invariant;
* activations: dynamic symmetric per-tensor scale (abs-max / 127) — no
  calibration set needed, shape-static so fully jittable;
* accumulation in int32 (`preferred_element_type`), dequantized with the
  fused scalar ``sx * sw[c]`` multiply; bias and BatchNorm stay f32 and XLA
  fuses them into the dequant epilogue.

Zero-padding is exact under symmetric quantization (zero-point 0), so conv
padding semantics are unchanged.

Implementation: a ``flax.linen.intercept_methods`` interceptor replaces
every ``nn.Conv.__call__`` with the int8 kernel; ``Int8Model`` wraps a model
object so it drops into :func:`uemda_tpu.infer.slide.make_predictor`, the
raster predictor, ``evaluate_dataset`` and the CLIs unchanged.
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _quantize_sym(x, axes, dtype=jnp.int8):
    """Symmetric abs-max quantization over ``axes``; returns (q, scale)."""
    amax = jnp.max(jnp.abs(x), axis=axes, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(dtype)
    return q, scale


def _int8_conv(mod: nn.Conv, x: jnp.ndarray) -> jnp.ndarray:
    """Re-implement a bound ``nn.Conv`` call with int8 inputs/weights and an
    int32 accumulator, matching the module's stride/padding/dilation/groups."""
    def _pair(v):
        if v is None:
            return (1, 1)
        if isinstance(v, int):
            return (v, v)
        return tuple(v)

    kernel = mod.variables["params"]["kernel"].astype(jnp.float32)  # HWIO
    xq, sx = _quantize_sym(x.astype(jnp.float32), axes=(1, 2, 3))
    wq, sw = _quantize_sym(kernel, axes=(0, 1, 2))  # per-out-channel
    strides = _pair(mod.strides)
    dil = _pair(mod.kernel_dilation)
    acc = jax.lax.conv_general_dilated(
        xq,
        wq,
        window_strides=strides,
        padding=mod.padding,
        rhs_dilation=dil,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=mod.feature_group_count,
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (sx.reshape(-1, 1, 1, 1) * sw.reshape(1, 1, 1, -1))
    if mod.use_bias:
        y = y + mod.variables["params"]["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _interceptor(next_fun, args, kwargs, context):
    mod = context.module
    if (
        type(mod) is nn.Conv
        and context.method_name == "__call__"
        and "params" in mod.variables
    ):
        return _int8_conv(mod, args[0])
    return next_fun(*args, **kwargs)


class Int8Model:
    """Duck-typed model wrapper: ``apply`` runs the wrapped model with every
    ``nn.Conv`` rerouted through the int8 path. Drop-in for the predictors
    (they only call ``model.apply(variables, x, train=False)``)."""

    def __init__(self, model: Any):
        self.model = model

    def __getattr__(self, name):
        return getattr(self.model, name)

    def apply(self, variables, *args, **kwargs):
        if kwargs.get("train"):
            raise ValueError(
                "Int8Model is inference-only: gradients through the rounded "
                "int8 weights are zero — train with the f32/bf16 model"
            )
        with nn.intercept_methods(_interceptor):
            return self.model.apply(variables, *args, **kwargs)


def int8_apply(model, variables, *args, **kwargs):
    """Functional form of :class:`Int8Model`."""
    return Int8Model(model).apply(variables, *args, **kwargs)
