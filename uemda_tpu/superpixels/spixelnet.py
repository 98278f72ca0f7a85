"""SpixelNet (SIN): learned superpixel affinity CNN.

Rebuild of the reference's dormant learned-superpixel module
(``uemda/gast/sin/spixel_deconv.py:13-143``): an encoder-decoder that
predicts, per pixel, a softmax over the 9 neighboring grid cells
(``assign_ch = 9``) — the soft pixel-to-superpixel assignment of
"Superpixel Segmentation with Fully Convolutional Networks" (CVPR 2020).
NHWC flax; transposed convs as resize+conv (TPU-friendlier than strided
deconv and equivalent up to parameterization).
"""

import flax.linen as nn
import jax.numpy as jnp

from uemda_tpu.ops.resize import resize_bilinear


def _conv(features, k=3, stride=1):
    pad = k // 2
    return nn.Conv(
        features, (k, k), strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        kernel_init=nn.initializers.variance_scaling(0.02, "fan_in", "normal"),
    )


class _ConvBNRelu(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        x = _conv(self.features, 3, self.stride)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        return nn.leaky_relu(x, 0.1)


class SpixelNet(nn.Module):
    """Returns (B, H, W, 9) softmax assignment maps."""

    assign_ch: int = 9

    @nn.compact
    def __call__(self, x, train: bool = False):
        skips = []
        feats = x
        widths = (16, 32, 64, 128, 256)
        for i, w in enumerate(widths):
            feats = _ConvBNRelu(w, stride=1 if i == 0 else 2, name=f"conv{i}a")(
                feats, train
            )
            feats = _ConvBNRelu(w, name=f"conv{i}b")(feats, train)
            skips.append(feats)
        out = feats
        for i in range(len(widths) - 2, -1, -1):
            hw = (skips[i].shape[1], skips[i].shape[2])
            out = resize_bilinear(out, hw, align_corners=False)
            out = _conv(widths[i], 3, 1)(out)
            out = nn.leaky_relu(out, 0.1)
            out = jnp.concatenate([out, skips[i]], axis=-1)
            out = _ConvBNRelu(widths[i], name=f"up{i}")(out, train)
        logits = _conv(self.assign_ch, 3, 1)(out)
        return nn.softmax(logits, axis=-1)
