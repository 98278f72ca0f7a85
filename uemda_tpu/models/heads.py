"""Segmentation heads: PSP pyramid pooling (PPMBilinear) and DeepLab ASPP.

Rebuilds ``uemda/models/Encoder.py:8-84`` in flax/NHWC:

* ``PPMBilinear``: adaptive-avg-pool at scales (1,2,3,6) -> 1x1 conv 512 ->
  BN -> ReLU -> bilinear upsample (align_corners=False, matching
  ``Encoder.py:48-51``) -> concat with the input feature -> 3x3 conv 512 ->
  BN -> ReLU -> dropout(0.1) -> 1x1 classifier.
* ``ASPPHead`` (reference ``Classifier_Module``): parallel 3x3 convs at
  dilations (6,12,18,24), bias=True, summed; weights ~ N(0, 0.01)
  (``Encoder.py:77-78``).

The adaptive pools + upsamples are expressed as separable dense matmuls
(``uemda_tpu.ops.resize``) so the whole pyramid lowers to MXU GEMMs.
"""

import flax.linen as nn
import jax.numpy as jnp

from uemda_tpu.models.config import PPMConfig
from uemda_tpu.models.resnet import BatchNorm, conv
from uemda_tpu.ops.resize import adaptive_avg_pool, resize_bilinear


class PPMBilinear(nn.Module):
    config: PPMConfig

    @nn.compact
    def __call__(self, feat, train: bool = False):
        cfg = self.config
        h, w = feat.shape[1], feat.shape[2]
        outs = [feat]
        for scale in cfg.pool_scales:
            p = adaptive_avg_pool(feat, scale)
            p = conv(512, 1, name=f"ppm{scale}_conv")(p)
            p = BatchNorm(name=f"ppm{scale}_bn")(p, train)
            p = nn.relu(p)
            outs.append(resize_bilinear(p, (h, w), align_corners=False))
        x = jnp.concatenate(outs, axis=-1)
        x = conv(512, 3, name="last_conv")(x)
        x = BatchNorm(name="last_bn")(x, train)
        x = nn.relu(x)
        x = nn.Dropout(0.1, deterministic=not train)(x)
        x = nn.Conv(
            cfg.num_classes, (1, 1), use_bias=True, name="classifier"
        )(x)
        return x


class ASPPHead(nn.Module):
    """Reference ``Classifier_Module`` — summed parallel dilated convs."""

    num_classes: int
    dilations: tuple = (6, 12, 18, 24)

    @nn.compact
    def __call__(self, feat, train: bool = False):
        init = nn.initializers.normal(stddev=0.01)
        out = None
        for d in self.dilations:
            y = nn.Conv(
                self.num_classes,
                (3, 3),
                padding=((d, d), (d, d)),
                kernel_dilation=(d, d),
                use_bias=True,
                kernel_init=init,
                name=f"aspp_d{d}",
            )(feat)
            out = y if out is None else out + y
        return out
