"""Adversarial-DA discriminators and MMD baseline model.

Rebuilds the reference baselines kept for the ``configs/adv`` / ``configs/mmd``
method families (``uemda/models/Discriminator.py:4-78``,
``uemda/models/Deeplabv2_MMD.py:8-56``): 4-layer 4x4-stride-2 patch
discriminators, a pixel discriminator, a GAP reduction head and the MMD
variant of DeepLab-v2. NHWC, flax.
"""

import flax.linen as nn
import jax.numpy as jnp

from uemda_tpu.models.config import BackboneConfig
from uemda_tpu.models.heads import ASPPHead
from uemda_tpu.models.resnet import ResNetEncoder
from uemda_tpu.ops.resize import resize_bilinear


def _conv4x4(features):
    return nn.Conv(features, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)))


class FCDiscriminator(nn.Module):
    """(Discriminator.py:4-28)"""

    ndf: int = 64

    @nn.compact
    def __call__(self, x):
        for mult in (1, 2, 4, 8):
            x = _conv4x4(self.ndf * mult)(x)
            x = nn.leaky_relu(x, 0.2)
        return _conv4x4(1)(x)


class FCDiscriminatorLocal(nn.Module):
    """(Discriminator.py:31-57): 3 conv blocks + classifier + x32 upsample."""

    ndf: int = 64

    @nn.compact
    def __call__(self, x):
        for mult in (1, 2, 4):
            x = _conv4x4(self.ndf * mult)(x)
            x = nn.leaky_relu(x, 0.2)
        x = _conv4x4(1)(x)
        h, w = x.shape[1] * 32, x.shape[2] * 32
        return resize_bilinear(x, (h, w), align_corners=False)


class PixelDiscriminator(nn.Module):
    """(Discriminator.py:60-78)"""

    ndf: int = 512
    num_classes: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.ndf, (3, 3), padding=((1, 1), (1, 1)))(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(self.ndf // 2, (3, 3), padding=((1, 1), (1, 1)))(x)
        x = nn.leaky_relu(x, 0.2)
        src = nn.Conv(self.num_classes, (3, 3), padding=((1, 1), (1, 1)))(x)
        tgt = nn.Conv(self.num_classes, (3, 3), padding=((1, 1), (1, 1)))(x)
        return jnp.concatenate([src, tgt], axis=-1)


class ReductionLayer(nn.Module):
    """GAP + 2-layer MLP feature reduction (Deeplabv2_MMD.py:8-23)."""

    inplanes: int = 2048

    @nn.compact
    def __call__(self, feat):
        x = feat.mean(axis=(1, 2))  # GAP
        x = nn.relu(nn.Dense(self.inplanes // 4)(x))
        x = nn.relu(nn.Dense(self.inplanes // 8)(x))
        return x


class DeeplabV2MMD(nn.Module):
    """MMD baseline (Deeplabv2_MMD.py:26-43): single ASPP head + reduction
    feature; train -> (logits_upsampled, reduced_feat), eval -> softmax."""

    backbone: BackboneConfig = BackboneConfig()
    num_classes: int = 7
    inchannels: int = 2048

    @nn.compact
    def __call__(self, x, train: bool = False):
        hw = (x.shape[1], x.shape[2])
        feat = ResNetEncoder(self.backbone, name="encoder")(x, train)[-1]
        reduced = ReductionLayer(self.inchannels, name="reduction")(feat)
        logits = ASPPHead(self.num_classes, name="cls_pred")(feat, train)
        logits = resize_bilinear(logits, hw, align_corners=True)
        if train:
            return logits, reduced
        return nn.softmax(logits, axis=-1)


def mmd_linear(f_s: jnp.ndarray, f_t: jnp.ndarray) -> jnp.ndarray:
    """Linear-kernel MMD between reduced features (the MMDLoss the reference
    imports for this baseline): ||mean(f_s) - mean(f_t)||^2."""
    delta = f_s.mean(axis=0) - f_t.mean(axis=0)
    return (delta * delta).sum()
