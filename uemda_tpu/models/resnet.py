"""ResNet backbone zoo + segmentation encoder in flax (NHWC).

TPU-native rebuild of the reference backbone stack
(``uemda/_resnets.py:32-344`` + ``uemda/resnet.py:44-207``):

* BasicBlock / Bottleneck ResNet-18/34/50/101/152, ResNeXt-50/101 and the
  deep-stem v1c variants.
* Output-stride surgery (``resnet.py:192-207``): rather than mutating built
  modules, stride/dilation per stage are *computed up front* from the target
  output stride. The surgery is per conv: the 3x3 that previously carried
  stride 2 keeps ``dilate // 2``; every OTHER 3x3 in the stage gets the full
  ``dilate`` — including conv2 of the first BasicBlock (matters only for
  resnet18/34 at OS 8/16; Bottleneck has a single 3x3 per block).
* Frozen-BN semantics (``resnet.py:112-117``): running averages are always
  used and never updated (parameter freezing itself is an optimizer mask, see
  ``uemda_tpu.train.optim.freeze_mask``).
* Per-stage gradient checkpointing (``resnet.py:146-165``) via
  ``flax.linen.remat``.

All convolutions use explicit torch-style padding so spatial maps match the
reference exactly (XLA 'SAME' pads asymmetrically for even sizes).
"""

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from uemda_tpu.models.config import BackboneConfig

# kaiming_normal(fan_out) — torch init used by the reference (_resnets.py:166)
conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def conv(
    features: int,
    kernel: int,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
    use_bias: bool = False,
    name: Optional[str] = None,
):
    pad = dilation * (kernel - 1) // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        kernel_dilation=(dilation, dilation),
        feature_group_count=groups,
        use_bias=use_bias,
        kernel_init=conv_init,
        name=name,
    )


class BatchNorm(nn.Module):
    """BatchNorm matching torch defaults (eps 1e-5, momentum 0.1) with a
    ``frozen`` switch implementing the reference's BN-eval trick.

    Statistics are always computed in f32 (mixed-precision hygiene: bf16
    activations would corrupt the long-lived running averages)."""

    frozen: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        use_ra = (not train) or self.frozen
        y = nn.BatchNorm(
            use_running_average=use_ra,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            name="bn",
        )(x.astype(jnp.float32))
        return y.astype(x.dtype)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1  # conv1 (the conv that carried the stride)
    dilation2: int = 1  # conv2 — the surgery's "other convolutions" branch
    downsample: bool = False
    frozen_bn: bool = False
    groups: int = 1  # unused; BasicBlock supports groups=1 only
    base_width: int = 64
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        out = conv(self.planes, 3, self.stride, self.dilation, name="conv1")(x)
        out = BatchNorm(self.frozen_bn, name="bn1")(out, train)
        out = nn.relu(out)
        out = conv(self.planes, 3, 1, self.dilation2, name="conv2")(out)
        out = BatchNorm(self.frozen_bn, name="bn2")(out, train)
        if self.downsample:
            identity = conv(self.planes, 1, self.stride, name="ds_conv")(x)
            identity = BatchNorm(self.frozen_bn, name="ds_bn")(identity, train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    dilation2: int = 1  # unused: Bottleneck has a single 3x3 (conv2)
    downsample: bool = False
    frozen_bn: bool = False
    groups: int = 1
    base_width: int = 64
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_ch = self.planes * self.expansion
        identity = x
        out = conv(width, 1, name="conv1")(x)
        out = BatchNorm(self.frozen_bn, name="bn1")(out, train)
        out = nn.relu(out)
        # stride lives on conv2 (torchvision v1.5, _resnets.py:84)
        out = conv(width, 3, self.stride, self.dilation, self.groups, name="conv2")(out)
        out = BatchNorm(self.frozen_bn, name="bn2")(out, train)
        out = nn.relu(out)
        out = conv(out_ch, 1, name="conv3")(out)
        out = BatchNorm(self.frozen_bn, name="bn3")(out, train)
        if self.downsample:
            identity = conv(out_ch, 1, self.stride, name="ds_conv")(x)
            identity = BatchNorm(self.frozen_bn, name="ds_bn")(identity, train)
        return nn.relu(out + identity)


RESNET_SPECS = {
    # name: (block, layers, groups, width_per_group, deep_stem)
    "resnet18": (BasicBlock, (2, 2, 2, 2), 1, 64, False),
    "resnet34": (BasicBlock, (3, 4, 6, 3), 1, 64, False),
    "resnet50": (Bottleneck, (3, 4, 6, 3), 1, 64, False),
    "resnet101": (Bottleneck, (3, 4, 23, 3), 1, 64, False),
    "resnet152": (Bottleneck, (3, 8, 36, 3), 1, 64, False),
    "resnext50_32x4d": (Bottleneck, (3, 4, 6, 3), 32, 4, False),
    "resnext101_32x4d": (Bottleneck, (3, 4, 23, 3), 32, 4, False),
    "resnext101_32x8d": (Bottleneck, (3, 4, 23, 3), 32, 8, False),
    "resnet50_v1c": (Bottleneck, (3, 4, 6, 3), 1, 64, True),
    "resnet101_v1c": (Bottleneck, (3, 4, 23, 3), 1, 64, True),
}


def stage_plan(output_stride: int) -> Sequence[Tuple[int, int]]:
    """(stride, dilate) per stage for layers 1-4, reproducing the reference's
    ``_nostride_dilate`` surgery (``resnet.py:62-66,192-207``).

    dilate > 1 means: first block's 3x3 gets dilate//2, later blocks dilate.
    """
    if output_stride == 32:
        return [(1, 1), (2, 1), (2, 1), (2, 1)]
    if output_stride == 16:
        return [(1, 1), (2, 1), (2, 1), (1, 2)]
    return [(1, 1), (2, 1), (1, 2), (1, 4)]  # OS 8


def _max_pool_3x3_s2(x):
    """torch MaxPool2d(kernel=3, stride=2, padding=1)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        (1, 3, 3, 1),
        (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


class ResNetStage(nn.Module):
    """One residual stage (torch ``layerN``)."""

    block_cls: Any
    n_blocks: int
    planes: int
    in_ch: int
    stride: int
    dilate: int
    frozen_bn: bool
    groups: int
    base_width: int
    train: bool

    @nn.compact
    def __call__(self, x):
        for b in range(self.n_blocks):
            first = b == 0
            ds = first and (
                self.stride != 1
                or self.in_ch != self.planes * self.block_cls.expansion
            )
            x = self.block_cls(
                planes=self.planes,
                stride=self.stride if first else 1,
                # _nostride_dilate is PER CONV (resnet.py:192-207): only the
                # conv that carried the stride gets dilate//2; every other
                # 3x3 in the stage gets the full dilate — including conv2 of
                # the FIRST BasicBlock (Bottleneck has one 3x3, so there
                # dilation == dilation2 never diverges)
                dilation=max(self.dilate // 2, 1) if first else self.dilate,
                dilation2=self.dilate,
                downsample=ds,
                frozen_bn=self.frozen_bn,
                groups=self.groups,
                base_width=self.base_width,
                name=f"block{b}",
            )(x, self.train)
        return x


class ResNetEncoder(nn.Module):
    """Backbone encoder returning the [c2, c3, c4, c5] pyramid
    (``uemda/resnet.py:140-168``)."""

    config: BackboneConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        block_cls, layers, groups, base_width, deep_stem = RESNET_SPECS[
            cfg.resnet_type
        ]
        frozen_bn = not cfg.batchnorm_trainable

        # ---- stem ----
        if deep_stem:
            for i, (ch, s) in enumerate([(32, 2), (32, 1), (64, 1)]):
                x = conv(ch, 3, s, name=f"stem_conv{i + 1}")(x)
                x = BatchNorm(frozen_bn, name=f"stem_bn{i + 1}")(x, train)
                x = nn.relu(x)
        else:
            x = conv(64, 7, 2, name="conv1")(x)
            x = BatchNorm(frozen_bn, name="bn1")(x, train)
            x = nn.relu(x)
        x = _max_pool_3x3_s2(x)

        # ---- stages ----
        plan = stage_plan(cfg.output_stride)
        planes = (64, 128, 256, 512)
        outs = []
        in_ch = 64
        num_stages = 4 if cfg.include_conv5 else 3
        for stage in range(num_stages):
            stride, dilate = plan[stage]
            stage_cls = ResNetStage
            if cfg.with_cp[stage] and train:
                # trade FLOPs for HBM: rematerialize the stage on backward
                stage_cls = nn.remat(ResNetStage)
            x = stage_cls(
                block_cls=block_cls,
                n_blocks=layers[stage],
                planes=planes[stage],
                in_ch=in_ch,
                stride=stride,
                dilate=dilate,
                frozen_bn=frozen_bn,
                groups=groups,
                base_width=base_width,
                train=train,
                name=f"layer{stage + 1}",
            )(x)
            outs.append(x)
            in_ch = planes[stage] * block_cls.expansion
        return outs

    @staticmethod
    def out_channels(resnet_type: str) -> int:
        block_cls = RESNET_SPECS[resnet_type][0]
        return 512 * block_cls.expansion
