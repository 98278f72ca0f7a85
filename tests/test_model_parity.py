"""Cross-framework numerical parity: flax DeeplabV2 vs an independent torch
implementation of the same architecture (torchvision-spec ResNet + OS16
dilation surgery + dual PPM heads + affine-free instance norm + averaged
softmax eval), with identical weights ported via models/port_torch.

This validates conv padding, BN semantics, adaptive pooling, bilinear
resizes (both align_corners settings) and the head wiring end to end.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tnf

import jax
import jax.numpy as jnp

from uemda_tpu.models import DeeplabV2, DeeplabV2Config, BackboneConfig
from uemda_tpu.models.config import PPMConfig
from uemda_tpu.models.port_torch import port_deeplabv2


# ---------------- torch golden model (independent implementation) ----------


class TBasic(tnn.Module):
    expansion = 1

    def __init__(self, inp, planes, stride=1, dilation=1, downsample=None,
                 dilation2=None):
        super().__init__()
        # reference surgery is per conv (resnet.py:192-207): conv1 (the
        # stride carrier) gets dilate//2 in the first block, but conv2 is
        # an "other convolution" and always gets the FULL stage dilate
        d2 = dilation if dilation2 is None else dilation2
        self.conv1 = tnn.Conv2d(inp, planes, 3, stride, dilation, dilation, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, d2, d2, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = tnf.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return tnf.relu(y + idn)


class TBottle(tnn.Module):
    expansion = 4

    def __init__(self, inp, planes, stride=1, dilation=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inp, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, dilation, dilation, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = tnf.relu(self.bn1(self.conv1(x)))
        y = tnf.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return tnf.relu(y + idn)


class TResNet(tnn.Module):
    def __init__(self, block, layers, output_stride=16):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        plan = {
            32: [(1, 1), (2, 1), (2, 1), (2, 1)],
            16: [(1, 1), (2, 1), (2, 1), (1, 2)],
            8: [(1, 1), (2, 1), (1, 2), (1, 4)],
        }[output_stride]
        self.inp = 64
        for i, (planes, (stride, dilate)) in enumerate(
            zip((64, 128, 256, 512), plan)
        ):
            blocks = []
            for b in range(layers[i]):
                first = b == 0
                s = stride if first else 1
                d = max(dilate // 2, 1) if first else dilate
                ds = None
                if first and (s != 1 or self.inp != planes * block.expansion):
                    ds = tnn.Sequential(
                        tnn.Conv2d(self.inp, planes * block.expansion, 1, s, bias=False),
                        tnn.BatchNorm2d(planes * block.expansion),
                    )
                kw = {"dilation2": dilate} if block is TBasic else {}
                blocks.append(block(self.inp, planes, s, d, ds, **kw))
                self.inp = planes * block.expansion
            setattr(self, f"layer{i+1}", tnn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(tnf.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        return self.layer4(x)


class TPPM(tnn.Module):
    def __init__(self, num_classes, fc_dim, scales=(1, 2, 3, 6)):
        super().__init__()
        self.scales = scales
        self.ppm = tnn.ModuleList(
            tnn.Sequential(
                tnn.AdaptiveAvgPool2d(s),
                tnn.Conv2d(fc_dim, 512, 1, bias=False),
                tnn.BatchNorm2d(512),
                tnn.ReLU(),
            )
            for s in scales
        )
        self.conv_last = tnn.Sequential(
            tnn.Conv2d(fc_dim + len(scales) * 512, 512, 3, padding=1, bias=False),
            tnn.BatchNorm2d(512),
            tnn.ReLU(),
            tnn.Dropout2d(0.1),
            tnn.Conv2d(512, num_classes, 1),
        )

    def forward(self, x):
        hw = x.shape[2:]
        outs = [x] + [
            tnf.interpolate(m(x), hw, mode="bilinear", align_corners=False)
            for m in self.ppm
        ]
        return self.conv_last(torch.cat(outs, 1))


class TDeeplab(tnn.Module):
    def __init__(self, block, layers, num_classes, output_stride=16):
        super().__init__()
        self.encoder = tnn.Module()
        self.encoder.resnet = TResNet(block, layers, output_stride)
        fc_dim = 512 * block.expansion
        self.layer5 = TPPM(num_classes, fc_dim)
        self.layer6 = TPPM(num_classes, fc_dim)
        self.instance_norm = tnn.InstanceNorm2d(fc_dim)

    def forward(self, x):
        feat = self.instance_norm(self.encoder.resnet(x))
        x1 = tnf.interpolate(
            self.layer5(feat), x.shape[-2:], mode="bilinear", align_corners=True
        )
        x2 = tnf.interpolate(
            self.layer6(feat), x.shape[-2:], mode="bilinear", align_corners=True
        )
        return (x1.softmax(1) + x2.softmax(1)) / 2


def _randomize(model):
    g = torch.Generator().manual_seed(0)
    sd = model.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            sd[k] = torch.randn(v.shape, generator=g) * 0.05
            if "running_var" in k:
                sd[k] = sd[k].abs() + 0.5
    model.load_state_dict(sd)
    return model


@pytest.mark.parametrize(
    "resnet_type,block,layers,hw",
    [
        ("resnet18", TBasic, (2, 2, 2, 2), 64),
        ("resnet50", TBottle, (3, 4, 6, 3), 32),
    ],
)
def test_deeplab_eval_parity(resnet_type, block, layers, hw):
    num_classes = 6
    tmodel = _randomize(TDeeplab(block, layers, num_classes)).eval()
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    # torch names in the golden match the reference layout, but the golden's
    # PPM submodule indices are (0,1,2,3) = scales with conv at .1, bn at .2
    variables = port_deeplabv2(sd, use_ppm=True, multi_layer=True)

    fc_dim = 512 * block.expansion
    cfg = DeeplabV2Config(
        backbone=BackboneConfig(resnet_type=resnet_type, output_stride=16),
        multi_layer=True,
        use_ppm=True,
        ppm=PPMConfig(num_classes=num_classes, fc_dim=fc_dim),
        inchannels=fc_dim,
        num_classes=num_classes,
        is_ins_norm=True,
    )
    jmodel = DeeplabV2(cfg)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, hw, hw, 3)).astype(np.float32)

    with torch.no_grad():
        want = (
            tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
            .permute(0, 2, 3, 1)
            .numpy()
        )

    # validate the ported tree structure exactly matches the model's
    ref_vars = jmodel.init({"params": jax.random.key(0)}, jnp.asarray(x), train=False)
    ref_shapes = jax.tree.map(lambda a: a.shape, ref_vars)
    got_shapes = jax.tree.map(lambda a: np.asarray(a).shape, variables)
    assert ref_shapes == got_shapes

    got = np.asarray(jmodel.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


class TBottleG(tnn.Module):
    """Grouped bottleneck (ResNeXt)."""

    expansion = 4

    def __init__(self, inp, planes, stride=1, dilation=1, downsample=None,
                 groups=32, base_width=4):
        super().__init__()
        width = int(planes * (base_width / 64.0)) * groups
        self.conv1 = tnn.Conv2d(inp, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride, dilation, dilation,
                                groups=groups, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = tnf.relu(self.bn1(self.conv1(x)))
        y = tnf.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return tnf.relu(y + idn)


def test_resnext_grouped_conv_parity():
    """ResNeXt-50 32x4d encoder vs torch golden with identical weights —
    validates feature_group_count mapping for grouped convolutions."""
    from uemda_tpu.models import ResNetEncoder
    from uemda_tpu.models.port_torch import port_resnet_backbone

    tmodel = _randomize(TResNet(TBottleG, (3, 4, 6, 3), output_stride=16)).eval()
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params, stats = port_resnet_backbone(sd)

    enc = ResNetEncoder(BackboneConfig(resnet_type="resnext50_32x4d", output_stride=16))
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    ref_vars = enc.init(jax.random.key(0), jnp.asarray(x), train=False)
    got_shapes = jax.tree.map(lambda a: np.asarray(a).shape, {"params": params, "batch_stats": stats})
    ref_shapes = jax.tree.map(lambda a: a.shape, ref_vars)
    assert got_shapes == ref_shapes

    with torch.no_grad():
        want = (
            tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
            .permute(0, 2, 3, 1).numpy()
        )
    got = np.asarray(
        enc.apply({"params": params, "batch_stats": stats}, jnp.asarray(x), train=False)[-1]
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


class TDeepStem(tnn.Module):
    """v1c deep-stem resnet trunk (3x 3x3 stem convs)."""

    def __init__(self, block, layers):
        super().__init__()
        self.stem = tnn.Sequential(
            tnn.Conv2d(3, 32, 3, 2, 1, bias=False), tnn.BatchNorm2d(32), tnn.ReLU(),
            tnn.Conv2d(32, 32, 3, 1, 1, bias=False), tnn.BatchNorm2d(32), tnn.ReLU(),
            tnn.Conv2d(32, 64, 3, 1, 1, bias=False), tnn.BatchNorm2d(64), tnn.ReLU(),
        )
        self.trunk = TResNet(block, layers, output_stride=16)

    def forward(self, x):
        x = self.stem(x)
        x = self.trunk.maxpool(x)
        x = self.trunk.layer1(x)
        x = self.trunk.layer2(x)
        x = self.trunk.layer3(x)
        return self.trunk.layer4(x)


def test_v1c_deep_stem_parity():
    from uemda_tpu.models import ResNetEncoder
    from uemda_tpu.models.port_torch import port_resnet_backbone

    tmodel = _randomize(TDeepStem(TBottle, (3, 4, 6, 3))).eval()
    # build torchvision-v1c-style names: stem.{0,1,3,4,6,7}, layerN.B....
    sd = {}
    for k, v in tmodel.state_dict().items():
        k = k.replace("trunk.", "")
        sd[k] = v.numpy()
    params, stats = port_resnet_backbone(sd, deep_stem=True)

    enc = ResNetEncoder(BackboneConfig(resnet_type="resnet50_v1c", output_stride=16))
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    ref_vars = enc.init(jax.random.key(0), jnp.asarray(x), train=False)
    got_shapes = jax.tree.map(
        lambda a: np.asarray(a).shape, {"params": params, "batch_stats": stats}
    )
    assert got_shapes == jax.tree.map(lambda a: a.shape, ref_vars)

    with torch.no_grad():
        want = (
            tmodel(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
        )
    got = np.asarray(
        enc.apply({"params": params, "batch_stats": stats}, jnp.asarray(x), train=False)[-1]
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


class TASPP(tnn.Module):
    def __init__(self, inplanes, num_classes, dilations=(6, 12, 18, 24)):
        super().__init__()
        self.conv2d_list = tnn.ModuleList(
            tnn.Conv2d(inplanes, num_classes, 3, 1, d, d, bias=True)
            for d in dilations
        )

    def forward(self, x):
        out = self.conv2d_list[0](x)
        for m in self.conv2d_list[1:]:
            out = out + m(x)
        return out


def test_aspp_head_parity():
    from uemda_tpu.models.heads import ASPPHead

    tmodel = _randomize(TASPP(32, 6)).eval()
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 16, 16, 32)).astype(np.float32)
    with torch.no_grad():
        want = (
            tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
            .permute(0, 2, 3, 1).numpy()
        )
    head = ASPPHead(6)
    params = {"params": {}}
    for i, d in enumerate((6, 12, 18, 24)):
        w = tmodel.conv2d_list[i].weight.detach().numpy().transpose(2, 3, 1, 0)
        b = tmodel.conv2d_list[i].bias.detach().numpy()
        params["params"][f"aspp_d{d}"] = {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}
    got = np.asarray(head.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
