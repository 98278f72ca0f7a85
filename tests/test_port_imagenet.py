"""ImageNet-backbone porting path: a fabricated torchvision-style resnet18
state dict (correct names/shapes) ports into model variables and changes the
forward output; head params remain untouched."""

import numpy as np
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from uemda_tpu.models import BackboneConfig, DeeplabV2, DeeplabV2Config
from uemda_tpu.models.config import PPMConfig
from uemda_tpu.models.port_torch import port_imagenet_backbone


def _torchvision_style_resnet18_sd():
    """Build name/shape-faithful resnet18 ImageNet state dict with random
    values (the real one is not downloadable in this offline environment)."""
    g = torch.Generator().manual_seed(0)

    sd = {}

    def conv(name, o, i, k):
        sd[name + ".weight"] = torch.randn((o, i, k, k), generator=g) * 0.05

    def bn(name, c):
        sd[name + ".weight"] = torch.randn((c,), generator=g).abs() + 0.5
        sd[name + ".bias"] = torch.randn((c,), generator=g) * 0.1
        sd[name + ".running_mean"] = torch.randn((c,), generator=g) * 0.1
        sd[name + ".running_var"] = torch.randn((c,), generator=g).abs() + 0.5
        sd[name + ".num_batches_tracked"] = torch.tensor(100)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    plan = [(64, 64, 2), (128, 64, 2), (256, 128, 2), (512, 256, 2)]
    for li, (planes, inp, blocks) in enumerate(plan, start=1):
        for b in range(blocks):
            pre = f"layer{li}.{b}"
            cin = inp if b == 0 else planes
            conv(pre + ".conv1", planes, cin, 3)
            bn(pre + ".bn1", planes)
            conv(pre + ".conv2", planes, planes, 3)
            bn(pre + ".bn2", planes)
            if b == 0 and (li > 1):
                conv(pre + ".downsample.0", planes, cin, 1)
                bn(pre + ".downsample.1", planes)
    sd["fc.weight"] = torch.randn((1000, 512), generator=g)
    sd["fc.bias"] = torch.randn((1000,), generator=g)
    return {k: v.numpy() for k, v in sd.items()}


def test_port_imagenet_backbone_roundtrip():
    cfg = DeeplabV2Config(
        backbone=BackboneConfig(resnet_type="resnet18", output_stride=16),
        multi_layer=True, use_ppm=False,
        ppm=PPMConfig(num_classes=6, fc_dim=512),
        inchannels=512, num_classes=6, is_ins_norm=True,
    )
    model = DeeplabV2(cfg)
    x = jnp.ones((1, 64, 64, 3))
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    before = np.asarray(model.apply(variables, x, train=False))
    head_before = np.asarray(
        jax.tree.leaves(variables["params"]["layer5"])[0]
    ).copy()

    sd = _torchvision_style_resnet18_sd()
    ported = port_imagenet_backbone(sd, variables)

    # backbone weights replaced exactly (conv1: OIHW -> HWIO)
    np.testing.assert_allclose(
        np.asarray(ported["params"]["encoder"]["conv1"]["kernel"]),
        sd["conv1.weight"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(
        np.asarray(ported["batch_stats"]["encoder"]["layer2"]["block0"]["ds_bn"]["bn"]["mean"]),
        sd["layer2.0.downsample.1.running_mean"],
    )
    # heads untouched
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(ported["params"]["layer5"])[0]), head_before
    )
    # forward actually changes
    after = np.asarray(model.apply(ported, x, train=False))
    assert not np.allclose(before, after)
