"""Reverse weight porting (uemda_tpu -> reference torch state dict):
export_deeplabv2 must round-trip exactly through port_deeplabv2, and the
.pth written by save_torch_state_dict must reload bit-identically."""

import numpy as np

import jax
import jax.numpy as jnp

from uemda_tpu.models import DeeplabV2, DeeplabV2Config
from uemda_tpu.models.port_torch import (
    export_deeplabv2,
    load_torch_state_dict,
    port_deeplabv2,
    save_torch_state_dict,
)


def _tiny_variables(resnet_type="resnet18", use_ppm=True):
    import dataclasses

    from uemda_tpu.models import ResNetEncoder
    from uemda_tpu.models.config import PPMConfig

    cfg = DeeplabV2Config.uemda_default(num_classes=6, resnet_type=resnet_type)
    fc_dim = ResNetEncoder.out_channels(resnet_type)
    cfg = dataclasses.replace(
        cfg,
        use_ppm=use_ppm,
        ppm=PPMConfig(num_classes=6, fc_dim=fc_dim),
        inchannels=fc_dim,
    )
    model = DeeplabV2(cfg)
    return model.init(
        {"params": jax.random.key(5)}, jnp.ones((1, 64, 64, 3)), train=False
    )


def _assert_tree_equal(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), (path, set(a) ^ set(b))
        for k in a:
            _assert_tree_equal(a[k], b[k], path + "/" + str(k))
    else:
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32), err_msg=path
        )


def test_export_roundtrips_through_port():
    variables = _tiny_variables()
    sd = export_deeplabv2(variables)
    # reference module names present
    assert "encoder.resnet.conv1.weight" in sd
    assert "encoder.resnet.layer1.0.conv1.weight" in sd
    assert "layer5.ppm.0.1.weight" in sd and "layer6.conv_last.4.bias" in sd
    assert sd["encoder.resnet.conv1.weight"].shape == (64, 3, 7, 7)
    back = port_deeplabv2(sd)
    _assert_tree_equal(back["params"], jax.tree.map(np.asarray, variables["params"]))
    _assert_tree_equal(
        back["batch_stats"], jax.tree.map(np.asarray, variables["batch_stats"])
    )


def test_export_pth_reloads_bit_identically(tmp_path):
    variables = _tiny_variables()
    sd = export_deeplabv2(variables)
    path = str(tmp_path / "exported.pth")
    save_torch_state_dict(path, sd)
    sd2 = load_torch_state_dict(path)
    assert set(sd) == set(sd2)
    for k in sd:
        np.testing.assert_array_equal(sd[k], sd2[k], err_msg=k)


def test_export_aspp_head_roundtrip():
    variables = _tiny_variables(use_ppm=False)
    sd = export_deeplabv2(variables, use_ppm=False)
    assert "layer5.conv2d_list.0.weight" in sd
    back = port_deeplabv2(sd, use_ppm=False)
    _assert_tree_equal(back["params"], jax.tree.map(np.asarray, variables["params"]))
