"""Offline torch -> uemda_tpu checkpoint conversion.

Converts (a) torchvision ImageNet ResNet .pth files into backbone-initialized
model variables and (b) full reference Deeplabv2 .pth checkpoints into model
variables — both saved as flax msgpack. The reference downloads (a) at model
construction (``_resnets.py:230-238``); this environment has no egress, so
porting is an explicit offline step.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp

from uemda_tpu.models import DeeplabV2, DeeplabV2Config
from uemda_tpu.models.port_torch import (
    load_torch_state_dict,
    port_deeplabv2,
    port_imagenet_backbone,
)
from uemda_tpu.train.checkpoints import save_checkpoint
from uemda_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()


def main():
    parser = argparse.ArgumentParser(description="Port torch checkpoints.")
    parser.add_argument("--torch-ckpt", type=str, required=True)
    parser.add_argument("--out", type=str, required=True, help=".msgpack path")
    parser.add_argument("--kind", choices=["imagenet", "deeplabv2"],
                        default="imagenet")
    parser.add_argument("--resnet-type", type=str, default="resnet50")
    parser.add_argument("--num-classes", type=int, default=6)
    args = parser.parse_args()

    sd = load_torch_state_dict(args.torch_ckpt)
    deep_stem = args.resnet_type.endswith("v1c")
    if args.kind == "deeplabv2":
        variables = port_deeplabv2(sd, deep_stem=deep_stem)
    else:
        cfg = DeeplabV2Config.uemda_default(
            num_classes=args.num_classes, resnet_type=args.resnet_type
        )
        model = DeeplabV2(cfg)
        variables = model.init(
            {"params": jax.random.key(0)}, jnp.ones((1, 64, 64, 3)), train=False
        )
        variables = port_imagenet_backbone(sd, variables, deep_stem=deep_stem)
    save_checkpoint(args.out, variables)
    print(args.out)


if __name__ == "__main__":
    main()
