"""Offline torch <-> uemda_tpu checkpoint conversion.

Converts (a) torchvision ImageNet ResNet .pth files into backbone-initialized
model variables and (b) full reference Deeplabv2 .pth checkpoints into model
variables — both saved as flax msgpack. The reference downloads (a) at model
construction (``_resnets.py:230-238``); this environment has no egress, so
porting is an explicit offline step.

``--kind export`` goes the other way: a uemda_tpu .msgpack checkpoint is
written as a ``.pth`` state dict in the reference's module names, loadable
by the reference's Deeplabv2 (two-way migration).
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
    parser.add_argument("--torch-ckpt", type=str, default=None,
                        help=".pth input (imagenet/deeplabv2 kinds)")
    parser.add_argument("--msgpack-ckpt", type=str, default=None,
                        help=".msgpack input (export kind)")
    parser.add_argument("--out", type=str, required=True,
                        help=".msgpack output (or .pth for --kind export)")
    parser.add_argument("--kind", choices=["imagenet", "deeplabv2", "export"],
                        default="imagenet")
    parser.add_argument("--resnet-type", type=str, default="resnet50")
    parser.add_argument("--num-classes", type=int, default=6)
    args = parser.parse_args()

    deep_stem = args.resnet_type.endswith("v1c")
    if args.kind == "export":
        from uemda_tpu.models.port_torch import (
            export_deeplabv2,
            save_torch_state_dict,
        )
        from uemda_tpu.train.checkpoints import load_checkpoint

        cfg = DeeplabV2Config.uemda_default(
            num_classes=args.num_classes, resnet_type=args.resnet_type
        )
        model = DeeplabV2(cfg)
        variables = model.init(
            {"params": jax.random.key(0)}, jnp.ones((1, 64, 64, 3)), train=False
        )
        variables = load_checkpoint(args.msgpack_ckpt, variables)
        save_torch_state_dict(
            args.out, export_deeplabv2(variables, deep_stem=deep_stem)
        )
        print(args.out)
        return

    sd = load_torch_state_dict(args.torch_ckpt)
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
