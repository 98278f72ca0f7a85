"""One-command real-data readiness gate (VERDICT r2 item 8).

The day a torchvision ImageNet ``.pth`` or a reference-trained Deeplabv2
checkpoint appears, this runs the whole trust chain in one command:

    checksum -> port -> live-reference logit parity -> (optional) eval

* **checksum**: torchvision filenames embed the first 8 hex chars of the
  file's SHA256 (that is how ``torch.hub`` verifies downloads); the table
  below is the reference's own URL list (``uemda/_resnets.py:7-17``), so a
  file that passes here is bit-identical to what the reference trains from.
* **port**: ``models/port_torch.py`` (same path the tests exercise).
* **parity**: builds the REAL reference torch module tree (via the
  tests/ref_oracle shims), loads the .pth into it, and compares forward
  logits against our flax model under the ported weights — the same oracle
  protocol as tests/test_ref_golden_{backbone,model}.py, but on the real
  weights instead of randomized ones.
* **eval** (optional): ``--run-eval --config-path <pair>`` scores the val
  split so the ported checkpoint's mIoU can be checked against BASELINE.md.

Prints ONE JSON line; exit code 0 only if every requested stage passes.

Usage:
  python tools/real_data_gate.py --torch-ckpt resnet50-19c8e357.pth
  python tools/real_data_gate.py --torch-ckpt Vaihingen_best.pth \
      --kind deeplabv2 --run-eval --config-path 2vaihingen
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import hashlib
import json
import os

# reference torchvision/openmmlab weight files and their SHA256 prefixes
# (from the filenames in uemda/_resnets.py:7-17 — torch.hub's check)
KNOWN_SHA8 = {
    "resnet18": "5c106cde",
    "resnet34": "333f7ec4",
    "resnet50": "19c8e357",
    "resnet101": "5d3b4d8f",
    "resnet152": "b121ed2d",
    "resnext50_32x4d": "7cdf4587",
    "resnext101_32x8d": "8ba56ff5",
    "resnext101_32x4d": "a5af3160",
    "resnet50_v1c": "2cccc1ad",
    "resnet101_v1c": "e67eebb6",
}


def sha256_file(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def check_sum(args, out):
    digest = sha256_file(args.torch_ckpt)
    out["sha256"] = digest
    if args.expect_sha256:
        ok = digest.startswith(args.expect_sha256.lower())
        out["sha_ok"] = ok
        return ok
    if args.kind == "imagenet":
        want = KNOWN_SHA8.get(args.resnet_type)
        out["sha_expected_prefix"] = want
        ok = want is not None and digest.startswith(want)
        out["sha_ok"] = ok
        return ok or args.allow_unverified
    # trained reference checkpoints have no canonical hash — record it so
    # the run is reproducible, and pass unless a pin was requested
    out["sha_ok"] = None
    return True


def _load_ref_sd(path):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k.replace("module.", ""): v for k, v in sd.items()}


def parity_imagenet(args, sd_t, out):
    """Backbone-pyramid parity: real reference ResNetEncoder loaded with the
    torchvision weights vs our flax encoder under the ported weights (the
    protocol of tests/test_ref_golden_backbone.py on REAL weights)."""
    import numpy as np
    import torch

    import jax
    import jax.numpy as jnp

    from tests.ref_oracle import ref_import
    from uemda_tpu.models import BackboneConfig, ResNetEncoder
    from uemda_tpu.models.port_torch import port_resnet_backbone

    ref_resnet = ref_import("uemda.resnet")
    ref_resnets = ref_import("uemda._resnets")
    from ever.core import registry  # shim, installed by ref_import

    if args.resnet_type not in registry.MODEL:  # shim registry is a dict
        registry.MODEL.register(
            args.resnet_type, getattr(ref_resnets, args.resnet_type)
        )
    ref = ref_resnet.ResNetEncoder(
        dict(resnet_type=args.resnet_type, output_stride=args.output_stride,
             pretrained=False)
    )
    ref.resnet.load_state_dict(sd_t, strict=False)  # fc is unused by encoder
    ref.eval()

    sd = {k: v.detach().numpy() for k, v in sd_t.items()}
    deep_stem = args.resnet_type.endswith("v1c")
    params, stats = port_resnet_backbone(sd, deep_stem=deep_stem)
    ours = ResNetEncoder(BackboneConfig(
        resnet_type=args.resnet_type, output_stride=args.output_stride
    ))
    variables = {"params": params, "batch_stats": stats}

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 128, 128, 3)).astype(np.float32)
    with torch.no_grad():
        ref_pyr = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    # parity is exact-math: run on CPU at HIGHEST precision (on TPU the
    # default conv precision rounds through bf16 — ~5e-2 max abs, which
    # would mask a real port bug)
    with jax.default_device(jax.devices("cpu")[0]):
        our_pyr = jax.jit(
            lambda v, a: ours.apply(v, a, False)
        )(variables, jnp.asarray(x))
    worst = 0.0
    for rt, ot in zip(ref_pyr, our_pyr):
        d = np.abs(np.asarray(ot) - np.transpose(rt.numpy(), (0, 2, 3, 1)))
        worst = max(worst, float(d.max()))
    out["parity_max_abs"] = worst
    return worst < args.parity_tol


def parity_deeplab(args, sd_t, out):
    """Eval-forward parity on the full Deeplabv2 (protocol of
    tests/test_ref_golden_model.py on REAL weights)."""
    import numpy as np
    import torch

    import jax
    import jax.numpy as jnp

    from tests.ref_oracle import ref_import
    from uemda_tpu.models import DeeplabV2, DeeplabV2Config
    from uemda_tpu.models.port_torch import port_deeplabv2

    Encoder = ref_import("uemda.models.Encoder")
    ref = Encoder.Deeplabv2(dict(
        backbone=dict(resnet_type=args.resnet_type,
                      output_stride=args.output_stride, pretrained=False),
        multi_layer=True, cascade=False, use_ppm=True,
        ppm=dict(num_classes=args.num_classes, use_aux=False, fc_dim=2048),
        inchannels=2048, num_classes=args.num_classes, is_ins_norm=True,
    ))
    ref.load_state_dict(sd_t)
    ref.eval()

    sd = {k: v.detach().numpy() for k, v in sd_t.items()}
    variables = port_deeplabv2(
        sd, deep_stem=args.resnet_type.endswith("v1c")
    )
    ours = DeeplabV2(DeeplabV2Config.uemda_default(
        num_classes=args.num_classes, resnet_type=args.resnet_type
    ))
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 128, 128, 3)).astype(np.float32)
    with torch.no_grad():
        r = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    with jax.default_device(jax.devices("cpu")[0]):  # exact-math parity
        o = jax.jit(lambda v, a: ours.apply(v, a, train=False))(
            variables, jnp.asarray(x)
        )
    worst = float(np.abs(
        np.asarray(o) - np.transpose(r.numpy(), (0, 2, 3, 1))
    ).max())
    out["parity_max_abs"] = worst
    return worst < args.parity_tol, variables


def main():
    parser = argparse.ArgumentParser(
        description="checksum -> port -> parity -> eval, in one command"
    )
    parser.add_argument("--torch-ckpt", type=str, required=True)
    parser.add_argument("--kind", choices=["imagenet", "deeplabv2"],
                        default="imagenet")
    parser.add_argument("--resnet-type", type=str, default="resnet50")
    parser.add_argument("--output-stride", type=int, default=16)
    parser.add_argument("--num-classes", type=int, default=6)
    parser.add_argument("--expect-sha256", type=str, default="",
                        help="pin the full or prefix SHA256 (overrides the "
                        "built-in torchvision table)")
    parser.add_argument("--allow-unverified", action="store_true",
                        help="continue past an unknown/failed checksum")
    parser.add_argument("--parity-tol", type=float, default=1e-3,
                        help="max-abs logit tolerance (f32 CPU vs XLA)")
    parser.add_argument("--skip-parity", action="store_true",
                        help="checksum+port only (no /root/reference or no "
                        "torch in the deployment env)")
    parser.add_argument("--out", type=str, default="",
                        help="write the ported variables here (.msgpack)")
    parser.add_argument("--run-eval", action="store_true",
                        help="deeplabv2 kind: score the val split of "
                        "--config-path with the ported weights")
    parser.add_argument("--config-path", type=str, default="2vaihingen")
    args = parser.parse_args()

    out = {"ckpt": os.path.basename(args.torch_ckpt), "kind": args.kind}
    ok = check_sum(args, out)
    if not ok:
        print(json.dumps({**out, "ok": False, "failed": "checksum"}))
        raise SystemExit(1)

    from uemda_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    sd_t = _load_ref_sd(args.torch_ckpt)

    variables = None
    if args.skip_parity:
        out["parity"] = "skipped"
        if args.kind == "deeplabv2":
            from uemda_tpu.models.port_torch import port_deeplabv2

            variables = port_deeplabv2(
                {k: v.detach().numpy() for k, v in sd_t.items()},
                deep_stem=args.resnet_type.endswith("v1c"),
            )
    elif args.kind == "imagenet":
        ok = parity_imagenet(args, sd_t, out)
    else:
        ok, variables = parity_deeplab(args, sd_t, out)
    if not ok:
        print(json.dumps({**out, "ok": False, "failed": "parity"}))
        raise SystemExit(1)

    if args.out:
        if args.kind == "imagenet":
            # full-model variables with the ImageNet backbone (what the
            # trainers' --pretrained expects)
            import jax
            import jax.numpy as jnp

            from uemda_tpu.models import DeeplabV2, DeeplabV2Config
            from uemda_tpu.models.port_torch import port_imagenet_backbone

            model = DeeplabV2(DeeplabV2Config.uemda_default(
                num_classes=args.num_classes, resnet_type=args.resnet_type
            ))
            v0 = model.init({"params": jax.random.key(0)},
                            jnp.ones((1, 64, 64, 3)), train=False)
            variables = port_imagenet_backbone(
                {k: v.detach().numpy() for k, v in sd_t.items()}, v0,
                deep_stem=args.resnet_type.endswith("v1c"),
            )
        from uemda_tpu.train.checkpoints import save_checkpoint

        save_checkpoint(args.out, variables)
        out["ported"] = args.out

    if args.run_eval:
        if args.kind != "deeplabv2":
            print(json.dumps({**out, "ok": False,
                              "failed": "eval needs --kind deeplabv2"}))
            raise SystemExit(1)
        from uemda_tpu.config import load_config
        from uemda_tpu.datasets.base import SegDataset
        from uemda_tpu.infer.evaluate import evaluate_dataset
        from uemda_tpu.models import DeeplabV2, DeeplabV2Config

        cfg = load_config(args.config_path)
        model = DeeplabV2(DeeplabV2Config.uemda_default(
            num_classes=cfg.class_num, resnet_type=args.resnet_type
        ))
        split = cfg.val
        ds = SegDataset(cfg.meta, list(split.image_dir),
                        list(split.mask_dir)[0])
        _, miou = evaluate_dataset(
            model, variables, ds, split.mean, split.std, tile=cfg.crop,
            batch_size=split.batch_size,
        )
        out["eval_miou"] = miou

    print(json.dumps({**out, "ok": True}))


if __name__ == "__main__":
    main()
