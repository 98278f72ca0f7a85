"""Single-image inference CLI (rebuild of reference
``tools/infer_single.py:14-70``): load a checkpoint, slide-infer one image,
save the raw id PNG + palette PNG (+ GT viz if a mask is found by the
img_dir->ann_dir substitution)."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os

import numpy as np
from PIL import Image

import jax.numpy as jnp

from uemda_tpu.config import load_config
from uemda_tpu.datasets.augment import normalize
from uemda_tpu.datasets.io import read_image
from uemda_tpu.infer.slide import make_predictor
from uemda_tpu.train.checkpoints import load_checkpoint
from uemda_tpu.train.loop import build_model, init_variables
from uemda_tpu.utils.log import str2bool
from uemda_tpu.utils.viz import VisualizeSegmm


from uemda_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()

def main():
    parser = argparse.ArgumentParser(description="Infer one image.")
    parser.add_argument("--config-path", type=str, default="2vaihingen")
    parser.add_argument("--ckpt-path", type=str, required=True)
    parser.add_argument("--image-path", type=str, required=True)
    parser.add_argument("--out-dir", type=str, default="./infer_out")
    parser.add_argument("--tta", type=str2bool, default=0)
    parser.add_argument("--slide", type=str2bool, default=1)
    parser.add_argument("--int8", type=str2bool, default=0,
                        help="serve convs on the MXU int8 path (infer/quant.py)")
    parser.add_argument("--fastpath", type=str2bool, default=0,
                        help="folded serving fast path (infer/fastpath.py); "
                        "with --int8, quantizes only the compute-bound GEMMs")
    parser.add_argument(
        "--raster",
        type=str2bool,
        default=0,
        help="spatially shard the image's rows over all chips with halo "
        "exchange (for whole rasters too big for one chip); implies --slide",
    )
    args = parser.parse_args()

    cfg = load_config(args.config_path)
    model = build_model(cfg)
    variables = init_variables(model, cfg)
    if args.ckpt_path.endswith((".pth", ".pt")):
        from uemda_tpu.models.port_torch import load_torch_state_dict, port_deeplabv2

        variables = port_deeplabv2(load_torch_state_dict(args.ckpt_path))
    else:
        variables = load_checkpoint(args.ckpt_path, variables)

    img = read_image(args.image_path).astype(np.float32)[None]
    split = cfg.val
    x = normalize(jnp.asarray(img), split.mean, split.std)
    if args.fastpath:
        from uemda_tpu.infer.fastpath import build_fastpath, check_fastpath_tile

        # the forward tile is cfg.crop when sliding/rastering, else the
        # image's own dims (--slide 0) — guard the one actually used
        check_fastpath_tile(
            cfg.crop if (args.slide or args.raster) else img.shape[1:3]
        )

        model, variables = build_fastpath(model, variables, int8=bool(args.int8))
    elif args.int8:
        from uemda_tpu.infer.quant import Int8Model

        model = Int8Model(model)
    if args.raster:
        from uemda_tpu.infer.raster import make_raster_predictor
        from uemda_tpu.parallel import make_mesh

        predictor = make_raster_predictor(
            model, make_mesh(), img.shape[1:3], tile=cfg.crop, tta=bool(args.tta)
        )
        pred = np.asarray(predictor(variables, x[0])).astype(np.uint8)
    else:
        tile = cfg.crop if args.slide else img.shape[1:3]
        predictor = make_predictor(model, tile, img.shape[1:3], tta=bool(args.tta))
        probs = predictor(variables, x)
        pred = np.asarray(jnp.argmax(probs, -1)[0]).astype(np.uint8)

    os.makedirs(args.out_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(args.image_path))[0]
    Image.fromarray(pred).save(os.path.join(args.out_dir, stem + "_ids.png"))
    viz = VisualizeSegmm(args.out_dir, cfg.meta.palette)
    viz(pred, stem + "_color.png")

    # GT viz if found by directory substitution (infer_single.py:64-68)
    gt_path = args.image_path.replace("img_dir", "ann_dir").replace(
        "images_png", "masks_png"
    )
    if gt_path != args.image_path and os.path.exists(gt_path):
        gt = np.asarray(Image.open(gt_path)).astype(np.int32) + cfg.meta.offset
        viz(gt, stem + "_gt.png")
    print(os.path.join(args.out_dir, stem + "_color.png"))


if __name__ == "__main__":
    main()
