"""Raw ISPRS raster -> tiled dataset converter CLI.

Rebuild of ``convert_datasets/convert_potsdam.py`` / ``convert_vaihingen.py``
/ ``convert_potsdam_rgb.py``: clips the official big rasters into 512² tiles
under ``img_dir/{train,val,test}`` + ``ann_dir/...`` with the reference's
tile-name convention and train/val/test splits.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import glob
import os
import os.path as osp

from uemda_tpu.datasets.convert import (
    POTSDAM_SPLITS,
    VAIHINGEN_SPLITS,
    compute_channel_stats,
    convert_raster,
)


from uemda_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()

def main():
    parser = argparse.ArgumentParser(description="Convert ISPRS rasters.")
    parser.add_argument("dataset", choices=["potsdam", "potsdam_rgb", "vaihingen"])
    parser.add_argument("--dataset-path", required=True,
                        help="dir holding the official image/label rasters")
    parser.add_argument("--out-dir", required=True)
    parser.add_argument("--clip-size", type=int, default=512)
    parser.add_argument("--stats", action="store_true",
                        help="print channel stats of the produced train split")
    args = parser.parse_args()

    if args.dataset.startswith("potsdam"):
        splits, channels = POTSDAM_SPLITS, (
            "rgb" if args.dataset == "potsdam_rgb" else "irrg"
        )
        def tile_id(path):
            return "_".join(osp.basename(path).split("_")[2:4])
    else:
        splits, channels = VAIHINGEN_SPLITS, "rgb"  # Vaihingen rasters are IRRG 3ch
        def tile_id(path):
            stem = osp.splitext(osp.basename(path))[0]
            return stem.split("_")[-1].replace("area", "area")

    rasters = sorted(
        glob.glob(osp.join(args.dataset_path, "*.tif"))
        + glob.glob(osp.join(args.dataset_path, "*.png"))
    )
    label_rasters = [p for p in rasters if "label" in osp.basename(p).lower()]
    image_rasters = [p for p in rasters if p not in label_rasters]

    for split, ids in splits.items():
        for paths, sub, to_label in (
            (image_rasters, "img_dir", False),
            (label_rasters, "ann_dir", True),
        ):
            out = osp.join(args.out_dir, sub, split)
            for p in paths:
                if tile_id(p) in ids:
                    convert_raster(
                        p, out, args.clip_size, to_label=to_label,
                        channels=channels, name_prefix=tile_id(p),
                    )
            print(f"{split}/{sub}: done -> {out}")

    if args.stats:
        mean, std = compute_channel_stats(osp.join(args.out_dir, "img_dir", "train"))
        print("mean:", mean.round(4).tolist(), "std:", std.round(4).tolist())


if __name__ == "__main__":
    main()
