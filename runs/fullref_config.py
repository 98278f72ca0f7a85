"""FULL reference schedule at the flagship LoveDA geometry (VERDICT r4
item 3): 4000/6000/6000 steps with EVAL_EVERY=500 / GENE_EVERY=1000 —
exactly ``configs/st/uemda/2urban.py:18-25`` — over a REAL-cardinality
synthetic target split (64 × 1024² tiles, vs the 16 the compressed r2-r4
chains used), so long-schedule effects are exercised where they bite:

  * BN running-statistics drift over 6000 stage-3 steps,
  * six GENE_EVERY pseudo-label regenerations per stage over the full
    64-image target train split at 1024² (slide 3×3 + 8-view TTA =
    4608 tile-forwards + a ~0.9 GB fp16 prob readback per regen),
  * host-pipeline endurance: decode pool, prob-file I/O and RAM over a
    ~5 h chain.

Geometry and semantics identical to runs/loveda_synth_config.py (1024²
tiles, 7 classes, raw-0 padding borders -> ignore, 512² random crops,
LoveDA shared normalization stats, no clamp — ``uemda/datasets/
loveda.py:17-46``, ``configs/ToURBAN.py:51-52``). Isolated under
/tmp/uemda_fullref. Use: bash runs/r5_fullref.sh
"""

import os

from uemda_tpu.config import PairConfig, SplitConfig
from uemda_tpu.datasets.meta import NORM_STATS, LoveDA
from uemda_tpu.datasets.synthetic import make_synthetic_dataset

ROOT = "/tmp/uemda_fullref"
HW = 1024

if not os.path.isdir(f"{ROOT}/src/img_dir/train"):
    make_synthetic_dataset(
        f"{ROOT}/src", LoveDA, n_train=64, n_val=8, hw=HW, seed=0,
        pad_border=32,
    )
if not os.path.isdir(f"{ROOT}/tgt/img_dir/train"):
    make_synthetic_dataset(
        f"{ROOT}/tgt", LoveDA, n_train=64, n_val=8, hw=HW, seed=1,
        domain_shift=12.0, pad_border=32,
    )

_m, _s = NORM_STATS["LoveDA"]["mean"], NORM_STATS["LoveDA"]["std"]

CONFIG = PairConfig(
    name="fullref",
    datasets="LoveDA",
    target_set="SynthUrban",
    source=SplitConfig((f"{ROOT}/src/img_dir/train",),
                       (f"{ROOT}/src/ann_dir/train",), _m, _s, 8),
    target=SplitConfig((f"{ROOT}/tgt/img_dir/train",),
                       (f"{ROOT}/tgt/ann_dir/train",), _m, _s, 8),
    val=SplitConfig((f"{ROOT}/tgt/img_dir/val",),
                    (f"{ROOT}/tgt/ann_dir/val",), _m, _s, 2),
    test=SplitConfig((f"{ROOT}/tgt/img_dir/val",),
                     (f"{ROOT}/tgt/ann_dir/val",), _m, _s, 2),
    snapshot_dir=os.environ.get("UEMDA_FULLREF_LOG", f"{ROOT}/log"),
    model="resnet50",
    stage1_steps=4000,          # 2urban.py:18 STAGE1_STEPS
    stage2_steps=6000,          # 2urban.py:19 STAGE2_STEPS
    stage3_steps=6000,          # 2urban.py:20 STAGE3_STEPS
    eval_every=500,             # 2urban.py:24 EVAL_EVERY
    gene_every=1000,            # 2urban.py:25 GENE_EVERY
    crop=(512, 512),            # ToURBAN.py RandomCrop(512)
)
