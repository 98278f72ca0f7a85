"""Hard-shift synthetic pair for the flagship-method ablation (VERDICT r2
item 2): a domain gap where label refinement has something to fix.

Source: clean class-colored tiles (noise sigma 12). Target: sigma 45 pixel
noise (past the ~29-level palette step, so per-pixel class evidence is
ambiguous while the 16px block identity stays poolable) + palette_mix 0.25
(every class's color rotated a quarter of the way toward the next class's —
a systematic adjacent-class confusion) + a global shift. Stage-1 transfer
is weak and pseudo labels carry dense salt-and-pepper errors — the regime
UemDA's refinement views and UVEM weighting exist for
(``uemda/gast/alignment.py:194-293``, ``balance.py:345-434``).

``UEMDA_ABL_LOG`` selects the snapshot dir so stage-3 variants don't
clobber each other (the trainers pin their run-dir postfix).
"""

import os

from uemda_tpu.config import PairConfig, SplitConfig
from uemda_tpu.datasets.meta import IsprsDA
from uemda_tpu.datasets.synthetic import make_synthetic_dataset

ROOT = "/tmp/uemda_abl"
HW = 256

if not os.path.isdir(f"{ROOT}/src/img_dir/train"):
    make_synthetic_dataset(f"{ROOT}/src", IsprsDA, n_train=48, n_val=8,
                           hw=HW, seed=0)
if not os.path.isdir(f"{ROOT}/tgt/img_dir/train"):
    make_synthetic_dataset(
        f"{ROOT}/tgt", IsprsDA, n_train=48, n_val=8, hw=HW, seed=1,
        domain_shift=8.0, noise=45.0, palette_mix=0.25,
    )

_m, _s = (128.0,) * 3, (64.0,) * 3

CONFIG = PairConfig(
    name="abl_synth",
    datasets="IsprsDA",
    target_set="SynthTarget",
    source=SplitConfig((f"{ROOT}/src/img_dir/train",),
                       (f"{ROOT}/src/ann_dir/train",), _m, _s, 8),
    target=SplitConfig((f"{ROOT}/tgt/img_dir/train",),
                       (f"{ROOT}/tgt/ann_dir/train",), _m, _s, 8),
    val=SplitConfig((f"{ROOT}/tgt/img_dir/val",),
                    (f"{ROOT}/tgt/ann_dir/val",), _m, _s, 4),
    test=SplitConfig((f"{ROOT}/tgt/img_dir/val",),
                     (f"{ROOT}/tgt/ann_dir/val",), _m, _s, 4),
    snapshot_dir=os.environ.get("UEMDA_ABL_LOG", f"{ROOT}/log"),
    model="resnet50",
    stage1_steps=1500,
    stage2_steps=1200,
    stage3_steps=1200,
    eval_every=300,
    gene_every=600,
    crop=(HW, HW),
)
