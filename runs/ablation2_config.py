"""Variance-dominated synthetic shift for the flagship ablation, round 4.

The round-3 'hard shift' (runs/ablation_config.py: noise sigma 45 +
palette_mix 0.25) mixed two error modes: pixel NOISE (variance — the
salt-and-pepper pseudo-label errors superpixel/prototype refinement is
built to repair, ``uemda/gast/alignment.py:194-293``) and PALETTE ROTATION
(bias — a systematic class confusion no label-averaging view can undo, it
can only amplify it). Measured on that shift, refinement bought coverage
but not matched-coverage accuracy, and every stage-3 variant tied within
noise (runs/tpu_results/ablation_uvem.md). This config keeps the gap
variance-dominated: noise ABOVE the ~35/255 palette step so per-pixel
evidence is genuinely ambiguous, only a mild palette_mix, plus a global
shift — the regime the refinement machinery targets, analogous to the
sensor-noise/illumination component of real LoveDA/ISPRS gaps.

Tunable via env for the pre-screen sweep (runs/ablation2_screen.sh):
  UEMDA_ABL2_NOISE (default 40), UEMDA_ABL2_PMIX (default 0.10).
Each (noise, pmix) pair gets its own dataset + run root, so screen
candidates never clobber each other. UEMDA_ABL_LOG overrides the snapshot
dir exactly like the r3 ablation config (stage-3 variants).
"""

import os

from uemda_tpu.config import PairConfig, SplitConfig
from uemda_tpu.datasets.meta import IsprsDA
from uemda_tpu.datasets.synthetic import make_synthetic_dataset

_NOISE_S = os.environ.get("UEMDA_ABL2_NOISE", "40")
_PMIX_S = os.environ.get("UEMDA_ABL2_PMIX", "0.10")
NOISE = float(_NOISE_S)
PMIX = float(_PMIX_S)
# the root embeds the env strings VERBATIM so the bash drivers (which
# interpolate the same strings) always agree on the path — a :g format
# here turned "0.10" into "0.1" and the screen looked in the wrong dir
ROOT = os.environ.get(
    "UEMDA_ABL2_ROOT",
    f"/tmp/uemda_abl2/n{_NOISE_S}_p{_PMIX_S}",
)
HW = 256

if not os.path.isdir(f"{ROOT}/src/img_dir/train"):
    make_synthetic_dataset(f"{ROOT}/src", IsprsDA, n_train=48, n_val=8,
                           hw=HW, seed=0)
if not os.path.isdir(f"{ROOT}/tgt/img_dir/train"):
    make_synthetic_dataset(
        f"{ROOT}/tgt", IsprsDA, n_train=48, n_val=8, hw=HW, seed=1,
        domain_shift=8.0, noise=NOISE, palette_mix=PMIX,
    )

_m, _s = (128.0,) * 3, (64.0,) * 3

CONFIG = PairConfig(
    name="abl2_synth",
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
