#!/bin/bash
# Pre-screen candidate shifts for the round-4 flagship ablation (cheap:
# stage-1 + prototypes + soft pseudo-gen + refine_quality per candidate,
# ~25 min each — instead of discovering after a 2.5 h full chain that the
# shift gives refinement nothing to fix, as happened with the r3 shift).
# Picks nothing automatically: prints each candidate's refine_quality line;
# the full chain (runs/ablation2_uvem.sh) is launched on the chosen pair.
set -ux
cd "$(dirname "$0")/.."

CANDS=${CANDS:-"40:0.10 32:0.15 45:0.00"}

for cand in $CANDS; do
    noise=${cand%%:*}; pmix=${cand##*:}
    export UEMDA_ABL2_NOISE=$noise UEMDA_ABL2_PMIX=$pmix
    ROOT=/tmp/uemda_abl2/n${noise}_p${pmix}
    P=runs/ablation2_config.py
    mkdir -p "$ROOT"
    [ -f "$ROOT/screen.json" ] && { echo "SKIP $cand (screened)"; continue; }

    timeout 2700 python tools/train_src.py --config-path $P \
        --align-domain 1 --resume auto --steps-per-call 4 || continue
    timeout 1200 python tools/init_prototypes.py --config-path $P --stage 1 \
        --ckpt-model $ROOT/log/src/SynthTarget_best.msgpack \
        --ckpt-proto $ROOT/log/src/prototypes_init.msgpack || continue
    # soft pseudo labels from the stage-1 generator (same call the stage-3
    # trainers make at startup, train_ssl_uem.py:117-133)
    timeout 1800 python - "$P" "$ROOT" <<'EOF' || continue
import sys

from uemda_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()

from uemda_tpu.config import load_config
from uemda_tpu.datasets.base import SegDataset
from uemda_tpu.infer.pseudo_gen import generate_pseudo_labels
from uemda_tpu.train.checkpoints import load_checkpoint
from uemda_tpu.train.loop import build_model, init_variables

cfg = load_config(sys.argv[1])
root = sys.argv[2]
model = build_model(cfg)
variables = load_checkpoint(
    f"{root}/log/src/SynthTarget_best.msgpack", init_variables(model, cfg)
)
ds = SegDataset(cfg.meta, list(cfg.target.image_dir), None, label_type="none")
generate_pseudo_labels(
    model, variables, ds, cfg.target.mean, cfg.target.std,
    out_dir=f"{root}/pseudo_label", tile=cfg.crop, tta=True, batch_size=4,
    cutoff_top=cfg.cutoff_top, cutoff_low=cfg.cutoff_low,
)
EOF
    timeout 2700 bash -c "python tools/refine_quality.py --config-path $P \
        --ckpt-model $ROOT/log/src/SynthTarget_best.msgpack \
        --ckpt-proto $ROOT/log/src/prototypes_init.msgpack \
        --pseudo-dir $ROOT/pseudo_label > $ROOT/screen.json.tmp \
        && mv $ROOT/screen.json.tmp $ROOT/screen.json" || continue
    echo "SCREEN $cand:"; cat "$ROOT/screen.json"
done

echo "SCREEN_SWEEP_DONE"
for cand in $CANDS; do
    noise=${cand%%:*}; pmix=${cand##*:}
    f=/tmp/uemda_abl2/n${noise}_p${pmix}/screen.json
    echo "== $cand"; cat "$f" 2>/dev/null || echo missing
done
