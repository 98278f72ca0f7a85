#!/bin/bash
# Schedule-scale synthetic pipeline on the real TPU (VERDICT r1 item 5):
# reference step counts 4000/6000/6000 @ batch 8, 256² tiles, with
#   * 3 GENE_EVERY pseudo-label regenerations inside stage 3,
#   * a hard kill + `--resume auto` mid-stage-3 (exact-resume proof),
#   * the hardened serving gate across all three stage-best checkpoints.
# Results land in /tmp/uemda_full/log; summarize into runs/tpu_results/.
set -ux
cd "$(dirname "$0")/.."
P=runs/full_synth_config.py
LOG=/tmp/uemda_full/log

python tools/run_pipeline.py --config-path $P --steps 1,2,3,4

SSL_FLAGS=(--config-path $P --gen 1 --refine-label 1 --lt uvem
           --ckpt-model $LOG/align/SynthTarget_best.msgpack
           --ckpt-proto $LOG/align/prototypes_init.msgpack)
# run ~the first third of stage 3, then kill it mid-flight
timeout 1200 python tools/train_ssl_uem.py "${SSL_FLAGS[@]}" || true
# exact full-state resume to completion
python tools/train_ssl_uem.py "${SSL_FLAGS[@]}" --resume auto

python tools/serving_gate.py --config-path $P \
  --ckpt-path $LOG/src/SynthTarget_best.msgpack,$LOG/align/SynthTarget_best.msgpack,$LOG/ssl/SynthTarget_best.msgpack
echo "FULL_SYNTH_DONE rc=$?"
