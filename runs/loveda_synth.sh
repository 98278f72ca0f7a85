#!/bin/bash
# LoveDA-geometry pipeline on the real TPU (VERDICT r2 item 1): the full
# 2urban-shaped chain (src -> init_proto -> align_uem -> init_proto ->
# ssl_uem/uvem + refine) at the reference's REAL geometry — 1024^2 tiles,
# 7 classes, label offset -1 with padding borders, 512 crops, 3x3-window
# slide + 8-view TTA pseudo-generation, full-image superpixel ids — on a
# synthetic Urban/Rural-shaped pair (runs/loveda_synth_config.py).
# Ends with the serving-mode quality gate on every stage-best checkpoint.
# Results land in /tmp/uemda_loveda/log; summarize into runs/tpu_results/.
set -eux
cd "$(dirname "$0")/.."
P=runs/loveda_synth_config.py
LOG=/tmp/uemda_loveda/log

retry() {  # retry "$@" until it exits 0 (max 6 tries)
    local n=0
    until "$@"; do
        n=$((n + 1))
        [ $n -ge 6 ] && return 1
        echo "RETRY($n) after failure: $*" >&2
        sleep 60  # let the tunnel settle (killed TPU processes degrade it)
    done
}

# K=4 jitted steps per dispatch (identity-tested vs K=1; eval_every=200 and
# gene_every=400 are multiples of 4) — cuts tunnel-dispatch wall time.
retry_train() { retry "$@" --resume auto --steps-per-call 4; }

retry_train python tools/train_src.py --config-path $P --align-domain 1
retry python tools/init_prototypes.py --config-path $P --stage 1 \
    --ckpt-model $LOG/src/SynthUrban_best.msgpack \
    --ckpt-proto $LOG/src/prototypes_init.msgpack
retry_train python tools/train_align_uem.py --config-path $P --align-domain 1 \
    --gen 1 --refine-label 1 \
    --ckpt-model $LOG/src/SynthUrban_best.msgpack \
    --ckpt-proto $LOG/src/prototypes_init.msgpack
retry python tools/init_prototypes.py --config-path $P --stage 2 \
    --ckpt-model $LOG/align/SynthUrban_best.msgpack \
    --ckpt-proto $LOG/align/prototypes_init.msgpack
retry_train python tools/train_ssl_uem.py --config-path $P \
    --gen 1 --refine-label 1 --lt uvem \
    --ckpt-model $LOG/align/SynthUrban_best.msgpack \
    --ckpt-proto $LOG/align/prototypes_init.msgpack

rc=0
python tools/serving_gate.py --config-path $P \
  --ckpt-path $LOG/src/SynthUrban_best.msgpack,$LOG/align/SynthUrban_best.msgpack,$LOG/ssl/SynthUrban_best.msgpack \
  || rc=$?
echo "LOVEDA_SYNTH_DONE rc=$rc"
