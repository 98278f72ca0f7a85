#!/bin/bash
# Round-3 continuation: resume the LoveDA-geometry chain from stage 2 with
# --host-crop (the full-tile upload was the measured bottleneck at 1024² —
# ~1.5 s/step stage 1; pre-cropping on host cuts shipped bytes 4× and the
# stage-3 prob labels 16×), then the flagship ablation. Stage 1 already
# completed under runs/loveda_synth.sh. Resume is exact only while the flag
# set is unchanged: switching --host-crop mid-stage moves the crop-offset
# draws from the step PRNG to the host stream (training stays valid, one
# extra recompile — see add_loop_flags' help), so the resumed stage-2 here
# is a valid continuation, not a bit-exact one.
set -ux
cd "$(dirname "$0")/.."
P=runs/loveda_synth_config.py
LOG=/tmp/uemda_loveda/log

wait_for_tpu() {
    for i in $(seq 1 16); do
        echo "tpu-wait attempt $i $(date -u +%H:%M:%S)"
        timeout 1800 python -u -c "
import jax
d = jax.devices()
x = jax.numpy.ones((256, 256)); y = x @ x
print('TPU_OK', d, float(y.mean()), flush=True)
" && return 0
        sleep 120
    done
    return 1
}

retry() {
    local n=0
    until "$@"; do
        n=$((n + 1))
        [ $n -ge 6 ] && return 1
        echo "RETRY($n) after failure: $*" >&2
        sleep 60
    done
}
retry_train() { retry "$@" --resume auto --steps-per-call 4 --host-crop 1; }

wait_for_tpu || { echo "R3_CONTINUE: tunnel never came back"; exit 1; }

if [ ! -f /tmp/uemda_loveda/DONE ]; then
    (
    set -e
    retry_train python tools/train_align_uem.py --config-path $P \
        --align-domain 1 --gen 1 --refine-label 1 \
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
    ) >> /tmp/loveda_run.log 2>&1 \
        && touch /tmp/uemda_loveda/DONE \
        || echo "R3_CONTINUE: loveda chain failed rc=$? (see /tmp/loveda_run.log)"
fi

if [ ! -f /tmp/uemda_abl/DONE ]; then
    mkdir -p /tmp/uemda_abl
    bash runs/ablation_uvem.sh >> /tmp/ablation_run.log 2>&1 \
        && touch /tmp/uemda_abl/DONE \
        || echo "R3_CONTINUE: ablation failed rc=$? (see /tmp/ablation_run.log)"
fi

echo "R3_CONTINUE_DONE loveda=$([ -f /tmp/uemda_loveda/DONE ] && echo ok || echo fail) ablation=$([ -f /tmp/uemda_abl/DONE ] && echo ok || echo fail)"
