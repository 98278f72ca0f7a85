#!/bin/bash
# Round-3 TPU driver: wait for the axon tunnel to answer, then run the two
# remaining VERDICT r2 items back-to-back —
#   1. runs/loveda_synth.sh   (LoveDA-geometry chain at 1024^2, resumable)
#   2. runs/ablation_uvem.sh  (hard-shift flagship ablation)
# Detached-safe: run under nohup/setsid; progress in /tmp/r3_drive.log and
# the per-run logs (/tmp/loveda_run.log, /tmp/ablation_run.log). Every
# trainer inside resumes exactly (--resume auto), so re-running this script
# after any crash continues where it stopped.
set -ux
cd "$(dirname "$0")/.."

wait_for_tpu() {
    # Patient probing: killed TPU processes degrade the tunnel (CLAUDE.md),
    # so give PJRT init 30 min to succeed rather than killing a hung init
    # every few minutes and possibly re-poisoning the relay.
    for i in $(seq 1 16); do
        echo "tpu-wait attempt $i $(date -u +%H:%M:%S)"
        timeout 1800 python -u -c "
import jax
d = jax.devices()
x = jax.numpy.ones((256, 256)); y = x @ x
print('TPU_OK', d, float(y.mean()), flush=True)
" && return 0
        sleep 300
    done
    return 1
}

wait_for_tpu || { echo "R3_DRIVE: tunnel never came back"; exit 1; }

if [ ! -f /tmp/uemda_loveda/DONE ]; then
    bash runs/loveda_synth.sh >> /tmp/loveda_run.log 2>&1 \
        && touch /tmp/uemda_loveda/DONE \
        || echo "R3_DRIVE: loveda chain failed rc=$? (see /tmp/loveda_run.log)"
fi

if [ ! -f /tmp/uemda_abl/DONE ]; then
    mkdir -p /tmp/uemda_abl
    bash runs/ablation_uvem.sh >> /tmp/ablation_run.log 2>&1 \
        && touch /tmp/uemda_abl/DONE \
        || echo "R3_DRIVE: ablation failed rc=$? (see /tmp/ablation_run.log)"
fi

echo "R3_DRIVE_DONE loveda=$([ -f /tmp/uemda_loveda/DONE ] && echo ok || echo fail) ablation=$([ -f /tmp/uemda_abl/DONE ] && echo ok || echo fail)"
