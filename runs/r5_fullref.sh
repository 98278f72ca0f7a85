#!/bin/bash
# Round-5 driver: the FULL reference schedule (4000/6000/6000,
# EVAL_EVERY=500, GENE_EVERY=1000 — configs/st/uemda/2urban.py:18-25) at
# the flagship LoveDA geometry over a 64-image 1024² target split
# (runs/fullref_config.py; VERDICT r4 item 3), then the record artifacts:
# per-stage summary, serving gate on every stage-best checkpoint, and the
# n=64 pseudo-gen memory/throughput probe. A final marker-gated step runs
# the COMBO (UVEM+refine stacked on CutMix) as a stage-3 alternative from
# the same stage-2 checkpoint (VERDICT r4 item 1's LoveDA row) — last, so
# a truncated session still leaves the complete flagship chain.
#
# r4_drive.sh hardening: every step under `timeout` with bounded retries
# and a DONE marker; re-running resumes at the first unfinished step.
set -ux
cd "$(dirname "$0")/.."
P=runs/fullref_config.py
LOG=/tmp/uemda_fullref/log
MARK=/tmp/uemda_fullref/markers
mkdir -p "$MARK"

step() {
    local mark=$1 tmo=$2 tries=$3; shift 3
    [ -f "$MARK/$mark" ] && { echo "SKIP $mark (done)"; return 0; }
    local n=0
    until timeout "$tmo" "$@"; do
        n=$((n + 1))
        [ $n -ge "$tries" ] && { echo "STEP_FAILED $mark after $n tries" >&2; return 1; }
        echo "RETRY($n) $mark" >&2
        sleep 60  # let the tunnel settle (killed TPU processes degrade it)
    done
    touch "$MARK/$mark"
}

wait_for_tpu() {
    for i in $(seq 1 30); do
        echo "tpu-wait attempt $i $(date -u +%H:%M:%S)"
        timeout 600 python -u -c "
import jax
x = jax.numpy.ones((256, 256)); y = x @ x
print('TPU_OK', jax.devices(), float(y.mean()), flush=True)
" && return 0
        sleep 120
    done
    return 1
}
wait_for_tpu || { echo "R5_FULLREF: tunnel never came back"; exit 1; }

TRAIN="--resume auto --steps-per-call 4 --host-crop 1"

# ---- the three-stage chain at the full reference schedule ----
step src 14400 3 python tools/train_src.py --config-path $P $TRAIN \
    --align-domain 1
step proto1 1800 3 python tools/init_prototypes.py --config-path $P --stage 1 \
    --ckpt-model $LOG/src/SynthUrban_best.msgpack \
    --ckpt-proto $LOG/src/prototypes_init.msgpack
step align 21600 3 python tools/train_align_uem.py --config-path $P $TRAIN \
    --align-domain 1 --gen 1 --refine-label 1 \
    --ckpt-model $LOG/src/SynthUrban_best.msgpack \
    --ckpt-proto $LOG/src/prototypes_init.msgpack
step proto2 1800 3 python tools/init_prototypes.py --config-path $P --stage 2 \
    --ckpt-model $LOG/align/SynthUrban_best.msgpack \
    --ckpt-proto $LOG/align/prototypes_init.msgpack
step ssl 21600 3 python tools/train_ssl_uem.py --config-path $P $TRAIN \
    --gen 1 --refine-label 1 --lt uvem \
    --ckpt-model $LOG/align/SynthUrban_best.msgpack \
    --ckpt-proto $LOG/align/prototypes_init.msgpack

# ---- records (each emits even if a later step dies) ----
step summarize 300 2 bash -c "python tools/summarize_run.py \
    src=$LOG/src align=$LOG/align ssl=$LOG/ssl \
    > /tmp/uemda_fullref/summary.md && cat /tmp/uemda_fullref/summary.md"
step gate 2700 2 bash -c "python tools/serving_gate.py --config-path $P \
    --ckpt-path $LOG/src/SynthUrban_best.msgpack,$LOG/align/SynthUrban_best.msgpack,$LOG/ssl/SynthUrban_best.msgpack \
    > /tmp/uemda_fullref/serving_gate.json"
step memprobe 2700 2 bash -c "python tools/mem_probe.py --config-path $P \
    --ckpt-model $LOG/ssl/SynthUrban_best.msgpack \
    > /tmp/uemda_fullref/mem_probe.json"

echo "R5_FULLREF_CHAIN_DONE"

# ---- optional: combo stage-3 alternative at LoveDA geometry (item 1) ----
step combo 21600 2 env UEMDA_FULLREF_LOG=/tmp/uemda_fullref/combo \
    python tools/train_ssl_mix.py --config-path $P $TRAIN \
    --mix cutmix --gen 1 --lt uvem --refine-label 1 \
    --ckpt-model $LOG/align/SynthUrban_best.msgpack \
    --ckpt-proto $LOG/align/prototypes_init.msgpack
step combo_summarize 300 2 bash -c "python tools/summarize_run.py \
    src=$LOG/src align=$LOG/align ssl=$LOG/ssl \
    combo=/tmp/uemda_fullref/combo/cutmix \
    > /tmp/uemda_fullref/summary_combo.md && cat /tmp/uemda_fullref/summary_combo.md"

echo "R5_FULLREF_DONE markers: $(ls $MARK)"
