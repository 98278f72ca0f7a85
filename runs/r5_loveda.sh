#!/bin/bash
# Round-5 LoveDA-geometry session: rebuild the compressed flagship chain
# (runs/loveda_synth_config.py — 600/800/800 at 1024²/7-class, the r4
# record's geometry; /tmp was wiped so the r4 checkpoints are gone) and
# run the COMBO (UVEM + online refinement stacked on CutMix,
# tools/train_ssl_mix.py --lt uvem --refine-label 1) as a stage-3
# alternative from the SAME stage-2 checkpoint — VERDICT r4 item 1's
# LoveDA row. The chain is deterministic (stateless fold_in keys, fixed
# seeds), so the rebuilt trunk reproduces the r4 trajectory and the
# ssl-vs-combo comparison is internally paired.
#
# r4_drive.sh hardening: timeout + bounded retries + DONE marker per step;
# re-running resumes at the first unfinished step. K=25 steps/call
# (divides log_every=50; eval_every=200 / gene_every=400 land on
# boundaries) + --host-crop amortize the tunnel RTT that made the r4
# chain ~0.64 s/step.
set -ux
cd "$(dirname "$0")/.."
P=runs/loveda_synth_config.py
LOG=/tmp/uemda_loveda/log
MARK=/tmp/uemda_loveda/markers
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

# fail fast on a hung tunnel: this unattended chain restarts from the
# last snapshot anyway, so a tight deadline costs minutes, not 15.
export UEMDA_HANG_TIMEOUT_S=${UEMDA_HANG_TIMEOUT_S:-300}

TRAIN="--resume auto --steps-per-call ${SPC:-25} --host-crop 1"

step src 5400 3 python tools/train_src.py --config-path $P $TRAIN \
    --align-domain 1
step proto1 1800 3 python tools/init_prototypes.py --config-path $P --stage 1 \
    --ckpt-model $LOG/src/SynthUrban_best.msgpack \
    --ckpt-proto $LOG/src/prototypes_init.msgpack
step align 7200 3 python tools/train_align_uem.py --config-path $P $TRAIN \
    --align-domain 1 --gen 1 --refine-label 1 \
    --ckpt-model $LOG/src/SynthUrban_best.msgpack \
    --ckpt-proto $LOG/src/prototypes_init.msgpack
step proto2 1800 3 python tools/init_prototypes.py --config-path $P --stage 2 \
    --ckpt-model $LOG/align/SynthUrban_best.msgpack \
    --ckpt-proto $LOG/align/prototypes_init.msgpack
step ssl 7200 3 python tools/train_ssl_uem.py --config-path $P $TRAIN \
    --gen 1 --refine-label 1 --lt uvem \
    --ckpt-model $LOG/align/SynthUrban_best.msgpack \
    --ckpt-proto $LOG/align/prototypes_init.msgpack

# ---- the LoveDA combo row: stage-3 alternative, same stage-2 start ----
step combo 7200 3 python tools/train_ssl_mix.py --config-path $P $TRAIN \
    --mix cutmix --gen 1 --lt uvem --refine-label 1 \
    --ckpt-model $LOG/align/SynthUrban_best.msgpack \
    --ckpt-proto $LOG/align/prototypes_init.msgpack

step summarize 300 2 bash -c "python tools/summarize_run.py \
    src=$LOG/src align=$LOG/align ssl=$LOG/ssl combo=$LOG/cutmix \
    > /tmp/uemda_loveda/summary.md && cat /tmp/uemda_loveda/summary.md"
step gate 2700 2 bash -c "python tools/serving_gate.py --config-path $P \
    --ckpt-path $LOG/src/SynthUrban_best.msgpack,$LOG/align/SynthUrban_best.msgpack,$LOG/ssl/SynthUrban_best.msgpack \
    > /tmp/uemda_loveda/serving_gate.json"

echo "R5_LOVEDA_DONE markers: $(ls $MARK)"
