#!/bin/bash
# Round-4 driver: re-run the LoveDA-geometry stage 3 with the clamp fix
# (the r3 collapse root cause — see tests/test_quality_gate.py), then land
# every record round 3 owed: summarize_run + serving gate + refine_quality
# + mem_probe for the LoveDA chain, the flagship ablation, and the clean
# same-trainer --host-crop A/B.
#
# Hardened per VERDICT r3 item 4: EVERY chain step runs under `timeout`
# with bounded retries and writes a per-step DONE marker, so one tunnel
# hang costs one timeout, not the session (r3 lost its last 2 hours to an
# untimed serving_gate call), and re-running this script resumes at the
# first unfinished step. Records are emitted by marker-independent steps,
# so a dead later stage still leaves the earlier tables on disk.
set -ux
cd "$(dirname "$0")/.."
P=runs/loveda_synth_config.py
LOG=/tmp/uemda_loveda/log
MARK=/tmp/uemda_loveda/markers
RES=runs/tpu_results
mkdir -p "$MARK" "$RES"

# step <marker> <timeout_s> <max_tries> cmd... — timeout + retry + marker
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
wait_for_tpu || { echo "R4_DRIVE: tunnel never came back"; exit 1; }

TRAIN="--resume auto --steps-per-call 4 --host-crop 1"

# ---- 0. archive the r3 collapsed stage 3 (once), keep it for the record ----
if [ ! -f "$MARK/ssl_reset" ]; then
    [ -d "$LOG/ssl" ] && mv "$LOG/ssl" "$LOG/ssl_r3_collapsed"
    [ -d "$LOG/pseudo_label" ] && mv "$LOG/pseudo_label" "$LOG/pseudo_label_r3"
    [ -d "$LOG/pseudo_label_color" ] && mv "$LOG/pseudo_label_color" "$LOG/pseudo_label_color_r3"
    touch "$MARK/ssl_reset"
fi

# ---- 1. stage 3 rerun with the per-dataset clamp fix ----
step ssl 5400 4 python tools/train_ssl_uem.py --config-path $P $TRAIN \
    --gen 1 --refine-label 1 --lt uvem \
    --ckpt-model $LOG/align/SynthUrban_best.msgpack \
    --ckpt-proto $LOG/align/prototypes_init.msgpack

# ---- 2. the LoveDA-geometry record (emit even if later steps die) ----
step summarize 300 2 bash -c "python tools/summarize_run.py \
    src=$LOG/src align=$LOG/align ssl=$LOG/ssl \
    ssl_r3_collapsed=$LOG/ssl_r3_collapsed > /tmp/uemda_loveda/summary.md \
    && cat /tmp/uemda_loveda/summary.md"

# ---- 3. serving gate over the three stage-best checkpoints (r3 hung here
#         untimed; now one attempt costs <=45 min) ----
step gate 2700 2 bash -c "python tools/serving_gate.py --config-path $P \
    --ckpt-path $LOG/src/SynthUrban_best.msgpack,$LOG/align/SynthUrban_best.msgpack,$LOG/ssl/SynthUrban_best.msgpack \
    > /tmp/uemda_loveda/serving_gate.json"

# ---- 4. refine_quality: coverage-matched per-view accuracy of the stored
#         stage-3 pseudo labels (first committed real-chip artifact) ----
step refineq 2700 2 bash -c "python tools/refine_quality.py --config-path $P \
    --ckpt-model $LOG/align/SynthUrban_best.msgpack \
    --ckpt-proto $LOG/align/prototypes_init.msgpack \
    --pseudo-dir $LOG/pseudo_label \
    > /tmp/uemda_loveda/refine_quality.json.tmp \
    && mv /tmp/uemda_loveda/refine_quality.json.tmp /tmp/uemda_loveda/refine_quality.json"

# ---- 5. 1024^2 pseudo-gen peak memory + throughput ----
step memprobe 2700 2 bash -c "python tools/mem_probe.py --config-path $P \
    --ckpt-model $LOG/ssl/SynthUrban_best.msgpack \
    > /tmp/uemda_loveda/mem_probe.json"

# ---- 6. clean same-trainer host-crop A/B (two consecutive pairs) ----
step hostcrop_ab 3600 2 bash -c "python tools/hostcrop_ab.py --config-path $P \
    --steps 30 --pairs 2 > /tmp/uemda_loveda/hostcrop_ab.json"

# ---- 7. flagship ablation chain (its own script; re-entrant) ----
step ablation 21600 2 bash runs/ablation_uvem.sh

# ---- 8. ablation record ----
step abl_summarize 300 2 bash -c "python tools/summarize_run.py \
    src=/tmp/uemda_abl/log/src align=/tmp/uemda_abl/log/align \
    uvem_refine=/tmp/uemda_abl/v_uvem_refine/ssl \
    uvem_norefine=/tmp/uemda_abl/v_uvem_norefine/ssl \
    ce=/tmp/uemda_abl/v_ce/ssl ups=/tmp/uemda_abl/v_ups/ssl \
    cutmix=/tmp/uemda_abl/v_cutmix/cutmix \
    > /tmp/uemda_abl/summary.md && cat /tmp/uemda_abl/summary.md"

echo "R4_DRIVE_DONE markers: $(ls $MARK)"
