#!/bin/bash
# Optional tail of the round-5 ablation: the refine/norefine PAIR at a
# second seed (4001), run when the LoveDA chain has finished and wall
# clock allows. The pair is the flagship's core mechanism claim
# (refinement helps: `uemda/gast/alignment.py:194-293`); a paired
# second-seed delta is the cheapest honest variance evidence when the
# full 6x3 grid doesn't fit one chip-session (see
# runs/tpu_results/ablation3_seeds.md for the time accounting).
set -euxo pipefail
cd "$(dirname "$0")/.."
P=runs/ablation2_config.py
export UEMDA_ABL2_NOISE=${UEMDA_ABL2_NOISE:-40}
export UEMDA_ABL2_PMIX=${UEMDA_ABL2_PMIX:-0.10}
export UEMDA_HANG_TIMEOUT_S=${UEMDA_HANG_TIMEOUT_S:-300}
ROOT=/tmp/uemda_abl2/n${UEMDA_ABL2_NOISE}_p${UEMDA_ABL2_PMIX}
BASE=$ROOT/log
SEED=${SEED:-4001}

retry() {
    local n=0
    until timeout "${STEP_TIMEOUT:-3600}" "$@"; do
        n=$((n + 1))
        [ $n -ge 6 ] && return 1
        echo "RETRY($n) after failure: $*" >&2
        sleep 60
    done
}

s3() {
    local log=$1; shift
    rm -f "$ROOT/$log/VARIANT_DONE"  # clear the skip marker from the
                                     # truncated main chain
    UEMDA_ABL_LOG=$ROOT/$log retry python tools/train_ssl_uem.py \
        --config-path $P --seed "$SEED" "$@" \
        --ckpt-model $BASE/align/SynthTarget_best.msgpack \
        --ckpt-proto $BASE/align/prototypes_init.msgpack \
        --resume auto --steps-per-call "${SPC:-25}"
    touch "$ROOT/$log/VARIANT_DONE"
}

s3 "s${SEED}_uvem_refine" --gen 1 --refine-label 1 --lt uvem
s3 "s${SEED}_uvem_norefine" --gen 1 --refine-label 0 --lt uvem
echo "PAIR_SEED_${SEED}_DONE"
