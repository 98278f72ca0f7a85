#!/bin/bash
# Flagship-method ablation, attempt 2: variance-dominated shift (see
# runs/ablation2_config.py's header for why attempt 1's shift could not
# answer the question, and runs/tpu_results/ablation_uvem.md for its
# record). Same protocol as runs/ablation_uvem.sh: shared stage-1/2 trunk,
# five stage-3 variants from the SAME stage-2 checkpoint, refine_quality
# on the stored stage-3 pseudo labels. Candidate shift comes from env
# (UEMDA_ABL2_NOISE / UEMDA_ABL2_PMIX), picked by runs/ablation2_screen.sh.
set -euxo pipefail
cd "$(dirname "$0")/.."
P=runs/ablation2_config.py
export UEMDA_ABL2_NOISE=${UEMDA_ABL2_NOISE:-40}
export UEMDA_ABL2_PMIX=${UEMDA_ABL2_PMIX:-0.10}
ROOT=/tmp/uemda_abl2/n${UEMDA_ABL2_NOISE}_p${UEMDA_ABL2_PMIX}
BASE=$ROOT/log

retry() {
    local n=0
    until timeout "${STEP_TIMEOUT:-3600}" "$@"; do
        n=$((n + 1))
        [ $n -ge 6 ] && return 1
        echo "RETRY($n) after failure: $*" >&2
        sleep 60
    done
}
retry_train() { retry "$@" --resume auto --steps-per-call 4; }

# ---- shared trunk (stage 1 may already exist from the screen) ----
export UEMDA_ABL_LOG=$BASE
retry_train python tools/train_src.py --config-path $P --align-domain 1
retry python tools/init_prototypes.py --config-path $P --stage 1 \
    --ckpt-model $BASE/src/SynthTarget_best.msgpack \
    --ckpt-proto $BASE/src/prototypes_init.msgpack
retry_train python tools/train_align_uem.py --config-path $P --align-domain 1 \
    --gen 1 --refine-label 1 \
    --ckpt-model $BASE/src/SynthTarget_best.msgpack \
    --ckpt-proto $BASE/src/prototypes_init.msgpack
retry python tools/init_prototypes.py --config-path $P --stage 2 \
    --ckpt-model $BASE/align/SynthTarget_best.msgpack \
    --ckpt-proto $BASE/align/prototypes_init.msgpack

# ---- stage-3 variants from the SAME stage-2 checkpoint ----
s3() {
    local log=$1; shift
    UEMDA_ABL_LOG=$ROOT/$log retry_train python tools/train_ssl_uem.py \
        --config-path $P "$@" \
        --ckpt-model $BASE/align/SynthTarget_best.msgpack \
        --ckpt-proto $BASE/align/prototypes_init.msgpack
}
s3 v_uvem_refine --gen 1 --refine-label 1 --lt uvem

(UEMDA_ABL_LOG=$ROOT/v_uvem_refine retry bash -c "python tools/refine_quality.py \
    --config-path $P \
    --ckpt-model $BASE/align/SynthTarget_best.msgpack \
    --ckpt-proto $BASE/align/prototypes_init.msgpack \
    --pseudo-dir $ROOT/v_uvem_refine/pseudo_label \
    > $ROOT/refine_quality.json.tmp" \
    && mv $ROOT/refine_quality.json.tmp $ROOT/refine_quality.json \
    && cat $ROOT/refine_quality.json) \
    || echo "REFINE_QUALITY_FAILED rc=$?"

s3 v_uvem_norefine --gen 1 --refine-label 0 --lt uvem
s3 v_ce --gen 1 --refine-label 0 --lt ce
s3 v_ups --gen 1 --refine-label 0 --lt ups
UEMDA_ABL_LOG=$ROOT/v_cutmix retry_train python tools/train_ssl_mix.py \
    --config-path $P --mix cutmix --gen 1 \
    --ckpt-model $BASE/align/SynthTarget_best.msgpack

retry python tools/summarize_run.py \
    src=$BASE/src align=$BASE/align \
    uvem_refine=$ROOT/v_uvem_refine/ssl \
    uvem_norefine=$ROOT/v_uvem_norefine/ssl \
    ce=$ROOT/v_ce/ssl ups=$ROOT/v_ups/ssl \
    cutmix=$ROOT/v_cutmix/cutmix > $ROOT/summary.md
cat $ROOT/summary.md
echo "ABLATION2_DONE"
