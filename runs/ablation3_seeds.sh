#!/bin/bash
# Flagship ablation, round 5: seed-noise bars + the combo measurement
# (VERDICT r4 items 1+2). Same variance-dominated shift as attempt 2
# (runs/ablation2_config.py, n40_p0.10 — the screened candidate), same
# protocol: one shared stage-1/2 trunk, then SIX stage-3 variants — the
# four pseudo-label variants of attempt 2 (uvem_refine / uvem_norefine /
# ce / ups), the cutmix baseline, and the NEW combo (UVEM + online
# refinement stacked on CutMix, tools/train_ssl_mix.py --lt uvem
# --refine-label 1) — each at THREE PRNG seeds from the SAME stage-2
# checkpoint. Seed-major order: a full 6-variant pass completes per seed
# before the next seed starts, so a truncated session still yields a
# complete table at fewer seeds.
#
# The --seed axis varies augmentation / mixing / dropout / refine
# randomness; data order is intentionally fixed (infinite_batches seed=1)
# so variants stay paired sample-for-sample within a seed.
set -euxo pipefail
cd "$(dirname "$0")/.."
P=runs/ablation2_config.py
export UEMDA_ABL2_NOISE=${UEMDA_ABL2_NOISE:-40}
export UEMDA_ABL2_PMIX=${UEMDA_ABL2_PMIX:-0.10}
ROOT=/tmp/uemda_abl2/n${UEMDA_ABL2_NOISE}_p${UEMDA_ABL2_PMIX}
BASE=$ROOT/log
SEEDS=${SEEDS:-"2333 4001 5711"}

retry() {
    local n=0
    until timeout "${STEP_TIMEOUT:-3600}" "$@"; do
        n=$((n + 1))
        [ $n -ge 6 ] && return 1
        echo "RETRY($n) after failure: $*" >&2
        sleep 60
    done
}
# K=25 divides log_every=50 and all eval/gen boundaries (300/600), so after
# the first 50-step window every call is a full 25-step scan — the tunnel
# RTT (which dominated r4's ~25 min/variant at K=4) is amortized 25x.
# Step math is K-independent (steps-per-call parity test).
retry_train() { retry "$@" --resume auto --steps-per-call "${SPC:-25}"; }

# ---- shared trunk (identical to runs/ablation2_uvem.sh; skipped when the
# DONE marker from a previous chain on this /tmp exists) ----
if [ ! -f "$BASE/TRUNK_DONE" ]; then
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
    touch "$BASE/TRUNK_DONE"
fi

# ---- stage-3 variants x seeds from the SAME stage-2 checkpoint ----
s3() {
    local log=$1 seed=$2; shift 2
    [ -f "$ROOT/$log/VARIANT_DONE" ] && return 0
    UEMDA_ABL_LOG=$ROOT/$log retry_train python tools/train_ssl_uem.py \
        --config-path $P --seed "$seed" "$@" \
        --ckpt-model $BASE/align/SynthTarget_best.msgpack \
        --ckpt-proto $BASE/align/prototypes_init.msgpack
    touch "$ROOT/$log/VARIANT_DONE"
}
s3mix() {
    local log=$1 seed=$2; shift 2
    [ -f "$ROOT/$log/VARIANT_DONE" ] && return 0
    UEMDA_ABL_LOG=$ROOT/$log retry_train python tools/train_ssl_mix.py \
        --config-path $P --mix cutmix --gen 1 --seed "$seed" "$@" \
        --ckpt-model $BASE/align/SynthTarget_best.msgpack
    touch "$ROOT/$log/VARIANT_DONE"
}

for SEED in $SEEDS; do
    s3 "s${SEED}_uvem_refine" "$SEED" --gen 1 --refine-label 1 --lt uvem
    s3 "s${SEED}_uvem_norefine" "$SEED" --gen 1 --refine-label 0 --lt uvem
    s3 "s${SEED}_ce" "$SEED" --gen 1 --refine-label 0 --lt ce
    s3 "s${SEED}_ups" "$SEED" --gen 1 --refine-label 0 --lt ups
    s3mix "s${SEED}_cutmix" "$SEED"
    s3mix "s${SEED}_combo" "$SEED" --lt uvem --refine-label 1 \
        --ckpt-proto $BASE/align/prototypes_init.msgpack
    retry python tools/summarize_run.py \
        src=$BASE/src align=$BASE/align \
        uvem_refine=$ROOT/s${SEED}_uvem_refine/ssl \
        uvem_norefine=$ROOT/s${SEED}_uvem_norefine/ssl \
        ce=$ROOT/s${SEED}_ce/ssl ups=$ROOT/s${SEED}_ups/ssl \
        cutmix=$ROOT/s${SEED}_cutmix/cutmix \
        combo=$ROOT/s${SEED}_combo/cutmix > $ROOT/summary_s${SEED}.md
    echo "SEED_${SEED}_DONE"
done

# label-quality table once (first seed's refined stage-3 labels)
FIRST=$(echo $SEEDS | awk '{print $1}')
retry bash -c "UEMDA_ABL_LOG=$ROOT/s${FIRST}_uvem_refine \
    python tools/refine_quality.py \
    --config-path $P \
    --ckpt-model $BASE/align/SynthTarget_best.msgpack \
    --ckpt-proto $BASE/align/prototypes_init.msgpack \
    --pseudo-dir $ROOT/s${FIRST}_uvem_refine/pseudo_label \
    > $ROOT/refine_quality.json.tmp" \
    && mv $ROOT/refine_quality.json.tmp $ROOT/refine_quality.json \
    || echo "REFINE_QUALITY_FAILED rc=$?"

echo "ABLATION3_DONE"
