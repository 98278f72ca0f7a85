#!/bin/bash
# Flagship-method ablation on the real TPU (VERDICT r2 item 2): on a shift
# hard enough that refinement matters (runs/ablation_config.py), show
#   (a) stage-2 (align_uem) and stage-3 (ssl/uvem) improve over stage-1,
#   (b) label refinement improves pseudo-label accuracy at fixed coverage
#       (tools/refine_quality.py, per view: none/p/l/s/all),
#   (c) UVEM+refine >= CE / UPS / CutMix on the same stage-2 checkpoint.
# Summarize /tmp/uemda_abl/*/best.json + the refine_quality JSON into
# runs/tpu_results/ablation_uvem.md.
set -euxo pipefail  # pipefail: `refine_quality | tee` must not mask a crash
cd "$(dirname "$0")/.."
P=runs/ablation_config.py
ROOT=/tmp/uemda_abl
BASE=$ROOT/log

retry() {  # bounded retries, each attempt bounded by `timeout` (a tunnel
    local n=0 # hang costs <=1h, not the session — VERDICT r3 item 4)
    until timeout "${STEP_TIMEOUT:-3600}" "$@"; do
        n=$((n + 1))
        [ $n -ge 6 ] && return 1
        echo "RETRY($n) after failure: $*" >&2
        sleep 60
    done
}

# K=4 jitted steps per dispatch (identity-tested vs K=1; eval_every=300 and
# gene_every=600 are multiples of 4) — cuts tunnel-dispatch wall time.
retry_train() { retry "$@" --resume auto --steps-per-call 4; }

# ---- shared trunk: stage 1 + prototypes + stage 2 + prototypes ----
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
s3() {  # s3 <logdir> <trainer args...>
    local log=$1; shift
    UEMDA_ABL_LOG=$ROOT/$log retry_train python tools/train_ssl_uem.py \
        --config-path $P "$@" \
        --ckpt-model $BASE/align/SynthTarget_best.msgpack \
        --ckpt-proto $BASE/align/prototypes_init.msgpack
}
s3 v_uvem_refine --gen 1 --refine-label 1 --lt uvem

# ---- (b) refinement quality on the stage-3 pseudo labels ----
# Runs as soon as v_uvem_refine's gen pass has stored them (claim b is the
# heart of the flagship demonstration — don't leave it until after every
# baseline variant in case the session runs out of wall clock). Non-fatal:
# a failure here must not kill the remaining variants under set -e.
# write to a temp file and move into place on success, so stdout from a
# failed attempt can't accumulate ahead of the final report (a whole-file
# json.loads consumer would break on tee-across-retries)
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

# ---- collect ----
for d in $BASE/src $BASE/align $ROOT/v_uvem_refine/ssl \
         $ROOT/v_uvem_norefine/ssl $ROOT/v_ce/ssl $ROOT/v_ups/ssl \
         $ROOT/v_cutmix/cutmix; do
    echo "== $d"; cat $d/best.json 2>/dev/null || echo "missing"
done
echo "ABLATION_DONE"
