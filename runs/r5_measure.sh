#!/usr/bin/env bash
# Round-5 measurement session (VERDICT r4 items 4+5+6 evidence):
#   * headline bench,
#   * compiled-executable FLOPs (cost_analysis) for the eval forward — the
#     BASELINE.md A100-denominator derivation input — and per-train-step,
#   * train-step wall vs in-jit-scanned device-side latency + dispatch
#     decomposition + MFU (bench_suite train mode, reworked this round),
#   * pseudo-gen sweep at REAL cardinality (64 x 1024² tiles,
#     runs/fullref_config.py) with the new peak-HBM fallback
#     (mem_probe hlo_memory_analysis) — non-null memory figure,
#   * fresh XProf stage-1 trace for the wall = device + transfer + dispatch
#     bridge quoted in docs/PERF_NOTES.md.
# Sequential on purpose: one compiling process at a time (1-core host).
set -ux
cd "$(dirname "$0")/.."
OUT=runs/tpu_results
mkdir -p $OUT

step() {  # step <timeout_s> cmd...  (2 tries, tunnel-settle pause)
    local tmo=$1; shift
    timeout "$tmo" "$@" && return 0
    sleep 60
    timeout "$tmo" "$@"
}

step 600 python -u -c "
import jax
x = jax.numpy.ones((256, 256)); y = x @ x
print('TPU_OK', jax.devices(), float(y.mean()), flush=True)
" || { echo "R5_MEASURE: no TPU"; exit 1; }

echo "== headline bench =="
step 2400 python bench.py | tee $OUT/bench_r5.json

echo "== flops + train decomposition + MFU =="
step 3600 python tools/bench_suite.py --modes flops,train \
    | tee $OUT/train_steps_r5.json

echo "== eval modes (headline verification, 2nd run for drift) =="
step 2400 python tools/bench_suite.py \
    --modes eval_fastpath_int8cal_all,eval_fastpath \
    | tee $OUT/eval_modes_r5.json

echo "== pseudo-gen sweep at n=64 x 1024^2 + peak HBM =="
CKPT=""
[ -f /tmp/uemda_fullref/log/ssl/SynthUrban_best.msgpack ] && \
    CKPT="--ckpt-model /tmp/uemda_fullref/log/ssl/SynthUrban_best.msgpack"
step 3600 python tools/mem_probe.py --config-path runs/fullref_config.py \
    $CKPT | tee $OUT/mem_probe_fullref.json

echo "== fresh stage-1 XProf trace (device-time bridge) =="
# Same program shape bench_train_steps measures (512² crops, batch 8):
# fullref config + --host-crop. UEMDA_FULLREF_LOG redirects the snapshot
# dir so a real /tmp/uemda_fullref/log chain is never clobbered.
rm -rf /tmp/uemda_measure_log $OUT/xprof_r5
step 1800 env UEMDA_FULLREF_LOG=/tmp/uemda_measure_log \
    python tools/train_src.py --config-path runs/fullref_config.py \
    --steps 32 --align-domain 1 --steps-per-call 4 --host-crop 1 \
    --profile-dir $OUT/xprof_r5 || true
step 600 python tools/profile_summary.py $OUT/xprof_r5 --top 25 \
    | tee $OUT/xprof_r5_summary.txt || true

echo "R5_MEASURE_DONE -> $OUT/"
