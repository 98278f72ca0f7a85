#!/usr/bin/env bash
# One-shot TPU measurement session (docs/PERF_NOTES.md backlog).
# Run when the axon tunnel is live; writes JSON lines to runs/tpu_results/.
# Sequential on purpose: one compiling process at a time (1-core host).
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=runs/tpu_results
mkdir -p $OUT

echo "== headline bench =="
python bench.py | tee $OUT/bench.json

echo "== eval bf16 / int8 / f32 / fastpath =="
python tools/bench_suite.py \
  --modes eval_bf16,eval_int8,eval_f32,eval_fastpath,eval_fastpath_int8,eval_fastpath_int8cal_all \
  | tee $OUT/eval_modes.json

echo "== train step latencies =="
python tools/bench_suite.py --modes train | tee $OUT/train_steps.json

echo "== batch sweep (headline path) =="
for b in 32 64 96 128; do
  python tools/bench_suite.py --modes eval_bf16 --batch $b --k-chain 4 \
    | tee -a $OUT/batch_sweep.json
done

echo "== pallas kernel validation (Mosaic lowering) =="
python - <<'EOF' | tee $OUT/pallas_validation.txt
import numpy as np, jax, jax.numpy as jnp
from uemda_tpu.ops.pallas_kernels import (
    crop_normalize_pallas, segment_max_pallas, uvem_mine_pallas)
from uemda_tpu.ops.pseudo import pseudo_selection
probs = jax.nn.softmax(jax.random.normal(jax.random.key(0), (4, 512, 512, 6)))
lab, w, u = uvem_mine_pallas(probs)
print("uvem_mine_pallas ok:", lab.shape,
      bool((np.asarray(lab) == np.asarray(pseudo_selection(probs))).all()))
img = jax.random.uniform(jax.random.key(1), (8, 544, 544, 3), maxval=255.0)
off = jnp.zeros((8, 2), jnp.int32) + 7
out = crop_normalize_pallas(img, off, (512, 512), (97.0,) * 3, (36.0,) * 3)
print("crop_normalize_pallas ok:", out.shape, float(out.mean()))
EOF

echo "== profiler trace of a stage-1 run (synthetic, SCRATCH snapshot dir"
echo "   so the e2e config's trained checkpoints are not clobbered) =="
python - <<'EOF' || true
import dataclasses, importlib.util, sys

spec = importlib.util.spec_from_file_location(
    "cfg", "/tmp/uemda_e2e/config_synth.py")
mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)
cfg = dataclasses.replace(mod.CONFIG, snapshot_dir="/tmp/uemda_measure_log")
with open("/tmp/uemda_measure_cfg.py", "w") as f:
    f.write("import dataclasses, importlib.util\n"
            "spec = importlib.util.spec_from_file_location("
            "'cfg', '/tmp/uemda_e2e/config_synth.py')\n"
            "mod = importlib.util.module_from_spec(spec); "
            "spec.loader.exec_module(mod)\n"
            "CONFIG = dataclasses.replace(mod.CONFIG, "
            "snapshot_dir='/tmp/uemda_measure_log')\n")
print("scratch config written")
EOF
python tools/train_src.py --config-path /tmp/uemda_measure_cfg.py \
  --steps 30 --align-domain 1 --profile-dir $OUT/xprof || true

echo "== eval-forward trace (the 45% MXU-idle suspect) =="
python - <<'EOF' || true
import jax, jax.numpy as jnp
from uemda_tpu.models import DeeplabV2, DeeplabV2Config
from uemda_tpu.utils.runtime import enable_compile_cache
enable_compile_cache()
model = DeeplabV2(DeeplabV2Config.uemda_default(num_classes=6))
v = jax.jit(lambda: model.init({"params": jax.random.key(0)},
                               jnp.ones((1, 512, 512, 3)), train=False))()
v = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                 if a.dtype == jnp.float32 else a, v)
x = jax.random.normal(jax.random.key(1), (64, 512, 512, 3), jnp.bfloat16)
fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
float(fwd(v, x).mean())  # compile + warm
jax.profiler.start_trace("runs/tpu_results/xprof_eval")
for _ in range(3):
    float(fwd(v, x).mean())
jax.profiler.stop_trace()
print("eval trace captured")
EOF
python tools/profile_summary.py runs/tpu_results/xprof_eval --top 25 \
  | tee $OUT/xprof_eval_summary.txt || true

echo "== trace summary =="
python tools/profile_summary.py $OUT/xprof --top 25 | tee $OUT/xprof_summary.txt || true

echo "results in $OUT/"
