#!/bin/bash
# UVEM (m, gamma) ablation sweep (reference runs/uemda/run_abl_uvem.sh)
set -e
cd "$(dirname "$0")/../.."
CFG=${1:-2vaihingen}
CKPT_MODEL=${2:?path to align-stage best checkpoint}
CKPT_PROTO=${3:?path to align-stage prototypes}
for m in 0 0.2 0.5; do
  for g in 1 2 4 8; do
    python tools/train_ssl_uvem_abl.py --config-path "$CFG" \
      --ckpt-model "$CKPT_MODEL" --ckpt-proto "$CKPT_PROTO" \
      --uvem-m "$m" --uvem-g "$g"
  done
done
