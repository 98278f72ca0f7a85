#!/bin/bash
set -e
cd "$(dirname "$0")/../.."
python tools/train_ssl_mix.py --config-path 2vaihingen --mix cutmix \
  --ckpt-model "${1:?path to stage-1 best checkpoint}"
