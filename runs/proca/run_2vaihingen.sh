#!/bin/bash
# ProCA baseline pipeline, Potsdam RGB -> Vaihingen
# (rebuild of the reference runs/proca/*.sh chain: train_src without domain
# alignment -> init_prototypes -> train_align -> init_prototypes -> train_ssl)
set -e
cd "$(dirname "$0")/../.."
python tools/run_pipeline.py --config-path proca.pRgb2vaihingen --method proca "$@"
