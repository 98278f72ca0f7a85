#!/bin/bash
# Full UemDA pipeline, Potsdam IRRG -> Vaihingen
# (rebuild of the reference runs/uemda/run_2vaihingen.sh 5-step chain)
set -e
cd "$(dirname "$0")/../.."
python tools/run_pipeline.py --config-path 2vaihingen "$@"
