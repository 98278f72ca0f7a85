#!/bin/bash
# ProCA baseline pipeline, Potsdam RGB -> Potsdam IRRG
# (rebuild of the reference runs/proca/*.sh chain)
set -e
cd "$(dirname "$0")/../.."
python tools/run_pipeline.py --config-path proca.pRgb2potsdam --method proca "$@"
