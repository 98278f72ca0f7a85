#!/bin/bash
# Full UemDA pipeline on the RGB-Potsdam source pair (pRgb2vaihingen)
# (rebuild of the reference runs/uemda/run_pRgb2vaihingen.sh chain)
set -e
cd "$(dirname "$0")/../.."
python tools/run_pipeline.py --config-path pRgb2vaihingen "$@"
