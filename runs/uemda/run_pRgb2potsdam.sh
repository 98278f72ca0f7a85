#!/bin/bash
# Full UemDA pipeline on the RGB-Potsdam source pair (pRgb2potsdam)
# (rebuild of the reference runs/uemda/run_pRgb2potsdam.sh chain)
set -e
cd "$(dirname "$0")/../.."
python tools/run_pipeline.py --config-path pRgb2potsdam "$@"
