#!/bin/bash
set -e
cd "$(dirname "$0")/../.."
python tools/run_pipeline.py --config-path 2rural "$@"
