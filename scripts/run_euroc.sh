#!/bin/bash
# One-command EuRoC evaluation: ./scripts/run_euroc.sh <seq_dir> [args...]
# Runs on whatever JAX backend the ambient env selects (TPU under axon,
# CPU with: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu ./scripts/run_euroc.sh ...)
set -eu
cd "$(dirname "$0")/.."
exec python scripts/run_euroc.py "$@"
