#!/bin/sh
# SMOKE tier: a <3-minute (warm-cache) subset for mid-session iteration.
# Covers the load-bearing slice end to end — geometry units, the CLI app
# on images (extract -> intra -> track -> BA -> loop/reloc round-trip),
# and the EuRoC runner — without the full suite's scene sweeps.
# The full suite (scripts/run_tests.sh) remains the round gate.
set -e
cd "$(dirname "$0")/.."
unset PALLAS_AXON_POOL_IPS  # skip the TPU-tunnel handshake (CPU-only tier)
exec python -m pytest -q \
    tests/test_lie.py \
    tests/test_camera_geom.py \
    tests/test_app_cli.py \
    tests/test_euroc.py \
    "$@"
