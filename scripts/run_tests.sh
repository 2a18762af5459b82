#!/bin/sh
# Full test suite in a few SEPARATE pytest processes: bounds per-process
# executable accumulation (a single 114-test process has segfaulted in the
# XLA compilation-cache path ~100 tests in) and gives a crash a bounded
# blast radius. The persistent JAX compilation cache (tests/conftest.py)
# makes the extra process startups cheap after the first run.
set -e
cd "$(dirname "$0")/.."
# Tests force JAX_PLATFORMS=cpu (tests/conftest.py); ALSO skip the TPU
# tunnel's sitecustomize registration (it keys off PALLAS_AXON_POOL_IPS):
# when the relay is slow/down, every python startup otherwise blocks for
# minutes in the PJRT handshake the tests never use.
unset PALLAS_AXON_POOL_IPS
FAILED=0
run() { echo "== pytest $* =="; python -m pytest -q "$@" || FAILED=1; }
run tests/test_lie.py tests/test_camera_geom.py tests/test_ops.py \
    tests/test_stereo.py tests/test_native_loader.py
run tests/test_frontend.py tests/test_seventeen.py tests/test_jacobians.py \
    tests/test_match_pallas.py tests/test_pose_opt_pallas.py
run tests/test_backend.py tests/test_parallel.py tests/test_pgo_sim3.py \
    tests/test_global_ba.py
run tests/test_slam_vo.py tests/test_slam_mono.py tests/test_slam_vio.py \
    tests/test_async_ba.py
run tests/test_loop_pipeline.py tests/test_loop_reloc.py \
    tests/test_replay_and_utils.py tests/test_live_segmask.py
run tests/test_image_e2e.py tests/test_app_cli.py tests/test_scripts_cli.py \
    tests/test_euroc.py tests/test_config_knobs.py
run tests/test_hard_synthetic.py
exit $FAILED
