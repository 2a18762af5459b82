"""End-to-end loop closure through the DRIVER path: a closed circular
trajectory drifts, LoopCloser.detect fires through nss -> islands ->
temporal-k -> geometric verification, slam._close_loop merges landmarks,
runs PGO, digests the loop in BA and retriangulates the map.

(The reference's loop headline: >95% precision; its pipeline is
insertKeyFrame -> callerDetectLoop -> Backend::addLoopClosure,
FrontEnd.cpp:1849, Backend.cpp:1871-1901.)
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mcslam_tpu.data import synthetic
from mcslam_tpu.frontend import frame as frame_mod
from mcslam_tpu.loop import vocab as vocab_mod
from mcslam_tpu.loop.detector import LoopConfig
from mcslam_tpu.slam import INITIALIZED, MultiCameraSLAM, SlamConfig
from mcslam_tpu.utils import metrics


def _loop_scene(num_frames=60, revisit=8, seed=0):
    """Loop-closure's home scenario: clean tracking at the start and the
    revisit, heavy observation noise through the middle of the circle.
    VO accumulates real drift where it's noisy; the loop constraint
    (verified start-vs-revisit, both clean) is far more accurate than the
    drift — exactly the regime where the closure must pull the
    trajectory back. (A uniformly-noisy scene no longer drifts enough:
    the portfolio PnP tracks it to ~mm.)"""
    rig = synthetic.make_synthetic_rig(
        synthetic.SyntheticRigSpec(num_cams=3, baseline=0.2)
    )
    poses = synthetic.loop_trajectory(
        num_frames, radius=5.0, revisit_frames=revisit, seed=seed
    )
    lms = synthetic.make_ring_landmarks(1400, radius=11.0, seed=seed + 1)
    descs = synthetic.make_descriptors(1400, seed=seed + 2)
    # finite sensing range: early landmarks leave view during the noisy
    # middle, so drifted window BA cannot corrupt the map the loop
    # verification later matches against (with unbounded range the whole
    # ring stays visible and drift leaks into the "old" landmarks)
    kw = dict(kps_per_cam=320, desc_bit_noise=4, seed=seed + 3,
              max_depth=9.0)
    clean = synthetic.render_feature_frames(
        rig, poses, lms, descs, px_noise=0.4, **kw
    )
    noisy = synthetic.render_feature_frames(
        rig, poses, lms, descs, px_noise=1.8, **kw
    )
    lo, hi = 10, num_frames - revisit - 4
    frames = [
        noisy[i] if lo <= i < hi else clean[i] for i in range(num_frames)
    ]
    return rig, poses, frames, descs


def _run(rig, frames, descs, with_loop: bool, seed=0):
    cfg = SlamConfig(
        window_size=4, ba_obs_capacity=8192, ba_lm_capacity=1024,
        local_map_landmarks=2048, kf_translation=0.3, kf_rotation=0.2,
    )
    vocab = None
    loop_cfg = None
    if with_loop:
        vocab = vocab_mod.Vocabulary.train(descs, k=6, depth=3, iters=3)
        loop_cfg = LoopConfig(
            dislocal=12, k_consistency=2, min_nss=0.02, alpha=0.15,
            min_matches=15, min_inliers=10,
        )
    slam = MultiCameraSLAM(
        rig, cfg, seed=seed, vocab=vocab, loop_config=loop_cfg
    )
    for f in frames:
        ff = frame_mod.build_frame_from_keypoints(
            jnp.asarray(f.uv), jnp.asarray(f.desc), jnp.asarray(f.valid),
            rig, max_intra=1024,
        )
        slam.process_frame(ff, f.timestamp)
    return slam


@pytest.fixture(scope="module")
def loop_runs():
    rig, poses, frames, descs = _loop_scene()
    slam_loop = _run(rig, frames, descs, with_loop=True)
    slam_vo = _run(rig, frames, descs, with_loop=False)
    return poses, slam_loop, slam_vo


def test_loop_closure_fires_in_driver(loop_runs):
    poses_gt, slam_loop, _ = loop_runs
    assert slam_loop.state == INITIALIZED
    # the detection chain ran to completion at least once
    assert slam_loop.stats["loops"] >= 1


def test_loop_closure_improves_ate(loop_runs):
    poses_gt, slam_loop, slam_vo = loop_runs
    _, est_loop = slam_loop.trajectory_arrays()
    _, est_vo = slam_vo.trajectory_arrays()
    ate_loop = metrics.ate_rmse(est_loop, poses_gt)
    ate_vo = metrics.ate_rmse(est_vo, poses_gt)
    # identical input stream; the only difference is loop closure
    assert ate_loop < ate_vo, (ate_loop, ate_vo)
    assert ate_loop < 0.30, ate_loop


def test_loop_closure_map_stays_consistent(loop_runs):
    """After merge + PGO + loop-BA + retriangulation, keyframe landmark
    references must point at valid landmarks (no aliasing through the
    free list) and the map must keep a healthy live count."""
    _, slam_loop, _ = loop_runs
    for kf in slam_loop.keyframes:
        refd = kf.lm_id[kf.lm_id >= 0]
        assert np.all(slam_loop.map.valid[refd]), "stale landmark reference"
    assert slam_loop.map.num_valid > 200
