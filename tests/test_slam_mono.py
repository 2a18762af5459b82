"""Monocular VO: essential-matrix bootstrap + two-view mapping
(BASELINE config #1: single-camera visual odometry)."""

import jax.numpy as jnp
import numpy as np

from mcslam_tpu.data import synthetic
from mcslam_tpu.frontend import frame as frame_mod
from mcslam_tpu.slam import INITIALIZED, MultiCameraSLAM, SlamConfig
from mcslam_tpu.utils import metrics


def test_mono_vo_sequence():
    rig = synthetic.make_synthetic_rig(
        synthetic.SyntheticRigSpec(num_cams=1)
    )
    poses = synthetic.smooth_trajectory(14, radius=5.0, step_angle=0.04,
                                        seed=0)
    lms = synthetic.make_landmarks(800, seed=1, depth_range=(5.0, 14.0))
    descs = synthetic.make_descriptors(800, seed=2)
    frames = synthetic.render_feature_frames(
        rig, poses, lms, descs, kps_per_cam=400, px_noise=0.3,
        desc_bit_noise=4, seed=3,
    )
    cfg = SlamConfig(
        window_size=4, ba_obs_capacity=4096, ba_lm_capacity=1024,
        local_map_landmarks=1024, kf_translation=0.15, kf_rotation=0.1,
        min_inter_matches=40,
    )
    slam = MultiCameraSLAM(rig, cfg)
    for f in frames:
        ff = frame_mod.build_frame_from_keypoints(
            jnp.asarray(f.uv), jnp.asarray(f.desc), jnp.asarray(f.valid),
            rig, max_intra=512,
        )
        slam.process_frame(ff, f.timestamp)
    assert slam.state == INITIALIZED
    assert slam.stats["keyframes"] >= 3
    assert slam.map.num_valid > 100
    ts, est = slam.trajectory_arrays()
    # mono scale is arbitrary: evaluate with Sim(3) alignment
    ate = metrics.ate_rmse(est[2:], poses[2:], with_scale=True)
    # trajectory length ~ 5 * 0.04 * 12 = 2.4m; accept < 4% drift
    assert ate < 0.1, ate
    # scale really is non-metric: landmarks exist at the normalized depth
    assert np.linalg.norm(est[-1][:3, 3] - est[2][:3, 3]) > 0.1


def test_mono_loop_closure_sim3_branch():
    """Monocular loop closure drives the Sim(3) branch of _close_loop
    (scale drifts in mono, so the PGO relaxes over Sim(3) and landmarks
    get the full scale-aware correction): detection fires in the driver,
    the map stays alias-free, and the Sim(3)-aligned ATE stays bounded."""
    from mcslam_tpu.loop import vocab as vocab_mod
    from mcslam_tpu.loop.detector import LoopConfig

    rig = synthetic.make_synthetic_rig(
        synthetic.SyntheticRigSpec(num_cams=1)
    )
    num_frames, revisit = 52, 8
    poses = synthetic.loop_trajectory(
        num_frames, radius=5.0, revisit_frames=revisit, seed=4
    )
    lms = synthetic.make_ring_landmarks(1200, radius=11.0, seed=5)
    descs = synthetic.make_descriptors(1200, seed=6)
    kw = dict(kps_per_cam=400, desc_bit_noise=4, seed=7, max_depth=9.0)
    clean = synthetic.render_feature_frames(
        rig, poses, lms, descs, px_noise=0.4, **kw
    )
    noisy = synthetic.render_feature_frames(
        rig, poses, lms, descs, px_noise=0.55, **kw
    )
    lo, hi = 10, num_frames - revisit - 4
    frames = [
        noisy[i] if lo <= i < hi else clean[i] for i in range(num_frames)
    ]
    vocab = vocab_mod.Vocabulary.train(descs, k=6, depth=3, iters=3)
    loop_cfg = LoopConfig(
        dislocal=10, k_consistency=1, min_nss=0.01, alpha=0.1,
        min_matches=12, min_inliers=10,
    )
    cfg = SlamConfig(
        window_size=4, ba_obs_capacity=4096, ba_lm_capacity=1024,
        local_map_landmarks=2048, kf_translation=0.25, kf_rotation=0.15,
        min_inter_matches=40,
    )
    slam = MultiCameraSLAM(rig, cfg, vocab=vocab, loop_config=loop_cfg)
    for f in frames:
        ff = frame_mod.build_frame_from_keypoints(
            jnp.asarray(f.uv), jnp.asarray(f.desc), jnp.asarray(f.valid),
            rig, max_intra=512,
        )
        slam.process_frame(ff, f.timestamp)
    assert slam.state == INITIALIZED
    assert slam.stats["loops"] >= 1  # Sim(3) branch executed
    # landmark tables stay alias-free after merge + Sim(3) correction
    for kf in slam.keyframes:
        refd = kf.lm_id[kf.lm_id >= 0]
        assert np.all(slam.map.valid[refd])
    ts, est = slam.trajectory_arrays()
    # mono scale drift over a 50-frame circle is large and a single loop
    # closure near the end cannot repair the mid-circle shape (a GLOBAL
    # Sim(3) alignment still sees the per-segment scale drift); the
    # assertions here pin that the Sim(3) closure branch executes and the
    # correction is non-destructive — matching the VO-only ATE on this
    # scene (~3.8) rather than blowing up
    ate = metrics.ate_rmse(est[2:], poses[2:len(est)], with_scale=True)
    assert ate < 2.0, ate
