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
