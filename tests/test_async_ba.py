"""Asynchronous (deferred write-back) window BA mode."""

import jax.numpy as jnp
import numpy as np

from mcslam_tpu.data import synthetic
from mcslam_tpu.frontend import frame as frame_mod
from mcslam_tpu.slam import INITIALIZED, MultiCameraSLAM, SlamConfig
from mcslam_tpu.utils import metrics


def test_async_ba_tracks_with_bounded_degradation():
    rig = synthetic.make_synthetic_rig(
        synthetic.SyntheticRigSpec(num_cams=3, baseline=0.2)
    )
    poses = synthetic.smooth_trajectory(14, radius=5.0, step_angle=0.03)
    lms = synthetic.make_landmarks(900, seed=1, depth_range=(5.0, 16.0))
    descs = synthetic.make_descriptors(900, seed=2)
    frames = synthetic.render_feature_frames(
        rig, poses, lms, descs, kps_per_cam=320, px_noise=0.3,
        desc_bit_noise=5, seed=3,
    )

    def run(async_ba):
        cfg = SlamConfig(
            window_size=4, ba_obs_capacity=8192, ba_lm_capacity=1024,
            local_map_landmarks=1024, kf_translation=0.25, kf_rotation=0.15,
            async_ba=async_ba,
        )
        slam = MultiCameraSLAM(rig, cfg)
        for f in frames:
            ff = frame_mod.build_frame_from_keypoints(
                jnp.asarray(f.uv), jnp.asarray(f.desc), jnp.asarray(f.valid),
                rig, max_intra=1024,
            )
            slam.process_frame(ff, f.timestamp)
        assert slam.state == INITIALIZED
        ts, est = slam.trajectory_arrays()  # finalize() flushes pending BA
        return metrics.ate_rmse(est, poses)

    ate_sync = run(False)
    ate_async = run(True)
    assert ate_async < 0.08, ate_async
    # async mode may lose a little accuracy but must stay the same order
    assert ate_async < max(3.0 * ate_sync, 0.06), (ate_sync, ate_async)
