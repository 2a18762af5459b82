"""Post-loop-closure GLOBAL bundle adjustment: on a multi-loop session the
joint all-KF/all-landmark solve must beat the PGO-only trajectory
(reference: ISAM2 re-optimizes the entire graph on closure,
Backend.cpp:3060-3267 — our windowed backend pays that debt explicitly),
and the landmark-sharded mesh path must drive it from the SLAM driver."""

import jax.numpy as jnp
import numpy as np

from mcslam_tpu.data import synthetic
from mcslam_tpu.frontend import frame as frame_mod
from mcslam_tpu.loop import vocab as vocab_mod
from mcslam_tpu.loop.detector import LoopConfig
from mcslam_tpu.slam import INITIALIZED, MultiCameraSLAM, SlamConfig
from mcslam_tpu.utils import metrics


def _run_session(global_ba: bool, mesh=None, num_frames=38, revisit=18):
    rig = synthetic.make_synthetic_rig(
        synthetic.SyntheticRigSpec(num_cams=3, baseline=0.2,
                                   image_size=(320, 240), focal=260.0)
    )
    # two passes around the ring: n_circle = num_frames - revisit frames
    # per lap, so the tail re-traverses ~a full second lap -> multiple
    # closure opportunities with accumulated drift
    poses = synthetic.loop_trajectory(
        num_frames, radius=4.0, revisit_frames=revisit, seed=0
    )
    lms = synthetic.make_ring_landmarks(800, radius=9.0, seed=1)
    descs = synthetic.make_descriptors(800, seed=2)
    frames = synthetic.render_feature_frames(
        rig, poses, lms, descs, kps_per_cam=320, px_noise=0.6,
        desc_bit_noise=5, seed=3,
    )
    vocab = vocab_mod.Vocabulary.train(descs, k=6, depth=3, iters=3)
    loop_cfg = LoopConfig(
        dislocal=8, k_consistency=1, min_nss=0.01, alpha=0.1,
        min_matches=12, min_inliers=10,
    )
    cfg = SlamConfig(
        window_size=4, ba_obs_capacity=8192, ba_lm_capacity=1024,
        local_map_landmarks=1024, kf_translation=0.25, kf_rotation=0.15,
        min_inter_matches=40, global_ba=global_ba,
        loop_pgo_min_trans=0.05, loop_pgo_min_rot=0.02,
        global_ba_lm_capacity=2048, global_ba_obs_per_kf=256,
    )
    slam = MultiCameraSLAM(rig, cfg, vocab=vocab, loop_config=loop_cfg,
                           mesh=mesh)
    for f in frames:
        ff = frame_mod.build_frame_from_keypoints(
            jnp.asarray(f.uv), jnp.asarray(f.desc), jnp.asarray(f.valid),
            rig, max_intra=1024,
        )
        slam.process_frame(ff, f.timestamp)
    assert slam.state == INITIALIZED
    slam.finalize()  # land any deferred (async) global-BA write-back
    ts, est = slam.trajectory_arrays()
    ate = metrics.ate_rmse(est, poses)
    return slam, ate


def test_global_ba_beats_pgo_only():
    slam_off, ate_off = _run_session(global_ba=False)
    slam_on, ate_on = _run_session(global_ba=True)
    # identical input stream; closures fired in both runs
    assert slam_off.stats["loops"] >= 1
    assert slam_on.stats["loops"] >= 1
    assert slam_on.stats.get("global_ba", 0) >= 1, "global BA never ran"
    assert slam_off.stats.get("global_ba", 0) == 0
    assert ate_on < ate_off, (ate_on, ate_off)
    assert ate_on < 0.25, ate_on

    # --- landmark-sharded mesh path, driven by the SLAM driver itself ---
    # Reuses slam_on's session (the 38-frame drive is the expensive part;
    # duplicating it in a separate test kept this path in the slow tier
    # and out of the default suite). The session tracked single-chip; the
    # mesh is attached for the global solve alone — the multi-chip
    # flagship workload (_run_global_ba dispatches the lm-sharded solver
    # when self.mesh is set).
    from mcslam_tpu.parallel.sharded_ba import make_mesh

    n_gba = slam_on.stats["global_ba"]
    poses_before = np.stack([k.world_T_ref for k in slam_on.keyframes])
    slam_on.mesh = make_mesh(4)
    slam_on._run_global_ba()  # landmark-sharded over the 4-device mesh
    slam_on._finish_pending_gba()  # land the deferred write-back
    assert slam_on.stats["global_ba"] == n_gba + 1
    for k in slam_on.keyframes:
        assert np.all(np.isfinite(k.world_T_ref))
    # the sharded solve runs from an already-optimized state: it must not
    # tear the trajectory apart
    poses_after = np.stack([k.world_T_ref for k in slam_on.keyframes])
    assert np.linalg.norm(poses_after[:, :3, 3] - poses_before[:, :3, 3],
                          axis=-1).max() < 0.5
    ts, est = slam_on.trajectory_arrays()
    ate_mesh = metrics.ate_rmse(est, synthetic.loop_trajectory(
        38, radius=4.0, revisit_frames=18, seed=0))
    assert ate_mesh < 0.25, ate_mesh
