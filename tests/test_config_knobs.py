"""Reference YAML knobs must change behavior or error — never silently parse
and do nothing (reference key set: Backend.cpp:24-106, FrontEnd.h:157-161).

Covers the four keys the round-3 review flagged as inert:
MeasurementNoiseSigma, Optimization, InitCondition, InterMatch (plus
PoseEstimation validation).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mcslam_tpu.data import config, synthetic
from mcslam_tpu.frontend import frame as frame_mod
from mcslam_tpu.slam import INITIALIZED, MultiCameraSLAM, SlamConfig


def _params(fe=None, be=None):
    frontend = dict(config._FRONTEND_DEFAULTS)
    backend = dict(config._BACKEND_DEFAULTS)
    frontend.update(fe or {})
    backend.update(be or {})
    return frontend, backend


# -- mapping --------------------------------------------------------------

def test_measurement_noise_sigma_maps_to_px_sigma():
    cfg, _ = config.slam_config_from_params(
        *_params(be={"MeasurementNoiseSigma": 2.5})
    )
    assert cfg.px_sigma == 2.5


def test_optimization_mode_mapping():
    cfg0, _ = config.slam_config_from_params(*_params(be={"Optimization": 0}))
    cfg1, _ = config.slam_config_from_params(*_params(be={"Optimization": 1}))
    cfg2, _ = config.slam_config_from_params(*_params(be={"Optimization": 2}))
    assert not cfg0.final_global_ba and not cfg2.final_global_ba
    assert cfg1.final_global_ba
    with pytest.raises(ValueError, match="Optimization"):
        config.slam_config_from_params(*_params(be={"Optimization": 3}))


def test_init_condition_mapping():
    for raw in ("MIN_FEATS", 0, "0"):
        cfg, _ = config.slam_config_from_params(
            *_params(fe={"InitCondition": raw})
        )
        assert cfg.init_min_feats, raw
    for raw in ("RANSAC_FILTER", 1):
        cfg, _ = config.slam_config_from_params(
            *_params(fe={"InitCondition": raw})
        )
        assert not cfg.init_min_feats, raw
    with pytest.raises(ValueError, match="InitCondition"):
        config.slam_config_from_params(*_params(fe={"InitCondition": 2}))
    with pytest.raises(ValueError, match="InitCondition"):
        config.slam_config_from_params(*_params(fe={"InitCondition": "FOO"}))


def test_inter_match_and_pose_estimation_validated():
    # both reference values are accepted (they select the brute-force
    # popcount matcher, the superset of the BoW bucketing)
    for raw in ("BF_MATCH", "BoW_MATCH", 0, 1, "BoW"):
        config.slam_config_from_params(*_params(fe={"InterMatch": raw}))
    with pytest.raises(ValueError, match="InterMatch"):
        config.slam_config_from_params(*_params(fe={"InterMatch": 5}))
    for raw in ("PC_ALIGN", "SEVENTEEN_PT", "G_P3P", 0, 1, 2):
        config.slam_config_from_params(*_params(fe={"PoseEstimation": raw}))
    with pytest.raises(ValueError, match="PoseEstimation"):
        config.slam_config_from_params(*_params(fe={"PoseEstimation": "EPNP"}))


def test_yaml_roundtrip_changes_config(tmp_path):
    """A carried-over reference backend YAML changes SlamConfig end to end."""
    p = tmp_path / "lf_backend.yaml"
    p.write_text(
        "%YAML:1.0\n---\nMeasurementNoiseSigma: 4.0\nOptimization: 1\n"
        "WindowBad: 9\n"
    )
    be = config.load_backend_params(p)
    cfg, _ = config.slam_config_from_params(*_params(be=be))
    assert cfg.px_sigma == 4.0
    assert cfg.final_global_ba
    assert cfg.window_size == 9


# -- behavior -------------------------------------------------------------

def _scene(kps_per_cam, num_frames=10, seed=0):
    rig = synthetic.make_synthetic_rig(
        synthetic.SyntheticRigSpec(num_cams=3, baseline=0.2)
    )
    poses = synthetic.smooth_trajectory(
        num_frames, radius=5.0, step_angle=0.03, seed=seed
    )
    lms = synthetic.make_landmarks(900, seed=seed + 1, depth_range=(5.0, 16.0))
    descs = synthetic.make_descriptors(900, seed=seed + 2)
    frames = synthetic.render_feature_frames(
        rig, poses, lms, descs, kps_per_cam=kps_per_cam, px_noise=0.3,
        desc_bit_noise=5, seed=seed + 3,
    )
    return rig, frames


def _ff(rig, f):
    return frame_mod.build_frame_from_keypoints(
        jnp.asarray(f.uv), jnp.asarray(f.desc), jnp.asarray(f.valid),
        rig, max_intra=1024,
    )


def test_min_feats_init_waits_for_150_intra_landmarks():
    """MIN_FEATS refuses a first frame with 30..150 triangulated intra
    matches that RANSAC_FILTER accepts (FrontEnd.cpp:2485-2494)."""
    rig, frames = _scene(kps_per_cam=110)
    ff0 = _ff(rig, frames[0])
    n3d = int(np.asarray(ff0.im_has_depth).sum())
    assert 30 <= n3d <= 150, f"scene precondition broke: n3d={n3d}"

    slam_rf = MultiCameraSLAM(rig, SlamConfig(), seed=0)
    slam_rf.process_frame(ff0, frames[0].timestamp)
    assert slam_rf.state == INITIALIZED

    slam_mf = MultiCameraSLAM(rig, SlamConfig(init_min_feats=True), seed=0)
    slam_mf.process_frame(ff0, frames[0].timestamp)
    assert slam_mf.state != INITIALIZED

    # a dense frame (>150 intra landmarks) initializes MIN_FEATS directly
    rig2, frames2 = _scene(kps_per_cam=480, num_frames=1, seed=1)
    ff_dense = _ff(rig2, frames2[0])
    assert int(np.asarray(ff_dense.im_has_depth).sum()) > 150
    slam_mf2 = MultiCameraSLAM(rig2, SlamConfig(init_min_feats=True), seed=0)
    slam_mf2.process_frame(ff_dense, frames2[0].timestamp)
    assert slam_mf2.state == INITIALIZED


def test_px_sigma_changes_ba_solution():
    """MeasurementNoiseSigma rebalances vision vs the fixed-lag prior:
    a large sigma must move the windowed solution."""
    rig, frames = _scene(kps_per_cam=320, num_frames=10)
    trajs = []
    for sig in (1.0, 40.0):
        slam = MultiCameraSLAM(
            rig, SlamConfig(window_size=4, ba_obs_capacity=8192,
                            ba_lm_capacity=1024, local_map_landmarks=1024,
                            kf_translation=0.25, kf_rotation=0.15,
                            px_sigma=sig),
            seed=0,
        )
        for f in frames:
            slam.process_frame(_ff(rig, f), f.timestamp)
        _, poses = slam.trajectory_arrays()
        trajs.append(np.asarray(poses))
    assert not np.allclose(trajs[0], trajs[1], atol=1e-5)


def test_final_global_ba_runs_at_finalize():
    """Optimization=1 (LM batch) re-solves the full graph once at
    finalize() (reference LM path, Backend.cpp:3269-3317)."""
    rig, frames = _scene(kps_per_cam=320, num_frames=10)
    slam = MultiCameraSLAM(
        rig, SlamConfig(window_size=4, ba_obs_capacity=8192,
                        ba_lm_capacity=1024, local_map_landmarks=1024,
                        kf_translation=0.25, kf_rotation=0.15,
                        final_global_ba=True),
        seed=0,
    )
    for f in frames:
        slam.process_frame(_ff(rig, f), f.timestamp)
    assert slam.stats.get("global_ba", 0) == 0
    slam.finalize()
    assert slam.stats.get("global_ba", 0) == 1
    assert slam._final_gba_done
    # finalize() is idempotent
    slam.finalize()
    assert slam.stats.get("global_ba", 0) == 1
