"""Backend replay determinism, profiling utils, config/calib parsing."""

import textwrap

import numpy as np
import jax.numpy as jnp

from mcslam_tpu.data import config as config_mod
from mcslam_tpu.data import calib as calib_mod
from mcslam_tpu.data import synthetic
from mcslam_tpu.frontend import frame as frame_mod
from mcslam_tpu.slam import MultiCameraSLAM, SlamConfig
from mcslam_tpu.utils import mapio, replay


def _session(tmp_path):
    rig = synthetic.make_synthetic_rig(
        synthetic.SyntheticRigSpec(num_cams=3, baseline=0.2)
    )
    poses = synthetic.smooth_trajectory(8, radius=5.0, step_angle=0.03)
    lms = synthetic.make_landmarks(700, seed=1, depth_range=(5.0, 14.0))
    descs = synthetic.make_descriptors(700, seed=2)
    frames = synthetic.render_feature_frames(
        rig, poses, lms, descs, kps_per_cam=300, seed=3
    )
    slam = MultiCameraSLAM(rig, SlamConfig(
        window_size=4, ba_obs_capacity=4096, ba_lm_capacity=1024,
        local_map_landmarks=1024, kf_translation=0.2))
    for f in frames:
        ff = frame_mod.build_frame_from_keypoints(
            jnp.asarray(f.uv), jnp.asarray(f.desc), jnp.asarray(f.valid),
            rig, max_intra=768,
        )
        slam.process_frame(ff, f.timestamp)
    # dump graph logs
    log_path = tmp_path / "graph_logs.txt"
    w = mapio.GraphLogWriter(log_path)
    for kf in slam.keyframes:
        w.pose(kf.kf_id, kf.world_T_ref)
        for m in np.nonzero(kf.lm_id >= 0)[0]:
            for c in np.nonzero(kf.ray_valid[m])[0]:
                w.edge(kf.kf_id, int(c), int(kf.lm_id[m]),
                       float(kf.ray_uv[m, c, 0]), float(kf.ray_uv[m, c, 1]))
    for lid in np.nonzero(slam.map.valid)[0]:
        w.landmark(int(lid), slam.map.pos[lid])
    w.close()
    return rig, slam, log_path


def test_replay_reoptimizes_logged_graph(tmp_path):
    rig, slam, log_path = _session(tmp_path)
    out = replay.replay_graph_logs(
        log_path, np.asarray(rig.cam_T_ref), np.asarray(rig.fxycxy),
        obs_capacity=16384,
    )
    assert out["n_obs"] > 200
    # the replayed optimization must not blow up the already-optimized state
    assert out["cost_out"] <= out["cost_in"] * 1.05
    # deterministic: same input -> same output
    out2 = replay.replay_graph_logs(
        log_path, np.asarray(rig.cam_T_ref), np.asarray(rig.fxycxy),
        obs_capacity=16384,
    )
    np.testing.assert_array_equal(out["poses_out"], out2["poses_out"])


def test_stage_timers():
    from mcslam_tpu.utils.profiling import StageTimers

    t = StageTimers()
    with t.span("work"):
        sum(range(1000))
    with t.span("work"):
        sum(range(1000))
    assert t.count["work"] == 2
    assert t.mean_ms("work") >= 0.0
    assert "work" in t.report()


def test_cfg_parsing(tmp_path):
    cfg = tmp_path / "app.cfg"
    cfg.write_text(textwrap.dedent(f"""
        # comment
        data_path={tmp_path}
        images_path=imgs
        use_imu=true
        num_cams=3
        frames=10,100,2
        shifts=0,3,5
        traj_file=out.txt
    """))
    s = config_mod.parse_cfg(cfg)
    assert s.use_imu is True
    assert s.num_cams == 3
    assert s.frames_range == (10, 100, 2)
    assert s.shifts == [0, 3, 5]
    assert s.raw["images_path"].endswith("imgs")
    assert s.raw["traj_file"].startswith(str(tmp_path))


def test_kalibr_roundtrip(tmp_path):
    y = tmp_path / "camchain.yaml"
    y.write_text(textwrap.dedent("""
        cam0:
          intrinsics: [400.0, 401.0, 320.0, 240.0]
          distortion_coeffs: [-0.1, 0.01, 0.001, -0.001]
          distortion_model: radtan
          resolution: [640, 480]
        cam1:
          intrinsics: [402.0, 403.0, 321.0, 241.0]
          distortion_coeffs: [-0.11, 0.012, 0.0, 0.0]
          distortion_model: radtan
          resolution: [640, 480]
          T_cn_cnm1:
            - [1.0, 0.0, 0.0, -0.2]
            - [0.0, 1.0, 0.0, 0.0]
            - [0.0, 0.0, 1.0, 0.0]
            - [0.0, 0.0, 0.0, 1.0]
        imu:
          acc_noise: 0.02
          gyr_noise: 0.002
          g_norm: 9.803
          Tbc:
            - [0.0, -1.0, 0.0, 0.1]
            - [1.0, 0.0, 0.0, 0.0]
            - [0.0, 0.0, 1.0, -0.05]
            - [0.0, 0.0, 0.0, 1.0]
        gps:
          Tbg:
            - [1.0, 0.0, 0.0, 0.3]
            - [0.0, 1.0, 0.0, 0.0]
            - [0.0, 0.0, 1.0, 0.6]
            - [0.0, 0.0, 0.0, 1.0]
    """))
    rig, imu_params, gps_params = calib_mod.load_kalibr(y)
    assert rig.num_cams == 2
    np.testing.assert_allclose(
        np.asarray(rig.fxycxy[0]), [400, 401, 320, 240]
    )
    np.testing.assert_allclose(
        np.asarray(rig.cam_T_ref[1])[:3, 3], [-0.2, 0, 0], atol=1e-6
    )
    assert imu_params["acc_noise"] == 0.02
    assert imu_params["g_norm"] == 9.803
    assert "Tbc" in imu_params
    np.testing.assert_allclose(gps_params["Tbg"][:3, 3], [0.3, 0.0, 0.6])
    # body_T_cam wired into the rig
    assert np.abs(np.asarray(rig.body_T_cam[0]) - imu_params["Tbc"]).max() < 1e-6
