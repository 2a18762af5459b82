"""Backend replay determinism, profiling utils, config/calib parsing."""

import textwrap

import numpy as np
import jax.numpy as jnp

from mcslam_tpu.data import config as config_mod
from mcslam_tpu.data import calib as calib_mod
from mcslam_tpu.data import synthetic
from mcslam_tpu.frontend import frame as frame_mod
from mcslam_tpu.slam import INITIALIZED, MultiCameraSLAM, SlamConfig
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


def test_between_factor_pulls_poses():
    """SE(3) between factors alone (no vision/imu/gps) must drag the window
    onto the measured relative chain — the mechanism the replay harness
    uses for 'k' loop records (reference BetweenFactor<Pose3> path in
    reduced_camera_system.cpp)."""
    import jax.numpy as jnp

    from mcslam_tpu.backend import ba, ba_vio
    from mcslam_tpu.geometry import lie

    K = 3
    D = ba_vio.D
    rng = np.random.RandomState(3)
    # ground-truth chain
    rels = []
    gt = [np.eye(4, dtype=np.float32)]
    for i in range(K - 1):
        xi = np.concatenate([rng.uniform(-0.1, 0.1, 3),
                             rng.uniform(-0.5, 0.5, 3)]).astype(np.float32)
        rel = np.asarray(lie.se3_exp(jnp.asarray(xi)))
        rels.append(rel)
        gt.append(gt[-1] @ rel)
    gt = np.stack(gt)
    # perturbed initial poses
    init = gt.copy()
    for i in range(1, K):
        xi = np.concatenate([rng.uniform(-0.05, 0.05, 3),
                             rng.uniform(-0.2, 0.2, 3)]).astype(np.float32)
        init[i] = init[i] @ np.asarray(lie.se3_exp(jnp.asarray(xi)))

    between = ba_vio.BetweenFactors(
        i=jnp.asarray(np.arange(K - 1), jnp.int32),
        j=jnp.asarray(np.arange(1, K), jnp.int32),
        rel=jnp.asarray(np.stack(rels)),
        sigma_rot=jnp.full(K - 1, 0.01, jnp.float32),
        sigma_trans=jnp.full(K - 1, 0.01, jnp.float32),
        valid=jnp.ones(K - 1, bool),
    )
    N = K * D + 6
    prior_H = np.zeros((N, N), np.float32)
    prior_H[:6, :6] = np.eye(6) * 1e8  # gauge: clamp pose 0
    for i in range(K):  # no imu: clamp vel/bias
        r0 = i * D + 6
        prior_H[r0:r0 + 9, r0:r0 + 9] = np.eye(9) * 1e8
    prior_H[K * D:, K * D:] = np.eye(6) * 1e8  # E_T_V unused
    L, O = 1, 8
    obs = ba.BAObservations(
        kf=jnp.zeros(O, jnp.int32), cam=jnp.zeros(O, jnp.int32),
        lm=jnp.zeros(O, jnp.int32), uv=jnp.zeros((O, 2), jnp.float32),
        sigma2=jnp.ones(O, jnp.float32), valid=jnp.zeros(O, bool),
    )
    problem = ba_vio.VioProblem(
        poses=jnp.asarray(init), vels=jnp.zeros((K, 3)),
        biases=jnp.zeros((K, 6)),
        landmarks=jnp.zeros((L, 3)), lm_valid=jnp.zeros(L, bool), obs=obs,
        cam_T_body=jnp.tile(jnp.eye(4), (2, 1, 1)),
        fxycxy=jnp.tile(jnp.asarray([300.0, 300.0, 160.0, 120.0]), (2, 1)),
        imu=None, gps=None, E_T_V=jnp.eye(4),
        prior_H=jnp.asarray(prior_H), prior_b=jnp.zeros(N),
        kf_valid=jnp.ones(K, bool), between=between,
    )
    res = ba_vio.vio_solve(problem, iters=10, gate_rounds=1)
    out = np.asarray(res.poses)
    err_before = np.linalg.norm(init[:, :3, 3] - gt[:, :3, 3], axis=-1).max()
    err_after = np.linalg.norm(out[:, :3, 3] - gt[:, :3, 3], axis=-1).max()
    assert err_before > 0.05
    assert err_after < 1e-3, (err_before, err_after)


def test_full_graph_replay_vio_gps(tmp_path):
    """Rebuild the COMPLETE multi-sensor graph (vision + imu_raw + g) from
    graph_logs and re-optimize — the reference's reduced_camera_system
    integration pattern: the replay must be deterministic and must stay at
    the live run's solution."""
    import jax.numpy as jnp

    from mcslam_tpu.backend.imu import ImuParams
    from mcslam_tpu.frontend import frame as frame_mod
    from tests.test_slam_vio import _vio_sequence

    fps = 20.0
    rig, poses, imu_ts, gyro, accel, frames, gps = _vio_sequence(
        num_frames=18, with_gps=True, seed=5
    )
    imu_params = ImuParams(accel_noise=2e-3, gyro_noise=2e-4)
    cfg = SlamConfig(window_size=4, ba_obs_capacity=8192,
                     ba_lm_capacity=1024, local_map_landmarks=1024,
                     kf_translation=0.1, kf_rotation=0.08,
                     imu_init_samples=40)
    slam = MultiCameraSLAM(rig, cfg, imu_params=imu_params,
                           gps_lever_arm=np.zeros(3))
    log_path = tmp_path / "graph_logs.txt"
    w = mapio.GraphLogWriter(log_path)
    slam.attach_graph_log(w)  # streams imu_raw + g records
    gps_t, gps_lla = gps
    for k, f in enumerate(frames):
        t = k / fps
        t_prev = (k - 1) / fps if k else -1.0
        sel = (imu_ts > t_prev) & (imu_ts <= t)
        gsel = (gps_t > t_prev) & (gps_t <= t)
        ff = frame_mod.build_frame_from_keypoints(
            jnp.asarray(f.uv), jnp.asarray(f.desc), jnp.asarray(f.valid),
            rig, max_intra=1024,
        )
        slam.process_frame(
            ff, f.timestamp,
            imu=(imu_ts[sel], gyro[sel], accel[sel]),
            gps=(gps_t[gsel], gps_lla[gsel]),
        )
    assert slam.state == INITIALIZED and len(slam.kf_gps) >= 1
    # end-of-session x/l/e dump (what the CLI app does)
    for kf in slam.keyframes:
        w.pose(kf.kf_id, kf.world_T_ref, kf.timestamp)
        for m in np.nonzero(kf.lm_id >= 0)[0]:
            w.edge(kf.kf_id, int(kf.im_anchor_cam[m]), int(kf.lm_id[m]),
                   float(kf.im_uv[m, 0]), float(kf.im_uv[m, 1]))
    for lid in np.nonzero(slam.map.valid)[0]:
        w.landmark(int(lid), slam.map.pos[lid])
    w.close()

    body_T_cam0 = np.asarray(rig.body_T_cam)[0]
    cam_T_body = np.asarray(
        [np.linalg.inv(np.asarray(rig.body_T_cam)[c])
         for c in range(rig.num_cams)], np.float32,
    )
    out = replay.replay_graph_logs_vio(
        log_path, cam_T_body, np.asarray(rig.fxycxy),
        body_T_cam0=body_T_cam0, imu_params=imu_params,
        obs_capacity=16384,
    )
    # the full sensor graph was rebuilt
    assert out["n_imu"] >= len(out["kf_ids"]) - 4, out["n_imu"]
    assert out["n_gps"] >= 1
    assert out["n_obs"] > 200
    # re-optimization stays at (or improves) the live solution
    assert out["cost_out"] <= out["cost_in"] * 1.05
    dt = np.linalg.norm(
        out["poses_out"][:, :3, 3] - out["poses_in"][:, :3, 3], axis=-1
    )
    # the batch smoother may legitimately move late keyframes (the live
    # sliding window is suboptimal by construction); it must stay in the
    # same basin, not wander. The bound tolerates f32 reduction-order
    # sensitivity of the live windowed chain (the one-hot kf-blocked VIO
    # assembly itself is parity-checked in test_backend).
    assert dt.max() < 0.5, dt.max()
    # deterministic replay
    out2 = replay.replay_graph_logs_vio(
        log_path, cam_T_body, np.asarray(rig.fxycxy),
        body_T_cam0=body_T_cam0, imu_params=imu_params,
        obs_capacity=16384,
    )
    np.testing.assert_array_equal(out["poses_out"], out2["poses_out"])


def test_top_level_exports():
    """The README's `from mcslam_tpu import ...` entry points resolve via
    the lazy PEP 562 re-exports; unknown names raise AttributeError."""
    import pytest

    import mcslam_tpu

    for name in ("MultiCameraSLAM", "SlamConfig", "build_frame", "CameraRig",
                 "load_kalibr", "load_euroc_rig", "ate_rmse"):
        assert callable(getattr(mcslam_tpu, name)), name
        assert name in dir(mcslam_tpu)
    with pytest.raises(AttributeError):
        mcslam_tpu.not_a_real_export


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
