"""End-to-end CLI app test: dataset on disk -> cfg -> mc_slam_app -> TUM."""

import textwrap

import numpy as np
import pytest

from mcslam_tpu.data import synthetic


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("ds")
    rig = synthetic.make_synthetic_rig(
        synthetic.SyntheticRigSpec(num_cams=2, baseline=0.2,
                                   image_size=(320, 240), focal=260.0)
    )
    poses = synthetic.smooth_trajectory(6, radius=5.0, step_angle=0.03)
    lms = synthetic.make_landmarks(600, seed=1, depth_range=(4.0, 12.0),
                                   spread=(10.0, 6.0))
    imgs = synthetic.render_blob_images(rig, poses, lms, seed=2)
    for c in range(2):
        d = root / f"cam{c}" / "data"
        d.mkdir(parents=True)
        for k in range(len(poses)):
            ts_ns = int(k / 20.0 * 1e9) + 10**18  # EuRoC-style 19 digits
            cv2.imwrite(
                str(d / f"{ts_ns}.png"),
                (np.asarray(imgs[k, c]) * 255).astype(np.uint8),
            )
    calib = root / "camchain.yaml"
    calib.write_text(textwrap.dedent("""
        cam0:
          intrinsics: [260.0, 260.0, 160.0, 120.0]
          distortion_coeffs: [0.0, 0.0, 0.0, 0.0]
          distortion_model: radtan
          resolution: [320, 240]
        cam1:
          intrinsics: [260.0, 260.0, 160.0, 120.0]
          distortion_coeffs: [0.0, 0.0, 0.0, 0.0]
          distortion_model: radtan
          resolution: [320, 240]
          T_cn_cnm1:
            - [1.0, 0.0, 0.0, -0.2]
            - [0.0, 1.0, 0.0, 0.0]
            - [0.0, 0.0, 1.0, 0.0]
            - [0.0, 0.0, 0.0, 1.0]
    """))
    fe = root / "frontend.yaml"
    fe.write_text(textwrap.dedent("""
        ORBextractor.nFeatures: 512
        ORBextractor.nLevels: 3
        KFBaselineThresholdTranslation: 0.2
        KFBaselineThresholdRotation: 0.1
    """))
    from mcslam_tpu.loop import vocab as vocab_mod

    voc = vocab_mod.Vocabulary.train(
        synthetic.make_descriptors(2000, seed=21), k=6, depth=3, iters=3
    )
    voc.save(root / "vocab.npz")
    cfg = root / "app.cfg"
    cfg.write_text(textwrap.dedent(f"""
        data_path={root}
        images_path={root}
        calib_file_path=camchain.yaml
        frontend_params_file=frontend.yaml
        kalibr=true
        num_cams=2
        traj_file=traj.txt
        map_path=map.json
        vocabulary=vocab.npz
        database_path=db.npz
        calc_depth=true
        depth_dir=depth
    """))
    return root, poses


def test_app_runs_end_to_end(dataset):
    root, poses = dataset
    from mcslam_tpu.apps import mc_slam_app

    rc = mc_slam_app.main([
        "--config_file", str(root / "app.cfg"),
        "--traj_file", str(root / "traj.txt"),
    ])
    assert rc == 0
    from mcslam_tpu.utils import metrics, tum

    ts, est = tum.read_tum(root / "traj.txt")
    assert len(ts) == 6
    ate = metrics.ate_rmse(est, poses)
    assert ate < 0.2, ate
    assert (root / "map.json").exists()
    assert (root / "db.npz").exists()
    # dense depth maps saved per keyframe (reference calc_depth mode)
    depth_files = list((root / "depth").glob("depth_*.npy"))
    assert depth_files, "calc_depth=true produced no depth maps"
    d = np.load(depth_files[0])
    assert d.ndim == 2 and np.isfinite(d).all()


def test_app_mesh_devices_shards_frame_and_ba(dataset, tmp_path):
    """mesh_devices=2 on a 2-camera rig routes frame builds through the
    camera-sharded path and BA through the mesh solver; same trajectory
    quality as the single-device run (the frame build is bit-exact)."""
    root, poses = dataset
    from mcslam_tpu.apps import mc_slam_app

    cfg = (root / "app.cfg").read_text().replace(
        "calc_depth=true", "calc_depth=false")
    mesh_cfg = tmp_path / "app_mesh.cfg"
    mesh_cfg.write_text(cfg + "\nmesh_devices=2\n")
    rc = mc_slam_app.main([
        "--config_file", str(mesh_cfg),
        "--traj_file", str(tmp_path / "traj_mesh.txt"),
    ])
    assert rc == 0
    from mcslam_tpu.utils import metrics, tum

    ts, est = tum.read_tum(tmp_path / "traj_mesh.txt")
    assert len(ts) == 6
    ate = metrics.ate_rmse(est, poses)
    assert ate < 0.2, ate


def test_app_wires_imu_gps_params(dataset, tmp_path, monkeypatch):
    """Regression: use_imu=true/use_gps=true used to run silently
    vision-only — the app loaded the calibration's imu/gps blocks
    (reference FrontEnd ctor, FrontEnd.h:263-407) but never passed them to
    the SLAM constructor."""
    import textwrap as tw

    root, _ = dataset
    calib = tmp_path / "camchain_imu.yaml"
    calib.write_text(
        (root / "camchain.yaml").read_text()
        + tw.dedent("""
        imu:
          acc_noise: 0.0123
          gyr_noise: 0.00045
          acc_walk: 0.0002
          gyr_walk: 0.00003
          g_norm: 9.805
        gps:
          Tbg:
            - [1.0, 0.0, 0.0, 0.25]
            - [0.0, 1.0, 0.0, -0.1]
            - [0.0, 0.0, 1.0, 0.05]
            - [0.0, 0.0, 0.0, 1.0]
        """)
    )
    cfg = tmp_path / "imu.cfg"
    cfg.write_text(tw.dedent(f"""
        data_path={root}
        images_path={root}
        calib_file_path={calib}
        frontend_params_file=frontend.yaml
        kalibr=true
        num_cams=2
        use_imu=true
        use_gps=true
        traj_file={tmp_path}/traj.txt
    """))

    captured = {}

    class _Stop(Exception):
        pass

    def fake_slam(*a, **kw):
        captured.update(kw)
        raise _Stop

    monkeypatch.setattr("mcslam_tpu.slam.MultiCameraSLAM", fake_slam)
    from mcslam_tpu.apps import mc_slam_app

    with pytest.raises(_Stop):
        mc_slam_app.main(["--config_file", str(cfg)])
    imu_p = captured["imu_params"]
    assert imu_p is not None
    np.testing.assert_allclose(imu_p.accel_noise, 0.0123)
    np.testing.assert_allclose(imu_p.gyro_noise, 0.00045)
    np.testing.assert_allclose(imu_p.g_norm, 9.805)
    np.testing.assert_allclose(captured["gps_lever_arm"], [0.25, -0.1, 0.05])


def test_app_relocalization_fast_tracking_round_trip(dataset):
    """Map-reuse session (reference mc_slam_app relocal mode,
    mc_slam_app.cpp:347-521): session A (test above) saved map.json +
    db.npz; session B with relocalization=true + fast_tracking=true
    localizes every frame against that map without building a new one."""
    root, poses = dataset
    import textwrap as tw

    from mcslam_tpu.apps import mc_slam_app

    if not (root / "map.json").exists():
        # self-contained under `pytest -k`: run session A here when the
        # end-to-end test hasn't populated the module-scoped dataset yet
        rc = mc_slam_app.main([
            "--config_file", str(root / "app.cfg"),
            "--traj_file", str(root / "traj.txt"),
        ])
        assert rc == 0
    cfg_b = root / "reuse.cfg"
    cfg_b.write_text(tw.dedent(f"""
        data_path={root}
        images_path={root}
        calib_file_path=camchain.yaml
        frontend_params_file=frontend.yaml
        kalibr=true
        num_cams=2
        traj_file=traj_reloc.txt
        map_path=map.json
        vocabulary=vocab.npz
        database_path=db.npz
        relocalization=true
        fast_tracking=true
    """))
    rc = mc_slam_app.main([
        "--config_file", str(cfg_b),
        "--traj_file", str(root / "traj_reloc.txt"),
    ])
    assert rc == 0
    from mcslam_tpu.utils import metrics, tum

    ts, est = tum.read_tum(root / "traj_reloc.txt")
    assert len(ts) == 6
    # localized against the prior map: trajectory matches ground truth
    ate = metrics.ate_rmse(est, poses)
    assert ate < 0.25, ate
    # the saved map was NOT clobbered by the reuse session
    import json

    with open(root / "map.json") as f:
        m = json.load(f)
    assert len(m["keyframes"]) > 0
