"""EuRoC (ASL layout) readiness: fixture sequence -> run_euroc.sh -> ATE.

Parity (WHAT): the reference's real-data evaluation workflow
(/root/reference/evaluation.md:1-27 — run on EuRoC/real rigs, export TUM,
evo APE/RPE vs ground truth). Zero-egress here, so the path is proven on a
locally constructed EuRoC-layout fixture: the day a real sequence is
mounted, `scripts/run_euroc.sh <seq_dir>` produces parity numbers with no
extra wiring.
"""

import textwrap

import numpy as np
import pytest

from mcslam_tpu.data import synthetic

FPS = 20.0
T0_NS = 10**18  # EuRoC-style 19-digit ns stamps


@pytest.fixture(scope="module")
def euroc_seq(tmp_path_factory):
    """A tiny sequence in standard EuRoC ASL layout:
    mav0/cam{0,1}/{sensor.yaml,data/<ns>.png}, imu0/{sensor.yaml,data.csv},
    state_groundtruth_estimate0/data.csv."""
    import cv2

    seq = tmp_path_factory.mktemp("euroc_seq")
    mav0 = seq / "mav0"
    rig = synthetic.make_synthetic_rig(
        synthetic.SyntheticRigSpec(num_cams=2, baseline=0.2,
                                   image_size=(320, 240), focal=260.0)
    )
    poses = synthetic.smooth_trajectory(6, radius=5.0, step_angle=0.03)
    lms = synthetic.make_landmarks(600, seed=1, depth_range=(4.0, 12.0),
                                   spread=(10.0, 6.0))
    imgs = synthetic.render_blob_images(rig, poses, lms, seed=2)

    # cameras: body frame == cam0 -> T_BS_i = inv(cam_T_ref[i])
    for c in range(2):
        d = mav0 / f"cam{c}" / "data"
        d.mkdir(parents=True)
        for k in range(len(poses)):
            ts_ns = int(k / FPS * 1e9) + T0_NS
            cv2.imwrite(
                str(d / f"{ts_ns}.png"),
                (np.asarray(imgs[k, c]) * 255).astype(np.uint8),
            )
        T_BS = np.linalg.inv(np.asarray(rig.cam_T_ref[c], np.float64))
        rows = ", ".join(
            "[" + ", ".join(f"{v:.9f}" for v in T_BS[r]) + "]"
            for r in range(4)
        )
        (mav0 / f"cam{c}" / "sensor.yaml").write_text(textwrap.dedent(f"""
            sensor_type: camera
            T_BS:
              rows: 4
              cols: 4
              data: [{rows}]
            rate_hz: 20
            resolution: [320, 240]
            camera_model: pinhole
            intrinsics: [260.0, 260.0, 160.0, 120.0]
            distortion_model: radial-tangential
            distortion_coefficients: [0.0, 0.0, 0.0, 0.0]
        """))

    # imu0: EuRoC noise-density block + identity T_BS (body == imu)
    imu_dir = mav0 / "imu0"
    imu_dir.mkdir()
    (imu_dir / "sensor.yaml").write_text(textwrap.dedent("""
        sensor_type: imu
        T_BS:
          rows: 4
          cols: 4
          data: [1.0, 0.0, 0.0, 0.0,
                 0.0, 1.0, 0.0, 0.0,
                 0.0, 0.0, 1.0, 0.0,
                 0.0, 0.0, 0.0, 1.0]
        rate_hz: 200
        gyroscope_noise_density: 1.6968e-04
        gyroscope_random_walk: 1.9393e-05
        accelerometer_noise_density: 2.0000e-3
        accelerometer_random_walk: 3.0000e-3
    """))
    imu_rows = []
    for k in range(60):  # 200 Hz-ish dummy stream spanning the frames
        ts_ns = int(k * 5e6) + T0_NS
        imu_rows.append(f"{ts_ns},0.001,-0.002,0.0005,0.03,-0.02,9.80")
    (imu_dir / "data.csv").write_text(
        "#timestamp [ns],w_RS_S_x,w_RS_S_y,w_RS_S_z,a_RS_S_x,a_RS_S_y,"
        "a_RS_S_z\n" + "\n".join(imu_rows) + "\n"
    )

    # ground truth at the frame stamps (body == cam0 poses), wxyz quaternion
    from mcslam_tpu.geometry import lie

    q_xyzw = np.asarray(lie.quat_from_rot(np.asarray(poses[:, :3, :3],
                                                     np.float32)))
    gt_dir = mav0 / "state_groundtruth_estimate0"
    gt_dir.mkdir()
    lines = ["#timestamp,p_x,p_y,p_z,q_w,q_x,q_y,q_z"]
    for k in range(len(poses)):
        ts_ns = int(k / FPS * 1e9) + T0_NS
        p = poses[k, :3, 3]
        q = q_xyzw[k]
        lines.append(
            f"{ts_ns},{p[0]:.9f},{p[1]:.9f},{p[2]:.9f},"
            f"{q[3]:.9f},{q[0]:.9f},{q[1]:.9f},{q[2]:.9f}"
        )
    (gt_dir / "data.csv").write_text("\n".join(lines) + "\n")
    return seq, poses


def test_load_euroc_rig(euroc_seq):
    seq, _ = euroc_seq
    from mcslam_tpu.data import euroc
    from mcslam_tpu.geometry import camera as cam_ops

    rig, imu_params, cam_dirs = euroc.load_euroc_rig(seq)
    assert cam_dirs == ["cam0", "cam1"]
    assert rig.num_cams == 2
    assert rig.image_size == (320, 240)
    assert rig.dist_model == cam_ops.DIST_RADTAN
    np.testing.assert_allclose(
        np.asarray(rig.fxycxy), [[260, 260, 160, 120]] * 2, atol=1e-5
    )
    # cam1 sits +0.2 m along +x of cam0 -> cam_T_ref translation -0.2
    np.testing.assert_allclose(
        np.asarray(rig.cam_T_ref[1, :3, 3]), [-0.2, 0, 0], atol=1e-6
    )
    assert imu_params is not None
    np.testing.assert_allclose(imu_params.gyro_noise, 1.6968e-4, rtol=1e-5)
    np.testing.assert_allclose(imu_params.accel_walk, 3e-3, rtol=1e-5)


def test_groundtruth_tum_roundtrip(euroc_seq, tmp_path):
    seq, poses = euroc_seq
    from mcslam_tpu.data import euroc
    from mcslam_tpu.utils import metrics

    ts, gt = euroc.load_groundtruth_tum(seq)
    assert len(ts) == len(poses)
    np.testing.assert_allclose(gt[:, :3, 3], poses[:, :3, 3], atol=1e-6)
    # rotation recovered through the wxyz->xyzw conversion
    err = np.einsum("nij,nkj->nik", gt[:, :3, :3], poses[:, :3, :3])
    np.testing.assert_allclose(
        err, np.tile(np.eye(3), (len(ts), 1, 1)), atol=1e-5
    )
    out = tmp_path / "gt_tum.txt"
    n = euroc.write_groundtruth_tum(seq, out)
    assert n == len(poses) and out.exists()
    assert metrics is not None  # imported for the e2e test below


def test_run_euroc_end_to_end(euroc_seq, tmp_path):
    """The one-command runner: raw ASL folder -> trajectory -> ATE vs GT."""
    seq, poses = euroc_seq
    from scripts.run_euroc import main as run_euroc

    out = tmp_path / "out"
    rc = run_euroc([
        str(seq), "--out_dir", str(out),
        "--num_points", "512", "--num_levels", "3",
    ])
    assert rc == 0
    est_path = out / "trajectory_tum.txt"
    gt_path = out / "groundtruth_tum.txt"
    assert est_path.exists() and gt_path.exists()

    from mcslam_tpu.utils import metrics, tum

    ts_e, est = tum.read_tum(est_path)
    ts_g, gt = tum.read_tum(gt_path)
    assert len(ts_e) == 6
    ie, ig = metrics.associate(ts_e, ts_g, 0.02)
    assert len(ie) == 6  # every frame associates with a GT row
    ate = metrics.ate_rmse(est[ie], gt[ig])
    assert ate < 0.2, ate
