"""Loop closure, relocalization, fast tracking, map IO, PGO."""

import numpy as np
import jax.numpy as jnp
import pytest

from mcslam_tpu.backend import pgo
from mcslam_tpu.data import synthetic
from mcslam_tpu.frontend import frame as frame_mod
from mcslam_tpu.geometry import lie
from mcslam_tpu.loop import vocab as vocab_mod
from mcslam_tpu.slam import MultiCameraSLAM, SlamConfig, INITIALIZED
from mcslam_tpu.utils import mapio, metrics


@pytest.fixture(scope="module")
def small_vocab():
    descs = synthetic.make_descriptors(2000, seed=11)
    return vocab_mod.Vocabulary.train(descs, k=6, depth=3, iters=3)


def test_vocab_transform_consistency(small_vocab):
    """Same descriptors -> same BoW; similar sets -> high score."""
    descs = synthetic.make_descriptors(300, seed=12)
    v1 = np.asarray(
        small_vocab.transform(jnp.asarray(descs), jnp.ones(300, bool))
    )
    v2 = np.asarray(
        small_vocab.transform(jnp.asarray(descs), jnp.ones(300, bool))
    )
    np.testing.assert_allclose(v1, v2)
    assert abs(np.linalg.norm(v1) - 1.0) < 1e-5
    # perturbed set still scores much higher than a disjoint set
    rng = np.random.RandomState(13)
    pert = synthetic.corrupt_descriptors(descs, 8, rng)
    other = synthetic.make_descriptors(300, seed=14)
    vp = np.asarray(small_vocab.transform(jnp.asarray(pert), jnp.ones(300, bool)))
    vo = np.asarray(small_vocab.transform(jnp.asarray(other), jnp.ones(300, bool)))
    assert v1 @ vp > v1 @ vo + 0.1


def test_vocab_save_load(tmp_path, small_vocab):
    p = tmp_path / "vocab.npz"
    small_vocab.save(p)
    v2 = vocab_mod.Vocabulary.load(p)
    descs = jnp.asarray(synthetic.make_descriptors(100, seed=15))
    w1 = np.asarray(small_vocab.word_ids(descs))
    w2 = np.asarray(v2.word_ids(descs))
    np.testing.assert_array_equal(w1, w2)


def test_pgo_corrects_drift():
    """Simulated drift: chain of noisy odometry; a loop edge back to pose 0
    pulls the end of the chain to the right place."""
    N = 12
    true = synthetic.smooth_trajectory(N, step_angle=0.1)
    # odometry with systematic drift
    drift = lie.se3_exp(jnp.asarray([0.002, 0.004, -0.002, 0.01, 0.005, 0.0]))
    est = [true[0]]
    for k in range(1, N):
        odo = np.linalg.inv(true[k - 1]) @ true[k]
        est.append(est[-1] @ odo @ np.asarray(drift))
    est = np.stack(est).astype(np.float32)
    drift_err = np.linalg.norm(est[-1][:3, 3] - true[-1][:3, 3])
    assert drift_err > 0.05  # drift actually accumulated

    ei, ej, meas, w = pgo.build_odometry_edges(jnp.asarray(est))
    # loop edge: 0 -> N-1 with the TRUE relative pose, high weight
    loop_meas = jnp.asarray(np.linalg.inv(true[0]) @ true[-1], jnp.float32)
    graph = pgo.PoseGraph(
        poses=jnp.asarray(est),
        edge_i=jnp.concatenate([ei, jnp.asarray([0], jnp.int32)]),
        edge_j=jnp.concatenate([ej, jnp.asarray([N - 1], jnp.int32)]),
        edge_meas=jnp.concatenate([meas, loop_meas[None]]),
        edge_weight=jnp.concatenate([w, jnp.asarray([50.0])]),
        edge_valid=jnp.ones(N, bool),
        anchor=jnp.asarray(0, jnp.int32),
    )
    out = np.asarray(pgo.pgo_solve(graph, iters=10))
    end_err = np.linalg.norm(out[-1][:3, 3] - true[-1][:3, 3])
    assert end_err < drift_err * 0.3, (end_err, drift_err)


def _run_slam(vocab=None, num_frames=10, seed=0):
    rig = synthetic.make_synthetic_rig(
        synthetic.SyntheticRigSpec(num_cams=3, baseline=0.2)
    )
    poses = synthetic.smooth_trajectory(num_frames, radius=5.0,
                                        step_angle=0.03, seed=seed)
    lms = synthetic.make_landmarks(900, seed=seed + 1, depth_range=(5.0, 16.0))
    descs = synthetic.make_descriptors(900, seed=seed + 2)
    frames = synthetic.render_feature_frames(
        rig, poses, lms, descs, kps_per_cam=320, px_noise=0.3,
        desc_bit_noise=5, seed=seed + 3,
    )
    cfg = SlamConfig(window_size=4, ba_obs_capacity=8192, ba_lm_capacity=1024,
                     local_map_landmarks=1024, kf_translation=0.2,
                     kf_rotation=0.12)
    slam = MultiCameraSLAM(rig, cfg, seed=seed, vocab=vocab)
    ffs = []
    for f in frames:
        ff = frame_mod.build_frame_from_keypoints(
            jnp.asarray(f.uv), jnp.asarray(f.desc), jnp.asarray(f.valid),
            rig, max_intra=1024,
        )
        slam.process_frame(ff, f.timestamp)
        ffs.append(ff)
    return slam, poses, rig, frames, ffs


def test_map_save_load_roundtrip(tmp_path):
    slam, poses, rig, frames, ffs = _run_slam()
    assert slam.state == INITIALIZED
    p = tmp_path / "map.json"
    mapio.save_map_json(p, slam.keyframes, slam.map)
    kfs, lms = mapio.load_map_json(p)
    assert len(kfs) == len(slam.keyframes)
    assert len(lms) > 50
    # landmark positions survive the roundtrip
    some = next(iter(lms))
    np.testing.assert_allclose(lms[some][0], slam.map.pos[some], atol=1e-5)


def test_graph_log_roundtrip(tmp_path):
    p = tmp_path / "graph_logs.txt"
    w = mapio.GraphLogWriter(p)
    pose = np.eye(4)
    w.pose(0, pose)
    w.landmark(5, np.array([1.0, 2.0, 3.0]))
    w.edge(0, 1, 5, 100.5, 200.25)
    w.imu_raw(0.005, np.array([0.1, 0.2, 0.3]), np.array([9.0, 0.1, 0.2]))
    w.gps(0, np.array([1.0, 2.0, 3.0]), np.array([42.0, -71.0, 10.0]))
    w.loop_pose(8, 2, pose)
    w.loop_measurement(8, 0, 5, 50.0, 60.0)
    w.close()
    logs = mapio.read_graph_logs(p)
    assert logs["x"][0][0] == 0
    assert logs["l"][0][0] == 5
    assert logs["e"][0] == (0, 1, 5, 100.5, 200.25)
    assert abs(logs["imu_raw"][0][0] - 0.005) < 1e-9
    assert logs["g"][0][0] == 0
    assert logs["k"][0][:2] == (8, 2)
    assert logs["m"][0][:3] == (8, 0, 5)


def test_relocalization_against_saved_map(tmp_path, small_vocab):
    slam, poses, rig, frames, ffs = _run_slam(vocab=small_vocab)
    map_path = tmp_path / "map.json"
    db_path = tmp_path / "db.npz"
    mapio.save_map_json(map_path, slam.keyframes, slam.map)
    slam.looper.save_database(db_path)

    from mcslam_tpu.loop.reloc import Relocalizer

    reloc = Relocalizer(small_vocab, rig, map_path, db_path)
    # relocalize a frame the session has seen (use frame 5's features).
    # SLAM world = first-keyframe frame, so expected pose is P0^-1 P5.
    pose = reloc.relocalize(ffs[5])
    assert pose is not None
    expected = np.linalg.inv(poses[0]) @ poses[5]
    err = np.linalg.norm(pose[:3, 3] - expected[:3, 3])
    assert err < 0.1, err


def test_relocalization_navability_map(tmp_path, small_vocab):
    """Relocalize against the external 'navability' two-file JSON schema
    (reference checkRelocalizationNavability, relocalization.cpp:44):
    features.json entries with pos/descriptor/adj_cams + poses.json with
    pos/quat/timestamp — loaded through the alias and driven through the
    same query/verify pipeline."""
    import json

    slam, poses, rig, frames, ffs = _run_slam(vocab=small_vocab)

    # export the live session as a navability map
    features, pose_obj = {}, {}
    for kf in slam.keyframes:
        cam_pose = f"p{kf.kf_id:04d}"
        T = kf.world_T_ref
        from mcslam_tpu.geometry import lie as lie_mod

        q = np.asarray(lie_mod.quat_from_rot(jnp.asarray(T[:3, :3])))
        pose_obj[cam_pose] = {
            "timestamp": float(kf.timestamp),
            "pos": [float(v) for v in T[:3, 3]],
            "quat": [float(v) for v in q],  # [w,x,y,z]
        }
        for m in np.nonzero(kf.lm_id >= 0)[0]:
            lid = int(kf.lm_id[m])
            if not slam.map.valid[lid]:
                continue
            key = f"lm{lid:05d}_{cam_pose}_"
            if key in features:
                continue
            desc_bytes = slam.map.desc[lid].astype(np.uint32).view(np.uint8)
            features[key] = {
                "pos": [float(v) for v in slam.map.pos[lid]],
                "descriptor": [int(b) for b in desc_bytes],
                "adj_cams": [],
            }
    fpath = tmp_path / "session_features.json"
    ppath = tmp_path / "session_poses.json"
    fpath.write_text(json.dumps(features))
    ppath.write_text(json.dumps(pose_obj))

    from mcslam_tpu.loop.reloc import Relocalizer

    reloc = Relocalizer.from_navability(small_vocab, rig, fpath, ppath)
    assert len(reloc.db_bows) > 0  # BoW scoring built from stored descs
    pose = reloc.relocalize(ffs[5])
    assert pose is not None
    expected = np.linalg.inv(poses[0]) @ poses[5]
    err = np.linalg.norm(pose[:3, 3] - expected[:3, 3])
    assert err < 0.1, err


def test_fast_tracking_after_reloc(tmp_path, small_vocab):
    slam, poses, rig, frames, ffs = _run_slam(vocab=small_vocab)
    map_path = tmp_path / "map.json"
    db_path = tmp_path / "db.npz"
    mapio.save_map_json(map_path, slam.keyframes, slam.map)
    slam.looper.save_database(db_path)

    from mcslam_tpu.loop.reloc import Relocalizer
    from mcslam_tpu.loop.tracking import FastTracker

    reloc = Relocalizer(small_vocab, rig, map_path, db_path)
    tracker = FastTracker(reloc)
    # predicted pose = ground truth (in SLAM/first-KF frame) perturbed
    # (IMU prediction stand-in)
    expected = np.linalg.inv(poses[0]) @ poses[6]
    pred = expected.astype(np.float32).copy()
    pred[:3, 3] += np.array([0.05, -0.03, 0.04], np.float32)
    refined = tracker.track(ffs[6], pred)
    assert refined is not None
    err = np.linalg.norm(refined[:3, 3] - expected[:3, 3])
    assert err < 0.05, err


def test_imu_predicted_fast_tracking_survives_shake(tmp_path, small_vocab):
    """Aggressive pan reversals break the constant-velocity prediction
    (per-frame rotation error > FastTracker's 20 px match radius) but the
    preintegrated-IMU prediction follows them (reference
    imu_integrator->predict fast tracking, FrontEnd.cpp:1570,
    mc_slam_app.cpp:480)."""
    from mcslam_tpu.backend.imu import ImuParams
    from mcslam_tpu.loop.reloc import Relocalizer
    from mcslam_tpu.loop.tracking import FastTracker

    rig = synthetic.make_synthetic_rig(
        synthetic.SyntheticRigSpec(num_cams=3, baseline=0.2)
    )
    lms = synthetic.make_landmarks(900, seed=31, depth_range=(5.0, 16.0))
    descs = synthetic.make_descriptors(900, seed=32)

    # ---- session 1: map build over a slow pan sweep starting at
    # identity (so the map frame IS the gravity-aligned world frame) ----
    def roty4(a):
        T = np.eye(4, dtype=np.float32)
        c, s = np.cos(a), np.sin(a)
        T[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        return T

    sweep = [0.0, -0.07, -0.14, -0.2, -0.12, -0.04, 0.05, 0.13, 0.2, 0.1]
    map_poses = np.stack([roty4(a) for a in sweep])
    map_frames = synthetic.render_feature_frames(
        rig, map_poses, lms, descs, kps_per_cam=320, px_noise=0.3,
        desc_bit_noise=5, fps=10.0, seed=33,
    )
    cfg = SlamConfig(window_size=4, ba_obs_capacity=8192, ba_lm_capacity=1024,
                     local_map_landmarks=1024, kf_translation=0.2,
                     kf_rotation=0.04)
    slam = MultiCameraSLAM(rig, cfg, vocab=small_vocab)
    for f in map_frames:
        ff = frame_mod.build_frame_from_keypoints(
            jnp.asarray(f.uv), jnp.asarray(f.desc), jnp.asarray(f.valid),
            rig, max_intra=1024,
        )
        slam.process_frame(ff, f.timestamp)
    assert slam.state == INITIALIZED
    assert slam.stats["keyframes"] >= 3
    map_path = tmp_path / "shake_map.json"
    db_path = tmp_path / "shake_db.npz"
    slam.finalize()
    mapio.save_map_json(map_path, slam.keyframes, slam.map)
    slam.looper.save_database(db_path)

    # ---- session 2: aggressive pan shake with exact IMU ----
    fps = 10.0
    shake_poses, imu_ts, gyro, accel = synthetic.pan_shake_imu(
        num_frames=16, fps=fps, amp=0.2, shake_hz=1.7, stationary_s=0.5,
        accel_noise=2e-3, gyro_noise=2e-4, seed=34,
    )
    shake_frames = synthetic.render_feature_frames(
        rig, shake_poses, lms, descs, kps_per_cam=320, px_noise=0.3,
        desc_bit_noise=5, fps=fps, seed=35,
    )

    def run(with_imu):
        params = ImuParams(accel_noise=2e-3, gyro_noise=2e-4) \
            if with_imu else None
        cfg2 = SlamConfig(window_size=4, ba_obs_capacity=8192,
                          ba_lm_capacity=1024, local_map_landmarks=1024,
                          imu_init_samples=40)
        s2 = MultiCameraSLAM(rig, cfg2, imu_params=params)
        s2.enable_relocalization(
            Relocalizer(small_vocab, rig, map_path, db_path),
            FastTracker(Relocalizer(small_vocab, rig, map_path, db_path)),
        )
        for k, f in enumerate(shake_frames):
            t_prev = (k - 1) / fps if k else -1.0
            sel = (imu_ts > t_prev) & (imu_ts <= f.timestamp)
            ff = frame_mod.build_frame_from_keypoints(
                jnp.asarray(f.uv), jnp.asarray(f.desc), jnp.asarray(f.valid),
                rig, max_intra=1024,
            )
            s2.process_frame(
                ff, f.timestamp,
                imu=(imu_ts[sel], gyro[sel], accel[sel]) if with_imu
                else None,
            )
        return s2.stats

    stats_imu = run(True)
    stats_cv = run(False)
    # IMU prediction holds fast tracking through the shake; constant
    # velocity repeatedly loses it (falls back to global relocalization)
    assert stats_imu["fast_tracked"] >= 10, stats_imu
    assert stats_cv["fast_tracked"] <= stats_imu["fast_tracked"] - 4, (
        stats_cv, stats_imu,
    )
