"""End-to-end visual-inertial (and GPS-fused) SLAM on synthetic data."""

import jax.numpy as jnp
import numpy as np

from mcslam_tpu.backend.imu import ImuParams
from mcslam_tpu.data import synthetic
from mcslam_tpu.frontend import frame as frame_mod
from mcslam_tpu.slam import INITIALIZED, MultiCameraSLAM, SlamConfig
from mcslam_tpu.utils import metrics


def _vio_sequence(num_frames=10, fps=20.0, with_gps=False, seed=0):
    """Analytic circular trajectory with exact IMU; feature-level frames."""
    rig = synthetic.make_synthetic_rig(
        synthetic.SyntheticRigSpec(num_cams=3, baseline=0.2)
    )
    poses, imu_ts, gyro, accel = synthetic.analytic_circle_imu(
        num_frames, fps=fps, radius=4.0, omega=0.35,
        accel_noise=2e-3, gyro_noise=2e-4,
        accel_bias=(0.02, -0.01, 0.015), gyro_bias=(0.001, -0.0005, 0.002),
        stationary_s=0.3, ramp_s=0.3,
        seed=seed,
    )
    lms = synthetic.make_landmarks(900, seed=seed + 1, depth_range=(5.0, 16.0))
    descs = synthetic.make_descriptors(900, seed=seed + 2)
    frames = synthetic.render_feature_frames(
        rig, poses, lms, descs, kps_per_cam=320, px_noise=0.3,
        desc_bit_noise=5, fps=fps, seed=seed + 3,
    )
    gps = None
    if with_gps:
        # geodetic fixes along the ENU-rotated trajectory at 5 Hz
        lat0, lon0, alt0 = 42.36, -71.06, 10.0
        from mcslam_tpu.geometry.geodesy import EnuConverter

        conv = EnuConverter(lat0, lon0, alt0)
        fixes_t, fixes_lla = [], []
        for k in range(num_frames):
            t = k / fps
            p = poses[k][:3, 3]
            # invert ENU: approximate with small offsets (meters -> degrees)
            lat = lat0 + p[1] / 110_900.0
            lon = lon0 + p[0] / (110_900.0 * np.cos(np.radians(lat0)))
            alt = alt0 + p[2]
            fixes_t.append(t)
            fixes_lla.append((lat, lon, alt))
        gps = (np.array(fixes_t), np.array(fixes_lla))
    return rig, poses, imu_ts, gyro, accel, frames, gps


# Seed-ensemble canaries: the small noisy scenes here are chaotically
# sensitive to f32 reduction order — three mathematically equivalent
# compilations of the tracking step (scan looped / scan unrolled / refine
# hoisted out of the candidate vmap) measured single-seed ATE 0.079 /
# 0.087 / 0.104 on identical inputs (marginal observations flip across
# the chi2 gate and the discrete inlier set shifts). A single-run bound
# must therefore sit at the equivalence-class ceiling (~0.13), where
# genuine <~30% regressions are invisible, and every program
# restructuring costs a recalibration pass. The MEDIAN over 3 scene
# seeds is stable across equivalent compilations (an order flip moves
# one seed, not the middle of three), so the bounds below are TIGHTER
# than the old single-seed ones while surviving restructurings.


def _run_vio_session(seed, num_frames=16, fps=20.0):
    rig, poses, imu_ts, gyro, accel, frames, _ = _vio_sequence(
        num_frames=num_frames, seed=seed
    )
    imu_params = ImuParams(accel_noise=2e-3, gyro_noise=2e-4)
    cfg = SlamConfig(window_size=4, ba_obs_capacity=8192, ba_lm_capacity=1024,
                     local_map_landmarks=1024, kf_translation=0.15,
                     kf_rotation=0.1, imu_init_samples=40)
    slam = MultiCameraSLAM(rig, cfg, imu_params=imu_params)
    # feed stationary-ish samples first so gravity init happens at frame 0:
    # the analytic trajectory has small accelerations, gravity dominates
    for k, f in enumerate(frames):
        t = k / fps
        t_prev = (k - 1) / fps if k else -1.0
        sel = (imu_ts > t_prev) & (imu_ts <= t)
        ff = frame_mod.build_frame_from_keypoints(
            jnp.asarray(f.uv), jnp.asarray(f.desc), jnp.asarray(f.valid),
            rig, max_intra=1024,
        )
        slam.process_frame(ff, f.timestamp,
                           imu=(imu_ts[sel], gyro[sel], accel[sel]))
    assert slam.imu_initialized
    assert slam.state == INITIALIZED
    assert slam.stats["keyframes"] >= 2
    ts, est = slam.trajectory_arrays()
    # skip the pre-initialization prefix (IMU gravity gate) for ATE
    k0 = 6
    return metrics.ate_rmse(est[k0:], poses[k0:]), slam


def test_vio_pipeline_runs_and_tracks():
    ates = []
    for seed in (0, 11, 22):
        ate, slam = _run_vio_session(seed)
        ates.append(ate)
        # biases were estimated (moved off zero toward truth)
        assert np.linalg.norm(slam.bias) > 1e-4
    med = float(np.median(ates))
    # median-of-3-seeds bound (see ensemble note above); per-seed values
    # under the round-5 looped-scan default: see the assert message
    assert med < 0.11, (med, ates)


def _run_gps_session(seed, fps=20.0):
    rig, poses, imu_ts, gyro, accel, frames, gps = _vio_sequence(
        num_frames=18, with_gps=True, seed=seed
    )
    imu_params = ImuParams(accel_noise=2e-3, gyro_noise=2e-4)
    cfg = SlamConfig(window_size=4, ba_obs_capacity=8192, ba_lm_capacity=1024,
                     local_map_landmarks=1024, kf_translation=0.1,
                     kf_rotation=0.08, imu_init_samples=40)
    slam = MultiCameraSLAM(rig, cfg, imu_params=imu_params,
                           gps_lever_arm=np.zeros(3))
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
    assert slam.state == INITIALIZED
    assert slam.enu_converter is not None
    assert len(slam.kf_gps) >= 1
    ts, est = slam.trajectory_arrays()
    k0 = 6
    return metrics.ate_rmse(est[k0:], poses[k0:])


def test_gps_fused_pipeline():
    ates = [_run_gps_session(seed) for seed in (5, 16, 27)]
    med = float(np.median(ates))
    assert med < 0.11, (med, ates)


def _run_gps_dummy_pair(seed, fps=20.0, num_frames=30,
                        check_structure=False):
    """One degraded-vision low-rate session with and without GPS; returns
    (ate_gps, ate_vio)."""
    rig, poses, imu_ts, gyro, accel, frames, _ = _vio_sequence(
        num_frames=num_frames, seed=seed
    )
    # degrade vision: strong pixel noise -> visible drift without GPS
    lms = synthetic.make_landmarks(900, seed=seed + 1, depth_range=(5.0, 16.0))
    descs = synthetic.make_descriptors(900, seed=seed + 2)
    frames = synthetic.render_feature_frames(
        rig, poses, lms, descs, kps_per_cam=320, px_noise=1.6,
        desc_bit_noise=5, fps=fps, seed=seed + 3,
    )
    # GPS at intra-frame offsets (2 fixes per frame gap): timestamps that
    # can never coincide with a vision keyframe
    lat0, lon0, alt0 = 42.36, -71.06, 10.0
    fixes_t, fixes_lla = [], []
    for k in range(num_frames - 1):
        for frac in (1.0 / 3.0, 2.0 / 3.0):
            t = (k + frac) / fps
            a = (1 - frac) * poses[k][:3, 3] + frac * poses[k + 1][:3, 3]
            lat = lat0 + a[1] / 110_900.0
            lon = lon0 + a[0] / (110_900.0 * np.cos(np.radians(lat0)))
            fixes_t.append(t)
            fixes_lla.append((lat, lon, alt0 + a[2]))
    gps_t, gps_lla = np.array(fixes_t), np.array(fixes_lla)

    imu_params = ImuParams(accel_noise=2e-3, gyro_noise=2e-4)

    # LOW-RATE VISION: only every 3rd frame reaches the front end, while
    # IMU + GPS stream at full rate — GPS fixes in the 150 ms vision gaps
    # are exactly what the reference turns into dummy keyframes
    step = 3
    vision_ks = list(range(0, num_frames, step))

    def run(with_gps):
        # gps_min_move at scene scale: the fixes are ~3 cm apart; the
        # reference's 0.5 m car-scale default would reject nearly all of
        # them (and silently turn the GPS factors off)
        cfg = SlamConfig(window_size=4, ba_obs_capacity=8192,
                         ba_lm_capacity=1024, local_map_landmarks=1024,
                         kf_translation=0.1, kf_rotation=0.08,
                         imu_init_samples=40, gps_sigma=0.1,
                         gps_min_move=0.02)
        slam = MultiCameraSLAM(
            rig, cfg, imu_params=imu_params,
            gps_lever_arm=np.zeros(3) if with_gps else None,
        )
        t_prev = -1.0
        for k in vision_ks:
            f = frames[k]
            t = k / fps
            sel = (imu_ts > t_prev) & (imu_ts <= t)
            ff = frame_mod.build_frame_from_keypoints(
                jnp.asarray(f.uv), jnp.asarray(f.desc), jnp.asarray(f.valid),
                rig, max_intra=1024,
            )
            kw = {}
            if with_gps:
                gsel = (gps_t > t_prev) & (gps_t <= t)
                kw["gps"] = (gps_t[gsel], gps_lla[gsel])
            slam.process_frame(
                ff, f.timestamp, imu=(imu_ts[sel], gyro[sel], accel[sel]),
                **kw,
            )
            t_prev = t
        return slam

    slam_gps = run(True)
    assert slam_gps.state == INITIALIZED
    if check_structure:
        # dummy keyframes were created at non-vision timestamps
        assert slam_gps.stats.get("gps_dummy_kfs", 0) >= 1
        dummies = [k for k in slam_gps.keyframes if k.is_dummy]
        assert dummies
        vision_ts = {
            k.timestamp for k in slam_gps.keyframes if not k.is_dummy
        }
        for d in dummies:
            assert d.timestamp not in vision_ts
            assert d.kf_id in slam_gps.kf_gps  # carries a GPS factor

    slam_vio = run(False)
    ts_g, est_g = slam_gps.trajectory_arrays()
    ts_v, est_v = slam_vio.trajectory_arrays()
    gt = poses[vision_ks]
    k0 = 3  # skip the IMU-init prefix
    ate_g = metrics.ate_rmse(est_g[k0:], gt[k0:])
    ate_v = metrics.ate_rmse(est_v[k0:], gt[k0:])
    return ate_g, ate_v


def test_gps_dummy_keyframes_between_vision_kfs():
    """GPS fixes that fall BETWEEN vision keyframes must spawn IMU-predicted
    dummy keyframes carrying GPS factors (reference FrontEnd.cpp:1452-1484,
    Backend.cpp:1610-1642) instead of being dropped; with degraded vision
    the GPS-fused run must beat the vision+IMU-only run ON THE MEDIAN SEED
    (single-seed deltas flip sign across equivalent compilations — see the
    ensemble note above)."""
    deltas, pairs = [], []
    for i, seed in enumerate((7, 18, 29)):
        ate_g, ate_v = _run_gps_dummy_pair(seed, check_structure=(i == 0))
        deltas.append(ate_v - ate_g)
        pairs.append((ate_g, ate_v))
    assert float(np.median(deltas)) > 0.0, pairs


def test_gps_duplicate_timestamps_and_bounded_buffer():
    """Review regressions: (a) duplicated GPS timestamps must not crash
    the dummy-KF scan (tuple sort used to fall through to comparing numpy
    arrays); (b) a vision+GPS session WITHOUT IMU must keep the GPS buffer
    bounded (the attach-path horizon prune)."""
    fps = 20.0
    rig, poses, imu_ts, gyro, accel, frames, gps = _vio_sequence(
        num_frames=16, with_gps=True, seed=11
    )
    gps_t, gps_lla = gps
    # duplicate every fix's timestamp (same t, slightly different lla)
    gps_t2 = np.concatenate([gps_t, gps_t])
    gps_lla2 = np.concatenate([gps_lla, gps_lla + 1e-7])
    order = np.argsort(gps_t2, kind="stable")
    gps_t2, gps_lla2 = gps_t2[order], gps_lla2[order]

    # (a) with IMU: exercises the dummy-KF sorted() path
    cfg = SlamConfig(window_size=4, ba_obs_capacity=8192,
                     ba_lm_capacity=1024, local_map_landmarks=1024,
                     kf_translation=0.1, kf_rotation=0.08,
                     imu_init_samples=40)
    slam = MultiCameraSLAM(rig, cfg,
                           imu_params=ImuParams(accel_noise=2e-3,
                                                gyro_noise=2e-4),
                           gps_lever_arm=np.zeros(3))
    for k, f in enumerate(frames):
        t = k / fps
        t_prev = (k - 1) / fps if k else -1.0
        sel = (imu_ts > t_prev) & (imu_ts <= t)
        gsel = (gps_t2 > t_prev) & (gps_t2 <= t)
        ff = frame_mod.build_frame_from_keypoints(
            jnp.asarray(f.uv), jnp.asarray(f.desc), jnp.asarray(f.valid),
            rig, max_intra=1024,
        )
        slam.process_frame(
            ff, f.timestamp, imu=(imu_ts[sel], gyro[sel], accel[sel]),
            gps=(gps_t2[gsel], gps_lla2[gsel]),
        )
    assert slam.state == INITIALIZED  # no crash through the duplicate sort

    # (b) no IMU: the buffer must stay bounded by the horizon prune once
    # GPS is initialized
    slam2 = MultiCameraSLAM(rig, cfg, gps_lever_arm=np.zeros(3))
    for k, f in enumerate(frames):
        t = k / fps
        t_prev = (k - 1) / fps if k else -1.0
        gsel = (gps_t2 > t_prev) & (gps_t2 <= t)
        ff = frame_mod.build_frame_from_keypoints(
            jnp.asarray(f.uv), jnp.asarray(f.desc), jnp.asarray(f.valid),
            rig, max_intra=1024,
        )
        slam2.process_frame(ff, f.timestamp,
                            gps=(gps_t2[gsel], gps_lla2[gsel]))
    if slam2.gps_initialized:
        # bounded: at most ~1s of fixes (2 per frame duplicated => <= ~50)
        assert len(slam2._gps_buf) <= 60, len(slam2._gps_buf)
