"""Synthetic multi-camera / IMU / GPS sequence generation for tests & benches.

Mirrors the reference's strategy of validating fusion without a physical rig
(simulated IMU/GPS in VideoStreamReader,
/root/reference/MCDataUtils/include/MCDataUtils/VideoStreamReader.h:100-107,
and the graph-log replay harness). Two tiers:

  * feature-level: known landmarks with per-landmark binary descriptors,
    projected into each rig camera with noise -- drives matching, RANSAC,
    BA and the full pipeline deterministically, no images needed;
  * image-level: blob-textured images rendered from the same geometry to
    exercise the ORB extraction kernels end to end.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from mcslam_tpu.geometry import camera as cam_ops


class SyntheticRigSpec(NamedTuple):
    num_cams: int = 4
    image_size: tuple = (640, 480)
    focal: float = 400.0
    baseline: float = 0.12  # spacing between cameras along +x
    dist: tuple | None = None  # distortion coefficients (all cameras)
    dist_model: int | None = None  # camera.DIST_* (requires dist)


def make_synthetic_rig(spec: SyntheticRigSpec = SyntheticRigSpec()):
    n = spec.num_cams
    w, h = spec.image_size
    fxycxy = np.tile(
        np.array([[spec.focal, spec.focal, w / 2.0, h / 2.0]], np.float32), (n, 1)
    )
    cam_T_ref = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    for i in range(n):
        cam_T_ref[i, 0, 3] = -spec.baseline * i  # camera i at +x*i in ref frame
    if spec.dist is not None:
        dist = np.tile(np.asarray(spec.dist, np.float32)[None], (n, 1))
        return cam_ops.make_rig(
            fxycxy, dist=dist, cam_T_ref=cam_T_ref,
            image_size=spec.image_size,
            dist_model=(spec.dist_model if spec.dist_model is not None
                        else cam_ops.DIST_RADTAN),
        )
    return cam_ops.make_rig(
        fxycxy, dist=None, cam_T_ref=cam_T_ref, image_size=spec.image_size
    )


def smooth_trajectory(num_frames: int, radius: float = 4.0, height: float = 0.0,
                      step_angle: float = 0.02, seed: int = 0):
    """World_T_ref poses along a smooth arc (fixed angular step per frame so
    consecutive frames always share most of their field of view).

    Returns (num_frames, 4, 4) float32 with small smooth perturbations.
    """
    rng = np.random.RandomState(seed)
    poses = np.zeros((num_frames, 4, 4), np.float32)
    jitter = rng.randn(num_frames, 3).cumsum(axis=0) * 0.001
    for k in range(num_frames):
        a = step_angle * k
        # camera moves along an arc of radius `radius` centered at origin,
        # always looking roughly at the scene ahead (+z in camera frame)
        pos = np.array(
            [radius * np.sin(a), height + 0.2 * np.sin(2 * a), -radius * np.cos(a)],
            np.float64,
        ) + jitter[k]
        yaw = a  # face tangentially
        cy, sy = np.cos(yaw), np.sin(yaw)
        R = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], np.float64)
        poses[k, :3, :3] = R
        poses[k, :3, 3] = pos
        poses[k, 3, 3] = 1.0
    return poses


def loop_trajectory(num_frames: int, radius: float = 5.0,
                    revisit_frames: int = 6, seed: int = 0,
                    drift: float = 0.0):
    """Closed circular trajectory: the camera rides a circle of `radius`
    facing tangentially (direction of travel) and completes one full turn
    in (num_frames - revisit_frames) frames, then re-traverses the start —
    the geometry loop-closure tests need. Pair with `make_ring_landmarks`.

    Returns (num_frames, 4, 4) world_T_ref float32."""
    rng = np.random.RandomState(seed)
    n_circle = num_frames - revisit_frames
    poses = np.zeros((num_frames, 4, 4), np.float32)
    jitter = rng.randn(num_frames, 3).cumsum(axis=0) * 0.0005
    for k in range(num_frames):
        a = 2.0 * np.pi * k / n_circle
        pos = np.array(
            [radius * np.sin(a), 0.1 * np.sin(3 * a), -radius * np.cos(a)],
            np.float64,
        ) + jitter[k] + drift * k * np.array([0.0, 0.001, 0.0])
        yaw = np.pi / 2 - a  # camera +z along the tangent (travel direction)
        cy, sy = np.cos(yaw), np.sin(yaw)
        R = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], np.float64)
        poses[k, :3, :3] = R
        poses[k, :3, 3] = pos
        poses[k, 3, 3] = 1.0
    return poses


def make_ring_landmarks(num: int, radius: float = 11.0, seed: int = 1,
                        y_spread: float = 4.0, radial_spread: float = 3.0):
    """Landmarks on an annulus around the origin (for `loop_trajectory`:
    a camera riding an inner circle facing tangentially always sees the
    stretch of ring ahead of it)."""
    rng = np.random.RandomState(seed)
    theta = rng.uniform(0, 2 * np.pi, num)
    r = radius + rng.uniform(-radial_spread, radial_spread, num)
    y = rng.uniform(-y_spread / 2, y_spread / 2, num)
    return np.stack(
        [r * np.sin(theta), y, -r * np.cos(theta)], axis=-1
    ).astype(np.float32)


def make_landmarks(num: int, seed: int = 1, depth_range=(4.0, 14.0),
                   spread=(12.0, 6.0)):
    """Landmarks in a slab in front of the trajectory (world frame)."""
    rng = np.random.RandomState(seed)
    x = rng.uniform(-spread[0], spread[0], num)
    y = rng.uniform(-spread[1] / 2, spread[1] / 2, num)
    z = rng.uniform(depth_range[0], depth_range[1], num)
    return np.stack([x, y, z], axis=-1).astype(np.float32)


def make_descriptors(num: int, seed: int = 2):
    """(num, 8) uint32 random 256-bit descriptors."""
    rng = np.random.RandomState(seed)
    return rng.randint(0, 1 << 32, (num, 8), dtype=np.uint64).astype(np.uint32)


def corrupt_descriptors(desc: np.ndarray, bits_to_flip: int, rng) -> np.ndarray:
    """Flip `bits_to_flip` random bits in each descriptor (observation noise)."""
    out = desc.copy()
    n = desc.shape[0]
    for _ in range(bits_to_flip):
        word = rng.randint(0, 8, n)
        bit = rng.randint(0, 32, n).astype(np.uint32)
        out[np.arange(n), word] ^= (np.uint32(1) << bit)
    return out


class FeatureLevelFrame(NamedTuple):
    """Per-camera synthetic observations for one multi-camera frame."""

    uv: np.ndarray  # (C, K, 2) pixel observations (noisy)
    desc: np.ndarray  # (C, K, 8) observed descriptors (bit-noisy)
    lm_id: np.ndarray  # (C, K) int32 true landmark id (for diagnostics)
    valid: np.ndarray  # (C, K) bool
    world_T_ref: np.ndarray  # (4, 4) ground-truth pose
    timestamp: float


def render_feature_frames(
    rig,
    poses: np.ndarray,
    landmarks: np.ndarray,
    descriptors: np.ndarray,
    kps_per_cam: int = 512,
    px_noise: float = 0.4,
    desc_bit_noise: int = 6,
    fps: float = 20.0,
    seed: int = 3,
    max_depth: float = float("inf"),
):
    """Generate a list of FeatureLevelFrame for each pose.

    max_depth bounds landmark visibility (finite-range sensing): landmarks
    farther than this from the camera are not observed."""
    rng = np.random.RandomState(seed)
    C = rig.num_cams
    frames = []
    fxycxy = np.asarray(rig.fxycxy)
    cam_T_ref = np.asarray(rig.cam_T_ref)
    w, h = rig.image_size
    for k, wTr in enumerate(poses):
        uv_all = np.zeros((C, kps_per_cam, 2), np.float32)
        d_all = np.zeros((C, kps_per_cam, 8), np.uint32)
        id_all = np.full((C, kps_per_cam), -1, np.int32)
        v_all = np.zeros((C, kps_per_cam), bool)
        rTw = np.linalg.inv(wTr)
        for c in range(C):
            cTw = cam_T_ref[c] @ rTw
            p = landmarks @ cTw[:3, :3].T + cTw[:3, 3]
            z = p[:, 2]
            uv = p[:, :2] / np.maximum(z[:, None], 1e-6) * fxycxy[c, :2] + fxycxy[c, 2:]
            vis = (z > 0.3) & (z < max_depth) & (uv[:, 0] >= 5) & \
                  (uv[:, 0] < w - 5) & (uv[:, 1] >= 5) & (uv[:, 1] < h - 5)
            vis_idx = np.nonzero(vis)[0]
            rng.shuffle(vis_idx)
            take = vis_idx[:kps_per_cam]
            nk = len(take)
            uv_all[c, :nk] = uv[take] + rng.randn(nk, 2) * px_noise
            d_all[c, :nk] = corrupt_descriptors(
                descriptors[take], desc_bit_noise, rng
            )
            id_all[c, :nk] = take
            v_all[c, :nk] = True
        frames.append(
            FeatureLevelFrame(
                uv=uv_all,
                desc=d_all,
                lm_id=id_all,
                valid=v_all,
                world_T_ref=wTr.astype(np.float32),
                timestamp=k / fps,
            )
        )
    return frames


def render_blob_images(
    rig,
    poses: np.ndarray,
    landmarks: np.ndarray,
    blob_intensity: np.ndarray | None = None,
    seed: int = 4,
    textured: bool = False,
):
    """Image-level rendering: each landmark becomes a small anti-aliased
    square blob; background is low-amplitude noise. (F, C, H, W) float32.

    Projects through the rig's distortion model (fisheye/equidistant rigs
    render correctly). `textured=True` stamps a fixed per-landmark random
    texture instead of a constant intensity, giving each landmark a
    distinctive BRIEF signature (needed for image-level place recognition
    tests; uniform blobs all look alike to a descriptor)."""
    import jax.numpy as _jnp

    rng = np.random.RandomState(seed)
    C = rig.num_cams
    w, h = rig.image_size
    if blob_intensity is None:
        blob_intensity = rng.uniform(0.4, 1.0, len(landmarks)).astype(np.float32)
    tex = None
    if textured:
        tex = rng.uniform(0.25, 1.0, (len(landmarks), 17, 17)).astype(
            np.float32
        )
    fxycxy = np.asarray(rig.fxycxy)
    cam_T_ref = np.asarray(rig.cam_T_ref)
    dist = np.asarray(rig.dist)
    out = np.zeros((len(poses), C, h, w), np.float32)
    base = rng.rand(h, w).astype(np.float32) * 0.02
    for k, wTr in enumerate(poses):
        rTw = np.linalg.inv(wTr)
        for c in range(C):
            cTw = cam_T_ref[c] @ rTw
            p = landmarks @ cTw[:3, :3].T + cTw[:3, 3]
            z = p[:, 2]
            xn = p[:, :2] / np.maximum(z[:, None], 1e-6)
            if rig.dist_model != cam_ops.DIST_NONE:
                xn = np.asarray(cam_ops.distort(
                    _jnp.asarray(xn), _jnp.asarray(dist[c]), rig.dist_model
                ))
            uv = xn * fxycxy[c, :2] + fxycxy[c, 2:]
            img = base.copy()
            vis = (z > 0.3) & (uv[:, 0] >= 4) & (uv[:, 0] < w - 4) & \
                  (uv[:, 1] >= 4) & (uv[:, 1] < h - 4)
            for i in np.nonzero(vis)[0]:
                x, y = int(round(uv[i, 0])), int(round(uv[i, 1]))
                s = max(1, int(round(3.0 * 6.0 / z[i])))
                if textured:
                    s = min(s, 8)  # texture stamps are 17x17
                y0c, y1c = max(y - s, 0), min(y + s + 1, h)
                x0c, x1c = max(x - s, 0), min(x + s + 1, w)
                if textured:
                    patch = tex[i][: y1c - y0c, : x1c - x0c]
                    img[y0c:y1c, x0c:x1c] = patch * blob_intensity[i]
                else:
                    img[y0c:y1c, x0c:x1c] = blob_intensity[i]
            out[k, c] = img
    return out


def _circle_profile(t, omega, t0, ramp):
    """Piecewise yaw profile: stationary until t0, constant angular accel
    ramp of duration `ramp`, then constant rate omega. Returns
    (theta, dtheta, ddtheta) — all exact."""
    t = np.asarray(t, np.float64)
    t1 = t - t0
    if ramp <= 1e-8:  # no ramp: constant rate from t0 on
        theta = np.where(t1 < 0.0, 0.0, omega * t1)
        dtheta = np.where(t1 < 0.0, 0.0, omega)
        return theta, dtheta, np.zeros_like(theta)
    theta = np.where(
        t1 <= 0.0, 0.0,
        np.where(
            t1 < ramp,
            omega * t1 * t1 / (2.0 * ramp),
            omega * (t1 - ramp / 2.0),
        ),
    )
    dtheta = np.where(
        t1 <= 0.0, 0.0, np.where(t1 < ramp, omega * t1 / ramp, omega)
    )
    ddtheta = np.where((t1 > 0.0) & (t1 < ramp), omega / ramp, 0.0)
    return theta, dtheta, ddtheta


def analytic_circle_imu(
    num_frames: int,
    fps: float = 20.0,
    rate_hz: float = 200.0,
    radius: float = 4.0,
    omega: float = 0.3,  # rad/s yaw rate (after ramp)
    accel_noise: float = 0.0,
    gyro_noise: float = 0.0,
    accel_bias=(0.0, 0.0, 0.0),
    gyro_bias=(0.0, 0.0, 0.0),
    gravity: float = 9.81,
    stationary_s: float = 0.0,  # stationary prefix (gravity/bias init window)
    ramp_s: float = 0.0,  # constant-angular-accel spin-up duration
    seed: int = 5,
):
    """Analytic circular trajectory with EXACT IMU samples.

    Body yaws about +y with the piecewise profile theta(t) (stationary ->
    ramp -> constant rate) while translating along
    p = radius * (sin theta, 0, -cos theta). Velocity and acceleration are
    closed-form derivatives of the profile, so preintegration assumptions
    hold exactly (no finite differences). A stationary prefix matches the
    reference's IMU initialization assumption (collect ~200 still samples).

    Returns (poses (F, 4, 4) at frame times, imu_ts (S,), gyro (S, 3),
    accel (S, 3)); IMU timestamps are interval midpoints.
    """
    rng = np.random.RandomState(seed)
    g_world = np.array([0.0, 0.0, -gravity])

    def roty(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float64)

    t0 = stationary_s

    def state(t):
        th, dth, ddth = _circle_profile(t, omega, t0, max(ramp_s, 1e-9))
        s, c = np.sin(th), np.cos(th)
        p = radius * np.array([s, 0.0, -c])
        dp_dth = radius * np.array([c, 0.0, s])
        d2p_dth2 = radius * np.array([-s, 0.0, c])
        v = dp_dth * dth
        a = d2p_dth2 * dth * dth + dp_dth * ddth
        return roty(th), p, v, a, dth

    poses = np.zeros((num_frames, 4, 4), np.float32)
    for k in range(num_frames):
        R, p, _, _, _ = state(k / fps)
        poses[k, :3, :3] = R
        poses[k, :3, 3] = p
        poses[k, 3, 3] = 1.0

    total_t = (num_frames - 1) / fps
    dt = 1.0 / rate_hz
    n = int(round(total_t / dt))
    ts = (np.arange(n) + 0.5) * dt
    gyro = np.zeros((n, 3))
    accel = np.zeros((n, 3))
    for i, t in enumerate(ts):
        R, _, _, a_world, dth = state(t)
        gyro[i] = np.array([0.0, dth, 0.0]) + np.asarray(gyro_bias) \
            + rng.randn(3) * gyro_noise
        accel[i] = R.T @ (a_world - g_world) + np.asarray(accel_bias) \
            + rng.randn(3) * accel_noise
    return poses, ts, gyro, accel


def pan_shake_imu(
    num_frames: int,
    fps: float = 10.0,
    rate_hz: float = 200.0,
    amp: float = 0.2,  # rad pan amplitude
    shake_hz: float = 1.7,
    accel_noise: float = 0.0,
    gyro_noise: float = 0.0,
    gravity: float = 9.81,
    stationary_s: float = 0.5,
    seed: int = 6,
):
    """Fixed-position pan oscillation (rotation about body +y) with EXACT
    IMU. The direction reversals are aggressive enough that a
    constant-velocity pose prediction misses by ~2x the per-frame rotation
    right after every reversal, while preintegrated-IMU prediction follows
    them — the discriminating workload for IMU-predicted fast tracking
    (reference imu_integrator->predict, FrontEnd.cpp:1570).

    theta(t) = amp * sin(2*pi*shake_hz*(t - stationary_s)) for
    t > stationary_s, else 0. Returns (poses (F,4,4), imu_ts, gyro, accel)
    in the same conventions as analytic_circle_imu (gravity -z world, body
    starts axis-aligned so frame 0 is gravity-aligned).
    """
    rng = np.random.RandomState(seed)
    g_world = np.array([0.0, 0.0, -gravity])
    t0 = stationary_s
    w = 2.0 * np.pi * shake_hz

    def roty(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float64)

    def state(t):
        t1 = t - t0
        th = amp * np.sin(w * t1) if t1 > 0 else 0.0
        dth = amp * w * np.cos(w * t1) if t1 > 0 else 0.0
        return roty(th), dth

    poses = np.zeros((num_frames, 4, 4), np.float32)
    for k in range(num_frames):
        R, _ = state(k / fps)
        poses[k, :3, :3] = R
        poses[k, 3, 3] = 1.0

    total_t = (num_frames - 1) / fps
    dt = 1.0 / rate_hz
    n = int(round(total_t / dt))
    ts = (np.arange(n) + 0.5) * dt
    gyro = np.zeros((n, 3))
    accel = np.zeros((n, 3))
    for i, t in enumerate(ts):
        R, dth = state(t)
        gyro[i] = np.array([0.0, dth, 0.0]) + rng.randn(3) * gyro_noise
        accel[i] = R.T @ (-g_world) + rng.randn(3) * accel_noise
    return poses, ts, gyro, accel


def circle_velocity(t, radius=4.0, omega=0.3, stationary_s=0.0, ramp_s=0.0):
    """Closed-form world velocity of analytic_circle_imu at time t."""
    th, dth, _ = _circle_profile(t, omega, stationary_s, max(ramp_s, 1e-9))
    return radius * dth * np.array([np.cos(th), 0.0, np.sin(th)])
