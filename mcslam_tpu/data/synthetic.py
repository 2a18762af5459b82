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


# --------------------------------------------------------------------------
# Hard-mode image rendering: a continuous procedurally-textured world
# (ray-cast cylinder room) + photometric corruption. The blob renderer above
# gives every landmark a clean isolated signature — easy mode for the
# descriptor pipeline. Real scenes are continuous texture under photometric
# nastiness (exposure change, motion blur, sensor noise); the reference's
# accuracy claims are on such data (EuRoC / custom rigs, README.md:241).
# These renderers exist to stress the SAME failure modes synthetically.
# --------------------------------------------------------------------------


def _upsample_bilinear_wrap(g: np.ndarray, H: int, W: int) -> np.ndarray:
    """Bilinear upsample (gh, gw) -> (H, W); wraps horizontally (azimuth
    axis of a cylinder texture), clamps vertically."""
    gh, gw = g.shape
    y = np.linspace(0.0, gh - 1.0, H)
    x = np.arange(W) * (gw / float(W))
    y0 = np.floor(y).astype(np.int64)
    y1 = np.minimum(y0 + 1, gh - 1)
    fy = (y - y0).astype(np.float32)[:, None]
    x0 = np.floor(x).astype(np.int64) % gw
    x1 = (x0 + 1) % gw
    fx = (x - np.floor(x)).astype(np.float32)[None, :]
    top = g[y0][:, x0] * (1 - fx) + g[y0][:, x1] * fx
    bot = g[y1][:, x0] * (1 - fx) + g[y1][:, x1] * fx
    return (top * (1 - fy) + bot * fy).astype(np.float32)


def make_procedural_texture(
    height: int = 512,
    width: int = 4096,
    octaves: int = 6,
    persistence: float = 0.55,
    num_posters: int = 60,
    seed: int = 11,
) -> np.ndarray:
    """Multi-octave value-noise texture with high-contrast 'posters'.

    Pure value noise is statistically self-similar everywhere — weakly
    discriminative for place recognition. Real corridors have distinctive
    objects; `num_posters` random high-contrast patches play that role and
    give BoW retrieval something location-specific to index.
    """
    rng = np.random.RandomState(seed)
    tex = np.zeros((height, width), np.float32)
    amp, norm = 1.0, 0.0
    for o in range(octaves):
        gh = max(2, height >> (octaves - 1 - o))
        gw = max(4, width >> (octaves - 1 - o))
        tex += amp * _upsample_bilinear_wrap(
            rng.rand(gh, gw).astype(np.float32), height, width
        )
        norm += amp
        amp *= persistence
    tex /= norm
    # normalize to full [0.1, 0.9] contrast
    tex = 0.1 + 0.8 * (tex - tex.min()) / max(float(np.ptp(tex)), 1e-6)
    for _ in range(num_posters):
        ph = rng.randint(height // 8, height // 3)
        pw = rng.randint(width // 64, width // 24)
        py = rng.randint(0, height - ph)
        px = rng.randint(0, width - pw)
        kind = rng.randint(3)
        if kind == 0:  # checkerboard
            cell = rng.randint(4, 12)
            yy, xx = np.mgrid[:ph, :pw]
            patch = (((yy // cell) + (xx // cell)) % 2).astype(np.float32)
            patch = 0.15 + 0.7 * patch
        elif kind == 1:  # high-contrast binary noise
            patch = (rng.rand(ph, pw) > 0.5).astype(np.float32)
            patch = 0.1 + 0.8 * patch
        else:  # gradient ramp (horizontal or vertical)
            if rng.rand() > 0.5:
                patch = np.tile(
                    np.linspace(0.1, 0.9, pw, dtype=np.float32), (ph, 1)
                )
            else:
                patch = np.tile(
                    np.linspace(0.1, 0.9, ph, dtype=np.float32)[:, None],
                    (1, pw),
                )
        e = min(px + pw, width)
        tex[py:py + ph, px:e] = patch[:, : e - px]
    return tex


def render_textured_world(
    rig,
    poses: np.ndarray,
    radius: float = 10.0,
    y_floor: float = -2.5,
    y_ceil: float = 2.5,
    tex: np.ndarray | None = None,
    floor_tex: np.ndarray | None = None,
    seed: int = 11,
    return_depth: bool = False,
):
    """Ray-cast a textured cylindrical room: every pixel gets a texture
    sample from the wall (azimuth x height), floor, or ceiling — continuous
    image structure with exact per-pixel ground-truth depth.

    The camera rig moves inside a cylinder of `radius` about the world
    y-axis. Pinhole rigs only (rays from the inverse intrinsics); wall
    texture wraps azimuthally so a closed loop revisits identical texture.

    Returns (F, C, H, W) float32 images in [0, 1]; with `return_depth`,
    also (F, C, H, W) float32 camera-z depth maps (exact — usable as
    ground truth for dense-stereo EPE tests).
    """
    assert rig.dist_model == cam_ops.DIST_NONE, (
        "textured ray-cast renderer supports pinhole rigs only"
    )
    if tex is None:
        tex = make_procedural_texture(seed=seed)
    if floor_tex is None:
        floor_tex = make_procedural_texture(
            height=1024, width=1024, num_posters=12, seed=seed + 1
        )
    th, tw = tex.shape
    fh, fw = floor_tex.shape
    C = rig.num_cams
    w, h = rig.image_size
    fxycxy = np.asarray(rig.fxycxy)
    cam_T_ref = np.asarray(rig.cam_T_ref)
    F = len(poses)
    out = np.zeros((F, C, h, w), np.float32)
    depth = np.zeros((F, C, h, w), np.float32) if return_depth else None

    # pixel-center ray directions in camera frame, one grid per camera
    vv, uu = np.mgrid[:h, :w]
    for c in range(C):
        fx, fy, cx, cy = fxycxy[c]
        d_cam = np.stack(
            [(uu - cx) / fx, (vv - cy) / fy, np.ones_like(uu, np.float64)],
            axis=-1,
        )  # (h, w, 3); t along this ray == camera z-depth
        for k in range(F):
            cTw = cam_T_ref[c] @ np.linalg.inv(poses[k])
            wTc = np.linalg.inv(cTw)
            o = wTc[:3, 3]
            d = d_cam @ wTc[:3, :3].T  # (h, w, 3) world-frame directions
            dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
            # wall: |o_xz + t d_xz| = radius (origin inside -> one + root)
            a = dx * dx + dz * dz
            b = 2.0 * (o[0] * dx + o[2] * dz)
            cq = o[0] * o[0] + o[2] * o[2] - radius * radius
            disc = np.maximum(b * b - 4.0 * a * cq, 0.0)
            t_wall = (-b + np.sqrt(disc)) / np.maximum(2.0 * a, 1e-12)
            y_hit = o[1] + t_wall * dy
            # plane hits (only meaningful when the wall hit leaves the span)
            with np.errstate(divide="ignore", invalid="ignore"):
                t_floor = (y_floor - o[1]) / dy
                t_ceil = (y_ceil - o[1]) / dy
            use_floor = y_hit < y_floor
            use_ceil = y_hit > y_ceil
            t = np.where(use_floor, t_floor,
                         np.where(use_ceil, t_ceil, t_wall))
            t = np.maximum(t, 1e-3)
            p = o[None, None, :] + t[..., None] * d
            img = np.empty((h, w), np.float32)
            # wall sample: u = azimuth (wrap), v = height span
            az = np.arctan2(p[..., 0], -p[..., 2])  # [-pi, pi)
            tu = (az / (2.0 * np.pi) + 0.5) * tw
            tv = (p[..., 1] - y_floor) / (y_ceil - y_floor) * (th - 1)
            wall_val = _sample_bilinear_wrap(tex, tv, tu)
            # floor/ceiling sample: tiled world x,z
            fu = (p[..., 0] % 8.0) / 8.0 * (fw - 1)
            fv = (p[..., 2] % 8.0) / 8.0 * (fh - 1)
            plane_val = _sample_bilinear_clamp(floor_tex, fv, fu)
            img = np.where(use_floor | use_ceil, plane_val, wall_val)
            out[k, c] = img
            if return_depth:
                depth[k, c] = t.astype(np.float32)
    if return_depth:
        return out, depth
    return out


def _sample_bilinear_wrap(tex, v, u):
    """Bilinear sample; u wraps, v clamps. v/u in texel units."""
    th, tw = tex.shape
    v = np.clip(v, 0.0, th - 1.0)
    v0 = np.floor(v).astype(np.int64)
    v1 = np.minimum(v0 + 1, th - 1)
    fv = (v - v0).astype(np.float32)
    u0 = np.floor(u).astype(np.int64) % tw
    u1 = (u0 + 1) % tw
    fu = (u - np.floor(u)).astype(np.float32)
    top = tex[v0, u0] * (1 - fu) + tex[v0, u1] * fu
    bot = tex[v1, u0] * (1 - fu) + tex[v1, u1] * fu
    return top * (1 - fv) + bot * fv


def _sample_bilinear_clamp(tex, v, u):
    th, tw = tex.shape
    v = np.clip(v, 0.0, th - 1.0)
    u = np.clip(u, 0.0, tw - 1.0)
    v0 = np.floor(v).astype(np.int64)
    v1 = np.minimum(v0 + 1, th - 1)
    u0 = np.floor(u).astype(np.int64)
    u1 = np.minimum(u0 + 1, tw - 1)
    fv = (v - v0).astype(np.float32)
    fu = (u - u0).astype(np.float32)
    top = tex[v0, u0] * (1 - fu) + tex[v0, u1] * fu
    bot = tex[v1, u0] * (1 - fu) + tex[v1, u1] * fu
    return top * (1 - fv) + bot * fv


def apply_photometric(
    imgs: np.ndarray,
    seed: int = 0,
    exposure_flicker: float = 0.2,
    pixel_noise: float = 0.02,
    motion_blur_px: int = 0,
    vignette: float = 0.0,
) -> np.ndarray:
    """Photometric corruption matching real capture pathologies:

    - `exposure_flicker`: per-frame multiplicative gain 2**N(0, sigma)
      (auto-exposure hunting / lighting change). All cameras of a frame
      share the gain (global shutter rig with common AE).
    - `motion_blur_px`: horizontal box blur of this full width (yawing
      camera — the dominant blur direction on a turning rig).
    - `pixel_noise`: additive Gaussian sensor noise, per pixel.
    - `vignette`: radial falloff strength (0 disables).

    Returns a new array, clipped to [0, 1].
    """
    rng = np.random.RandomState(seed)
    F, C, H, W = imgs.shape
    out = imgs.astype(np.float32).copy()
    gains = np.exp2(rng.randn(F) * exposure_flicker)
    if vignette > 0.0:
        yy, xx = np.mgrid[:H, :W]
        r2 = (((xx - W / 2.0) / (W / 2.0)) ** 2
              + ((yy - H / 2.0) / (H / 2.0)) ** 2)
        vig = (1.0 - vignette * r2 / 2.0).astype(np.float32)
    for k in range(F):
        im = out[k] * gains[k]
        if motion_blur_px and motion_blur_px > 1:
            L = int(motion_blur_px)
            pad = np.pad(im, ((0, 0), (0, 0), (L, 0)), mode="edge")
            cs = np.cumsum(pad, axis=-1, dtype=np.float64)
            im = ((cs[..., L:] - cs[..., :-L]) / L).astype(np.float32)
        if vignette > 0.0:
            im = im * vig[None]
        im = im + rng.randn(C, H, W).astype(np.float32) * pixel_noise
        out[k] = im
    return np.clip(out, 0.0, 1.0)
