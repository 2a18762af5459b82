"""Top-level SLAM pipeline: the host-side state machine that sequences the
jitted device kernels (extraction, matching, RANSAC, pose LM, window BA).

Parity (WHAT): FrontEnd::processFrame / trackFrame / initialization /
insertKeyFrame / mapping plus the per-keyframe backend driver
(/root/reference/MCSlam/src/FrontEnd.cpp:991,5956,2481,1808,6421 and
MCApps/src/mc_slam_app.cpp:329 process_frames). The reference couples this
logic to GTSAM/ISAM2 and per-camera threads; here the host only does control
flow and tiny bookkeeping (landmark id tables), while every hot loop runs as
a static-shape jitted kernel batched over cameras / matches / hypotheses.

States mirror the reference INIT_STATE (FrontEndBase.h:15): NOT_INITIALIZED
-> INITIALIZED, with REINITIALIZING after `max_track_failures` consecutive
tracking failures (FrontEnd.cpp:5977-5988).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mcslam_tpu.backend import ba
from mcslam_tpu.frontend import pose_opt, ransac
from mcslam_tpu.frontend.frame import FrameFeatures
from mcslam_tpu.geometry import lie, triangulation
from mcslam_tpu.mapping.landmarks import LandmarkMap
from mcslam_tpu.ops import hamming, match as match_ops

NOT_INITIALIZED = 0
INITIALIZED = 1
REINITIALIZING = 2


@dataclasses.dataclass
class SlamConfig:
    # matching
    inter_max_dist: int = 64
    inter_ratio: float = 0.85
    min_inter_matches: int = 60  # reference FrontEnd.cpp:6029
    # pose estimation
    ransac_hyps: int = 512
    ransac_px: float = 5.0
    min_pose_inliers: int = 10  # reference FrontEnd.cpp:6132
    # keyframe policy (reference FrontEnd.cpp:6169-6175, 6312-6316)
    kf_translation: float = 0.12
    kf_rotation: float = 0.12
    kf_tracked_ratio: float = 0.4
    # local map tracking
    local_map_landmarks: int = 4096
    local_map_radius_px: float = 18.0
    local_map_max_dist: int = 60
    # mapping
    new_lm_min_parallax_cos: float = 0.99998
    min_z: float = 0.5
    max_z: float = 60.0
    # window BA
    window_size: int = 6
    ba_iters: int = 3  # per gate round (x2 rounds); warm-started windows
    ba_iters_cold: int = 8  # first solve after init / reinit / loop closure
    ba_obs_capacity: int = 16384
    ba_lm_capacity: int = 2048
    # loop closure: run the PGO bend only when the trajectory disagrees
    # with the verified loop constraint by more than this (the landmark
    # merge + loop-window BA always run)
    loop_pgo_min_trans: float = 0.2
    loop_pgo_min_rot: float = 0.05
    # suppress repeat closures for this many keyframes after one fires
    loop_cooldown_kfs: int = 8
    # failure handling
    max_track_failures: int = 2  # reference num_trials_to_track
    # async backend: defer BA write-back to the next keyframe (hides the
    # whole solve latency behind tracking; slightly stale corrections)
    async_ba: bool = False
    # inertial
    imu_init_samples: int = 200  # reference collects >= 200 before alignment
    # GPS position measurement sigma [m] (reference reads it from the
    # backend params yaml)
    gps_sigma: float = 0.5


@jax.jit
def _pack_kf(frame: FrameFeatures):
    """Pack every array a Keyframe needs into ONE f32 buffer: keyframe
    construction otherwise costs ~10 separate device->host round trips."""
    C = frame.kp_xy_ud.shape[0]
    M = frame.im_ray_idx.shape[0]
    safe = jnp.maximum(frame.im_ray_idx, 0)
    cam = jnp.arange(C, dtype=jnp.int32)[None, :]
    ray_uv = frame.kp_xy_ud[cam, safe]  # (M, C, 2)
    ray_sig = frame.kp_sigma2[cam, safe]  # (M, C)
    # descriptors travel as two exact u16-in-f32 halves (bitcasting u32 to
    # f32 risks NaN canonicalization corrupting bits in transit)
    desc_lo = (frame.im_desc & jnp.uint32(0xFFFF)).astype(jnp.float32)
    desc_hi = (frame.im_desc >> 16).astype(jnp.float32)
    parts = [
        desc_lo.reshape(-1),
        desc_hi.reshape(-1),
        frame.im_uv_ref.reshape(-1),
        frame.im_anchor_cam.astype(jnp.float32),
        frame.im_valid.astype(jnp.float32),
        frame.im_sigma2,
        frame.im_point3d.reshape(-1),
        frame.im_has_depth.astype(jnp.float32),
        frame.im_ray_idx.astype(jnp.float32).reshape(-1),
        ray_uv.reshape(-1),
        ray_sig.reshape(-1),
    ]
    return jnp.concatenate(parts)


class Keyframe:
    """Host-side keyframe record (small numpy arrays + landmark id table)."""

    is_dummy = False  # GPS dummy keyframes override (no vision content)

    @classmethod
    def dummy(cls, kf_id, timestamp, world_T_ref, num_cams: int,
              num_slots: int):
        """IMU-predicted GPS keyframe with NO vision content (reference
        dummy-KF ctor MultiCameraFrame.cpp:56-75 / insertKeyFrame overload
        FrontEnd.cpp:1452-1484): a pure state node the window BA constrains
        with IMU + GPS factors only."""
        kf = cls.__new__(cls)
        kf.kf_id = kf_id
        kf.timestamp = timestamp
        kf.world_T_ref = np.asarray(world_T_ref, np.float32)
        kf.is_dummy = True
        M, C = num_slots, num_cams
        kf.im_desc = np.zeros((M, 8), np.uint32)
        kf.im_uv = np.zeros((M, 2), np.float32)
        kf.im_anchor_cam = np.zeros(M, np.int32)
        kf.im_valid = np.zeros(M, bool)
        kf.im_sigma2 = np.ones(M, np.float32)
        kf.im_point3d = np.zeros((M, 3), np.float32)
        kf.im_has_depth = np.zeros(M, bool)
        kf.im_ray_idx = np.full((M, C), -1, np.int32)
        kf.ray_uv = np.zeros((M, C, 2), np.float32)
        kf.ray_sigma2 = np.ones((M, C), np.float32)
        kf.ray_valid = np.zeros((M, C), bool)
        kf.lm_id = np.full(M, -1, np.int32)
        kf.d_desc = None
        kf.d_valid = None
        kf._d_lm_id = None
        return kf

    def __init__(self, kf_id, timestamp, world_T_ref, frame: FrameFeatures):
        self.kf_id = kf_id
        self.timestamp = timestamp
        self.world_T_ref = np.asarray(world_T_ref)
        C = frame.kp_xy_ud.shape[0]
        M = frame.im_ray_idx.shape[0]
        v = np.asarray(_pack_kf(frame))  # one fetch
        o = 0

        def take(n, shape=None, dtype=None):
            nonlocal o
            out = v[o : o + n]
            o += n
            if shape is not None:
                out = out.reshape(shape)
            if dtype is not None:
                out = out.astype(dtype)
            return out

        lo = take(M * 8, (M, 8)).astype(np.uint32)
        hi = take(M * 8, (M, 8)).astype(np.uint32)
        self.im_desc = (hi << 16) | lo
        self.im_uv = take(M * 2, (M, 2))
        self.im_anchor_cam = take(M, dtype=np.int32)
        self.im_valid = take(M) > 0.5
        self.im_sigma2 = take(M)
        self.im_point3d = take(M * 3, (M, 3))
        self.im_has_depth = take(M) > 0.5
        self.im_ray_idx = take(M * C, (M, C), np.int32)
        self.ray_uv = take(M * C * 2, (M, C, 2))
        self.ray_sigma2 = take(M * C, (M, C))
        self.ray_valid = self.im_ray_idx >= 0
        self.lm_id = np.full(M, -1, np.int32)
        # device-resident copies for the tracking kernels (descriptors are
        # already on device in the frame; re-uploading every frame costs a
        # tunnel round trip each)
        self.d_desc = frame.im_desc
        self.d_valid = frame.im_valid
        self._d_lm_id = None

    def d_lm_id(self):
        if self._d_lm_id is None:
            import jax.numpy as _jnp

            self._d_lm_id = _jnp.asarray(self.lm_id)
        return self._d_lm_id

    def lm_dirty(self):
        """Call after mutating lm_id so the device copy refreshes lazily."""
        self._d_lm_id = None


# --------------------------------------------------------------------------
# jitted kernels (static shapes)
# --------------------------------------------------------------------------


@jax.jit
def _match_descriptors(desc_a, valid_a, desc_b, valid_b):
    d = hamming.hamming_matrix(desc_a, desc_b)
    return d


@functools.partial(jax.jit, static_argnames=("max_dist", "ratio"))
def _mutual_match(dist, valid_a, valid_b, max_dist: int, ratio: float):
    return match_ops.match_mutual(
        dist, row_mask=valid_a, col_mask=valid_b, max_dist=max_dist, ratio=ratio
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_hyp", "px", "max_dist", "ratio"),
)
def _track_step(
    key, cur_desc, cur_valid, cur_uv, cur_anchor, cur_sigma2, cur_p3d,
    cur_has_depth, prev_desc, prev_valid, prev_lm_id, map_pos, map_valid,
    cam_T_ref_all, fxycxy_all, num_hyp: int, px: float, max_dist: int,
    ratio: float,
):
    """Whole inter-frame tracking step on device: match -> landmark lookup
    (device map mirror) -> robust pose (3D-3D or 2D-3D picked by lax.cond)
    -> motion-only LM. One host fetch for everything downstream."""
    d = hamming.hamming_matrix(cur_desc, prev_desc)
    res = match_ops.match_mutual(
        d, row_mask=cur_valid, col_mask=prev_valid, max_dist=max_dist,
        ratio=ratio,
    )
    lm = jnp.where(res.ok, prev_lm_id[res.idx], -1)
    safe = jnp.maximum(lm, 0)
    with_lm = (lm >= 0) & map_valid[safe]
    lm = jnp.where(with_lm, lm, -1)
    X_world = map_pos[safe]
    cTr = cam_T_ref_all[cur_anchor]
    f = fxycxy_all[cur_anchor]
    mask3d = with_lm & cur_has_depth
    use3d = jnp.sum(mask3d) >= 20

    def kab(_):
        return ransac.ransac_kabsch(
            key, cur_p3d, X_world, cur_uv, cTr, f, mask3d,
            num_hyp=num_hyp, px_thresh=px,
        )

    def pnp(_):
        return ransac.ransac_pnp(
            key, X_world, cur_uv, cTr, f, with_lm,
            num_hyp=max(num_hyp // 2, 64), px_thresh=px,
        )

    rr = jax.lax.cond(use3d, kab, pnp, None)
    ref = pose_opt.optimize_pose(
        rr.world_T_ref, X_world, cur_uv, cTr, f, with_lm & rr.inliers,
        sigma2=cur_sigma2,
    )
    # pack EVERYTHING into one f32 vector: the host<->device tunnel charges
    # a full round trip per fetched buffer, so one buffer = one RTT
    M = lm.shape[0]
    packed = jnp.concatenate([
        ref.world_T_ref.reshape(16),
        jnp.stack([
            ref.num_inliers.astype(jnp.float32),
            jnp.sum(res.ok).astype(jnp.float32),
            with_lm.sum().astype(jnp.float32),
            rr.ok.astype(jnp.float32),
        ]),
        res.ok.astype(jnp.float32),
        res.idx.astype(jnp.float32),
        lm.astype(jnp.float32),
    ])
    return packed


@functools.partial(jax.jit, static_argnames=("image_wh", "radius", "max_dist"))
def _local_map_step(
    T_wr, cand_ids, cand_valid, map_pos, map_desc, im_desc, im_uv, im_anchor,
    im_valid, im_sigma2, cam_T_ref, fxycxy, image_wh, radius: float,
    max_dist: int,
):
    """Local-map tracking fully on device: gather candidate landmarks from
    the HBM mirror, projection-gated matching, pose refine. Returns
    (pose, lm_match ids (M,), inliers (M,)) for one host fetch."""
    lm_pos = map_pos[cand_ids]
    lm_desc = map_desc[cand_ids]
    res = _project_and_match_local(
        T_wr, lm_pos, lm_desc, cand_valid, im_desc, im_uv, im_anchor,
        im_valid, cam_T_ref, fxycxy, image_wh, radius, max_dist,
    )
    lm = jnp.where(res.ok, cand_ids[res.idx], -1)
    sel = lm >= 0
    X_world = map_pos[jnp.maximum(lm, 0)]
    cTr = cam_T_ref[im_anchor]
    f = fxycxy[im_anchor]
    ref = pose_opt.optimize_pose(
        T_wr, X_world, im_uv, cTr, f, sel, sigma2=im_sigma2
    )
    lm_out = jnp.where(ref.inliers, lm, -1)
    # single packed buffer -> single tunnel round trip
    return jnp.concatenate([
        ref.world_T_ref.reshape(16),
        lm_out.astype(jnp.float32),
        ref.inliers.astype(jnp.float32),
    ])


@functools.partial(jax.jit, static_argnames=("radius", "max_dist"))
def _project_and_match_local(
    T_wr, lm_pos, lm_desc, lm_valid, im_desc, im_uv, im_anchor, im_valid,
    cam_T_ref, fxycxy, image_wh, radius: float, max_dist: int,
):
    """Project candidate landmarks into the rig and match to current
    intra-features with a pixel-radius gate (searchLocalMap2 equivalent,
    FrontEnd.cpp:4901)."""
    # landmarks into every camera: (L, C, 2)
    rTw = lie.se3_inverse(T_wr)
    p_ref = lie.se3_apply(rTw, lm_pos)  # (L, 3)
    p_cam = lie.se3_apply(cam_T_ref[None], p_ref[:, None])  # (L, C, 3)
    z = p_cam[..., 2]
    zs = jnp.where(z > 0.05, z, 1.0)
    proj = p_cam[..., :2] / zs[..., None] * fxycxy[None, :, :2] + fxycxy[None, :, 2:]
    w, h = image_wh
    vis = (
        (z > 0.05)
        & (proj[..., 0] >= 0) & (proj[..., 0] < w)
        & (proj[..., 1] >= 0) & (proj[..., 1] < h)
    )  # (L, C)
    # per current feature: its anchor camera's projection of each landmark
    proj_a = proj[:, :, :].transpose(1, 0, 2)[im_anchor]  # (M, L, 2)
    vis_a = vis.transpose(1, 0)[im_anchor]  # (M, L)
    duv = proj_a - im_uv[:, None, :]
    close = (jnp.sum(duv * duv, axis=-1) < radius * radius) & vis_a
    dmat = hamming.hamming_matrix(im_desc, lm_desc)
    res = match_ops.match_one_way(
        dmat,
        row_mask=im_valid,
        col_mask=lm_valid,
        max_dist=max_dist,
        pair_mask=close,
    )
    return res


@jax.jit
def _triangulate_pairs(wTc_rays, uv_rays, f_rays, mask_rays, sigma_rays):
    return triangulation.triangulate_and_refine(
        wTc_rays, uv_rays, f_rays, mask_rays, sigma=sigma_rays,
        min_z=0.1, max_z=100.0,
    )


# --------------------------------------------------------------------------


class MultiCameraSLAM:
    def __init__(self, rig, config: SlamConfig = None, seed: int = 0,
                 vocab=None, loop_config=None, imu_params=None,
                 gps_lever_arm=None):
        self.rig = rig
        self.cfg = config or SlamConfig()
        self.map = LandmarkMap()
        from mcslam_tpu.mapping.device_map import DeviceMap

        self.dmap = DeviceMap(self.map.capacity)  # HBM-resident mirror
        self.keyframes: list[Keyframe] = []
        self.state = NOT_INITIALIZED
        self.track_failures = 0
        self.cur_pose = np.eye(4, dtype=np.float32)
        self.last_pose = np.eye(4, dtype=np.float32)
        self.trajectory: list[tuple[float, np.ndarray]] = []
        self.kf_counter = 0
        self._key = jax.random.PRNGKey(seed)
        self.stats = {"frames": 0, "keyframes": 0, "failures": 0, "loops": 0}
        self._ba_warm = False  # adaptive LM budget: cold until a solve lands
        # map-reuse session state (enable_relocalization)
        self.relocalizer = None
        self.fast_tracker = None
        self._reloc_localized = False
        self._reloc_delta = np.eye(4, dtype=np.float32)
        # optional streaming graph_logs writer (attach_graph_log): imu_raw /
        # g / k / m records are written as they happen (the reference
        # streams them from appendLogs/appendIMUValue/appendGPSValue)
        self.graph_log = None
        from mcslam_tpu.utils.profiling import StageTimers

        # per-stage span timers (reference logs chrono spans per stage)
        self.timers = StageTimers()
        self.looper = None
        if vocab is not None:
            from mcslam_tpu.loop.detector import LoopCloser

            self.looper = LoopCloser(vocab, rig, loop_config, seed=seed + 1)

        # ---- inertial state (reference FrontEnd imu_* members) ----
        self.use_imu = imu_params is not None
        self.imu_params = imu_params
        self.imu_initialized = not self.use_imu
        self._imu_buf = []  # (ts, gyro, accel) pending samples
        self._imu_init_buf = []  # stationary samples for gravity init
        self.bias = np.zeros(6, np.float32)
        self.kf_vel: dict[int, np.ndarray] = {}  # kf_id -> velocity
        self.kf_bias: dict[int, np.ndarray] = {}
        self.kf_time: dict[int, float] = {}
        self._kf_preints: dict[int, object] = {}  # kf_id -> preint from prev KF

        # ---- GPS state (reference gps_initialize_kabsch path) ----
        self.use_gps = gps_lever_arm is not None
        self.gps_lever_arm = (
            np.zeros(3, np.float32) if gps_lever_arm is None
            else np.asarray(gps_lever_arm, np.float32)
        )
        self.enu_converter = None
        self.gps_initialized = False
        self.E_T_V = np.eye(4, dtype=np.float32)  # ENU <- VIO world
        self._gps_buf = []  # (t, enu) pending fixes
        self.kf_gps: dict[int, np.ndarray] = {}  # kf_id -> attached ENU fix

    # -- helpers ----------------------------------------------------------

    def _next_key(self):
        # batch key generation: one split per 1024 frames instead of an
        # eager device op per frame
        if not hasattr(self, "_key_pool") or self._key_cursor >= 1024:
            self._key, sub = jax.random.split(self._key)
            self._key_pool = jax.random.split(sub, 1024)
            self._key_cursor = 0
        k = self._key_pool[self._key_cursor]
        self._key_cursor += 1
        return k

    def _prev_kf(self) -> Optional[Keyframe]:
        """Last VISION keyframe — GPS dummy KFs interleave in the keyframe
        list and must be skipped when picking the tracking reference
        (reference FrontEnd.cpp:5993-6003)."""
        for kf in reversed(self.keyframes):
            if not kf.is_dummy:
                return kf
        return None

    # host map + device mirror kept in lockstep
    def _map_insert(self, pos, desc, normal, kf_id):
        ids = self.map.insert(pos, desc, normal, kf_id)
        self.dmap.upsert(ids, pos=pos, desc=desc, valid=True)
        return ids

    def _map_update_positions(self, ids, new_pos):
        ok = self.map.update_positions(ids, new_pos)
        ids = np.asarray(ids)
        if ok.any():
            self.dmap.upsert(ids[ok], pos=new_pos[ok])

    def _map_delete(self, ids):
        self.map.delete(ids)
        self.dmap.remove(np.asarray(ids, np.int32))

    def _record_pose(self, timestamp):
        self.trajectory.append((timestamp, self.cur_pose.copy()))

    # -- pipeline stages --------------------------------------------------

    def _initialize(self, frame: FrameFeatures, timestamp: float) -> bool:
        """Bootstrap: multi-camera rigs triangulate intra-matches directly
        (reference initialization, FrontEnd.cpp:2481); monocular input uses
        two-view essential-matrix initialization with median-depth scale
        normalization (reference initialization_mono, FrontEnd.cpp:2980 and
        the ==1-camera essential path at :2585-2628)."""
        has_depth = np.asarray(frame.im_has_depth)
        n3d = int(has_depth.sum())
        if n3d < 30:
            return self._initialize_mono(frame, timestamp)
        pose = self.cur_pose  # identity or reinit seed
        kf = Keyframe(self.kf_counter, timestamp, pose, frame)
        sel = np.nonzero(has_depth)[0]
        X_rig = np.asarray(frame.im_point3d)[sel]
        X_world = X_rig @ pose[:3, :3].T + pose[:3, 3]
        desc = np.asarray(frame.im_desc)[sel]
        # viewing normal: from rig center to point
        vd = X_world - pose[:3, 3]
        vd /= np.maximum(np.linalg.norm(vd, axis=-1, keepdims=True), 1e-9)
        ids = self._map_insert(X_world, desc, vd, kf.kf_id)
        kf.lm_id[sel] = ids
        kf.lm_dirty()
        self.keyframes.append(kf)
        self.kf_counter += 1
        self.state = INITIALIZED
        self.stats["keyframes"] += 1
        if self.use_imu:
            self.kf_time[kf.kf_id] = timestamp
            self.kf_vel[kf.kf_id] = np.zeros(3, np.float32)
            self.kf_bias[kf.kf_id] = self.bias.copy()
        return True

    def _initialize_mono(self, frame: FrameFeatures, timestamp: float) -> bool:
        """Two-view monocular bootstrap: essential-matrix RANSAC between a
        stored pending frame and the current one, two-view triangulation of
        inliers, median-depth scale normalization (mono scale is arbitrary;
        reference fixes it the same way, FrontEnd.cpp:2783-2790)."""
        pending = getattr(self, "_mono_pending", None)
        if pending is None:
            self._mono_pending = (frame, timestamp, self.cur_pose.copy())
            return False
        pf, pts_t, p_pose = pending

        dist = _match_descriptors(
            frame.im_desc, frame.im_valid, pf.im_desc, pf.im_valid
        )
        res = _mutual_match(
            dist, frame.im_valid, pf.im_valid,
            self.cfg.inter_max_dist, self.cfg.inter_ratio,
        )
        ok = np.asarray(res.ok)
        idx = np.asarray(res.idx)
        if ok.sum() < 80:
            # lost the anchor frame: restart from the current one
            self._mono_pending = (frame, timestamp, self.cur_pose.copy())
            return False
        f0 = np.asarray(self.rig.fxycxy)[0]
        uv1 = np.asarray(frame.im_uv_ref)
        uv0 = np.asarray(pf.im_uv_ref)[idx]
        # baseline gate: wait until parallax is sufficient for a stable seed
        # map (reference baseline gate, FrontEnd.cpp:2633); KEEP the anchor
        # so the baseline keeps growing
        med_disp = float(np.median(np.linalg.norm((uv1 - uv0)[ok], axis=-1)))
        if med_disp < 25.0:
            return False
        xn1 = (uv1 - f0[2:]) / f0[:2]
        xn0 = (uv0 - f0[2:]) / f0[:2]
        er = ransac.ransac_essential(
            self._next_key(), jnp.asarray(xn0, jnp.float32),
            jnp.asarray(xn1, jnp.float32), jnp.asarray(ok),
            thresh_n=2.0 / float(f0[0]), min_inliers=50,
        )
        if not bool(er.ok):
            self._mono_pending = (frame, timestamp, self.cur_pose.copy())
            return False
        # cur_T_prev with unit translation; world frame anchored at prev
        rel = np.asarray(er.rel_T)  # cam1_T_cam0
        pose0 = p_pose
        pose1 = pose0 @ np.linalg.inv(rel)
        inl = np.asarray(er.inliers) & ok
        # two-view triangulation of the inliers
        M = len(ok)
        wTc = np.stack(
            [np.broadcast_to(pose0, (M, 4, 4)),
             np.broadcast_to(pose1, (M, 4, 4))], axis=1,
        ).astype(np.float32)
        uv2 = np.stack([uv0, uv1], axis=1).astype(np.float32)
        fx2 = np.broadcast_to(f0, (M, 2, 4)).astype(np.float32)
        mask2 = np.broadcast_to(inl[:, None], (M, 2))
        from mcslam_tpu.geometry import triangulation as tri_mod

        X, tri_ok = _triangulate_pairs(
            jnp.asarray(wTc), jnp.asarray(uv2), jnp.asarray(fx2),
            jnp.asarray(mask2), jnp.ones((M, 2), jnp.float32),
        )
        X = np.asarray(X)
        good = np.asarray(tri_ok) & inl
        if good.sum() < 50:
            self._mono_pending = (frame, timestamp, self.cur_pose.copy())
            return False
        # scale: median depth (in the prev camera) -> 4.0 units
        depths = (np.linalg.inv(pose0) @ np.concatenate(
            [X, np.ones((M, 1), np.float32)], axis=1
        ).T).T[:, 2]
        med = np.median(depths[good])
        scale = 4.0 / max(med, 1e-6)
        X = X * scale
        pose1[:3, 3] = pose0[:3, 3] + (pose1[:3, 3] - pose0[:3, 3]) * scale

        kf0 = Keyframe(self.kf_counter, pts_t, pose0, pf)
        self.kf_counter += 1
        kf1 = Keyframe(self.kf_counter, timestamp, pose1, frame)
        self.kf_counter += 1
        sel = np.nonzero(good)[0]
        desc = np.asarray(frame.im_desc)[sel]
        vd = X[sel] - pose1[:3, 3]
        vd /= np.maximum(np.linalg.norm(vd, axis=-1, keepdims=True), 1e-9)
        ids = self._map_insert(X[sel], desc, vd, kf1.kf_id)
        kf1.lm_id[sel] = ids
        kf0.lm_id[idx[sel]] = ids
        kf0.lm_dirty(); kf1.lm_dirty()
        self.keyframes.extend([kf0, kf1])
        self.state = INITIALIZED
        self.stats["keyframes"] += 2
        self.cur_pose = pose1.astype(np.float32)
        self._mono_pending = None
        # polish the seed map immediately: a bad RANSAC draw otherwise
        # poisons everything downstream (two-view BA over the init pair)
        self._run_window_ba()
        self.cur_pose = kf1.world_T_ref.copy()
        if self.use_imu:
            for kf, t in ((kf0, pts_t), (kf1, timestamp)):
                self.kf_time[kf.kf_id] = t
                self.kf_vel[kf.kf_id] = np.zeros(3, np.float32)
                self.kf_bias[kf.kf_id] = self.bias.copy()
        return True

    def _estimate_pose(self, frame: FrameFeatures, kf: Keyframe):
        """Inter-frame matching + robust pose vs the previous keyframe's
        landmarks, as ONE device dispatch chain with a single host fetch
        (each host round trip costs tens of ms through a tunneled TPU).
        Returns (ok, pose, match_result, lm_of_match)."""
        cfg = self.cfg
        with self.timers.span("track.dispatch"):
            packed = _track_step(
                self._next_key(), frame.im_desc, frame.im_valid,
                frame.im_uv_ref, frame.im_anchor_cam, frame.im_sigma2,
                frame.im_point3d, frame.im_has_depth,
                kf.d_desc, kf.d_valid,
                kf.d_lm_id(), self.dmap.pos, self.dmap.valid,
                self.rig.cam_T_ref, self.rig.fxycxy,
                cfg.ransac_hyps, cfg.ransac_px, cfg.inter_max_dist,
                cfg.inter_ratio,
            )
        # single synchronization point (one packed buffer = one round trip)
        with self.timers.span("track.fetch"):
            v = np.asarray(packed)
        pose = v[:16].reshape(4, 4)
        n_inl, n_matches, n_lm, rr_ok = v[16:20]
        M = (len(v) - 20) // 3
        ok = v[20 : 20 + M] > 0.5
        idx = v[20 + M : 20 + 2 * M].astype(np.int32)
        lm_of_match = v[20 + 2 * M :].astype(np.int32)
        if int(n_matches) < cfg.min_inter_matches:
            return False, None, (ok, idx), lm_of_match
        if int(n_lm) < cfg.min_pose_inliers or rr_ok < 0.5:
            return False, None, (ok, idx), lm_of_match
        if int(n_inl) < cfg.min_pose_inliers:
            return False, None, (ok, idx), lm_of_match
        return True, pose.astype(np.float32), (ok, idx), lm_of_match

    def _local_map_candidates(self):
        """Landmark ids seen by recent keyframes (covisible set)."""
        ids = []
        for kf in self.keyframes[-self.cfg.window_size:]:
            ids.append(kf.lm_id[kf.lm_id >= 0])
        if not ids:
            return np.zeros(0, np.int32)
        ids = np.unique(np.concatenate(ids))
        ids = ids[self.map.valid[ids]]
        return ids[: self.cfg.local_map_landmarks]

    def _track_local_map(self, frame: FrameFeatures, pose):
        """Project covisible landmarks, match, refine pose. Returns
        (pose, lm_match (M,) int32, inlier_mask (M,)). Candidate landmark
        data is gathered from the device map mirror (only the id list — a
        few KB — is uploaded), and the whole step fetches once."""
        cfg = self.cfg
        cand = self._local_map_candidates()
        L = cfg.local_map_landmarks
        n = len(cand)
        cand_pad = np.zeros(L, np.int32)
        cand_pad[:n] = cand
        packed = _local_map_step(
            jnp.asarray(pose), jnp.asarray(cand_pad),
            jnp.asarray(np.arange(L) < n),
            self.dmap.pos, self.dmap.desc,
            frame.im_desc, frame.im_uv_ref, frame.im_anchor_cam,
            frame.im_valid, frame.im_sigma2,
            self.rig.cam_T_ref, self.rig.fxycxy, self.rig.image_size,
            cfg.local_map_radius_px, cfg.local_map_max_dist,
        )
        v = np.asarray(packed)
        new_pose = v[:16].reshape(4, 4).astype(np.float32)
        M = (len(v) - 16) // 2
        lm_match = v[16 : 16 + M].astype(np.int32)
        inl = v[16 + M :] > 0.5
        return new_pose, lm_match, inl

    def _need_keyframe(self, pose, n_tracked, n_tracked_prev) -> bool:
        kf = self._prev_kf()
        d = np.linalg.norm(pose[:3, 3] - kf.world_T_ref[:3, 3])
        dR = float(
            np.linalg.norm(
                np.asarray(
                    lie.so3_log(
                        jnp.asarray(kf.world_T_ref[:3, :3].T @ pose[:3, :3])
                    )
                )
            )
        )
        moved = d > self.cfg.kf_translation or dR > self.cfg.kf_rotation
        weak = n_tracked < self.cfg.kf_tracked_ratio * max(n_tracked_prev, 1)
        return moved or weak

    def _insert_keyframe(self, frame: FrameFeatures, timestamp, pose,
                         lm_match, inliers, inter=None):
        cfg = self.cfg
        kf = Keyframe(self.kf_counter, timestamp, pose, frame)
        # attach tracked landmarks
        sel = (lm_match >= 0) & inliers
        kf.lm_id[sel] = lm_match[sel]
        kf.lm_dirty()
        vd = self.map.pos[lm_match[sel]] - pose[:3, 3]
        vd /= np.maximum(np.linalg.norm(vd, axis=-1, keepdims=True), 1e-9)
        self.map.add_observation(lm_match[sel], kf.kf_id, vd)

        # new landmarks from rig depth (un-matched intra features with 3D)
        has_depth = np.asarray(frame.im_has_depth)
        new_sel = has_depth & (kf.lm_id < 0) & np.asarray(frame.im_valid)
        if new_sel.sum() > 0:
            X_rig = np.asarray(frame.im_point3d)[new_sel]
            X_world = X_rig @ pose[:3, :3].T + pose[:3, 3]
            desc = np.asarray(frame.im_desc)[new_sel]
            vd = X_world - pose[:3, 3]
            vd /= np.maximum(np.linalg.norm(vd, axis=-1, keepdims=True), 1e-9)
            ids = self._map_insert(X_world, desc, vd, kf.kf_id)
            kf.lm_id[np.nonzero(new_sel)[0]] = ids
            kf.lm_dirty()

        # two-view landmarks from inter-frame matches without rig depth
        # (reference TriangulateNewLandmarks / mapping, FrontEnd.cpp:6465 —
        # essential for the monocular pipeline where no intra depth exists)
        if inter is not None:
            m_ok, m_idx, prev_kf = inter
            cand = (
                m_ok & (kf.lm_id < 0) & ~has_depth
                & np.asarray(frame.im_valid)
            )
            cand &= prev_kf.lm_id[m_idx] < 0  # new in both frames
            n_new = int(cand.sum())
            if n_new >= 5:
                M = len(cand)
                uv1 = np.asarray(frame.im_uv_ref)
                uv0 = prev_kf.im_uv[m_idx]
                a1 = np.asarray(frame.im_anchor_cam)
                a0 = prev_kf.im_anchor_cam[m_idx]
                ref_T_cam = np.asarray(
                    np.linalg.inv(np.asarray(self.rig.cam_T_ref))
                )
                wTc1 = pose @ ref_T_cam[a1]
                wTc0 = prev_kf.world_T_ref @ ref_T_cam[a0]
                wTc = np.stack([wTc0, wTc1], axis=1).astype(np.float32)
                uv2 = np.stack([uv0, uv1], axis=1).astype(np.float32)
                fmat = np.asarray(self.rig.fxycxy)
                fx2 = np.stack([fmat[a0], fmat[a1]], axis=1).astype(np.float32)
                mask2 = np.broadcast_to(cand[:, None], (M, 2))
                X, tri_ok = _triangulate_pairs(
                    jnp.asarray(wTc), jnp.asarray(uv2), jnp.asarray(fx2),
                    jnp.asarray(mask2), jnp.ones((M, 2), jnp.float32),
                )
                X = np.asarray(X)
                good = np.asarray(tri_ok) & cand
                if good.sum() > 0:
                    gsel = np.nonzero(good)[0]
                    desc = np.asarray(frame.im_desc)[gsel]
                    vd = X[gsel] - pose[:3, 3]
                    vd /= np.maximum(
                        np.linalg.norm(vd, axis=-1, keepdims=True), 1e-9
                    )
                    ids = self._map_insert(X[gsel], desc, vd, kf.kf_id)
                    kf.lm_id[gsel] = ids
                    prev_kf.lm_id[m_idx[gsel]] = ids
                    kf.lm_dirty(); prev_kf.lm_dirty()

        self.keyframes.append(kf)
        self.kf_counter += 1
        self.stats["keyframes"] += 1

        # inertial bookkeeping: preintegrate the span since the previous KF
        if self.use_imu and self.imu_initialized:
            self.kf_time[kf.kf_id] = timestamp
            prev_kfs = [k for k in self.keyframes[:-1]]
            if prev_kfs:
                t_prev = prev_kfs[-1].timestamp
                pre = self._preintegrate_span(t_prev, timestamp)
                if pre is not None:
                    self._kf_preints[kf.kf_id] = (prev_kfs[-1].kf_id, pre)
                # velocity init: finite difference of keyframe positions
                dt = max(timestamp - t_prev, 1e-3)
                v = (pose[:3, 3] - prev_kfs[-1].world_T_ref[:3, 3]) / dt
                self.kf_vel[kf.kf_id] = v.astype(np.float32)
            else:
                self.kf_vel[kf.kf_id] = np.zeros(3, np.float32)
            self.kf_bias[kf.kf_id] = self.bias.copy()
            # drop consumed IMU samples
            self._imu_buf = [s for s in self._imu_buf if s[0] > timestamp - 0.2]

        if self.use_gps:
            self._attach_gps_to_kf(kf)
            self._try_gps_init()

        # loop closure (reference: insertKeyFrame -> callerDetectLoop,
        # FrontEnd.cpp:1849). After a closure the next few keyframes
        # trivially re-detect the same place; re-running the merge + BA +
        # retriangulation every keyframe churns the map for no gain, so
        # closures are suppressed for loop_cooldown_kfs keyframes.
        if self.looper is not None:
            det = self.looper.detect(
                kf, jnp.asarray(kf.im_desc), jnp.asarray(kf.im_valid),
                self.keyframes, self.map,
            )
            cooled = (
                kf.kf_id - getattr(self, "_last_loop_kf", -10**9)
                >= self.cfg.loop_cooldown_kfs
            )
            if det.detected and cooled:
                self._last_loop_kf = kf.kf_id
                self._close_loop(kf, det)

        # window BA
        with self.timers.span("window_ba"):
            self._run_window_ba()

    # -- loop closing ------------------------------------------------------

    def _close_loop(self, kf: Keyframe, det):
        """Merge re-observed landmarks, run SE(3) pose-graph optimization
        over the whole keyframe trajectory, re-anchor landmarks to their
        first-observing keyframe (the reference achieves the same global
        correction through ISAM2 + smart-factor re-triangulation)."""
        from mcslam_tpu.backend import pgo

        # an in-flight window BA linearized at pre-loop poses is invalid
        self._finish_pending_ba()
        self.stats["loops"] += 1
        self._ba_warm = False  # post-loop windows need the full LM budget
        if self.graph_log is not None:
            # 'k' relative pose (match_T_query) + 'm' re-observation records
            # (reference appendLogs loop records, FrontEnd.cpp:7523-7542)
            self.graph_log.loop_pose(kf.kf_id, det.match_kf, det.rel_pose)
            for slot, old_lm in zip(det.query_slots, det.lm_ids):
                self.graph_log.loop_measurement(
                    kf.kf_id, int(kf.im_anchor_cam[slot]), int(old_lm),
                    float(kf.im_uv[slot, 0]), float(kf.im_uv[slot, 1]),
                )
        # 1. merge landmark identities: the query slots re-observe OLD lms.
        # A freshly minted duplicate may be referenced by OTHER keyframes'
        # lm_id tables too (tracked landmarks are multi-KF), so remap
        # cur_lm -> old_lm everywhere BEFORE freeing the slot — otherwise
        # the free list reuses the id and stale references alias an
        # unrelated new landmark.
        remap = {}
        for slot, old_lm in zip(det.query_slots, det.lm_ids):
            cur_lm = int(kf.lm_id[slot])
            if cur_lm >= 0 and cur_lm != old_lm:
                remap[cur_lm] = int(old_lm)
            kf.lm_id[slot] = old_lm
        kf.lm_dirty()
        if remap:
            remap_arr = np.arange(self.map.capacity, dtype=np.int32)
            for cur, old in remap.items():
                remap_arr[cur] = old
            for k in self.keyframes:
                m = k.lm_id >= 0
                if m.any():
                    new_ids = remap_arr[k.lm_id[m]]
                    if np.any(new_ids != k.lm_id[m]):
                        k.lm_id[m] = new_ids
                        k.lm_dirty()
            # merge observation counts, then free the duplicate slots
            for cur, old in remap.items():
                self.map.n_obs[old] += self.map.n_obs[cur]
            self._map_delete(list(remap.keys()))

        # 2. pose graph: odometry edges + the loop edge — but only when the
        # trajectory actually DISAGREES with the loop constraint. The loop
        # edge carries its own verification noise; bending an
        # already-consistent trajectory with it injects that noise (the
        # reference gets this weighting implicitly by adding the loop
        # measurements to the smart factors and letting ISAM2 re-optimize
        # against ALL observations, Backend.cpp:1871-1901 — our landmark
        # merge + loop-window BA below plays that role).
        N = len(self.keyframes)
        poses_old = np.stack([k.world_T_ref for k in self.keyframes])
        match_pose = next(
            k.world_T_ref for k in self.keyframes if k.kf_id == det.match_kf
        )
        pred_query = match_pose @ det.rel_pose  # loop-implied query pose
        delta = np.linalg.inv(kf.world_T_ref) @ pred_query
        d_trans = float(np.linalg.norm(delta[:3, 3]))
        d_rot = float(
            np.arccos(np.clip((np.trace(delta[:3, :3]) - 1) / 2, -1, 1))
        )
        run_pgo = (d_trans > self.cfg.loop_pgo_min_trans
                   or d_rot > self.cfg.loop_pgo_min_rot)
        match_idx = next(
            i for i, k in enumerate(self.keyframes) if k.kf_id == det.match_kf
        )
        if run_pgo:
            E = (N - 1) + 1
            ei = np.arange(N - 1, dtype=np.int32)
            ej = ei + 1
            meas = np.einsum(
                "nij,njk->nik", np.linalg.inv(poses_old[:-1]), poses_old[1:]
            )
            query_idx = N - 1
            edge_i = np.concatenate([ei, [match_idx]]).astype(np.int32)
            edge_j = np.concatenate([ej, [query_idx]]).astype(np.int32)
            edge_meas = np.concatenate([meas, det.rel_pose[None]], axis=0)
            edge_w = np.concatenate([np.ones(N - 1), [float(det.n_inliers)]])
            graph = pgo.PoseGraph(
                poses=jnp.asarray(poses_old, jnp.float32),
                edge_i=jnp.asarray(edge_i),
                edge_j=jnp.asarray(edge_j),
                edge_meas=jnp.asarray(edge_meas, jnp.float32),
                edge_weight=jnp.asarray(edge_w, jnp.float32),
                edge_valid=jnp.ones(E, bool),
                anchor=jnp.asarray(0, jnp.int32),
            )
            if self.rig.num_cams == 1:
                # monocular: scale drifts too — relax over Sim(3) (the rig
                # pipeline is metric, SE(3) suffices there)
                poses7, scales7 = pgo.pgo_solve_sim3(graph, iters=8)
                poses_new = np.asarray(poses7)
                scales = np.asarray(scales7, np.float32)
            else:
                poses_new = np.asarray(pgo.pgo_solve(graph, iters=8))
                scales = np.ones(N, np.float32)
        else:
            # trajectory already satisfies the loop constraint: no rigid
            # bend; the merged observations + loop-window BA below still
            # digest the loop evidence
            poses_new = poses_old
            scales = np.ones(N, np.float32)

        # 3. re-anchor landmarks with their first-observing keyframe,
        # applying the FULL Sim(3) correction of that keyframe:
        #   X_new = s_i * R_new R_old^T (X_old - t_old) + t_new
        # (SE(3) branch has s_i = 1). Dropping the scale leaves map points
        # around scale-drifted keyframes inconsistent with the corrected
        # trajectory (UPDATE_GATE rejections after closure).
        valid_ids = np.nonzero(self.map.valid)[0]
        first = self.map.first_kf[valid_ids]
        # kf_id -> index (vision KFs are appended 1:1)
        id2idx = {k.kf_id: i for i, k in enumerate(self.keyframes)}
        fidx = np.array([id2idx.get(int(f), 0) for f in first])
        R_corr = np.einsum(
            "nij,nkj->nik",
            poses_new[fidx, :3, :3], poses_old[fidx, :3, :3],
        )
        p = self.map.pos[valid_ids] - poses_old[fidx, :3, 3]
        self.map.pos[valid_ids] = (
            scales[fidx, None] * np.einsum("nij,nj->ni", R_corr, p)
            + poses_new[fidx, :3, 3]
        )
        self.dmap.upsert(valid_ids, pos=self.map.pos[valid_ids])
        for i, k in enumerate(self.keyframes):
            k.world_T_ref = poses_new[i]
        self.cur_pose = poses_new[-1].copy()

        # 4. digest the loop evidence in BA (not just the rigid PGO bend):
        # solve a window of [matched old KF] + recent KFs so the merged
        # landmark observations constrain the optimizer directly (reference
        # feeds loop measurements into the smart factors and lets ISAM2
        # re-optimize, Backend.cpp:1871-1901). Gauge clamps the old KF.
        recent = [
            k for k in self.keyframes[-(self.cfg.window_size - 1):]
            if k.kf_id != det.match_kf
        ]
        loop_window = [self.keyframes[match_idx]] + recent
        self._solve_window(loop_window, force_sync=True, allow_vio=False)

        # 5. re-triangulate landmarks from the corrected poses and prune
        # degenerate ones — but ONLY when poses actually moved (reference
        # UpdateVariables_SmartFactors re-triangulates landmarks of KFs
        # that moved > 5mm/1e-6rad, Backend.cpp:3512-3749). When the
        # trajectory was already loop-consistent, re-triangulating would
        # REPLACE BA-refined landmark positions with noisier anchor-ray
        # triangulations.
        if run_pgo:
            self._retriangulate_landmarks()

    def _retriangulate_landmarks(self, min_obs: int = 2, max_rays: int = 4):
        """Re-triangulate every landmark observed by >= min_obs keyframes
        from its observing keyframes' anchor-camera rays; landmarks whose
        re-triangulation is degenerate (chi2 / cheirality / parallax fail)
        are deleted and their keyframe references cleared (reference
        deletes landmarks triangulateSafe marks invalid,
        Backend.cpp:3591-3745). Runs on loop closure — rare — so host-side
        gather cost is acceptable; the triangulation itself is one batched
        device call."""
        lm_p, uv_p, anc_p, sig_p, kfi_p = [], [], [], [], []
        for i, k in enumerate(self.keyframes):
            sel = np.nonzero((k.lm_id >= 0) & k.im_valid)[0]
            lm_p.append(k.lm_id[sel])
            uv_p.append(k.im_uv[sel])
            anc_p.append(k.im_anchor_cam[sel])
            sig_p.append(k.im_sigma2[sel])
            kfi_p.append(np.full(len(sel), i, np.int32))
        if not lm_p:
            return
        lm_all = np.concatenate(lm_p)
        keep = self.map.valid[lm_all]
        lm_all = lm_all[keep]
        uv_all = np.concatenate(uv_p)[keep]
        anc_all = np.concatenate(anc_p)[keep]
        sig_all = np.concatenate(sig_p)[keep]
        kfi_all = np.concatenate(kfi_p)[keep]
        if len(lm_all) == 0:
            return
        order = np.argsort(lm_all, kind="stable")
        lm_s = lm_all[order]
        uniq, starts, counts = np.unique(
            lm_s, return_index=True, return_counts=True
        )
        tgt = counts >= min_obs
        uniq, starts, counts = uniq[tgt], starts[tgt], counts[tgt]
        n = len(uniq)
        if n == 0:
            return
        R = max_rays
        idx_sel = np.zeros((n, R), np.int64)
        ray_mask = np.zeros((n, R), bool)
        for row in range(n):
            s, c = starts[row], counts[row]
            if c <= R:
                idx_sel[row, :c] = order[s : s + c]
                ray_mask[row, :c] = True
            else:
                # widest baseline: first and last observing keyframes
                h1 = R // 2
                idx_sel[row, :h1] = order[s : s + h1]
                idx_sel[row, h1:] = order[s + c - (R - h1) : s + c]
                ray_mask[row] = True
        poses_all = np.stack([k.world_T_ref for k in self.keyframes])
        inv_ctr = np.linalg.inv(np.asarray(self.rig.cam_T_ref))
        anc = anc_all[idx_sel]
        wTc = np.einsum(
            "nrij,nrjk->nrik", poses_all[kfi_all[idx_sel]], inv_ctr[anc]
        ).astype(np.float32)
        uv = uv_all[idx_sel].astype(np.float32)
        f = np.asarray(self.rig.fxycxy)[anc].astype(np.float32)
        sig = np.maximum(sig_all[idx_sel], 1e-3).astype(np.float32)
        # pad rows to a power-of-two bucket so eager jit shapes stay few
        npad = 16
        while npad < n:
            npad *= 2
        def padrows(a):
            out = np.zeros((npad,) + a.shape[1:], a.dtype)
            out[:n] = a
            return out
        X, ok = _triangulate_pairs(
            jnp.asarray(padrows(wTc)), jnp.asarray(padrows(uv)),
            jnp.asarray(padrows(f)), jnp.asarray(padrows(ray_mask)),
            jnp.asarray(padrows(sig)),
        )
        X = np.asarray(X)[:n]
        ok = np.asarray(ok)[:n]
        good = uniq[ok]
        if len(good):
            # direct write: loop corrections legitimately exceed UPDATE_GATE
            self.map.pos[good] = X[ok]
            self.dmap.upsert(good, pos=X[ok])
        bad = uniq[~ok]
        if len(bad):
            drop = np.zeros(self.map.capacity, bool)
            drop[bad] = True
            for k in self.keyframes:
                m = (k.lm_id >= 0) & drop[np.maximum(k.lm_id, 0)]
                if m.any():
                    k.lm_id[m] = -1
                    k.lm_dirty()
            self._map_delete(bad)

    # -- window bundle adjustment ----------------------------------------

    def _run_window_ba(self):
        self._finish_pending_ba()  # consume the previous async solve
        window = self.keyframes[-self.cfg.window_size:]
        self._solve_window(window)

    def _solve_window(self, window, force_sync=False, allow_vio=True):
        """Window BA over an explicit keyframe list (gauge on window[0]).

        _run_window_ba passes the trailing window; _close_loop passes
        [matched old KF] + recent KFs so the loop's merged observations are
        digested by the optimizer itself (reference addLoopClosure feeds
        loop measurements into the smart factors, Backend.cpp:1871-1901)."""
        cfg = self.cfg
        if len(window) < 2:
            return
        K = cfg.window_size
        C = self.rig.num_cams

        # collect landmark ids observed by >= 2 window keyframes
        all_ids = np.concatenate([kf.lm_id[kf.lm_id >= 0] for kf in window])
        uniq, counts = np.unique(all_ids, return_counts=True)
        lm_ids = uniq[(counts >= 2) & self.map.valid[uniq]]
        if len(lm_ids) < 10:
            return
        lm_ids = lm_ids[: cfg.ba_lm_capacity]
        L = cfg.ba_lm_capacity
        # vectorized observation-table assembly (python per-slot loops cost
        # seconds per keyframe on a 1-core host). The table is laid out in
        # K contiguous blocks of Ok = O//K slots, one per window keyframe
        # (kf_blocked layout): ba._assemble then reduces keyframe blocks by
        # plain sums and computes the W cross term K-times cheaper.
        slot_lookup = np.full(self.map.capacity, -1, np.int32)
        slot_lookup[lm_ids] = np.arange(len(lm_ids), dtype=np.int32)
        Ok = cfg.ba_obs_capacity // K
        O = Ok * K  # blocked layout needs O divisible by K
        obs_kf = np.repeat(np.arange(K, dtype=np.int32), Ok)
        obs_cam = np.zeros(O, np.int32)
        obs_lm = np.zeros(O, np.int32)
        obs_uv = np.zeros((O, 2), np.float32)
        obs_s2 = np.ones(O, np.float32)
        obs_val = np.zeros(O, bool)
        n_obs = 0
        for wk, kf in enumerate(window):
            slots = slot_lookup[np.maximum(kf.lm_id, 0)]
            m_ok = (kf.lm_id >= 0) & (slots >= 0)
            mm, cc = np.nonzero(m_ok[:, None] & kf.ray_valid)
            n = min(len(mm), Ok)
            base = wk * Ok
            obs_cam[base:base + n] = cc[:n]
            obs_lm[base:base + n] = slots[mm[:n]]
            obs_uv[base:base + n] = kf.ray_uv[mm[:n], cc[:n]]
            obs_s2[base:base + n] = np.maximum(
                kf.ray_sigma2[mm[:n], cc[:n]], 1e-3
            )
            obs_val[base:base + n] = True
            n_obs += n
        if n_obs < 30:
            return

        obs = ba.BAObservations(
            kf=jnp.asarray(obs_kf),
            cam=jnp.asarray(obs_cam),
            lm=jnp.asarray(obs_lm),
            uv=jnp.asarray(obs_uv),
            sigma2=jnp.asarray(obs_s2),
            valid=jnp.asarray(obs_val),
        )
        poses = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
        kf_valid = np.zeros(K, bool)
        for wk, kf in enumerate(window):
            poses[wk] = kf.world_T_ref
            kf_valid[wk] = True
        lms = np.zeros((L, 3), np.float32)
        lms[: len(lm_ids)] = self.map.pos[lm_ids]
        lm_valid = np.zeros(L, bool)
        lm_valid[: len(lm_ids)] = True

        if allow_vio and self.use_imu and self.imu_initialized:
            self._run_window_ba_vio(window, obs, poses, kf_valid, lms,
                                    lm_valid, lm_ids)
            return

        prior_H = np.zeros((K * 6, K * 6), np.float32)
        # fixed-lag marginalization (vision window): anchor the oldest
        # window pose with the SMOOTHED marginal information carried from
        # the previous solve (reference BatchFixedLagSmoother semantics,
        # OurFixedLagSmoother.h:109-168) instead of a hard identity clamp;
        # gauge observability comes from the propagated old anchor plus a
        # weak regularizer
        vis_marg = getattr(self, "_vis_marg_prior", None)
        if vis_marg is not None and window[0].kf_id == vis_marg[0]:
            prior_H[:6, :6] = (
                np.clip(vis_marg[1], -1e6, 1e6) + np.eye(6) * 1e2
            )
        else:
            prior_H[:6, :6] = np.eye(6) * 1e6  # cold: clamp oldest pose
        problem = ba.BAProblem(
            poses=jnp.asarray(poses),
            landmarks=jnp.asarray(lms),
            lm_valid=jnp.asarray(lm_valid),
            obs=obs,
            cam_T_ref=self.rig.cam_T_ref,
            fxycxy=self.rig.fxycxy,
            prior_H=jnp.asarray(prior_H),
            prior_b=jnp.zeros(K * 6, jnp.float32),
            kf_valid=jnp.asarray(kf_valid),
        )
        # warm windows (previous solve landed, no loop/reinit since) are
        # re-linearizations of an already-converged system: 2-3 LM steps
        # per gate round suffice; cold windows get the full budget
        iters = cfg.ba_iters if self._ba_warm else cfg.ba_iters_cold
        result = ba.ba_solve(problem, iters=iters, kf_blocked=True)
        self._ba_warm = True
        # stash the marginal information of the state that becomes the
        # oldest when the trailing window slides (consumed above)
        if len(window) > 1 and window is not None and not force_sync:
            self._pending_vis_marg = (window[1].kf_id, result)
        # DEFERRED write-back: the solve runs asynchronously on device; its
        # results are fetched at the NEXT keyframe (or at finalize/loop
        # closure), hiding the whole BA latency behind tracking. The
        # reference runs its backend synchronously on the main thread —
        # nothing in the math requires that.
        self._pending_ba = (result, lm_ids, list(window))
        if force_sync or not cfg.async_ba:
            self._finish_pending_ba()

    def _finish_pending_ba(self):
        pending = getattr(self, "_pending_ba", None)
        if pending is None:
            return
        self._pending_ba = None
        result, lm_ids, window = pending
        pm = getattr(self, "_pending_vis_marg", None)
        if pm is not None and pm[1] is result:
            self._pending_vis_marg = None
            blk = np.asarray(result.marginal_H)[6:12, 6:12]
            blk = (blk + blk.T) * 0.5  # kill f32 accumulation asymmetry
            self._vis_marg_prior = (pm[0], blk)
        old_last = window[-1].world_T_ref.copy()
        new_poses = np.asarray(result.poses)
        for wk, kf in enumerate(window):
            kf.world_T_ref = new_poses[wk]
        new_lms = np.asarray(result.landmarks)[: len(lm_ids)]
        self._map_update_positions(lm_ids, new_lms)
        if self.cfg.async_ba:
            # deferred landing: retro-correct every pose recorded since the
            # window's last keyframe by the correction it received
            delta = (new_poses[len(window) - 1] @ np.linalg.inv(old_last))
            t_kf = window[-1].timestamp
            for i in range(len(self.trajectory) - 1, -1, -1):
                t, p = self.trajectory[i]
                if t < t_kf:
                    break
                self.trajectory[i] = (t, (delta @ p).astype(np.float32))
            self.cur_pose = (delta @ self.cur_pose).astype(np.float32)
        else:
            self.cur_pose = window[-1].world_T_ref.copy()

    def _discard_pending_ba(self):
        """Drop an in-flight BA (its linearization is invalidated, e.g. by a
        loop-closure pose-graph correction)."""
        self._pending_ba = None

    def _run_window_ba_vio(self, window, obs, poses, kf_valid, lms, lm_valid,
                           lm_ids):
        """Visual-inertial(-GPS) window BA via ba_vio.vio_solve.

        State frame conversion: SLAM stores world_T_ref(cam0); the inertial
        state is world_T_body = world_T_ref @ inv(body_T_cam0)
        (reference Twb = Twc * Tbc^-1, Backend.cpp:1841).
        """
        from mcslam_tpu.backend import ba_vio

        cfg = self.cfg
        K = cfg.window_size
        body_T_cam0 = np.asarray(self.rig.body_T_cam)[0]  # cam0 -> body
        inv_btc0 = np.linalg.inv(body_T_cam0)

        poses_body = poses.copy()
        vels = np.zeros((K, 3), np.float32)
        biases = np.zeros((K, 6), np.float32)
        for wk, kf in enumerate(window):
            poses_body[wk] = kf.world_T_ref @ inv_btc0
            vels[wk] = self.kf_vel.get(kf.kf_id, np.zeros(3))
            biases[wk] = self.kf_bias.get(kf.kf_id, self.bias)

        # cam_T_body extrinsics for vision residuals
        cam_T_body = np.asarray(
            [np.linalg.inv(np.asarray(self.rig.body_T_cam)[c])
             for c in range(self.rig.num_cams)], np.float32,
        )

        # IMU factors between consecutive window keyframes
        idx_of = {kf.kf_id: wk for wk, kf in enumerate(window)}
        preints, pairs = [], []
        for kf in window[1:]:
            entry = self._kf_preints.get(kf.kf_id)
            if entry is None:
                continue
            prev_id, pre = entry
            if prev_id in idx_of:
                preints.append(pre)
                pairs.append((idx_of[prev_id], idx_of[kf.kf_id]))
        imu_factors = None
        if preints:
            imu_factors = ba_vio.make_imu_factors(
                preints, pairs, capacity=K - 1, params=self.imu_params
            )

        # GPS factors (hold until >= 3 attached fixes, reference
        # Backend.cpp:3070-3087)
        gps_factors = None
        if self.use_gps and self.gps_initialized and len(self.kf_gps) >= 3:
            g_kf, g_enu = [], []
            for kf in window:
                if kf.kf_id in self.kf_gps:
                    g_kf.append(idx_of[kf.kf_id])
                    g_enu.append(self.kf_gps[kf.kf_id])
            if g_kf:
                G = K
                kfa = np.zeros(G, np.int32)
                enua = np.zeros((G, 3), np.float32)
                va = np.zeros(G, bool)
                kfa[: len(g_kf)] = g_kf
                enua[: len(g_kf)] = g_enu
                va[: len(g_kf)] = True
                gps_factors = ba_vio.GpsFactors(
                    kf=jnp.asarray(kfa), enu=jnp.asarray(enua),
                    t_bg=jnp.asarray(self.gps_lever_arm),
                    sigma=jnp.full(G, self.cfg.gps_sigma, jnp.float32),
                    valid=jnp.asarray(va),
                )

        N = K * ba_vio.D + 6
        D = ba_vio.D
        prior_H = np.zeros((N, N), np.float32)
        prior_H[:6, :6] = np.eye(6) * 1e6  # gauge on oldest pose
        # marginalization prior: the previous window's marginal information
        # of the state that is now oldest (fixed-lag semantics; stabilizes
        # velocity/bias which are weakly observable within one window)
        marg = getattr(self, "_marg_prior", None)
        if marg is not None and window[0].kf_id == marg[0]:
            prior_H[6:D, 6:D] += marg[1][6:, 6:]  # vel+bias block
        else:
            prior_H[6:9, 6:9] = np.eye(3) * 1.0
            # bias is weakly observable inside a short window; anchor it at
            # the random-walk scale so it can only drift slowly (the
            # reference gets this from ISAM2's accumulated history)
            prior_H[9:15, 9:15] = np.eye(6) * 1e5
        if gps_factors is None:
            # E_T_V unobserved: clamp it
            prior_H[K * ba_vio.D:, K * ba_vio.D:] = np.eye(6) * 1e8
        else:
            # weak prior keeps E_T_V rotation near its kabsch init
            prior_H[K * ba_vio.D:, K * ba_vio.D:] = np.eye(6) * 1.0

        problem = ba_vio.VioProblem(
            poses=jnp.asarray(poses_body),
            vels=jnp.asarray(vels),
            biases=jnp.asarray(biases),
            landmarks=jnp.asarray(lms),
            lm_valid=jnp.asarray(lm_valid),
            obs=obs,
            cam_T_body=jnp.asarray(cam_T_body),
            fxycxy=self.rig.fxycxy,
            imu=imu_factors,
            gps=gps_factors,
            E_T_V=jnp.asarray(self.E_T_V),
            prior_H=jnp.asarray(prior_H),
            prior_b=jnp.zeros(N, jnp.float32),
            kf_valid=jnp.asarray(kf_valid),
            g_norm=self.imu_params.g_norm,
        )
        iters = cfg.ba_iters if self._ba_warm else cfg.ba_iters_cold
        result = ba_vio.vio_solve(problem, iters=iters)
        self._ba_warm = True

        new_poses_body = np.asarray(result.poses)
        new_vels = np.asarray(result.vels)
        new_biases = np.asarray(result.biases)
        for wk, kf in enumerate(window):
            kf.world_T_ref = (new_poses_body[wk] @ body_T_cam0).astype(
                np.float32
            )
            self.kf_vel[kf.kf_id] = new_vels[wk]
            self.kf_bias[kf.kf_id] = new_biases[wk]
        self.bias = new_biases[len(window) - 1]
        if gps_factors is not None:
            self.E_T_V = np.asarray(result.E_T_V)
        new_lms = np.asarray(result.landmarks)[: len(lm_ids)]
        self._map_update_positions(lm_ids, new_lms)
        self.cur_pose = window[-1].world_T_ref.copy()

        # stash the marginal information of the state that becomes oldest
        # when the window slides next keyframe (fixed-lag marginalization)
        if len(window) >= 2:
            margH = np.asarray(result.marginal_H)
            b0 = 1 * ba_vio.D  # second-oldest state block
            blk = margH[b0 : b0 + ba_vio.D, b0 : b0 + ba_vio.D]
            # cap the prior so stale linearizations cannot over-constrain
            blk = np.clip(blk, -1e6, 1e6)
            self._marg_prior = (window[1].kf_id, blk)

    # -- sensor ingestion ---------------------------------------------------

    def _ingest_imu(self, imu):
        """imu = (ts (S,), gyro (S,3), accel (S,3)) message slice."""
        ts, gyro, accel = imu
        for k in range(len(ts)):
            self._imu_buf.append((float(ts[k]), gyro[k], accel[k]))
            if self.graph_log is not None:
                self.graph_log.imu_raw(float(ts[k]), gyro[k], accel[k])
        if not self.imu_initialized:
            self._imu_init_buf.extend(
                (gyro[k], accel[k]) for k in range(len(ts))
            )
            # reference collects >= 200 samples before gravity alignment
            if len(self._imu_init_buf) >= self.cfg.imu_init_samples:
                from mcslam_tpu.backend import imu as imu_mod

                g = np.stack([s[0] for s in self._imu_init_buf])
                a = np.stack([s[1] for s in self._imu_init_buf])
                R_wb, bias = imu_mod.init_gravity_aligned(
                    jnp.asarray(a, jnp.float32), jnp.asarray(g, jnp.float32),
                    jnp.ones(len(a), bool), self.imu_params,
                )
                self.bias = np.asarray(bias)
                # world frame = gravity-aligned body frame at init
                pose = np.eye(4, dtype=np.float32)
                pose[:3, :3] = np.asarray(R_wb)
                self.cur_pose = pose
                self.imu_initialized = True
                self._imu_buf = [
                    s for s in self._imu_buf if s[0] >= 0
                ]  # keep history

    def _preintegrate_span(self, t0, t1):
        """Preintegrate buffered IMU samples with t0 < ts <= t1."""
        from mcslam_tpu.backend import imu as imu_mod

        sel = [(t, g, a) for (t, g, a) in self._imu_buf if t0 < t <= t1]
        if len(sel) < 3:  # reference imu_message_empty gate
            return None
        ts = np.array([s[0] for s in sel])
        dts = np.diff(ts, prepend=t0)
        dts = np.clip(dts, 1e-4, 0.1).astype(np.float32)
        gyro = np.stack([s[1] for s in sel]).astype(np.float32)
        accel = np.stack([s[2] for s in sel]).astype(np.float32)
        return imu_mod.preintegrate(
            jnp.asarray(dts), jnp.asarray(gyro), jnp.asarray(accel),
            jnp.ones(len(sel), bool), jnp.asarray(self.bias),
            self.imu_params,
        )

    def _ingest_gps(self, gps):
        """gps = (ts (G,), lla (G,3)) geodetic fixes."""
        from mcslam_tpu.geometry.geodesy import EnuConverter

        ts, lla = gps
        for k in range(len(ts)):
            if self.enu_converter is None:
                self.enu_converter = EnuConverter(*lla[k])
            enu = self.enu_converter.to_enu(*lla[k])
            self._gps_buf.append((float(ts[k]), enu))

    def _try_gps_init(self):
        """Umeyama-align buffered fixes to interpolated VIO positions
        (reference gps_initialize_kabsch, >= 15 fix buffer)."""
        if self.gps_initialized or len(self._gps_buf) < 15:
            return
        if len(self.keyframes) < 3:
            return
        kf_ts = np.array([k.timestamp for k in self.keyframes])
        kf_pos = np.stack([k.world_T_ref[:3, 3] for k in self.keyframes])
        pts_v, pts_e = [], []
        for t, enu in self._gps_buf:
            if t < kf_ts[0] or t > kf_ts[-1]:
                continue
            j = int(np.searchsorted(kf_ts, t))
            j = min(max(j, 1), len(kf_ts) - 1)
            a = (t - kf_ts[j - 1]) / max(kf_ts[j] - kf_ts[j - 1], 1e-6)
            pts_v.append((1 - a) * kf_pos[j - 1] + a * kf_pos[j])
            pts_e.append(enu)
        if len(pts_v) < 8:
            return
        from mcslam_tpu.geometry import alignment

        R, t, _ = alignment.kabsch(
            jnp.asarray(np.stack(pts_v), jnp.float32),
            jnp.asarray(np.stack(pts_e), jnp.float32),
        )
        self.E_T_V = np.eye(4, dtype=np.float32)
        self.E_T_V[:3, :3] = np.asarray(R)
        self.E_T_V[:3, 3] = np.asarray(t)
        self.gps_initialized = True

    # merge window: a GPS fix this close to a vision KF is attached to it
    # rather than spawning a dummy KF (reference merges when within 10 ms
    # and no IMU msgs between, Backend.cpp:2699-2741; our frame timestamps
    # are coarser, so the window is wider)
    GPS_MERGE_DT = 0.05

    def _set_kf_gps(self, kf_id: int, enu) -> None:
        self.kf_gps[kf_id] = enu
        if self.graph_log is not None and self.enu_converter is not None:
            self.graph_log.gps(kf_id, enu, self.enu_converter.ref_geodetic)

    def _attach_gps_to_kf(self, kf):
        """Attach a near-simultaneous buffered fix to this vision keyframe
        (reference validGPSmessage gates: in-window, moved >= 0.5 m)."""
        if not self._gps_buf:
            return
        best, best_t, best_dt = None, None, self.GPS_MERGE_DT
        for t, enu in self._gps_buf:
            dt = abs(t - kf.timestamp)
            if dt < best_dt:
                best, best_t, best_dt = enu, t, dt
        if best is not None:
            prev = getattr(self, "_gps_last_enu", None)
            if prev is not None and np.linalg.norm(best - prev) < 0.5:
                return
            self._set_kf_gps(kf.kf_id, best)
            self._gps_last_enu = best
            self._gps_buf = [
                (t, e) for (t, e) in self._gps_buf if t != best_t
            ]

    def _process_gps_dummies(self, t_now: float):
        """Create IMU-predicted dummy keyframes for valid GPS fixes that
        fall BETWEEN vision keyframes (reference FrontEnd.cpp:1452-1484 +
        Backend::addKeyframeGPS(true), Backend.cpp:1610-1642) — without
        them, low-rate vision or vision dropout silently discards GPS
        information. The dummy is a pure state node: the VIO window links
        it to its neighbors with IMU factors and to the fix with a GPS
        factor; it carries no vision observations."""
        if not (self.use_imu and self.imu_initialized
                and self.gps_initialized and self.keyframes):
            return
        from mcslam_tpu.backend import imu as imu_mod

        body_T_cam0 = np.asarray(self.rig.body_T_cam)[0]
        inv_btc0 = np.linalg.inv(body_T_cam0)
        consumed = []
        for t, enu in sorted(self._gps_buf):
            last_kf = self.keyframes[-1]
            if t <= last_kf.timestamp or t > t_now:
                continue
            prev = getattr(self, "_gps_last_enu", None)
            if prev is not None and np.linalg.norm(enu - prev) < 0.5:
                continue  # reference: reject fixes that barely moved
            if t - last_kf.timestamp < self.GPS_MERGE_DT:
                # near-simultaneous with the last keyframe: merge into it
                # (reference change_vision_kf_info, Backend.cpp:2699-2741)
                if last_kf.kf_id not in self.kf_gps:
                    self._set_kf_gps(last_kf.kf_id, enu)
                    self._gps_last_enu = enu
                    consumed.append(t)
                continue
            pre = self._preintegrate_span(last_kf.timestamp, t)
            if pre is None:
                continue  # <3 IMU samples in the gap: no constraint
            state = imu_mod.ImuState(
                world_T_body=jnp.asarray(
                    last_kf.world_T_ref @ inv_btc0, jnp.float32
                ),
                vel=jnp.asarray(
                    self.kf_vel.get(last_kf.kf_id, np.zeros(3)), jnp.float32
                ),
                bias=jnp.asarray(self.bias, jnp.float32),
            )
            pred = imu_mod.predict(state, pre, self.imu_params)
            pose_ref = (
                np.asarray(pred.world_T_body) @ body_T_cam0
            ).astype(np.float32)
            M = last_kf.lm_id.shape[0]
            kf = Keyframe.dummy(
                self.kf_counter, t, pose_ref, self.rig.num_cams, M
            )
            self.kf_counter += 1
            self.keyframes.append(kf)
            self.stats["gps_dummy_kfs"] = (
                self.stats.get("gps_dummy_kfs", 0) + 1
            )
            self.kf_time[kf.kf_id] = t
            self._kf_preints[kf.kf_id] = (last_kf.kf_id, pre)
            self.kf_vel[kf.kf_id] = np.asarray(pred.vel, np.float32)
            self.kf_bias[kf.kf_id] = self.bias.copy()
            self._set_kf_gps(kf.kf_id, enu)
            self._gps_last_enu = enu
            consumed.append(t)
        if consumed:
            self._gps_buf = [
                (t, e) for (t, e) in self._gps_buf if t not in consumed
            ]
            # the new state nodes need the optimizer to see them
            self._run_window_ba()
        # prune fixes that can never attach anymore (post-init only;
        # the Kabsch init needs the full buffer)
        horizon = self.keyframes[-1].timestamp - 1.0
        self._gps_buf = [(t, e) for (t, e) in self._gps_buf if t > horizon]

    # -- main entry -------------------------------------------------------

    def attach_graph_log(self, writer):
        """Stream sensor/loop graph_logs records as they happen (x/l/e
        vision records are dumped at session end by the app); together they
        form the reduced_camera_system replay input (reference
        FrontEnd::appendLogs/appendIMUValue/appendGPSValue,
        FrontEnd.cpp:7415-7542,8355-8372)."""
        self.graph_log = writer

    def enable_relocalization(self, relocalizer, fast_tracker=None):
        """Switch to a map-reuse session (reference relocal app mode,
        mc_slam_app.cpp:347-521): frames are localized against the SAVED
        map instead of building a new one. While lost, every frame queries
        the saved BoW DB + GP3P (checkGlobalRelocalization,
        FrontEnd.cpp:1486); once localized, `fast_tracker` (when given)
        tracks the prior map from the motion-predicted pose per frame
        (startTrackingModule + refinePose, FrontEnd.cpp:1570-1786),
        falling back to global relocalization on loss."""
        self.relocalizer = relocalizer
        self.fast_tracker = fast_tracker
        self.stats.setdefault("relocalizations", 0)
        self.stats.setdefault("fast_tracked", 0)

    def _process_frame_reloc(self, frame: FrameFeatures, timestamp: float,
                             info: dict) -> dict:
        pose = None
        if self._reloc_localized and self.fast_tracker is not None:
            # constant-velocity prediction (the reference predicts with the
            # IMU integrator when available; the motion model is its
            # vision-only equivalent)
            pred = (self.cur_pose @ self._reloc_delta).astype(np.float32)
            with self.timers.span("fast_track"):
                pose = self.fast_tracker.track(frame, pred)
            if pose is not None:
                self.stats["fast_tracked"] += 1
        if pose is None:
            with self.timers.span("relocalize"):
                pose = self.relocalizer.relocalize(frame)
            if pose is not None:
                self.stats["relocalizations"] += 1
                self._reloc_delta = np.eye(4, dtype=np.float32)
        if pose is not None:
            pose = np.asarray(pose, np.float32)
            if self._reloc_localized:
                self._reloc_delta = (
                    np.linalg.inv(self.cur_pose) @ pose
                ).astype(np.float32)
            self.cur_pose = pose
            self._reloc_localized = True
            self.state = INITIALIZED
            info["tracked"] = 1
        else:
            if self._reloc_localized:
                self.stats["failures"] += 1
            self._reloc_localized = False
            self.state = REINITIALIZING
        info["state"] = self.state
        info["relocalized"] = pose is not None
        self._record_pose(timestamp)
        return info

    def process_frame(self, frame: FrameFeatures, timestamp: float,
                      imu=None, gps=None) -> dict:
        """One SLAM step on an already-built FrameFeatures. Returns a stats
        dict for this frame. Optional imu=(ts, gyro, accel) and
        gps=(ts, lla) message slices since the previous frame."""
        cfg = self.cfg
        self.stats["frames"] += 1
        info = {"keyframe": False, "tracked": 0, "state": self.state}

        if imu is not None and self.use_imu:
            self._ingest_imu(imu)
            if not self.imu_initialized:
                # VIO gate: wait for gravity alignment (reference
                # process_frames :336-341)
                self._record_pose(timestamp)
                return info
        if gps is not None and self.use_gps:
            self._ingest_gps(gps)
            if self.state == INITIALIZED:
                # GPS fixes between vision keyframes become IMU-predicted
                # dummy keyframes (reference process_GPS_frames,
                # mc_slam_app.cpp:242-327)
                self._process_gps_dummies(timestamp)

        if self.relocalizer is not None:
            return self._process_frame_reloc(frame, timestamp, info)

        if self.state != INITIALIZED:
            ok = self._initialize(frame, timestamp)
            info["initialized"] = ok
            self._record_pose(timestamp)
            return info

        kf_prev = self._prev_kf()
        with self.timers.span("track"):
            ok, pose, (m_ok, m_idx), lm_of_match = self._estimate_pose(frame, kf_prev)
        if not ok:
            self.track_failures += 1
            self.stats["failures"] += 1
            if self.track_failures >= cfg.max_track_failures:
                self.state = REINITIALIZING
                self.track_failures = 0
                self._ba_warm = False
            self._record_pose(timestamp)
            info["state"] = self.state
            return info
        self.track_failures = 0

        with self.timers.span("local_map"):
            pose, lm_match, inliers = self._track_local_map(frame, pose)
        n_tracked = int(((lm_match >= 0) & inliers).sum())
        info["tracked"] = n_tracked

        self.last_pose = self.cur_pose
        self.cur_pose = pose

        prev_tracked = int((kf_prev.lm_id >= 0).sum())
        if self._need_keyframe(pose, n_tracked, prev_tracked):
            with self.timers.span("keyframe"):
                self._insert_keyframe(
                    frame, timestamp, pose, lm_match, inliers,
                    inter=(m_ok, m_idx, kf_prev),
                )
            info["keyframe"] = True

        self._record_pose(timestamp)
        return info

    # -- outputs ----------------------------------------------------------

    def finalize(self):
        """Flush asynchronous backend work (call before reading poses/map)."""
        self._finish_pending_ba()

    def trajectory_arrays(self):
        self.finalize()
        ts = np.array([t for t, _ in self.trajectory])
        poses = np.stack([p for _, p in self.trajectory])
        return ts, poses

    def write_trajectory(self, path):
        from mcslam_tpu.utils import tum

        ts, poses = self.trajectory_arrays()
        tum.write_tum(path, ts, poses)
