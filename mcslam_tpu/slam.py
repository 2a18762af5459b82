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
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mcslam_tpu.backend import ba
from mcslam_tpu.backend import imu as imu_mod
from mcslam_tpu.frontend import ransac
from mcslam_tpu.frontend.frame import (
    FrameFeatures, assemble_frame, build_frame,
)
from mcslam_tpu.geometry import lie, triangulation
from mcslam_tpu.mapping.landmarks import LandmarkMap

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
    ransac_hyps: int = 512  # halving to 256 was tried and REVERTED:
    #   the noisy-mono canary (PnP-only regime) fails at 256
    ransac_px: float = 5.0
    min_pose_inliers: int = 10  # reference FrontEnd.cpp:6132
    # search-by-projection gate for inter-frame matching (reference
    # SearchByProjection semantics): landmark-bearing features of the
    # previous keyframe only match current features within this radius of
    # the landmark's projection under the constant-velocity-predicted
    # pose. 0 disables (global all-vs-all matching). On repetitive
    # continuous texture the global match aliases and RANSAC starves
    # (textured-world sessions fail without the gate); on distinctive
    # scenes it is a no-op.
    track_match_radius_px: float = 100.0
    # motion-model fast path (reference structure: TrackWithMotionModel
    # first, sampling-based estimation only on failure): when the refined
    # motion-prediction candidate alone explains >= frac of the landmark
    # matches (and >= min absolute inliers), the Kabsch/PnP RANSAC stages
    # are skipped inside the fused track program (lax.cond) — they are
    # pure insurance on steady frames and cost real device time. Set
    # frac > 1 to force the full portfolio every frame.
    #
    # Threshold calibration (measured on the three canary scenes): at
    # frac=0.6/min=30 the hard textured+photometric drive takes the fast
    # path on 22/34 frames with zero failures and equal ATE (0.297 vs
    # 0.251, bound 1.5), and the VIO blob scene on 11/16 frames at
    # bit-identical ATE. MONOCULAR sessions are the exception: the noisy
    # mono Sim(3) canary lost tracking at both 0.6 and 0.85 (scale drift
    # makes the prediction weak and the PnP candidate is mono's
    # lifeline), so the driver forces the full portfolio whenever
    # rig.num_cams == 1 regardless of this setting.
    track_fastpath_frac: float = 0.6
    track_fastpath_min_inliers: int = 30
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
    # monocular bootstrap (reference baseline gate FrontEnd.cpp:2633 and
    # median-depth scale normalization :2783-2790); the disparity gate is in
    # pixels and should scale with image resolution
    mono_init_min_disparity_px: float = 25.0
    mono_init_scale: float = 4.0
    # 17-pt (non-central relative pose) rig bootstrap: used when intra
    # depth is too thin to triangulate (distant scenery) but the rig has a
    # real lever arm (reference poseFromSeventeenPt, FrontEnd.cpp:4532)
    init17_min_inliers: int = 40
    init17_min_landmarks: int = 30
    init17_max_z: float = 400.0  # distant-scene seed landmarks
    init17_scale_hi: float = 3.0  # |t| search ceiling [m] between init frames
    init17_min_baseline_frac: float = 0.5  # x kf_translation, reference :2633
    # pixel measurement noise sigma for window/global BA (reference backend
    # YAML key MeasurementNoiseSigma, Backend.cpp:24-106; scales the
    # per-observation variance sigma2 = px_sigma^2 * octave^2). Relative
    # reprojection weighting is unchanged; it rebalances vision against
    # priors / IMU / GPS factors and widens the chi2 outlier gate.
    px_sigma: float = 1.0
    # InitCondition=MIN_FEATS (reference frontend YAML, FrontEnd.h:94-97;
    # FrontEnd.cpp:2485-2494 initializes as soon as a frame carries >150
    # intra matches, with no two-view RANSAC bootstrap). False = the
    # RANSAC_FILTER default: direct init from intra depth when available,
    # two-view essential / 17-pt bootstrap otherwise.
    init_min_feats: bool = False
    # window BA
    window_size: int = 6
    # per gate round (x2 rounds) for WARM windows. Round-4 chip sweep
    # (docs/onchip_r04/bisect_ba.out): warm 1x2 solves cost 5.86 ms vs
    # 8.32 ms at 2x2 — a re-linearization of an already-converged window
    # doesn't need the second LM step per round. Accuracy-gated on the
    # full suite (hard-synthetic, VIO seed-ensemble, mono Sim(3), image
    # e2e all within bounds at 1x2).
    ba_iters: int = 1
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
    # global BA after a loop-closure bend: jointly re-optimize ALL
    # keyframes + landmarks (reference ISAM2 re-optimizes the entire graph
    # on closure, Backend.cpp:3060-3267); landmark-sharded across the mesh
    # when one is configured
    global_ba: bool = True
    # batch-LM mode (reference backend YAML Optimization=1,
    # Backend.cpp:3269-3317 runs a full LM batch over the whole graph):
    # approximated by one full global BA at finalize() on top of the
    # windowed solves. Set by slam_config_from_params, off by default.
    final_global_ba: bool = False
    global_ba_max_kfs: int = 64  # even subsample cap; skipped KFs get the
    #   nearest optimized neighbor's correction
    global_ba_lm_capacity: int = 8192
    global_ba_obs_per_kf: int = 512
    global_ba_iters: int = 10
    # failure handling
    max_track_failures: int = 2  # reference num_trials_to_track
    # async backend: defer BA write-back to the next keyframe (hides the
    # whole solve latency behind tracking; slightly stale corrections).
    # Default ON — the reference backend runs in its own thread too
    # (Backend.cpp globalOptimization thread); finalize() flushes.
    async_ba: bool = True
    # Land a deferred solve this many frames after dispatch (rather than
    # at the next keyframe): the solve overlaps the next frame's build and
    # the fetch happens just before its tracking, so tracking always sees
    # the corrected map. Measured on the image-level loop session (every
    # frame a keyframe — the worst case for deferral): async ATE 0.138
    # with next-keyframe landing vs 0.044 with land_frames=1, identical
    # to fully-synchronous. Raise only if a window solve needs more
    # device-side overlap than one frame build provides.
    async_ba_land_frames: int = 1
    # post-loop global BA (~90 ms solve, docs/bench_aux.json) runs
    # deferred: dispatched at closure, landed gba_land_frames frames later
    # (or before the next window solve / loop / finalize). The PGO bend +
    # landmark merge stay synchronous — tracking runs on them meanwhile.
    # The reference stalls its main loop on the equivalent ISAM2
    # full-graph update (Backend.cpp:3060-3267).
    async_gba: bool = True
    gba_land_frames: int = 4
    # inertial
    imu_init_samples: int = 200  # reference collects >= 200 before alignment
    # GPS position measurement sigma [m] (reference reads it from the
    # backend params yaml)
    gps_sigma: float = 0.5
    # minimum ENU displacement [m] before a new fix is accepted (reference
    # validGPSmessage "moved >= 0.5 m" gate — car scale; indoor/small-scale
    # rigs must lower it or nearly every fix is rejected)
    gps_min_move: float = 0.5


import inspect  # noqa: E402

# build_frame's own keyword defaults, used by process_image to parameterize
# the fused frame-build+track program identically to the split path
_BUILD_FRAME_DEFAULTS = {
    k: v.default
    for k, v in inspect.signature(build_frame).parameters.items()
    if v.default is not inspect.Parameter.empty and k != "seg_masks"
}

from mcslam_tpu.keyframe import Keyframe, _pack_kf  # noqa: F401,E402
from mcslam_tpu.tracking_kernels import (  # noqa: F401,E402
    _build_and_track_step, _match_descriptors, _mutual_match,
    _project_and_match_local, _track_and_map_step,
    _triangulate_pairs,
    _triangulate_pairs_far,
)
from mcslam_tpu.driver_loop import LoopClosingMixin  # noqa: E402
from mcslam_tpu.driver_sensors import SensorsMixin  # noqa: E402
from mcslam_tpu.driver_window import WindowBAMixin  # noqa: E402


# --------------------------------------------------------------------------


class MultiCameraSLAM(LoopClosingMixin, WindowBAMixin, SensorsMixin):
    def __init__(self, rig, config: SlamConfig = None, seed: int = 0,
                 vocab=None, loop_config=None, imu_params=None,
                 gps_lever_arm=None, mesh=None):
        """`mesh`: optional jax.sharding.Mesh — window BA solves run
        observation-sharded across it (parallel.sharded_ba) instead of on
        one chip; everything else is unchanged."""
        self.rig = rig
        self.cfg = config or SlamConfig()
        self.mesh = mesh
        # mono guard for the motion fast path (see SlamConfig note): with
        # one camera the prediction is scale-weak and the PnP candidate
        # is the lifeline — always run the full portfolio
        self._fastpath_frac = (
            self.cfg.track_fastpath_frac if rig.num_cams >= 2 else 2.0
        )
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
        # sync-BA countdown: the first window_size solves after construction
        # / reinit / loop closure land synchronously (young geometry)
        self._ba_sync_left = self.cfg.window_size
        # map-reuse session state (enable_relocalization)
        self.relocalizer = None
        self.fast_tracker = None
        self._reloc_localized = False
        self._reloc_delta = np.eye(4, dtype=np.float32)
        self._reloc_prev_ts = None  # last fast-tracked frame timestamp
        self._reloc_vel = np.zeros(3, np.float32)  # world-frame velocity
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
        self.dmap.upsert(ids, pos=pos, desc=desc, valid=True, normal=normal)
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
        if self.cfg.init_min_feats:
            # MIN_FEATS: wait for a frame with >150 triangulated intra
            # matches; no two-view bootstrap (FrontEnd.cpp:2485-2494)
            if n3d <= 150:
                return False
        elif n3d < 30:
            from mcslam_tpu.frontend import seventeen

            if self.rig.num_cams >= 2 and seventeen.is_noncentral(self.rig):
                # rig staring at distant scenery: no intra parallax, but
                # the lever arm still pins metric scale through the
                # non-central relative pose (reference default
                # PoseEstimation SEVENTEEN_PT path)
                return self._initialize_rig_17pt(frame, timestamp)
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
        if med_disp < self.cfg.mono_init_min_disparity_px:
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
        scale = self.cfg.mono_init_scale / max(med, 1e-6)
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

    def _initialize_rig_17pt(self, frame: FrameFeatures, timestamp: float) -> bool:
        """Two-frame rig bootstrap via non-central relative pose: when the
        scene is too distant for intra-camera triangulation, the 17-pt
        family recovers prev_T_cur with METRIC translation from 2D-2D
        matches (reference poseFromSeventeenPt, FrontEnd.cpp:4532, used by
        initialization at :2583), and the seed map comes from two-frame
        triangulation with a relaxed depth ceiling."""
        from mcslam_tpu.frontend import seventeen

        cfg = self.cfg
        pending = getattr(self, "_pending17", None)
        if pending is None:
            self._pending17 = (frame, timestamp, self.cur_pose.copy())
            return False
        pf, pts_t, p_pose = pending

        dist = _match_descriptors(
            frame.im_desc, frame.im_valid, pf.im_desc, pf.im_valid
        )
        res = _mutual_match(
            dist, frame.im_valid, pf.im_valid,
            cfg.inter_max_dist, cfg.inter_ratio,
        )
        ok = np.asarray(res.ok)
        idx = np.asarray(res.idx)
        if ok.sum() < cfg.min_inter_matches:
            self._pending17 = (frame, timestamp, self.cur_pose.copy())
            return False

        uv1 = np.asarray(pf.im_uv_ref)[idx]
        a1 = np.asarray(pf.im_anchor_cam)[idx]
        uv2 = np.asarray(frame.im_uv_ref)
        a2 = np.asarray(frame.im_anchor_cam)
        f1, o1 = seventeen.plucker_rays(
            jnp.asarray(uv1), jnp.asarray(a1), self.rig
        )
        f2, o2 = seventeen.plucker_rays(
            jnp.asarray(uv2), jnp.asarray(a2), self.rig
        )
        mean_f = float(np.mean(np.asarray(self.rig.fxycxy)[:, 0]))
        thr = float(2.0 * (1.0 - np.cos(3.0 / mean_f)))
        sr = seventeen.ransac_seventeen(
            self._next_key(), f1, o1, f2, o2, jnp.asarray(ok),
            angle_thresh=thr, min_inliers=cfg.init17_min_inliers,
            scale_hi=cfg.init17_scale_hi,
        )
        if not bool(sr.ok):
            self._pending17 = (frame, timestamp, self.cur_pose.copy())
            return False
        rel = np.asarray(sr.rel_T)  # prev_T_cur
        # baseline gate (reference initialization, FrontEnd.cpp:2633): a
        # near-zero baseline gives an unconditioned seed map — KEEP the
        # anchor so the baseline keeps growing
        if (
            np.linalg.norm(rel[:3, 3])
            < cfg.init17_min_baseline_frac * cfg.kf_translation
        ):
            return False
        pose0 = p_pose
        pose1 = (pose0 @ rel).astype(np.float32)
        inl = np.asarray(sr.inliers) & ok

        M = len(ok)
        ref_T_cam = np.linalg.inv(np.asarray(self.rig.cam_T_ref))
        wTc0 = pose0 @ ref_T_cam[a1]
        wTc1 = pose1 @ ref_T_cam[a2]
        wTc = np.stack([wTc0, wTc1], axis=1).astype(np.float32)
        uv2s = np.stack([uv1, uv2], axis=1).astype(np.float32)
        fmat = np.asarray(self.rig.fxycxy)
        fx2 = np.stack([fmat[a1], fmat[a2]], axis=1).astype(np.float32)
        mask2 = np.broadcast_to(inl[:, None], (M, 2))
        X, tri_ok = _triangulate_pairs_far(
            jnp.asarray(wTc), jnp.asarray(uv2s), jnp.asarray(fx2),
            jnp.asarray(mask2), jnp.ones((M, 2), jnp.float32),
            cfg.min_z, cfg.init17_max_z,
        )
        X = np.asarray(X)
        good = np.asarray(tri_ok) & inl
        if good.sum() < cfg.init17_min_landmarks:
            self._pending17 = (frame, timestamp, self.cur_pose.copy())
            return False

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
        self.stats["init_17pt"] = self.stats.get("init_17pt", 0) + 1
        self.cur_pose = pose1
        self._pending17 = None
        # polish the seed immediately (two-view BA over the init pair)
        self._run_window_ba()
        self.cur_pose = kf1.world_T_ref.copy()
        if self.use_imu:
            for kf, t in ((kf0, pts_t), (kf1, timestamp)):
                self.kf_time[kf.kf_id] = t
                self.kf_vel[kf.kf_id] = np.zeros(3, np.float32)
                self.kf_bias[kf.kf_id] = self.bias.copy()
        return True

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

    def _predict_pose(self) -> np.ndarray:
        """Pose prediction for the search-by-projection gate and the
        portfolio's motion candidate. With IMU configured and
        gravity-initialized, dead-reckon over the inter-frame span with
        the preintegrator (reference imu_integrator->predict,
        FrontEnd.cpp:1570) — constant velocity misses badly across
        low-rate-vision gaps under acceleration. Otherwise the
        constant-velocity motion model T_pred = T_k (T_{k-1}^-1 T_k)."""
        span = getattr(self, "_pred_span", None)
        if (self.use_imu and self.imu_initialized and span is not None
                and span[1] > span[0]):
            pre = self._preintegrate_span(span[0], span[1])
            if pre is not None:
                body_T_cam0 = np.asarray(self.rig.body_T_cam)[0]
                wTb = (self.cur_pose @ np.linalg.inv(body_T_cam0)).astype(
                    np.float32
                )
                state = imu_mod.ImuState(
                    world_T_body=jnp.asarray(wTb),
                    vel=jnp.asarray(
                        getattr(self, "_track_vel", np.zeros(3, np.float32))
                    ),
                    bias=jnp.asarray(self.bias),
                )
                pred = imu_mod.predict(state, pre, self.imu_params)
                return np.asarray(
                    np.asarray(pred.world_T_body) @ body_T_cam0, np.float32
                )
        delta = np.linalg.inv(self.last_pose) @ self.cur_pose
        return (self.cur_pose @ delta).astype(np.float32)

    def _track_frame_fused(self, frame: FrameFeatures, kf: Keyframe,
                           packed=None):
        """Inter-frame tracking + local-map tracking as ONE dispatch and
        ONE host fetch (_track_and_map_step): through a tunneled TPU each
        fetch costs a ~20 ms round trip, so the split two-step frame paid
        a full extra RTT. Returns (ok, pose, (m_ok, m_idx), lm_of_match,
        lm_match, inliers); when ok is False the local-map section is
        ignored (its compute was speculative).

        `packed`: an already-dispatched result buffer with the same layout
        (the fused frame-build+track program of process_image) — parse it
        instead of dispatching."""
        cfg = self.cfg
        if packed is None:
            cand = self._local_map_candidates()
            L = cfg.local_map_landmarks
            n = len(cand)
            cand_pad = np.zeros(L, np.int32)
            cand_pad[:n] = cand
            with self.timers.span("track.dispatch"):
                packed = _track_and_map_step(
                    self._next_key(), frame.im_desc, frame.im_valid,
                    frame.im_uv_ref, frame.im_anchor_cam, frame.im_sigma2,
                    frame.im_point3d, frame.im_has_depth,
                    *kf.device_desc(),
                    kf.d_lm_id(), self.dmap.pos, self.dmap.valid,
                    self.dmap.desc, self.dmap.normal,
                    jnp.asarray(cand_pad), jnp.asarray(np.arange(L) < n),
                    self.rig.cam_T_ref, self.rig.fxycxy,
                    jnp.asarray(self._predict_pose()),
                    cfg.ransac_hyps, cfg.ransac_px, cfg.inter_max_dist,
                    cfg.inter_ratio, self.rig.image_size,
                    cfg.local_map_radius_px, cfg.local_map_max_dist,
                    cfg.track_match_radius_px,
                    self._fastpath_frac, cfg.track_fastpath_min_inliers,
                )
        with self.timers.span("track.fetch"):
            v = np.asarray(packed)
        M = frame.im_valid.shape[0]
        pose = v[:16].reshape(4, 4)
        n_inl, n_matches, n_lm, rr_ok, fastpath = v[16:21]
        self.stats["track_dispatch"] = self.stats.get("track_dispatch", 0) + 1
        self.stats["track_fastpath"] = (
            self.stats.get("track_fastpath", 0) + int(fastpath > 0.5)
        )
        m_ok = v[21 : 21 + M] > 0.5
        m_idx = v[21 + M : 21 + 2 * M].astype(np.int32)
        lm_of_match = v[21 + 2 * M : 21 + 3 * M].astype(np.int32)
        off = 21 + 3 * M
        lm_pose = v[off : off + 16].reshape(4, 4).astype(np.float32)
        lm_match = v[off + 16 : off + 16 + M].astype(np.int32)
        inliers = v[off + 16 + M :] > 0.5
        ok = not (
            int(n_matches) < cfg.min_inter_matches
            or int(n_lm) < cfg.min_pose_inliers
            or rr_ok < 0.5
            or int(n_inl) < cfg.min_pose_inliers
        )
        if not ok:
            return False, None, (m_ok, m_idx), lm_of_match, lm_match, inliers
        return (True, lm_pose, (m_ok, m_idx), lm_of_match, lm_match,
                inliers)

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
        # keep the device mirror's viewing normal at the running average —
        # the local-map cone gate reads dmap.normal, and a stale
        # first-observation ray rejects valid matches on revisits
        if sel.any():
            self.dmap.upsert(
                lm_match[sel], normal=self.map.normal[lm_match[sel]]
            )

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
        # memory bounding (reference FrontEnd::reset frees KF(n-4)'s
        # images/descriptors): keyframes that left the tracking horizon
        # release their device-resident copies; host arrays stay for loop
        # closure / window BA
        for old in self.keyframes[: -(self.cfg.window_size + 2)]:
            old.release_device()

        # inertial bookkeeping: preintegrate the span since the previous KF
        if self.use_imu and self.imu_initialized:
            self.kf_time[kf.kf_id] = timestamp
            prev_kfs = [k for k in self.keyframes[:-1]]
            if prev_kfs:
                prev = prev_kfs[-1]
                t_prev = prev.timestamp
                pre = self._preintegrate_span(t_prev, timestamp)
                if pre is not None:
                    self._kf_preints[kf.kf_id] = (prev.kf_id, pre)
                # velocity init: IMU propagation of the previous KF's
                # optimized state (reference: the preintegrator's predicted
                # NavState seeds each new state). The old finite difference
                # of positions amplified pixel-scale pose noise by 1/dt —
                # a KF 17 ms after a GPS dummy measured a 5 m/s seed on a
                # 1.4 m/s drive, and the dummy-heavy VIO window diverged
                # from it.
                v = None
                if pre is not None and prev.kf_id in self.kf_vel:
                    body_T_cam0 = np.asarray(self.rig.body_T_cam)[0]
                    state = imu_mod.ImuState(
                        world_T_body=jnp.asarray(
                            prev.world_T_ref @ np.linalg.inv(body_T_cam0),
                            jnp.float32,
                        ),
                        vel=jnp.asarray(self.kf_vel[prev.kf_id], jnp.float32),
                        bias=jnp.asarray(self.bias, jnp.float32),
                    )
                    pred = imu_mod.predict(state, pre, self.imu_params)
                    v = np.asarray(pred.vel, np.float32)
                if v is None:
                    # no usable preintegration: finite difference over a
                    # noise-safe baseline
                    dt = max(timestamp - t_prev, 0.05)
                    v = (
                        (pose[:3, 3] - prev.world_T_ref[:3, 3]) / dt
                    ).astype(np.float32)
                self.kf_vel[kf.kf_id] = v
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
            pred = self._predict_reloc_pose(timestamp)
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
                self._reloc_vel = np.zeros(3, np.float32)
        if pose is not None:
            pose = np.asarray(pose, np.float32)
            if self._reloc_localized:
                self._reloc_delta = (
                    np.linalg.inv(self.cur_pose) @ pose
                ).astype(np.float32)
                if self._reloc_prev_ts is not None:
                    dt = max(timestamp - self._reloc_prev_ts, 1e-3)
                    self._reloc_vel = (
                        (pose[:3, 3] - self.cur_pose[:3, 3]) / dt
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
        self._reloc_prev_ts = timestamp
        self._record_pose(timestamp)
        return info

    def _predict_reloc_pose(self, timestamp: float) -> np.ndarray:
        """Pose prior for fast tracking. With IMU configured and
        gravity-initialized, dead-reckon from the last tracked pose with the
        preintegrator (reference imu_integrator->predict, FrontEnd.cpp:1570,
        driven from mc_slam_app.cpp:480); otherwise the constant-velocity
        motion model. Assumes the loaded map's world frame is gravity-aligned
        (true for maps built by a VIO session), which makes the gravity term
        of the prediction valid."""
        if (self.use_imu and self.imu_initialized
                and self._reloc_prev_ts is not None):
            pre = self._preintegrate_span(self._reloc_prev_ts, timestamp)
            if pre is not None:
                body_T_cam0 = np.asarray(self.rig.body_T_cam)[0]
                wTb = (self.cur_pose @ np.linalg.inv(body_T_cam0)).astype(
                    np.float32
                )
                state = imu_mod.ImuState(
                    world_T_body=jnp.asarray(wTb),
                    vel=jnp.asarray(self._reloc_vel),
                    bias=jnp.asarray(self.bias),
                )
                pred_state = imu_mod.predict(state, pre, self.imu_params)
                return np.asarray(
                    np.asarray(pred_state.world_T_body) @ body_T_cam0,
                    np.float32,
                )
        return (self.cur_pose @ self._reloc_delta).astype(np.float32)

    def process_image(self, imgs, timestamp: float, imu=None, gps=None,
                      seg_masks=None, extract_cfg=None) -> dict:
        """One SLAM step straight from (C, H, W) images. In INITIALIZED
        steady state the frame build (stage A) and the tracking step
        (stage B) run as ONE fused device program with one packed fetch
        (_build_and_track_step): the tunneled TPU charges ~1 ms of
        dispatch floor plus an HBM round trip per program boundary, so
        the split A/B structure paid both every frame. Outside steady
        state (init, reinit, relocalization, seg-mask veto, VIO gravity
        wait) it falls back to build_frame + process_frame, which is
        behaviorally identical.

        extract_cfg: build_frame keyword overrides (num_points,
        num_levels, max_intra, ...) — the same dict the app passes to
        build_frame on the split path."""
        cfg = self.cfg
        imgs = jnp.asarray(imgs)
        ecfg = dict(extract_cfg or {})
        if (self.state != INITIALIZED or self.relocalizer is not None
                or seg_masks is not None or not self.keyframes
                or (self.use_imu and not self.imu_initialized)):
            frame = build_frame(imgs, self.rig, seg_masks=seg_masks, **ecfg)
            return self.process_frame(frame, timestamp, imu=imu, gps=gps)
        # Sensor ingestion + matured async-BA landing must precede the
        # fused dispatch (the program consumes the predicted pose and the
        # map mirror); process_frame skips both when it sees _packed.
        if imu is not None and self.use_imu:
            self._ingest_imu(imu)
        if gps is not None and self.use_gps:
            self._ingest_gps(gps)
            self._process_gps_dummies(timestamp)
        if (getattr(self, "_pending_ba", None) is not None
                and self.stats["frames"] + 1
                - getattr(self, "_ba_dispatch_frame", 0)
                >= cfg.async_ba_land_frames):
            self._finish_pending_ba()
        if (getattr(self, "_pending_gba", None) is not None
                and self.stats["frames"] + 1
                - getattr(self, "_gba_dispatch_frame", 0)
                >= cfg.gba_land_frames):
            self._finish_pending_gba()
        kf_prev = self._prev_kf()
        self._pred_span = (
            (getattr(self, "_last_track_ts", None), timestamp)
            if getattr(self, "_last_track_ts", None) is not None else None
        )
        cand = self._local_map_candidates()
        L = cfg.local_map_landmarks
        n = len(cand)
        cand_pad = np.zeros(L, np.int32)
        cand_pad[:n] = cand
        kw = dict(_BUILD_FRAME_DEFAULTS)
        kw.update(ecfg)
        with self.timers.span("track.dispatch"):
            kps, xy_ud, groups, tri, packed = _build_and_track_step(
                self._next_key(), imgs, self.rig, *kf_prev.device_desc(),
                kf_prev.d_lm_id(), self.dmap.pos, self.dmap.valid,
                self.dmap.desc, self.dmap.normal,
                jnp.asarray(cand_pad), jnp.asarray(np.arange(L) < n),
                jnp.asarray(self._predict_pose()),
                num_points=kw["num_points"], num_levels=kw["num_levels"],
                fast_threshold=kw["fast_threshold"],
                min_threshold=kw["min_threshold"],
                max_intra=kw["max_intra"],
                min_z=kw["min_z"], max_z=kw["max_z"],
                angle_bins=kw["angle_bins"],
                approx_topk=kw["approx_topk"],
                num_hyp=cfg.ransac_hyps, px=cfg.ransac_px,
                max_dist=cfg.inter_max_dist, ratio=cfg.inter_ratio,
                image_wh=self.rig.image_size,
                lm_radius=cfg.local_map_radius_px,
                lm_max_dist=cfg.local_map_max_dist,
                gate_px=cfg.track_match_radius_px,
                fastpath_frac=self._fastpath_frac,
                fastpath_min=cfg.track_fastpath_min_inliers,
            )
        frame = assemble_frame(kps, xy_ud, groups, tri)
        return self.process_frame(frame, timestamp, _packed=packed)

    def process_frame(self, frame: FrameFeatures, timestamp: float,
                      imu=None, gps=None, _packed=None) -> dict:
        """One SLAM step on an already-built FrameFeatures. Returns a stats
        dict for this frame. Optional imu=(ts, gyro, accel) and
        gps=(ts, lla) message slices since the previous frame.

        `_packed`: internal — a pre-dispatched tracking result buffer from
        the fused frame-build+track program (process_image); the first
        tracking pass parses it instead of dispatching again."""
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
            if ok:
                # fresh motion state for the predictor
                self._last_track_ts = timestamp
                self._track_vel = np.zeros(3, np.float32)
            self._record_pose(timestamp)
            return info

        # Land a matured deferred solve BEFORE tracking: by now the device
        # has had >= async_ba_land_frames frames of overlap to finish it,
        # so the fetch is cheap and tracking gets the corrected map now
        # instead of at the next keyframe (staleness ~land_frames frames).
        if (getattr(self, "_pending_ba", None) is not None
                and self.stats["frames"] - getattr(self, "_ba_dispatch_frame", 0)
                >= cfg.async_ba_land_frames):
            self._finish_pending_ba()
        # matured deferred global BA (loop-closure refinement): by now the
        # device has had gba_land_frames frames of overlap with the ~90 ms
        # solve, so the fetch is cheap
        if (getattr(self, "_pending_gba", None) is not None
                and self.stats["frames"]
                - getattr(self, "_gba_dispatch_frame", 0)
                >= cfg.gba_land_frames):
            self._finish_pending_gba()

        kf_prev = self._prev_kf()
        # prediction span: last successfully tracked frame -> this frame
        # (drives the IMU dead-reckoning branch of _predict_pose)
        self._pred_span = (getattr(self, "_last_track_ts", None), timestamp) \
            if getattr(self, "_last_track_ts", None) is not None else None
        with self.timers.span("track"):
            ok, pose, (m_ok, m_idx), lm_of_match, lm_match, inliers = (
                self._track_frame_fused(frame, kf_prev, packed=_packed)
            )
        if not ok and getattr(self, "_pending_ba", None) is not None:
            # async rescue: the deferred window corrections may be exactly
            # what this frame needed (young/noisy geometry) — land them
            # and retry once before declaring a failure
            self._finish_pending_ba()
            with self.timers.span("track"):
                ok, pose, (m_ok, m_idx), lm_of_match, lm_match, inliers = (
                    self._track_frame_fused(frame, kf_prev)
                )
        if not ok:
            self.track_failures += 1
            self.stats["failures"] += 1
            if self.track_failures >= cfg.max_track_failures:
                self.state = REINITIALIZING
                self.track_failures = 0
                self._ba_warm = False
                self._ba_sync_left = cfg.window_size
            self._record_pose(timestamp)
            info["state"] = self.state
            return info
        self.track_failures = 0
        n_tracked = int(((lm_match >= 0) & inliers).sum())
        prev_tracked = int((kf_prev.lm_id >= 0).sum())
        if (n_tracked < cfg.kf_tracked_ratio * max(prev_tracked, 1)
                and getattr(self, "_pending_ba", None) is not None):
            # weak-track rescue: the same signal the keyframe policy uses —
            # land the deferred corrections and re-track once; recovers
            # most of async mode's accuracy cost at the price of one extra
            # dispatch on weak frames only
            self._finish_pending_ba()
            with self.timers.span("track"):
                ok2, pose2, mm2, lm_of2, lm_match2, inl2 = (
                    self._track_frame_fused(frame, kf_prev)
                )
            if ok2:
                pose, (m_ok, m_idx), lm_of_match = pose2, mm2, lm_of2
                lm_match, inliers = lm_match2, inl2
                n_tracked = int(((lm_match >= 0) & inliers).sum())
        info["tracked"] = n_tracked

        # world-frame velocity estimate for the IMU predictor (finite
        # difference of ref positions; lever-arm rotation effects are
        # second-order at frame rate)
        last_ts = getattr(self, "_last_track_ts", None)
        if last_ts is not None and timestamp > last_ts:
            self._track_vel = (
                (pose[:3, 3] - self.cur_pose[:3, 3])
                / max(timestamp - last_ts, 1e-3)
            ).astype(np.float32)
        self._last_track_ts = timestamp

        self.last_pose = self.cur_pose
        self.cur_pose = pose
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
        self._finish_pending_gba()
        # batch-LM mode (Optimization=1): one full-batch re-optimization of
        # all keyframes + landmarks at session end (reference LM path,
        # Backend.cpp:3269-3317 re-solves the whole accumulated graph)
        if (self.cfg.final_global_ba and not getattr(
                self, "_final_gba_done", False)
                and self.state == INITIALIZED and len(self.keyframes) >= 3):
            self._final_gba_done = True
            vis = [k for k in self.keyframes if not k.is_dummy]
            pre = {k.kf_id: k.world_T_ref.copy() for k in vis}
            self._run_global_ba()
            self._finish_pending_gba()
            # retro-correct the recorded per-frame trajectory by the
            # nearest (in time) keyframe's correction so the TUM output
            # reflects the batch solve
            kf_ts = np.array([k.timestamp for k in vis])
            corr = [
                (k.world_T_ref @ np.linalg.inv(pre[k.kf_id])).astype(
                    np.float32)
                for k in vis
            ]
            for i, (t, p) in enumerate(self.trajectory):
                j = int(np.argmin(np.abs(kf_ts - t)))
                self.trajectory[i] = (t, (corr[j] @ p).astype(np.float32))

    def trajectory_arrays(self):
        self.finalize()
        ts = np.array([t for t, _ in self.trajectory])
        poses = np.stack([p for _, p in self.trajectory])
        return ts, poses

    def write_trajectory(self, path):
        from mcslam_tpu.utils import tum

        ts, poses = self.trajectory_arrays()
        tum.write_tum(path, ts, poses)
