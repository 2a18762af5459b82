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
    ba_iters: int = 8
    ba_obs_capacity: int = 16384
    ba_lm_capacity: int = 2048
    # failure handling
    max_track_failures: int = 2  # reference num_trials_to_track


class Keyframe:
    """Host-side keyframe record (small numpy arrays + landmark id table)."""

    def __init__(self, kf_id, timestamp, world_T_ref, frame: FrameFeatures):
        self.kf_id = kf_id
        self.timestamp = timestamp
        self.world_T_ref = np.asarray(world_T_ref)
        self.im_desc = np.asarray(frame.im_desc)
        self.im_uv = np.asarray(frame.im_uv_ref)
        self.im_anchor_cam = np.asarray(frame.im_anchor_cam)
        self.im_valid = np.asarray(frame.im_valid)
        self.im_sigma2 = np.asarray(frame.im_sigma2)
        self.im_point3d = np.asarray(frame.im_point3d)
        self.im_has_depth = np.asarray(frame.im_has_depth)
        self.im_ray_idx = np.asarray(frame.im_ray_idx)
        # per-ray undistorted uv: (M, C, 2)
        C = frame.kp_xy_ud.shape[0]
        M = self.im_ray_idx.shape[0]
        safe = np.maximum(self.im_ray_idx, 0)
        xy_ud = np.asarray(frame.kp_xy_ud)
        self.ray_uv = xy_ud[np.arange(C)[None, :], safe]  # (M, C, 2)
        sig = np.asarray(frame.kp_sigma2)
        self.ray_sigma2 = sig[np.arange(C)[None, :], safe]
        self.ray_valid = self.im_ray_idx >= 0
        self.lm_id = np.full(M, -1, np.int32)


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


@functools.partial(jax.jit, static_argnames=("num_hyp", "px"))
def _pose_from_3d3d(key, X_rig, X_world, uv, cam_T_ref, fxycxy, mask,
                    num_hyp: int, px: float):
    return ransac.ransac_kabsch(
        key, X_rig, X_world, uv, cam_T_ref, fxycxy, mask,
        num_hyp=num_hyp, px_thresh=px,
    )


@functools.partial(jax.jit, static_argnames=("num_hyp", "px"))
def _pose_from_2d3d(key, X_world, uv, cam_T_ref, fxycxy, mask,
                    num_hyp: int, px: float):
    return ransac.ransac_pnp(
        key, X_world, uv, cam_T_ref, fxycxy, mask,
        num_hyp=num_hyp, px_thresh=px,
    )


@jax.jit
def _refine_pose(T_init, X_world, uv, cam_T_ref, fxycxy, mask, sigma2):
    return pose_opt.optimize_pose(
        T_init, X_world, uv, cam_T_ref, fxycxy, mask, sigma2=sigma2
    )


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
                 vocab=None, loop_config=None):
        self.rig = rig
        self.cfg = config or SlamConfig()
        self.map = LandmarkMap()
        self.keyframes: list[Keyframe] = []
        self.state = NOT_INITIALIZED
        self.track_failures = 0
        self.cur_pose = np.eye(4, dtype=np.float32)
        self.last_pose = np.eye(4, dtype=np.float32)
        self.trajectory: list[tuple[float, np.ndarray]] = []
        self.kf_counter = 0
        self._key = jax.random.PRNGKey(seed)
        self.stats = {"frames": 0, "keyframes": 0, "failures": 0, "loops": 0}
        self.looper = None
        if vocab is not None:
            from mcslam_tpu.loop.detector import LoopCloser

            self.looper = LoopCloser(vocab, rig, loop_config, seed=seed + 1)

    # -- helpers ----------------------------------------------------------

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _prev_kf(self) -> Optional[Keyframe]:
        return self.keyframes[-1] if self.keyframes else None

    def _record_pose(self, timestamp):
        self.trajectory.append((timestamp, self.cur_pose.copy()))

    # -- pipeline stages --------------------------------------------------

    def _initialize(self, frame: FrameFeatures, timestamp: float) -> bool:
        """Rig bootstrap: the multi-camera rig gives metric 3D directly
        (reference initialization, FrontEnd.cpp:2481, via intra-match
        triangulation). Mono input cannot bootstrap this way; essential-
        matrix init is handled by the mono pipeline variant."""
        has_depth = np.asarray(frame.im_has_depth)
        n3d = int(has_depth.sum())
        if n3d < 30:
            return False
        pose = self.cur_pose  # identity or reinit seed
        kf = Keyframe(self.kf_counter, timestamp, pose, frame)
        sel = np.nonzero(has_depth)[0]
        X_rig = np.asarray(frame.im_point3d)[sel]
        X_world = X_rig @ pose[:3, :3].T + pose[:3, 3]
        desc = np.asarray(frame.im_desc)[sel]
        # viewing normal: from rig center to point
        vd = X_world - pose[:3, 3]
        vd /= np.maximum(np.linalg.norm(vd, axis=-1, keepdims=True), 1e-9)
        ids = self.map.insert(X_world, desc, vd, kf.kf_id)
        kf.lm_id[sel] = ids
        self.keyframes.append(kf)
        self.kf_counter += 1
        self.state = INITIALIZED
        self.stats["keyframes"] += 1
        return True

    def _estimate_pose(self, frame: FrameFeatures, kf: Keyframe):
        """Inter-frame matching + robust pose vs the previous keyframe's
        landmarks. Returns (ok, pose, match_result, lm_of_match)."""
        cfg = self.cfg
        dist = _match_descriptors(
            frame.im_desc, frame.im_valid,
            jnp.asarray(kf.im_desc), jnp.asarray(kf.im_valid),
        )
        res = _mutual_match(
            dist, frame.im_valid, jnp.asarray(kf.im_valid),
            cfg.inter_max_dist, cfg.inter_ratio,
        )
        ok = np.asarray(res.ok)
        idx = np.asarray(res.idx)
        n_matches = int(ok.sum())
        if n_matches < cfg.min_inter_matches:
            return False, None, (ok, idx), None

        # correspondences with existing landmarks
        lm_of_match = np.where(ok, kf.lm_id[idx], -1)
        with_lm = lm_of_match >= 0
        if with_lm.sum() < cfg.min_pose_inliers:
            return False, None, (ok, idx), lm_of_match

        M = len(ok)
        X_world = np.zeros((M, 3), np.float32)
        X_world[with_lm] = self.map.pos[lm_of_match[with_lm]]
        mask = jnp.asarray(with_lm)
        anchor = np.asarray(frame.im_anchor_cam)
        cam_T_ref = np.asarray(self.rig.cam_T_ref)[anchor]
        fxy = np.asarray(self.rig.fxycxy)[anchor]
        uv = frame.im_uv_ref

        # hypothesis source: 3D-3D when current frame has rig depth, else PnP
        has3d = np.asarray(frame.im_has_depth) & with_lm
        if has3d.sum() >= 20:
            rr = _pose_from_3d3d(
                self._next_key(), frame.im_point3d, jnp.asarray(X_world),
                uv, jnp.asarray(cam_T_ref), jnp.asarray(fxy),
                jnp.asarray(has3d), cfg.ransac_hyps, cfg.ransac_px,
            )
        else:
            rr = _pose_from_2d3d(
                self._next_key(), jnp.asarray(X_world), uv,
                jnp.asarray(cam_T_ref), jnp.asarray(fxy), mask,
                cfg.ransac_hyps, cfg.ransac_px,
            )
        if not bool(rr.ok):
            return False, None, (ok, idx), lm_of_match

        ref = _refine_pose(
            rr.world_T_ref, jnp.asarray(X_world), uv,
            jnp.asarray(cam_T_ref), jnp.asarray(fxy),
            mask & rr.inliers, frame.im_sigma2,
        )
        if int(ref.num_inliers) < cfg.min_pose_inliers:
            return False, None, (ok, idx), lm_of_match
        return True, np.asarray(ref.world_T_ref), (ok, idx), lm_of_match

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
        (pose, lm_match (M,) int32, inlier_mask (M,))."""
        cfg = self.cfg
        cand = self._local_map_candidates()
        L = cfg.local_map_landmarks
        lm_pos = np.zeros((L, 3), np.float32)
        lm_desc = np.zeros((L, 8), np.uint32)
        lm_valid = np.zeros(L, bool)
        n = len(cand)
        lm_pos[:n] = self.map.pos[cand]
        lm_desc[:n] = self.map.desc[cand]
        lm_valid[:n] = True

        res = _project_and_match_local(
            jnp.asarray(pose), jnp.asarray(lm_pos), jnp.asarray(lm_desc),
            jnp.asarray(lm_valid), frame.im_desc, frame.im_uv_ref,
            frame.im_anchor_cam, frame.im_valid,
            self.rig.cam_T_ref, self.rig.fxycxy,
            self.rig.image_size, cfg.local_map_radius_px, cfg.local_map_max_dist,
        )
        ok = np.asarray(res.ok)
        idx = np.asarray(res.idx)
        M = len(ok)
        lm_match = np.where(ok & (idx < n), cand[np.minimum(idx, n - 1)], -1)

        X_world = np.zeros((M, 3), np.float32)
        sel = lm_match >= 0
        X_world[sel] = self.map.pos[lm_match[sel]]
        anchor = np.asarray(frame.im_anchor_cam)
        cam_T_ref = np.asarray(self.rig.cam_T_ref)[anchor]
        fxy = np.asarray(self.rig.fxycxy)[anchor]
        ref = _refine_pose(
            jnp.asarray(pose), jnp.asarray(X_world), frame.im_uv_ref,
            jnp.asarray(cam_T_ref), jnp.asarray(fxy), jnp.asarray(sel),
            frame.im_sigma2,
        )
        inl = np.asarray(ref.inliers)
        return np.asarray(ref.world_T_ref), np.where(inl, lm_match, -1), inl

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
                         lm_match, inliers):
        cfg = self.cfg
        kf = Keyframe(self.kf_counter, timestamp, pose, frame)
        # attach tracked landmarks
        sel = (lm_match >= 0) & inliers
        kf.lm_id[sel] = lm_match[sel]
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
            ids = self.map.insert(X_world, desc, vd, kf.kf_id)
            kf.lm_id[np.nonzero(new_sel)[0]] = ids

        self.keyframes.append(kf)
        self.kf_counter += 1
        self.stats["keyframes"] += 1

        # loop closure (reference: insertKeyFrame -> callerDetectLoop,
        # FrontEnd.cpp:1849)
        if self.looper is not None:
            det = self.looper.detect(
                kf, jnp.asarray(kf.im_desc), jnp.asarray(kf.im_valid),
                self.keyframes, self.map,
            )
            if det.detected:
                self._close_loop(kf, det)

        # window BA
        self._run_window_ba()

    # -- loop closing ------------------------------------------------------

    def _close_loop(self, kf: Keyframe, det):
        """Merge re-observed landmarks, run SE(3) pose-graph optimization
        over the whole keyframe trajectory, re-anchor landmarks to their
        first-observing keyframe (the reference achieves the same global
        correction through ISAM2 + smart-factor re-triangulation)."""
        from mcslam_tpu.backend import pgo

        self.stats["loops"] += 1
        # 1. merge landmark identities: the query slots re-observe OLD lms
        for slot, old_lm in zip(det.query_slots, det.lm_ids):
            cur_lm = kf.lm_id[slot]
            if cur_lm >= 0 and cur_lm != old_lm:
                # the freshly minted landmark duplicates an old one
                self.map.delete([cur_lm])
            kf.lm_id[slot] = old_lm

        # 2. pose graph: odometry edges + the loop edge
        N = len(self.keyframes)
        poses_old = np.stack([k.world_T_ref for k in self.keyframes])
        E = (N - 1) + 1
        ei = np.arange(N - 1, dtype=np.int32)
        ej = ei + 1
        meas = np.einsum(
            "nij,njk->nik", np.linalg.inv(poses_old[:-1]), poses_old[1:]
        )
        match_idx = next(
            i for i, k in enumerate(self.keyframes) if k.kf_id == det.match_kf
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
        poses_new = np.asarray(pgo.pgo_solve(graph, iters=8))

        # 3. re-anchor landmarks with their first-observing keyframe
        valid_ids = np.nonzero(self.map.valid)[0]
        first = self.map.first_kf[valid_ids]
        # kf_id -> index (vision KFs are appended 1:1)
        id2idx = {k.kf_id: i for i, k in enumerate(self.keyframes)}
        fidx = np.array([id2idx.get(int(f), 0) for f in first])
        T_corr = np.einsum(
            "nij,njk->nik", poses_new[fidx], np.linalg.inv(poses_old[fidx])
        )
        p = self.map.pos[valid_ids]
        self.map.pos[valid_ids] = (
            np.einsum("nij,nj->ni", T_corr[:, :3, :3], p) + T_corr[:, :3, 3]
        )
        for i, k in enumerate(self.keyframes):
            k.world_T_ref = poses_new[i]
        self.cur_pose = poses_new[-1].copy()

    # -- window bundle adjustment ----------------------------------------

    def _run_window_ba(self):
        cfg = self.cfg
        window = self.keyframes[-cfg.window_size:]
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
        slot_of = {int(l): s for s, l in enumerate(lm_ids)}
        L = cfg.ba_lm_capacity

        obs_kf, obs_cam, obs_lm, obs_uv, obs_s2 = [], [], [], [], []
        for wk, kf in enumerate(window):
            has = np.nonzero(kf.lm_id >= 0)[0]
            for m in has:
                s = slot_of.get(int(kf.lm_id[m]))
                if s is None:
                    continue
                for c in np.nonzero(kf.ray_valid[m])[0]:
                    obs_kf.append(wk)
                    obs_cam.append(c)
                    obs_lm.append(s)
                    obs_uv.append(kf.ray_uv[m, c])
                    obs_s2.append(kf.ray_sigma2[m, c])
        O = cfg.ba_obs_capacity
        n_obs = min(len(obs_kf), O)
        if n_obs < 30:
            return

        def pad(arr, dtype, shape_tail=()):
            out = np.zeros((O,) + shape_tail, dtype)
            out[:n_obs] = np.asarray(arr[:n_obs])
            return out

        obs = ba.BAObservations(
            kf=jnp.asarray(pad(obs_kf, np.int32)),
            cam=jnp.asarray(pad(obs_cam, np.int32)),
            lm=jnp.asarray(pad(obs_lm, np.int32)),
            uv=jnp.asarray(pad(obs_uv, np.float32, (2,))),
            sigma2=jnp.asarray(np.maximum(pad(obs_s2, np.float32), 1e-3)),
            valid=jnp.asarray(np.arange(O) < n_obs),
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

        prior_H = np.zeros((K * 6, K * 6), np.float32)
        prior_H[:6, :6] = np.eye(6) * 1e6  # gauge: clamp oldest window pose
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
        result = ba.ba_solve(problem, iters=cfg.ba_iters)

        new_poses = np.asarray(result.poses)
        for wk, kf in enumerate(window):
            kf.world_T_ref = new_poses[wk]
        new_lms = np.asarray(result.landmarks)[: len(lm_ids)]
        self.map.update_positions(lm_ids, new_lms)
        self.cur_pose = window[-1].world_T_ref.copy()

    # -- main entry -------------------------------------------------------

    def process_frame(self, frame: FrameFeatures, timestamp: float) -> dict:
        """One SLAM step on an already-built FrameFeatures. Returns a stats
        dict for this frame."""
        cfg = self.cfg
        self.stats["frames"] += 1
        info = {"keyframe": False, "tracked": 0, "state": self.state}

        if self.state != INITIALIZED:
            ok = self._initialize(frame, timestamp)
            info["initialized"] = ok
            self._record_pose(timestamp)
            return info

        kf_prev = self._prev_kf()
        ok, pose, (m_ok, m_idx), lm_of_match = self._estimate_pose(frame, kf_prev)
        if not ok:
            self.track_failures += 1
            self.stats["failures"] += 1
            if self.track_failures >= cfg.max_track_failures:
                self.state = REINITIALIZING
                self.track_failures = 0
            self._record_pose(timestamp)
            info["state"] = self.state
            return info
        self.track_failures = 0

        pose, lm_match, inliers = self._track_local_map(frame, pose)
        n_tracked = int(((lm_match >= 0) & inliers).sum())
        info["tracked"] = n_tracked

        self.last_pose = self.cur_pose
        self.cur_pose = pose

        prev_tracked = int((kf_prev.lm_id >= 0).sum())
        if self._need_keyframe(pose, n_tracked, prev_tracked):
            self._insert_keyframe(frame, timestamp, pose, lm_match, inliers)
            info["keyframe"] = True

        self._record_pose(timestamp)
        return info

    # -- outputs ----------------------------------------------------------

    def trajectory_arrays(self):
        ts = np.array([t for t, _ in self.trajectory])
        poses = np.stack([p for _, p in self.trajectory])
        return ts, poses

    def write_trajectory(self, path):
        from mcslam_tpu.utils import tum

        ts, poses = self.trajectory_arrays()
        tum.write_tum(path, ts, poses)
