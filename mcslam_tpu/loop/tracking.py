"""Fast tracking: pose-indexed map reuse after global relocalization.

Parity (WHAT): Tracking (/root/reference/MCSlam/src/Tracking.cpp): after a
successful relocalization, track against the prior map by (1) finding the
stored keyframes nearest to the (IMU- or motion-)predicted pose, (2) pulling
the union of their landmarks, (3) projecting them into every rig camera,
(4) matching projections to current keypoints, (5) refining the pose.

HOW: the reference uses cv::flann KD-trees over poses and per-camera
keypoints with per-camera query threads (Tracking.cpp:321+). Here nearest
stored poses are an argmin over a dense distance vector, and projection
matching is the same masked Hamming + pixel-gate kernel used by local-map
tracking — no trees, no threads.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from mcslam_tpu.frontend import pose_opt, ransac


@dataclasses.dataclass
class FastTrackConfig:
    knn_keyframes: int = 5  # reference queryPoints kNN=5
    radius_px: float = 20.0
    max_dist: int = 64
    min_inliers: int = 12
    min_inlier_ratio: float = 0.2  # reference refinePose gate (FrontEnd.cpp:1691)
    ransac_px: float = 6.0
    max_landmarks: int = 4096


class FastTracker:
    def __init__(self, relocalizer, config: FastTrackConfig = None, seed: int = 0):
        self.reloc = relocalizer
        self.cfg = config or FastTrackConfig()
        self._key = jax.random.PRNGKey(seed)
        self.kf_positions = np.stack(
            [e["pose"][:3, 3] for e in relocalizer.kf_entries]
        )

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def track(self, frame, predicted_pose: np.ndarray) -> Optional[np.ndarray]:
        """FrameFeatures + predicted world_T_ref -> refined pose or None."""
        cfg = self.cfg
        rig = self.reloc.rig
        # 1. nearest stored keyframes by metric distance
        d = np.linalg.norm(
            self.kf_positions - predicted_pose[:3, 3][None], axis=-1
        )
        near = np.argsort(d)[: cfg.knn_keyframes]
        slots = np.unique(
            np.concatenate(
                [self.reloc.kf_entries[i]["slots"] for i in near]
            )
        )[: cfg.max_landmarks]
        if len(slots) < cfg.min_inliers:
            return None
        L = cfg.max_landmarks
        lm_pos = np.zeros((L, 3), np.float32)
        lm_desc = np.zeros((L, 8), np.uint32)
        lm_valid = np.zeros(L, bool)
        lm_pos[: len(slots)] = self.reloc.lm_pos[slots]
        lm_desc[: len(slots)] = self.reloc.lm_desc[slots]
        lm_valid[: len(slots)] = True

        # 2-4. project + pixel-gated descriptor match (shared kernel)
        from mcslam_tpu.slam import _project_and_match_local

        res = _project_and_match_local(
            jnp.asarray(predicted_pose), jnp.asarray(lm_pos),
            jnp.asarray(lm_desc), jnp.asarray(lm_valid),
            frame.im_desc, frame.im_uv_ref, frame.im_anchor_cam,
            frame.im_valid, rig.cam_T_ref, rig.fxycxy, rig.image_size,
            cfg.radius_px, cfg.max_dist,
        )
        ok = np.asarray(res.ok)
        idx = np.asarray(res.idx)
        n = int(ok.sum())
        if n < cfg.min_inliers:
            return None
        M = len(ok)
        X_world = np.zeros((M, 3), np.float32)
        X_world[ok] = lm_pos[idx[ok]]
        anchor = np.asarray(frame.im_anchor_cam)
        cam_T_ref = np.asarray(rig.cam_T_ref)[anchor]
        fxy = np.asarray(rig.fxycxy)[anchor]
        # 5. robust refine (GP3P-equivalent + LM), reference refinePose gate
        rr = ransac.ransac_pnp(
            self._next_key(), jnp.asarray(X_world), frame.im_uv_ref,
            jnp.asarray(cam_T_ref), jnp.asarray(fxy), jnp.asarray(ok),
            num_hyp=256, px_thresh=cfg.ransac_px, min_inliers=cfg.min_inliers,
        )
        if not bool(rr.ok) or int(rr.num_inliers) < cfg.min_inlier_ratio * n:
            return None
        ref = pose_opt.optimize_pose(
            rr.world_T_ref, jnp.asarray(X_world), frame.im_uv_ref,
            jnp.asarray(cam_T_ref), jnp.asarray(fxy),
            jnp.asarray(ok) & rr.inliers, sigma2=frame.im_sigma2,
        )
        if int(ref.num_inliers) < cfg.min_inliers:
            return None
        return np.asarray(ref.world_T_ref)
