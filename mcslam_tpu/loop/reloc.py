"""Relocalization against a saved session map (map reuse).

Parity (WHAT): Relocalization (/root/reference/MCSlam/src/relocalization.cpp):
load a saved BoW database + JSON map; for each incoming frame query the
database, descriptor-match to the stored keyframe's landmarks, solve 2D-3D
absolute pose with a minimum inlier ratio (minInlierRatio=0.04,
min k=1 temporal, relocalization.cpp:13-42), return the world pose.

HOW: database scoring is a matvec; candidate verification reuses the batched
RANSAC-PnP + pose-LM kernels against the loaded landmark SoA.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from mcslam_tpu.frontend import pose_opt, ransac
from mcslam_tpu.ops import hamming, match as match_ops
from mcslam_tpu.utils import mapio


@dataclasses.dataclass
class RelocConfig:
    top_candidates: int = 3
    min_matches: int = 15
    min_inlier_ratio: float = 0.04
    min_inliers: int = 12
    max_dist: int = 64
    ratio: float = 0.9
    ransac_px: float = 6.0


class Relocalizer:
    """Loads a saved session (vocabulary DB + JSON map) and localizes
    incoming frames against it."""

    def __init__(self, vocab, rig, map_path, db_path,
                 config: RelocConfig = None, seed: int = 0,
                 _preloaded=None):
        self.vocab = vocab
        self.rig = rig
        self.cfg = config or RelocConfig()
        self._key = jax.random.PRNGKey(seed)
        kfs, lms = _preloaded if _preloaded is not None \
            else mapio.load_map_json(map_path)
        self.kf_entries = kfs
        # stored per-KF landmark tables
        self.lm_ids = sorted(lms.keys())
        id2slot = {l: i for i, l in enumerate(self.lm_ids)}
        self.lm_pos = np.stack([lms[l][0] for l in self.lm_ids])
        self.lm_desc = np.stack([lms[l][1] for l in self.lm_ids])
        for e in self.kf_entries:
            e["slots"] = np.array([id2slot[int(l)] for l in e["lids"]], np.int32)
        if db_path is not None:
            z = np.load(db_path)
            self.db_bows = z["bows"]
            self.db_kf_ids = z["kf_ids"]
        else:
            # no saved BoW database (navability maps ship none): score
            # against BoW vectors computed from each entry's stored
            # landmark descriptors
            bows, ids = [], []
            for e in self.kf_entries:
                if len(e["descs"]) == 0:
                    continue
                d = jnp.asarray(e["descs"], jnp.uint32)
                bows.append(np.asarray(
                    self.vocab.transform(d, jnp.ones(len(e["descs"]), bool))
                ))
                ids.append(e["kfID"])
            V = getattr(self.vocab, "num_words", 1)
            self.db_bows = (
                np.stack(bows) if bows else np.zeros((0, V), np.float32)
            )
            self.db_kf_ids = np.array(ids, np.int64)
        self._kf_by_id = {e["kfID"]: e for e in self.kf_entries}

    @classmethod
    def from_navability(cls, vocab, rig, features_path, poses_path,
                        config: RelocConfig = None, seed: int = 0):
        """Relocalize against an external 'navability' two-file JSON map
        (reference checkRelocalizationNavability, relocalization.cpp:44) —
        an alias over the same query/verify pipeline with the alternate
        map schema and descriptor-derived BoW scoring."""
        pre = mapio.load_map_navability(features_path, poses_path)
        return cls(vocab, rig, None, None, config=config, seed=seed,
                   _preloaded=pre)

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def relocalize(self, frame) -> Optional[np.ndarray]:
        """FrameFeatures -> world_T_ref or None.

        Parity: Relocalization::checkRelocalization (relocalization.cpp:180).
        """
        cfg = self.cfg
        bow = np.asarray(self.vocab.transform(frame.im_desc, frame.im_valid))
        if len(self.db_bows) == 0:
            return None
        scores = self.db_bows @ bow
        order = np.argsort(-scores)[: cfg.top_candidates]
        for ci in order:
            kf_id = int(self.db_kf_ids[ci])
            entry = self._kf_by_id.get(kf_id)
            if entry is None or len(entry["slots"]) == 0:
                continue
            pose = self._verify(frame, entry)
            if pose is not None:
                return pose
        return None

    def _verify(self, frame, entry) -> Optional[np.ndarray]:
        cfg = self.cfg
        cand_desc = self.lm_desc[entry["slots"]]
        d = hamming.hamming_matrix(frame.im_desc, jnp.asarray(cand_desc))
        res = match_ops.match_mutual(
            d, row_mask=frame.im_valid,
            col_mask=jnp.ones(len(cand_desc), bool),
            max_dist=cfg.max_dist, ratio=cfg.ratio,
        )
        ok = np.asarray(res.ok)
        idx = np.asarray(res.idx)
        n = int(ok.sum())
        if n < cfg.min_matches:
            return None
        M = len(ok)
        X_world = np.zeros((M, 3), np.float32)
        X_world[ok] = self.lm_pos[entry["slots"][idx[ok]]]
        anchor = np.asarray(frame.im_anchor_cam)
        cam_T_ref = np.asarray(self.rig.cam_T_ref)[anchor]
        fxy = np.asarray(self.rig.fxycxy)[anchor]
        rr = ransac.ransac_pnp(
            self._next_key(), jnp.asarray(X_world), frame.im_uv_ref,
            jnp.asarray(cam_T_ref), jnp.asarray(fxy), jnp.asarray(ok),
            num_hyp=256, px_thresh=cfg.ransac_px, min_inliers=cfg.min_inliers,
        )
        if not bool(rr.ok):
            return None
        if int(rr.num_inliers) < cfg.min_inlier_ratio * n:
            return None
        ref = pose_opt.optimize_pose(
            rr.world_T_ref, jnp.asarray(X_world), frame.im_uv_ref,
            jnp.asarray(cam_T_ref), jnp.asarray(fxy),
            jnp.asarray(ok) & rr.inliers, sigma2=frame.im_sigma2,
        )
        if int(ref.num_inliers) < cfg.min_inliers:
            return None
        return np.asarray(ref.world_T_ref)
