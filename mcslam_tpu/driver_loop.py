"""Loop-closure half of the SLAM driver (mixin): landmark identity merge,
PGO gating/bend, loop-window BA, retriangulation (split out of slam.py)."""

from __future__ import annotations


import jax.numpy as jnp
import numpy as np

from mcslam_tpu.backend import pgo

from mcslam_tpu.geometry import lie, triangulation
from mcslam_tpu.tracking_kernels import _triangulate_pairs


class LoopClosingMixin:
    # -- loop closing ------------------------------------------------------

    def _close_loop(self, kf: Keyframe, det):
        """Merge re-observed landmarks, run SE(3) pose-graph optimization
        over the whole keyframe trajectory, re-anchor landmarks to their
        first-observing keyframe (the reference achieves the same global
        correction through ISAM2 + smart-factor re-triangulation)."""

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
        if run_pgo:
            # the PGO bend moved keyframes: marginal priors linearized at
            # the pre-loop poses are stale — drop them (the next window
            # falls back to the gauge clamp and rebuilds the marginal)
            self._vis_marg_prior = None
            self._marg_prior = None

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

