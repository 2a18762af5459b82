"""Loop-closure half of the SLAM driver (mixin): landmark identity merge,
PGO gating/bend, loop-window BA, retriangulation (split out of slam.py)."""

from __future__ import annotations


import jax.numpy as jnp
import numpy as np

from mcslam_tpu.backend import ba, pgo

from mcslam_tpu.geometry import lie, triangulation
from mcslam_tpu.tracking_kernels import _triangulate_pairs


class LoopClosingMixin:
    # -- loop closing ------------------------------------------------------

    def _close_loop(self, kf: Keyframe, det):
        """Merge re-observed landmarks, run SE(3) pose-graph optimization
        over the whole keyframe trajectory, re-anchor landmarks to their
        first-observing keyframe (the reference achieves the same global
        correction through ISAM2 + smart-factor re-triangulation)."""

        # an in-flight window BA linearized at pre-loop poses is invalid;
        # a still-deferred global BA from the PREVIOUS closure must land
        # before this closure re-anchors the map
        self._finish_pending_ba()
        self._finish_pending_gba()
        self.stats["loops"] += 1
        self._ba_warm = False  # post-loop windows need the full LM budget
        self._ba_sync_left = self.cfg.window_size  # young post-loop geometry
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
            # 6. GLOBAL BA: the PGO bend is a rigid approximation; jointly
            # re-optimize ALL keyframes and landmarks so residual
            # inconsistency outside the loop window is paid down (the
            # reference's ISAM2 re-optimizes the entire graph on closure,
            # Backend.cpp:3060-3267). Sharded across the device mesh when
            # one is configured — this is the multi-chip flagship workload.
            if self.cfg.global_ba:
                self._run_global_ba()

    def _run_global_ba(self):
        """Full-trajectory BA over every vision keyframe and every landmark
        seen by >= 2 of them (reference: ISAM2 keeps the whole graph
        consistent on every update, Backend.cpp:3060-3267; our windowed
        backend needs this explicit global solve after loop closures).

        Cost is capped by an even keyframe subsample
        (cfg.global_ba_max_kfs) whose correction is propagated to skipped
        keyframes from their nearest optimized neighbor. With a mesh, the
        solve runs LANDMARK-SHARDED over the devices (landmark elimination
        fully local; only the pose-side system rides ICI)."""
        cfg = self.cfg
        vis = [k for k in self.keyframes if not k.is_dummy]
        if len(vis) < 3:
            return
        if len(vis) > cfg.global_ba_max_kfs:
            step = (len(vis) - 1) / (cfg.global_ba_max_kfs - 1)
            sel_idx = sorted({round(i * step) for i in
                              range(cfg.global_ba_max_kfs)})
        else:
            sel_idx = list(range(len(vis)))
        sel = [vis[i] for i in sel_idx]
        K = len(sel)
        # pad K to a power-of-two bucket (masked via kf_valid + pose
        # clamps): every distinct K otherwise compiles a fresh executable
        # per closure
        Kb = 8
        while Kb < K:
            Kb *= 2
        Kb = min(Kb, max(cfg.global_ba_max_kfs, 8))

        all_ids = np.concatenate([k.lm_id[k.lm_id >= 0] for k in sel])
        uniq, counts = np.unique(all_ids, return_counts=True)
        keep = (counts >= 2) & self.map.valid[uniq]
        uniq, counts = uniq[keep], counts[keep]
        if len(uniq) < 30:
            return
        if len(uniq) > cfg.global_ba_lm_capacity:
            # keep the most-observed landmarks (they constrain most poses)
            order = np.argsort(-counts, kind="stable")
            uniq = uniq[order[: cfg.global_ba_lm_capacity]]
        lm_ids = np.sort(uniq)
        # L bucket: power of two, divisible by any mesh size
        L = 256
        while L < len(lm_ids):
            L *= 2
        L = min(L, cfg.global_ba_lm_capacity)
        lm_ids = lm_ids[:L]

        slot_lookup = np.full(self.map.capacity, -1, np.int32)
        slot_lookup[lm_ids] = np.arange(len(lm_ids), dtype=np.int32)
        kf_pairs = []
        need_ok = 0
        for kf in sel:
            slots = slot_lookup[np.maximum(kf.lm_id, 0)]
            m_ok = (kf.lm_id >= 0) & (slots >= 0)
            mm, cc = np.nonzero(m_ok[:, None] & kf.ray_valid)
            kf_pairs.append((slots, mm, cc))
            need_ok = max(need_ok, len(mm))
        Ok = 64
        while Ok < need_ok and Ok < cfg.global_ba_obs_per_kf:
            Ok *= 2
        Ok = min(Ok, cfg.global_ba_obs_per_kf)
        O = Ok * Kb
        obs_kf = np.repeat(np.arange(Kb, dtype=np.int32), Ok)
        obs_cam = np.zeros(O, np.int32)
        obs_lm = np.zeros(O, np.int32)
        obs_uv = np.zeros((O, 2), np.float32)
        obs_s2 = np.ones(O, np.float32)
        obs_val = np.zeros(O, bool)
        n_obs = 0
        for wk, kf in enumerate(sel):
            slots, mm, cc = kf_pairs[wk]
            n = min(len(mm), Ok)
            base = wk * Ok
            obs_cam[base:base + n] = cc[:n]
            obs_lm[base:base + n] = slots[mm[:n]]
            obs_uv[base:base + n] = kf.ray_uv[mm[:n], cc[:n]]
            # px_sigma: reference MeasurementNoiseSigma (Backend.cpp:24-106)
            obs_s2[base:base + n] = np.maximum(
                kf.ray_sigma2[mm[:n], cc[:n]], 1e-3
            ) * (cfg.px_sigma ** 2)
            obs_val[base:base + n] = True
            n_obs += n
        if n_obs < 60:
            return

        obs = ba.BAObservations(
            kf=jnp.asarray(obs_kf), cam=jnp.asarray(obs_cam),
            lm=jnp.asarray(obs_lm), uv=jnp.asarray(obs_uv),
            sigma2=jnp.asarray(obs_s2), valid=jnp.asarray(obs_val),
        )
        poses_old = np.tile(np.eye(4, dtype=np.float32), (Kb, 1, 1))
        poses_old[:K] = np.stack(
            [k.world_T_ref for k in sel]
        ).astype(np.float32)
        kf_valid = np.zeros(Kb, bool)
        kf_valid[:K] = True
        lms = np.zeros((L, 3), np.float32)
        lms[: len(lm_ids)] = self.map.pos[lm_ids]
        lm_valid = np.zeros(L, bool)
        lm_valid[: len(lm_ids)] = True
        prior_H = np.zeros((Kb * 6, Kb * 6), np.float32)
        prior_H[:6, :6] = np.eye(6) * 1e6  # gauge on the first keyframe
        for pk in range(K, Kb):  # clamp padded slots (keep H nonsingular)
            prior_H[pk * 6:(pk + 1) * 6, pk * 6:(pk + 1) * 6] = (
                np.eye(6) * 1e6
            )

        mesh = getattr(self, "mesh", None)
        if mesh is not None:
            from mcslam_tpu.parallel import sharded_ba as sb

            n_dev = mesh.devices.size
            obs_lm_grouped = sb.shard_by_landmark(obs, L, n_dev)
            sp, sl, _, _, _ = sb.sharded_ba_solve_lm(
                mesh, jnp.asarray(poses_old), jnp.asarray(lms),
                jnp.asarray(lm_valid), jnp.asarray(kf_valid),
                obs_lm_grouped, self.rig.cam_T_ref, self.rig.fxycxy,
                jnp.asarray(prior_H), jnp.zeros(Kb * 6, jnp.float32),
                iters=cfg.global_ba_iters,
            )
        else:
            problem = ba.BAProblem(
                poses=jnp.asarray(poses_old), landmarks=jnp.asarray(lms),
                lm_valid=jnp.asarray(lm_valid), obs=obs,
                cam_T_ref=self.rig.cam_T_ref, fxycxy=self.rig.fxycxy,
                prior_H=jnp.asarray(prior_H),
                prior_b=jnp.zeros(Kb * 6, jnp.float32),
                kf_valid=jnp.asarray(kf_valid),
            )
            result = ba.ba_solve(
                problem, iters=cfg.global_ba_iters, kf_blocked=True
            )
            sp, sl = result.poses, result.landmarks

        # DEFERRED write-back (reference analogue: ISAM2's closure-time
        # full-graph update runs synchronously, Backend.cpp:3060-3267 — the
        # ~90 ms solve stalls ~6 frame budgets; nothing in the math needs
        # that). The solve is already dispatched and runs on device; the
        # PGO bend + landmark merge (applied synchronously above in
        # _close_loop) carry tracking meanwhile, and the refined poses/
        # landmarks land at the next matured process_frame (or before the
        # next window solve / loop / finalize, whichever first).
        self._pending_gba = {
            "sp": sp, "sl": sl,
            "sel_kf_ids": [k.kf_id for k in sel],
            "poses_old": poses_old[:K].copy(),
            "lm_ids": lm_ids,
        }
        self._gba_dispatch_frame = self.stats["frames"]
        if not cfg.async_gba:
            self._finish_pending_gba()

    def _finish_pending_gba(self):
        """Land a deferred global-BA solve: fetch, write back the selected
        keyframes, propagate each remaining vision keyframe (including any
        inserted since dispatch) by its nearest optimized neighbor's
        correction, write the landmark block."""
        pg = getattr(self, "_pending_gba", None)
        if pg is None:
            return
        self._pending_gba = None
        sel_kf_ids = pg["sel_kf_ids"]
        lm_ids = pg["lm_ids"]
        new_poses = np.asarray(pg["sp"])[: len(sel_kf_ids)]
        new_lms = np.asarray(pg["sl"])[: len(lm_ids)]
        id2kf = {k.kf_id: k for k in self.keyframes}
        corr_ids, corrs = [], []
        for j, kid in enumerate(sel_kf_ids):
            kf = id2kf.get(kid)
            if kf is None:
                continue
            corrs.append((
                new_poses[j] @ np.linalg.inv(pg["poses_old"][j])
            ).astype(np.float32))
            corr_ids.append(kid)
            kf.world_T_ref = new_poses[j].astype(np.float32)
        if corr_ids:
            corr_arr = np.asarray(corr_ids)
            sel_set = set(corr_ids)
            for k in self.keyframes:
                if k.is_dummy or k.kf_id in sel_set:
                    continue
                nearest = int(np.argmin(np.abs(corr_arr - k.kf_id)))
                k.world_T_ref = (
                    corrs[nearest] @ k.world_T_ref
                ).astype(np.float32)
            # motion-model continuity: the live pose rides the newest
            # keyframe's correction (tracking may have advanced past the
            # last keyframe since dispatch)
            self.cur_pose = (corrs[-1] @ self.cur_pose).astype(np.float32)
            self.last_pose = (corrs[-1] @ self.last_pose).astype(np.float32)
        # landmarks: direct write (global corrections legitimately exceed
        # the incremental UPDATE_GATE); skip slots freed since dispatch
        alive = self.map.valid[lm_ids]
        lm_ids = lm_ids[alive]
        new_lms = new_lms[alive]
        if len(lm_ids):
            self.map.pos[lm_ids] = new_lms
            self.dmap.upsert(lm_ids, pos=new_lms)
        self.stats["global_ba"] = self.stats.get("global_ba", 0) + 1
        # marginal priors are linearized at pre-global-BA poses
        self._vis_marg_prior = None
        self._marg_prior = None

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

