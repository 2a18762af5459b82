"""Window-BA half of the SLAM driver (mixin): window assembly, vision and
VIO solves, deferred write-back, fixed-lag marginal carry-over (split out
of slam.py)."""

from __future__ import annotations


import jax.numpy as jnp
import numpy as np

from mcslam_tpu.backend import ba_vio

from mcslam_tpu.backend import ba


class WindowBAMixin:
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
        # a deferred global BA must land first: this window would otherwise
        # linearize at poses the landing is about to move
        self._finish_pending_gba()
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
        # dynamic capacity tiers: real windows are usually much sparser
        # than the configured maximum, and every stage of the solve scales
        # with O — pick the smallest power-of-two per-keyframe block that
        # fits this window's densest keyframe (a handful of compiled
        # variants instead of one worst-case shape)
        kf_pairs = []  # (slots, mm, cc) per keyframe, reused by the fill
        need_ok = 0
        for kf in window:
            slots = slot_lookup[np.maximum(kf.lm_id, 0)]
            m_ok = (kf.lm_id >= 0) & (slots >= 0)
            mm, cc = np.nonzero(m_ok[:, None] & kf.ray_valid)
            kf_pairs.append((slots, mm, cc))
            need_ok = max(need_ok, len(mm))
        Ok_max = cfg.ba_obs_capacity // K
        Ok = 256
        while Ok < need_ok and Ok < Ok_max:
            Ok *= 2
        Ok = min(Ok, Ok_max)
        O = Ok * K  # blocked layout needs O divisible by K
        obs_kf = np.repeat(np.arange(K, dtype=np.int32), Ok)
        obs_cam = np.zeros(O, np.int32)
        obs_lm = np.zeros(O, np.int32)
        obs_uv = np.zeros((O, 2), np.float32)
        obs_s2 = np.ones(O, np.float32)
        obs_val = np.zeros(O, bool)
        n_obs = 0
        for wk, kf in enumerate(window):
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
        if getattr(self, "mesh", None) is not None:
            # multi-chip: observation-sharded solve across the mesh
            # (normal equations psum-reduced over ICI); same solver
            # semantics, no marginal output — the window anchor falls
            # back to the gauge clamp
            from mcslam_tpu.parallel import sharded_ba as sb

            obs_sh = sb.shard_observations(self.mesh, problem.obs)
            sp, sl, s_inl, s_cost, s_nin = sb.sharded_ba_solve(
                self.mesh, problem.poses, problem.landmarks,
                problem.lm_valid, problem.kf_valid, obs_sh,
                problem.cam_T_ref, problem.fxycxy, problem.prior_H,
                problem.prior_b, iters=iters,
            )
            result = ba.BAResult(
                poses=sp, landmarks=sl, obs_inliers=s_inl, cost=s_cost,
                num_inliers=s_nin,
                marginal_H=jnp.zeros((K * 6, K * 6), jnp.float32),
            )
            self._ba_warm = True
        else:
            result = ba.ba_solve(problem, iters=iters, kf_blocked=True)
            self._ba_warm = True
            # stash the marginal information of the state that becomes
            # the oldest when the trailing window slides (consumed above)
            if len(window) > 1 and not force_sync:
                self._pending_vis_marg = (window[1].kf_id, result)
        # DEFERRED write-back: the solve runs asynchronously on device; its
        # results are fetched at the NEXT keyframe (or at finalize/loop
        # closure), hiding the whole BA latency behind tracking. The
        # reference runs its backend synchronously on the main thread —
        # nothing in the math requires that.
        self._pending_ba = (result, lm_ids, list(window))
        self._ba_dispatch_frame = self.stats["frames"]
        # Young maps can't tolerate deferred corrections: right after
        # (re)initialization or a loop closure the geometry tracking runs
        # on is still rough, and landing the fix one keyframe late loses
        # track (measured on the noisy mono loop session). Stay
        # synchronous for the first window_size solves after any reset,
        # then let async hide the solve latency.
        sync_left = getattr(self, "_ba_sync_left", 0)
        if sync_left > 0:
            self._ba_sync_left = sync_left - 1
        if force_sync or sync_left > 0 or not self._async_ba_active:
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
            # CONDITIONAL block, deliberately (not the Schur marginal): in
            # a pure-odometry chain the oldest pose has no absolute
            # information, so the anchor prior doubles as the gauge; the
            # "over-confident" conditional block holds it. Measured on the
            # image-level loop session: Schur marginal + gauge floor
            # worsens ATE 0.08 -> 0.14. The VIO path below keeps the true
            # Schur marginal for its vel/bias block, where over-constraint
            # is the real failure mode.
            blk = np.asarray(result.marginal_H)[6:12, 6:12]
            blk = (blk + blk.T) * 0.5  # kill f32 accumulation asymmetry
            self._vis_marg_prior = (pm[0], blk)
        old_last = window[-1].world_T_ref.copy()
        new_poses = np.asarray(result.poses)
        for wk, kf in enumerate(window):
            kf.world_T_ref = new_poses[wk]
        new_lms = np.asarray(result.landmarks)[: len(lm_ids)]
        self._map_update_positions(lm_ids, new_lms)
        if self._async_ba_active:
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

    @property
    def _async_ba_active(self) -> bool:
        """Async (deferred write-back) BA is a rig-only optimization:
        monocular sessions run synchronously regardless of the flag. With
        per-frame keyframes on noisy mono data, a one-solve-stale map
        compounds scale drift until tracking collapses (measured on the
        mono loop session); rig sessions anchor scale with metric
        intra-depth and tolerate the lag (test_async_ba)."""
        return self.cfg.async_ba and self.rig.num_cams >= 2

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
            # E_T_V is a GLOBAL state: its information must ACCUMULATE
            # across windows (the reference keeps it as one ISAM2 variable
            # 't0' whose factors from the whole session stack up,
            # Backend.cpp:2652-2663,3170). Re-issuing a weak fresh prior
            # every window let each short near-linear GPS track re-estimate
            # it and wander, dragging the poses with it. Carry the
            # previous window's E_T_V marginal information forward.
            e0 = K * ba_vio.D
            carry = getattr(self, "_etv_prior_H", None)
            if carry is not None:
                prior_H[e0:, e0:] = carry
            else:
                prior_H[e0:, e0:] = np.eye(6) * 1.0
            # Pin the FULL E_T_V rotation in-window (reference: the t0
            # prior is rot-tight / translation-weak, Backend.cpp:2652-2663).
            # A 4-KF window spans a short arc where E_T_V yaw is
            # near-degenerate with translation; letting the window
            # re-estimate it measurably wandered the alignment (-3.7 ->
            # -10.4 deg over 3 windows) and dragged the poses with it.
            # Rotation updates come only from _refit_gps_alignment, which
            # fits the whole session's history after each window.
            for d in range(3):
                prior_H[e0 + d, e0 + d] = max(prior_H[e0 + d, e0 + d], 1e8)

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
        # the driver builds observations in the kf-blocked layout — the
        # VIO vision block assembles via one-hot block sums, not scatters
        result = ba_vio.vio_solve(problem, iters=iters, kf_blocked=True)
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
            # E_T_V is a global state: re-fit it against the WHOLE history
            # of GPS-carrying keyframes (the fixed-lag equivalent of the
            # reference's accumulated t0 factors — see _refit_gps_alignment;
            # the in-window estimate alone wanders on short arcs and the
            # earlier half-life information carry measurably froze in /
            # amplified the init bias). Fall back to the half-life carry of
            # the window's conditional block only while the history is too
            # small or too flat to fit.
            if not self._refit_gps_alignment():
                margH = np.asarray(result.marginal_H)
                e0 = K * ba_vio.D
                blk = margH[e0:, e0:]
                blk = (blk + blk.T) * 0.5
                self._etv_prior_H = np.clip(blk, -1e5, 1e5) * 0.5
        new_lms = np.asarray(result.landmarks)[: len(lm_ids)]
        self._map_update_positions(lm_ids, new_lms)
        self.cur_pose = window[-1].world_T_ref.copy()

        # stash the marginal information of the state that becomes oldest
        # when the window slides next keyframe (fixed-lag marginalization)
        if len(window) >= 2:
            margH = np.asarray(result.marginal_H)
            b0 = 1 * ba_vio.D  # second-oldest state block
            # CONDITIONAL block, deliberately (see _finish_pending_ba for
            # the vision-path rationale): the true Schur marginal was
            # evaluated here too and let the live tail drift ~0.4 m from
            # the batch-smoother optimum on the replay harness (vs < 0.3
            # with the conditional block) — the extra confidence anchors
            # the odometry chain.
            blk = margH[b0 : b0 + ba_vio.D, b0 : b0 + ba_vio.D]
            blk = (blk + blk.T) * 0.5
            # cap the prior so stale linearizations cannot over-constrain
            blk = np.clip(blk, -1e6, 1e6)
            self._marg_prior = (window[1].kf_id, blk)

