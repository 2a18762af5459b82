"""Sensor-ingestion half of the SLAM driver (mixin): IMU buffering +
gravity init + preintegration spans, GPS ENU conversion + Kabsch init +
keyframe attachment + IMU-predicted dummy keyframes (split out of
slam.py)."""

from __future__ import annotations


import jax.numpy as jnp
import numpy as np

from mcslam_tpu.backend import imu as imu_mod
from mcslam_tpu.geometry import alignment
from mcslam_tpu.geometry.geodesy import EnuConverter

from mcslam_tpu.keyframe import Keyframe


class SensorsMixin:
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

                g = np.stack([s[0] for s in self._imu_init_buf])
                a = np.stack([s[1] for s in self._imu_init_buf])
                R_wb, bias = imu_mod.init_gravity_aligned(
                    jnp.asarray(a, jnp.float32), jnp.asarray(g, jnp.float32),
                    jnp.ones(len(a), bool), self.imu_params,
                )
                self.bias = np.asarray(bias)
                if self.relocalizer is None:
                    # world frame = gravity-aligned body frame at init
                    # (in map-reuse mode the world frame comes from the
                    # loaded map — don't clobber the localized pose)
                    pose = np.eye(4, dtype=np.float32)
                    pose[:3, :3] = np.asarray(R_wb)
                    self.cur_pose = pose
                self.imu_initialized = True
                self._imu_buf = [
                    s for s in self._imu_buf if s[0] >= 0
                ]  # keep history

    def _preintegrate_span(self, t0, t1):
        """Preintegrate buffered IMU samples with t0 < ts <= t1."""

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

        ts, lla = gps
        for k in range(len(ts)):
            if self.enu_converter is None:
                self.enu_converter = EnuConverter(*lla[k])
            enu = self.enu_converter.to_enu(*lla[k])
            self._gps_buf.append((float(ts[k]), enu))

    def _try_gps_init(self):
        """Align buffered fixes to interpolated VIO positions (reference
        gps_initialize_kabsch, >= 15 fix buffer).

        With a gravity-aligned (IMU-initialized) world frame, both frames
        share the up axis, so the true E_T_V rotation is a pure yaw: fit
        yaw + translation only (a full 3-DoF Kabsch on a short near-linear
        track is degenerate about the track direction — the garbage
        roll/pitch then fights the vision factors and diverges the window
        solve). Without IMU, fall back to full Kabsch but require
        non-planar-degenerate geometry first."""
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
        V = np.stack(pts_v).astype(np.float64)
        E = np.stack(pts_e).astype(np.float64)
        Vc = V - V.mean(axis=0)
        Ec = E - E.mean(axis=0)

        gravity_aligned = self.use_imu and self.imu_initialized
        if gravity_aligned:
            # horizontal spread must dominate the noise for yaw to be
            # observable. The initial yaw is necessarily rough on a short
            # track (a few degrees); what keeps that benign is that the
            # window solve can NEVER rotate E_T_V (rot-pinned prior,
            # driver_window) — only _refit_gps_alignment updates the
            # rotation, and only once the session has real geometry.
            ext = 2.0 * np.linalg.norm(Vc[:, :2], axis=1).max()
            if ext < 3.0 * self.cfg.gps_sigma:
                return
            # 2D Procrustes: yaw from the xy cross-covariance
            M = Ec[:, :2].T @ Vc[:, :2]
            yaw = np.arctan2(M[1, 0] - M[0, 1], M[0, 0] + M[1, 1])
            c, s = np.cos(yaw), np.sin(yaw)
            R = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
        else:
            # full Kabsch needs 3D shape: second singular value of the
            # centered cloud above the noise floor
            sv = np.linalg.svd(Vc, compute_uv=False)
            if sv[1] < 3.0 * self.cfg.gps_sigma:
                return
            Rj, tj, _ = alignment.kabsch(
                jnp.asarray(V, jnp.float32), jnp.asarray(E, jnp.float32)
            )
            R = np.asarray(Rj, np.float64)
        t = E.mean(axis=0) - R @ V.mean(axis=0)
        self.E_T_V = np.eye(4, dtype=np.float32)
        self.E_T_V[:3, :3] = R.astype(np.float32)
        self.E_T_V[:3, 3] = t.astype(np.float32)
        self.gps_initialized = True

    def _refit_gps_alignment(self) -> bool:
        """Re-fit E_T_V against the WHOLE session's GPS-carrying keyframes.

        The reference keeps the alignment 't0' as one ISAM2 variable that
        every GPS factor of the session constrains (Backend.cpp:2652-2663,
        3170) — its estimate only sharpens with time. A fixed-lag window
        sees ~4 of those factors at once, and on a short arc E_T_V yaw is
        near-degenerate with translation, so the in-window estimate WANDERS
        (measured: the -3.7 deg Kabsch init drifted to -10.4 deg over 3
        windows on a degraded-vision drive, dragging GPS-fused ATE 2x above
        VIO-only). This host-side Procrustes over all (keyframe, fix) pairs
        is the fixed-lag equivalent of the accumulated constraint: O(n)
        per call, and it cannot wander because the whole history votes.
        Returns True when a re-fit was applied (caller then carries the
        fit's information into the next window's E_T_V prior)."""
        if len(self.kf_gps) < 4:
            return False
        inv_btc0 = np.linalg.inv(
            np.asarray(self.rig.body_T_cam, np.float64)[0]
        )
        by_id = {k.kf_id: k for k in self.keyframes}
        pts_v, pts_e = [], []
        for kf_id, enu in self.kf_gps.items():
            kf = by_id.get(kf_id)
            if kf is None:
                continue
            wTb = np.asarray(kf.world_T_ref, np.float64) @ inv_btc0
            pts_v.append(wTb[:3, 3] + wTb[:3, :3] @ self.gps_lever_arm)
            pts_e.append(np.asarray(enu, np.float64))
        if len(pts_v) < 4:
            return False
        V = np.stack(pts_v)
        E = np.stack(pts_e)
        Vc = V - V.mean(axis=0)
        Ec = E - E.mean(axis=0)
        if self.use_imu and self.imu_initialized:
            # gravity-aligned worlds: yaw-only (see _try_gps_init)
            spread2 = float((Vc[:, :2] ** 2).sum(axis=1).mean())
            if spread2 < (2.0 * self.cfg.gps_sigma) ** 2:
                return False
            M = Ec[:, :2].T @ Vc[:, :2]
            yaw = np.arctan2(M[1, 0] - M[0, 1], M[0, 0] + M[1, 1])
            c, s = np.cos(yaw), np.sin(yaw)
            R = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
        else:
            sv = np.linalg.svd(Vc, compute_uv=False)
            if sv[1] < 3.0 * self.cfg.gps_sigma:
                return False
            Rj, _, _ = alignment.kabsch(
                jnp.asarray(V, jnp.float32), jnp.asarray(E, jnp.float32)
            )
            R = np.asarray(Rj, np.float64)
            spread2 = float((Vc ** 2).sum(axis=1).mean())
        t = E.mean(axis=0) - R @ V.mean(axis=0)
        self.E_T_V = np.eye(4, dtype=np.float32)
        self.E_T_V[:3, :3] = R.astype(np.float32)
        self.E_T_V[:3, 3] = t.astype(np.float32)
        # information of the fit, for the next window's E_T_V prior
        # (right-retract (omega, v) tangent): n/sigma^2 on translation,
        # n*spread^2/sigma^2 on rotation (a yaw perturbation moves a point
        # by ~its horizontal radius). Diagonal is enough — the fit is
        # recomputed after every window, the prior only has to stop the
        # in-window estimate from wandering between refits.
        n = len(pts_v)
        inv_s2 = 1.0 / max(float(self.cfg.gps_sigma) ** 2, 1e-12)
        H = np.zeros((6, 6), np.float32)
        H[:3, :3] = np.eye(3) * n * spread2 * inv_s2
        H[3:, 3:] = np.eye(3) * n * inv_s2
        self._etv_prior_H = np.clip(H, -1e7, 1e7)
        return True

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
            if (prev is not None
                    and np.linalg.norm(best - prev)
                    < self.cfg.gps_min_move):
                return
            self._set_kf_gps(kf.kf_id, best)
            self._gps_last_enu = best
            self._gps_buf = [
                (t, e) for (t, e) in self._gps_buf if t != best_t
            ]
        if self.gps_initialized:
            # fixes that can never attach anymore (the Kabsch init path
            # still needs the full buffer before gps_initialized): without
            # this, a vision+GPS session with no (initialized) IMU grows
            # the buffer — and this linear scan — for the whole session
            horizon = kf.timestamp - 1.0
            self._gps_buf = [
                (t, e) for (t, e) in self._gps_buf if t > horizon
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

        body_T_cam0 = np.asarray(self.rig.body_T_cam)[0]
        inv_btc0 = np.linalg.inv(body_T_cam0)
        # consumed fixes are tracked by buffer index, not timestamp —
        # distinct fixes may legitimately share a timestamp
        consumed: set[int] = set()
        order = sorted(
            range(len(self._gps_buf)), key=lambda i: self._gps_buf[i][0]
        )
        for bi in order:
            t, enu = self._gps_buf[bi]
            last_kf = self.keyframes[-1]
            if t <= last_kf.timestamp or t > t_now:
                continue
            prev = getattr(self, "_gps_last_enu", None)
            if (prev is not None
                    and np.linalg.norm(enu - prev) < self.cfg.gps_min_move):
                continue  # reference: reject fixes that barely moved
            if t - last_kf.timestamp < self.GPS_MERGE_DT:
                # near-simultaneous with the last keyframe: merge into it
                # (reference change_vision_kf_info, Backend.cpp:2699-2741)
                if last_kf.kf_id not in self.kf_gps:
                    self._set_kf_gps(last_kf.kf_id, enu)
                    self._gps_last_enu = enu
                    consumed.add(bi)
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
            consumed.add(bi)
        if consumed:
            self._gps_buf = [
                f for i, f in enumerate(self._gps_buf) if i not in consumed
            ]
            # the new state nodes need the optimizer to see them
            self._run_window_ba()
        # prune fixes that can never attach anymore (post-init only;
        # the Kabsch init needs the full buffer)
        horizon = self.keyframes[-1].timestamp - 1.0
        self._gps_buf = [(t, e) for (t, e) in self._gps_buf if t > horizon]

