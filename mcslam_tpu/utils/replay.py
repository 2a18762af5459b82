"""Offline backend replay: rebuild and re-optimize the factor graph from a
recorded graph_logs stream.

Parity (WHAT): the reference's reduced_camera_system tool
(/root/reference/MCSlam/src/tests_misc/reduced_camera_system.cpp) — its
integration-test strategy for the backend: the log file IS the fake backend
input, so multi-sensor fusion is testable without sensors, and reruns are
deterministic.

Input: graph_logs records (x, l, e, imu_raw, g — see utils/mapio.py).
Output: optimized poses/landmarks + the before/after costs.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from mcslam_tpu.backend import ba
from mcslam_tpu.utils import mapio


def replay_graph_logs(
    path,
    cam_T_ref,
    fxycxy,
    iters: int = 15,
    huber_px: float = 2.5,
    obs_capacity: int = 65536,
):
    """Re-optimize the logged vision graph with batch LM + Schur.

    Returns dict with kf_ids, poses_in, poses_out, lm_ids, lms_in, lms_out,
    cost_in, cost_out.
    """
    logs = mapio.read_graph_logs(path)
    kf_ids = [k for k, _, _ in logs["x"]]
    kf_index = {k: i for i, k in enumerate(kf_ids)}
    poses = np.stack([p for _, _, p in logs["x"]]).astype(np.float32)
    lm_ids = [l for l, _ in logs["l"]]
    lm_index = {l: i for i, l in enumerate(lm_ids)}
    lms = np.stack([p for _, p in logs["l"]]).astype(np.float32)

    K, L = len(kf_ids), len(lm_ids)
    edges = [
        (kf_index[k], c, lm_index[l], u, v)
        for (k, c, l, u, v) in logs["e"]
        if k in kf_index and l in lm_index
    ]
    O = obs_capacity
    n = min(len(edges), O)
    obs_kf = np.zeros(O, np.int32)
    obs_cam = np.zeros(O, np.int32)
    obs_lm = np.zeros(O, np.int32)
    obs_uv = np.zeros((O, 2), np.float32)
    for i, (k, c, l, u, v) in enumerate(edges[:n]):
        obs_kf[i], obs_cam[i], obs_lm[i] = k, c, l
        obs_uv[i] = (u, v)
    obs = ba.BAObservations(
        kf=jnp.asarray(obs_kf), cam=jnp.asarray(obs_cam),
        lm=jnp.asarray(obs_lm), uv=jnp.asarray(obs_uv),
        sigma2=jnp.ones(O, jnp.float32),
        valid=jnp.asarray(np.arange(O) < n),
    )
    prior_H = np.zeros((K * 6, K * 6), np.float32)
    prior_H[:6, :6] = np.eye(6) * 1e6
    problem = ba.BAProblem(
        poses=jnp.asarray(poses), landmarks=jnp.asarray(lms),
        lm_valid=jnp.ones(L, bool), obs=obs,
        cam_T_ref=jnp.asarray(cam_T_ref, jnp.float32),
        fxycxy=jnp.asarray(fxycxy, jnp.float32),
        prior_H=jnp.asarray(prior_H), prior_b=jnp.zeros(K * 6, jnp.float32),
        kf_valid=jnp.ones(K, bool),
    )
    cost_in = float(ba._total_cost(problem, huber_px))
    result = ba.ba_solve(problem, iters=iters)
    return {
        "kf_ids": kf_ids,
        "poses_in": poses,
        "poses_out": np.asarray(result.poses),
        "lm_ids": lm_ids,
        "lms_in": lms,
        "lms_out": np.asarray(result.landmarks),
        "cost_in": cost_in,
        "cost_out": float(result.cost),
        "n_obs": n,
        "inliers": int(result.num_inliers),
    }


def replay_graph_logs_vio(
    path,
    cam_T_body,
    fxycxy,
    body_T_cam0=None,
    imu_params=None,
    iters: int = 10,
    huber_px: float = 2.5,
    obs_capacity: int = 65536,
    gps_sigma: float = 0.5,
    loop_sigma_rot: float = 0.05,
    loop_sigma_trans: float = 0.05,
    g_norm: float = 9.81,
):
    """Rebuild the FULL multi-sensor backend graph from graph_logs and
    re-optimize: vision ('x'/'l'/'e'), IMU ('imu_raw' re-preintegrated per
    keyframe gap), GPS ('g'), and loop closures ('m' extra vision
    observations + 'k' SE(3) between factors).

    Parity (WHAT): the reference's reduced_camera_system replay tool
    (/root/reference/MCSlam/src/tests_misc/reduced_camera_system.cpp) —
    its strongest integration-test pattern: the log file IS the backend
    input, so the complete fusion stack re-optimizes deterministically
    without sensors.

    Logged 'x' poses are world_T_ref (camera-0 frame, like the reference's
    f->pose); `body_T_cam0` converts to the body states the IMU/GPS factors
    constrain (identity when vision-only extrinsics are trivial).
    """
    import jax.numpy as jnp

    from mcslam_tpu.backend import ba_vio
    from mcslam_tpu.backend import imu as imu_mod

    if imu_params is None:
        imu_params = imu_mod.ImuParams(g_norm=g_norm)
    if body_T_cam0 is None:
        body_T_cam0 = np.eye(4, dtype=np.float32)
    inv_btc0 = np.linalg.inv(body_T_cam0)

    logs = mapio.read_graph_logs(path)
    kf_ids = [k for k, _, _ in logs["x"]]
    kf_ts = np.array([t for _, t, _ in logs["x"]])
    kf_index = {k: i for i, k in enumerate(kf_ids)}
    # states are world_T_body = world_T_ref @ inv(body_T_cam0)^-1
    poses_ref = np.stack([p for _, _, p in logs["x"]]).astype(np.float32)
    poses_body = np.einsum("nij,jk->nik", poses_ref, inv_btc0).astype(
        np.float32
    )
    lm_ids = [l for l, _ in logs["l"]]
    lm_index = {l: i for i, l in enumerate(lm_ids)}
    lms = (
        np.stack([p for _, p in logs["l"]]).astype(np.float32)
        if lm_ids else np.zeros((1, 3), np.float32)
    )
    K, L = len(kf_ids), max(len(lm_ids), 1)

    # vision edges + loop measurements ('m' records are extra observations
    # of the query keyframe, exactly how the live path digests them:
    # Backend::addLoopClosure appends to the smart factors,
    # /root/reference/MCSlam/src/Backend.cpp:1871-1901)
    edges = [
        (kf_index[k], c, lm_index[l], u, v)
        for (k, c, l, u, v) in logs["e"] + logs["m"]
        if k in kf_index and l in lm_index
    ]
    O = obs_capacity
    n = min(len(edges), O)
    obs_kf = np.zeros(O, np.int32)
    obs_cam = np.zeros(O, np.int32)
    obs_lm = np.zeros(O, np.int32)
    obs_uv = np.zeros((O, 2), np.float32)
    for i, (k, c, l, u, v) in enumerate(edges[:n]):
        obs_kf[i], obs_cam[i], obs_lm[i] = k, c, l
        obs_uv[i] = (u, v)
    obs = ba.BAObservations(
        kf=jnp.asarray(obs_kf), cam=jnp.asarray(obs_cam),
        lm=jnp.asarray(obs_lm), uv=jnp.asarray(obs_uv),
        sigma2=jnp.ones(O, jnp.float32),
        valid=jnp.asarray(np.arange(O) < n),
    )

    # IMU: re-preintegrate raw samples over each consecutive-keyframe gap
    imu_factors = None
    vels = np.zeros((K, 3), np.float32)
    if logs["imu_raw"] and np.any(np.diff(kf_ts) > 0):
        samples = sorted(logs["imu_raw"], key=lambda s: s[0])
        s_ts = np.array([s[0] for s in samples])
        preints, pairs = [], []
        for i in range(K - 1):
            t0, t1 = kf_ts[i], kf_ts[i + 1]
            sel = np.nonzero((s_ts > t0) & (s_ts <= t1))[0]
            if len(sel) < 3:  # reference imu_message_empty gate
                continue
            ts = s_ts[sel]
            dts = np.clip(np.diff(ts, prepend=t0), 1e-4, 0.1).astype(
                np.float32
            )
            gyro = np.stack([samples[s][1] for s in sel]).astype(np.float32)
            accel = np.stack([samples[s][2] for s in sel]).astype(np.float32)
            pre = imu_mod.preintegrate(
                jnp.asarray(dts), jnp.asarray(gyro), jnp.asarray(accel),
                jnp.ones(len(sel), bool), jnp.zeros(6, jnp.float32),
                imu_params,
            )
            preints.append(pre)
            pairs.append((i, i + 1))
        if preints:
            imu_factors = ba_vio.make_imu_factors(
                preints, pairs, capacity=max(len(preints), 1),
                params=imu_params,
            )
            # seed velocities by finite differences of logged positions
            dp = np.diff(poses_body[:, :3, 3], axis=0)
            dt = np.maximum(np.diff(kf_ts), 1e-3)[:, None]
            v = dp / dt
            vels[:-1] = v
            vels[-1] = v[-1]

    # GPS factors
    gps_factors = None
    g_recs = [(k, e) for (k, e, _) in logs["g"] if k in kf_index]
    if g_recs:
        G = len(g_recs)
        gps_factors = ba_vio.GpsFactors(
            kf=jnp.asarray([kf_index[k] for k, _ in g_recs], jnp.int32),
            enu=jnp.asarray(np.stack([e for _, e in g_recs]), jnp.float32),
            t_bg=jnp.zeros(3, jnp.float32),
            sigma=jnp.full(G, gps_sigma, jnp.float32),
            valid=jnp.ones(G, bool),
        )

    # loop relative poses -> between factors (measured in the ref-cam
    # frame; conjugate into body: b_T_b' = Tbc * c_T_c' * Tbc^-1)
    between = None
    k_recs = [
        (kf_index[q], kf_index[m], rel)
        for (q, m, rel) in logs["k"]
        if q in kf_index and m in kf_index
    ]
    if k_recs:
        B = len(k_recs)
        rels = np.stack(
            [body_T_cam0 @ rel @ inv_btc0 for (_, _, rel) in k_recs]
        ).astype(np.float32)
        # 'k' records store match_T_query (slam._close_loop loop-edge
        # convention); the factor is i=match, j=query with i_T_j = rel
        between = ba_vio.BetweenFactors(
            i=jnp.asarray([m for (_, m, _) in k_recs], jnp.int32),
            j=jnp.asarray([q for (q, _, _) in k_recs], jnp.int32),
            rel=jnp.asarray(rels, jnp.float32),
            sigma_rot=jnp.full(B, loop_sigma_rot, jnp.float32),
            sigma_trans=jnp.full(B, loop_sigma_trans, jnp.float32),
            valid=jnp.ones(B, bool),
        )

    D = ba_vio.D
    N = K * D + 6
    prior_H = np.zeros((N, N), np.float32)
    prior_H[:6, :6] = np.eye(6) * 1e6  # gauge anchor on kf0 pose
    if imu_factors is None:
        # no IMU: clamp all vel/bias sub-blocks (unobserved otherwise)
        for i in range(K):
            r0 = i * D + 6
            prior_H[r0:r0 + 9, r0:r0 + 9] = np.eye(9) * 1e6
    else:
        # weak bias prior (reference insert_priors_smartFactor)
        for i in range(K):
            r0 = i * D + 9
            prior_H[r0:r0 + 6, r0:r0 + 6] = np.eye(6) * 1e2
    if gps_factors is None:
        prior_H[K * D:, K * D:] = np.eye(6) * 1e6  # E_T_V unobserved

    cam_T_body_arr = np.asarray(cam_T_body, np.float32)

    problem = ba_vio.VioProblem(
        poses=jnp.asarray(poses_body),
        vels=jnp.asarray(vels),
        biases=jnp.zeros((K, 6), jnp.float32),
        landmarks=jnp.asarray(lms),
        lm_valid=jnp.asarray(np.arange(L) < len(lm_ids)),
        obs=obs,
        cam_T_body=jnp.asarray(cam_T_body_arr),
        fxycxy=jnp.asarray(fxycxy, jnp.float32),
        imu=imu_factors,
        gps=gps_factors,
        E_T_V=jnp.eye(4, dtype=jnp.float32),
        prior_H=jnp.asarray(prior_H),
        prior_b=jnp.zeros(N, jnp.float32),
        kf_valid=jnp.ones(K, bool),
        g_norm=imu_params.g_norm,
        between=between,
    )
    cost_in = float(ba_vio._vio_cost(problem, huber_px))
    result = ba_vio.vio_solve(problem, iters=iters)
    poses_out_ref = np.einsum(
        "nij,jk->nik", np.asarray(result.poses), body_T_cam0
    )
    return {
        "kf_ids": kf_ids,
        "kf_ts": kf_ts,
        "poses_in": poses_ref,
        "poses_out": poses_out_ref.astype(np.float32),
        "poses_body_out": np.asarray(result.poses),
        "vels_out": np.asarray(result.vels),
        "lm_ids": lm_ids,
        "lms_out": np.asarray(result.landmarks),
        "E_T_V": np.asarray(result.E_T_V),
        "cost_in": cost_in,
        "cost_out": float(result.cost),
        "n_obs": n,
        "n_imu": 0 if imu_factors is None else int(
            np.sum(np.asarray(imu_factors.valid))
        ),
        "n_gps": 0 if gps_factors is None else len(g_recs),
        "n_loop": 0 if between is None else len(k_recs),
    }
