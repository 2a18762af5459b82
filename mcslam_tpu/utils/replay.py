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
    kf_ids = [k for k, _ in logs["x"]]
    kf_index = {k: i for i, k in enumerate(kf_ids)}
    poses = np.stack([p for _, p in logs["x"]]).astype(np.float32)
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
