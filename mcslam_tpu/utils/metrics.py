"""Trajectory evaluation: ATE / RPE, replacing the external `evo` toolkit
used by the reference's evaluation workflow
(/root/reference/evaluation.md:1-27, scripts/python/compute_drift.py).

ATE: Umeyama/SE(3)-align estimate to ground truth, RMSE of translation.
RPE: relative pose error over a fixed frame delta.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from mcslam_tpu.geometry import alignment, lie


def associate(ts_est, ts_gt, max_dt=0.02):
    """Greedy nearest-timestamp association -> (idx_est, idx_gt)."""
    ie, ig = [], []
    j = 0
    for i, t in enumerate(ts_est):
        j = int(np.argmin(np.abs(ts_gt - t)))
        if abs(ts_gt[j] - t) <= max_dt:
            ie.append(i)
            ig.append(j)
    return np.asarray(ie, int), np.asarray(ig, int)


def ate_rmse(poses_est, poses_gt, align: bool = True, with_scale: bool = False):
    """Absolute trajectory error RMSE (meters) after SE(3) (or Sim(3)) align."""
    p_est = np.asarray(poses_est)[:, :3, 3]
    p_gt = np.asarray(poses_gt)[:, :3, 3]
    if align:
        R, t, s = alignment.kabsch(
            jnp.asarray(p_est, jnp.float32),
            jnp.asarray(p_gt, jnp.float32),
            estimate_scale=with_scale,
        )
        p_al = float(s) * p_est @ np.asarray(R).T + np.asarray(t)
    else:
        p_al = p_est
    err = np.linalg.norm(p_al - p_gt, axis=-1)
    return float(np.sqrt(np.mean(err**2)))


def drift(poses_est, poses_gt, segment_fractions=(0.1, 0.2, 0.3, 0.4, 0.5)):
    """KITTI-style odometric drift: (translation drift [% of segment
    length], rotation error [rad/m]), averaged over all sub-segments whose
    ground-truth path length matches each requested fraction of the total.

    These are the two accuracy numbers the reference publishes for its
    real-rig sequences (/root/reference/README.md:239-240, computed there
    by scripts/python/compute_drift.py via the evo toolkit); KITTI uses
    fixed 100–800 m segments, which we scale to the scene as fractions of
    the total trajectory length so synthetic-scale drives produce
    comparable relative numbers.
    """
    pe = np.asarray(poses_est)
    pg = np.asarray(poses_gt)
    step = np.linalg.norm(np.diff(pg[:, :3, 3], axis=0), axis=1)
    cum = np.concatenate([[0.0], np.cumsum(step)])
    total = float(cum[-1])
    t_errs, r_errs = [], []
    for frac in segment_fractions:
        seg_len = total * frac
        if seg_len <= 1e-9:
            continue
        targets = cum + seg_len
        ends = np.searchsorted(cum, targets)
        for i in range(len(pe)):
            j = int(ends[i])
            if j >= len(pe):
                break
            d_est = np.linalg.inv(pe[i]) @ pe[j]
            d_gt = np.linalg.inv(pg[i]) @ pg[j]
            e = np.linalg.inv(d_gt) @ d_est
            seg = cum[j] - cum[i]
            if seg <= 1e-9:
                continue
            t_errs.append(np.linalg.norm(e[:3, 3]) / seg)
            w = np.asarray(lie.so3_log(jnp.asarray(e[:3, :3], jnp.float32)))
            r_errs.append(np.linalg.norm(w) / seg)
    if not t_errs:
        return float("nan"), float("nan")
    return 100.0 * float(np.mean(t_errs)), float(np.mean(r_errs))


def rpe(poses_est, poses_gt, delta: int = 1):
    """Relative pose error: (trans_rmse [m/step], rot_rmse [rad/step])."""
    pe = np.asarray(poses_est)
    pg = np.asarray(poses_gt)
    n = len(pe) - delta
    terr, rerr = [], []
    for i in range(n):
        d_est = np.linalg.inv(pe[i]) @ pe[i + delta]
        d_gt = np.linalg.inv(pg[i]) @ pg[i + delta]
        e = np.linalg.inv(d_gt) @ d_est
        terr.append(np.linalg.norm(e[:3, 3]))
        w = np.asarray(lie.so3_log(jnp.asarray(e[:3, :3], jnp.float32)))
        rerr.append(np.linalg.norm(w))
    return float(np.sqrt(np.mean(np.square(terr)))), float(
        np.sqrt(np.mean(np.square(rerr)))
    )
