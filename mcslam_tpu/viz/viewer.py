"""Map / trajectory visualization.

Parity (WHAT): the reference's Pangolin OpenGlViewer
(/root/reference/MCSlam/src/OpenGlViewer.cpp) — camera frusta for all poses,
map points, follow view. A live GL window makes no sense on a headless TPU
host; this renders the same content to image files (matplotlib) either
offline from a finished session or incrementally every N frames, and also
from saved TUM/JSON-map artifacts so a workstation can inspect a remote run.
"""

from __future__ import annotations

import numpy as np


def _frustum_segments(pose, scale=0.15, aspect=0.75):
    """Line segments of a camera frustum wireframe in world coords."""
    w = scale
    h = scale * aspect
    z = scale * 1.6
    pts = np.array(
        [[0, 0, 0], [-w, -h, z], [w, -h, z], [w, h, z], [-w, h, z]], np.float64
    )
    pts = pts @ pose[:3, :3].T + pose[:3, 3]
    idx = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (3, 4), (4, 1)]
    return [(pts[i], pts[j]) for i, j in idx]


def render_map(
    path,
    keyframe_poses,
    landmarks=None,
    trajectory=None,
    gt_trajectory=None,
    title="mcslam_tpu map",
    elev=-70.0,
    azim=-90.0,
):
    """Write a 3D overview PNG: frusta (keyframes), points (landmarks),
    lines (trajectories)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(10, 8))
    ax = fig.add_subplot(111, projection="3d")
    if landmarks is not None and len(landmarks):
        lm = np.asarray(landmarks)
        ax.scatter(lm[:, 0], lm[:, 1], lm[:, 2], s=1, c="k", alpha=0.4,
                   label=f"landmarks ({len(lm)})")
    for pose in np.asarray(keyframe_poses):
        for a, b in _frustum_segments(pose):
            ax.plot([a[0], b[0]], [a[1], b[1]], [a[2], b[2]], "b-", lw=0.6)
    if trajectory is not None and len(trajectory):
        tr = np.asarray(trajectory)
        ax.plot(tr[:, 0], tr[:, 1], tr[:, 2], "g-", lw=1.5, label="estimate")
    if gt_trajectory is not None and len(gt_trajectory):
        gt = np.asarray(gt_trajectory)
        ax.plot(gt[:, 0], gt[:, 1], gt[:, 2], "r--", lw=1.0,
                label="ground truth")
    ax.set_title(title)
    ax.legend(loc="upper right", fontsize=8)
    ax.view_init(elev=elev, azim=azim)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def render_session(path, slam, gt_poses=None):
    """Render a MultiCameraSLAM session to a PNG."""
    kf_poses = [kf.world_T_ref for kf in slam.keyframes]
    lms = slam.map.pos[slam.map.valid]
    _, est = slam.trajectory_arrays()
    gt = None if gt_poses is None else np.asarray(gt_poses)[:, :3, 3]
    render_map(
        path, kf_poses, lms, est[:, :3, 3], gt,
        title=f"{slam.stats['keyframes']} KFs, {slam.map.num_valid} landmarks",
    )


def render_tracks(path, img, kp_xy, matched_mask=None):
    """2D feature overlay (the reference's tracked-features window)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 6))
    ax.imshow(np.asarray(img), cmap="gray")
    xy = np.asarray(kp_xy)
    if matched_mask is not None:
        m = np.asarray(matched_mask)
        ax.plot(xy[~m, 0], xy[~m, 1], "r.", ms=2)
        ax.plot(xy[m, 0], xy[m, 1], "g.", ms=3)
    else:
        ax.plot(xy[:, 0], xy[:, 1], "g.", ms=3)
    ax.set_axis_off()
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
