"""TUM-format trajectory I/O — byte-compatible with the reference's
writeTrajectoryToFile (/root/reference/MCSlam/src/FrontEnd.cpp:1286-1324) so
external evaluation tooling (evo) applies unchanged.

Format: `timestamp tx ty tz qx qy qz qw` per line.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from mcslam_tpu.geometry import lie


def write_tum(path, timestamps, poses) -> None:
    """timestamps (F,), poses (F, 4, 4) world_T_cam -> TUM text file."""
    poses = np.asarray(poses)
    q = np.asarray(lie.quat_from_rot(jnp.asarray(poses[:, :3, :3])))
    t = poses[:, :3, 3]
    with open(path, "w") as f:
        for i, ts in enumerate(timestamps):
            f.write(
                f"{ts:.9f} {t[i,0]:.9f} {t[i,1]:.9f} {t[i,2]:.9f} "
                f"{q[i,0]:.9f} {q[i,1]:.9f} {q[i,2]:.9f} {q[i,3]:.9f}\n"
            )


def read_tum(path):
    """-> (timestamps (F,), poses (F, 4, 4))."""
    data = np.loadtxt(path)
    if data.ndim == 1:
        data = data[None]
    ts = data[:, 0]
    t = data[:, 1:4]
    q = data[:, 4:8]
    R = np.asarray(lie.rot_from_quat(jnp.asarray(q, jnp.float32)))
    poses = np.tile(np.eye(4, dtype=np.float32), (len(ts), 1, 1))
    poses[:, :3, :3] = R
    poses[:, :3, 3] = t
    return ts, poses
