"""Stereo rectification for general (non-parallel) rig pairs.

Parity (WHAT): DepthReconstructor::init
(/root/reference/MCSlam/src/DepthReconstructor.cpp:7-22) — cv::stereoRectify
(Bouguet's algorithm) + initUndistortRectifyMap + remap, producing the
row-aligned pair the disparity search requires and the Q matrix for
disparity -> depth.

HOW: the rectifying rotations/projections are tiny host-side numpy (runs
once per rig); the per-frame remap is a jitted bilinear gather on device.
The inverse maps fold undistortion in, so raw (distorted) images rectify
in one resampling pass, exactly like the reference's combined
initUndistortRectifyMap.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from mcslam_tpu.geometry import camera as cam_ops


def _rodrigues(w: np.ndarray) -> np.ndarray:
    th = np.linalg.norm(w)
    if th < 1e-12:
        return np.eye(3)
    k = w / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def _log_so3(R: np.ndarray) -> np.ndarray:
    c = np.clip((np.trace(R) - 1) / 2, -1.0, 1.0)
    th = np.arccos(c)
    if th < 1e-12:
        return np.zeros(3)
    return th / (2 * np.sin(th)) * np.array(
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]
    )


def stereo_rectify(fxycxy1, fxycxy2, R, t, image_size):
    """Bouguet rectification (cv::stereoRectify semantics, CALIB_ZERO_
    DISPARITY): R, t map cam1 points into cam2 (p2 = R p1 + t).

    Returns (R1, R2, fxycxy_new, Q): per-camera rectifying rotations
    (new_cam <- old_cam), the shared rectified pinhole intrinsics, and the
    4x4 disparity-to-depth matrix."""
    w, h = image_size
    # split the relative rotation evenly between the two cameras
    R = np.asarray(R, np.float64)
    t = np.asarray(t, np.float64)
    om = _log_so3(R)
    R_half2 = _rodrigues(-0.5 * om)  # applied to cam2
    R_half1 = _rodrigues(0.5 * om)  # applied to cam1
    # baseline vector FROM cam1 TO cam2 expressed in the half-rotated
    # frame: +x along it keeps cam1 the LEFT camera (positive disparity)
    pos2_in_1 = -(R.T @ t)
    b_half = R_half1 @ pos2_in_1
    e1 = b_half / max(np.linalg.norm(b_half), 1e-12)
    e2 = np.array([-e1[1], e1[0], 0.0])
    n2 = np.linalg.norm(e2)
    e2 = e2 / n2 if n2 > 1e-12 else np.array([0.0, 1.0, 0.0])
    e3 = np.cross(e1, e2)
    Rrect = np.stack([e1, e2, e3])  # rows
    R1 = Rrect @ R_half1
    R2 = Rrect @ R_half2
    # shared rectified intrinsics: mean focal, centered principal point
    f1 = np.asarray(fxycxy1, np.float64)
    f2 = np.asarray(fxycxy2, np.float64)
    f_new = 0.5 * (f1[:2].mean() + f2[:2].mean())
    cx, cy = (w - 1) * 0.5, (h - 1) * 0.5
    fxycxy_new = np.array([f_new, f_new, cx, cy], np.float32)
    B = float(np.linalg.norm(t))
    Q = np.array(
        [
            [1.0, 0.0, 0.0, -cx],
            [0.0, 1.0, 0.0, -cy],
            [0.0, 0.0, 0.0, f_new],
            [0.0, 0.0, 1.0 / B, 0.0],
        ],
        np.float32,
    )
    return (
        R1.astype(np.float32), R2.astype(np.float32), fxycxy_new, Q,
    )


def rectify_maps(fxycxy, dist, dist_model: int, R_rect, fxycxy_new,
                 image_size):
    """Inverse maps for one camera: for each RECTIFIED pixel, the source
    pixel in the ORIGINAL (distorted) image (initUndistortRectifyMap
    semantics). Host numpy; returns (map_x, map_y) float32 (H, W)."""
    w, h = image_size
    u, v = np.meshgrid(np.arange(w, dtype=np.float32),
                       np.arange(h, dtype=np.float32))
    xn = (u - fxycxy_new[2]) / fxycxy_new[0]
    yn = (v - fxycxy_new[3]) / fxycxy_new[1]
    rays = np.stack([xn, yn, np.ones_like(xn)], axis=-1).reshape(-1, 3)
    # rectified cam -> original cam: apply R_rect^T
    rays = rays @ np.asarray(R_rect, np.float32)  # == (R_rect^T @ r)^T rows
    z = np.maximum(rays[:, 2:3], 1e-6)
    xn_src = jnp.asarray(rays[:, :2] / z)
    xd = np.asarray(
        cam_ops.distort(xn_src, jnp.asarray(dist, jnp.float32), dist_model)
    )
    fx = np.asarray(fxycxy, np.float32)
    mx = (xd[:, 0] * fx[0] + fx[2]).reshape(h, w).astype(np.float32)
    my = (xd[:, 1] * fx[1] + fx[3]).reshape(h, w).astype(np.float32)
    return mx, my


@jax.jit
def remap_bilinear(img: jax.Array, map_x: jax.Array, map_y: jax.Array):
    """(H, W) image sampled at (map_x, map_y) with bilinear weights;
    out-of-bounds samples clamp (cv::remap BORDER_REPLICATE-ish)."""
    H, W = img.shape
    x0 = jnp.floor(map_x)
    y0 = jnp.floor(map_y)
    fx = map_x - x0
    fy = map_y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    v00 = img[y0i, x0i]
    v01 = img[y0i, x1i]
    v10 = img[y1i, x0i]
    v11 = img[y1i, x1i]
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


class RigRectifier:
    """Per-rig-pair rectification bundle: host-computed maps, device remap.

    Usage:
        rr = RigRectifier(rig, cam_a, cam_b)
        la, lb = rr.rectify(imgs[cam_a]), rr.rectify_b(imgs[cam_b])
        depth = rr.depth_from_disparity(disp)
    """

    def __init__(self, rig, cam_a: int = 0, cam_b: int = 1):
        cam_T_ref = np.asarray(rig.cam_T_ref)
        T_ab = cam_T_ref[cam_b] @ np.linalg.inv(cam_T_ref[cam_a])
        R = T_ab[:3, :3]
        t = T_ab[:3, 3]
        fx = np.asarray(rig.fxycxy)
        dist = np.asarray(rig.dist)
        size = tuple(int(s) for s in np.asarray(rig.image_size))
        R1, R2, f_new, Q = stereo_rectify(fx[cam_a], fx[cam_b], R, t, size)
        self.fxycxy_new = f_new
        self.Q = Q
        self.baseline = float(np.linalg.norm(t))
        self.R_a = R1  # rect-from-cam_a rotation (unprojection needs it)
        self.map_a = rectify_maps(
            fx[cam_a], dist[cam_a], rig.dist_model, R1, f_new, size
        )
        self.map_b = rectify_maps(
            fx[cam_b], dist[cam_b], rig.dist_model, R2, f_new, size
        )
        # unrectified-parallel shortcut detection: identity rotations mean
        # the pair was already row-aligned
        self.is_identity = (
            np.abs(R1 - np.eye(3)).max() < 1e-5
            and np.abs(R2 - np.eye(3)).max() < 1e-5
        )

    def rectify(self, img_a: jax.Array) -> jax.Array:
        return remap_bilinear(
            img_a, jnp.asarray(self.map_a[0]), jnp.asarray(self.map_a[1])
        )

    def rectify_b(self, img_b: jax.Array) -> jax.Array:
        return remap_bilinear(
            img_b, jnp.asarray(self.map_b[0]), jnp.asarray(self.map_b[1])
        )

    def depth_from_disparity(self, disp: jax.Array,
                             min_disp: float = 0.5) -> jax.Array:
        """Z in the RECTIFIED cam_a frame: Z = f_new * B / d."""
        return (
            float(self.fxycxy_new[0]) * self.baseline
            / jnp.maximum(disp, min_disp)
        )
