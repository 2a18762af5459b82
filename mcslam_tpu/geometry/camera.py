"""Pinhole camera models with radial-tangential / equidistant distortion.

Everything is batched, differentiable, static-shape. A camera rig is a struct
of stacked per-camera arrays so the camera axis is a vmap/batch dimension
(the TPU-native replacement for the reference's per-camera threads).

Parity notes (WHAT, not HOW — re-designed for XLA):
  * intrinsics/extrinsics layout mirrors CamArrayConfig
    (/root/reference/MCDataUtils/src/CamArrayConfig.cpp): per-camera K, dist
    coefficients, and camera-from-reference extrinsic chains cam_T_ref.
  * undistortion replaces cv::undistortPoints usage in
    /root/reference/MCSlam/src/MultiCameraFrame.cpp:300 (UndistortKeyPoints)
    via a fixed-iteration Newton/fixed-point solve (jit-friendly).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from mcslam_tpu.geometry import lie

# distortion model ids (static python ints used with lax.switch-free dispatch)
DIST_NONE = 0
DIST_RADTAN = 1  # k1, k2, p1, p2[, k3]
DIST_EQUIDISTANT = 2  # k1, k2, k3, k4 (Kannala-Brandt / fisheye)


@flax.struct.dataclass
class CameraRig:
    """Stacked per-camera calibration for an N-camera rigid rig.

    Fields:
      fxycxy:     (N, 4) fx, fy, cx, cy
      dist:       (N, 5) distortion coefficients, zero-padded
      cam_T_ref:  (N, 4, 4) camera-from-reference-camera extrinsics
                  (cam 0 is the reference: cam_T_ref[0] == I)
      body_T_cam: (N, 4, 4) camera in body/IMU frame (Tbc chain); identity rig
                  when no IMU is configured.
      image_size: (2,) static (width, height)
      dist_model: static int, one of DIST_*
    """

    fxycxy: jax.Array
    dist: jax.Array
    cam_T_ref: jax.Array
    body_T_cam: jax.Array
    image_size: tuple = flax.struct.field(pytree_node=False)
    dist_model: int = flax.struct.field(pytree_node=False, default=DIST_RADTAN)

    @property
    def num_cams(self) -> int:
        return self.fxycxy.shape[0]

    @property
    def ref_T_cam(self) -> jax.Array:
        return lie.se3_inverse(self.cam_T_ref)

    def K(self) -> jax.Array:
        """(N, 3, 3) intrinsic matrices."""
        fx, fy, cx, cy = (self.fxycxy[:, i] for i in range(4))
        z = jnp.zeros_like(fx)
        o = jnp.ones_like(fx)
        return jnp.stack(
            [
                jnp.stack([fx, z, cx], axis=-1),
                jnp.stack([z, fy, cy], axis=-1),
                jnp.stack([z, z, o], axis=-1),
            ],
            axis=-2,
        )


def make_rig(
    fxycxy,
    dist=None,
    cam_T_ref=None,
    body_T_cam=None,
    image_size=(640, 480),
    dist_model=DIST_RADTAN,
) -> CameraRig:
    fxycxy = jnp.asarray(fxycxy, jnp.float32)
    if fxycxy.ndim == 1:
        fxycxy = fxycxy[None]
    n = fxycxy.shape[0]
    if dist is None:
        dist = jnp.zeros((n, 5), jnp.float32)
        dist_model = DIST_NONE
    else:
        dist = jnp.asarray(dist, jnp.float32)
        if dist.ndim == 1:
            dist = dist[None]
        dist = jnp.pad(dist, ((0, 0), (0, 5 - dist.shape[1])))
    eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (n, 4, 4))
    cam_T_ref = eye if cam_T_ref is None else jnp.asarray(cam_T_ref, jnp.float32)
    body_T_cam = eye if body_T_cam is None else jnp.asarray(body_T_cam, jnp.float32)
    return CameraRig(
        fxycxy=fxycxy,
        dist=dist,
        cam_T_ref=cam_T_ref,
        body_T_cam=body_T_cam,
        image_size=tuple(image_size),
        dist_model=dist_model,
    )


def distort(xn: jax.Array, dist: jax.Array, model: int) -> jax.Array:
    """Apply distortion to normalized coordinates.

    xn: (..., 2) normalized image coords (x/z, y/z); dist: (..., 5) or (5,).
    """
    if model == DIST_NONE:
        return xn
    x, y = xn[..., 0], xn[..., 1]
    if model == DIST_RADTAN:
        k1, k2, p1, p2, k3 = (dist[..., i] for i in range(5))
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        return jnp.stack([xd, yd], axis=-1)
    if model == DIST_EQUIDISTANT:
        k1, k2, k3, k4 = (dist[..., i] for i in range(4))
        r2 = x * x + y * y
        r = jnp.sqrt(jnp.maximum(r2, 1e-18))
        theta = jnp.arctan(r)
        t2 = theta * theta
        theta_d = theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))
        scale = jnp.where(r2 < 1e-12, 1.0, theta_d / r)
        return xn * scale[..., None]
    raise ValueError(f"unknown distortion model {model}")


def undistort(xd: jax.Array, dist: jax.Array, model: int, iters: int = 10) -> jax.Array:
    """Invert `distort` by damped fixed-point iteration (static iteration count)."""
    if model == DIST_NONE:
        return xd

    def body(_, xn):
        d = distort(xn, dist, model)
        return xn - (d - xd)

    return jax.lax.fori_loop(0, iters, body, xd)


def project(
    p_cam: jax.Array, fxycxy: jax.Array, dist: jax.Array, model: int
) -> tuple[jax.Array, jax.Array]:
    """Project camera-frame points to pixels.

    p_cam: (..., 3); fxycxy: (..., 4); returns ((..., 2) uv, (...,) valid mask
    for positive depth).
    """
    z = p_cam[..., 2]
    valid = z > 1e-6
    safe_z = jnp.where(valid, z, 1.0)
    xn = p_cam[..., :2] / safe_z[..., None]
    xd = distort(xn, dist, model)
    uv = xd * fxycxy[..., :2] + fxycxy[..., 2:]
    return uv, valid


def backproject(
    uv: jax.Array, fxycxy: jax.Array, dist: jax.Array, model: int
) -> jax.Array:
    """Pixels -> unit-depth normalized coords (..., 2) (undistorted)."""
    xd = (uv - fxycxy[..., 2:]) / fxycxy[..., :2]
    return undistort(xd, dist, model)


def bearing(uv: jax.Array, fxycxy: jax.Array, dist: jax.Array, model: int) -> jax.Array:
    """Pixels -> unit bearing vectors (..., 3) in the camera frame."""
    xn = backproject(uv, fxycxy, dist, model)
    rays = jnp.concatenate([xn, jnp.ones_like(xn[..., :1])], axis=-1)
    return rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)


def project_rig(
    p_ref: jax.Array, rig: CameraRig
) -> tuple[jax.Array, jax.Array]:
    """Project reference-frame points into every camera of the rig.

    p_ref: (M, 3) points in the reference-camera frame.
    Returns uv (N, M, 2), valid (N, M).
    """
    p_cam = lie.se3_apply(rig.cam_T_ref[:, None], p_ref[None, :, :])  # (N, M, 3)
    uv, valid = project(
        p_cam,
        rig.fxycxy[:, None, :],
        rig.dist[:, None, :],
        rig.dist_model,
    )
    w, h = rig.image_size
    in_img = (
        (uv[..., 0] >= 0) & (uv[..., 0] < w) & (uv[..., 1] >= 0) & (uv[..., 1] < h)
    )
    return uv, valid & in_img


def rig_bearings(uv: jax.Array, rig: CameraRig) -> jax.Array:
    """Per-camera pixel sets -> bearings in the REFERENCE frame.

    uv: (N, K, 2) pixels for each of N cameras -> (N, K, 3) unit rays rotated
    into the reference-camera frame (ray origins are rig.ref_T_cam[:, :3, 3]).
    """
    rays_cam = bearing(
        uv, rig.fxycxy[:, None, :], rig.dist[:, None, :], rig.dist_model
    )
    R_ref_cam = rig.ref_T_cam[:, :3, :3]
    return jnp.einsum("nij,nkj->nki", R_ref_cam, rays_cam)
