"""Multi-camera frame construction: extraction, undistortion, intra-matching,
rig triangulation — the device-side equivalent of the reference's
MultiCameraFrame (/root/reference/MCSlam/src/MultiCameraFrame.cpp).

A frame is a pytree of fixed-shape arrays. Construction runs as ONE fused
XLA program (extract + optional seg veto + intra-match + triangulate): the
dispatch floor through a tunneled TPU is ~1 ms per call, so stage
boundaries cost real latency. (An early fused attempt scheduled
catastrophically; the current batched-pyramid formulation fuses cleanly.)
No threads, no per-camera loops: the camera axis is batched through every
op.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mcslam_tpu.geometry import camera as cam_ops
from mcslam_tpu.geometry import lie, triangulation
from mcslam_tpu.frontend import intra as intra_ops
from mcslam_tpu.ops import orb


class FrameFeatures(NamedTuple):
    """All per-frame feature state (static shapes; C cameras, N kps/camera,
    M intra-match slots)."""

    # per-camera keypoints
    kp_xy: jax.Array  # (C, N, 2) raw pixel coords (x, y)
    kp_xy_ud: jax.Array  # (C, N, 2) undistorted pixel coords
    kp_response: jax.Array  # (C, N)
    kp_angle: jax.Array  # (C, N)
    kp_octave: jax.Array  # (C, N) int32
    kp_sigma2: jax.Array  # (C, N) measurement variance scale
    kp_desc: jax.Array  # (C, N, 8) uint32
    kp_valid: jax.Array  # (C, N) bool

    # intra-matches (cross-camera feature groups, incl. singletons)
    im_ray_idx: jax.Array  # (M, C) int32 keypoint index per camera, -1 = none
    im_desc: jax.Array  # (M, 8) uint32 representative descriptor
    im_uv_ref: jax.Array  # (M, 2) anchor observation (undistorted px, anchor cam)
    im_anchor_cam: jax.Array  # (M,) int32 camera of the anchor observation
    im_point3d: jax.Array  # (M, 3) rig-frame 3D (valid iff im_has_depth)
    im_has_depth: jax.Array  # (M,) bool  (>=2-ray triangulation succeeded)
    im_n_rays: jax.Array  # (M,) int32
    im_valid: jax.Array  # (M,) bool
    im_sigma2: jax.Array  # (M,) float32 anchor measurement variance factor

    @property
    def num_cams(self) -> int:
        return self.kp_xy.shape[0]

    @property
    def num_intra(self) -> int:
        return self.im_ray_idx.shape[0]


def undistort_keypoints(xy: jax.Array, valid: jax.Array, rig) -> jax.Array:
    """(C, N, 2) raw pixels -> undistorted pixels under the same K.

    Parity: MultiCameraFrame::UndistortKeyPoints
    (/root/reference/MCSlam/src/MultiCameraFrame.cpp:300).
    """
    xn = cam_ops.backproject(
        xy, rig.fxycxy[:, None, :], rig.dist[:, None, :], rig.dist_model
    )
    uv = xn * rig.fxycxy[:, None, :2] + rig.fxycxy[:, None, 2:]
    return jnp.where(valid[..., None], uv, 0.0)


# --------------------------------------------------------------------------
# jitted stages (separate on purpose — see module docstring)
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("max_intra",))
def _intra_stage(desc, xy_ud, valid, response, rig, max_intra):
    """Standalone intra-match jit for the feature-level entry point
    (build_frame_from_keypoints); the image path uses _fused_stage."""
    return intra_ops.intra_match(
        desc=desc, xy_ud=xy_ud, valid=valid, response=response,
        rig=rig, max_out=max_intra,
    )


@functools.partial(jax.jit, static_argnames=("min_z", "max_z"))
def _triangulate_stage(groups, xy_ud, kp_sigma2, rig, min_z, max_z):
    C = xy_ud.shape[0]
    M = groups.ray_idx.shape[0]
    ray_valid = groups.ray_idx >= 0  # (M, C)
    safe_idx = jnp.maximum(groups.ray_idx, 0)
    cam_idx = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32)[None, :], (M, C))
    uv = xy_ud[cam_idx, safe_idx]  # (M, C, 2)
    sig2 = kp_sigma2[cam_idx, safe_idx]  # (M, C)
    world_T_cam = jnp.broadcast_to(
        lie.se3_inverse(rig.cam_T_ref)[None], (M, C, 4, 4)
    )
    fxy = jnp.broadcast_to(rig.fxycxy[None], (M, C, 4))
    multi = jnp.sum(ray_valid, axis=-1) >= 2
    X, tri_ok = triangulation.triangulate_and_refine(
        world_T_cam, uv, fxy, ray_valid & multi[:, None],
        sigma=jnp.sqrt(sig2), min_z=min_z, max_z=max_z,
    )
    has_depth = tri_ok & multi & groups.valid
    anchor_cam = jnp.argmax(ray_valid, axis=-1).astype(jnp.int32)
    anchor_kp = jnp.take_along_axis(safe_idx, anchor_cam[:, None], axis=1)[:, 0]
    uv_ref = xy_ud[anchor_cam, anchor_kp]
    anchor_sigma2 = kp_sigma2[anchor_cam, anchor_kp]
    n_rays = jnp.sum(ray_valid, axis=-1).astype(jnp.int32)
    return X, has_depth, anchor_cam, uv_ref, anchor_sigma2, n_rays


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_points", "num_levels", "fast_threshold", "min_threshold",
        "max_intra", "min_z", "max_z", "angle_bins", "approx_topk",
    ),
)
def _fused_stage(imgs, rig, seg_masks, num_points, num_levels,
                 fast_threshold, min_threshold, max_intra, min_z, max_z,
                 angle_bins=orb.ANGLE_BINS, approx_topk=True):
    """extract (+ optional seg-mask veto) + intra + triangulate in ONE
    program: the dispatch floor through a tunneled TPU is ~1 ms per call,
    so chained stage jits paid ~2 ms of pure dispatch per frame."""
    if imgs.dtype == jnp.uint8:
        imgs = imgs.astype(jnp.float32) * (1.0 / 255.0)
    kps = orb.extract_orb_rig(
        imgs, num_points=num_points, num_levels=num_levels,
        fast_threshold=fast_threshold, min_threshold=min_threshold,
        angle_bins=angle_bins, approx_topk=approx_topk,
    )
    if seg_masks is not None:
        # veto keypoints on masked (dynamic) pixels: mask < 0.7 kills the
        # keypoint (reference seg-mask gate, FrontEnd.cpp:266)
        C, H, W = seg_masks.shape
        x = jnp.clip(kps.xy[..., 0].astype(jnp.int32), 0, W - 1)
        y = jnp.clip(kps.xy[..., 1].astype(jnp.int32), 0, H - 1)
        cam = jnp.arange(C, dtype=jnp.int32)[:, None]
        kps = kps._replace(valid=kps.valid & (seg_masks[cam, y, x] >= 0.7))
    xy_ud = undistort_keypoints(kps.xy, kps.valid, rig)
    groups = intra_ops.intra_match(
        desc=kps.desc, xy_ud=xy_ud, valid=kps.valid, response=kps.response,
        rig=rig, max_out=max_intra,
    )
    tri = _triangulate_stage.__wrapped__(
        groups, xy_ud, kps.sigma2, rig, min_z, max_z
    )
    return kps, xy_ud, groups, tri


# --------------------------------------------------------------------------
# host-side composition
# --------------------------------------------------------------------------


def assemble_frame(kps, xy_ud, groups, tri) -> FrameFeatures:
    """Package the raw device outputs of the fused extraction stage into a
    FrameFeatures pytree (shared by build_frame and the fused
    frame-build+track program in tracking_kernels)."""
    X, has_depth, anchor_cam, uv_ref, anchor_sigma2, n_rays = tri
    return FrameFeatures(
        kp_xy=kps.xy,
        kp_xy_ud=xy_ud,
        kp_response=kps.response,
        kp_angle=kps.angle,
        kp_octave=kps.octave,
        kp_sigma2=kps.sigma2,
        kp_desc=kps.desc,
        kp_valid=kps.valid,
        im_ray_idx=groups.ray_idx,
        im_desc=groups.desc,
        im_uv_ref=uv_ref,
        im_anchor_cam=anchor_cam,
        im_point3d=X,
        im_has_depth=has_depth,
        im_n_rays=n_rays,
        im_valid=groups.valid,
        im_sigma2=anchor_sigma2,
    )


def build_frame(
    imgs: jax.Array,
    rig,
    num_points: int = 1024,
    num_levels: int = 8,
    max_intra: int = 2048,
    fast_threshold: float = 20.0 / 255.0,
    min_threshold: float = 7.0 / 255.0,
    min_z: float = 0.5,
    max_z: float = 40.0,
    seg_masks: jax.Array | None = None,
    angle_bins: int = orb.ANGLE_BINS,
    approx_topk: bool = True,  # see ops/orb.py: ~2x faster on TPU,
    #   exact on CPU, equal ATE on the real-chip hard-world drive
) -> FrameFeatures:
    """(C, H, W) float images in [0,1] -> FrameFeatures.

    Pipeline: ORB per camera (batched) -> undistort -> cross-camera
    intra-matching -> rig triangulation of multi-view groups. Replaces
    MultiCameraFrame::setData + extractFeaturesParallel + computeIntraMatches
    + the triangulation half of FrontEnd::obtainLfFeatures
    (/root/reference/MCSlam/src/FrontEnd.cpp:213).

    seg_masks: optional (C, H, W) float in [0,1]; keypoints where the mask
    is < 0.7 are vetoed (the reference's semantic dynamic-object veto,
    FrontEnd.cpp:266).
    """
    kps, xy_ud, groups, tri = _fused_stage(
        imgs, rig, seg_masks, num_points, num_levels, fast_threshold,
        min_threshold, max_intra, min_z, max_z, angle_bins, approx_topk,
    )
    return assemble_frame(kps, xy_ud, groups, tri)


def build_frame_from_keypoints(
    kp_xy: jax.Array,  # (C, N, 2) raw pixel coords
    kp_desc: jax.Array,  # (C, N, 8) uint32
    kp_valid: jax.Array,  # (C, N)
    rig,
    kp_response: jax.Array | None = None,
    kp_sigma2: jax.Array | None = None,
    max_intra: int = 2048,
    min_z: float = 0.5,
    max_z: float = 100.0,
) -> FrameFeatures:
    """Build a FrameFeatures from externally supplied keypoints (synthetic
    feature-level data, replayed logs, or a foreign detector)."""
    C, N = kp_valid.shape
    if kp_response is None:
        kp_response = kp_valid.astype(jnp.float32)
    if kp_sigma2 is None:
        kp_sigma2 = jnp.ones((C, N), jnp.float32)
    xy_ud = _undistort_jit(kp_xy, kp_valid, rig)
    groups = _intra_stage(kp_desc, xy_ud, kp_valid, kp_response, rig, max_intra)
    X, has_depth, anchor_cam, uv_ref, anchor_sigma2, n_rays = (
        _triangulate_stage(groups, xy_ud, kp_sigma2, rig, min_z, max_z)
    )
    return FrameFeatures(
        kp_xy=kp_xy,
        kp_xy_ud=xy_ud,
        kp_response=kp_response,
        kp_angle=jnp.zeros((C, N), jnp.float32),
        kp_octave=jnp.zeros((C, N), jnp.int32),
        kp_sigma2=kp_sigma2,
        kp_desc=kp_desc,
        kp_valid=kp_valid,
        im_ray_idx=groups.ray_idx,
        im_desc=groups.desc,
        im_uv_ref=uv_ref,
        im_anchor_cam=anchor_cam,
        im_point3d=X,
        im_has_depth=has_depth,
        im_n_rays=n_rays,
        im_valid=groups.valid,
        im_sigma2=anchor_sigma2,
    )


_undistort_jit = jax.jit(undistort_keypoints)
