"""Oriented-BRIEF (ORB-class) feature extraction, fully batched on device.

Replaces (WHAT) the reference's vendored ORB-SLAM3 extractor
(/root/reference/MCSlam/src/ORBextractor.cpp: operator() at :1085,
IC_Angle :75, computeOrbDescriptor :106) with a TPU-native design:

  * multi-scale pyramid: per-level dense FAST score maps (fast.py)
  * spatial balancing: grid top-k (topk_grid.py) instead of quad-tree
  * orientation: intensity-centroid moments computed for ALL pixels at once
    as a 2-channel 31x31 convolution (MXU), then gathered per keypoint --
    no per-keypoint patch loops
  * descriptor: 256 Gaussian-distributed point pairs, steered by the patch
    angle, sampled with one (N, 512) gather from the blurred level image

The 256-pair sampling pattern is generated deterministically from a fixed
seed (classic BRIEF recipe: N(0, (patch/5)^2) clipped to the patch) rather
than copying OpenCV's learned table; descriptors are therefore self-
consistent within this framework (vocabulary, matching, loop closure all use
the same pattern) but not bit-compatible with OpenCV ORB.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mcslam_tpu.ops import fast as fast_ops
from mcslam_tpu.ops import hamming, image as image_ops, topk_grid

PATCH_RADIUS = 15  # IC-angle circular patch radius (31x31 patch)
EDGE = 19  # keep-out border for orientation/descriptor sampling


@functools.lru_cache(maxsize=None)
def brief_pattern(seed: int = 7, bits: int = 256) -> np.ndarray:
    """(bits, 2, 2) int32 array of (p, q) offsets, each (dx, dy) in [-13, 13].

    13 = PATCH_RADIUS - 2 keeps rotated samples inside the 31x31 patch for
    any angle (13 * sqrt(2) < 19-edge margin handles the rest).
    """
    rng = np.random.RandomState(seed)
    sigma = PATCH_RADIUS / 5.0 * 2.0
    pts = np.clip(np.round(rng.randn(bits, 2, 2) * sigma), -13, 13)
    return pts.astype(np.int32)


@functools.lru_cache(maxsize=None)
def _moment_kernels() -> np.ndarray:
    """(2, 1, 31, 31) conv kernels for (m10, m01) circular moments."""
    r = PATCH_RADIUS
    ys, xs = np.mgrid[-r : r + 1, -r : r + 1]
    circle = (xs * xs + ys * ys) <= r * r
    kx = (xs * circle).astype(np.float32)
    ky = (ys * circle).astype(np.float32)
    return np.stack([kx, ky])[:, None]  # OIHW


def orientation_maps(img: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Dense IC-angle moment maps: img (..., H, W) -> (m10, m01) same shape.

    One 2-output-channel 31x31 convolution computes the circular-patch
    moments for every pixel (the conv lowers onto the MXU), replacing the
    per-keypoint IC_Angle loops of the reference.
    """
    batch = img.shape[:-2]
    h, w = img.shape[-2:]
    x = img.reshape((-1, 1, h, w))
    k = jnp.asarray(_moment_kernels())
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NCHW", "OIHW", "NCHW"))
    out = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=dn,
        precision=jax.lax.Precision.DEFAULT,
    )
    out = out.reshape(batch + (2, h, w))
    return out[..., 0, :, :], out[..., 1, :, :]


def compute_descriptors(
    blurred: jax.Array,
    xy: jax.Array,
    angle: jax.Array,
) -> jax.Array:
    """Steered BRIEF-256: (H, W) image, (N, 2) float (x, y), (N,) angle ->
    (N, 8) packed uint32 descriptors."""
    pat = jnp.asarray(brief_pattern())  # (256, 2, 2) int32 (dx, dy)
    ca, sa = jnp.cos(angle), jnp.sin(angle)  # (N,)
    # rotate: [dx'; dy'] = [[c, -s], [s, c]] @ [dx; dy]
    dx = pat[..., 0].astype(jnp.float32)  # (256, 2)
    dy = pat[..., 1].astype(jnp.float32)
    rx = ca[:, None, None] * dx - sa[:, None, None] * dy  # (N, 256, 2)
    ry = sa[:, None, None] * dx + ca[:, None, None] * dy
    sx = jnp.round(xy[:, None, None, 0] + rx).astype(jnp.int32)
    sy = jnp.round(xy[:, None, None, 1] + ry).astype(jnp.int32)
    h, w = blurred.shape[-2:]
    sx = jnp.clip(sx, 0, w - 1)
    sy = jnp.clip(sy, 0, h - 1)
    vals = blurred[sy, sx]  # (N, 256, 2) gather
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint32)  # (N, 256)
    return hamming.pack_bits(bits)


class Keypoints(NamedTuple):
    """Fixed-capacity keypoint set for one camera image (padded + masked)."""

    xy: jax.Array  # (N, 2) float32, level-0 pixel coords (x, y)
    response: jax.Array  # (N,) float32
    angle: jax.Array  # (N,) float32 radians
    octave: jax.Array  # (N,) int32 pyramid level
    sigma2: jax.Array  # (N,) float32 scale^2*octave measurement variance factor
    desc: jax.Array  # (N, 8) uint32 packed BRIEF-256
    valid: jax.Array  # (N,) bool


@functools.lru_cache(maxsize=None)
def _level_budget(total: int, num_levels: int, scale: float) -> tuple:
    """Per-level keypoint budget, geometric decay like the reference."""
    inv = 1.0 / scale
    raw = np.array([inv**l for l in range(num_levels)])
    raw = raw / raw.sum() * total
    counts = np.maximum(8, np.round(raw).astype(int))
    # fix rounding drift on level 0
    counts[0] += total - counts.sum()
    return tuple(int(c) for c in counts)


def extract_orb(
    img: jax.Array,
    num_points: int = 1024,
    num_levels: int = 8,
    scale: float = 1.2,
    fast_threshold: float = 20.0 / 255.0,
    min_threshold: float = 7.0 / 255.0,
    cell: int = 16,
    per_cell: int = 4,
) -> Keypoints:
    """Full single-image ORB extraction. img: (H, W) float32 in [0, 1].

    Two-threshold策略 mirrors the reference (iniThFAST with minThFAST
    fallback, ORBextractor.cpp:780): the score map is computed at the low
    threshold, and selection prefers high-threshold corners by boosting
    their score rank; weak corners only fill leftover capacity.
    """
    budgets = _level_budget(num_points, num_levels, scale)
    levels = image_ops.build_pyramid(img, num_levels, scale)

    all_parts = []
    for lvl, lvl_img in enumerate(levels):
        s = scale**lvl
        blurred = image_ops.gaussian_blur(lvl_img, 7, 2.0)
        score = fast_ops.fast_corners(lvl_img, min_threshold)
        # prefer corners passing the high threshold: add a rank bonus
        score = jnp.where(score > fast_threshold, score + 1.0, score)
        yx, resp, valid = topk_grid.select_keypoints(
            score, budgets[lvl], cell=cell, per_cell=per_cell
        )
        resp = jnp.where(resp > 1.0, resp - 1.0, resp)  # undo rank bonus
        h, w = lvl_img.shape[-2:]
        inb = (
            (yx[:, 0] >= EDGE)
            & (yx[:, 0] < h - EDGE)
            & (yx[:, 1] >= EDGE)
            & (yx[:, 1] < w - EDGE)
        )
        valid = valid & inb
        xy_lvl = jnp.stack([yx[:, 1], yx[:, 0]], axis=-1).astype(jnp.float32)
        m10, m01 = orientation_maps(lvl_img)
        ang = jnp.arctan2(m01[yx[:, 0], yx[:, 1]], m10[yx[:, 0], yx[:, 1]])
        desc = compute_descriptors(blurred, xy_lvl, ang)
        xy0 = xy_lvl * s
        octv = jnp.full((xy_lvl.shape[0],), lvl, jnp.int32)
        sigma2 = jnp.full((xy_lvl.shape[0],), s * s, jnp.float32)
        all_parts.append((xy0, resp, ang, octv, sigma2, desc, valid))

    cat = lambda i: jnp.concatenate([p[i] for p in all_parts], axis=0)
    return Keypoints(
        xy=cat(0),
        response=cat(1),
        angle=cat(2),
        octave=cat(3),
        sigma2=cat(4),
        desc=cat(5),
        valid=cat(6),
    )


def extract_orb_rig(imgs: jax.Array, **kwargs) -> Keypoints:
    """(C, H, W) camera-batched extraction: the rig axis replaces the
    reference's per-camera std::thread fork-join
    (MultiCameraFrame::extractFeaturesParallel, MultiCameraFrame.cpp:203)."""
    return jax.vmap(lambda im: extract_orb(im, **kwargs))(imgs)
