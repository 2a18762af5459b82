"""FAST-9/16 corner detection as dense whole-image array ops.

Replaces (WHAT) the reference's per-cell OpenCV FAST calls inside
ComputeKeyPointsOctTree (/root/reference/MCSlam/src/ORBextractor.cpp:780).
TPU-native design: instead of scalar pixel loops, the 16 Bresenham-circle
neighbors are materialized as 16 shifted copies of the image; the
">= 9 contiguous" arc test and the corner score (max threshold for which the
pixel stays a corner) are computed with 8 rolled AND/MIN reductions on the
VPU. The result is a dense score map; selection happens separately with
grid-balanced top-k (see topk_grid.py), which subsumes the reference's
quad-tree DistributeOctTree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Bresenham circle radius 3: 16 (dy, dx) offsets in circular order.
CIRCLE = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3),
    (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3),
    (0, -3), (-1, -3), (-2, -2), (-3, -1),
)
ARC_LEN = 9
BORDER = 3


def _shift(img: jax.Array, dy: int, dx: int) -> jax.Array:
    """Shifted copy: out[y, x] = img[y + dy, x + dx], edge-padded."""
    pad_y = (max(-dy, 0), max(dy, 0))
    pad_x = (max(-dx, 0), max(dx, 0))
    padding = [(0, 0)] * (img.ndim - 2) + [pad_y, pad_x]
    p = jnp.pad(img, padding, mode="edge")
    h, w = img.shape[-2:]
    return jax.lax.dynamic_slice_in_dim(
        jax.lax.dynamic_slice_in_dim(p, pad_y[0] + dy, h, axis=-2),
        pad_x[0] + dx,
        w,
        axis=-1,
    )


def fast_score(img: jax.Array, threshold: float) -> jax.Array:
    """Dense FAST-9/16 score map.

    img: (..., H, W) float in [0, 1]; threshold in the same units
    (OpenCV's iniThFAST=20 -> 20/255).

    Score is the classic "max threshold" corner strength: for each pixel,
    max over the 16 arc start positions of the min signed difference along a
    9-long contiguous arc (computed for brighter and darker arcs separately);
    zero where the FAST test fails.
    """
    diffs = jnp.stack(
        [_shift(img, dy, dx) - img for (dy, dx) in CIRCLE], axis=-3
    )  # (..., 16, H, W)

    def arc_min(d):
        # min over 9 contiguous circle positions, for each of 16 starts
        r = d
        for j in range(1, ARC_LEN):
            r = jnp.minimum(r, jnp.roll(d, -j, axis=-3))
        return r  # (..., 16, H, W): min over arc starting at each position

    bright = jnp.max(arc_min(diffs), axis=-3)  # most robust bright arc
    dark = jnp.max(arc_min(-diffs), axis=-3)
    score = jnp.maximum(bright, dark)
    score = jnp.where(score > threshold, score, 0.0)
    # kill the border (shift padding makes it unreliable)
    h, w = img.shape[-2:]
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = (
        (ys >= BORDER) & (ys < h - BORDER) & (xs >= BORDER) & (xs < w - BORDER)
    )
    return jnp.where(interior, score, 0.0)


def nms3x3(score: jax.Array) -> jax.Array:
    """3x3 non-max suppression: keep strict local maxima (ties broken by
    keeping the first in raster order via epsilon on the pooled max)."""
    batch = score.shape[:-2]
    h, w = score.shape[-2:]
    x = score.reshape((-1, h, w))
    pooled = jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3),
        window_strides=(1, 1, 1),
        padding=((0, 0), (1, 1), (1, 1)),
    )
    keep = (x >= pooled) & (x > 0.0)
    return jnp.where(keep, x, 0.0).reshape(batch + (h, w))


def fast_corners(img: jax.Array, threshold: float, nms: bool = True) -> jax.Array:
    s = fast_score(img, threshold)
    return nms3x3(s) if nms else s
