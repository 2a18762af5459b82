"""Dense image ops: separable Gaussian blur, bilinear resize, pyramids.

All ops take (..., H, W) float32 images in [0, 1] and are batched over
leading dims (the camera axis of the rig). Replaces (WHAT) the per-camera
cv::resize / GaussianBlur pyramid of the reference ORBextractor
(/root/reference/MCSlam/src/ORBextractor.cpp:1173 ComputePyramid), rebuilt
as XLA convolutions/resizes that fuse and batch over cameras.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


def gaussian_kernel(ksize: int, sigma: float) -> jnp.ndarray:
    r = (ksize - 1) / 2
    x = jnp.arange(ksize, dtype=jnp.float32) - r
    k = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / jnp.sum(k)


def _sep_conv(img: jax.Array, k: jax.Array) -> jax.Array:
    """Separable 2D convolution with reflect padding, batched over leading dims."""
    ksize = k.shape[0]
    pad = ksize // 2
    batch = img.shape[:-2]
    h, w = img.shape[-2:]
    x = img.reshape((-1, 1, h, w))
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="reflect")
    kh = k.reshape(1, 1, ksize, 1)
    kw = k.reshape(1, 1, 1, ksize)
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", dimension_numbers=dn,
        precision=jax.lax.Precision.DEFAULT,
    )
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), "VALID", dimension_numbers=dn,
        precision=jax.lax.Precision.DEFAULT,
    )
    return x.reshape(batch + (h, w))


def gaussian_blur(img: jax.Array, ksize: int = 7, sigma: float = 2.0) -> jax.Array:
    return _sep_conv(img, gaussian_kernel(ksize, sigma))


def resize_bilinear(img: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear resize of (..., H, W) to (..., h, w)."""
    return jax.image.resize(img, img.shape[:-2] + tuple(out_hw), method="bilinear")


@functools.lru_cache(maxsize=None)
def pyramid_shapes(h: int, w: int, num_levels: int, scale: float) -> tuple:
    out = []
    for lvl in range(num_levels):
        s = scale**lvl
        out.append((max(8, int(round(h / s))), max(8, int(round(w / s)))))
    return tuple(out)


def build_pyramid(
    img: jax.Array, num_levels: int = 8, scale: float = 1.2
) -> list[jax.Array]:
    """List of (..., h_l, w_l) images, level 0 = input. Static shapes per level."""
    h, w = img.shape[-2:]
    shapes = pyramid_shapes(h, w, num_levels, scale)
    levels = [img]
    for lvl in range(1, num_levels):
        levels.append(resize_bilinear(levels[-1], shapes[lvl]))
    return levels


def rgb_to_gray(img: jax.Array) -> jax.Array:
    """(..., H, W, 3) -> (..., H, W) using BT.601 weights (matches cv2.cvtColor)."""
    w = jnp.array([0.299, 0.587, 0.114], dtype=img.dtype)
    return jnp.einsum("...c,c->...", img, w)


def clahe_like(img: jax.Array, grid: int = 8, clip: float = 0.02) -> jax.Array:
    """Cheap contrast normalization standing in for CLAHE preprocessing
    (reference uses cv::CLAHE in FrontEnd setup, FrontEnd.h:196-257):
    local mean/std normalization with a box filter, then recentred to [0,1].
    Fully differentiable, no histograms (histogram equalization is hostile to
    vectorization; local standardization achieves the same contrast boost for
    feature detection)."""
    h, w = img.shape[-2:]
    k = max(h, w) // grid | 1
    k = min(k, 63) | 1
    box = jnp.ones((k,), jnp.float32) / k
    mean = _sep_conv(img, box)
    sq = _sep_conv(img * img, box)
    std = jnp.sqrt(jnp.maximum(sq - mean * mean, 1e-6))
    out = (img - mean) / jnp.maximum(std, clip)
    # squash back to [0,1]
    return jax.nn.sigmoid(out) * 1.0
