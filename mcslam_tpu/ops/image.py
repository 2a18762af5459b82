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

import numpy as np

import jax
import jax.numpy as jnp


def gaussian_kernel(ksize: int, sigma: float) -> jnp.ndarray:
    r = (ksize - 1) / 2
    x = jnp.arange(ksize, dtype=jnp.float32) - r
    k = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / jnp.sum(k)


@functools.lru_cache(maxsize=None)
def _band_matrix(n: int, taps: tuple) -> np.ndarray:
    """(n, n) banded convolution matrix with reflect padding folded into
    the band edges: out = B @ x equals conv1d(x, taps, reflect)."""
    ksize = len(taps)
    pad = ksize // 2
    B = np.zeros((n, n), np.float32)
    for i in range(n):
        for t in range(ksize):
            j = i - pad + t
            if j < 0:
                j = -j
            elif j >= n:
                j = 2 * n - 2 - j
            B[i, j] += taps[t]
    return B


def _sep_conv_mxu(img: jax.Array, taps: tuple) -> jax.Array:
    """Separable conv as two banded matmuls: single-channel convs lower
    poorly on TPU (the conv's contraction dims are size 1); an (H, H) and
    (W, W) band matrix run on the MXU instead. `taps` must be static
    (python floats), not traced."""
    h, w = img.shape[-2:]
    Bh = jnp.asarray(_band_matrix(h, taps))
    Bw = jnp.asarray(_band_matrix(w, taps))
    x = jnp.einsum("hi,...iw->...hw", Bh, img,
                   preferred_element_type=jnp.float32)
    return jnp.einsum("...hw,jw->...hj", x, Bw,
                      preferred_element_type=jnp.float32)


def _use_mxu_conv() -> bool:
    try:
        return jax.default_backend() != "cpu"
    except Exception:  # noqa: BLE001
        return False


def _np_gaussian_taps(ksize: int, sigma: float) -> tuple:
    r = (ksize - 1) / 2
    x = np.arange(ksize, dtype=np.float64) - r
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    k = k / k.sum()
    return tuple(float(v) for v in k)


def _sep_conv(img: jax.Array, k: jax.Array, taps: tuple | None = None):
    """Separable 2D convolution with reflect padding, batched over leading
    dims. When static `taps` are given and the backend is TPU, runs as
    banded matmuls on the MXU."""
    if taps is not None and _use_mxu_conv():
        return _sep_conv_mxu(img, taps)
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
    return _sep_conv(img, gaussian_kernel(ksize, sigma),
                     taps=_np_gaussian_taps(ksize, sigma))


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
    box_taps = (1.0 / k,) * k
    mean = _sep_conv(img, box, taps=box_taps)
    sq = _sep_conv(img * img, box, taps=box_taps)
    std = jnp.sqrt(jnp.maximum(sq - mean * mean, 1e-6))
    out = (img - mean) / jnp.maximum(std, clip)
    # squash back to [0,1]
    return jax.nn.sigmoid(out) * 1.0
