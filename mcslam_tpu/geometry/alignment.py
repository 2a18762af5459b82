"""Point-set alignment: Kabsch / Umeyama, batched and mask-aware.

Parity (WHAT): reference kabsch() for IMU gravity alignment
(/root/reference/MCSlam/src/FrontEnd.cpp:7825) and the Umeyama-style GPS
initialization (gps_initialize_kabsch, FrontEnd.cpp:8268-8295), plus the
3-point RANSAC hypothesis generator for poseFromPCAlignment
(FrontEnd.cpp:4441). Implemented as batched SVD so thousands of RANSAC
hypotheses solve in one XLA call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def kabsch(
    src: jax.Array,
    dst: jax.Array,
    weights: jax.Array | None = None,
    estimate_scale: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Find (R, t, s) minimizing sum_i w_i || dst_i - (s R src_i + t) ||^2.

    src, dst: (..., M, 3); weights: (..., M) or None.
    Returns R (..., 3, 3), t (..., 3), s (...,) with s == 1 when
    estimate_scale is False. Batched over leading dims.
    """
    if weights is None:
        weights = jnp.ones(src.shape[:-1], dtype=src.dtype)
    w = weights[..., None]
    wsum = jnp.maximum(jnp.sum(w, axis=-2), 1e-12)
    mu_src = jnp.sum(src * w, axis=-2) / wsum
    mu_dst = jnp.sum(dst * w, axis=-2) / wsum
    xs = src - mu_src[..., None, :]
    xd = dst - mu_dst[..., None, :]
    # covariance: dst^T W src  (3x3)
    C = jnp.einsum("...mi,...mj->...ij", xd * w, xs)
    U, S, Vt = jnp.linalg.svd(C)
    # proper rotation: flip the last singular vector if det < 0
    det = jnp.linalg.det(U @ Vt)
    D = jnp.ones(C.shape[:-2] + (3,), dtype=C.dtype)
    D = D.at[..., 2].set(jnp.sign(det) + (det == 0))
    R = U @ (D[..., :, None] * Vt)
    if estimate_scale:
        var_src = jnp.sum(jnp.sum(xs * xs, axis=-1) * weights, axis=-1)
        s = jnp.sum(S * D, axis=-1) / jnp.maximum(var_src, 1e-12)
    else:
        s = jnp.ones(C.shape[:-2], dtype=C.dtype)
    t = mu_dst - s[..., None] * jnp.einsum("...ij,...j->...i", R, mu_src)
    return R, t, s


def umeyama(src: jax.Array, dst: jax.Array, weights=None):
    """Similarity-transform alignment (scale estimated)."""
    return kabsch(src, dst, weights, estimate_scale=True)


def gravity_align_rotation(acc_mean: jax.Array, g_world=None) -> jax.Array:
    """Rotation taking the measured mean accelerometer direction to +g world.

    Used for IMU gravity initialization (reference world_imu_frame,
    FrontEnd.cpp:7803-7857): returns world_R_body such that
    world_R_body @ acc_mean is parallel to g_world (default [0,0,1]).
    """
    if g_world is None:
        g_world = jnp.array([0.0, 0.0, 1.0], dtype=acc_mean.dtype)
    a = acc_mean / jnp.maximum(jnp.linalg.norm(acc_mean, axis=-1, keepdims=True), 1e-12)
    b = g_world / jnp.linalg.norm(g_world, axis=-1, keepdims=True)
    v = jnp.cross(a, b)
    c = jnp.sum(a * b, axis=-1)
    # Rodrigues from axis*sin, cos; degenerate antiparallel handled by 180-deg
    # rotation about any axis orthogonal to a.
    s2 = jnp.sum(v * v, axis=-1)
    vx = _hat(v)
    eye = jnp.eye(3, dtype=acc_mean.dtype)
    generic = eye + vx + vx @ vx * ((1.0 - c) / jnp.maximum(s2, 1e-12))[..., None, None]
    # antiparallel: pick orthogonal axis
    ortho = jnp.where(
        jnp.abs(a[..., 0:1]) < 0.9,
        jnp.array([1.0, 0.0, 0.0], dtype=acc_mean.dtype),
        jnp.array([0.0, 1.0, 0.0], dtype=acc_mean.dtype),
    )
    axis = jnp.cross(a, ortho)
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-12)
    ax = _hat(axis)
    flip = eye + 2.0 * ax @ ax
    return jnp.where((c < -1.0 + 1e-6)[..., None, None], flip, generic)


def _hat(w):
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )
