"""SO(3)/SE(3) Lie-group operations, batched and jit-friendly.

All functions broadcast over leading batch dimensions and are written with
Taylor-series fallbacks around the identity so they are safe to evaluate AND
differentiate in float32 on TPU (no 0/0 and no NaN gradients at theta -> 0:
theta is always computed from a clamped squared norm, and the small-angle
branch is a polynomial in theta^2, which is smooth in w).

Conventions:
  * rotations are (..., 3, 3) matrices; poses are (..., 4, 4) homogeneous
    matrices T = [[R, t], [0, 1]].
  * se3 tangent vectors are (..., 6) ordered (omega, v) -- rotation first --
    and use the *left* jacobian convention: se3_exp(xi) = [[exp(w), J_l(w) v]].
  * retraction for optimization is right-multiplication:
    se3_retract(T, xi) = T @ se3_exp(xi).

Parity note: replaces the pose plumbing of the reference system
(gtsam::Pose3 / cv::Mat Rt handling, e.g. /root/reference/common_utils/src/
tools.cpp build_Rt and gtsam Pose3 usage throughout MCSlam/src/Backend.cpp),
re-designed as pure batched array ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def so3_hat(w: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
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


def so3_vee(W: jax.Array) -> jax.Array:
    """(..., 3, 3) skew -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _theta_terms(w: jax.Array):
    """Returns (t2, theta, small) with theta clamped away from 0 (grad-safe).

    All call sites must divide by `theta` powers (clamped), never by raw t2:
    dividing by t2 in the unselected branch of a jnp.where produces inf
    forward values whose backward pass yields 0 * inf = NaN gradients.
    """
    t2 = jnp.sum(w * w, axis=-1)
    small = t2 < _EPS
    theta = jnp.sqrt(jnp.where(small, 1.0, t2))
    return t2, theta, small


def so3_exp(w: jax.Array) -> jax.Array:
    """Rodrigues: (..., 3) tangent -> (..., 3, 3) rotation."""
    t2, theta, small = _theta_terms(w)
    # a = sin(t)/t ; b = (1-cos(t))/t^2
    a = jnp.where(small, 1.0 - t2 / 6.0 + t2 * t2 / 120.0, jnp.sin(theta) / theta)
    b = jnp.where(
        small, 0.5 - t2 / 24.0 + t2 * t2 / 720.0,
        (1.0 - jnp.cos(theta)) / (theta * theta),
    )
    W = so3_hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation -> (..., 3) tangent. Handles theta near 0 and pi."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    w_skew = 0.5 * (R - jnp.swapaxes(R, -1, -2))
    w_sin = so3_vee(w_skew)  # = sin(theta) * axis
    # grad-safe sin: sqrt of a clamped square, so differentiating through
    # so3_log at the EXACT identity stays finite (norm has no grad at 0 —
    # this matters for pose-graph edges linearized at zero error).
    s2 = jnp.sum(w_sin * w_sin, axis=-1)
    small = s2 < 1e-10
    sin_safe = jnp.sqrt(jnp.where(small, 1.0, s2))
    sin_theta = jnp.where(small, 0.0, sin_safe)
    # atan2 is far better conditioned than arccos near theta = pi (the
    # sensitivity of arccos blows up as 1/sin(theta)).
    theta = jnp.arctan2(sin_theta, cos_theta)
    # below sin(theta) ~ 1e-3 the generic scale theta/sin(theta) amplifies
    # f32 error in the skew part beyond usefulness; switch to the diagonal
    # extraction well before that.
    near_pi = (sin_theta < 1e-3) & (theta > 3.0)
    # generic branch: scale = theta/sin(theta); smooth polynomial in s2 at
    # the identity so jacobians there are exact and finite.
    scale = jnp.where(small, 1.0 + s2 / 6.0, theta / sin_safe)
    w_generic = w_sin * scale[..., None]
    # theta near pi: R + I = 2 cos^2(t/2) I + 2 sin^2(t/2) a a^T; at t=pi the
    # diagonal of B = (R+I)/2 gives |a_i| and off-diagonals give the signs.
    B = (R + jnp.eye(3, dtype=R.dtype)) * 0.5
    diag = jnp.clip(
        jnp.stack([B[..., 0, 0], B[..., 1, 1], B[..., 2, 2]], axis=-1), 0.0, 1.0
    )
    axis_abs = jnp.sqrt(diag)
    sx = jnp.ones_like(axis_abs[..., 0])
    sy = jnp.where(B[..., 0, 1] >= 0, 1.0, -1.0) * sx
    sz = jnp.where(B[..., 0, 2] >= 0, 1.0, -1.0) * sx
    sz = jnp.where(
        axis_abs[..., 0] < 1e-3, jnp.where(B[..., 1, 2] >= 0, 1.0, -1.0) * sy, sz
    )
    axis_pi = axis_abs * jnp.stack([sx, sy, sz], axis=-1)
    w_pi = axis_pi * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def so3_left_jacobian(w: jax.Array) -> jax.Array:
    """Left Jacobian J_l(w) = I + (1-cos)/t^2 W + (t - sin)/t^3 W^2."""
    t2, theta, small = _theta_terms(w)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(theta)) / (theta * theta))
    c = jnp.where(
        small,
        1.0 / 6.0 - t2 / 120.0,
        (theta - jnp.sin(theta)) / (theta * theta * theta),
    )
    W = so3_hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * W2


def so3_left_jacobian_inv(w: jax.Array) -> jax.Array:
    """J_l^{-1}(w) = I - W/2 + (1/t^2 - (1+cos)/(2 t sin)) W^2."""
    t2, theta, small = _theta_terms(w)
    sin_theta = jnp.sin(theta)
    safe = jnp.where(jnp.abs(sin_theta) < 1e-12, 1.0, sin_theta)
    coeff = jnp.where(
        small,
        1.0 / 12.0 + t2 / 720.0,
        1.0 / (theta * theta) - (1.0 + jnp.cos(theta)) / (2.0 * theta * safe),
    )
    W = so3_hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + coeff[..., None, None] * W2


def se3_matrix(R: jax.Array, t: jax.Array) -> jax.Array:
    """(..., 3, 3), (..., 3) -> (..., 4, 4)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 4), dtype=R.dtype)
    bottom = bottom.at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_rotation(T: jax.Array) -> jax.Array:
    return T[..., :3, :3]


def se3_translation(T: jax.Array) -> jax.Array:
    return T[..., :3, 3]


def se3_identity(batch=(), dtype=jnp.float32) -> jax.Array:
    return jnp.broadcast_to(jnp.eye(4, dtype=dtype), tuple(batch) + (4, 4))


def se3_inverse(T: jax.Array) -> jax.Array:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return se3_matrix(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def se3_apply(T: jax.Array, p: jax.Array) -> jax.Array:
    """Transform points: (..., 4, 4) x (..., 3) -> (..., 3)."""
    return jnp.einsum("...ij,...j->...i", T[..., :3, :3], p) + T[..., :3, 3]


def se3_exp(xi: jax.Array) -> jax.Array:
    """(..., 6) tangent (omega, v) -> (..., 4, 4)."""
    w, v = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    J = so3_left_jacobian(w)
    t = jnp.einsum("...ij,...j->...i", J, v)
    return se3_matrix(R, t)


def se3_log(T: jax.Array) -> jax.Array:
    """(..., 4, 4) -> (..., 6) tangent (omega, v)."""
    w = so3_log(T[..., :3, :3])
    Jinv = so3_left_jacobian_inv(w)
    v = jnp.einsum("...ij,...j->...i", Jinv, T[..., :3, 3])
    return jnp.concatenate([w, v], axis=-1)


def se3_retract(T: jax.Array, xi: jax.Array) -> jax.Array:
    """Right-multiplicative retraction used by all optimizers."""
    return T @ se3_exp(xi)


def se3_adjoint(T: jax.Array) -> jax.Array:
    """(..., 4, 4) -> (..., 6, 6) adjoint in (omega, v) ordering."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    tR = so3_hat(t) @ R
    z = jnp.zeros_like(R)
    top = jnp.concatenate([R, z], axis=-1)
    bottom = jnp.concatenate([tR, R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def quat_from_rot(R: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 4) quaternion (x, y, z, w), TUM order.

    Branchless Shepperd's method: build all four pivot candidates and select
    the numerically largest, so it batches and jits cleanly.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, 0.0)) * 0.5
    d0 = 4.0 * jnp.maximum(qw0, 1e-12)
    c0 = jnp.stack([(m21 - m12) / d0, (m02 - m20) / d0, (m10 - m01) / d0, qw0], axis=-1)

    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 0.0)) * 0.5
    d1 = 4.0 * jnp.maximum(qx1, 1e-12)
    c1 = jnp.stack([qx1, (m01 + m10) / d1, (m02 + m20) / d1, (m21 - m12) / d1], axis=-1)

    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 0.0)) * 0.5
    d2 = 4.0 * jnp.maximum(qy2, 1e-12)
    c2 = jnp.stack([(m01 + m10) / d2, qy2, (m12 + m21) / d2, (m02 - m20) / d2], axis=-1)

    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 0.0)) * 0.5
    d3 = 4.0 * jnp.maximum(qz3, 1e-12)
    c3 = jnp.stack([(m02 + m20) / d3, (m12 + m21) / d3, qz3, (m10 - m01) / d3], axis=-1)

    pivots = jnp.stack(
        [tr, m00 - m11 - m22, -m00 + m11 - m22, -m00 - m11 + m22], axis=-1
    )
    idx = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(
        cands, idx[..., None, None].repeat(4, axis=-1), axis=-2
    )[..., 0, :]
    # canonical sign: w >= 0
    return q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)


def rot_from_quat(q: jax.Array) -> jax.Array:
    """(..., 4) quaternion (x, y, z, w) -> (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def se3_interpolate(T0: jax.Array, T1: jax.Array, alpha) -> jax.Array:
    """Geodesic interpolation T0 * exp(alpha * log(T0^-1 T1)).

    Parity: reference SE(3) GPS/VINS interpolation
    (/root/reference/MCSlam/src/FrontEnd.cpp:8128 interpolation_vins_GPS).
    """
    delta = se3_log(se3_inverse(T0) @ T1)
    alpha = jnp.asarray(alpha, dtype=delta.dtype)
    return T0 @ se3_exp(alpha[..., None] * delta)
