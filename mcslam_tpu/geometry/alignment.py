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


def kabsch_quat(
    src: jax.Array,
    dst: jax.Array,
    weights: jax.Array | None = None,
    iters: int = 48,
) -> tuple[jax.Array, jax.Array]:
    """Horn's quaternion absolute-orientation, batched, SVD-free.

    The optimal rotation is the dominant eigenvector of the symmetric 4x4
    Davenport K-matrix; power iteration on (K + shift*I) is pure VPU
    arithmetic, so thousands of RANSAC hypotheses solve without the
    scalar-sequential batched SVD path. Returns (R (..., 3, 3), t (..., 3)).
    """
    if weights is None:
        weights = jnp.ones(src.shape[:-1], dtype=src.dtype)
    w = weights[..., None]
    wsum = jnp.maximum(jnp.sum(w, axis=-2), 1e-12)
    mu_s = jnp.sum(src * w, axis=-2) / wsum
    mu_d = jnp.sum(dst * w, axis=-2) / wsum
    xs = src - mu_s[..., None, :]
    xd = dst - mu_d[..., None, :]
    # correlation B = src^T W dst -> Davenport/Horn N matrix whose dominant
    # eigenvector is the quaternion rotating src into dst
    B = jnp.einsum("...mi,...mj->...ij", xs * w, xd)
    tr = B[..., 0, 0] + B[..., 1, 1] + B[..., 2, 2]
    z = jnp.stack(
        [
            B[..., 1, 2] - B[..., 2, 1],
            B[..., 2, 0] - B[..., 0, 2],
            B[..., 0, 1] - B[..., 1, 0],
        ],
        axis=-1,
    )
    S = B + jnp.swapaxes(B, -1, -2)
    eye = jnp.eye(3, dtype=B.dtype)
    K = jnp.zeros(B.shape[:-2] + (4, 4), B.dtype)
    K = K.at[..., 0, 0].set(tr)
    K = K.at[..., 0, 1:].set(z)
    K = K.at[..., 1:, 0].set(z)
    K = K.at[..., 1:, 1:].set(S - tr[..., None, None] * eye)
    q = _dominant_eigvec4(K)
    # q = (w, x, y, z) here; convert to rotation taking src -> dst
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    from mcslam_tpu.geometry import lie as _lie

    R = _lie.rot_from_quat(jnp.stack([qx, qy, qz, qw], axis=-1))
    t = mu_d - jnp.einsum("...ij,...j->...i", R, mu_s)
    return R, t


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


def _dominant_eigvec4(K: jax.Array) -> jax.Array:
    """Dominant eigenvector of a symmetric 4x4 (batched), closed form.

    Characteristic polynomial via Faddeev-LeVerrier, lambda_max by Newton
    from the Frobenius-norm upper bound (quadratic convergence; power
    iteration stalls when the eigengap is small, e.g. minimal 3-point
    Kabsch sets), eigenvector from the adjugate of (K - lambda I). All
    branch-free elementwise math — no LAPACK-style factorization.
    """
    eye = jnp.eye(4, dtype=K.dtype)
    tr = lambda M: jnp.trace(M, axis1=-2, axis2=-1)
    M1 = K
    a3 = -tr(M1)
    M2 = K @ (M1 + a3[..., None, None] * eye)
    a2 = -tr(M2) / 2.0
    M3 = K @ (M2 + a2[..., None, None] * eye)
    a1 = -tr(M3) / 3.0
    M4 = K @ (M3 + a1[..., None, None] * eye)
    a0 = -tr(M4) / 4.0

    lam = jnp.sqrt(jnp.sum(K * K, axis=(-1, -2))) + 1e-9  # upper bound

    def newton(_, lam):
        p = (((lam + a3) * lam + a2) * lam + a1) * lam + a0
        dp = ((4.0 * lam + 3.0 * a3) * lam + 2.0 * a2) * lam + a1
        return lam - p / jnp.where(jnp.abs(dp) < 1e-12, 1e-12, dp)

    lam = jax.lax.fori_loop(0, 12, newton, lam)

    A = K - lam[..., None, None] * eye
    # adjugate of 4x4 via cofactors (each a 3x3 determinant)
    idx = jnp.arange(4)

    def minor_det(r, c):
        rows = jnp.delete(idx, r, assume_unique_indices=True)
        cols = jnp.delete(idx, c, assume_unique_indices=True)
        M = A[..., rows[:, None], cols[None, :]]
        from mcslam_tpu.geometry import linalg3

        return linalg3.det3(M)

    cof = jnp.stack(
        [
            jnp.stack(
                [((-1.0) ** (r + c)) * minor_det(r, c) for c in range(4)],
                axis=-1,
            )
            for r in range(4)
        ],
        axis=-2,
    )
    adj = jnp.swapaxes(cof, -1, -2)  # (..., 4, 4); columns span null(A)
    norms = jnp.sum(adj * adj, axis=-2)  # (..., 4) column norms
    best = jnp.argmax(norms, axis=-1)
    q = jnp.take_along_axis(adj, best[..., None, None].repeat(4, -2), axis=-1)[
        ..., 0
    ]
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)


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
