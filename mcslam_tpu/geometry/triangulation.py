"""Batched multi-view triangulation: midpoint/DLT initialization + Gauss-Newton
refinement with chi-square gating, all static-shape and mask-aware.

Parity (WHAT): replaces cv::sfm::triangulatePoints usage in
/root/reference/MCSlam/src/FrontEnd.cpp:304-308 and the GTSAM
triangulateSafe + per-point LM TriangulationFactor refinement of
/root/reference/MCSlam/src/FrontEnd.cpp:6465-6570 (TriangulateNewLandmarks).
Re-designed as one fused batched linear solve over padded ray sets: every
landmark is triangulated from up to R rays with a validity mask, so thousands
of landmarks triangulate in a single XLA kernel instead of per-point loops.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from mcslam_tpu.geometry import lie, linalg3

# see pose_opt._unroll: scan/loop unrolling is a latency-vs-compile-time
# trade. Default UNROLLED since the round-5 paired chip A/B (-0.154 ms on
# the fused track program, docs/onchip_r05/ab_paired1.out); the persistent
# compile cache pays the 2x trace cost once. MCSLAM_NO_UNROLL=1 opts back
# into looped scans. Trace-time read so the paired A/B harness can host
# both variants in one process.
def _unroll() -> bool:
    if os.environ.get("MCSLAM_NO_UNROLL") == "1":
        return False
    return os.environ.get("MCSLAM_UNROLL", "1") == "1"


def triangulate_rays(
    origins: jax.Array,
    dirs: jax.Array,
    mask: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Least-squares midpoint of up to R rays per point.

    origins: (..., R, 3) ray origins in world frame.
    dirs:    (..., R, 3) unit ray directions.
    mask:    (..., R) bool, valid rays.

    Minimizes sum_r || (I - d_r d_r^T)(X - o_r) ||^2 -> 3x3 linear system.
    Returns (X (..., 3), ok (...,)) where ok requires >= 2 valid rays and a
    well-conditioned system.
    """
    m = mask[..., None, None].astype(dirs.dtype)  # (..., R, 1, 1)
    d = dirs[..., :, None]  # (..., R, 3, 1)
    eye = jnp.eye(3, dtype=dirs.dtype)
    P = (eye - d @ jnp.swapaxes(d, -1, -2)) * m  # (..., R, 3, 3)
    A = jnp.sum(P, axis=-3)  # (..., 3, 3)
    b = jnp.sum((P @ origins[..., :, None]), axis=-3)[..., 0]  # (..., 3)
    # regularize to keep solve defined for empty/degenerate sets
    n_valid = jnp.sum(mask, axis=-1)
    A_reg = A + 1e-6 * eye
    X = linalg3.solve3(A_reg, b)
    # conditioning check: smallest eigenvalue of A proportional to parallax
    det = linalg3.det3(A_reg)
    ok = (n_valid >= 2) & (det > 1e-9) & jnp.all(jnp.isfinite(X), axis=-1)
    return X, ok


def reprojection_residuals(
    X: jax.Array,
    world_T_cam: jax.Array,
    uv: jax.Array,
    fxycxy: jax.Array,
) -> jax.Array:
    """Pinhole reprojection residuals (no distortion: uv must be undistorted).

    X: (..., 3) world point; world_T_cam: (..., R, 4, 4); uv: (..., R, 2);
    fxycxy: (..., R, 4). Returns (..., R, 2) residuals in pixels.
    """
    cam_T_world = lie.se3_inverse(world_T_cam)
    p_cam = lie.se3_apply(cam_T_world, X[..., None, :])
    z = jnp.maximum(p_cam[..., 2], 1e-6)
    pred = p_cam[..., :2] / z[..., None] * fxycxy[..., :2] + fxycxy[..., 2:]
    return pred - uv


def refine_points_gn(
    X0: jax.Array,
    world_T_cam: jax.Array,
    uv: jax.Array,
    fxycxy: jax.Array,
    mask: jax.Array,
    iters: int = 5,
    damping: float = 1e-3,
) -> jax.Array:
    """Batched per-point Gauss-Newton on reprojection error with ANALYTIC
    Jacobians (dr/dX = J_proj @ R_cam_world), assembled as einsums — one
    fused kernel per iteration instead of per-point jacfwd traces.
    """
    cam_T_world = lie.se3_inverse(world_T_cam)  # (..., R, 4, 4)
    R_cw = cam_T_world[..., :3, :3]
    t_cw = cam_T_world[..., :3, 3]
    fx = fxycxy[..., 0]
    fy = fxycxy[..., 1]
    m = mask.astype(X0.dtype)
    eye3 = jnp.eye(3, dtype=X0.dtype)

    def step(_, X):
        p = jnp.einsum("...rij,...j->...ri", R_cw, X) + t_cw  # (..., R, 3)
        z = jnp.maximum(p[..., 2], 1e-3)
        inv_z = 1.0 / z
        pred = p[..., :2] * inv_z[..., None] * fxycxy[..., :2] + fxycxy[..., 2:]
        r = (pred - uv) * m[..., None]  # (..., R, 2)
        # J_proj (..., R, 2, 3)
        zero = jnp.zeros_like(fx)
        Jp = jnp.stack(
            [
                jnp.stack([fx * inv_z, zero, -fx * p[..., 0] * inv_z * inv_z],
                          axis=-1),
                jnp.stack([zero, fy * inv_z, -fy * p[..., 1] * inv_z * inv_z],
                          axis=-1),
            ],
            axis=-2,
        )
        J = jnp.einsum("...rab,...rbc->...rac", Jp, R_cw)  # (..., R, 2, 3)
        J = J * m[..., None, None]
        H = jnp.einsum("...rai,...raj->...ij", J, J) + damping * eye3
        g = jnp.einsum("...rai,...ra->...i", J, r)
        return X - linalg3.solve3(H, g)

    # unrolled: the body is a handful of fused elementwise kernels, so the
    # while-loop bookkeeping (condition sync per step) costs more than the
    # straight-line repetition on TPU
    return jax.lax.fori_loop(0, iters, step, X0, unroll=_unroll())


def chi2_gate(
    X: jax.Array,
    world_T_cam: jax.Array,
    uv: jax.Array,
    fxycxy: jax.Array,
    mask: jax.Array,
    sigma: jax.Array | float = 1.0,
    chi2_thresh: float = 5.991,
    min_z: float = 0.1,
    max_z: float = 1e4,
) -> jax.Array:
    """Per-ray chi-square + cheirality gate.

    sigma may be per-ray (..., R) (e.g. octave-scaled as in the reference's
    sigma-per-octave gating, FrontEnd.cpp:2725). Returns (..., R) bool of rays
    that pass; a point survives if >= 2 of its rays pass.
    """
    r = reprojection_residuals(X, world_T_cam, uv, fxycxy)
    sigma = jnp.asarray(sigma, dtype=r.dtype)
    chi2 = jnp.sum((r / sigma[..., None]) ** 2, axis=-1)
    cam_T_world = lie.se3_inverse(world_T_cam)
    z = lie.se3_apply(cam_T_world, X[..., None, :])[..., 2]
    return mask & (chi2 < chi2_thresh) & (z > min_z) & (z < max_z)


def _solve3_elem(A, b, damping=0.0):
    """Cofactor solve of a 3x3 system given as component arrays.

    A: [[a00..],[..],[..]] nested lists of (...,) arrays (symmetric not
    required); b: [b0, b1, b2]. Elementwise closed form — every array op
    runs at full lane width, unlike a (..., 3, 3) solve whose minor dims
    tile onto (8, 128) registers at ~2% utilization.
    """
    a00, a01, a02 = A[0][0] + damping, A[0][1], A[0][2]
    a10, a11, a12 = A[1][0], A[1][1] + damping, A[1][2]
    a20, a21, a22 = A[2][0], A[2][1], A[2][2] + damping
    c00 = a11 * a22 - a12 * a21
    c01 = a12 * a20 - a10 * a22
    c02 = a10 * a21 - a11 * a20
    det = a00 * c00 + a01 * c01 + a02 * c02
    # same guarded division as linalg3.solve3: clamp |det| at eps
    # PRESERVING SIGN (a sign flip on a near-singular system sends the
    # update the wrong way and the GN refine to garbage)
    eps = 1e-20
    safe = jnp.where(
        jnp.abs(det) < eps, jnp.sign(det) * eps + (det == 0) * eps, det
    )
    inv_det = 1.0 / safe
    c10 = a02 * a21 - a01 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a01 * a20 - a00 * a21
    c20 = a01 * a12 - a02 * a11
    c21 = a02 * a10 - a00 * a12
    c22 = a00 * a11 - a01 * a10
    b0, b1, b2 = b
    x0 = (c00 * b0 + c10 * b1 + c20 * b2) * inv_det
    x1 = (c01 * b0 + c11 * b1 + c21 * b2) * inv_det
    x2 = (c02 * b0 + c12 * b1 + c22 * b2) * inv_det
    return [x0, x1, x2], det


def triangulate_and_refine(
    world_T_cam: jax.Array,
    uv: jax.Array,
    fxycxy: jax.Array,
    mask: jax.Array,
    sigma: jax.Array | float = 1.0,
    chi2_thresh: float = 5.991,
    min_z: float = 0.1,
    max_z: float = 40.0,
    gn_iters: int = 5,
) -> tuple[jax.Array, jax.Array]:
    """Full pipeline: rays -> midpoint -> GN refine -> chi2/cheirality gate.

    world_T_cam: (..., R, 4, 4); uv: (..., R, 2) undistorted pixels;
    fxycxy: (..., R, 4); mask: (..., R).
    Returns (X (..., 3), ok (...,)).

    Layout: computed in TRANSPOSED component form — each scalar component
    is an (R, M) array with the point axis minor, so every op fills the
    (8, 128) vector registers. The naive (M, R, 3, 3) einsum form wastes
    ~40x of the lane width on the size-3 minor dims and measured 1.3 ms
    for M=2048 on v5e; this form is ~4x faster for identical math.
    """
    batch_shape = mask.shape[:-1]
    R = mask.shape[-1]
    M = 1
    for s in batch_shape:
        M *= s

    def t2(x):  # (..., R) -> (R, M)
        return jnp.moveaxis(x.reshape(M, R), 0, 1)

    f32 = jnp.float32
    T = [[t2(world_T_cam[..., i, j].astype(f32)) for j in range(4)]
         for i in range(3)]
    u = t2(uv[..., 0].astype(f32))
    v = t2(uv[..., 1].astype(f32))
    fx = t2(fxycxy[..., 0].astype(f32))
    fy = t2(fxycxy[..., 1].astype(f32))
    cx = t2(fxycxy[..., 2].astype(f32))
    cy = t2(fxycxy[..., 3].astype(f32))
    m = t2(mask.astype(f32))

    # unit ray directions in world frame
    xn = (u - cx) / fx
    yn = (v - cy) / fy
    inv_n = jax.lax.rsqrt(xn * xn + yn * yn + 1.0)
    dc = [xn * inv_n, yn * inv_n, inv_n]
    d = [T[i][0] * dc[0] + T[i][1] * dc[1] + T[i][2] * dc[2]
         for i in range(3)]
    o = [T[i][3] for i in range(3)]

    # midpoint: A = sum_r m (I - d d^T), b = sum_r m (I - d d^T) o
    A = [[None] * 3 for _ in range(3)]
    b = [None] * 3
    for i in range(3):
        for j in range(3):
            eye = 1.0 if i == j else 0.0
            A[i][j] = jnp.sum(m * (eye - d[i] * d[j]), axis=0)
    for i in range(3):
        acc = 0.0
        for j in range(3):
            eye = 1.0 if i == j else 0.0
            acc = acc + m * (eye - d[i] * d[j]) * o[j]
        b[i] = jnp.sum(acc, axis=0)
    X0, det = _solve3_elem(A, b, damping=1e-6)
    n_valid = jnp.sum(mask, axis=-1).reshape(M)
    ok0 = (n_valid >= 2) & (det > 1e-9)
    ok0 = ok0 & jnp.isfinite(X0[0]) & jnp.isfinite(X0[1]) & jnp.isfinite(X0[2])

    # cam_T_world components: Rcw = R^T, tcw = -R^T t
    Rcw = [[T[j][i] for j in range(3)] for i in range(3)]
    tcw = [-(T[0][i] * T[0][3] + T[1][i] * T[1][3] + T[2][i] * T[2][3])
           for i in range(3)]

    def project(X):
        p = [Rcw[i][0] * X[0] + Rcw[i][1] * X[1] + Rcw[i][2] * X[2] + tcw[i]
             for i in range(3)]
        return p

    damping = 1e-3

    def step(_, X):
        p = project(X)
        z = jnp.maximum(p[2], 1e-3)
        inv_z = 1.0 / z
        ru = (p[0] * inv_z * fx + cx - u) * m
        rv = (p[1] * inv_z * fy + cy - v) * m
        # J_proj rows folded through Rcw: Jc[a][i] = sum_k Jp[a][k] Rcw[k][i]
        gx = fx * inv_z
        gy = fy * inv_z
        hx = -gx * p[0] * inv_z  # d u / d z
        hy = -gy * p[1] * inv_z
        Jc = [[(gx * Rcw[0][i] + hx * Rcw[2][i]) * m for i in range(3)],
              [(gy * Rcw[1][i] + hy * Rcw[2][i]) * m for i in range(3)]]
        H = [[jnp.sum(Jc[0][i] * Jc[0][j] + Jc[1][i] * Jc[1][j], axis=0)
              for j in range(3)] for i in range(3)]
        g = [jnp.sum(Jc[0][i] * ru + Jc[1][i] * rv, axis=0) for i in range(3)]
        dX, _ = _solve3_elem(H, g, damping=damping)
        return [X[i] - dX[i] for i in range(3)]

    X = jax.lax.fori_loop(0, gn_iters, step, X0, unroll=_unroll())
    # fall back to the linear solution if GN diverged
    fin = jnp.isfinite(X[0]) & jnp.isfinite(X[1]) & jnp.isfinite(X[2])
    X = [jnp.where(fin, X[i], X0[i]) for i in range(3)]

    # chi2 + cheirality gate per ray
    p = project(X)
    z = p[2]
    zs = jnp.maximum(z, 1e-6)
    ru = p[0] / zs * fx + cx - u
    rv = p[1] / zs * fy + cy - v
    sig = jnp.asarray(sigma, f32)
    sig = t2(jnp.broadcast_to(sig, mask.shape).astype(f32))
    chi2 = (ru * ru + rv * rv) / (sig * sig)
    ray_ok = (m > 0.5) & (chi2 < chi2_thresh) & (z > min_z) & (z < max_z)
    ok = ok0 & (jnp.sum(ray_ok, axis=0) >= 2)
    Xout = jnp.stack(X, axis=-1).reshape(*batch_shape, 3)
    return Xout, ok.reshape(batch_shape)


def parallax_cosine(
    X: jax.Array, origins: jax.Array, mask: jax.Array
) -> jax.Array:
    """Min pairwise-extreme parallax proxy: cosine between the two most
    separated viewing rays (used for the reference's cosParallax < 0.99998
    acceptance gate, FrontEnd.cpp:2725-2754)."""
    rays = X[..., None, :] - origins
    rays = rays / jnp.maximum(jnp.linalg.norm(rays, axis=-1, keepdims=True), 1e-9)
    # pairwise cosines; invalid rays forced to cos=1 (no parallax)
    cos = jnp.einsum("...rd,...sd->...rs", rays, rays)
    pair_mask = mask[..., :, None] & mask[..., None, :]
    cos = jnp.where(pair_mask, cos, 1.0)
    return jnp.min(cos, axis=(-1, -2))
