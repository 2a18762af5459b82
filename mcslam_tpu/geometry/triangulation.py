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

import jax
import jax.numpy as jnp

from mcslam_tpu.geometry import lie, linalg3


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

    return jax.lax.fori_loop(0, iters, step, X0)


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
    """
    origins = world_T_cam[..., :3, 3]
    xn = (uv - fxycxy[..., 2:]) / fxycxy[..., :2]
    rays_cam = jnp.concatenate([xn, jnp.ones_like(xn[..., :1])], axis=-1)
    rays_cam = rays_cam / jnp.linalg.norm(rays_cam, axis=-1, keepdims=True)
    dirs = jnp.einsum("...ij,...j->...i", world_T_cam[..., :3, :3], rays_cam)
    X0, ok0 = triangulate_rays(origins, dirs, mask)
    X = refine_points_gn(X0, world_T_cam, uv, fxycxy, mask, iters=gn_iters)
    # fall back to the linear solution if GN diverged
    X = jnp.where(jnp.all(jnp.isfinite(X), axis=-1, keepdims=True), X, X0)
    ray_ok = chi2_gate(
        X, world_T_cam, uv, fxycxy, mask, sigma, chi2_thresh, min_z, max_z
    )
    ok = ok0 & (jnp.sum(ray_ok, axis=-1) >= 2)
    return X, ok


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
