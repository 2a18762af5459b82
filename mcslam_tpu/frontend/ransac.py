"""Vectorized RANSAC: fixed batches of minimal-solver hypotheses scored with
masked reductions — no data-dependent control flow.

Parity (WHAT): the reference's pose estimation dispatch estimatePoseLF
(/root/reference/MCSlam/src/FrontEnd.cpp:4421) with its OpenGV RANSAC loops:
  * poseFromPCAlignment (:4441) — 3D-3D alignment of rig-triangulated points
    to map landmarks -> here `ransac_kabsch` (batched 3-point Kabsch);
  * absolutePoseFromGP3P (:4660) — 2D-3D absolute pose -> here `ransac_pnp`
    (batched 4-point DLT-PnP hypotheses, scored generalized across the whole
    rig so non-central information is used at scoring time);
  * poseFromSeventeenPt (:4532) / essential-matrix init (:2583-2628) ->
    `ransac_essential` (batched 8-point) for monocular bootstrap.

HOW (TPU): K hypotheses are drawn as one gather, solved as one batched
linear-algebra call (Kabsch SVD / DLT SVD), scored as one (K, M) masked
reduction, and argmax picks the winner. 512 hypotheses cost one kernel.
"""

from __future__ import annotations

from typing import NamedTuple

import functools

import jax
import jax.numpy as jnp

from mcslam_tpu.geometry import alignment, lie


class RansacResult(NamedTuple):
    world_T_ref: jax.Array  # (4, 4) best rig pose hypothesis
    inliers: jax.Array  # (M,) bool
    num_inliers: jax.Array  # () int32
    ok: jax.Array  # () bool


import os as _os

# Inverse-CDF sampling (one uniform per draw + binary search over the
# weight prefix sum) is distributionally identical to the Gumbel-max
# categorical but needs K*S threefry uniforms instead of K*S*M (~6M per
# RANSAC dispatch at K=512, M=2048). It is OPT-IN because changing the
# draw stream reshuffles every RANSAC outcome, and the suite's mono
# canary is chaotically draw-sensitive. REJECTED as default by the
# round-4 chip A/B: FULL fused track prod 6.27 ms with invcdf vs 5.09 ms
# base (docs/onchip_r04/bisect_track_invcdf.out) — the threefry stream
# is not the bottleneck and the searchsorted costs more than it saves.
# Trace-time read so the paired A/B harness can host both variants.
def _invcdf() -> bool:
    return _os.environ.get("MCSLAM_INVCDF_SAMPLING") == "1"


def _sample_idx_invcdf(key, num_hyp: int, sample_size: int, m: int,
                       weights) -> jax.Array:
    """Weighted index sampling via inverse CDF (see _invcdf note)."""
    w = jnp.maximum(weights.astype(jnp.float32), 0.0)
    cdf = jnp.cumsum(w)
    total = cdf[-1]
    u = jax.random.uniform(
        key, (num_hyp, sample_size), dtype=jnp.float32,
        minval=0.0, maxval=1.0,
    ) * jnp.maximum(total, 1e-30)
    idx = jnp.searchsorted(cdf, u, side="right")
    return jnp.clip(idx, 0, m - 1).astype(jnp.int32)


def _sample_idx(key, num_hyp: int, sample_size: int, m: int, weights) -> jax.Array:
    """(K, S) random correspondence indices drawn with probability ~ weights."""
    if _invcdf():
        return _sample_idx_invcdf(key, num_hyp, sample_size, m, weights)
    logits = jnp.log(jnp.maximum(weights, 1e-9))
    return jax.random.categorical(
        key, logits[None, :], shape=(num_hyp, sample_size)
    ).astype(jnp.int32)


def _nullspace_vecs(A: jax.Array, second: bool = False, iters: int = 5):
    """Smallest (and optionally second-smallest) right-singular vector of
    batched A (K, R, N) WITHOUT batched SVD.

    jnp.linalg.svd on TPU lowers to a scalar-bound QR/Jacobi loop — at
    K=hundreds of RANSAC hypotheses per tracking dispatch it dominates
    the program. Inverse iteration on the shifted normal matrix
    G = A^T A + eps*I needs one batched Cholesky (N<=13) and `iters`
    pairs of batched triangular solves — all MXU/VPU-friendly. Hypothesis
    accuracy only needs to survive RANSAC scoring, and the nullspace gap
    of a minimal-sample system makes 5 iterations plenty.

    Returns v1 (K, N) unit vectors, or (v1, v2) with v2 deflated against
    v1 when `second=True`.
    """
    G = jnp.einsum("krn,krm->knm", A, A)
    N = G.shape[-1]
    tr = jnp.trace(G, axis1=-2, axis2=-1)
    eps = tr / N * 1e-7 + 1e-12
    Gs = G + eps[:, None, None] * jnp.eye(N, dtype=G.dtype)
    L = jnp.linalg.cholesky(Gs)

    def solve(v):
        y = jax.lax.linalg.triangular_solve(
            L, v[..., None], left_side=True, lower=True
        )
        x = jax.lax.linalg.triangular_solve(
            L, y, left_side=True, lower=True, transpose_a=True
        )[..., 0]
        return x

    def normalize(v):
        return v * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), 1e-30)
        )

    # fixed generic start vector (irrational-ish ramp: measure-zero risk
    # of orthogonality to the null direction)
    v = jnp.broadcast_to(
        jnp.cos(jnp.arange(N, dtype=G.dtype) * 1.7 + 0.3), G.shape[:1] + (N,)
    )
    for _ in range(iters):
        v = normalize(solve(v))
    if not second:
        return v

    w = jnp.broadcast_to(
        jnp.sin(jnp.arange(N, dtype=G.dtype) * 2.3 + 1.1), G.shape[:1] + (N,)
    )
    for _ in range(iters):
        w = solve(w)
        w = w - jnp.sum(w * v, axis=-1, keepdims=True) * v
        w = normalize(w)
    return v, w


def _project_so3(Rraw: jax.Array) -> jax.Array:
    """Nearest rotation to batched 3x3 matrices by scaled Newton–Schulz
    polar iteration (replaces the batched SVD projection; same TPU
    rationale as _nullspace_vecs). The sign pre-flip sends det>0, which
    the iteration preserves; scaling by ||X||_F/sqrt(3) puts every
    singular value inside the convergence region (0, sqrt(3))."""
    det = jnp.linalg.det(Rraw)
    X = Rraw * jnp.where(det < 0, -1.0, 1.0)[..., None, None]
    fro = jnp.sqrt(jnp.maximum(jnp.sum(X * X, axis=(-2, -1)), 1e-30))
    X = X * (jnp.sqrt(3.0) / fro)[..., None, None]
    I = jnp.eye(3, dtype=Rraw.dtype)
    for _ in range(6):
        X = 0.5 * X @ (3.0 * I - jnp.swapaxes(X, -1, -2) @ X)
    return X


def _score_reprojection(
    world_T_ref_h: jax.Array,  # (K, 4, 4)
    X_world: jax.Array,  # (M, 3)
    uv: jax.Array,  # (M, 2) undistorted pixels in the observing camera
    cam_T_ref: jax.Array,  # (M, 4, 4) extrinsic of the observing camera
    fxycxy: jax.Array,  # (M, 4)
    mask: jax.Array,  # (M,)
    px_thresh: float,
) -> tuple[jax.Array, jax.Array]:
    """-> (inlier counts (K,), inlier masks (K, M)). Generalized-camera
    scoring: each correspondence is projected into its own rig camera."""
    ref_T_world = lie.se3_inverse(world_T_ref_h)  # (K, 4, 4)
    p_ref = lie.se3_apply(ref_T_world[:, None], X_world[None])  # (K, M, 3)
    p_cam = lie.se3_apply(cam_T_ref[None], p_ref)  # (K, M, 3)
    z = p_cam[..., 2]
    good_z = z > 0.05
    zs = jnp.where(good_z, z, 1.0)
    pred = p_cam[..., :2] / zs[..., None] * fxycxy[None, ..., :2] + fxycxy[None, ..., 2:]
    err2 = jnp.sum((pred - uv[None]) ** 2, axis=-1)
    inl = good_z & (err2 < px_thresh**2) & mask[None]
    return jnp.sum(inl, axis=-1), inl


@functools.partial(
    jax.jit, static_argnames=("num_hyp",)
)
def ransac_kabsch(
    key,
    X_rig: jax.Array,  # (M, 3) points in current rig/ref frame
    X_world: jax.Array,  # (M, 3) corresponding world landmarks
    uv: jax.Array,  # (M, 2) observed pixels (anchor cam, undistorted)
    cam_T_ref: jax.Array,  # (M, 4, 4) anchor-camera extrinsics
    fxycxy: jax.Array,  # (M, 4) anchor-camera intrinsics
    mask: jax.Array,  # (M,) valid correspondences
    num_hyp: int = 512,
    px_thresh: float = 5.0,
    min_inliers: int = 10,
) -> RansacResult:
    """3-point 3D-3D hypotheses: world_T_ref aligning rig points to landmarks,
    scored by generalized reprojection."""
    idx = _sample_idx(key, num_hyp, 3, X_rig.shape[0], mask.astype(jnp.float32))
    src = X_rig[idx]  # (K, 3, 3)
    dst = X_world[idx]
    # Horn quaternion solver: SVD-free (batched SVD is scalar-bound on TPU)
    R, t = alignment.kabsch_quat(src, dst)
    hyp = lie.se3_matrix(R, t)  # (K, 4, 4) world_T_ref
    counts, inl = _score_reprojection(
        hyp, X_world, uv, cam_T_ref, fxycxy, mask, px_thresh
    )
    best = jnp.argmax(counts)
    n = counts[best]
    return RansacResult(
        world_T_ref=hyp[best],
        inliers=inl[best],
        num_inliers=n.astype(jnp.int32),
        ok=n >= min_inliers,
    )


def _dlt_gpnp(Xw: jax.Array, rays: jax.Array, Tcr: jax.Array) -> jax.Array:
    """Batched GENERALIZED (non-central) linear absolute pose from S >= 6
    correspondences — the lever-arm-aware counterpart of _dlt_pnp, covering
    the reference's non-central GP3P role for wide-baseline rigs
    (/root/reference/MCSlam/src/FrontEnd.cpp:4660).

    Xw: (K, S, 3) world points; rays: (K, S, 3) observation rays in each
    observing CAMERA frame; Tcr: (K, S, 4, 4) cam_T_ref extrinsics.
    Returns ref_T_world (K, 4, 4).

    Each observation constrains [d]x (R_cr (R X + t) + t_cr) = 0, which is
    AFFINE in the 12 unknowns theta = [vec_rows(R) | t]: the known lever
    arm t_cr pins the overall scale, so the (3S, 13) homogeneous system
    [A | b] (theta, 1) = 0 has a unique null direction. For a central rig
    (t_cr == 0) the 13th column vanishes and e13 joins the null space —
    those hypotheses are garbage there, which is why ransac_pnp runs a
    half/half portfolio of central + generalized hypotheses and lets the
    exact non-central scoring pick the winner.
    """
    K_, S = Xw.shape[:2]
    R_cr = Tcr[..., :3, :3]  # (K,S,3,3)
    t_cr = Tcr[..., :3, 3]  # (K,S,3)
    dx = lie.so3_hat(rays)  # (K,S,3,3)
    B = jnp.einsum("ksab,ksbc->ksac", dx, R_cr)  # (K,S,3,3) = [d]x R_cr
    # rows of A: [d]x R_cr (RX + t); (RX + t)_i = sum_j R_ij X_j + t_i
    # column layout: theta = [R11 R12 R13 R21 ... R33 | t1 t2 t3]
    # A[:, :, :, 3*j + c] = B[..., j] * X[..., c]
    A_R = jnp.einsum("ksaj,ksc->ksajc", B, Xw).reshape(K_, S, 3, 9)
    A_t = B  # (K,S,3,3)
    b = jnp.einsum("ksab,ksb->ksa", dx, t_cr)[..., None]  # (K,S,3,1)
    M_full = jnp.concatenate([A_R, A_t, b], axis=-1)  # (K,S,3,13)
    M_full = M_full.reshape(K_, S * 3, 13)
    # smallest null direction; if it degenerated to ~e13 (central rig),
    # take the second-smallest instead
    v_a, v_b = _nullspace_vecs(M_full, second=True)
    use_a = jnp.linalg.norm(v_a[..., :12], axis=-1) > 0.3
    v = jnp.where(use_a[:, None], v_a, v_b)
    hom = v[..., 12]
    theta = v[..., :12] / jnp.where(
        jnp.abs(hom) > 1e-8, hom, jnp.where(hom < 0, -1e-8, 1e-8)
    )[..., None]
    Rraw = theta[..., :9].reshape(K_, 3, 3)
    t = theta[..., 9:12]
    # project to SO(3); renormalize t by the raw rotation scale
    R = _project_so3(Rraw)
    # mean singular value of Rraw without an SVD: sqrt(tr(Rraw^T Rraw)/3)
    # (exact when the three singular values are equal, which holds up to
    # noise for a scaled rotation)
    s = jnp.maximum(
        jnp.sqrt(jnp.sum(Rraw * Rraw, axis=(-2, -1)) / 3.0), 1e-9
    )
    return lie.se3_matrix(R, t / s[:, None])


def _dlt_pnp(Xw: jax.Array, xn: jax.Array) -> jax.Array:
    """Batched linear PnP from S >= 6 correspondences.

    Xw: (K, S, 3) world points; xn: (K, S, 2) normalized image coords in the
    target camera. Returns cam_T_world (K, 4, 4) (orthogonalized).
    """
    K_, S = Xw.shape[:2]
    zeros = jnp.zeros((K_, S, 4), Xw.dtype)
    Xh = jnp.concatenate([Xw, jnp.ones((K_, S, 1), Xw.dtype)], axis=-1)  # (K,S,4)
    u = xn[..., 0:1]
    v = xn[..., 1:2]
    row1 = jnp.concatenate([Xh, zeros, -u * Xh], axis=-1)  # (K, S, 12)
    row2 = jnp.concatenate([zeros, Xh, -v * Xh], axis=-1)
    A = jnp.concatenate([row1, row2], axis=-2)  # (K, 2S, 12)
    p = _nullspace_vecs(A).reshape(K_, 3, 4)
    # fix scale/sign: ||r3|| = 1, det(R) > 0, points in front
    scale = jnp.linalg.norm(p[:, 2, :3], axis=-1, keepdims=True)[..., None]
    p = p / jnp.maximum(scale, 1e-12)
    # cheirality on the sample mean
    zmean = jnp.einsum("kj,ksj->ks", p[:, 2, :], Xh).mean(axis=-1)
    p = p * jnp.where(zmean < 0, -1.0, 1.0)[:, None, None]
    Rraw = p[:, :, :3]
    t = p[:, :, 3]
    R = _project_so3(Rraw)
    return lie.se3_matrix(R, t)


@functools.partial(
    jax.jit, static_argnames=("num_hyp", "sample_size")
)
def ransac_pnp(
    key,
    X_world: jax.Array,  # (M, 3)
    uv: jax.Array,  # (M, 2) undistorted pixels
    obs_cam_T_ref: jax.Array,  # (M, 4, 4) observing-camera extrinsic
    obs_fxycxy: jax.Array,  # (M, 4)
    mask: jax.Array,
    num_hyp: int = 256,
    sample_size: int = 6,
    px_thresh: float = 5.0,
    min_inliers: int = 10,
) -> RansacResult:
    """2D-3D absolute pose. Hypotheses are central DLT-PnP in each sample's
    anchor camera (all sample correspondences drawn from features, solved in
    normalized coords of their own camera by first rotating into a common
    frame through the known extrinsics), scored generalized over the rig.

    Assumes each sampled correspondence's observing camera is accounted by
    composing hypothesis cam_T_world with the known cam_T_ref: we solve for
    ref_T_world directly by expressing each observation as a normalized ray
    in the REFERENCE frame scaled projection — valid since minimal solving
    with mixed cameras uses the central approximation only within the sample
    (baseline << scene depth), while scoring is exactly non-central.
    """
    m = X_world.shape[0]
    idx = _sample_idx(key, num_hyp, sample_size, m, mask.astype(jnp.float32))
    Xs = X_world[idx]  # (K, S, 3)
    # normalized coords in the observing camera, then rotate ray into ref cam
    f = obs_fxycxy[idx]
    xn_cam = (uv[idx] - f[..., 2:]) / f[..., :2]  # (K, S, 2)
    rays = jnp.concatenate([xn_cam, jnp.ones_like(xn_cam[..., :1])], axis=-1)
    Tcr = obs_cam_T_ref[idx]  # (K, S, 4, 4)
    R_ref_cam = jnp.swapaxes(Tcr[..., :3, :3], -1, -2)
    rays_ref = jnp.einsum("ksij,ksj->ksi", R_ref_cam, rays)
    xn_ref = rays_ref[..., :2] / jnp.maximum(rays_ref[..., 2:], 1e-6)
    # hypothesis portfolio, half central / half generalized: the central
    # DLT is exact for rays through the ref-camera center and degrades as
    # baseline approaches scene depth; the generalized DLT keeps the
    # lever arm (exact for non-central rigs) but is singular for central
    # ones. Scoring is exactly non-central either way, so the better
    # family wins per scene.
    kc = num_hyp // 2
    ref_T_world_c = _dlt_pnp(Xs[:kc], xn_ref[:kc])
    # the generalized DLT is singular for CENTRAL rigs (zero lever arm
    # kills the scale-pinning 13th column): fall back to central DLT for
    # the second half there so a mono/identity-extrinsic rig keeps its
    # full hypothesis budget
    lever = jnp.max(jnp.linalg.norm(obs_cam_T_ref[..., :3, 3], axis=-1))
    noncentral = lever > 1e-6
    ref_T_world_g = jnp.where(
        noncentral,
        _dlt_gpnp(Xs[kc:], rays[kc:], Tcr[kc:]),
        _dlt_pnp(Xs[kc:], xn_ref[kc:]),
    )
    ref_T_world = jnp.concatenate([ref_T_world_c, ref_T_world_g], axis=0)
    hyp = lie.se3_inverse(ref_T_world)  # world_T_ref
    counts, inl = _score_reprojection(
        hyp, X_world, uv, obs_cam_T_ref, obs_fxycxy, mask, px_thresh
    )
    best = jnp.argmax(counts)
    n = counts[best]
    return RansacResult(
        world_T_ref=hyp[best],
        inliers=inl[best],
        num_inliers=n.astype(jnp.int32),
        ok=n >= min_inliers,
    )


class EssentialResult(NamedTuple):
    E: jax.Array  # (3, 3)
    rel_T: jax.Array  # (4, 4) cam1_T_cam0 with unit translation
    inliers: jax.Array  # (M,)
    num_inliers: jax.Array
    ok: jax.Array


def _eight_point(xn0: jax.Array, xn1: jax.Array) -> jax.Array:
    """Batched 8-point essential: (K, 8, 2) x2 -> (K, 3, 3) with singular
    values projected to (1, 1, 0)."""
    x0, y0 = xn0[..., 0], xn0[..., 1]
    x1, y1 = xn1[..., 0], xn1[..., 1]
    ones = jnp.ones_like(x0)
    # epipolar constraint x1^T E x0 = 0
    A = jnp.stack(
        [x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1, x0, y0, ones], axis=-1
    )  # (K, 8, 9)
    # mono init/reinit quality is gated directly by E here (no robust
    # refine downstream of the winning hypothesis before triangulation),
    # so this path keeps a higher inverse-iteration budget than the
    # PnP/Kabsch hypothesis solvers (iters=3 measurably degraded the
    # mono re-initialization test)
    E = _nullspace_vecs(A, iters=6).reshape(-1, 3, 3)
    U, S, Vt2 = jnp.linalg.svd(E)
    S2 = jnp.stack([jnp.ones_like(S[..., 0]), jnp.ones_like(S[..., 0]),
                    jnp.zeros_like(S[..., 0])], axis=-1)
    return U @ (S2[..., :, None] * Vt2)


def _decompose_E(E: jax.Array, xn0: jax.Array, xn1: jax.Array, mask) -> jax.Array:
    """Pick the (R, t) of the 4 decompositions with max points in front.
    E: (3,3); xn: (M, 2). Returns cam1_T_cam0 (4, 4), |t| = 1."""
    U, _, Vt = jnp.linalg.svd(E)
    # enforce rotation
    detU = jnp.linalg.det(U)
    detV = jnp.linalg.det(Vt)
    U = U * jnp.where(detU < 0, -1.0, 1.0)
    Vt = Vt * jnp.where(detV < 0, -1.0, 1.0)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    cands = jnp.stack(
        [
            lie.se3_matrix(R1, t),
            lie.se3_matrix(R1, -t),
            lie.se3_matrix(R2, t),
            lie.se3_matrix(R2, -t),
        ]
    )  # (4, 4, 4)

    def count_front(T10):
        # midpoint triangulation cheirality for all matches
        o0 = jnp.zeros(3, E.dtype)
        d0 = jnp.concatenate([xn0, jnp.ones_like(xn0[..., :1])], axis=-1)
        d0 = d0 / jnp.linalg.norm(d0, axis=-1, keepdims=True)
        T01 = lie.se3_inverse(T10)
        o1 = T01[:3, 3]
        d1c = jnp.concatenate([xn1, jnp.ones_like(xn1[..., :1])], axis=-1)
        d1 = (T01[:3, :3] @ d1c.T).T
        d1 = d1 / jnp.linalg.norm(d1, axis=-1, keepdims=True)
        # two-ray midpoint
        b = o1 - o0
        d0d1 = jnp.sum(d0 * d1, axis=-1)
        denom = jnp.maximum(1.0 - d0d1**2, 1e-9)
        s = (jnp.sum(b * d0, axis=-1) - d0d1 * jnp.sum(b * d1, axis=-1)) / denom
        u = (d0d1 * jnp.sum(b * d0, axis=-1) - jnp.sum(b * d1, axis=-1)) / denom
        X = o0 + s[:, None] * d0
        z0 = X[:, 2]
        z1 = lie.se3_apply(T10, X)[:, 2]
        return jnp.sum((z0 > 0) & (z1 > 0) & (s > 0) & (u > 0) & mask)

    scores = jax.vmap(count_front)(cands)
    return cands[jnp.argmax(scores)]


@functools.partial(
    jax.jit, static_argnames=("num_hyp",)
)
def ransac_essential(
    key,
    xn0: jax.Array,  # (M, 2) normalized coords, frame 0
    xn1: jax.Array,  # (M, 2) normalized coords, frame 1
    mask: jax.Array,
    num_hyp: int = 512,
    thresh_n: float = 2.0 / 400.0,
    min_inliers: int = 30,
) -> EssentialResult:
    """Monocular relative-pose bootstrap (reference initialization path,
    FrontEnd.cpp:2583-2628)."""
    idx = _sample_idx(key, num_hyp, 8, xn0.shape[0], mask.astype(jnp.float32))
    E = _eight_point(xn0[idx], xn1[idx])  # (K, 3, 3)
    # sampson scoring
    h0 = jnp.concatenate([xn0, jnp.ones_like(xn0[..., :1])], axis=-1)  # (M, 3)
    h1 = jnp.concatenate([xn1, jnp.ones_like(xn1[..., :1])], axis=-1)
    Ex0 = jnp.einsum("kij,mj->kmi", E, h0)  # (K, M, 3)
    Eth1 = jnp.einsum("kji,mj->kmi", E, h1)
    num = jnp.einsum("mi,kmi->km", h1, Ex0) ** 2
    den = (
        Ex0[..., 0] ** 2 + Ex0[..., 1] ** 2 + Eth1[..., 0] ** 2 + Eth1[..., 1] ** 2
    )
    d2 = num / jnp.maximum(den, 1e-12)
    inl = (d2 < thresh_n**2) & mask[None]
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)
    E_best = E[best]
    rel_T = _decompose_E(E_best, xn0, xn1, inl[best])
    n = counts[best]
    return EssentialResult(
        E=E_best,
        rel_T=rel_T,
        inliers=inl[best],
        num_inliers=n.astype(jnp.int32),
        ok=n >= min_inliers,
    )
