"""Non-central (generalized-camera) relative pose from 2D-2D ray
correspondences across a rigid multi-camera rig ("17-pt" role).

Parity (WHAT): the reference's DEFAULT PoseEstimation path
FrontEnd::poseFromSeventeenPt (/root/reference/MCSlam/src/FrontEnd.cpp:4532,
dispatch :4421, member default SEVENTEEN_PT FrontEnd.h:623) and the
loop-closure essential check LoopCloser::checkEssentialMatrix
(/root/reference/MCSlam/src/LoopCloser.cpp:353-446) — both call OpenGV's
SEVENTEENPT NoncentralRelativePoseSacProblem inside a sequential RANSAC.
Unlike a central essential matrix, the non-central solution recovers a
METRIC translation (the rig baseline pins the scale), so a rig can
bootstrap and verify loops on distant scenery where intra-camera parallax
is too thin to triangulate.

HOW (TPU) — and why not a literal linear 17-pt: the classic lifting
x = [vec(E); vec(R)] of the generalized epipolar constraint (GEC)

    f1^T E f2 + f1^T R m2 + m1^T R f2 = 0,   E = [t]x R

is rank-deficient for exactly the rigs SLAM uses (collinear centers add
the exact data-independent null vector [0, a a^T]; same-camera-only match
sets add [0, I]), and its unweighted algebraic cost is statistically
biased toward t=0 on low-parallax scenes (measured: 36x lower algebraic
cost at the spurious point than at ground truth). Hypotheses are instead a
batched PORTFOLIO chosen for what each regime actually observes:
  * central 8-pt essential on rig-frame bearings -> rotation + translation
    DIRECTION (the strongly observed quantities),
  * bearing-Procrustes + linear-t seeds,
  * linear 17-pt null vectors (close scenes, where the lifting is sound),
every hypothesis expanded over a log scale grid for |t| (the weakly
observed quantity — signal ~ |t| * baseline / depth^2), scored with a
truncated (MSAC) GEOMETRIC cost: OpenGV's midpoint-triangulation angular
error. The winner is polished by a damped Gauss-Newton on those geometric
residuals via jax.jacfwd. Everything is fixed-shape batched linear algebra
(eigh / svd / solve); no data-dependent control flow.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mcslam_tpu.geometry import lie


class SeventeenResult(NamedTuple):
    rel_T: jax.Array  # (4, 4) frame1_T_frame2, metric translation
    inliers: jax.Array  # (M,) bool
    num_inliers: jax.Array  # () int32
    ok: jax.Array  # () bool


def plucker_rays(uv, anchor_cam, rig):
    """Undistorted anchor observations -> rays in the rig ref frame.

    uv: (M, 2) undistorted pixels; anchor_cam: (M,) int32.
    Returns (f (M, 3) unit directions, o (M, 3) camera centers).
    """
    fx = rig.fxycxy[anchor_cam]
    xn = (uv - fx[:, 2:]) / fx[:, :2]
    d_cam = jnp.concatenate([xn, jnp.ones_like(xn[:, :1])], axis=-1)
    d_cam = d_cam / jnp.linalg.norm(d_cam, axis=-1, keepdims=True)
    ref_T_cam = lie.se3_inverse(rig.cam_T_ref)[anchor_cam]  # (M, 4, 4)
    f = jnp.einsum("mij,mj->mi", ref_T_cam[:, :3, :3], d_cam)
    o = ref_T_cam[:, :3, 3]
    return f, o


def is_noncentral(rig, eps: float = 1e-6) -> bool:
    """Metric scale needs a genuine lever arm; callers must gate on this."""
    import numpy as np

    lever = np.linalg.norm(
        np.asarray(lie.se3_inverse(rig.cam_T_ref))[:, :3, 3], axis=-1
    )
    return bool(lever.max() > eps)


def rig_lever(rig) -> float:
    import numpy as np

    return float(
        np.linalg.norm(
            np.asarray(lie.se3_inverse(rig.cam_T_ref))[:, :3, 3], axis=-1
        ).max()
    )


# -- hypothesis families -----------------------------------------------------


def _project_so3(Rraw):
    """(..., 3, 3) -> nearest rotations (sign-fixed) + mean scale."""
    U, sv, Vt = jnp.linalg.svd(Rraw)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.ones(Rraw.shape[:-2] + (3,), Rraw.dtype)
    D = D.at[..., 2].set(jnp.sign(det) + (det == 0))
    R = U @ (D[..., :, None] * Vt)
    return R, jnp.maximum(sv.mean(axis=-1), 1e-9)


def _gec_rows(f1, o1, f2, o2):
    """(..., 3) dirs/centers -> (..., 18) linear-GEC rows [vec(E); vec(R)]."""
    m1 = jnp.cross(o1, f1)
    m2 = jnp.cross(o2, f2)
    kE = jnp.einsum("...i,...j->...ij", f1, f2).reshape(f1.shape[:-1] + (9,))
    kR = (
        jnp.einsum("...i,...j->...ij", f1, m2)
        + jnp.einsum("...i,...j->...ij", m1, f2)
    ).reshape(f1.shape[:-1] + (9,))
    return jnp.concatenate([kE, kR], axis=-1)


def _pick_null_combination(vecs, n_grid: int = 64):
    """Search combinations of the two smallest eigenvectors for the most
    rotation-like R block (the axial-rig spurious null vector mixes into
    the eigenbasis; R^T R isotropy disambiguates)."""
    v0 = vecs[..., :, 0]
    v1 = vecs[..., :, 1]
    theta = jnp.linspace(0.0, jnp.pi, n_grid, endpoint=False)
    x = (
        jnp.cos(theta)[None, :, None] * v0[:, None, :]
        + jnp.sin(theta)[None, :, None] * v1[:, None, :]
    )  # (K, G, 18)
    Rr = x[..., 9:].reshape(x.shape[:-1] + (3, 3))
    M = jnp.einsum("...ji,...jk->...ik", Rr, Rr)
    tr = jnp.trace(M, axis1=-2, axis2=-1) / 3.0
    dev = M - tr[..., None, None] * jnp.eye(3, dtype=M.dtype)
    obj = jnp.sum(dev * dev, axis=(-2, -1)) / jnp.maximum(tr, 1e-12) ** 2
    g = jnp.argmin(obj, axis=-1)
    return jnp.take_along_axis(x, g[:, None, None], axis=1)[:, 0, :]


def _extract_pose(x):
    """(K, 18) null vectors -> (R (K,3,3), t (K,3)) with metric scale."""
    E = x[..., :9].reshape(-1, 3, 3)
    Rr = x[..., 9:].reshape(-1, 3, 3)
    s = jnp.sign(jnp.linalg.det(Rr))
    s = jnp.where(s == 0, 1.0, s)[:, None, None]
    E = E * s
    Rr = Rr * s
    R, lam = _project_so3(Rr)
    A = (E / lam[:, None, None]) @ jnp.swapaxes(R, -1, -2)
    S = (A - jnp.swapaxes(A, -1, -2)) * 0.5
    t = jnp.stack([S[:, 2, 1], S[:, 0, 2], S[:, 1, 0]], axis=-1)
    return R, t


def _linear_t(R, f1, o1, f2, o2, w):
    """Given R, the GEC is LINEAR in t: rows (R f2 x f1) . t = -(f1^T R m2
    + m1^T R f2). Weighted 3x3 normal-equation solve."""
    m1 = jnp.cross(o1, f1)
    m2 = jnp.cross(o2, f2)
    Rf2 = jnp.einsum("kij,ksj->ksi", R, f2)
    Rm2 = jnp.einsum("kij,ksj->ksi", R, m2)
    c = jnp.cross(Rf2, f1)  # (K,S,3)
    rhs = -(jnp.sum(f1 * Rm2, axis=-1) + jnp.sum(m1 * Rf2, axis=-1))
    H = jnp.einsum("ksi,ksj,ks->kij", c, c, w) + 1e-9 * jnp.eye(3)
    g = jnp.einsum("ksi,ks->ki", c * rhs[..., None], w)
    return jnp.linalg.solve(H, g[..., None])[..., 0]


def _procrustes_seed(f1, f2, o1, o2, w):
    """R from bearing Procrustes (f1 ~ R f2; exact for distant scenes),
    then the linear-t solve. (K,S,3) rays -> (R, t)."""
    C = jnp.einsum("ksi,ksj,ks->kij", f1, f2, w)
    R, _ = _project_so3(C)
    t = _linear_t(R, f1, o1, f2, o2, w)
    return R, t


def _eight_point_bearings(f1s, f2s, w):
    """Central essential from unit bearings: f1^T E f2 = 0. (K,S,3) x2 ->
    E (K,3,3) projected to the essential manifold."""
    A = jnp.einsum("ksi,ksj->ksij", f1s, f2s).reshape(
        f1s.shape[0], f1s.shape[1], 9
    )
    G = jnp.einsum("ksi,ksj,ks->kij", A, A, w)
    _, vecs = jnp.linalg.eigh(G)
    E = vecs[..., :, 0].reshape(-1, 3, 3)
    U, S, Vt = jnp.linalg.svd(E)
    S2 = jnp.stack(
        [jnp.ones_like(S[..., 0]), jnp.ones_like(S[..., 0]),
         jnp.zeros_like(S[..., 0])], axis=-1,
    )
    return U @ (S2[..., :, None] * Vt)


def _decompose_E_batch(E, f1, o1, f2, o2, mask):
    """(K,3,3) essentials -> (R (K,3,3), unit t (K,3)) picking the
    decomposition with most points passing midpoint cheirality."""
    U, _, Vt = jnp.linalg.svd(E)
    U = U * jnp.where(jnp.linalg.det(U) < 0, -1.0, 1.0)[:, None, None]
    Vt = Vt * jnp.where(jnp.linalg.det(Vt) < 0, -1.0, 1.0)[:, None, None]
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    tu = U[:, :, 2]
    Rs = jnp.stack([R1, R1, R2, R2], axis=1)  # (K,4,3,3)
    ts = jnp.stack([tu, -tu, tu, -tu], axis=1)  # (K,4,3)
    K = E.shape[0]
    Rf = Rs.reshape(K * 4, 3, 3)
    tf = ts.reshape(K * 4, 3)
    counts, _ = _score(Rf, tf, f1, o1, f2, o2, mask, 1e9)  # cheirality only
    counts = counts.reshape(K, 4)
    pick = jnp.argmax(counts, axis=1)
    R = jnp.take_along_axis(Rs, pick[:, None, None, None], axis=1)[:, 0]
    t = jnp.take_along_axis(ts, pick[:, None, None], axis=1)[:, 0]
    return R, t


# -- geometric scoring + refinement ------------------------------------------


def _score(R, t, f1, o1, f2, o2, mask, thresh):
    """Midpoint-triangulation angular error, both rays (OpenGV semantics:
    inlier iff (1-cos th1) + (1-cos th2) < thresh, plus cheirality).
    Returns (counts (K,), inliers (K, M), msac (K,) truncated cost)."""
    f2w = jnp.einsum("kij,mj->kmi", R, f2)
    o2w = jnp.einsum("kij,mj->kmi", R, o2) + t[:, None, :]
    d0 = jnp.broadcast_to(f1[None], f2w.shape)
    o0 = jnp.broadcast_to(o1[None], o2w.shape)
    b = o2w - o0
    dd = jnp.sum(d0 * f2w, axis=-1)
    denom = jnp.maximum(1.0 - dd * dd, 1e-9)
    bd0 = jnp.sum(b * d0, axis=-1)
    bd1 = jnp.sum(b * f2w, axis=-1)
    s = (bd0 - dd * bd1) / denom
    u = (dd * bd0 - bd1) / denom
    X = 0.5 * (o0 + s[..., None] * d0 + o2w + u[..., None] * f2w)
    v1 = X - o0
    v2 = X - o2w
    n1 = jnp.sqrt(jnp.sum(v1 * v1, axis=-1) + 1e-12)
    n2 = jnp.sqrt(jnp.sum(v2 * v2, axis=-1) + 1e-12)
    c1 = jnp.sum(v1 * d0, axis=-1) / n1
    c2 = jnp.sum(v2 * f2w, axis=-1) / n2
    err = (1.0 - c1) + (1.0 - c2)
    front = (s > 0) & (u > 0)
    err = jnp.where(front & mask[None], err, jnp.inf)
    inl = err < thresh
    counts = jnp.sum(inl, axis=-1)
    return counts, inl


def _score_msac(R, t, f1, o1, f2, o2, mask, thresh):
    f2w = jnp.einsum("kij,mj->kmi", R, f2)
    o2w = jnp.einsum("kij,mj->kmi", R, o2) + t[:, None, :]
    d0 = jnp.broadcast_to(f1[None], f2w.shape)
    o0 = jnp.broadcast_to(o1[None], o2w.shape)
    b = o2w - o0
    dd = jnp.sum(d0 * f2w, axis=-1)
    denom = jnp.maximum(1.0 - dd * dd, 1e-9)
    bd0 = jnp.sum(b * d0, axis=-1)
    bd1 = jnp.sum(b * f2w, axis=-1)
    s = (bd0 - dd * bd1) / denom
    u = (dd * bd0 - bd1) / denom
    X = 0.5 * (o0 + s[..., None] * d0 + o2w + u[..., None] * f2w)
    v1 = X - o0
    v2 = X - o2w
    n1 = jnp.sqrt(jnp.sum(v1 * v1, axis=-1) + 1e-12)
    n2 = jnp.sqrt(jnp.sum(v2 * v2, axis=-1) + 1e-12)
    c1 = jnp.sum(v1 * d0, axis=-1) / n1
    c2 = jnp.sum(v2 * f2w, axis=-1) / n2
    err = (1.0 - c1) + (1.0 - c2)
    front = (s > 0) & (u > 0)
    big = 10.0 * thresh
    err = jnp.where(front & mask[None], err, big)
    inl = err < thresh
    msac = jnp.sum(jnp.minimum(err, thresh), axis=-1)
    counts = jnp.sum(inl, axis=-1)
    return counts, inl, msac


def _geo_residuals(d, R0, t0, f1, o1, f2, o2, w):
    """(6,) tangent delta -> weighted (M*6,) midpoint angular residual
    vector (cross products with the triangulated directions)."""
    R = R0 @ lie.so3_exp(d[:3])
    t = t0 + d[3:]
    f2w = f2 @ R.T
    o2w = o2 @ R.T + t[None]
    b = o2w - o1
    dd = jnp.sum(f1 * f2w, axis=-1)
    den = jnp.maximum(1.0 - dd * dd, 1e-9)
    bd0 = jnp.sum(b * f1, axis=-1)
    bd1 = jnp.sum(b * f2w, axis=-1)
    s = (bd0 - dd * bd1) / den
    u = (dd * bd0 - bd1) / den
    X = 0.5 * (o1 + s[:, None] * f1 + o2w + u[:, None] * f2w)
    v1 = X - o1
    v2 = X - o2w
    n1 = jnp.sqrt(jnp.sum(v1 * v1, axis=-1) + 1e-8)
    n2 = jnp.sqrt(jnp.sum(v2 * v2, axis=-1) + 1e-8)
    r1 = jnp.cross(f1, v1 / n1[:, None])
    r2 = jnp.cross(f2w, v2 / n2[:, None])
    return (jnp.concatenate([r1, r2], axis=-1) * w[:, None]).reshape(-1)


def _geo_lm(R, t, f1, o1, f2, o2, w, iters: int):
    """Damped GN on the geometric residuals (single pose), Jacobian by
    jacfwd, Jacobi-scaled solve, cost-gated steps with a lambda ladder."""
    jac = jax.jacfwd(_geo_residuals)
    zero = jnp.zeros(6)
    lam = jnp.asarray(1e-4)
    r = _geo_residuals(zero, R, t, f1, o1, f2, o2, w)
    cost = jnp.sum(r * r)
    for _ in range(iters):
        r = _geo_residuals(zero, R, t, f1, o1, f2, o2, w)
        J = jac(zero, R, t, f1, o1, f2, o2, w)
        H = J.T @ J
        g = J.T @ r
        sc = 1.0 / jnp.sqrt(jnp.diagonal(H) + 1e-12)
        Hs = H * sc[:, None] * sc[None, :] + lam * jnp.eye(6)
        d = sc * (-jnp.linalg.solve(Hs, (g * sc)[:, None])[:, 0])
        R_t = R @ lie.so3_exp(d[:3])
        t_t = t + d[3:]
        c_t = jnp.sum(
            _geo_residuals(zero, R_t, t_t, f1, o1, f2, o2, w) ** 2
        )
        adopt = c_t < cost
        R = jnp.where(adopt, R_t, R)
        t = jnp.where(adopt, t_t, t)
        cost = jnp.where(adopt, c_t, cost)
        lam = jnp.clip(jnp.where(adopt, lam * 0.3, lam * 10.0), 1e-7, 1e3)
    return R, t


# -- RANSAC ------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("num_hyp", "sample_size", "num_scales", "refine_iters"),
)
def ransac_seventeen(
    key,
    f1: jax.Array,  # (M, 3) unit ray directions, frame 1, rig ref frame
    o1: jax.Array,  # (M, 3) ray origins (camera centers), frame 1
    f2: jax.Array,  # (M, 3) frame 2 directions
    o2: jax.Array,  # (M, 3) frame 2 origins
    mask: jax.Array,  # (M,) valid correspondences
    num_hyp: int = 96,
    sample_size: int = 20,
    angle_thresh: float = 3e-5,  # ~2*(1-cos(px_noise*3/f))
    min_inliers: int = 30,
    num_scales: int = 16,
    scale_lo: float = 0.02,
    scale_hi: float = 10.0,
    refine_iters: int = 8,
) -> SeventeenResult:
    """Batched-hypothesis non-central relative-pose RANSAC. Returns
    frame1_T_frame2 with metric translation. Scale units for the |t| grid
    are meters (same units as the ray origins / rig baselines)."""
    from mcslam_tpu.frontend import ransac as _ransac

    # inverse-CDF sampling (see ransac._sample_idx): identical
    # distribution to categorical at ~1/M the RNG work
    idx = _ransac._sample_idx(
        key, num_hyp, sample_size, f1.shape[0], mask.astype(jnp.float32)
    )
    sf1, so1 = f1[idx], o1[idx]  # (K,S,3)
    sf2, so2 = f2[idx], o2[idx]
    sw = mask[idx].astype(jnp.float32)

    # portfolio: thirds of central-essential / procrustes / linear-17pt
    k3 = num_hyp // 3
    E8 = _eight_point_bearings(sf1[:k3], sf2[:k3], sw[:k3])
    R_e, td_e = _decompose_E_batch(E8, f1, o1, f2, o2, mask)
    R_p, t_p = _procrustes_seed(
        sf1[k3 : 2 * k3], sf2[k3 : 2 * k3], so1[k3 : 2 * k3],
        so2[k3 : 2 * k3], sw[k3 : 2 * k3],
    )
    rows = _gec_rows(
        sf1[2 * k3 :], so1[2 * k3 :], sf2[2 * k3 :], so2[2 * k3 :]
    )
    G = jnp.einsum("ksi,ksj,ks->kij", rows, rows, sw[2 * k3 :])
    _, vecs = jnp.linalg.eigh(G)
    R_l, t_l = _extract_pose(_pick_null_combination(vecs))

    R = jnp.concatenate([R_e, R_p, R_l], axis=0)  # (K,3,3)
    t = jnp.concatenate([td_e, t_p, t_l], axis=0)  # (K,3)

    # expand every hypothesis over a log grid of |t| along its own
    # direction (+ its raw t): metric scale is the weakly-observed
    # quantity; searching it globally avoids the rotation-translation
    # valley that traps local optimization
    K = R.shape[0]
    tn = t / jnp.sqrt(jnp.sum(t * t, axis=-1, keepdims=True) + 1e-12)
    scales = jnp.geomspace(scale_lo, scale_hi, num_scales - 1)
    t_grid = tn[:, None, :] * scales[None, :, None]  # (K,G-1,3)
    t_all = jnp.concatenate([t[:, None, :], t_grid], axis=1)  # (K,G,3)
    G_ = num_scales
    R_all = jnp.repeat(R, G_, axis=0)
    t_all = t_all.reshape(K * G_, 3)

    counts, inl, msac = _score_msac(
        R_all, t_all, f1, o1, f2, o2, mask, angle_thresh
    )
    best = jnp.argmin(msac)
    bR, bt = R_all[best], t_all[best]
    b_inl = inl[best]
    b_msac = msac[best]

    # two rounds of: geometric-LM polish on the winner's inliers, then a
    # scale rescan along the polished direction (the LM handles rotation +
    # direction; |t| lives in a near-flat valley the global grid handles
    # better) — each adopted only on MSAC improvement
    for _ in range(2):
        wgt = b_inl.astype(jnp.float32)
        Rr_, tr_ = _geo_lm(bR, bt, f1, o1, f2, o2, wgt, iters=refine_iters)
        cr, ir, mr = _score_msac(
            Rr_[None], tr_[None], f1, o1, f2, o2, mask, angle_thresh
        )
        adopt = mr[0] <= b_msac
        bR = jnp.where(adopt, Rr_, bR)
        bt = jnp.where(adopt, tr_, bt)
        b_inl = jnp.where(adopt, ir[0], b_inl)
        b_msac = jnp.where(adopt, mr[0], b_msac)

        btn = bt / jnp.sqrt(jnp.sum(bt * bt) + 1e-12)
        t_res = jnp.concatenate(
            [bt[None], btn[None, :] * scales[:, None]], axis=0
        )
        R_res = jnp.broadcast_to(bR[None], (num_scales, 3, 3))
        cs, is_, ms = _score_msac(
            R_res, t_res, f1, o1, f2, o2, mask, angle_thresh
        )
        sb = jnp.argmin(ms)
        adopt = ms[sb] <= b_msac
        bt = jnp.where(adopt, t_res[sb], bt)
        b_inl = jnp.where(adopt, is_[sb], b_inl)
        b_msac = jnp.where(adopt, ms[sb], b_msac)
    b_n = jnp.sum(b_inl)

    return SeventeenResult(
        rel_T=lie.se3_matrix(bR, bt),
        inliers=b_inl,
        num_inliers=b_n.astype(jnp.int32),
        ok=b_n >= min_inliers,
    )
