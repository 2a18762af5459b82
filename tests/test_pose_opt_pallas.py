"""Parity: the one-launch Pallas LM refine vs pose_opt.optimize_pose.

Both run the identical deferred-accept trajectory; f32 reduction order
differs (lane tree vs dot-general), so agreement is to float tolerance.
On a well-conditioned synthetic resectioning problem both must converge
to the true pose and to EACH OTHER well inside the suite's accuracy
equivalence class."""

import jax
import jax.numpy as jnp
import numpy as np

from mcslam_tpu.frontend import pose_opt
from mcslam_tpu.frontend.pose_opt_pallas import optimize_pose_pallas
from mcslam_tpu.geometry import lie


def _make_problem(seed, M=512, C=4, noise=0.3, outliers=0.15):
    rng = np.random.RandomState(seed)
    X = rng.uniform(-6, 6, (M, 3)).astype(np.float32) + [0, 0, 10]
    # ground-truth pose a bit away from identity
    xi = np.asarray([0.03, -0.05, 0.02, 0.2, -0.1, 0.15], np.float32)
    T_true = np.asarray(lie.se3_exp(jnp.asarray(xi)))
    # small multi-camera rig
    cams = []
    for c in range(C):
        Tc = np.eye(4, dtype=np.float32)
        Tc[0, 3] = 0.1 * c
        cams.append(Tc)
    cam_T_ref = np.stack(cams)
    anchor = rng.randint(0, C, M)
    f = np.tile(np.asarray([[400.0, 400.0, 320.0, 240.0]], np.float32),
                (C, 1))
    rTw = np.linalg.inv(T_true)
    uv = np.zeros((M, 2), np.float32)
    for m in range(M):
        q = rTw[:3, :3] @ X[m] + rTw[:3, 3]
        p = cam_T_ref[anchor[m], :3, :3] @ q + cam_T_ref[anchor[m], :3, 3]
        z = max(p[2], 1e-3)
        uv[m] = p[:2] / z * f[anchor[m], :2] + f[anchor[m], 2:]
    uv += rng.normal(0, noise, (M, 2)).astype(np.float32)
    out_m = rng.rand(M) < outliers
    uv[out_m] += rng.uniform(-60, 60, (out_m.sum(), 2))
    mask = np.ones(M, bool)
    sigma2 = (1.2 ** rng.randint(0, 4, M)).astype(np.float32) ** 2
    return (T_true, jnp.asarray(X), jnp.asarray(uv),
            jnp.asarray(cam_T_ref[anchor]), jnp.asarray(f[anchor]),
            jnp.asarray(mask), jnp.asarray(1.0 / sigma2),
            jnp.asarray(cam_T_ref), jnp.asarray(f), jnp.asarray(anchor))


def test_pallas_refine_matches_xla():
    for seed in (0, 1, 2):
        (T_true, X, uv, camT_obs, f_obs, mask, isig2,
         cam_T_ref, f_rig, anchor) = _make_problem(seed)
        sched = (8, 8)
        ref = pose_opt.optimize_pose(
            jnp.eye(4, dtype=jnp.float32), X, uv, camT_obs, f_obs, mask,
            sigma2=1.0 / isig2, iters=sched,
        )
        T_pl, chi2 = optimize_pose_pallas(
            jnp.eye(4, dtype=jnp.float32), X, uv, camT_obs, f_obs, mask,
            isig2, sched=sched, interpret=True,
        )
        # both close to truth
        err_ref = np.linalg.norm(np.asarray(ref.world_T_ref) - T_true)
        err_pl = np.linalg.norm(np.asarray(T_pl) - T_true)
        assert err_ref < 5e-3, (seed, err_ref)
        assert err_pl < 5e-3, (seed, err_pl)
        # and to each other (tighter than either is to truth)
        np.testing.assert_allclose(
            np.asarray(T_pl), np.asarray(ref.world_T_ref),
            rtol=0, atol=2e-3,
        )
        # inlier classification agrees except at the chi2 knife edge
        inl_pl = np.asarray(mask) & (np.asarray(chi2) < pose_opt.CHI2_2DOF)
        inl_ref = np.asarray(ref.inliers)
        disagree = (inl_pl != inl_ref).mean()
        assert disagree < 0.02, (seed, disagree)


def test_pallas_refine_vmaps():
    """The pose-candidate portfolio vmaps optimize_pose over candidate
    (T_init, mask) pairs; the Pallas path must batch the same way (the
    pallas_call batching rule grows the grid)."""
    (T_true, X, uv, camT_obs, f_obs, mask, isig2,
     *_rest) = _make_problem(5, M=256)
    inits = jnp.stack([jnp.eye(4, dtype=jnp.float32)] * 2)
    masks = jnp.stack([mask, mask & (jnp.arange(256) % 2 == 0)])
    Ts, chi2s = jax.vmap(
        lambda T0, m: optimize_pose_pallas(
            T0, X, uv, camT_obs, f_obs, m, isig2, sched=(8, 8),
            interpret=True,
        )
    )(inits, masks)
    for b in range(2):
        ref = pose_opt.optimize_pose(
            inits[b], X, uv, camT_obs, f_obs, masks[b],
            sigma2=1.0 / isig2, iters=(8, 8),
        )
        np.testing.assert_allclose(
            np.asarray(Ts[b]), np.asarray(ref.world_T_ref),
            rtol=0, atol=2e-3,
        )


def test_pallas_refine_respects_mask():
    (T_true, X, uv, camT_obs, f_obs, mask, isig2,
     *_rest) = _make_problem(3, M=256, outliers=0.0)
    # corrupt half the points but mask them out: the refine must still
    # land on the truth
    uv_np = np.asarray(uv).copy()
    uv_np[:128] += 500.0
    mask_np = np.asarray(mask).copy()
    mask_np[:128] = False
    T_pl, chi2 = optimize_pose_pallas(
        jnp.eye(4, dtype=jnp.float32), X, jnp.asarray(uv_np), camT_obs,
        f_obs, jnp.asarray(mask_np), isig2, sched=(8, 8), interpret=True,
    )
    assert np.linalg.norm(np.asarray(T_pl) - T_true) < 5e-3
