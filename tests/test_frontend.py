import jax
import jax.numpy as jnp
import numpy as np

from mcslam_tpu.data import synthetic
from mcslam_tpu.frontend import intra, pose_opt, ransac
from mcslam_tpu.geometry import lie
from mcslam_tpu.ops import hamming


def _setup(num_frames=2, num_lm=600, kps=256, seed=0):
    rig = synthetic.make_synthetic_rig(
        synthetic.SyntheticRigSpec(num_cams=3, baseline=0.15)
    )
    poses = synthetic.smooth_trajectory(num_frames, seed=seed)
    lms = synthetic.make_landmarks(num_lm, seed=seed + 1)
    descs = synthetic.make_descriptors(num_lm, seed=seed + 2)
    frames = synthetic.render_feature_frames(
        rig, poses, lms, descs, kps_per_cam=kps, seed=seed + 3
    )
    return rig, poses, lms, descs, frames


def test_intra_match_groups_same_landmark():
    rig, poses, lms, descs, frames = _setup()
    f = frames[0]
    groups = intra.intra_match(
        desc=jnp.asarray(f.desc),
        xy_ud=jnp.asarray(f.uv),
        valid=jnp.asarray(f.valid),
        response=jnp.ones(f.valid.shape, jnp.float32),
        rig=rig,
        max_out=1024,
    )
    ray_idx = np.asarray(groups.ray_idx)
    valid = np.asarray(groups.valid)
    lm_id = f.lm_id
    n_multi, n_pure = 0, 0
    for m in np.nonzero(valid)[0]:
        ids = [
            lm_id[c, ray_idx[m, c]] for c in range(3) if ray_idx[m, c] >= 0
        ]
        if len(ids) >= 2:
            n_multi += 1
            if len(set(ids)) == 1:
                n_pure += 1
    assert n_multi > 50, n_multi
    assert n_pure / n_multi > 0.95, (n_pure, n_multi)


def test_ransac_kabsch_recovers_pose():
    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(1)
    M = 200
    X_rig = rng.uniform(-3, 3, (M, 3)).astype(np.float32) + [0, 0, 8]
    T_true = np.asarray(
        lie.se3_exp(jnp.array([0.05, -0.1, 0.02, 0.5, 0.2, -0.3]))
    )
    X_world = X_rig @ T_true[:3, :3].T + T_true[:3, 3]
    # 30% outliers
    out_mask = rng.rand(M) < 0.3
    X_rig_noisy = X_rig.copy()
    X_rig_noisy[out_mask] += rng.uniform(-4, 4, (out_mask.sum(), 3))
    # observations: project X_rig into camera 0 (identity extrinsic)
    f = np.array([400.0, 400.0, 320.0, 240.0], np.float32)
    uv = X_rig[:, :2] / X_rig[:, 2:] * f[:2] + f[2:]
    cam_T_ref = np.tile(np.eye(4, dtype=np.float32), (M, 1, 1))
    res = ransac.ransac_kabsch(
        key,
        jnp.asarray(X_rig_noisy),
        jnp.asarray(X_world),
        jnp.asarray(uv),
        jnp.asarray(cam_T_ref),
        jnp.tile(jnp.asarray(f), (M, 1)),
        jnp.ones(M, bool),
        num_hyp=512,
        px_thresh=4.0,
    )
    assert bool(res.ok)
    assert int(res.num_inliers) > 0.6 * (~out_mask).sum()
    err = np.asarray(lie.se3_log(lie.se3_inverse(jnp.asarray(T_true)) @ res.world_T_ref))
    assert np.linalg.norm(err) < 0.05, err


def test_ransac_pnp_recovers_pose():
    key = jax.random.PRNGKey(1)
    rng = np.random.RandomState(2)
    M = 300
    X_world = rng.uniform(-4, 4, (M, 3)).astype(np.float32) + [0, 0, 10]
    T_true = np.asarray(lie.se3_exp(jnp.array([0.1, 0.05, -0.08, 1.0, -0.5, 0.3])))
    rTw = np.linalg.inv(T_true)
    X_ref = X_world @ rTw[:3, :3].T + rTw[:3, 3]
    f = np.array([400.0, 400.0, 320.0, 240.0], np.float32)
    uv = X_ref[:, :2] / X_ref[:, 2:] * f[:2] + f[2:]
    uv += rng.randn(M, 2) * 0.3
    out = rng.rand(M) < 0.25
    uv[out] += rng.uniform(40, 200, (out.sum(), 2))
    res = ransac.ransac_pnp(
        key,
        jnp.asarray(X_world),
        jnp.asarray(uv),
        jnp.tile(jnp.eye(4, dtype=jnp.float32), (M, 1, 1)),
        jnp.tile(jnp.asarray(f), (M, 1)),
        jnp.ones(M, bool),
        num_hyp=256,
        px_thresh=4.0,
    )
    assert bool(res.ok)
    err = np.asarray(lie.se3_log(lie.se3_inverse(jnp.asarray(T_true)) @ res.world_T_ref))
    assert np.linalg.norm(err) < 0.05, err


def test_ransac_pnp_wide_baseline_rig():
    """Baseline ~ 0.5x scene depth: the central minimal-solver
    approximation collapses here (err > 1.0 rad+m before the generalized
    DLT was added); the non-central hypothesis family must keep absolute
    pose accurate (reference uses non-central GP3P, FrontEnd.cpp:4660)."""
    rng = np.random.RandomState(2)
    M = 400
    baseline = 2.5  # scene depth ~5 m
    cams = []
    for cx in (-baseline / 2, baseline / 2):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = -cx  # cam_T_ref
        cams.append(T)
    cams = np.stack(cams)
    X_world = rng.uniform(-3, 3, (M, 3)).astype(np.float32) + [0, 0, 5]
    T_true = np.asarray(
        lie.se3_exp(jnp.array([0.1, 0.05, -0.08, 0.6, -0.3, 0.2]))
    )
    rTw = np.linalg.inv(T_true)
    cam_idx = rng.randint(0, 2, M)
    cTr = cams[cam_idx]
    f = np.array([400.0, 400.0, 320.0, 240.0], np.float32)
    X_ref = X_world @ rTw[:3, :3].T + rTw[:3, 3]
    X_cam = np.einsum("mij,mj->mi", cTr[:, :3, :3], X_ref) + cTr[:, :3, 3]
    uv = X_cam[:, :2] / X_cam[:, 2:] * f[:2] + f[2:]
    uv += rng.randn(M, 2) * 0.3
    for s in range(3):
        res = ransac.ransac_pnp(
            jax.random.PRNGKey(s), jnp.asarray(X_world), jnp.asarray(uv),
            jnp.asarray(cTr), jnp.tile(jnp.asarray(f), (M, 1)),
            jnp.ones(M, bool), num_hyp=256, px_thresh=4.0,
        )
        assert bool(res.ok)
        assert int(res.num_inliers) > 0.9 * M, int(res.num_inliers)
        err = np.asarray(lie.se3_log(
            lie.se3_inverse(jnp.asarray(T_true)) @ res.world_T_ref
        ))
        assert np.linalg.norm(err) < 0.05, err


def test_ransac_essential_recovers_relative_pose():
    key = jax.random.PRNGKey(2)
    rng = np.random.RandomState(3)
    M = 300
    X = rng.uniform(-3, 3, (M, 3)) + [0, 0, 6]
    R = np.asarray(lie.so3_exp(jnp.array([0.02, 0.15, -0.03])))
    t = np.array([0.5, 0.05, 0.1])
    # frame 1 camera at (R, t): x1 = R^T (X - t) if T10 = cam1_T_cam0...
    # define cam0 at identity; cam1 pose world_T_cam1 = (R, t)
    X0 = X
    T_w_c1 = np.eye(4)
    T_w_c1[:3, :3] = R
    T_w_c1[:3, 3] = t
    T_c1_w = np.linalg.inv(T_w_c1)
    X1 = X @ T_c1_w[:3, :3].T + T_c1_w[:3, 3]
    xn0 = (X0[:, :2] / X0[:, 2:]).astype(np.float32)
    xn1 = (X1[:, :2] / X1[:, 2:]).astype(np.float32)
    xn0 += rng.randn(M, 2) * 5e-4
    out = rng.rand(M) < 0.2
    xn1[out] += rng.uniform(0.05, 0.3, (out.sum(), 2))
    res = ransac.ransac_essential(
        key, jnp.asarray(xn0), jnp.asarray(xn1), jnp.ones(M, bool),
        thresh_n=3e-3,
    )
    assert bool(res.ok)
    # rel_T is cam1_T_cam0 with |t|=1; compare rotation and t direction
    rel = np.asarray(res.rel_T)
    R_expected = T_c1_w[:3, :3]
    t_expected = T_c1_w[:3, 3] / np.linalg.norm(T_c1_w[:3, 3])
    assert np.abs(rel[:3, :3] - R_expected).max() < 1e-2
    t_got = rel[:3, 3] / np.linalg.norm(rel[:3, 3])
    assert np.abs(t_got - t_expected).max() < 2e-2


def test_optimize_pose_converges_and_gates_outliers():
    rng = np.random.RandomState(4)
    M = 150
    X_world = (rng.uniform(-4, 4, (M, 3)) + [0, 0, 9]).astype(np.float32)
    T_true = np.asarray(lie.se3_exp(jnp.array([0.04, -0.02, 0.06, 0.3, -0.1, 0.2])))
    rTw = np.linalg.inv(T_true)
    X_ref = X_world @ rTw[:3, :3].T + rTw[:3, 3]
    f = np.array([400.0, 400.0, 320.0, 240.0], np.float32)
    uv = (X_ref[:, :2] / X_ref[:, 2:] * f[:2] + f[2:]).astype(np.float32)
    uv += rng.randn(M, 2).astype(np.float32) * 0.3
    out = rng.rand(M) < 0.2
    uv[out] += 50.0
    T_init = np.asarray(lie.se3_retract(jnp.asarray(T_true),
                                        jnp.array([0.02, -0.01, 0.015, 0.1, -0.05, 0.08])))
    res = pose_opt.optimize_pose(
        jnp.asarray(T_init),
        jnp.asarray(X_world),
        jnp.asarray(uv),
        jnp.tile(jnp.eye(4, dtype=jnp.float32), (M, 1, 1)),
        jnp.tile(jnp.asarray(f), (M, 1)),
        jnp.ones(M, bool),
    )
    err = np.asarray(lie.se3_log(lie.se3_inverse(jnp.asarray(T_true)) @ res.world_T_ref))
    assert np.linalg.norm(err) < 5e-3, err
    got_inl = np.asarray(res.inliers)
    assert got_inl[~out].mean() > 0.95
    assert got_inl[out].mean() < 0.05


def test_inter_frame_matching_feature_level():
    """Two synthetic frames: descriptor matching should recover mostly
    correct landmark correspondences."""
    rig, poses, lms, descs, frames = _setup(num_frames=2)
    f0, f1 = frames
    d0 = jnp.asarray(f0.desc[0])
    d1 = jnp.asarray(f1.desc[0])
    from mcslam_tpu.ops import match as match_ops

    dm = hamming.hamming_matrix(d0, d1)
    res = match_ops.match_mutual(
        dm,
        row_mask=jnp.asarray(f0.valid[0]),
        col_mask=jnp.asarray(f1.valid[0]),
        max_dist=40,
        ratio=0.9,
    )
    ok = np.asarray(res.ok)
    idx = np.asarray(res.idx)
    correct = f0.lm_id[0][ok] == f1.lm_id[0][idx[ok]]
    assert ok.sum() > 50
    assert correct.mean() > 0.97, correct.mean()
