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


def test_track_fastpath_gate_and_portfolio_rescue():
    """The motion fast path (lax.cond around the Kabsch/PnP RANSAC
    stages of the fused tracking program) must (a) fire on a frame whose
    predicted pose explains the matches, (b) stay off when forced
    (frac > 1) with an equivalent pose, and (c) stay off for a garbage
    prediction — where the portfolio rescues the pose."""
    from mcslam_tpu import tracking_kernels as tk
    from mcslam_tpu.frontend import frame as frame_mod

    rig, poses, lms, descs, frames = _setup(num_frames=2, seed=9)
    f0, f1 = frames
    ff0 = frame_mod.build_frame_from_keypoints(
        jnp.asarray(f0.uv), jnp.asarray(f0.desc), jnp.asarray(f0.valid),
        rig, max_intra=512,
    )
    ff1 = frame_mod.build_frame_from_keypoints(
        jnp.asarray(f1.uv), jnp.asarray(f1.desc), jnp.asarray(f1.valid),
        rig, max_intra=512,
    )
    M = int(ff0.im_valid.shape[0])
    # prev frame's landmark table: its own triangulated points, in the
    # WORLD frame of poses[0]
    has0 = np.asarray(ff0.im_has_depth) & np.asarray(ff0.im_valid)
    T0 = np.asarray(poses[0])
    Xw = np.asarray(ff0.im_point3d) @ T0[:3, :3].T + T0[:3, 3]
    CAP = 4096
    map_pos = np.zeros((CAP, 3), np.float32)
    map_valid = np.zeros(CAP, bool)
    map_desc = np.zeros((CAP, 8), np.uint32)
    map_normal = np.zeros((CAP, 3), np.float32)
    ids = np.where(has0, np.arange(M, dtype=np.int32), -1)
    map_pos[:M] = Xw
    map_valid[:M] = has0
    map_desc[:M] = np.asarray(ff0.im_desc)
    nrm = T0[:3, 3] - Xw
    map_normal[:M] = nrm / np.maximum(
        np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-9
    )
    cand = np.flatnonzero(map_valid)[:512]
    cand_pad = np.zeros(512, np.int32)
    cand_pad[: len(cand)] = cand
    cand_valid = np.arange(512) < len(cand)
    T1 = np.asarray(poses[1], np.float32)  # ground truth = perfect pred
    garbage = np.eye(4, dtype=np.float32)
    garbage[:3, 3] = [50.0, -30.0, 20.0]

    def run(pred, frac, gate_px=100.0):
        packed = tk._track_and_map_step(
            jax.random.PRNGKey(0), ff1.im_desc, ff1.im_valid,
            ff1.im_uv_ref, ff1.im_anchor_cam, ff1.im_sigma2,
            ff1.im_point3d, ff1.im_has_depth,
            ff0.im_desc, ff0.im_valid, jnp.asarray(ids),
            jnp.asarray(map_pos), jnp.asarray(map_valid),
            jnp.asarray(map_desc), jnp.asarray(map_normal),
            jnp.asarray(cand_pad), jnp.asarray(cand_valid),
            rig.cam_T_ref, rig.fxycxy, jnp.asarray(pred),
            128, 5.0, 64, 0.85, (640, 480), 18.0, 64, gate_px,
            frac, 30,
        )
        v = np.asarray(packed)
        pose = v[:16].reshape(4, 4)
        n_inl, _, _, rr_ok, fast = v[16:21]
        return pose, int(n_inl), rr_ok > 0.5, fast > 0.5

    pose_a, n_a, ok_a, fast_a = run(T1, 0.6)
    assert ok_a and fast_a, (n_a, ok_a, fast_a)
    assert np.linalg.norm(pose_a[:3, 3] - T1[:3, 3]) < 0.05

    pose_b, n_b, ok_b, fast_b = run(T1, 2.0)  # forced full portfolio
    assert ok_b and not fast_b
    assert np.linalg.norm(pose_b[:3, 3] - T1[:3, 3]) < 0.05

    # garbage prediction with the projection gate OFF (a bad prediction
    # also starves the search-by-projection gate — that regime is the
    # driver's failure/reinit path): the fast-path gate must NOT fire,
    # and the RANSAC portfolio must still recover the true pose from
    # global matches
    pose_c, n_c, ok_c, fast_c = run(garbage, 0.6, gate_px=0.0)
    assert not fast_c
    assert ok_c, n_c
    assert np.linalg.norm(pose_c[:3, 3] - T1[:3, 3]) < 0.05, pose_c[:3, 3]


def test_mono_rig_forces_full_portfolio():
    """Driver guard: a single-camera rig must never take the fast path
    (the PnP candidate is mono's lifeline under scale drift)."""
    from mcslam_tpu.slam import MultiCameraSLAM, SlamConfig

    rig1 = synthetic.make_synthetic_rig(
        synthetic.SyntheticRigSpec(num_cams=1)
    )
    s = MultiCameraSLAM(rig1, SlamConfig(track_fastpath_frac=0.6))
    assert s._fastpath_frac > 1.0
    rig3 = synthetic.make_synthetic_rig(
        synthetic.SyntheticRigSpec(num_cams=3)
    )
    s3 = MultiCameraSLAM(rig3, SlamConfig(track_fastpath_frac=0.6))
    assert s3._fastpath_frac == 0.6


def test_invcdf_sampler_matches_weights():
    """The staged inverse-CDF sampler (MCSLAM_INVCDF_SAMPLING) must
    reproduce the weight distribution and never select zero-weight
    entries."""
    m = 64
    w = np.zeros(m, np.float32)
    w[10] = 1.0
    w[20] = 3.0
    w[40] = 6.0
    idx = np.asarray(ransac._sample_idx_invcdf(
        jax.random.PRNGKey(0), 500, 4, m, jnp.asarray(w)
    )).ravel()
    assert set(np.unique(idx)) <= {10, 20, 40}
    frac40 = (idx == 40).mean()
    frac20 = (idx == 20).mean()
    frac10 = (idx == 10).mean()
    assert abs(frac40 - 0.6) < 0.05
    assert abs(frac20 - 0.3) < 0.05
    assert abs(frac10 - 0.1) < 0.05
