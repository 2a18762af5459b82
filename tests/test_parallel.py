"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mcslam_tpu.backend import ba
from mcslam_tpu.geometry import lie
from mcslam_tpu.parallel import sharded_ba


def _toy_problem(n_devices, K=4, L=64, C=2, obs_per_dev=64, seed=0):
    rng = np.random.RandomState(seed)
    O = obs_per_dev * n_devices
    # ground truth scene
    lms_gt = (rng.uniform(-3, 3, (L, 3)) + [0, 0, 8]).astype(np.float32)
    poses_gt = np.stack([
        np.asarray(lie.se3_exp(jnp.asarray(
            np.concatenate([rng.randn(3) * 0.02, rng.randn(3) * 0.1]),
            jnp.float32)))
        for _ in range(K)
    ])
    fxycxy = np.tile(np.array([[400.0, 400.0, 320.0, 240.0]], np.float32),
                     (C, 1))
    cam_T_ref = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    cam_T_ref[1, 0, 3] = -0.2
    kf = rng.randint(0, K, O).astype(np.int32)
    cam = rng.randint(0, C, O).astype(np.int32)
    lm = rng.randint(0, L, O).astype(np.int32)
    uv = np.zeros((O, 2), np.float32)
    for o in range(O):
        cTw = cam_T_ref[cam[o]] @ np.linalg.inv(poses_gt[kf[o]])
        p = cTw[:3, :3] @ lms_gt[lm[o]] + cTw[:3, 3]
        uv[o] = p[:2] / p[2] * fxycxy[cam[o], :2] + fxycxy[cam[o], 2:]
    uv += rng.randn(O, 2).astype(np.float32) * 0.3
    obs = ba.BAObservations(
        kf=jnp.asarray(kf), cam=jnp.asarray(cam), lm=jnp.asarray(lm),
        uv=jnp.asarray(uv), sigma2=jnp.ones(O, jnp.float32),
        valid=jnp.ones(O, bool),
    )
    # perturbed initial state
    poses0 = np.stack([
        np.asarray(lie.se3_retract(jnp.asarray(poses_gt[k]),
                                   jnp.asarray(rng.randn(6) * (0.02 if k else 0),
                                               jnp.float32)))
        for k in range(K)
    ])
    lms0 = lms_gt + rng.randn(L, 3).astype(np.float32) * 0.05
    return poses_gt, lms_gt, poses0, lms0, obs, cam_T_ref, fxycxy


@pytest.mark.slow  # single-step parity; the full-solve parity below covers the same math
def test_sharded_lm_step_matches_single_device():
    n = 4
    mesh = sharded_ba.make_mesh(n)
    poses_gt, lms_gt, poses0, lms0, obs, cam_T_ref, fxycxy = _toy_problem(n)
    K, L = poses0.shape[0], lms0.shape[0]
    prior_H = np.zeros((K * 6, K * 6), np.float32)
    prior_H[:6, :6] = np.eye(6) * 1e6
    obs_sharded = sharded_ba.shard_observations(mesh, obs)

    new_poses, new_lms = sharded_ba.sharded_lm_step(
        mesh, jnp.asarray(poses0), jnp.asarray(lms0), jnp.ones(L, bool),
        jnp.ones(K, bool), obs_sharded, jnp.asarray(cam_T_ref),
        jnp.asarray(fxycxy), jnp.asarray(prior_H),
        jnp.zeros(K * 6, jnp.float32), lam=1e-4,
    )

    # single-device reference step: same math through ba internals
    problem = ba.BAProblem(
        poses=jnp.asarray(poses0), landmarks=jnp.asarray(lms0),
        lm_valid=jnp.ones(L, bool), obs=obs,
        cam_T_ref=jnp.asarray(cam_T_ref), fxycxy=jnp.asarray(fxycxy),
        prior_H=jnp.asarray(prior_H), prior_b=jnp.zeros(K * 6, jnp.float32),
        kf_valid=jnp.ones(K, bool),
    )
    r, Jp, Jl, w = ba._residuals_and_jacobians(problem, 2.5)
    Hpp, gp, Hll, gl, Wc = ba._assemble(problem, r, Jp, Jl, w)
    dp, dl = ba._schur_solve(Hpp, gp, Hll, gl, Wc, jnp.asarray(1e-4),
                             jnp.ones(L, bool))
    ref_poses = lie.se3_retract(jnp.asarray(poses0), dp.reshape(K, 6))
    ref_lms = jnp.asarray(lms0) + dl

    np.testing.assert_allclose(
        np.asarray(new_poses), np.asarray(ref_poses), atol=2e-4
    )
    # landmarks with few observations have near-singular 3x3 blocks where
    # f32 reduction-order differences (psum vs single einsum) amplify; the
    # relative agreement is what matters
    np.testing.assert_allclose(
        np.asarray(new_lms), np.asarray(ref_lms), rtol=2e-2, atol=5e-3
    )
    # and the step actually reduced the error vs ground truth
    err0 = np.linalg.norm(poses0[1:, :3, 3] - poses_gt[1:, :3, 3])
    err1 = np.linalg.norm(
        np.asarray(new_poses)[1:, :3, 3] - poses_gt[1:, :3, 3]
    )
    assert err1 < err0


def test_sharded_ba_solve_matches_single_device():
    """Full solve parity: damping accept/reject + chi2 gate rounds inside
    shard_map must reproduce the single-device ba_solve trajectory."""
    n = 4
    mesh = sharded_ba.make_mesh(n)
    poses_gt, lms_gt, poses0, lms0, obs, cam_T_ref, fxycxy = _toy_problem(n)
    K, L = poses0.shape[0], lms0.shape[0]
    prior_H = np.zeros((K * 6, K * 6), np.float32)
    prior_H[:6, :6] = np.eye(6) * 1e6
    obs_sharded = sharded_ba.shard_observations(mesh, obs)

    sp, sl, s_inl, s_cost, s_nin = sharded_ba.sharded_ba_solve(
        mesh, jnp.asarray(poses0), jnp.asarray(lms0), jnp.ones(L, bool),
        jnp.ones(K, bool), obs_sharded, jnp.asarray(cam_T_ref),
        jnp.asarray(fxycxy), jnp.asarray(prior_H),
        jnp.zeros(K * 6, jnp.float32), iters=5, gate_rounds=2,
    )

    problem = ba.BAProblem(
        poses=jnp.asarray(poses0), landmarks=jnp.asarray(lms0),
        lm_valid=jnp.ones(L, bool), obs=obs,
        cam_T_ref=jnp.asarray(cam_T_ref), fxycxy=jnp.asarray(fxycxy),
        prior_H=jnp.asarray(prior_H), prior_b=jnp.zeros(K * 6, jnp.float32),
        kf_valid=jnp.ones(K, bool),
    )
    ref = ba.ba_solve(problem, iters=5, gate_rounds=2)

    # both converge to the ground truth; compare against each other with a
    # tolerance covering f32 psum reduction-order differences
    np.testing.assert_allclose(
        np.asarray(sp), np.asarray(ref.poses), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(sl), np.asarray(ref.landmarks), rtol=5e-2, atol=1e-2
    )
    assert int(s_nin) == int(ref.num_inliers)
    # gate decisions identical (sharded inlier mask == reference mask)
    np.testing.assert_array_equal(
        np.asarray(s_inl), np.asarray(ref.obs_inliers)
    )
    # converged near ground truth
    err = np.linalg.norm(np.asarray(sp)[1:, :3, 3] - poses_gt[1:, :3, 3])
    assert err < 0.02


def test_landmark_sharded_solve_matches_single_device():
    """Landmark-sharded variant: map partitioned across devices, landmark
    elimination fully local, only the pose-side system psum-reduced. Must
    converge to the same solution as single-device ba_solve."""
    n = 4
    mesh = sharded_ba.make_mesh(n)
    poses_gt, lms_gt, poses0, lms0, obs, cam_T_ref, fxycxy = _toy_problem(n)
    K, L = poses0.shape[0], lms0.shape[0]
    prior_H = np.zeros((K * 6, K * 6), np.float32)
    prior_H[:6, :6] = np.eye(6) * 1e6

    obs_lm = sharded_ba.shard_by_landmark(obs, L, n, pad_multiple=32)
    sp, sl, s_inl, s_cost, s_nin = sharded_ba.sharded_ba_solve_lm(
        mesh, jnp.asarray(poses0), jnp.asarray(lms0), jnp.ones(L, bool),
        jnp.ones(K, bool), obs_lm, jnp.asarray(cam_T_ref),
        jnp.asarray(fxycxy), jnp.asarray(prior_H),
        jnp.zeros(K * 6, jnp.float32), iters=5, gate_rounds=2,
    )

    problem = ba.BAProblem(
        poses=jnp.asarray(poses0), landmarks=jnp.asarray(lms0),
        lm_valid=jnp.ones(L, bool), obs=obs,
        cam_T_ref=jnp.asarray(cam_T_ref), fxycxy=jnp.asarray(fxycxy),
        prior_H=jnp.asarray(prior_H), prior_b=jnp.zeros(K * 6, jnp.float32),
        kf_valid=jnp.ones(K, bool),
    )
    ref = ba.ba_solve(problem, iters=5, gate_rounds=2)

    # the permuted obs table changes f32 reduction order, and the LM
    # accept/reject boundary amplifies tiny diffs — same basin, slightly
    # looser tolerance than the order-preserving obs-sharded variant
    np.testing.assert_allclose(
        np.asarray(sp), np.asarray(ref.poses), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(sl), np.asarray(ref.landmarks), rtol=8e-2, atol=3e-2
    )
    # same inlier population (the obs table is permuted, so compare counts)
    assert abs(int(s_nin) - int(ref.num_inliers)) <= 3
    err = np.linalg.norm(np.asarray(sp)[1:, :3, 3] - poses_gt[1:, :3, 3])
    assert err < 0.02


@pytest.mark.slow  # driver runs this contract every round
def test_graft_dryrun_multichip():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


@pytest.mark.slow  # driver runs this contract every round
def test_graft_entry_compiles():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert all(np.all(np.isfinite(np.asarray(o))) for o in out[:1])


@pytest.mark.slow  # driver runs this contract every round
def test_driver_with_mesh_sharded_ba():
    """The SLAM driver itself runs its window solves across a device mesh
    when constructed with one — the product-surface multi-chip path, not
    just the standalone solver."""
    from mcslam_tpu.data import synthetic
    from mcslam_tpu.frontend import frame as frame_mod
    from mcslam_tpu.slam import INITIALIZED, MultiCameraSLAM, SlamConfig
    from mcslam_tpu.utils import metrics

    mesh = sharded_ba.make_mesh(8)
    rig = synthetic.make_synthetic_rig(
        synthetic.SyntheticRigSpec(num_cams=3, baseline=0.2)
    )
    poses = synthetic.smooth_trajectory(8, radius=5.0, step_angle=0.03)
    lms_w = synthetic.make_landmarks(700, seed=1, depth_range=(5.0, 14.0))
    descs = synthetic.make_descriptors(700, seed=2)
    frames = synthetic.render_feature_frames(
        rig, poses, lms_w, descs, kps_per_cam=300, seed=3
    )
    cfg = SlamConfig(window_size=4, ba_obs_capacity=4096, ba_lm_capacity=512,
                     local_map_landmarks=1024, kf_translation=0.2)
    slam = MultiCameraSLAM(rig, cfg, mesh=mesh)
    for f in frames:
        ff = frame_mod.build_frame_from_keypoints(
            jnp.asarray(f.uv), jnp.asarray(f.desc), jnp.asarray(f.valid),
            rig, max_intra=768,
        )
        slam.process_frame(ff, f.timestamp)
    assert slam.state == INITIALIZED
    ts, est = slam.trajectory_arrays()
    ate = metrics.ate_rmse(est, poses)
    assert ate < 0.08, ate


def test_sharded_hamming_match_matches_single_device():
    """Map-sharded descriptor match == single-device brute force: same
    best index, same distance/ratio gates, across an 8-device mesh."""
    from mcslam_tpu.ops import hamming
    from mcslam_tpu.parallel import sharded_match

    rng = np.random.RandomState(3)
    N, Q = 1003, 64  # deliberately NOT divisible by the mesh
    map_desc = rng.randint(0, 2**32, (N, 8), dtype=np.uint64).astype(
        np.uint32
    )
    map_valid = rng.rand(N) > 0.1
    # queries: bit-corrupted copies of random map rows + pure noise
    qi = rng.randint(0, N, Q)
    q = map_desc[qi].copy()
    flip = rng.randint(0, 2**32, (Q, 8), dtype=np.uint64).astype(np.uint32)
    keep = rng.rand(Q, 8) > 0.06
    q = np.where(keep, q, q ^ flip)
    q[: Q // 4] = rng.randint(0, 2**32, (Q // 4, 8), dtype=np.uint64).astype(
        np.uint32
    )
    q_valid = np.ones(Q, bool)

    mesh = sharded_match.make_mesh(8)
    d_sh, v_sh, Np = sharded_match.shard_map_desc(mesh, map_desc, map_valid)
    idx, ok, dist = sharded_match.sharded_hamming_match(
        mesh, jnp.asarray(q), jnp.asarray(q_valid), d_sh, v_sh,
        max_dist=64, ratio=0.85,
    )
    idx, ok, dist = np.asarray(idx), np.asarray(ok), np.asarray(dist)

    # single-device reference with identical semantics
    d = np.asarray(hamming.hamming_matrix(jnp.asarray(q),
                                          jnp.asarray(map_desc)))
    d = np.where(map_valid[None, :], d, 1 << 20)
    i1 = np.argmin(d, axis=1)
    d1 = d[np.arange(Q), i1]
    d_wo = d.copy()
    d_wo[np.arange(Q), i1] = 1 << 20
    d2 = d_wo.min(axis=1)
    ref_ok = q_valid & (d1 <= 64) & (d1 <= 0.85 * d2)

    assert np.array_equal(ok, ref_ok)
    assert np.array_equal(dist[ok], d1[ok])
    # best index agrees wherever the minimum is unique
    unique_min = d1 < d2
    sel = ok & unique_min
    assert sel.sum() > Q // 3
    assert np.array_equal(idx[sel], i1[sel])


def test_sharded_frame_build_matches_single_device():
    """Camera-sharded frame build (4 cams over a 4-device mesh) must be
    BIT-EXACT vs build_frame: extraction/undistortion are per-camera
    independent and the gathered intra/triangulate inputs are identical."""
    from mcslam_tpu.data import synthetic
    from mcslam_tpu.frontend.frame import build_frame
    from mcslam_tpu.parallel import sharded_frame

    rig = synthetic.make_synthetic_rig(synthetic.SyntheticRigSpec(
        num_cams=4, baseline=0.25, image_size=(256, 192), focal=210.0))
    poses = synthetic.smooth_trajectory(1, radius=5.0, step_angle=0.03, seed=3)
    lms = synthetic.make_landmarks(500, seed=4, depth_range=(4.0, 12.0))
    imgs = jnp.asarray(synthetic.render_blob_images(rig, poses, lms, seed=5)[0])

    kw = dict(num_points=256, num_levels=3, max_intra=512, approx_topk=False)
    ref = build_frame(imgs, rig, **kw)
    mesh = sharded_frame.make_mesh(4)
    got = sharded_frame.sharded_build_frame(mesh, imgs, rig, **kw)

    for name in ref._fields:
        a, b = np.asarray(getattr(got, name)), np.asarray(getattr(ref, name))
        np.testing.assert_array_equal(a, b, err_msg=name)

    # indivisible camera counts are rejected loudly
    with pytest.raises(ValueError):
        sharded_frame.sharded_build_frame(
            sharded_frame.make_mesh(3), imgs, rig, **kw)


def test_sharded_frames_batch_matches_sequential():
    """Frame-parallel batch build (one frame per device) must be bit-exact
    vs sequential single-device build_frame calls."""
    from mcslam_tpu.data import synthetic
    from mcslam_tpu.frontend.frame import build_frame
    from mcslam_tpu.parallel import sharded_frame

    rig = synthetic.make_synthetic_rig(synthetic.SyntheticRigSpec(
        num_cams=2, baseline=0.25, image_size=(192, 144), focal=160.0))
    poses = synthetic.smooth_trajectory(4, radius=4.0, step_angle=0.04, seed=6)
    lms = synthetic.make_landmarks(300, seed=7, depth_range=(3.0, 10.0))
    imgs = jnp.asarray(synthetic.render_blob_images(rig, poses, lms, seed=8))

    kw = dict(num_points=128, num_levels=2, max_intra=256, approx_topk=False)
    mesh = sharded_frame.make_mesh(4)
    got = sharded_frame.sharded_build_frames(mesh, imgs, rig, **kw)
    assert len(got) == 4
    for b in range(4):
        ref = build_frame(imgs[b], rig, **kw)
        for name in ref._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(got[b], name)),
                np.asarray(getattr(ref, name)), err_msg=f"frame {b} {name}")
    with pytest.raises(ValueError):
        sharded_frame.sharded_build_frames(mesh, imgs[:3], rig, **kw)
