import jax
import jax.numpy as jnp
import numpy as np

from mcslam_tpu.backend import ba, imu
from mcslam_tpu.data import synthetic
from mcslam_tpu.geometry import lie


def _make_ba_problem(K=4, L=200, noise_px=0.4, pose_noise=0.02, lm_noise=0.05,
                     seed=0):
    rng = np.random.RandomState(seed)
    rig = synthetic.make_synthetic_rig(
        synthetic.SyntheticRigSpec(num_cams=2, baseline=0.2)
    )
    # generous inter-KF baseline so landmark depths are well-conditioned
    poses_gt = synthetic.smooth_trajectory(K, step_angle=0.08, seed=seed)
    lms_gt = synthetic.make_landmarks(L, seed=seed + 1, depth_range=(4.0, 9.0))
    C = rig.num_cams
    fxycxy = np.asarray(rig.fxycxy)
    cam_T_ref = np.asarray(rig.cam_T_ref)
    w, h = rig.image_size

    obs_kf, obs_cam, obs_lm, obs_uv = [], [], [], []
    for k in range(K):
        rTw = np.linalg.inv(poses_gt[k])
        for c in range(C):
            cTw = cam_T_ref[c] @ rTw
            p = lms_gt @ cTw[:3, :3].T + cTw[:3, 3]
            z = p[:, 2]
            uv = p[:, :2] / np.maximum(z[:, None], 1e-6) * fxycxy[c, :2] + fxycxy[c, 2:]
            vis = (z > 0.5) & (uv[:, 0] > 0) & (uv[:, 0] < w) & (uv[:, 1] > 0) & (uv[:, 1] < h)
            for l in np.nonzero(vis)[0]:
                obs_kf.append(k)
                obs_cam.append(c)
                obs_lm.append(l)
                obs_uv.append(uv[l] + rng.randn(2) * noise_px)
    O = len(obs_kf)
    obs = ba.BAObservations(
        kf=jnp.asarray(obs_kf, jnp.int32),
        cam=jnp.asarray(obs_cam, jnp.int32),
        lm=jnp.asarray(obs_lm, jnp.int32),
        uv=jnp.asarray(np.array(obs_uv), jnp.float32),
        sigma2=jnp.ones(O, jnp.float32),
        valid=jnp.ones(O, bool),
    )
    # corrupt initial guesses
    poses0 = np.array(
        [
            np.asarray(
                lie.se3_retract(
                    jnp.asarray(poses_gt[k]),
                    jnp.asarray(rng.randn(6) * pose_noise * (0 if k == 0 else 1),
                                jnp.float32),
                )
            )
            for k in range(K)
        ]
    )
    lms0 = lms_gt + rng.randn(L, 3).astype(np.float32) * lm_noise
    # gauge prior: clamp pose 0 strongly
    prior_H = np.zeros((K * 6, K * 6), np.float32)
    prior_H[:6, :6] = np.eye(6) * 1e6
    problem = ba.BAProblem(
        poses=jnp.asarray(poses0),
        landmarks=jnp.asarray(lms0),
        lm_valid=jnp.ones(L, bool),
        obs=obs,
        cam_T_ref=jnp.asarray(cam_T_ref),
        fxycxy=jnp.asarray(fxycxy),
        prior_H=jnp.asarray(prior_H),
        prior_b=jnp.zeros(K * 6, jnp.float32),
        kf_valid=jnp.ones(K, bool),
    )
    return problem, poses_gt, lms_gt


def test_ba_converges_to_ground_truth():
    problem, poses_gt, lms_gt = _make_ba_problem()
    res = ba.ba_solve(problem, iters=12)
    # pose error vs ground truth (gauge = pose0 fixed at its initial = gt).
    # tolerances follow the measurement physics: 0.4px noise at f=400,
    # inter-camera+inter-KF baseline ~0.5m, depth 4-9m -> depth sigma
    # z^2 sigma_px / (f b) ~ 5cm; poses constrained by many landmarks -> mm-cm.
    for k in range(poses_gt.shape[0]):
        err = np.asarray(
            lie.se3_log(lie.se3_inverse(jnp.asarray(poses_gt[k])) @ res.poses[k])
        )
        assert np.linalg.norm(err) < 3e-2, (k, err)
    lm_err = np.linalg.norm(np.asarray(res.landmarks) - lms_gt, axis=-1)
    assert np.median(lm_err) < 0.15, np.median(lm_err)
    # solver optimality: the solution must fit the (noisy) measurements at
    # least as well as the ground truth does — i.e. LM actually converged
    from mcslam_tpu.backend.ba import _total_cost

    gt_cost = float(_total_cost(
        problem._replace(poses=jnp.asarray(poses_gt), landmarks=jnp.asarray(lms_gt)),
        2.5,
    ))
    assert float(res.cost) <= gt_cost * 1.02, (float(res.cost), gt_cost)


def test_ba_rejects_outlier_observations():
    problem, poses_gt, lms_gt = _make_ba_problem(seed=1)
    # corrupt 10% of observations
    rng = np.random.RandomState(2)
    O = problem.obs.uv.shape[0]
    bad = rng.rand(O) < 0.1
    uv = np.asarray(problem.obs.uv).copy()
    uv[bad] += rng.uniform(30, 120, (bad.sum(), 2))
    problem = problem._replace(obs=problem.obs._replace(uv=jnp.asarray(uv)))
    res = ba.ba_solve(problem, iters=15)
    inl = np.asarray(res.obs_inliers)
    assert inl[~bad].mean() > 0.9
    assert inl[bad].mean() < 0.1
    for k in range(poses_gt.shape[0]):
        err = np.asarray(
            lie.se3_log(lie.se3_inverse(jnp.asarray(poses_gt[k])) @ res.poses[k])
        )
        assert np.linalg.norm(err) < 3e-2, (k, err)


def test_preintegration_zero_motion():
    S = 50
    dts = jnp.full((S,), 0.005)
    gyro = jnp.zeros((S, 3))
    accel = jnp.tile(jnp.array([0.0, 0.0, imu.GRAVITY]), (S, 1))
    pre = imu.preintegrate(dts, gyro, accel, jnp.ones(S, bool), jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(pre.dR), np.eye(3), atol=1e-6)
    # dv = integral of accel (gravity reaction measured) = g*t upward
    t = 0.25
    np.testing.assert_allclose(np.asarray(pre.dv), [0, 0, imu.GRAVITY * t], atol=1e-4)
    state_i = imu.ImuState(
        world_T_body=jnp.eye(4), vel=jnp.zeros(3), bias=jnp.zeros(6)
    )
    state_j = imu.predict(state_i, pre)
    # stationary: predicted pose ~ identity, vel ~ 0
    np.testing.assert_allclose(np.asarray(state_j.vel), 0.0, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(state_j.world_T_body), np.eye(4), atol=1e-4
    )


def test_preintegration_dead_reckoning_matches_trajectory():
    """Integrate exact synthetic IMU from an analytic circular trajectory;
    predict() should track the true poses over a short horizon."""
    fps = 20.0
    poses, ts, gyro, accel = synthetic.analytic_circle_imu(6, fps=fps)
    v0 = synthetic.circle_velocity(0.0)
    state = imu.ImuState(
        world_T_body=jnp.asarray(poses[0]), vel=jnp.asarray(v0, jnp.float32),
        bias=jnp.zeros(6),
    )
    # preintegrate frame 0 -> 4
    sel = (ts >= 0.0) & (ts < 4 / fps)
    dts = np.full(sel.sum(), 1.0 / 200.0, np.float32)
    pre = imu.preintegrate(
        jnp.asarray(dts), jnp.asarray(gyro[sel], jnp.float32),
        jnp.asarray(accel[sel], jnp.float32),
        jnp.ones(sel.sum(), bool), jnp.zeros(6),
    )
    pred = imu.predict(state, pre)
    p_err = np.linalg.norm(
        np.asarray(pred.world_T_body[:3, 3]) - poses[4][:3, 3]
    )
    assert p_err < 0.01, p_err
    R_err = np.asarray(
        lie.so3_log(jnp.asarray(poses[4][:3, :3]).T @ pred.world_T_body[:3, :3])
    )
    assert np.linalg.norm(R_err) < 5e-3, R_err


def test_imu_residual_zero_at_truth_and_bias_correction():
    fps = 20.0
    bias_true = np.array([0.002, -0.001, 0.003, 0.05, -0.03, 0.02])
    poses, ts, gyro, accel = synthetic.analytic_circle_imu(
        3, fps=fps, gyro_bias=tuple(bias_true[:3]),
        accel_bias=tuple(bias_true[3:]),
    )
    sel = (ts >= 0.0) & (ts < 1 / fps)
    dts = np.full(sel.sum(), 1.0 / 200.0, np.float32)
    # preintegrate at WRONG (zero) bias, then evaluate residual at states with
    # the true bias: first-order correction should keep the residual small
    pre = imu.preintegrate(
        jnp.asarray(dts), jnp.asarray(gyro[sel], jnp.float32),
        jnp.asarray(accel[sel], jnp.float32), jnp.ones(sel.sum(), bool),
        jnp.zeros(6),
    )
    v0 = synthetic.circle_velocity(0.0)
    v1 = synthetic.circle_velocity(1.0 / fps)
    si = imu.ImuState(jnp.asarray(poses[0]), jnp.asarray(v0, jnp.float32),
                      jnp.asarray(bias_true, jnp.float32))
    sj = imu.ImuState(jnp.asarray(poses[1]), jnp.asarray(v1, jnp.float32),
                      jnp.asarray(bias_true, jnp.float32))
    r = np.asarray(imu.residual(si, sj, pre))
    assert np.linalg.norm(r[:3]) < 2e-3, r
    assert np.linalg.norm(r[3:6]) < 5e-3, r
    assert np.linalg.norm(r[6:9]) < 2e-3, r
    assert np.linalg.norm(r[9:]) < 1e-9
    # residual at the wrong bias (uncorrected) must be clearly larger
    si0 = si._replace(bias=jnp.zeros(6))
    sj0 = sj._replace(bias=jnp.zeros(6))
    r0 = np.asarray(imu.residual(si0, sj0, pre))
    assert np.linalg.norm(r0[:9]) > np.linalg.norm(r[:9])


def test_gravity_init():
    rng = np.random.RandomState(5)
    R_true = np.asarray(lie.so3_exp(jnp.array([0.3, 0.1, 0.0])))
    bias_g = np.array([0.01, -0.02, 0.005])
    g_body = R_true.T @ np.array([0.0, 0.0, imu.GRAVITY])
    acc = g_body[None] + rng.randn(100, 3) * 1e-4
    gyr = bias_g[None] + rng.randn(100, 3) * 1e-5
    R_wb, bias = imu.init_gravity_aligned(
        jnp.asarray(acc, jnp.float32), jnp.asarray(gyr, jnp.float32),
        jnp.ones(100, bool),
    )
    # recovered rotation maps body gravity direction to world +z
    out = np.asarray(R_wb) @ (g_body / np.linalg.norm(g_body))
    np.testing.assert_allclose(out, [0, 0, 1], atol=1e-3)
    np.testing.assert_allclose(np.asarray(bias[:3]), bias_g, atol=1e-3)
    np.testing.assert_allclose(np.asarray(bias[3:]), 0.0, atol=1e-2)


def test_ba_kf_blocked_assembly_matches_generic():
    """kf_blocked fast assembly must produce identical normal equations and
    an identical full solve vs the generic one-hot path."""
    problem, poses_gt, lms_gt = _make_ba_problem(K=4, L=64)
    obs = problem.obs
    K = problem.poses.shape[0]
    O_orig = obs.kf.shape[0]
    kf_np = np.asarray(obs.kf)
    # re-lay out into K equal contiguous blocks
    Ok = int(max(np.bincount(kf_np, minlength=K).max(), 1))
    O = Ok * K
    def blocked(arr, fill=0):
        a = np.asarray(arr)
        out = np.full((O,) + a.shape[1:], fill, a.dtype)
        for k in range(K):
            sel = np.nonzero(kf_np == k)[0]
            out[k * Ok : k * Ok + len(sel)] = a[sel]
        return out
    valid_b = np.zeros(O, bool)
    for k in range(K):
        valid_b[k * Ok : k * Ok + int((kf_np == k).sum())] = True
    obs_b = ba.BAObservations(
        kf=jnp.asarray(np.repeat(np.arange(K, dtype=np.int32), Ok)),
        cam=jnp.asarray(blocked(obs.cam)),
        lm=jnp.asarray(blocked(obs.lm)),
        uv=jnp.asarray(blocked(obs.uv)),
        sigma2=jnp.asarray(blocked(obs.sigma2, 1)),
        valid=jnp.asarray(valid_b),
    )
    prob_b = problem._replace(obs=obs_b)

    # normal-equation parity at the initial linearization point
    r, Jp, Jl, w = ba._residuals_and_jacobians(prob_b, 2.5)
    ref = ba._assemble(prob_b, r, Jp, Jl, w, kf_blocked=False)
    fast = ba._assemble(prob_b, r, Jp, Jl, w, kf_blocked=True)
    names = ["Hpp", "gp", "Hll", "gl", "Wc"]
    for name, a, b in zip(names, ref, fast):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-4,
            err_msg=name,
        )

    # full solve parity
    res_ref = ba.ba_solve(prob_b, iters=4, gate_rounds=2, kf_blocked=False)
    res_fast = ba.ba_solve(prob_b, iters=4, gate_rounds=2, kf_blocked=True)
    # f32 reduction-order differences accumulate over the LM iterations;
    # the linearized systems themselves match to 1e-4 above
    np.testing.assert_allclose(
        np.asarray(res_fast.poses), np.asarray(res_ref.poses), atol=1e-3
    )
    np.testing.assert_array_equal(
        np.asarray(res_fast.obs_inliers), np.asarray(res_ref.obs_inliers)
    )
    # and the blocked solve converges to ground truth
    err = np.linalg.norm(
        np.asarray(res_fast.poses)[1:, :3, 3] - poses_gt[1:, :3, 3]
    )
    assert err < 0.05


def test_ba_pallas_linearize_parity():
    """The fused Pallas linearize+payload kernel (interpret mode on CPU)
    must reproduce the XLA blocked linearization + assembly to float32
    reassociation tolerance (the opt-in MCSLAM_BA_PALLAS=1 path)."""
    import jax

    from mcslam_tpu.geometry import lie
    from mcslam_tpu.ops.ba_pallas import linearize_payload_pallas

    C, K, L = 3, 4, 128
    Ok = 300  # not tile-divisible: exercises the padded tail
    O = K * Ok
    rng = np.random.RandomState(1)
    rig = synthetic.make_synthetic_rig(
        synthetic.SyntheticRigSpec(num_cams=C)
    )
    poses = jnp.asarray(np.stack([
        np.asarray(lie.se3_exp(jnp.asarray(rng.randn(6) * 0.1)))
        for _ in range(K)
    ]).astype(np.float32))
    lms = jnp.asarray(
        (rng.uniform(-6, 6, (L, 3)) + [0, 0, 8]).astype(np.float32)
    )
    obs = ba.BAObservations(
        kf=jnp.asarray(np.repeat(np.arange(K, dtype=np.int32), Ok)),
        cam=jnp.asarray(rng.randint(0, C, O), jnp.int32),
        lm=jnp.asarray(rng.randint(0, L, O), jnp.int32),
        uv=jnp.asarray(rng.uniform(0, 640, (O, 2)).astype(np.float32)),
        sigma2=jnp.asarray(rng.uniform(0.5, 2.0, O).astype(np.float32)),
        valid=jnp.asarray(rng.rand(O) > 0.1),
    )
    problem = ba.BAProblem(
        poses=poses, landmarks=lms,
        lm_valid=jnp.asarray(rng.rand(L) > 0.05), obs=obs,
        cam_T_ref=rig.cam_T_ref, fxycxy=rig.fxycxy,
        prior_H=jnp.zeros((K * 6, K * 6)), prior_b=jnp.zeros(K * 6),
        kf_valid=jnp.ones(K, bool),
    )
    r_ref, Jp_ref, Jl_ref, w_ref = ba._residuals_and_jacobians_blocked(
        problem, 2.5
    )
    onehots = ba._make_onehots(problem, True)
    sys_ref = ba._assemble(problem, r_ref, Jp_ref, Jl_ref, w_ref,
                           onehots, True)

    rTw = np.asarray(jax.vmap(lie.se3_inverse)(poses))
    rTw12 = np.concatenate(
        [rTw[:, :3, :3].reshape(K, 9), rTw[:, :3, 3]], axis=1
    )
    oh = np.asarray(obs.cam)
    payload, r, w, Hpp, gp = linearize_payload_pallas(
        jnp.asarray(rTw12),
        lms[obs.lm], obs.uv,
        jnp.asarray(np.asarray(rig.cam_T_ref)[:, :3, :3].reshape(C, 9)[oh]),
        jnp.asarray(np.asarray(rig.cam_T_ref)[:, :3, 3][oh]),
        jnp.asarray(np.asarray(rig.fxycxy)[oh]),
        obs.sigma2,
        jnp.asarray(
            (np.asarray(obs.valid)
             * np.asarray(problem.lm_valid)[np.asarray(obs.lm)]
             ).astype(np.float32)
        ),
        tile=256, interpret=True,
    )
    sys_pal = ba._assemble_from_payload(problem, payload, Hpp, gp,
                                        onehots[1])
    for a, b in zip(sys_pal, sys_ref):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-6)
        assert np.abs(a - b).max() / scale < 1e-5
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref), atol=1e-3)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), atol=1e-5)


def test_vio_kf_blocked_assembly_matches_scatter():
    """ba_vio._assemble_vio(kf_blocked=True) — the driver's one-hot
    block-sum vision assembly — must match the generic scatter path to f32
    reduction-order noise."""
    import numpy as np
    import jax.numpy as jnp

    from mcslam_tpu.backend import ba, ba_vio
    from mcslam_tpu.geometry import lie

    rng = np.random.RandomState(0)
    K, L, C, Ok = 4, 32, 2, 16
    O = K * Ok
    poses = np.stack([
        np.asarray(lie.se3_exp(jnp.asarray(
            np.concatenate([rng.randn(3) * 0.05, rng.randn(3) * 0.3]),
            jnp.float32)))
        for _ in range(K)
    ])
    lms = (rng.uniform(-3, 3, (L, 3)) + [0, 0, 8]).astype(np.float32)
    fxycxy = np.tile(np.array([[400., 400., 320., 240.]], np.float32),
                     (C, 1))
    ctb = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    ctb[1, 0, 3] = -0.2
    obs = ba.BAObservations(
        kf=jnp.asarray(np.repeat(np.arange(K, dtype=np.int32), Ok)),
        cam=jnp.asarray(rng.randint(0, C, O).astype(np.int32)),
        lm=jnp.asarray(rng.randint(0, L, O).astype(np.int32)),
        uv=jnp.asarray(rng.uniform(0, 640, (O, 2)).astype(np.float32)),
        sigma2=jnp.ones(O, jnp.float32),
        valid=jnp.asarray(rng.rand(O) > 0.2),
    )
    N = K * ba_vio.D + 6
    prob = ba_vio.VioProblem(
        poses=jnp.asarray(poses),
        vels=jnp.asarray(rng.randn(K, 3), jnp.float32),
        biases=jnp.zeros((K, 6)), landmarks=jnp.asarray(lms),
        lm_valid=jnp.ones(L, bool), obs=obs, cam_T_body=jnp.asarray(ctb),
        fxycxy=jnp.asarray(fxycxy), imu=None, gps=None,
        E_T_V=jnp.eye(4), prior_H=jnp.zeros((N, N)),
        prior_b=jnp.zeros(N), kf_valid=jnp.ones(K, bool),
    )
    H0, g0, Hll0, gl0, Wc0, _, c0 = ba_vio._assemble_vio(prob, 2.5, False)
    H1, g1, Hll1, gl1, Wc1, _, c1 = ba_vio._assemble_vio(prob, 2.5, True)
    for a, b in [(H0, H1), (g0, g1), (Hll0, Hll1), (gl0, gl1), (Wc0, Wc1)]:
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-9)
        assert np.abs(a - b).max() / scale < 1e-5
    assert abs(float(c0) - float(c1)) <= 1e-4 * max(abs(float(c0)), 1.0)
