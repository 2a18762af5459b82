import jax
import jax.numpy as jnp
import numpy as np

from mcslam_tpu.geometry import camera, lie, triangulation, alignment, geodesy


def _rig(n=3):
    fxycxy = jnp.tile(jnp.array([[400.0, 400.0, 320.0, 240.0]]), (n, 1))
    dist = jnp.tile(jnp.array([[-0.1, 0.02, 0.001, -0.0005, 0.0]]), (n, 1))
    # cameras spaced along x
    cam_T_ref = jnp.stack(
        [
            lie.se3_matrix(jnp.eye(3), jnp.array([-0.1 * i, 0.0, 0.0]))
            for i in range(n)
        ]
    )
    return camera.make_rig(fxycxy, dist, cam_T_ref, image_size=(640, 480))


def test_distort_undistort_roundtrip_radtan():
    key = jax.random.PRNGKey(0)
    xn = jax.random.uniform(key, (256, 2), minval=-0.5, maxval=0.5)
    d = jnp.array([-0.2, 0.05, 0.001, -0.002, 0.01])
    xd = camera.distort(xn, d, camera.DIST_RADTAN)
    xu = camera.undistort(xd, d, camera.DIST_RADTAN, iters=20)
    np.testing.assert_allclose(np.asarray(xu), np.asarray(xn), atol=1e-5)


def test_distort_undistort_roundtrip_equidistant():
    key = jax.random.PRNGKey(1)
    xn = jax.random.uniform(key, (256, 2), minval=-0.6, maxval=0.6)
    d = jnp.array([0.05, -0.01, 0.004, -0.001, 0.0])
    xd = camera.distort(xn, d, camera.DIST_EQUIDISTANT)
    xu = camera.undistort(xd, d, camera.DIST_EQUIDISTANT, iters=20)
    np.testing.assert_allclose(np.asarray(xu), np.asarray(xn), atol=1e-5)


def test_distortion_matches_opencv():
    cv2 = __import__("cv2")
    rng = np.random.RandomState(0)
    pts = rng.uniform(-0.4, 0.4, (100, 2)).astype(np.float64)
    d = np.array([-0.25, 0.07, 0.002, -0.001, 0.015])
    K = np.eye(3)
    proj, _ = cv2.projectPoints(
        np.concatenate([pts, np.ones((100, 1))], 1), np.zeros(3), np.zeros(3), K, d
    )
    ours = camera.distort(jnp.asarray(pts, jnp.float32), jnp.asarray(d, jnp.float32),
                          camera.DIST_RADTAN)
    np.testing.assert_allclose(np.asarray(ours), proj[:, 0, :], atol=1e-4)


def test_project_backproject_rig():
    rig = _rig(3)
    key = jax.random.PRNGKey(2)
    p_ref = jnp.concatenate(
        [
            jax.random.uniform(key, (50, 2), minval=-1.0, maxval=1.0),
            jax.random.uniform(jax.random.PRNGKey(3), (50, 1), minval=2.0, maxval=8.0),
        ],
        axis=-1,
    )
    uv, valid = camera.project_rig(p_ref, rig)
    assert uv.shape == (3, 50, 2)
    # backproject and check ray passes through the point
    rays_ref = camera.rig_bearings(uv, rig)  # (3, 50, 3)
    origins = rig.ref_T_cam[:, :3, 3]  # (3, 3)
    to_pt = p_ref[None] - origins[:, None]
    to_pt = to_pt / jnp.linalg.norm(to_pt, axis=-1, keepdims=True)
    cos = jnp.sum(rays_ref * to_pt, axis=-1)
    assert np.all(np.asarray(cos)[np.asarray(valid)] > 1.0 - 1e-5)


def test_triangulate_and_refine():
    rig = _rig(4)
    # cameras in world = ref frame at two keyframe poses
    kf0 = jnp.eye(4)
    kf1 = lie.se3_matrix(lie.so3_exp(jnp.array([0.0, 0.05, 0.0])), jnp.array([0.4, 0.0, 0.0]))
    world_T_cam = jnp.concatenate(
        [kf0 @ rig.ref_T_cam, kf1 @ rig.ref_T_cam], axis=0
    )  # (8, 4, 4)
    key = jax.random.PRNGKey(4)
    X_true = jnp.concatenate(
        [
            jax.random.uniform(key, (40, 2), minval=-1.5, maxval=1.5),
            jax.random.uniform(jax.random.PRNGKey(5), (40, 1), minval=3.0, maxval=10.0),
        ],
        axis=-1,
    )
    fxycxy = jnp.tile(rig.fxycxy, (2, 1))  # (8, 4)
    cam_T_world = lie.se3_inverse(world_T_cam)
    p_cam = lie.se3_apply(cam_T_world[None], X_true[:, None])  # (40, 8, 3)
    uv = p_cam[..., :2] / p_cam[..., 2:] * fxycxy[None, :, :2] + fxycxy[None, :, 2:]
    noise = jax.random.normal(jax.random.PRNGKey(6), uv.shape) * 0.3
    uv_noisy = uv + noise
    mask = jnp.ones(uv.shape[:-1], bool)
    wTc = jnp.broadcast_to(world_T_cam[None], (40, 8, 4, 4))
    f = jnp.broadcast_to(fxycxy[None], (40, 8, 4))
    X, ok = triangulation.triangulate_and_refine(wTc, uv_noisy, f, mask, sigma=1.0)
    assert np.asarray(ok).mean() > 0.9
    err = np.linalg.norm(np.asarray(X - X_true), axis=-1)
    assert np.median(err[np.asarray(ok)]) < 0.05


def test_triangulate_masked_rays():
    # only 2 of 6 rays valid -> still triangulates
    world_T_cam = jnp.stack([jnp.eye(4)] * 6)
    world_T_cam = world_T_cam.at[1, 0, 3].set(0.5)
    X_true = jnp.array([0.3, -0.2, 5.0])
    f = jnp.tile(jnp.array([[300.0, 300.0, 320.0, 240.0]]), (6, 1))
    p_cam = lie.se3_apply(lie.se3_inverse(world_T_cam), X_true)
    uv = p_cam[..., :2] / p_cam[..., 2:] * f[:, :2] + f[:, 2:]
    mask = jnp.array([True, True, False, False, False, False])
    X, ok = triangulation.triangulate_and_refine(
        world_T_cam[None], uv[None], f[None], mask[None]
    )
    assert bool(ok[0])
    np.testing.assert_allclose(np.asarray(X[0]), np.asarray(X_true), atol=1e-2)


def test_kabsch_exact():
    key = jax.random.PRNGKey(7)
    src = jax.random.normal(key, (20, 3))
    R_true = lie.so3_exp(jnp.array([0.4, -0.3, 0.9]))
    t_true = jnp.array([1.0, -2.0, 0.5])
    dst = src @ R_true.T + t_true
    R, t, s = alignment.kabsch(src, dst)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R_true), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_true), atol=1e-5)
    np.testing.assert_allclose(float(s), 1.0)


def test_umeyama_scale():
    key = jax.random.PRNGKey(8)
    src = jax.random.normal(key, (30, 3))
    R_true = lie.so3_exp(jnp.array([-0.2, 0.1, 0.3]))
    dst = 2.5 * src @ R_true.T + jnp.array([0.3, 0.0, -1.0])
    R, t, s = alignment.umeyama(src, dst)
    np.testing.assert_allclose(float(s), 2.5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R_true), atol=1e-5)


def test_kabsch_batched_weighted():
    key = jax.random.PRNGKey(9)
    src = jax.random.normal(key, (5, 10, 3))
    R_true = lie.so3_exp(jax.random.normal(jax.random.PRNGKey(10), (5, 3)) * 0.5)
    dst = jnp.einsum("bij,bmj->bmi", R_true, src)
    # corrupt 2 points per batch but zero-weight them
    dst = dst.at[:, :2].add(10.0)
    w = jnp.ones((5, 10)).at[:, :2].set(0.0)
    R, t, s = alignment.kabsch(src, dst, weights=w)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R_true), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), np.zeros((5, 3)), atol=1e-4)


def test_gravity_align():
    acc = jnp.array([0.1, 9.7, 1.0])
    R = alignment.gravity_align_rotation(acc)
    out = R @ (acc / jnp.linalg.norm(acc))
    np.testing.assert_allclose(np.asarray(out), [0.0, 0.0, 1.0], atol=1e-5)
    # antiparallel case
    R2 = alignment.gravity_align_rotation(jnp.array([0.0, 0.0, -9.81]))
    out2 = R2 @ jnp.array([0.0, 0.0, -1.0])
    np.testing.assert_allclose(np.asarray(out2), [0.0, 0.0, 1.0], atol=1e-5)


def test_enu_converter():
    conv = geodesy.EnuConverter(42.3601, -71.0589, 10.0)
    # same point -> origin
    np.testing.assert_allclose(conv.to_enu(42.3601, -71.0589, 10.0), 0.0, atol=1e-6)
    # 1 degree latitude north ~ 111 km north, small east offset
    enu = conv.to_enu(43.3601, -71.0589, 10.0)
    assert abs(enu[1] - 110900) < 500  # meters north
    assert abs(enu[0]) < 1.0
    # straight up
    enu_up = conv.to_enu(42.3601, -71.0589, 110.0)
    np.testing.assert_allclose(enu_up, [0.0, 0.0, 100.0], atol=0.01)


def test_chol_solve6_matches_dense_solve():
    """Unrolled-Cholesky 6x6 solve (latency path for the pose-LM chain)
    vs numpy LU on random damped SPD systems."""
    from mcslam_tpu.geometry import linalg3

    rng = np.random.RandomState(3)
    A = rng.randn(40, 6, 6).astype(np.float32)
    H = np.einsum("kij,klj->kil", A, A) + 1e-3 * np.eye(6, dtype=np.float32)
    g = rng.randn(40, 6).astype(np.float32)
    x = np.asarray(linalg3.chol_solve6(jnp.asarray(H), jnp.asarray(g)))
    xr = np.stack([
        np.linalg.solve(H[i].astype(np.float64), g[i].astype(np.float64))
        for i in range(40)
    ])
    rel = np.abs(x - xr) / np.maximum(np.abs(xr), 1e-6)
    assert rel.max() < 5e-3
