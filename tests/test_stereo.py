import numpy as np
import jax.numpy as jnp

from mcslam_tpu.data import synthetic
from mcslam_tpu.ops import stereo


def test_disparity_constant_shift():
    """Right image = left shifted by a known disparity -> recover it."""
    rng = np.random.RandomState(0)
    import cv2

    left = (rng.rand(60, 120) * 255).astype(np.uint8)
    left = cv2.GaussianBlur(left, (5, 5), 1.0).astype(np.float32) / 255.0
    d_true = 7
    right = np.roll(left, -d_true, axis=1)  # content moves left by d
    disp, valid = stereo.disparity(
        jnp.asarray(left), jnp.asarray(right), max_disp=16, window=5
    )
    disp = np.asarray(disp)
    valid = np.asarray(valid)
    core = valid[10:-10, 20:-20]
    err = np.abs(disp[10:-10, 20:-20] - d_true)[core]
    assert core.mean() > 0.7
    assert np.median(err) < 0.6, np.median(err)


def test_depth_from_rig_pair_scene():
    """Rendered blob scene on a parallel rig: recovered depth should match
    landmark depths at the blob pixels."""
    rig = synthetic.make_synthetic_rig(
        synthetic.SyntheticRigSpec(num_cams=2, baseline=0.2,
                                   image_size=(320, 240), focal=260.0)
    )
    poses = synthetic.smooth_trajectory(1)
    lms = synthetic.make_landmarks(250, seed=1, depth_range=(4.0, 8.0),
                                   spread=(4.0, 3.0))
    imgs = synthetic.render_blob_images(rig, poses, lms, seed=2)[0]
    depth, valid = stereo.depth_from_rig_pair(
        jnp.asarray(imgs), rig, 0, 1, max_disp=32
    )
    depth = np.asarray(depth)
    valid = np.asarray(valid)
    # check at projected landmark pixels (blob centers)
    f = np.asarray(rig.fxycxy)[0]
    rTw = np.linalg.inv(poses[0])
    p = lms @ rTw[:3, :3].T + rTw[:3, 3]
    uv = p[:, :2] / p[:, 2:] * f[:2] + f[2:]
    errs = []
    for i in range(len(lms)):
        x, y = int(round(uv[i, 0])), int(round(uv[i, 1]))
        if 40 <= x < 280 and 10 <= y < 230 and valid[y, x]:
            errs.append(abs(depth[y, x] - p[i, 2]) / p[i, 2])
    assert len(errs) > 30
    assert np.median(errs) < 0.08, np.median(errs)

def test_sgm_beats_box_on_weak_texture():
    """SGM path aggregation (reference SGBM/ELAS-grade regularization,
    DepthReconstructor.cpp:26-40) must beat plain box WTA where texture is
    sparse: a slanted plane with sparse dots leaves box-WTA ambiguous
    between dots; SGM propagates along paths."""
    rng = np.random.RandomState(3)
    H, W = 80, 160
    f, B = 150.0, 0.2
    # slanted plane: depth varies with x -> disparity ramp
    x = np.arange(W, dtype=np.float32)
    Z = 4.0 + 2.0 * x / W  # 4..6 m
    d_true = np.broadcast_to(f * B / Z, (H, W))  # ~7.5 .. 5 px
    # sparse dot texture on a flat background
    left = np.full((H, W), 0.5, np.float32)
    ys, xs = rng.randint(0, H, 250), rng.randint(0, W, 250)
    left[ys, xs] = rng.rand(250).astype(np.float32)
    import cv2

    left = cv2.GaussianBlur(left, (5, 5), 1.0)
    # warp right: right[y, x] = left[y, x + d(x)] (inverse sampling)
    xs_src = np.clip(x[None, :] + d_true, 0, W - 1)
    x0 = np.floor(xs_src).astype(int)
    fr = xs_src - x0
    x1 = np.minimum(x0 + 1, W - 1)
    rows = np.arange(H)[:, None]
    right = left[rows, x0] * (1 - fr) + left[rows, x1] * fr

    errs = {}
    for algo in ("box", "sgm"):
        disp, valid = stereo.disparity(
            jnp.asarray(left), jnp.asarray(right.astype(np.float32)),
            max_disp=16, window=5, algo=algo,
        )
        disp = np.asarray(disp)
        core = np.s_[10:-10, 20:-20]
        errs[algo] = float(np.mean(np.abs(disp[core] - d_true[core])))
    assert errs["sgm"] < errs["box"], errs
    assert errs["sgm"] < 1.0, errs


def test_rectified_nonparallel_rig_depth():
    """General (verged) rig: cam_b translated AND rotated. Without
    rectification the row-aligned disparity search is invalid; the
    RigRectifier path (reference stereoRectify + remap,
    DepthReconstructor.cpp:7-22) must recover metric depth of a textured
    plane (EPE test vs analytic ground truth)."""
    from mcslam_tpu.geometry import camera as cam_ops
    from mcslam_tpu.geometry import lie as lie_ops

    W, H = 200, 120
    f = 150.0
    fxycxy = np.array([[f, f, W / 2, H / 2], [f, f, W / 2, H / 2]],
                      np.float32)
    # cam_b: 0.2 m to the +x, verged inward by 4 degrees about y
    ang = np.radians(4.0)
    R_b = np.array(
        [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
         [-np.sin(ang), 0, np.cos(ang)]], np.float32,
    )
    cam_T_ref = np.stack([np.eye(4, dtype=np.float32),
                          np.eye(4, dtype=np.float32)])
    cam_T_ref[1, :3, :3] = R_b.T  # cam_b <- ref rotation
    cam_T_ref[1, :3, 3] = -(R_b.T @ np.array([0.2, 0.0, 0.0]))
    rig = cam_ops.make_rig(
        fxycxy=jnp.asarray(fxycxy),
        cam_T_ref=jnp.asarray(cam_T_ref),
        image_size=(W, H),
    )

    # textured plane z = Z0 in the ref frame, smooth procedural texture
    Z0 = 5.0

    def texture(X, Y):
        return (
            0.5
            + 0.2 * np.sin(3.0 * X) * np.cos(2.5 * Y)
            + 0.15 * np.sin(7.1 * X + 1.3) * np.sin(5.3 * Y + 0.7)
            + 0.1 * np.sin(13.7 * X * 0.7 + 11.9 * Y)
        ).astype(np.float32)

    imgs = np.zeros((2, H, W), np.float32)
    for c in range(2):
        T = np.linalg.inv(cam_T_ref[c])  # ref <- cam
        u, v = np.meshgrid(np.arange(W, dtype=np.float64),
                           np.arange(H, dtype=np.float64))
        xn = (u - fxycxy[c, 2]) / fxycxy[c, 0]
        yn = (v - fxycxy[c, 3]) / fxycxy[c, 1]
        rays = np.stack([xn, yn, np.ones_like(xn)], -1) @ T[:3, :3].T
        o = T[:3, 3]
        s = (Z0 - o[2]) / np.maximum(rays[..., 2], 1e-9)
        X = o[0] + s * rays[..., 0]
        Y = o[1] + s * rays[..., 1]
        imgs[c] = texture(X, Y)

    depth, valid = stereo.depth_from_rig_pair(
        jnp.asarray(imgs), rig, 0, 1, max_disp=16, algo="sgm"
    )
    depth = np.asarray(depth)
    valid = np.asarray(valid)
    core = np.zeros_like(valid)
    core[15:-15, 25:-25] = True
    sel = valid & core
    assert sel.mean() > 0.3, sel.mean()
    # rectified cam_a looks at the same plane; its depth differs from Z0
    # only by the (small) rectifying rotation — compare against the
    # analytic rectified depth instead of Z0 directly
    rel_err = np.abs(depth[sel] - Z0) / Z0
    assert np.median(rel_err) < 0.08, np.median(rel_err)


def test_dense_fusion_world_cloud_geometry():
    """DenseFuser on the ray-cast cylinder world: fused wall voxels must
    sit on the known radius-10 cylinder (about the world y-axis), fused
    across MULTIPLE keyframe poses into one world-frame cloud."""
    from mcslam_tpu.mapping.dense_fusion import DenseFuser

    rig = synthetic.make_synthetic_rig(
        synthetic.SyntheticRigSpec(num_cams=2, baseline=0.3,
                                   image_size=(320, 240), focal=260.0)
    )
    poses = synthetic.loop_trajectory(3, radius=3.0, revisit_frames=0,
                                      seed=0)
    imgs = synthetic.render_textured_world(rig, poses, radius=10.0, seed=11)
    fuser = DenseFuser(rig, voxel=0.25, max_depth=25.0, stride=2,
                       algo="sgm", max_disp=48)
    for k in range(len(poses)):
        n = fuser.add_keyframe(jnp.asarray(imgs[k]), poses[k])
        assert n > 100
    pts, inten, cnt = fuser.finalize()
    assert len(pts) > 1000
    # wall region: away from floor (y=-2.5) and ceiling (y=+2.5)
    wall = np.abs(pts[:, 1]) < 1.8
    assert wall.sum() > 300
    r = np.sqrt(pts[wall, 0] ** 2 + pts[wall, 2] ** 2)
    err = np.abs(r - 10.0)
    assert np.median(err) < 0.5, np.median(err)
    # multi-keyframe fusion actually merged overlapping voxels
    assert (cnt > 1).mean() > 0.05
