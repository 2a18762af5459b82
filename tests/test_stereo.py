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