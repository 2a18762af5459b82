"""Live rig ingestion (ROS-free RosDataReader equivalent) + seg-mask veto."""

import threading
import time

import numpy as np
import jax.numpy as jnp

from mcslam_tpu.data.live import LiveRig
from mcslam_tpu.data import synthetic
from mcslam_tpu.frontend import frame as frame_mod


def test_live_rig_sync_and_slicing():
    rig = LiveRig(num_cams=2, sync_tol=0.005)
    H, W = 24, 32

    def producer():
        for k in range(5):
            t = k * 0.1
            img = np.full((H, W), k / 10.0, np.float32)
            rig.push_image(0, t, img)
            rig.push_image(1, t + 0.002, img + 0.01)  # slightly offset
            for j in range(10):
                rig.push_imu(t - 0.09 + j * 0.01, [0.1, 0, 0], [0, 0, 9.8])
            if k % 2 == 0:
                rig.push_gps(t - 0.01, 42.0, -71.0, 10.0)
        rig.stop()

    th = threading.Thread(target=producer)
    th.start()
    frames = []
    while True:
        out = rig.get_next(timeout=2.0)
        if out is None:
            break
        frames.append(out)
    th.join()
    assert len(frames) == 5
    imgs, t0, imu, gps = frames[2]
    assert imgs.shape == (2, H, W)
    assert abs(t0 - 0.2) < 1e-9
    # IMU slice covers (prev frame t, this frame t]
    ts = imu[0]
    assert len(ts) > 0 and ts.max() <= t0 + 1e-9
    # monotonically consumed: union over frames = all samples, no repeats
    all_ts = np.concatenate([f[2][0] for f in frames])
    assert len(np.unique(all_ts)) == len(all_ts)


def test_segmask_vetoes_keypoints():
    rig = synthetic.make_synthetic_rig(
        synthetic.SyntheticRigSpec(num_cams=2, image_size=(160, 120),
                                   focal=130.0)
    )
    poses = synthetic.smooth_trajectory(1)
    lms = synthetic.make_landmarks(200, seed=1, depth_range=(3.0, 8.0),
                                   spread=(3.0, 2.0))
    imgs = synthetic.render_blob_images(rig, poses, lms, seed=2)[0]
    # mask out the left half of every image
    masks = np.ones((2, 120, 160), np.float32)
    masks[:, :, :80] = 0.0
    ff_m = frame_mod.build_frame(
        jnp.asarray(imgs), rig, num_points=256, num_levels=2, max_intra=256,
        seg_masks=jnp.asarray(masks),
    )
    kept = np.asarray(ff_m.kp_valid)
    xy = np.asarray(ff_m.kp_xy)
    assert kept.sum() > 0
    assert (xy[kept][:, 0] >= 80).all()  # nothing survives in the masked half
