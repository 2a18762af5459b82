"""Host-side keyframe records: the padded SoA snapshot a frame leaves
behind when promoted (split out of slam.py; same contracts)."""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from mcslam_tpu.frontend.frame import FrameFeatures


@jax.jit
def _pack_kf(frame: FrameFeatures):
    """Pack every array a Keyframe needs into ONE f32 buffer: keyframe
    construction otherwise costs ~10 separate device->host round trips."""
    C = frame.kp_xy_ud.shape[0]
    M = frame.im_ray_idx.shape[0]
    safe = jnp.maximum(frame.im_ray_idx, 0)
    cam = jnp.arange(C, dtype=jnp.int32)[None, :]
    ray_uv = frame.kp_xy_ud[cam, safe]  # (M, C, 2)
    ray_sig = frame.kp_sigma2[cam, safe]  # (M, C)
    # descriptors travel as two exact u16-in-f32 halves (bitcasting u32 to
    # f32 risks NaN canonicalization corrupting bits in transit)
    desc_lo = (frame.im_desc & jnp.uint32(0xFFFF)).astype(jnp.float32)
    desc_hi = (frame.im_desc >> 16).astype(jnp.float32)
    parts = [
        desc_lo.reshape(-1),
        desc_hi.reshape(-1),
        frame.im_uv_ref.reshape(-1),
        frame.im_anchor_cam.astype(jnp.float32),
        frame.im_valid.astype(jnp.float32),
        frame.im_sigma2,
        frame.im_point3d.reshape(-1),
        frame.im_has_depth.astype(jnp.float32),
        frame.im_ray_idx.astype(jnp.float32).reshape(-1),
        ray_uv.reshape(-1),
        ray_sig.reshape(-1),
    ]
    return jnp.concatenate(parts)


class Keyframe:
    """Host-side keyframe record (small numpy arrays + landmark id table)."""

    is_dummy = False  # GPS dummy keyframes override (no vision content)

    @classmethod
    def dummy(cls, kf_id, timestamp, world_T_ref, num_cams: int,
              num_slots: int):
        """IMU-predicted GPS keyframe with NO vision content (reference
        dummy-KF ctor MultiCameraFrame.cpp:56-75 / insertKeyFrame overload
        FrontEnd.cpp:1452-1484): a pure state node the window BA constrains
        with IMU + GPS factors only."""
        kf = cls.__new__(cls)
        kf.kf_id = kf_id
        kf.timestamp = timestamp
        kf.world_T_ref = np.asarray(world_T_ref, np.float32)
        kf.is_dummy = True
        M, C = num_slots, num_cams
        kf.im_desc = np.zeros((M, 8), np.uint32)
        kf.im_uv = np.zeros((M, 2), np.float32)
        kf.im_anchor_cam = np.zeros(M, np.int32)
        kf.im_valid = np.zeros(M, bool)
        kf.im_sigma2 = np.ones(M, np.float32)
        kf.im_point3d = np.zeros((M, 3), np.float32)
        kf.im_has_depth = np.zeros(M, bool)
        kf.im_ray_idx = np.full((M, C), -1, np.int32)
        kf.ray_uv = np.zeros((M, C, 2), np.float32)
        kf.ray_sigma2 = np.ones((M, C), np.float32)
        kf.ray_valid = np.zeros((M, C), bool)
        kf.lm_id = np.full(M, -1, np.int32)
        kf.d_desc = None
        kf.d_valid = None
        kf._d_lm_id = None
        return kf

    def __init__(self, kf_id, timestamp, world_T_ref, frame: FrameFeatures):
        self.kf_id = kf_id
        self.timestamp = timestamp
        self.world_T_ref = np.asarray(world_T_ref)
        C = frame.kp_xy_ud.shape[0]
        M = frame.im_ray_idx.shape[0]
        v = np.asarray(_pack_kf(frame))  # one fetch
        o = 0

        def take(n, shape=None, dtype=None):
            nonlocal o
            out = v[o : o + n]
            o += n
            if shape is not None:
                out = out.reshape(shape)
            if dtype is not None:
                out = out.astype(dtype)
            return out

        lo = take(M * 8, (M, 8)).astype(np.uint32)
        hi = take(M * 8, (M, 8)).astype(np.uint32)
        self.im_desc = (hi << 16) | lo
        self.im_uv = take(M * 2, (M, 2))
        self.im_anchor_cam = take(M, dtype=np.int32)
        self.im_valid = take(M) > 0.5
        self.im_sigma2 = take(M)
        self.im_point3d = take(M * 3, (M, 3))
        self.im_has_depth = take(M) > 0.5
        self.im_ray_idx = take(M * C, (M, C), np.int32)
        self.ray_uv = take(M * C * 2, (M, C, 2))
        self.ray_sigma2 = take(M * C, (M, C))
        self.ray_valid = self.im_ray_idx >= 0
        self.lm_id = np.full(M, -1, np.int32)
        # device-resident copies for the tracking kernels (descriptors are
        # already on device in the frame; re-uploading every frame costs a
        # tunnel round trip each)
        self.d_desc = frame.im_desc
        self.d_valid = frame.im_valid
        self._d_lm_id = None

    def d_lm_id(self):
        if self._d_lm_id is None:

            self._d_lm_id = jnp.asarray(self.lm_id)
        return self._d_lm_id

    def device_desc(self):
        """Device-resident (desc, valid) — lazily re-uploaded if released."""
        if self.d_desc is None:
            self.d_desc = jnp.asarray(self.im_desc)
            self.d_valid = jnp.asarray(self.im_valid)
        return self.d_desc, self.d_valid

    def release_device(self):
        """Free this keyframe's device-resident copies (reference
        FrontEnd::reset frees images/descriptors of KF(n-4),
        FrontEnd.cpp:1255-1277): only the tracking reference keyframe is
        read on device, so older keyframes' HBM copies are dead weight —
        without this a long session accumulates ~70 KB of HBM per
        keyframe. Host arrays stay (loop closure / BA read those)."""
        self.d_desc = None
        self.d_valid = None
        self._d_lm_id = None

    def lm_dirty(self):
        """Call after mutating lm_id so the device copy refreshes lazily."""
        self._d_lm_id = None


