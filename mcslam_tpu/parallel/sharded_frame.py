"""Multi-camera frame build sharded over a device mesh.

The reference forks one std::thread per camera for ORB extraction
(MultiCameraFrame::extractFeaturesParallel,
/root/reference/MCSlam/src/MultiCameraFrame.cpp:203). The single-device
rebuild replaces the fork-join with a camera batch axis; this module is
the multi-chip version of the same idea: the camera axis is sharded over
the mesh, each device extracts + undistorts ITS cameras (the
pixel-proportional ~whole of stage A), the per-camera keypoint tables are
`all_gather`ed over ICI (O(C*N) — a few hundred KB, vs O(C*H*W) images),
and the cross-camera stages (intra-matching, rig triangulation) run
replicated so every device finishes holding the full FrameFeatures.

Parity is BIT-EXACT with the single-device `build_frame`: extraction and
undistortion are per-camera independent (every reduction in them is
within one camera), and the gathered inputs to intra/triangulate are
identical arrays — proven by tests/test_parallel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mcslam_tpu.frontend import frame as frame_mod
from mcslam_tpu.frontend import intra as intra_ops
from mcslam_tpu.ops import orb

AXIS = "cam"


def make_mesh(n_devices: int | None = None, platform: str | None = None) -> Mesh:
    devs = jax.devices(platform) if platform else jax.devices()
    n = n_devices or len(devs)
    return Mesh(devs[:n], axis_names=(AXIS,))


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "num_points", "num_levels", "fast_threshold",
        "min_threshold", "max_intra", "min_z", "max_z", "angle_bins",
        "approx_topk",
    ),
)
def _sharded_fused_stage(
    mesh: Mesh, imgs, rig, num_points, num_levels, fast_threshold,
    min_threshold, max_intra, min_z, max_z, angle_bins, approx_topk,
):
    n_dev = mesh.devices.size
    C = imgs.shape[0]
    c_local = C // n_dev

    def shard_fn(im_local, rig_full):
        if im_local.dtype == jnp.uint8:
            im_local = im_local.astype(jnp.float32) * (1.0 / 255.0)
        kps = orb.extract_orb_rig(
            im_local, num_points=num_points, num_levels=num_levels,
            fast_threshold=fast_threshold, min_threshold=min_threshold,
            angle_bins=angle_bins, approx_topk=approx_topk,
        )
        # undistort with THIS device's slice of the replicated calibration
        dev = jax.lax.axis_index(AXIS)
        fxy = jax.lax.dynamic_slice_in_dim(
            rig_full.fxycxy, dev * c_local, c_local, 0
        )
        dst = jax.lax.dynamic_slice_in_dim(
            rig_full.dist, dev * c_local, c_local, 0
        )
        from mcslam_tpu.geometry import camera as cam_ops

        xn = cam_ops.backproject(
            kps.xy, fxy[:, None, :], dst[:, None, :], rig_full.dist_model
        )
        xy_ud = xn * fxy[:, None, :2] + fxy[:, None, 2:]
        xy_ud = jnp.where(kps.valid[..., None], xy_ud, 0.0)

        # gather the camera axis: O(C*N) keypoint tables over ICI
        gather = lambda x: jax.lax.all_gather(x, AXIS, axis=0, tiled=True)
        kps_g = orb.Keypoints(*(gather(f) for f in kps))
        xy_ud_g = gather(xy_ud)

        # cross-camera stages, replicated (identical inputs everywhere)
        groups = intra_ops.intra_match(
            desc=kps_g.desc, xy_ud=xy_ud_g, valid=kps_g.valid,
            response=kps_g.response, rig=rig_full, max_out=max_intra,
        )
        tri = frame_mod._triangulate_stage.__wrapped__(
            groups, xy_ud_g, kps_g.sigma2, rig_full, min_z, max_z
        )
        return kps_g, xy_ud_g, groups, tri

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(AXIS), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    return fn(imgs, rig)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "num_points", "num_levels", "fast_threshold",
        "min_threshold", "max_intra", "min_z", "max_z", "angle_bins",
        "approx_topk",
    ),
)
def _frames_batch_stage(
    mesh: Mesh, imgs, rig, num_points, num_levels, fast_threshold,
    min_threshold, max_intra, min_z, max_z, angle_bins, approx_topk,
):
    def shard_fn(im_local, rig_full):
        # one frame per device: the full fused single-frame build
        kps, xy_ud, groups, tri = frame_mod._fused_stage.__wrapped__(
            im_local[0], rig_full, None, num_points, num_levels,
            fast_threshold, min_threshold, max_intra, min_z, max_z,
            angle_bins, approx_topk,
        )
        add_b = lambda t: jax.tree.map(lambda x: x[None], t)
        return add_b(kps), xy_ud[None], add_b(groups), add_b(tri)

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(AXIS), P()),
        out_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
        check_vma=False,
    )
    return fn(imgs, rig)


def sharded_build_frames(
    mesh: Mesh,
    imgs: jax.Array,  # (B, C, H, W), B == mesh size
    rig,
    **kw,
) -> list[frame_mod.FrameFeatures]:
    """Frame-parallel batch build: B frames built simultaneously, ONE per
    mesh device (pure data parallelism over the frame axis; bit-exact vs
    B sequential `build_frame` calls). The throughput mode for offline
    mapping / trajectory evaluation, where frame builds have no
    dependency on SLAM state — the reference's closest analogue is its
    rosbag producer thread running ahead of the pipeline.

    Returns a list of B FrameFeatures (host-side unstack of the sharded
    batch).
    """
    B = imgs.shape[0]
    n_dev = mesh.devices.size
    if B != n_dev:
        raise ValueError(f"batch={B} must equal mesh devices={n_dev}")
    defaults = dict(
        num_points=1024, num_levels=8, fast_threshold=20.0 / 255.0,
        min_threshold=7.0 / 255.0, max_intra=2048, min_z=0.5, max_z=40.0,
        angle_bins=orb.ANGLE_BINS, approx_topk=True,
    )
    defaults.update(kw)
    kps, xy_ud, groups, tri = _frames_batch_stage(mesh, imgs, rig,
                                                  **defaults)
    out = []
    for b in range(B):
        X, has_depth, anchor_cam, uv_ref, anchor_sigma2, n_rays = (
            jax.tree.map(lambda x: x[b], tri)
        )
        k = jax.tree.map(lambda x: x[b], kps)
        g = jax.tree.map(lambda x: x[b], groups)
        out.append(frame_mod.FrameFeatures(
            kp_xy=k.xy, kp_xy_ud=xy_ud[b], kp_response=k.response,
            kp_angle=k.angle, kp_octave=k.octave, kp_sigma2=k.sigma2,
            kp_desc=k.desc, kp_valid=k.valid,
            im_ray_idx=g.ray_idx, im_desc=g.desc, im_uv_ref=uv_ref,
            im_anchor_cam=anchor_cam, im_point3d=X, im_has_depth=has_depth,
            im_n_rays=n_rays, im_valid=g.valid, im_sigma2=anchor_sigma2,
        ))
    return out


def sharded_build_frame(
    mesh: Mesh,
    imgs: jax.Array,
    rig,
    num_points: int = 1024,
    num_levels: int = 8,
    max_intra: int = 2048,
    fast_threshold: float = 20.0 / 255.0,
    min_threshold: float = 7.0 / 255.0,
    min_z: float = 0.5,
    max_z: float = 40.0,
    angle_bins: int = orb.ANGLE_BINS,
    approx_topk: bool = True,
) -> frame_mod.FrameFeatures:
    """`build_frame` with the camera axis sharded over `mesh` (bit-exact).

    Requires num_cams % mesh size == 0 (cameras are the unit of work; a
    4-camera rig shards onto 1/2/4 devices).
    """
    C = imgs.shape[0]
    n_dev = mesh.devices.size
    if C % n_dev:
        raise ValueError(
            f"num_cams={C} not divisible by mesh devices={n_dev}"
        )
    kps, xy_ud, groups, tri = _sharded_fused_stage(
        mesh, imgs, rig, num_points, num_levels, fast_threshold,
        min_threshold, max_intra, min_z, max_z, angle_bins, approx_topk,
    )
    X, has_depth, anchor_cam, uv_ref, anchor_sigma2, n_rays = tri
    return frame_mod.FrameFeatures(
        kp_xy=kps.xy,
        kp_xy_ud=xy_ud,
        kp_response=kps.response,
        kp_angle=kps.angle,
        kp_octave=kps.octave,
        kp_sigma2=kps.sigma2,
        kp_desc=kps.desc,
        kp_valid=kps.valid,
        im_ray_idx=groups.ray_idx,
        im_desc=groups.desc,
        im_uv_ref=uv_ref,
        im_anchor_cam=anchor_cam,
        im_point3d=X,
        im_has_depth=has_depth,
        im_n_rays=n_rays,
        im_valid=groups.valid,
        im_sigma2=anchor_sigma2,
    )
