"""Bisect the fused frame-build program (bench stage A) into its
sub-kernels and time each standalone on the current default device.

Stages mirror ops/orb.extract_orb_rig + frontend/frame._fused_stage at the
bench workload (4-cam VGA, 768 kps/cam, 4 levels, 2048 intra slots).
Per-stage numbers each include one dispatch floor; ranking is the point.
"""

import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def timeit(fn, n=20, reps=3):
    _ = np.asarray(fn(0))
    best = float("inf")
    for _rep in range(reps):
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(i)
        _ = np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from mcslam_tpu.utils import compile_cache

    compile_cache.enable()  # cache hits make repeat chip sessions ~free

    from mcslam_tpu.data import synthetic
    from mcslam_tpu.frontend import frame as frame_mod, intra as intra_ops
    from mcslam_tpu.geometry import triangulation
    from mcslam_tpu.ops import image as image_ops, orb, topk_grid
    from mcslam_tpu.ops import fast as fast_ops

    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    C, H, W = 4, 480, 640
    NPTS, NLVL, MAXI, BINS = 768, 4, 2048, 16
    rig = synthetic.make_synthetic_rig(
        synthetic.SyntheticRigSpec(num_cams=C, image_size=(W, H))
    )
    poses = synthetic.smooth_trajectory(2, step_angle=0.02)
    lms = synthetic.make_landmarks(3000, depth_range=(4.0, 15.0))
    imgs_np = synthetic.render_blob_images(rig, poses, lms)
    imgs = [jnp.asarray(imgs_np[i]) for i in range(2)]

    scale = 1.2
    budgets = orb._level_budget(NPTS, NLVL, scale)
    maxb = max(budgets)
    levels = image_ops.build_pyramid(imgs[0], NLVL, scale)
    hw = [(lv.shape[-2], lv.shape[-1]) for lv in levels]
    H0, W0 = hw[0]

    @jax.jit
    def k_pyr_blur(im):
        lv = image_ops.build_pyramid(im, NLVL, scale)
        stacked = jnp.concatenate(
            [jnp.pad(x, ((0, 0), (0, H0 - h), (0, W0 - w)), mode="edge")
             for x, (h, w) in zip(lv, hw)], axis=0)
        return image_ops.gaussian_blur(stacked, 7, 2.0).sum()

    # stacked batch for per-stage timing
    lv = image_ops.build_pyramid(imgs[0], NLVL, scale)
    stacked = jnp.concatenate(
        [jnp.pad(x, ((0, 0), (0, H0 - h), (0, W0 - w)), mode="edge")
         for x, (h, w) in zip(lv, hw)], axis=0)
    blurred = image_ops.gaussian_blur(stacked, 7, 2.0)
    blurred = jax.block_until_ready(blurred)

    use_pallas = orb._use_pallas()
    # per-image true heights: the production extract passes these so the
    # FAST kernel skips row tiles lying in a level's edge-padding
    # (MCSLAM_FAST_NO_HSKIP=1 reverts, mirroring extract_orb_rig)
    import os as _os
    hskip = _os.environ.get("MCSLAM_FAST_NO_HSKIP", "0") != "1"
    h_l = jnp.repeat(jnp.asarray([h for h, _ in hw], jnp.int32), C)
    if use_pallas:
        from mcslam_tpu.ops.fast_pallas import fast_corners_pallas

        @jax.jit
        def k_fast(s):
            return fast_corners_pallas(
                s, 7.0 / 255.0, heights=h_l if hskip else None).sum()
    else:
        @jax.jit
        def k_fast(s):
            return fast_ops.fast_corners(s, 7.0 / 255.0).sum()

    score = (fast_corners_pallas(stacked, 7.0 / 255.0,
                                 heights=h_l if hskip else None)
             if use_pallas else fast_ops.fast_corners(stacked, 7.0 / 255.0))
    # mask to true level bounds before selection (extract_orb_rig does
    # this after FAST; without it the two FAST variants would select
    # different keypoints in the padded region)
    w_l = jnp.repeat(jnp.asarray([w for _, w in hw], jnp.int32), C)
    yy = jnp.arange(H0, dtype=jnp.int32)[None, :, None]
    xx = jnp.arange(W0, dtype=jnp.int32)[None, None, :]
    interior = (yy < (h_l[:, None, None] - fast_ops.BORDER)) & (
        xx < (w_l[:, None, None] - fast_ops.BORDER))
    score = jnp.where(interior, score, 0.0)
    score = jax.block_until_ready(score)

    @jax.jit
    def k_select(sc):
        yx, resp, valid = jax.vmap(
            lambda s: topk_grid.select_keypoints(
                s, maxb, cell=16, per_cell=4, approx=True)
        )(sc)
        return yx.sum() + resp.sum() + valid.sum()

    yx, resp, valid = jax.vmap(
        lambda s: topk_grid.select_keypoints(s, maxb, cell=16, per_cell=4,
                                             approx=True)
    )(score)
    yx = jax.block_until_ready(yx)

    # early cross-level compaction (mirrors extract_orb_rig's round-4
    # default): patches/orientation/descriptors run on the flat compacted
    # list of T = C*NPTS keypoints, each naming its source image
    L = NLVL
    Cb = C  # cameras

    def _merge(x):
        x = x.reshape(L, Cb, maxb, *x.shape[2:])
        return jnp.moveaxis(x, 1, 0).reshape(Cb, L * maxb, *x.shape[3:])

    img_idx = jnp.broadcast_to(
        jnp.arange(L * Cb, dtype=jnp.int32)[:, None], (L * Cb, maxb))
    yxm, resp_m, valid_m, img_m = (
        _merge(yx), _merge(resp), _merge(valid), _merge(img_idx))
    prio = jnp.where(valid_m, resp_m + 1e3, -1.0)
    _, top = jax.lax.top_k(prio, NPTS)
    take = lambda a: jnp.take_along_axis(
        a, top.reshape(Cb, NPTS, *([1] * (a.ndim - 2))), axis=1)
    flat_yx = take(yxm).reshape(Cb * NPTS, 2)
    flat_img = take(img_m).reshape(Cb * NPTS)

    if use_pallas:
        from mcslam_tpu.ops.patch_pallas import extract_patches_indexed_pallas

        @jax.jit
        def k_patch(b, y, ii):
            p, o = extract_patches_indexed_pallas(b, y, ii)
            return p.sum()

        patches, origin = extract_patches_indexed_pallas(
            blurred, flat_yx, flat_img)
    else:
        @jax.jit
        def k_patch(b, y, ii):
            p, o = orb.extract_patches_indexed(b, y, ii)
            return p.sum()

        patches, origin = orb.extract_patches_indexed(
            blurred, flat_yx, flat_img)
    patches = jax.block_until_ready(patches)

    @jax.jit
    def k_orient(p, y, o):
        return orb.patch_orientation(p, y, o).sum()

    ang = orb.patch_orientation(patches, flat_yx, origin)
    ang = jax.block_until_ready(ang)
    center = (flat_yx - origin).astype(jnp.float32)

    @jax.jit
    def k_desc(p, c, a):
        return orb.compute_descriptors_patch(p, c, a, BINS).sum()

    # full extraction + full frame build (jit the standalone extraction:
    # called raw it executes EAGERLY — hundreds of per-op dispatches)
    ex_jit = jax.jit(functools.partial(
        orb.extract_orb_rig, num_points=NPTS, num_levels=NLVL,
        angle_bins=BINS))

    def k_extract(i):
        return ex_jit(imgs[i % 2]).desc.sum()

    def k_frame(i):
        return frame_mod.build_frame(
            imgs[i % 2], rig, num_points=NPTS, num_levels=NLVL,
            max_intra=MAXI, angle_bins=BINS).im_desc.sum()

    # intra + triangulation standalone (feature-level)
    ff = frame_mod.build_frame(
        imgs[0], rig, num_points=NPTS, num_levels=NLVL, max_intra=MAXI,
        angle_bins=BINS)
    kp_desc, kp_valid = ff.kp_desc, ff.kp_valid
    kp_uv, kp_resp = ff.kp_xy_ud, ff.kp_response
    kp_sig = ff.kp_sigma2

    @jax.jit
    def k_intra(d, u, v, r):
        g = intra_ops.intra_match(
            desc=d, xy_ud=u, valid=v, response=r, rig=rig, max_out=MAXI)
        return g.ray_idx.sum() + g.desc.sum()

    g = intra_ops.intra_match(
        desc=kp_desc, xy_ud=kp_uv, valid=kp_valid, response=kp_resp,
        rig=rig, max_out=MAXI)
    g = jax.tree.map(jax.block_until_ready, g)

    @jax.jit
    def k_tri(gg, u, s):
        out = frame_mod._triangulate_stage.__wrapped__(
            gg, u, s, rig, 0.5, 40.0)
        return out[0].sum()

    stages = [
        ("pyramid+pad+blur", lambda i: k_pyr_blur(imgs[i % 2])),
        ("FAST", lambda i: k_fast(blurred if i % 2 else stacked)),
        ("select (grid+approx topk)", lambda i: k_select(score)),
        ("patch extraction (compacted)",
         lambda i: k_patch(blurred, flat_yx, flat_img)),
        ("orientation matmul", lambda i: k_orient(patches, flat_yx, origin)),
        ("descriptor matmul", lambda i: k_desc(patches, center, ang)),
        ("intra match", lambda i: k_intra(kp_desc, kp_uv, kp_valid, kp_resp)),
        ("triangulate", lambda i: k_tri(g, kp_uv, kp_sig)),
        ("FULL extract_orb_rig", k_extract),
        ("FULL frame build", k_frame),
    ]
    for name, fn in stages:
        # FULL stages are whole programs — fewer reps (the ranking is
        # what matters, and a 1-core CPU smoke otherwise takes forever)
        full = name.startswith("FULL")
        t = timeit(fn, n=5 if full else 20, reps=2 if full else 3)
        print(f"{name:28s} {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
