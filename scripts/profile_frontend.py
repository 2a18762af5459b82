"""Per-stage TPU profile of the frame pipeline + BA, with candidate
perf variants measured side by side (min-of-N windows; the tunneled relay
is a shared resource, see docs/PERF.md). Prints one line per stage as it
goes so partial runs are still useful.

Usage: python scripts/profile_frontend.py [stage ...]
(no args = all stages)
"""

import functools
import sys
import time

import numpy as np


def timeit(fn, n=20, reps=3):
    _ = np.asarray(fn(0))  # warm + drain
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

    from mcslam_tpu.backend import ba
    from mcslam_tpu.data import synthetic
    from mcslam_tpu.frontend import frame as frame_mod
    from mcslam_tpu.frontend import intra as intra_ops
    from mcslam_tpu.frontend import pose_opt, ransac
    from mcslam_tpu.ops import fast as fast_ops
    from mcslam_tpu.ops import hamming, image as image_ops, match as match_ops
    from mcslam_tpu.ops import orb, topk_grid

    only = set(sys.argv[1:])

    def want(name):
        return not only or name in only

    def report(name, ms):
        print(f"{name:24s} {ms*1e3:8.3f} ms", flush=True)

    print(f"# device: {jax.devices()[0]}", flush=True)

    C, H, W = 4, 480, 640
    NPTS, NLVL, MAXI = 1024, 4, 2048
    rig = synthetic.make_synthetic_rig(
        synthetic.SyntheticRigSpec(num_cams=C, image_size=(W, H))
    )
    poses = synthetic.smooth_trajectory(2, step_angle=0.02)
    lms = synthetic.make_landmarks(3000, depth_range=(4.0, 15.0))
    imgs_np = synthetic.render_blob_images(rig, poses, lms)
    imgs = [jnp.asarray(imgs_np[i]) for i in range(2)]

    # ---------- dispatch floor ----------
    if want("floor"):
        one = jnp.ones((8, 128), jnp.float32)

        @jax.jit
        def add(x, s):
            return x + s

        report("dispatch_floor", timeit(lambda i: add(one, float(i)).sum()))

    # ---------- stacked pyramid inputs (shared by sub-stages) ----------
    scale = 1.2
    budgets = orb._level_budget(NPTS, NLVL, scale)
    maxb = max(budgets)

    @jax.jit
    def make_stack(im):
        levels = image_ops.build_pyramid(im, NLVL, scale)
        H0, W0 = levels[0].shape[-2:]
        return jnp.concatenate(
            [
                jnp.pad(
                    lv,
                    ((0, 0), (0, H0 - lv.shape[-2]), (0, W0 - lv.shape[-1])),
                    mode="edge",
                )
                for lv in levels
            ],
            axis=0,
        )

    stacks = [make_stack(imgs[i]) for i in range(2)]
    jax.block_until_ready(stacks[1])

    if want("pyramid"):
        report("pyramid+pad", timeit(lambda i: make_stack(imgs[i % 2]).sum()))

    if want("blur"):
        blur = jax.jit(lambda s: image_ops.gaussian_blur(s, 7, 2.0))
        report("blur", timeit(lambda i: blur(stacks[i % 2]).sum()))

    use_pallas = orb._use_pallas()
    if want("fast"):
        if use_pallas:
            from mcslam_tpu.ops.fast_pallas import fast_corners_pallas

            fastf = jax.jit(
                lambda s: fast_corners_pallas(s, 7.0 / 255.0)
            )
        else:
            fastf = jax.jit(lambda s: fast_ops.fast_corners(s, 7.0 / 255.0))
        report("fast+nms", timeit(lambda i: fastf(stacks[i % 2]).sum()))

    # a realistic score map for selection stages
    if use_pallas:
        from mcslam_tpu.ops.fast_pallas import fast_corners_pallas as _fc
    else:
        _fc = functools.partial(fast_ops.fast_corners)
    score0 = jax.jit(lambda s: _fc(s, 7.0 / 255.0))(stacks[0])
    score1 = jax.jit(lambda s: _fc(s, 7.0 / 255.0))(stacks[1])
    scores = [score0, score1]
    jax.block_until_ready(score1)

    for name, approx in (("select_sort", False), ("select_approx", True)):
        if not want(name):
            continue
        sel = jax.jit(
            lambda sc, a=approx: jax.vmap(
                lambda s: topk_grid.select_keypoints(
                    s, maxb, cell=16, per_cell=4, approx=a
                )[0]
            )(sc)
        )
        report(name, timeit(lambda i: sel(scores[i % 2]).sum()))

    # patches input: the selected yx of score0
    yx0 = jax.jit(
        lambda sc: jax.vmap(
            lambda s: topk_grid.select_keypoints(s, maxb, 16, 4)[0]
        )(sc)
    )(score0)
    blurred0 = jax.jit(lambda s: image_ops.gaussian_blur(s, 7, 2.0))(
        stacks[0]
    )
    jax.block_until_ready(yx0)

    if want("patch"):
        if use_pallas:
            from mcslam_tpu.ops.patch_pallas import extract_patches_pallas

            pf = jax.jit(lambda b, y: extract_patches_pallas(b, y)[0])
        else:
            pf = jax.jit(
                lambda b, y: jax.vmap(orb.extract_patches)(b, y)[0]
            )
        report(
            "patch_dma",
            timeit(lambda i: pf(blurred0, yx0 + (i % 2)).sum()),
        )

    if use_pallas:
        from mcslam_tpu.ops.patch_pallas import extract_patches_pallas

        patches0, origin0 = extract_patches_pallas(blurred0, yx0)
    else:
        patches0, origin0 = jax.vmap(orb.extract_patches)(blurred0, yx0)
    center0 = (yx0 - origin0).astype(jnp.float32)
    jax.block_until_ready(patches0)

    if want("orient"):
        of = jax.jit(
            lambda p, y, o: jax.vmap(orb.patch_orientation)(p, y, o)
        )
        report(
            "orientation",
            timeit(lambda i: of(patches0 + i % 2, yx0, origin0).sum()),
        )

    ang0 = jax.vmap(orb.patch_orientation)(patches0, yx0, origin0)
    jax.block_until_ready(ang0)

    for name, bins in (("desc_bins32", 32), ("desc_bins16", 16)):
        if not want(name):
            continue
        df = jax.jit(
            lambda p, c, a, b=bins: jax.vmap(
                lambda pp, cc, aa: orb.compute_descriptors_patch(
                    pp, cc, aa, b
                )
            )(p, c, a)
        )
        report(name, timeit(lambda i: df(patches0 + i % 2, center0,
                                         ang0).sum()))

    # ---------- extract / triangulate / undistort isolation ----------
    if want("extract"):
        exf = jax.jit(
            lambda im: orb.extract_orb_rig(
                im, num_points=NPTS, num_levels=NLVL,
            ).desc
        )
        report("extract_full", timeit(lambda i: exf(imgs[i % 2]).sum()))

    # ---------- composite stages ----------
    def stage_a(im, approx=False, bins=32, npts=None):
        return frame_mod.build_frame(
            im, rig, num_points=npts or NPTS, num_levels=NLVL,
            max_intra=MAXI, approx_topk=approx, angle_bins=bins,
        )

    if want("tri") or want("undist"):
        ffx = stage_a(imgs[0])
        kp_xy = ffx.kp_xy
        kp_valid = ffx.kp_valid
        kp_sig2 = ffx.kp_sigma2
        xy_ud0 = ffx.kp_xy_ud
        groups0 = intra_ops.intra_match(
            desc=ffx.kp_desc, xy_ud=xy_ud0, valid=kp_valid,
            response=ffx.kp_response, rig=rig, max_out=MAXI,
        )
        jax.block_until_ready(groups0.desc)
        if want("undist"):
            uf = jax.jit(
                lambda xy, v: frame_mod.undistort_keypoints(xy, v, rig)
            )
            report("undistort", timeit(lambda i: uf(kp_xy + i % 2,
                                                    kp_valid).sum()))
        if want("tri"):
            tf = jax.jit(
                lambda g, xy, s: frame_mod._triangulate_stage.__wrapped__(
                    g, xy, s, rig, 0.5, 40.0
                )[0]
            )
            report(
                "triangulate",
                timeit(lambda i: tf(groups0, xy_ud0 + i % 2, kp_sig2).sum()),
            )

    if want("a_768b16"):
        report(
            "A_768+bins16",
            timeit(lambda i: stage_a(imgs[i % 2], False, 16,
                                     768).im_desc.sum()),
        )

    ff0 = stage_a(imgs[0])
    ff1 = stage_a(imgs[1])
    jax.block_until_ready(ff1.im_desc)

    if want("intra"):
        inf = jax.jit(
            lambda d, xy, v, r: intra_ops.intra_match(
                desc=d, xy_ud=xy, valid=v, response=r, rig=rig, max_out=MAXI
            ).desc
        )
        report(
            "intra_match",
            timeit(
                lambda i: inf(
                    (ff1 if i % 2 else ff0).kp_desc,
                    (ff1 if i % 2 else ff0).kp_xy_ud,
                    (ff1 if i % 2 else ff0).kp_valid,
                    (ff1 if i % 2 else ff0).kp_response,
                ).sum()
            ),
        )

    if want("a_full"):
        report(
            "A_frame_build",
            timeit(lambda i: stage_a(imgs[i % 2]).im_desc.sum()),
        )
    if want("a_variant"):
        report(
            "A_approx+bins16",
            timeit(
                lambda i: stage_a(imgs[i % 2], True, 16).im_desc.sum()
            ),
        )

    key = jax.random.PRNGKey(0)

    def track_body(key, cur, prev, X_world_prev):
        d = hamming.hamming_matrix(cur.im_desc, prev.im_desc)
        res = match_ops.match_mutual(
            d, row_mask=cur.im_valid, col_mask=prev.im_valid, max_dist=64,
            ratio=0.85,
        )
        X_world = X_world_prev[res.idx]
        mask = res.ok & cur.im_has_depth
        cTr = rig.cam_T_ref[cur.im_anchor_cam]
        f = rig.fxycxy[cur.im_anchor_cam]
        rr = ransac.ransac_kabsch(
            key, cur.im_point3d, X_world, cur.im_uv_ref, cTr, f, mask,
            num_hyp=512, px_thresh=5.0,
        )
        ref = pose_opt.optimize_pose(
            rr.world_T_ref, X_world, cur.im_uv_ref, cTr, f,
            mask & rr.inliers, sigma2=cur.im_sigma2,
        )
        return ref.world_T_ref, ref.num_inliers

    stage_b = jax.jit(track_body)
    Xw_prev = ff0.im_point3d
    jax.block_until_ready(stage_b(key, ff1, ff0, Xw_prev)[0])
    if want("b_track"):
        report(
            "B_track",
            timeit(
                lambda i: stage_b(
                    key, ff1 if i % 2 else ff0, ff0 if i % 2 else ff1,
                    Xw_prev
                )[0].sum()
            ),
        )

    # fused A+B: one program = one dispatch, one schedule
    @functools.partial(jax.jit, static_argnames=("approx", "bins"))
    def stage_ab(key, im, prev, X_world_prev, approx=False, bins=32):
        kps, xy_ud, groups, tri = frame_mod._fused_stage.__wrapped__(
            im, rig, None, NPTS, NLVL, 20.0 / 255.0, 7.0 / 255.0, MAXI,
            0.5, 40.0, bins, approx,
        )
        X, has_depth, anchor_cam, uv_ref, anchor_sigma2, n_rays = tri
        cur = frame_mod.FrameFeatures(
            kp_xy=kps.xy, kp_xy_ud=xy_ud, kp_response=kps.response,
            kp_angle=kps.angle, kp_octave=kps.octave, kp_sigma2=kps.sigma2,
            kp_desc=kps.desc, kp_valid=kps.valid,
            im_ray_idx=groups.ray_idx, im_desc=groups.desc,
            im_uv_ref=uv_ref, im_anchor_cam=anchor_cam, im_point3d=X,
            im_has_depth=has_depth, im_n_rays=n_rays, im_valid=groups.valid,
            im_sigma2=anchor_sigma2,
        )
        pose, ninl = track_body(key, cur, prev, X_world_prev)
        return pose, ninl, cur

    if want("ab_fused"):
        jax.block_until_ready(stage_ab(key, imgs[1], ff0, Xw_prev)[0])
        report(
            "AB_fused",
            timeit(
                lambda i: stage_ab(key, imgs[i % 2], ff0, Xw_prev)[0].sum()
            ),
        )
    if want("ab_variant"):
        jax.block_until_ready(
            stage_ab(key, imgs[1], ff0, Xw_prev, True, 16)[0]
        )
        report(
            "AB_fused+approx+b16",
            timeit(
                lambda i: stage_ab(
                    key, imgs[i % 2], ff0, Xw_prev, True, 16
                )[0].sum()
            ),
        )

    # ---------- BA tiers ----------
    def make_problem(K, L, O):
        Ok = O // K
        O = Ok * K
        rng = np.random.RandomState(0)
        obs = ba.BAObservations(
            kf=jnp.asarray(np.repeat(np.arange(K, dtype=np.int32), Ok)),
            cam=jnp.asarray(rng.randint(0, C, O), jnp.int32),
            lm=jnp.asarray(rng.randint(0, L, O), jnp.int32),
            uv=jnp.asarray(rng.uniform(0, W, (O, 2)).astype(np.float32)),
            sigma2=jnp.ones(O, jnp.float32),
            valid=jnp.ones(O, bool),
        )
        prior_H = jnp.zeros((K * 6, K * 6), jnp.float32).at[:6, :6].set(
            jnp.eye(6) * 1e6
        )
        return ba.BAProblem(
            poses=jnp.tile(jnp.eye(4, dtype=jnp.float32), (K, 1, 1)),
            landmarks=jnp.asarray(
                (rng.uniform(-6, 6, (L, 3)) + [0, 0, 8]).astype(np.float32)
            ),
            lm_valid=jnp.ones(L, bool), obs=obs,
            cam_T_ref=rig.cam_T_ref, fxycxy=rig.fxycxy,
            prior_H=prior_H, prior_b=jnp.zeros(K * 6, jnp.float32),
            kf_valid=jnp.ones(K, bool),
        )

    for name, (K, L, O, it, gr) in {
        "ba_16k_3x2": (6, 2048, 16384, 3, 2),
        "ba_16k_2x2": (6, 2048, 16384, 2, 2),
        "ba_8k_3x2": (6, 2048, 8192, 3, 2),
        "ba_4k_3x2": (6, 1024, 4096, 3, 2),
    }.items():
        if not want(name):
            continue
        prob = make_problem(K, L, O)
        solve = jax.jit(
            lambda p, it=it, gr=gr: ba.ba_solve(
                p, iters=it, gate_rounds=gr, kf_blocked=True
            )
        )
        jax.block_until_ready(solve(prob).poses)
        report(name, timeit(lambda i: solve(prob).poses.sum(), n=10,
                            reps=5))


if __name__ == "__main__":
    main()
