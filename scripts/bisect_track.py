"""Bisect the fused tracking program (bench stage B) into its sub-kernels
and time each standalone on the current default device.

Usage: python scripts/bisect_track.py  (run on the TPU; CPU works too but
the numbers then reflect the host, not the chip).

Each sub-stage is timed as its own jitted program with the same shapes the
bench/driver uses (M=2048 intra slots, 512+256 RANSAC hypotheses, 4096
local-map candidates). Times include one per-dispatch tunnel floor each, so
the SUM of the parts exceeds the fused program's time — the point is the
relative ranking, not the absolute sum.
"""

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
    from mcslam_tpu.frontend import frame as frame_mod, pose_opt, ransac
    from mcslam_tpu.ops import hamming, match as match_ops
    from mcslam_tpu import tracking_kernels as tk
    from mcslam_tpu.slam import SlamConfig

    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    C, H, W = 4, 480, 640
    rig = synthetic.make_synthetic_rig(
        synthetic.SyntheticRigSpec(num_cams=C, image_size=(W, H))
    )
    poses = synthetic.smooth_trajectory(2, step_angle=0.02)
    lms = synthetic.make_landmarks(3000, depth_range=(4.0, 15.0))
    imgs_np = synthetic.render_blob_images(rig, poses, lms)
    ff0 = frame_mod.build_frame(
        jnp.asarray(imgs_np[0]), rig, num_points=768, num_levels=4,
        max_intra=2048, angle_bins=16,
    )
    ff1 = frame_mod.build_frame(
        jnp.asarray(imgs_np[1]), rig, num_points=768, num_levels=4,
        max_intra=2048, angle_bins=16,
    )
    jax.block_until_ready(ff1.im_desc)

    scfg = SlamConfig()
    M = int(ff0.im_valid.shape[0])
    valid0 = np.asarray(ff0.im_valid) & np.asarray(ff0.im_has_depth)
    prev_lm_id = jnp.asarray(
        np.where(valid0, np.arange(M, dtype=np.int32), -1)
    )
    pos0 = np.asarray(ff0.im_point3d)
    MAP_CAP = 65536
    map_pos = np.zeros((MAP_CAP, 3), np.float32); map_pos[:M] = pos0
    map_valid = np.zeros(MAP_CAP, bool); map_valid[:M] = valid0
    map_desc = np.zeros((MAP_CAP, 8), np.uint32)
    map_desc[:M] = np.asarray(ff0.im_desc)
    nrm = -pos0 / np.maximum(np.linalg.norm(pos0, axis=1, keepdims=True), 1e-6)
    map_normal = np.zeros((MAP_CAP, 3), np.float32); map_normal[:M] = nrm
    LML = scfg.local_map_landmarks
    cand = np.flatnonzero(map_valid)[:LML]
    cand_pad = np.zeros(LML, np.int32); cand_pad[:len(cand)] = cand
    cand_valid = jnp.asarray(np.arange(LML) < len(cand))
    cand_pad = jnp.asarray(cand_pad)
    d_map_pos, d_map_valid = jnp.asarray(map_pos), jnp.asarray(map_valid)
    d_map_desc, d_map_normal = jnp.asarray(map_desc), jnp.asarray(map_normal)
    pred_T = jnp.eye(4, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)

    cur_uv, cur_anchor = ff1.im_uv_ref, ff1.im_anchor_cam
    cTr = rig.cam_T_ref[cur_anchor]
    fML = rig.fxycxy[cur_anchor]

    # --- 1. projection gate (anchored sq px dist over the map mirror) ---
    # NOTE: every kernel takes its big arrays as ARGUMENTS — closed-over
    # constants can be constant-folded by XLA and time as ~0.
    @jax.jit
    def k_gate(pT, d_map_pos, prev_lm_id, cur_uv, cur_anchor):
        from mcslam_tpu.geometry import lie
        safe_prev = jnp.maximum(prev_lm_id, 0)
        Xp = d_map_pos[safe_prev]
        cam_T_w = jnp.einsum(
            "cij,jk->cik", rig.cam_T_ref, lie.se3_inverse(pT))
        pc = (jnp.einsum("cij,mj->cmi", cam_T_w[:, :3, :3], Xp)
              + cam_T_w[:, None, :3, 3])
        z = pc[..., 2]
        uvp = (pc[..., :2] / jnp.maximum(z[..., None], 1e-6)
               * rig.fxycxy[:, None, :2] + rig.fxycxy[:, None, 2:])
        d2 = tk._anchored_sq_px_dist(
            cur_uv, cur_anchor, jnp.clip(uvp, -1e5, 1e5), z <= 0.05)
        return d2.sum()

    # --- 2. hamming + mutual match (2048 x 2048) ---
    @jax.jit
    def k_match(da, va, db, vb):
        d = hamming.hamming_matrix(da, db)
        res = match_ops.match_mutual(
            d, row_mask=va, col_mask=vb,
            max_dist=scfg.inter_max_dist, ratio=scfg.inter_ratio)
        return res.idx.sum() + res.ok.sum()

    # --- 3/4. RANSAC solvers ---
    with_lm = ff1.im_valid & ff1.im_has_depth

    Xw = d_map_pos[:M]

    def k_kabsch(i):
        rr = ransac.ransac_kabsch(
            jax.random.PRNGKey(i), ff1.im_point3d, Xw, cur_uv,
            cTr, fML, with_lm, num_hyp=scfg.ransac_hyps,
            px_thresh=scfg.ransac_px)
        return rr.world_T_ref.sum()

    def k_pnp(i):
        rr = ransac.ransac_pnp(
            jax.random.PRNGKey(i), Xw, cur_uv, cTr, fML,
            with_lm, num_hyp=max(scfg.ransac_hyps // 2, 64),
            px_thresh=scfg.ransac_px)
        return rr.world_T_ref.sum()

    # --- 5. portfolio refine (3 vmapped optimize_pose) ---
    inits = jnp.stack([pred_T, pred_T, pred_T])
    masks = jnp.stack([with_lm, with_lm, with_lm])

    @jax.jit
    def k_refine3(Xw, uv, sig2, inits, masks):
        refs = jax.vmap(
            lambda T0, m: pose_opt.optimize_pose(
                T0, Xw, uv, cTr, fML, m, sigma2=sig2)
        )(inits, masks)
        return refs.world_T_ref.sum()

    @jax.jit
    def k_refine1(Xw, uv, sig2, T0, m):
        ref = pose_opt.optimize_pose(T0, Xw, uv, cTr, fML, m, sigma2=sig2)
        return ref.world_T_ref.sum()

    # --- 6. hypothesis scoring alone (512 x 2048) ---
    hyps = jnp.broadcast_to(pred_T, (512, 4, 4))

    @jax.jit
    def k_score(hyps, Xw, uv, m):
        s, _inl = ransac._score_reprojection(
            hyps, Xw, uv, cTr, fML, m, scfg.ransac_px)
        return s.sum()

    # --- 7. local-map half ---
    @jax.jit
    def k_localmap(pT, d_map_pos, d_map_desc, d_map_normal, desc, uv):
        return tk._localmap_core(
            pT, cand_pad, cand_valid, d_map_pos, d_map_desc, d_map_normal,
            desc, uv, cur_anchor, ff1.im_valid, ff1.im_sigma2,
            rig.cam_T_ref, rig.fxycxy, rig.image_size,
            scfg.local_map_radius_px, scfg.local_map_max_dist).sum()

    # --- 8. the whole fused program for reference ---
    def _full(i, frac):
        return tk._track_and_map_step(
            jax.random.PRNGKey(i), ff1.im_desc, ff1.im_valid, cur_uv,
            cur_anchor, ff1.im_sigma2, ff1.im_point3d, ff1.im_has_depth,
            ff0.im_desc, ff0.im_valid, prev_lm_id, d_map_pos, d_map_valid,
            d_map_desc, d_map_normal, cand_pad, cand_valid,
            rig.cam_T_ref, rig.fxycxy, pred_T, scfg.ransac_hyps,
            scfg.ransac_px, scfg.inter_max_dist, scfg.inter_ratio,
            rig.image_size, scfg.local_map_radius_px,
            scfg.local_map_max_dist, scfg.track_match_radius_px,
            frac, scfg.track_fastpath_min_inliers,
        )[:21].sum()

    def k_full(i):
        return _full(i, scfg.track_fastpath_frac)

    def k_full_slow(i):
        return _full(i, 2.0)

    stages = [
        ("gate(proj dist)",
         lambda i: k_gate(pred_T, d_map_pos, prev_lm_id, cur_uv, cur_anchor)),
        ("hamming+mutual",
         lambda i: k_match(ff1.im_desc, ff1.im_valid, ff0.im_desc,
                           ff0.im_valid)),
        ("ransac_kabsch", k_kabsch),
        ("ransac_pnp", k_pnp),
        ("refine x3 (vmap)",
         lambda i: k_refine3(Xw, cur_uv, ff1.im_sigma2, inits, masks)),
        ("refine x1",
         lambda i: k_refine1(Xw, cur_uv, ff1.im_sigma2, pred_T, with_lm)),
        ("score 512 hyps", lambda i: k_score(hyps, Xw, cur_uv, with_lm)),
        ("localmap half",
         lambda i: k_localmap(pred_T, d_map_pos, d_map_desc, d_map_normal,
                              ff1.im_desc, cur_uv)),
        ("FULL fused track (prod)", k_full),
        ("FULL fused track (slow)", k_full_slow),
    ]
    for name, fn in stages:
        t = timeit(fn)
        print(f"{name:20s} {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
