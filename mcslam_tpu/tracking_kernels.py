"""Jitted device kernels of the SLAM driver: inter-frame matching + pose
estimation, local-map projection matching, pair triangulation (split out
of slam.py; same contracts)."""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from mcslam_tpu.frontend import pose_opt, ransac
from mcslam_tpu.geometry import lie, triangulation
from mcslam_tpu.ops import hamming, match as match_ops
from mcslam_tpu.ops import match_pallas


def _sched(env: str, default: str) -> tuple:
    """Per-round LM iteration schedule from an env var ("8,4" -> (8, 4)).
    Trace-time read (paired-A/B-able); the budgets are knife-edge
    load-bearing (see the NOTE in _track_core), so any non-default
    schedule must pass the full accuracy suite before adoption."""
    return tuple(
        int(x) for x in os.environ.get(env, default).split(",") if x
    )


def _fused_match() -> bool:
    """Use the single-kernel gated matcher (ops/match_pallas.py) for the
    tracking and local-map match stages. TPU only (the kernel targets the
    TPU memory model; other backends keep the XLA formulation, which is
    also the semantics reference). MCSLAM_NO_FUSED_MATCH=1 opts out for
    the paired on-chip A/B; read at trace time."""
    if os.environ.get("MCSLAM_NO_FUSED_MATCH") == "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001
        return False


# --------------------------------------------------------------------------
# jitted kernels (static shapes)
# --------------------------------------------------------------------------


@jax.jit
def _match_descriptors(desc_a, valid_a, desc_b, valid_b):
    d = hamming.hamming_matrix(desc_a, desc_b)
    return d


_GATE_BIG = 1e12


def _anchored_sq_px_dist(uv, anchor, proj, penalize):
    """Squared pixel distance from each row feature to each column
    target's projection in the row's ANCHOR camera — without ever
    materializing the (M, N, 2) per-pair gather.

    The naive form `proj[anchor]` gathers a (M, N, 2) f32 tensor
    (~100 MB at M=N=3-4k) and streams it through elementwise subtract/
    square — pure HBM traffic that dominates the tracking program. With
    one-hot anchor weights the anchored distance expands into quadratic
    terms where the anchor selection becomes a contraction:

        d2[i,j] = |uv_i|^2 - 2 * sum_ck oh[i,c] uv[i,k] proj[c,j,k]
                  + sum_c oh[i,c] (|proj_c,j|^2 + BIG*penalize[c,j])

    i.e. two MXU matmuls with tiny contraction dims (2C and C) and ONE
    (M, N) output that XLA fuses straight into the comparison consumer.

    uv: (M, 2); anchor: (M,) int32; proj: (C, N, 2) per-camera
    projections (pre-clipped to a sane pixel range); penalize: (C, N)
    bool — forces d2 to _GATE_BIG (behind camera / out of frustum).
    Returns (M, N) f32.
    """
    C = proj.shape[0]
    oh = jax.nn.one_hot(anchor, C, dtype=uv.dtype)  # (M, C)
    P2 = jnp.sum(proj * proj, axis=-1) + jnp.where(penalize, _GATE_BIG, 0.0)
    A = (oh[:, :, None] * uv[:, None, :]).reshape(uv.shape[0], 2 * C)
    B = proj.transpose(0, 2, 1).reshape(2 * C, proj.shape[1])
    return jnp.sum(uv * uv, axis=-1)[:, None] - 2.0 * (A @ B) + oh @ P2


@functools.partial(jax.jit, static_argnames=("max_dist", "ratio"))
def _mutual_match(dist, valid_a, valid_b, max_dist: int, ratio: float):
    return match_ops.match_mutual(
        dist, row_mask=valid_a, col_mask=valid_b, max_dist=max_dist, ratio=ratio
    )


def _gate_factors(
    uv, anchor, proj, penalize, row_invalid, col_invalid, col_pass=None
):
    """Low-rank factors (ahat (M, DG), bhat (DG, N)) whose product is the
    anchored squared pixel distance of _anchored_sq_px_dist PLUS validity
    bias terms, for ops/match_pallas.hamming_argmin2:

        d2_eff = d2_raw + 4*PB*row_invalid + 2*PB*col_invalid
                 - PB*col_pass                       (PB = PASS_BIAS)

    so with threshold thr2 << PB: invalid rows/columns always fail the
    gate (2*PB or 3*PB net), pass-always columns always pass (-PB
    dominates d2_raw <= ~4e10 + the 1e12 frustum penalty), and normal
    pairs gate on the true distance.
    """
    C = proj.shape[0]
    oh = jax.nn.one_hot(anchor, C, dtype=uv.dtype)  # (M, C)
    P2 = jnp.sum(proj * proj, axis=-1) + jnp.where(
        penalize, _GATE_BIG, 0.0
    )  # (C, N)
    A = (oh[:, :, None] * uv[:, None, :]).reshape(uv.shape[0], 2 * C)
    B = proj.transpose(0, 2, 1).reshape(2 * C, proj.shape[1])
    u2 = jnp.sum(uv * uv, axis=-1)
    PB = match_pallas.PASS_BIAS
    r_bias = 2.0 * PB * col_invalid.astype(jnp.float32)
    if col_pass is not None:
        r_bias = r_bias - PB * col_pass.astype(jnp.float32)
    ahat = jnp.concatenate(
        [
            -2.0 * A,
            oh,
            (u2 + 4.0 * PB * row_invalid.astype(jnp.float32))[:, None],
            jnp.ones((uv.shape[0], 1), jnp.float32),
        ],
        axis=1,
    )
    bhat = jnp.concatenate(
        [B, P2, jnp.ones((1, B.shape[1]), jnp.float32), r_bias[None, :]],
        axis=0,
    )
    return ahat, bhat


def _track_core(
    key, cur_desc, cur_valid, cur_uv, cur_anchor, cur_sigma2, cur_p3d,
    cur_has_depth, prev_desc, prev_valid, prev_lm_id, map_pos, map_valid,
    cam_T_ref_all, fxycxy_all, pred_T_wr, num_hyp: int, px: float,
    max_dist: int, ratio: float, gate_px: float = 0.0,
    fastpath_frac: float = 0.95, fastpath_min: int = 100,
):
    """Whole inter-frame tracking step on device: match -> landmark lookup
    (device map mirror) -> robust pose (3D-3D or 2D-3D picked by lax.cond)
    -> motion-only LM. One host fetch for everything downstream.

    gate_px > 0 enables search-by-projection matching (reference
    FrontEnd tracking via ORB-SLAM SearchByProjection semantics): prev
    features carrying a landmark only match current features within
    gate_px pixels of the landmark's projection under the predicted pose
    `pred_T_wr`. On repetitive/continuous texture the global
    all-vs-all match aliases badly (measured: textured-cylinder world,
    40+ landmark matches but 0-4 RANSAC inliers); the projection gate
    restores the inlier fraction. Landmark-less prev features stay
    ungated — they only seed NEW landmark triangulation, where the
    Sampson gate downstream does the filtering."""
    use_fused = _fused_match() and gate_px > 0.0
    pair_mask = None
    uvp = pen = prev_has = None
    if gate_px > 0.0:
        safe_prev = jnp.maximum(prev_lm_id, 0)
        prev_has = (prev_lm_id >= 0) & map_valid[safe_prev]
        Xp = map_pos[safe_prev]  # (Mp, 3)
        cam_T_w = jnp.einsum(
            "cij,jk->cik", cam_T_ref_all, lie.se3_inverse(pred_T_wr)
        )
        pc = (
            jnp.einsum("cij,mj->cmi", cam_T_w[:, :3, :3], Xp)
            + cam_T_w[:, None, :3, 3]
        )  # (C, Mp, 3)
        z = pc[..., 2]
        uvp = jnp.clip(
            pc[..., :2] / jnp.maximum(z[..., None], 1e-6)
            * fxycxy_all[:, None, :2] + fxycxy_all[:, None, 2:],
            -1e5, 1e5,
        )  # (C, Mp, 2)
        pen = z <= 0.05
        if not use_fused:
            d2 = _anchored_sq_px_dist(cur_uv, cur_anchor, uvp, pen)
            pair_mask = jnp.where(
                prev_has[None, :], d2 < gate_px * gate_px, True
            )
    if use_fused:
        # single-kernel gated matcher: distance matmul + gate matmul +
        # row/col argmin in one Pallas launch (no (M, N) HBM round trip)
        ahat, bhat = _gate_factors(
            cur_uv, cur_anchor, uvp, pen, ~cur_valid, ~prev_valid,
            col_pass=~prev_has,
        )
        best, second, idx, col_idx = match_pallas.hamming_argmin2(
            hamming.to_planes(cur_desc),
            hamming.to_planes(prev_desc).T,
            ahat, bhat, gate_px * gate_px, want_cols=True,
        )
        rows = jnp.arange(cur_desc.shape[0], dtype=jnp.int32)
        ok = (
            (col_idx[idx] == rows)
            & (best <= max_dist)
            & (best <= ratio * second)
            & cur_valid
        )
        res = match_ops.MatchResult(
            idx=idx, dist=best.astype(jnp.int32), ok=ok
        )
    else:
        d = hamming.hamming_matrix(cur_desc, prev_desc)
        res = match_ops.match_mutual(
            d, row_mask=cur_valid, col_mask=prev_valid, max_dist=max_dist,
            ratio=ratio, pair_mask=pair_mask,
        )
    lm = jnp.where(res.ok, prev_lm_id[res.idx], -1)
    safe = jnp.maximum(lm, 0)
    with_lm = (lm >= 0) & map_valid[safe]
    lm = jnp.where(with_lm, lm, -1)
    X_world = map_pos[safe]
    cTr = cam_T_ref_all[cur_anchor]
    f = fxycxy_all[cur_anchor]
    mask3d = with_lm & cur_has_depth
    # Candidate-portfolio pose estimation (LO-RANSAC shape). Minimal
    # solvers are individually fragile here: 3D-3D Kabsch triples amplify
    # the current frame's intra-depth noise (z^2/(f*b) — meters at room
    # scale on weak corners), and 6-point DLT-PnP degenerates when the
    # visible landmarks are quasi-planar (a wall). So BOTH run, a third
    # candidate starts from the motion-model prediction with NO sampling
    # at all (reference TrackWithMotionModel: projection-gated matches
    # straight into Huber motion-only LM), and every candidate is
    # polished by the robust chi2-regated LM. Winner = most reprojection
    # inliers over the SAME full match set — one vmapped refine, no
    # data-dependent control flow. (A loose 2.5x consensus threshold was
    # tried for the RANSAC stages and REVERTED: with the uniform
    # selection score it only admitted coarser hypotheses — VIO ATE
    # 0.10 -> 0.28, textured-world ATE 0.52 -> 0.82.)
    #
    # FAST PATH (reference structure: TrackWithMotionModel first,
    # TrackReferenceKeyFrame/relocalize only on failure): the motion
    # candidate is refined up front; when it alone explains >=
    # fastpath_frac of the landmark matches the RANSAC stages cannot
    # change the winner materially, so a lax.cond skips them entirely —
    # the hypothesis solve + (K, M) scoring is pure insurance on steady
    # frames. Weak frames take the full portfolio (which reuses the
    # already-refined motion candidate bit-for-bit).
    #
    # NOTE: the full 8x2 refine budget is load-bearing. Cheaper variants
    # all failed a suite knife-edge: portfolio rounds=1 nudges the VIO
    # blob scene over its ATE bound (0.083 vs 0.08), iters<8 breaks the
    # noisy-mono Sim(3) canary, and the local-map refine budget
    # regressed the VIO probe 0.04 -> 0.26 at iters=5. The
    # deferred-accept scan already cut the per-step cost ~40%.
    ref_pred = pose_opt.optimize_pose(
        pred_T_wr, X_world, cur_uv, cTr, f, with_lm, sigma2=cur_sigma2,
        iters=_sched("MCSLAM_REF_SCHED", "8,8"),
    )
    score_pred, _ = ransac._score_reprojection(
        ref_pred.world_T_ref[None], X_world, cur_uv, cTr, f, with_lm, px
    )
    score_pred = score_pred[0]
    n_with = jnp.sum(with_lm)
    strong = (
        (score_pred >= jnp.int32(fastpath_min))
        & (score_pred.astype(jnp.float32)
           >= fastpath_frac * n_with.astype(jnp.float32))
    )

    def _portfolio(key):
        # MCSLAM_HYPS: trace-time hypothesis-count override for the
        # paired chip A/B (a flat 512->256 config cut was tried and
        # REVERTED on the noisy-mono canary — but mono always takes the
        # portfolio through its own program, so a rig-only cut remains
        # adoptable per-config if the suite stays green)
        nh = int(os.environ.get("MCSLAM_HYPS", num_hyp))
        rr_kab = ransac.ransac_kabsch(
            key, cur_p3d, X_world, cur_uv, cTr, f, mask3d,
            num_hyp=nh, px_thresh=px,
        )
        rr_pnp = ransac.ransac_pnp(
            key, X_world, cur_uv, cTr, f, with_lm,
            num_hyp=max(nh // 2, 64), px_thresh=px,
        )
        inits = jnp.stack([rr_kab.world_T_ref, rr_pnp.world_T_ref])
        masks = jnp.stack(
            [with_lm & rr_kab.inliers, with_lm & rr_pnp.inliers]
        )
        refs = jax.vmap(
            lambda T0, m: pose_opt.optimize_pose(
                T0, X_world, cur_uv, cTr, f, m, sigma2=cur_sigma2,
                iters=_sched("MCSLAM_REF_SCHED", "8,8"),
            )
        )(inits, masks)
        # UNIFORM selection score: each candidate's refine mask is a
        # different subset of the matches, so comparing refs.num_inliers
        # biases the argmax toward the candidate with the largest mask
        # (the motion prediction, whose mask is ALL matches) — measured
        # as a 3x ATE regression on accelerating VIO scenes. Score every
        # refined pose by reprojection inliers over the SAME full match
        # set instead.
        cand_T = jnp.concatenate(
            [ref_pred.world_T_ref[None], refs.world_T_ref], axis=0
        )
        scores, _ = ransac._score_reprojection(
            cand_T, X_world, cur_uv, cTr, f, with_lm, px
        )
        best = jnp.argmax(scores)
        return cand_T[best], scores[best].astype(jnp.int32)

    T_best, n_uniform = jax.lax.cond(
        strong,
        lambda _k: (ref_pred.world_T_ref, score_pred.astype(jnp.int32)),
        _portfolio,
        key,
    )
    ref = ref_pred._replace(world_T_ref=T_best)
    rr_ok = n_uniform >= 10
    # pack EVERYTHING into one f32 vector: the host<->device tunnel charges
    # a full round trip per fetched buffer, so one buffer = one RTT
    M = lm.shape[0]
    packed = jnp.concatenate([
        ref.world_T_ref.reshape(16),
        jnp.stack([
            n_uniform.astype(jnp.float32),
            jnp.sum(res.ok).astype(jnp.float32),
            with_lm.sum().astype(jnp.float32),
            rr_ok.astype(jnp.float32),
            strong.astype(jnp.float32),  # fast path taken this frame
        ]),
        res.ok.astype(jnp.float32),
        res.idx.astype(jnp.float32),
        lm.astype(jnp.float32),
    ])
    return packed, ref.world_T_ref


def _localmap_core(
    T_wr, cand_ids, cand_valid, map_pos, map_desc, map_normal, im_desc,
    im_uv, im_anchor, im_valid, im_sigma2, cam_T_ref, fxycxy, image_wh,
    radius: float, max_dist: int,
):
    """Local-map tracking fully on device: gather candidate landmarks from
    the HBM mirror, projection-gated matching, pose refine. Returns
    (pose, lm_match ids (M,), inliers (M,)) for one host fetch."""
    lm_pos = map_pos[cand_ids]
    lm_desc = map_desc[cand_ids]
    lm_normal = map_normal[cand_ids]
    res = _project_and_match_local(
        T_wr, lm_pos, lm_desc, cand_valid, im_desc, im_uv, im_anchor,
        im_valid, cam_T_ref, fxycxy, image_wh, radius, max_dist,
        lm_normal=lm_normal,
    )
    lm = jnp.where(res.ok, cand_ids[res.idx], -1)
    sel = lm >= 0
    X_world = map_pos[jnp.maximum(lm, 0)]
    cTr = cam_T_ref[im_anchor]
    f = fxycxy[im_anchor]
    # T_wr already went through the portfolio refine, so this pass starts
    # inside the basin and only folds in the local-map matches; both
    # re-gate rounds are kept (new matches need the chi2 cleanup).
    # Schedule note: a flat iters=5 cut was tried and REVERTED (VIO probe
    # 0.04 -> 0.26); asymmetric schedules via MCSLAM_LMAP_SCHED are the
    # round-5 A/B vehicle, full-suite accuracy-gated before adoption.
    ref = pose_opt.optimize_pose(
        T_wr, X_world, im_uv, cTr, f, sel, sigma2=im_sigma2,
        iters=_sched("MCSLAM_LMAP_SCHED", "8,8"),
    )
    lm_out = jnp.where(ref.inliers, lm, -1)
    # single packed buffer -> single tunnel round trip
    return jnp.concatenate([
        ref.world_T_ref.reshape(16),
        lm_out.astype(jnp.float32),
        ref.inliers.astype(jnp.float32),
    ])


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_hyp", "px", "max_dist", "ratio", "image_wh", "lm_radius",
        "lm_max_dist", "gate_px", "fastpath_frac", "fastpath_min",
    ),
)
def _track_and_map_step(
    key, cur_desc, cur_valid, cur_uv, cur_anchor, cur_sigma2, cur_p3d,
    cur_has_depth, prev_desc, prev_valid, prev_lm_id, map_pos, map_valid,
    map_desc, map_normal, cand_ids, cand_valid,
    cam_T_ref_all, fxycxy_all, pred_T_wr, num_hyp: int, px: float,
    max_dist: int, ratio: float, image_wh=None, lm_radius: float = 15.0,
    lm_max_dist: int = 64, gate_px: float = 0.0,
    fastpath_frac: float = 0.95, fastpath_min: int = 100,
):
    """Inter-frame tracking + local-map tracking as ONE program with ONE
    packed output: the tunneled relay charges a ~20 ms host round trip per
    fetch, so the two-dispatch/two-fetch frame structure paid a full extra
    RTT every frame. The local-map half consumes the tracking pose without
    it ever visiting the host; the host applies its acceptance gates to
    the combined buffer afterwards (a failed track simply ignores the
    local-map section). Candidate landmark ids are pose-independent
    (covisible set of recent keyframes), so they are known pre-dispatch.
    """
    track_packed, pose = _track_core(
        key, cur_desc, cur_valid, cur_uv, cur_anchor, cur_sigma2, cur_p3d,
        cur_has_depth, prev_desc, prev_valid, prev_lm_id, map_pos,
        map_valid, cam_T_ref_all, fxycxy_all, pred_T_wr, num_hyp, px,
        max_dist, ratio, gate_px, fastpath_frac, fastpath_min,
    )
    lm_packed = _localmap_core(
        pose, cand_ids, cand_valid, map_pos, map_desc, map_normal,
        cur_desc, cur_uv, cur_anchor, cur_valid, cur_sigma2,
        cam_T_ref_all, fxycxy_all, image_wh, lm_radius, lm_max_dist,
    )
    return jnp.concatenate([track_packed, lm_packed])


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_points", "num_levels", "fast_threshold", "min_threshold",
        "max_intra", "min_z", "max_z", "angle_bins", "approx_topk",
        "num_hyp", "px", "max_dist", "ratio", "image_wh", "lm_radius",
        "lm_max_dist", "gate_px", "fastpath_frac", "fastpath_min",
    ),
)
def _build_and_track_step(
    key, imgs, rig, prev_desc, prev_valid, prev_lm_id, map_pos, map_valid,
    map_desc, map_normal, cand_ids, cand_valid, pred_T_wr, *,
    num_points: int, num_levels: int, fast_threshold: float,
    min_threshold: float, max_intra: int, min_z: float, max_z: float,
    angle_bins: int, approx_topk: bool,
    num_hyp: int, px: float, max_dist: int, ratio: float, image_wh,
    lm_radius: float, lm_max_dist: int, gate_px: float,
    fastpath_frac: float, fastpath_min: int,
):
    """Frame build (stage A) + inter-frame/local-map tracking (stage B) as
    ONE device program: extraction -> intra-match -> triangulate ->
    projection-gated match -> pose portfolio -> local-map track, with one
    dispatch and one packed host fetch per frame. The round-4 chip
    bisection put the tunnel's per-dispatch floor at ~1 ms and the A/B
    program boundary paid it (plus an HBM round trip of the frame arrays)
    every frame; the tracking consumes the freshly built frame without it
    ever leaving the program. The reference couples the same stages inside
    one thread (FrontEnd::trackFrame consuming extractFeaturesParallel's
    output, /root/reference/MCSlam/src/FrontEnd.cpp); here the coupling is
    the XLA program boundary instead.

    Returns (kps, xy_ud, groups, tri, packed): the frame pieces stay on
    device for keyframe insertion (frame.assemble_frame); `packed` has the
    same layout _track_and_map_step produces.
    """
    from mcslam_tpu.frontend import frame as frame_mod

    kps, xy_ud, groups, tri = frame_mod._fused_stage.__wrapped__(
        imgs, rig, None, num_points, num_levels, fast_threshold,
        min_threshold, max_intra, min_z, max_z, angle_bins, approx_topk,
    )
    X, has_depth, anchor_cam, uv_ref, anchor_sigma2, _n_rays = tri
    track_packed, pose = _track_core(
        key, groups.desc, groups.valid, uv_ref, anchor_cam, anchor_sigma2,
        X, has_depth, prev_desc, prev_valid, prev_lm_id, map_pos,
        map_valid, rig.cam_T_ref, rig.fxycxy, pred_T_wr, num_hyp, px,
        max_dist, ratio, gate_px, fastpath_frac, fastpath_min,
    )
    lm_packed = _localmap_core(
        pose, cand_ids, cand_valid, map_pos, map_desc, map_normal,
        groups.desc, uv_ref, anchor_cam, groups.valid, anchor_sigma2,
        rig.cam_T_ref, rig.fxycxy, image_wh, lm_radius, lm_max_dist,
    )
    return kps, xy_ud, groups, tri, jnp.concatenate([track_packed, lm_packed])


@functools.partial(jax.jit, static_argnames=("radius", "max_dist"))
def _project_and_match_local(
    T_wr, lm_pos, lm_desc, lm_valid, im_desc, im_uv, im_anchor, im_valid,
    cam_T_ref, fxycxy, image_wh, radius: float, max_dist: int,
    lm_normal=None, min_view_cos: float = 0.5,
):
    """Project candidate landmarks into the rig and match to current
    intra-features with frustum + pixel-radius + viewing-normal gates
    (searchLocalMap2 equivalent, FrontEnd.cpp:4901: landmarks are only
    matched when the current viewing ray agrees with the stored normal)."""
    # landmarks into every camera: (L, C, 2)
    rTw = lie.se3_inverse(T_wr)
    p_ref = lie.se3_apply(rTw, lm_pos)  # (L, 3)
    p_cam = lie.se3_apply(cam_T_ref[None], p_ref[:, None])  # (L, C, 3)
    z = p_cam[..., 2]
    zs = jnp.where(z > 0.05, z, 1.0)
    proj = p_cam[..., :2] / zs[..., None] * fxycxy[None, :, :2] + fxycxy[None, :, 2:]
    w, h = image_wh
    vis = (
        (z > 0.05)
        & (proj[..., 0] >= 0) & (proj[..., 0] < w)
        & (proj[..., 1] >= 0) & (proj[..., 1] < h)
    )  # (L, C)
    if lm_normal is not None:
        # viewing-normal gate: ray from the rig center to the landmark
        # must agree with the running-average normal (reference
        # Landmark::updateNormal + searchLocalMap2 cone check)
        view = lm_pos - T_wr[:3, 3][None]
        view = view / jnp.maximum(
            jnp.linalg.norm(view, axis=-1, keepdims=True), 1e-9
        )
        has_n = jnp.linalg.norm(lm_normal, axis=-1) > 1e-6
        cosv = jnp.sum(view * lm_normal, axis=-1)
        vis = vis & (((cosv > min_view_cos) | ~has_n))[:, None]
    # per current feature: distance to its anchor camera's projection of
    # each landmark — matmul form, no (M, L, 2) gather (see
    # _anchored_sq_px_dist; the gather form cost ~100 MB of HBM traffic)
    proj_c = jnp.clip(proj.transpose(1, 0, 2), -1e5, 1e5)
    pen = ~vis.transpose(1, 0)
    if _fused_match():
        ahat, bhat = _gate_factors(
            im_uv, im_anchor, proj_c, pen, ~im_valid, ~lm_valid
        )
        best, second, idx, _ = match_pallas.hamming_argmin2(
            hamming.to_planes(im_desc),
            hamming.to_planes(lm_desc).T,
            ahat, bhat, radius * radius, want_cols=False,
        )
        ok = (best <= max_dist) & (best <= second) & im_valid
        return match_ops.MatchResult(
            idx=idx, dist=best.astype(jnp.int32), ok=ok
        )
    d2 = _anchored_sq_px_dist(im_uv, im_anchor, proj_c, pen)
    close = d2 < radius * radius
    dmat = hamming.hamming_matrix(im_desc, lm_desc)
    res = match_ops.match_one_way(
        dmat,
        row_mask=im_valid,
        col_mask=lm_valid,
        max_dist=max_dist,
        pair_mask=close,
    )
    return res


@jax.jit
def _triangulate_pairs(wTc_rays, uv_rays, f_rays, mask_rays, sigma_rays):
    return triangulation.triangulate_and_refine(
        wTc_rays, uv_rays, f_rays, mask_rays, sigma=sigma_rays,
        min_z=0.1, max_z=100.0,
    )


@functools.partial(jax.jit, static_argnames=("min_z", "max_z"))
def _triangulate_pairs_far(wTc_rays, uv_rays, f_rays, mask_rays, sigma_rays,
                           min_z: float, max_z: float):
    """Pair triangulation with a caller-chosen depth ceiling (the 17-pt
    distant-scene bootstrap seeds landmarks well beyond the tracking-time
    100 m cap)."""
    return triangulation.triangulate_and_refine(
        wTc_rays, uv_rays, f_rays, mask_rays, sigma=sigma_rays,
        min_z=min_z, max_z=max_z,
    )


