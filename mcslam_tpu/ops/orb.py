"""Oriented-BRIEF (ORB-class) feature extraction, fully batched on device.

Replaces (WHAT) the reference's vendored ORB-SLAM3 extractor
(/root/reference/MCSlam/src/ORBextractor.cpp: operator() at :1085,
IC_Angle :75, computeOrbDescriptor :106) with a TPU-native design:

  * multi-scale pyramid: per-level dense FAST score maps (fast.py)
  * spatial balancing: grid top-k (topk_grid.py) instead of quad-tree
  * orientation: intensity-centroid moments computed for ALL pixels at once
    as a 2-channel 31x31 convolution (MXU), then gathered per keypoint --
    no per-keypoint patch loops
  * descriptor: 256 Gaussian-distributed point pairs, steered by the patch
    angle, sampled with one (N, 512) gather from the blurred level image

The 256-pair sampling pattern is generated deterministically from a fixed
seed (classic BRIEF recipe: N(0, (patch/5)^2) clipped to the patch) rather
than copying OpenCV's learned table; descriptors are therefore self-
consistent within this framework (vocabulary, matching, loop closure all use
the same pattern) but not bit-compatible with OpenCV ORB.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mcslam_tpu.ops import fast as fast_ops
from mcslam_tpu.ops import hamming, image as image_ops, topk_grid

PATCH_RADIUS = 15  # IC-angle circular patch radius (31x31 patch)
EDGE = 19  # keep-out border for orientation/descriptor sampling


@functools.lru_cache(maxsize=None)
def brief_pattern(seed: int = 7, bits: int = 256) -> np.ndarray:
    """(bits, 2, 2) int32 array of (p, q) offsets, each (dx, dy) in [-13, 13].

    13 = PATCH_RADIUS - 2 keeps rotated samples inside the 31x31 patch for
    any angle (13 * sqrt(2) < 19-edge margin handles the rest).
    """
    rng = np.random.RandomState(seed)
    sigma = PATCH_RADIUS / 5.0 * 2.0
    pts = np.clip(np.round(rng.randn(bits, 2, 2) * sigma), -13, 13)
    return pts.astype(np.int32)


PATCH = 39  # patch window: covers rotated BRIEF offsets (±13·√2 < 19)
PATCH_R = PATCH // 2


@functools.lru_cache(maxsize=None)
def _circle_weights() -> tuple[np.ndarray, np.ndarray]:
    """(PATCH, PATCH) x/y weight masks of the IC-angle circular patch."""
    r = PATCH_RADIUS
    ys, xs = np.mgrid[-PATCH_R : PATCH_R + 1, -PATCH_R : PATCH_R + 1]
    circle = (xs * xs + ys * ys) <= r * r
    return (
        (xs * circle).astype(np.float32),
        (ys * circle).astype(np.float32),
    )


def extract_patches(img: jax.Array, yx: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(H, W) image + (N, 2) int yx -> ((N, PATCH, PATCH) patches,
    (N, 2) patch-origin yx).

    Contiguous dynamic-slice per keypoint: measured ~3x faster on TPU than
    point-gathering descriptor samples from the full image; every later
    per-keypoint computation (orientation moments, steered BRIEF) becomes
    patch-local with zero global memory traffic.
    """
    h, w = img.shape
    y0 = jnp.clip(yx[:, 0] - PATCH_R, 0, h - PATCH)
    x0 = jnp.clip(yx[:, 1] - PATCH_R, 0, w - PATCH)

    def slc(y, x):
        return jax.lax.dynamic_slice(img, (y, x), (PATCH, PATCH))

    patches = jax.vmap(slc)(y0, x0)
    return patches, jnp.stack([y0, x0], axis=-1)


def extract_patches_indexed(
    imgs: jax.Array,  # (B, H, W)
    yx: jax.Array,  # (T, 2) int
    img_idx: jax.Array,  # (T,) int source image per keypoint
) -> tuple[jax.Array, jax.Array]:
    """Flat-list patch extraction: each keypoint names its source image
    (post-compaction lists mix pyramid levels). XLA fallback for
    patch_pallas.extract_patches_indexed_pallas."""
    _, h, w = imgs.shape
    y0 = jnp.clip(yx[:, 0] - PATCH_R, 0, h - PATCH)
    x0 = jnp.clip(yx[:, 1] - PATCH_R, 0, w - PATCH)

    def slc(i, y, x):
        return jax.lax.dynamic_slice(imgs, (i, y, x), (1, PATCH, PATCH))[0]

    patches = jax.vmap(slc)(img_idx, y0, x0)
    return patches, jnp.stack([y0, x0], axis=-1)


@functools.lru_cache(maxsize=None)
def _moment_weight_matrix() -> np.ndarray:
    """(PATCH*PATCH, 2) [kx | ky] stacked circular-moment weights."""
    kx, ky = _circle_weights()
    return np.stack([kx.reshape(-1), ky.reshape(-1)], axis=-1)


def patch_orientation(patches: jax.Array, center_yx: jax.Array,
                      origin_yx: jax.Array) -> jax.Array:
    """IC angle from patch moments as ONE (N, P^2) @ (P^2, 2) matmul.

    The einsum-reduction form lowered to a slow VPU reduction (~0.67 ms
    for 7k patches on v5e); as a dot_general the op is HBM-trivial. The
    circular mask is centered: border keypoints are rejected upstream by
    the EDGE margin, so the patch is never clamped against the keypoint.
    """
    W = jnp.asarray(_moment_weight_matrix()).astype(patches.dtype)
    flat = patches.reshape(patches.shape[0], PATCH * PATCH)
    m = jax.lax.dot_general(
        flat, W, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jnp.arctan2(m[:, 1], m[:, 0])


ANGLE_BINS = 32  # steering quantization: 11.25 deg granularity


@functools.lru_cache(maxsize=None)
def _steered_bit_matrices(bins: int = ANGLE_BINS) -> np.ndarray:
    """(bins * 256, PATCH*PATCH) sparse ±1 matrices: row (b*256+s) has +1 at
    the rotated q-sample position and -1 at the p position for angle bin b,
    so bit = (D @ patch_flat) > 0. Turns steered-BRIEF sampling into one
    dense matmul on the MXU instead of 2M random gathers (~20x faster on
    v5e than the gather formulation)."""
    pat = brief_pattern().astype(np.float64)  # (256, 2, 2) (dx, dy)
    D = np.zeros((bins * 256, PATCH * PATCH), np.float32)
    c0 = PATCH_R
    for b in range(bins):
        a = 2.0 * np.pi * b / bins
        ca, sa = np.cos(a), np.sin(a)
        dx = pat[..., 0]
        dy = pat[..., 1]
        rx = np.round(ca * dx - sa * dy).astype(int)  # (256, 2)
        ry = np.round(sa * dx + ca * dy).astype(int)
        rx = np.clip(rx + c0, 0, PATCH - 1)
        ry = np.clip(ry + c0, 0, PATCH - 1)
        for s in range(256):
            row = b * 256 + s
            D[row, ry[s, 0] * PATCH + rx[s, 0]] += -1.0  # p sample
            D[row, ry[s, 1] * PATCH + rx[s, 1]] += 1.0  # q sample
    return D


def compute_descriptors_patch(
    patches: jax.Array,  # (N, PATCH, PATCH)
    center_in_patch: jax.Array,  # (N, 2) float (y, x) of kp within patch
    angle: jax.Array,  # (N,)
    angle_bins: int = ANGLE_BINS,
) -> jax.Array:
    """Steered BRIEF-256 as an MXU matmul -> (N, 8) packed uint32.

    All angle bins are evaluated in one (N, PATCH^2) x (PATCH^2, bins*256)
    bf16 matmul; the keypoint's bin selects its 256-bit slice. bf16 is safe:
    bits depend only on the SIGN of an intensity difference, and image
    intensities are O(1).
    """
    D = jnp.asarray(_steered_bit_matrices(angle_bins)).astype(jnp.bfloat16)
    n = patches.shape[0]
    flat = patches.reshape(n, PATCH * PATCH).astype(jnp.bfloat16)
    diffs = jax.lax.dot_general(
        flat, D,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (N, bins*256)
    # threshold IMMEDIATELY: only the sign survives, and XLA fuses the
    # compare into the matmul epilogue — the (N, bins*256) intermediate
    # materializes as 1-byte bools instead of f32 (4x less HBM traffic,
    # the dominant cost of this stage)
    bits_all = (diffs > 0).reshape(n, angle_bins, 256)
    two_pi = 2.0 * np.pi
    b = jnp.round(
        (jnp.mod(angle, two_pi) / two_pi) * angle_bins
    ).astype(jnp.int32) % angle_bins
    sel = jnp.take_along_axis(bits_all, b[:, None, None], axis=1)[:, 0, :]
    return hamming.pack_bits(sel.astype(jnp.uint32))


class Keypoints(NamedTuple):
    """Fixed-capacity keypoint set for one camera image (padded + masked)."""

    xy: jax.Array  # (N, 2) float32, level-0 pixel coords (x, y)
    response: jax.Array  # (N,) float32
    angle: jax.Array  # (N,) float32 radians
    octave: jax.Array  # (N,) int32 pyramid level
    sigma2: jax.Array  # (N,) float32 scale^2*octave measurement variance factor
    desc: jax.Array  # (N, 8) uint32 packed BRIEF-256
    valid: jax.Array  # (N,) bool


@functools.lru_cache(maxsize=None)
def _level_budget(total: int, num_levels: int, scale: float) -> tuple:
    """Per-level keypoint budget, geometric decay like the reference."""
    inv = 1.0 / scale
    raw = np.array([inv**l for l in range(num_levels)])
    raw = raw / raw.sum() * total
    counts = np.maximum(8, np.round(raw).astype(int))
    # fix rounding drift on level 0
    counts[0] += total - counts.sum()
    return tuple(int(c) for c in counts)


def _select_from_cells(cand_v, cand_rid, maxb: int, *, per_cell: int,
                       cell: int, ncx: int, approx: bool):
    """Global top-N over the select-fused kernel's per-cell candidates
    (fast_pallas.fast_select_pallas). The kernel already applied the
    interior mask + rank bonus; candidate flattening is (cell
    raster-major, knockout-round-minor) — the same order
    topk_grid.select_keypoints uses, so tie-breaking matches the XLA
    chain exactly (proven by
    tests/test_ops.py::test_fast_select_pallas_matches_xla_selection).
    Returns (yx (LC, maxb, 2) int32, resp, valid) like select_keypoints.
    """
    LC = cand_v.shape[0]
    flat_v = cand_v.reshape(LC, -1)
    flat_r = cand_rid.reshape(LC, -1)
    n = min(maxb, flat_v.shape[1])
    if approx and n < flat_v.shape[1]:
        resp, arg = jax.lax.approx_max_k(flat_v, n, recall_target=0.98)
    else:
        resp, arg = jax.lax.top_k(flat_v, n)
    g = arg // per_cell
    rid = jnp.take_along_axis(flat_r, arg, axis=1)
    valid = resp > 0.0
    ys = jnp.where(valid, (g // ncx) * cell + rid // cell, 0)
    xs = jnp.where(valid, (g % ncx) * cell + rid % cell, 0)
    yx = jnp.stack([ys, xs], axis=-1).astype(jnp.int32)
    if n < maxb:
        pad = maxb - n
        yx = jnp.pad(yx, ((0, 0), (0, pad), (0, 0)))
        resp = jnp.pad(resp, ((0, 0), (0, pad)))
        valid = jnp.pad(valid, ((0, 0), (0, pad)))
    return yx, resp, valid


def _use_pallas() -> bool:
    # the Pallas kernels here are written for the TPU memory model; any
    # other backend (cpu, gpu) takes the XLA path
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001
        return False


def extract_orb_rig(
    imgs: jax.Array,
    num_points: int = 1024,
    num_levels: int = 8,
    scale: float = 1.2,
    fast_threshold: float = 20.0 / 255.0,
    min_threshold: float = 7.0 / 255.0,
    cell: int = 16,
    per_cell: int = 4,
    angle_bins: int = ANGLE_BINS,
    # ApproxTopK global selection by default: ~2x cheaper frame build on
    # TPU (recall_target 0.98); validated at equal ATE on the textured
    # hard-world drive ON the real chip (exact 0.271 vs approx 0.205,
    # same keyframes/loop/failures). CPU lowers to exact top_k, so CPU
    # test semantics are unchanged. Pass False for bit-exact selection.
    approx_topk: bool = True,
) -> Keypoints:
    """Camera-batched multi-scale ORB: imgs (C, H, W) float32 in [0, 1] ->
    Keypoints with leading camera axis. The rig axis replaces the
    reference's per-camera std::thread fork-join
    (MultiCameraFrame::extractFeaturesParallel, MultiCameraFrame.cpp:203).

    The two-threshold policy mirrors the reference (iniThFAST with minThFAST
    fallback, ORBextractor.cpp:780): scores at the low threshold, selection
    rank-boosts corners passing the high threshold. On TPU the FAST+NMS
    stage runs as a fused Pallas kernel.
    """
    budgets = _level_budget(num_points, num_levels, scale)
    maxb = max(budgets)
    levels = image_ops.build_pyramid(imgs, num_levels, scale)
    C = imgs.shape[0]
    L = num_levels
    H0, W0 = levels[0].shape[-2:]
    hw = [(lv.shape[-2], lv.shape[-1]) for lv in levels]

    # ALL pyramid levels zero-padded to the level-0 shape and stacked into
    # one (L*C, H0, W0) batch: one blur, one FAST launch, one top-k, one
    # patch-DMA pass, one orientation reduction, one descriptor matmul —
    # instead of L copies of each (the per-level graph paid ~2x in launch
    # overhead and lost cross-level parallelism; padding costs ~1.6x pixel
    # work on dense stages, a clear win on measurement)
    # edge-replicate padding: zero padding would bleed darkness through
    # the blur into the last ~3 true rows/cols of every level > 0 and
    # corrupt border keypoints' descriptors (scores in the padded region
    # itself are masked off below)
    stacked = jnp.concatenate(
        [
            jnp.pad(lv, ((0, 0), (0, H0 - h), (0, W0 - w)), mode="edge")
            for lv, (h, w) in zip(levels, hw)
        ],
        axis=0,
    )
    h_l = jnp.repeat(jnp.asarray([h for h, _ in hw], jnp.int32), C)
    w_l = jnp.repeat(jnp.asarray([w for _, w in hw], jnp.int32), C)
    if _use_pallas():
        from mcslam_tpu.ops.fast_pallas import fast_corners_pallas

        # per-image true heights let the kernel skip row tiles that lie
        # entirely in a level's edge-padding (their scores are zeroed by
        # the interior mask below anyway); MCSLAM_FAST_NO_HSKIP=1 is the
        # on-chip A/B + fallback
        hskip = os.environ.get("MCSLAM_FAST_NO_HSKIP", "0") != "1"
        # fused blur: the FAST kernel's row-band DMA also emits the
        # separable 7-tap blur (ops/fast_pallas._blur_band), replacing
        # gaussian_blur's two f32 (H, H)/(W, W) banded MXU matmuls — the
        # most FLOP-heavy op of the frame build at O(H) band work per
        # 7-tap output. MCSLAM_NO_FUSED_BLUR=1 restores the banded-matmul
        # pass for the paired chip A/B.
        fuse_blur = os.environ.get("MCSLAM_NO_FUSED_BLUR", "0") != "1"
        # in-kernel selection (DEFAULT ON): the same launch also applies
        # the interior mask + rank bonus and emits exact per-cell top-k
        # candidates from the VMEM-resident score tile — the dense score
        # map never visits HBM and the XLA selection chain's strided
        # transpose + knockout passes (largest stage-A sub-kernel,
        # round-4 chip bisection) disappear. Adopted from the round-5
        # paired chip A/B: -0.477 ms [-0.559, -0.393] on the frame build
        # (docs/onchip_r05/ab_paired6.out). Selection is bit-identical to
        # the XLA chain under exact top-k (test_fast_select_pallas_
        # matches_xla_selection); under ApproxTopK only the flat
        # candidate-list length differs (padded-height cells), the same
        # boundary-recall class as the approx_topk adoption itself.
        # MCSLAM_NO_SEL_INKERNEL=1 restores the XLA selection chain
        # (the adoption A/B ran under the pre-flip opt-in name
        # MCSLAM_SEL_INKERNEL).
        sel_ik = fuse_blur and os.environ.get(
            "MCSLAM_NO_SEL_INKERNEL", "0") != "1"
        score = None
        if sel_ik:
            from mcslam_tpu.ops.fast_pallas import fast_select_pallas

            # MCSLAM_FAST_TILE_H: row-tile height knob (fewer, taller
            # tiles amortize per-grid-step overheads of the arc trees;
            # must be a multiple of `cell`). Default 96 from the round-5
            # paired chip sweep (ab_paired10/11.out): 32 is +0.19 ms vs
            # 64, 96 is -0.148 ms [-0.185, -0.048] (and divides VGA's 480
            # rows exactly, so the last tile carries no pad rows); 128
            # exceeds the 16 MB scoped-VMEM limit at the 16-image
            # 4-cam/4-level stack (compile-time OOM by 192 KB).
            tile_h = int(os.environ.get("MCSLAM_FAST_TILE_H", "96"))
            blurred, cand_v, cand_rid = fast_select_pallas(
                stacked, min_threshold, fast_threshold, h_l, w_l,
                taps=image_ops._np_gaussian_taps(7, 2.0),
                cell=cell, k=per_cell, tile_h=tile_h,
            )
        elif fuse_blur:
            score, blurred = fast_corners_pallas(
                stacked, min_threshold, heights=h_l if hskip else None,
                taps=image_ops._np_gaussian_taps(7, 2.0),
            )
        else:
            blurred = image_ops.gaussian_blur(stacked, 7, 2.0)
            score = fast_corners_pallas(
                stacked, min_threshold, heights=h_l if hskip else None
            )
    else:
        blurred = image_ops.gaussian_blur(stacked, 7, 2.0)
        score = fast_ops.fast_corners(stacked, min_threshold)
    if score is None:
        yx, resp, valid = _select_from_cells(
            cand_v, cand_rid, maxb, per_cell=per_cell, cell=cell,
            ncx=(-(-W0 // 128) * 128) // cell, approx=approx_topk,
        )
    else:
        # mask scores outside each level's TRUE bounds (the kernel's
        # interior mask only knows the padded shape)
        yy = jnp.arange(H0, dtype=jnp.int32)[None, :, None]
        xx = jnp.arange(W0, dtype=jnp.int32)[None, None, :]
        interior = (yy < (h_l[:, None, None] - fast_ops.BORDER)) & (
            xx < (w_l[:, None, None] - fast_ops.BORDER)
        )
        score = jnp.where(interior, score, 0.0)
        # prefer corners passing the high threshold: add a rank bonus
        score = jnp.where(score > fast_threshold, score + 1.0, score)
        # response-SORTED global selection: a threshold+compaction variant
        # was tried and reverted — on plateau-heavy scenes its tie-breaking
        # picks different keypoints as content shifts cells between frames,
        # which destabilizes tracking (ATE 0.07 -> 3.2 on the blob-image
        # loop run).
        # MCSLAM_SEL_SUBCELL=1 swaps in the transpose-free subcell-max form
        # (topk_grid.select_keypoints_subcell), built as an A/B vehicle for
        # the selection chain (largest stage-A sub-kernel, round-4
        # bisection). REJECTED by the round-5 paired chip A/B: +0.350 ms
        # [+0.244, +0.391] on the frame build
        # (docs/onchip_r05/ab_paired1.out) — the per_sub knockout rounds
        # cost more than the transpose they avoid — and it also degrades
        # easy-blob ATE (0.054 -> 0.094/0.114). Kept only as the A/B
        # vehicle.
        if os.environ.get("MCSLAM_SEL_SUBCELL", "0") == "1":
            yx, resp, valid = jax.vmap(
                lambda sc: topk_grid.select_keypoints_subcell(
                    sc, maxb, sub=max(4, cell // 2), approx=approx_topk
                )
            )(score)
        else:
            yx, resp, valid = jax.vmap(
                lambda sc: topk_grid.select_keypoints(
                    sc, maxb, cell=cell, per_cell=per_cell, approx=approx_topk
                )
            )(score)
    resp = jnp.where(resp > 1.0, resp - 1.0, resp)  # undo rank bonus
    # per-level quota: top_k is response-sorted, so the quota is a prefix
    budget_arr = jnp.repeat(jnp.asarray(budgets, jnp.int32), C)
    valid = valid & (
        jnp.arange(maxb, dtype=jnp.int32)[None, :] < budget_arr[:, None]
    )
    inb = (
        (yx[..., 0] >= EDGE)
        & (yx[..., 0] < h_l[:, None] - EDGE)
        & (yx[..., 1] >= EDGE)
        & (yx[..., 1] < w_l[:, None] - EDGE)
    )
    valid = valid & inb

    # slot metadata at (L*C, maxb): level-0 coords, octave, variance
    # factor, source-image index into the stacked/blurred batch
    s_lvl = jnp.asarray(
        [scale**lvl for lvl in range(L)], jnp.float32
    )  # (L,)
    xy_lvl = jnp.stack([yx[..., 1], yx[..., 0]], axis=-1).astype(jnp.float32)
    xy0 = (
        xy_lvl.reshape(L, C, maxb, 2) * s_lvl[:, None, None, None]
    ).reshape(L * C, maxb, 2)
    octv = jnp.broadcast_to(
        jnp.arange(L, dtype=jnp.int32)[:, None, None], (L, C, maxb)
    ).reshape(L * C, maxb)
    sigma2 = jnp.broadcast_to(
        (s_lvl**2)[:, None, None], (L, C, maxb)
    ).reshape(L * C, maxb)
    img_idx = jnp.broadcast_to(
        jnp.arange(L * C, dtype=jnp.int32)[:, None], (L * C, maxb)
    )

    def merge(x):
        # (L*C, maxb, ...) -> (C, L*maxb, ...), level-major slot order
        x = x.reshape(L, C, maxb, *x.shape[2:])
        return jnp.moveaxis(x, 1, 0).reshape(C, L * maxb, *x.shape[3:])

    if os.environ.get("MCSLAM_LATE_COMPACT", "0") == "1":
        # reference ordering for A/B: descriptors for ALL L*maxb slots,
        # compaction after (the pre-round-4 formulation)
        return _finish_late_compact(
            blurred, yx, resp, valid, xy0, octv, sigma2, merge, C, maxb,
            num_points, angle_bins,
        )

    # EARLY cross-level compaction: the per-level quota pads each level
    # to maxb slots (L*maxb ~ 1.3x num_points at the production shape),
    # and the late formulation paid patch DMA + moment matmul + BRIEF
    # matmul for padding it then threw away. Selection rule and slot
    # ordering are IDENTICAL to the late top-k (same prio, same merged
    # order), so the surviving keypoints and their descriptors are
    # unchanged; only dead work is removed.
    yxm = merge(yx)
    resp_m = merge(resp)
    valid_m = merge(valid)
    img_m = merge(img_idx)
    octv_m = merge(octv)
    sig2_m = merge(sigma2)
    xy0_m = merge(xy0)
    M = L * maxb
    n_out = min(num_points, M)
    if M > n_out:
        prio = jnp.where(valid_m, resp_m + 1e3, -1.0)
        _, top = jax.lax.top_k(prio, n_out)  # (C, n_out)

        def take(a):
            return jnp.take_along_axis(
                a, top.reshape(C, n_out, *([1] * (a.ndim - 2))), axis=1
            )

        yxm, resp_m, valid_m, img_m, octv_m, sig2_m, xy0_m = (
            take(yxm), take(resp_m), take(valid_m), take(img_m),
            take(octv_m), take(sig2_m), take(xy0_m),
        )

    # patch-local orientation + descriptors (one contiguous window per
    # keypoint; no dense conv, no global point gathers).
    # bf16 patches were tried (halve the DMA band traffic) and REVERTED:
    # the descriptor matmul already ran bf16 so the bits only move
    # through the ORIENTATION — bf16 moment rounding flips the steering
    # bin for the few-percent of keypoints near a bin boundary, whose
    # descriptors then decorrelate across views. Measured: loop-retrieval
    # recall on the hard-mode corpus 0.77 -> 0.567 (precision held).
    # Orientation quality is load-bearing; patches stay f32.
    T = C * n_out
    flat_yx = yxm.reshape(T, 2)
    flat_img = img_m.reshape(T)
    if _use_pallas():
        from mcslam_tpu.ops.patch_pallas import (
            extract_patches_indexed_pallas, extract_patches_oriented_pallas)

        # MCSLAM_FUSED_ORIENT=1: the patch-DMA kernel also computes the
        # IC moments on the register-resident f32 patch and emits the
        # patch bf16 (its only consumer, the steered-BRIEF matmul, casts
        # to bf16 anyway) — drops the orientation matmul pass and halves
        # the patch HBM traffic. NOTE this is NOT the reverted
        # bf16-patches experiment above: the moments stay f32 in-kernel,
        # so the steering-bin failure mode that killed loop recall
        # (0.77 -> 0.567) does not apply; only the f32 reduce ORDER
        # differs (VPU tree vs MXU dot), ULP-level.
        if os.environ.get("MCSLAM_FUSED_ORIENT", "0") == "1":
            patches, m, origin = extract_patches_oriented_pallas(
                blurred, flat_yx, flat_img
            )
            ang = jnp.arctan2(m[:, 1], m[:, 0])
        else:
            patches, origin = extract_patches_indexed_pallas(
                blurred, flat_yx, flat_img
            )
            ang = patch_orientation(patches, flat_yx, origin)
    else:
        patches, origin = extract_patches_indexed(blurred, flat_yx, flat_img)
        ang = patch_orientation(patches, flat_yx, origin)
    desc = compute_descriptors_patch(
        patches, (flat_yx - origin).astype(jnp.float32), ang, angle_bins
    )
    return Keypoints(
        xy=xy0_m,
        response=resp_m,
        angle=ang.reshape(C, n_out),
        octave=octv_m,
        sigma2=sig2_m,
        desc=desc.reshape(C, n_out, 8),
        valid=valid_m,
    )


def _finish_late_compact(blurred, yx, resp, valid, xy0, octv, sigma2, merge,
                         C, maxb, num_points, angle_bins):
    """Pre-round-4 tail of extract_orb_rig (descriptors for all slots,
    top-k compaction after). Kept for on-chip A/B against the early-
    compaction default; selects the identical keypoint set."""
    if _use_pallas():
        from mcslam_tpu.ops.patch_pallas import extract_patches_pallas

        patches, origin = extract_patches_pallas(blurred, yx)
    else:
        patches, origin = jax.vmap(extract_patches)(blurred, yx)
    center = (yx - origin).astype(jnp.float32)
    ang = jax.vmap(patch_orientation)(patches, yx, origin)
    desc = jax.vmap(
        lambda p, c, a: compute_descriptors_patch(p, c, a, angle_bins)
    )(patches, center, ang)
    kp = Keypoints(
        xy=merge(xy0), response=merge(resp), angle=merge(ang),
        octave=merge(octv), sigma2=merge(sigma2), desc=merge(desc),
        valid=merge(valid),
    )
    M = kp.valid.shape[1]
    if M > num_points:
        prio = jnp.where(kp.valid, kp.response + 1e3, -1.0)
        _, top = jax.lax.top_k(prio, num_points)  # (C, num_points)
        take = lambda a: jnp.take_along_axis(
            a, top.reshape(C, num_points, *([1] * (a.ndim - 2))), axis=1
        )
        kp = Keypoints(
            xy=take(kp.xy), response=take(kp.response), angle=take(kp.angle),
            octave=take(kp.octave), sigma2=take(kp.sigma2),
            desc=take(kp.desc), valid=take(kp.valid),
        )
    return kp


def extract_orb(img: jax.Array, **kwargs) -> Keypoints:
    """Single-image extraction (convenience wrapper over the batched path)."""
    kps = extract_orb_rig(img[None], **kwargs)
    return Keypoints(*(a[0] for a in kps))
