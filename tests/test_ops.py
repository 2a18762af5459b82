import jax
import jax.numpy as jnp
import numpy as np

from mcslam_tpu.ops import fast, hamming, image, match, orb, topk_grid


# ---------- hamming ----------

def test_pack_unpack_roundtrip():
    key = jax.random.PRNGKey(0)
    packed = jax.random.randint(key, (16, 8), 0, 1 << 30).astype(jnp.uint32)
    bits = hamming.unpack_bits(packed)
    repacked = hamming.pack_bits(bits)
    np.testing.assert_array_equal(np.asarray(repacked), np.asarray(packed))


def test_hamming_matches_numpy_popcount():
    rng = np.random.RandomState(1)
    a = rng.randint(0, 1 << 32, (32, 8), dtype=np.uint64).astype(np.uint32)
    b = rng.randint(0, 1 << 32, (48, 8), dtype=np.uint64).astype(np.uint32)
    expected = np.zeros((32, 48), np.int32)
    for i in range(32):
        for j in range(48):
            x = a[i] ^ b[j]
            expected[i, j] = sum(bin(int(v)).count("1") for v in x)
    got = hamming.hamming_matrix(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_array_equal(np.asarray(got), expected)
    # pairwise popcount path agrees
    got2 = hamming.hamming_pairwise(jnp.asarray(a[:10]), jnp.asarray(b[:10]))
    np.testing.assert_array_equal(np.asarray(got2), expected[np.arange(10), np.arange(10)])


def test_hamming_identical_zero():
    a = jnp.asarray(np.random.RandomState(2).randint(0, 1 << 31, (8, 8)), jnp.uint32)
    d = hamming.hamming_matrix(a, a)
    np.testing.assert_array_equal(np.asarray(jnp.diag(d)), 0)


# ---------- match ----------

def test_match_mutual_simple():
    rng = np.random.RandomState(3)
    base = rng.randint(0, 1 << 31, (20, 8)).astype(np.uint32)
    # b is a shuffled copy of a with small perturbations
    perm = rng.permutation(20)
    b = base[perm].copy()
    b[:, 0] ^= 1  # flip one bit
    d = hamming.hamming_matrix(jnp.asarray(base), jnp.asarray(b))
    res = match.match_mutual(d, max_dist=5, ratio=0.9)
    assert np.asarray(res.ok).all()
    np.testing.assert_array_equal(np.asarray(res.idx), np.argsort(perm))


def test_match_respects_masks():
    d = jnp.array([[1, 10], [10, 1]], jnp.int32)
    res = match.match_mutual(d, col_mask=jnp.array([True, False]), max_dist=20, ratio=1.0)
    assert bool(res.ok[0])
    assert not bool(res.ok[1]) or int(res.idx[1]) == 0


def test_topk_neighbors():
    d = jnp.array([[3, 1, 2, 9]], jnp.int32)
    idx, dist = match.topk_neighbors(d, 2)
    np.testing.assert_array_equal(np.asarray(idx[0]), [1, 2])
    np.testing.assert_array_equal(np.asarray(dist[0]), [1, 2])


# ---------- fast ----------

def _corner_image():
    """Bright square on dark background: corners of the square are FAST corners."""
    img = np.zeros((64, 64), np.float32)
    img[20:44, 20:44] = 1.0
    return jnp.asarray(img)


def test_fast_detects_square_corners():
    img = _corner_image()
    score = fast.fast_corners(img, threshold=0.2)
    ys, xs = np.nonzero(np.asarray(score))
    assert len(ys) >= 4
    # all detections near the 4 square corners
    corners = np.array([[20, 20], [20, 43], [43, 20], [43, 43]])
    for y, x in zip(ys, xs):
        assert np.min(np.abs(corners - [y, x]).sum(axis=1)) <= 4


def test_fast_flat_image_empty():
    img = jnp.full((48, 48), 0.5)
    score = fast.fast_corners(img, threshold=0.05)
    assert float(jnp.sum(score)) == 0.0


def test_fast_agrees_with_opencv():
    cv2 = __import__("cv2")
    rng = np.random.RandomState(5)
    img8 = (rng.rand(120, 160) * 255).astype(np.uint8)
    img8 = cv2.GaussianBlur(img8, (5, 5), 1.0)
    det = cv2.FastFeatureDetector_create(threshold=20, nonmaxSuppression=True)
    kps = det.detect(img8, None)
    cv_pts = {(int(round(k.pt[1])), int(round(k.pt[0]))) for k in kps}
    ours = fast.fast_corners(jnp.asarray(img8, jnp.float32) / 255.0, 20.0 / 255.0)
    ys, xs = np.nonzero(np.asarray(ours))
    our_pts = set(zip(ys.tolist(), xs.tolist()))
    # NMS tie-breaks differ; require high mutual coverage within 1px
    def near(p, pts):
        y, x = p
        return any((y + dy, x + dx) in pts for dy in (-1, 0, 1) for dx in (-1, 0, 1))
    if cv_pts:
        recall = sum(near(p, our_pts) for p in cv_pts) / len(cv_pts)
        assert recall > 0.85, recall
    if our_pts:
        precision = sum(near(p, cv_pts) for p in our_pts) / len(our_pts)
        assert precision > 0.85, precision


def test_fast_pallas_matches_xla():
    """The fused Pallas kernel (interpret mode on CPU) must reproduce the
    XLA reference exactly."""
    from mcslam_tpu.ops.fast_pallas import fast_corners_pallas

    rng = np.random.RandomState(7)
    img = jnp.asarray(rng.rand(2, 120, 160).astype(np.float32))
    ref = np.asarray(fast.fast_corners(img, 0.05))
    got = np.asarray(fast_corners_pallas(img, 0.05, tile_h=40, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_fast_pallas_height_skip_matches_masked():
    """The per-image true-height tile skip (pyramid levels edge-padded to
    the level-0 shape) must equal the full kernel everywhere the caller's
    interior mask keeps: rows < h_img - BORDER. Rows at or beyond that are
    zero by construction in the skip variant and zeroed by the mask in
    extract_orb_rig either way."""
    from mcslam_tpu.ops.fast_pallas import fast_corners_pallas

    rng = np.random.RandomState(11)
    H, W = 120, 160
    heights = np.asarray([120, 77, 40], np.int32)  # tile_h=40 -> skip 0/1/2
    img_np = rng.rand(3, H, W).astype(np.float32)
    for c, h in enumerate(heights):  # edge-pad like build_pyramid stacking
        img_np[c, h:] = img_np[c, h - 1]
    img = jnp.asarray(img_np)
    full = np.asarray(fast_corners_pallas(img, 0.05, tile_h=40,
                                          interpret=True))
    skip = np.asarray(fast_corners_pallas(img, 0.05, tile_h=40,
                                          interpret=True,
                                          heights=jnp.asarray(heights)))
    for c, h in enumerate(heights):
        keep = h - fast.BORDER
        np.testing.assert_array_equal(skip[c, :keep], full[c, :keep])
    # skipped tiles wrote zeros
    assert not np.any(skip[1, 80:])
    assert not np.any(skip[2, 40:])


def test_fast_pallas_fused_blur_matches_gaussian():
    """The fused blur output (taps=...) must equal gaussian_blur on every
    pixel a descriptor can sample: >= 13 px inside each image's true
    bounds (keypoints are >= EDGE=19 from borders; blur taps reach 3 px,
    patch samples 16 -> the outermost blurred pixel read sits 16 px in,
    built from taps >= 13 px in). Boundary treatment differs by design
    (edge halo + lane wrap vs reflect) outside that region. The score
    output must be untouched by the fusion."""
    from mcslam_tpu.ops import image as image_ops
    from mcslam_tpu.ops.fast_pallas import fast_corners_pallas

    rng = np.random.RandomState(13)
    H, W = 120, 256
    heights = np.asarray([120, 77], np.int32)
    img_np = rng.rand(2, H, W).astype(np.float32)
    for c, h in enumerate(heights):
        img_np[c, h:] = img_np[c, h - 1]
    img = jnp.asarray(img_np)
    taps = image_ops._np_gaussian_taps(7, 2.0)

    score_ref = np.asarray(
        fast_corners_pallas(img, 0.05, tile_h=40, interpret=True,
                            heights=jnp.asarray(heights))
    )
    score, blurred = fast_corners_pallas(
        img, 0.05, tile_h=40, interpret=True,
        heights=jnp.asarray(heights), taps=taps,
    )
    blur_ref = np.asarray(image_ops.gaussian_blur(img, 7, 2.0))
    m = 13
    for c, h in enumerate(heights):
        np.testing.assert_allclose(
            np.asarray(blurred)[c, m:h - m, m:W - m],
            blur_ref[c, m:h - m, m:W - m],
            rtol=0, atol=2e-6,
        )
        # score parity where the caller's interior mask keeps rows
        # (the fused variant computes tiles up to h instead of
        # h - BORDER; everything below the mask line must agree)
        keep = int(h) - fast.BORDER
        np.testing.assert_array_equal(
            np.asarray(score)[c, :keep], score_ref[c, :keep]
        )


def test_fast_select_pallas_matches_xla_selection():
    """The select-fused kernel (FAST + NMS + blur + interior mask + rank
    bonus + exact per-cell top-k in one launch) must reproduce the XLA
    selection chain's picks exactly: same (resp, y, x) sequence over the
    valid slots, including argmax tie-breaking inside plateau cells and
    cross-cell tie order in the global sort, on images with per-image
    true heights AND widths. The blur output must equal the fused-blur
    variant bit-for-bit (same code path)."""
    from mcslam_tpu.ops import image as image_ops
    from mcslam_tpu.ops.fast_pallas import (fast_corners_pallas,
                                            fast_select_pallas)

    rng = np.random.RandomState(7)
    H, W, CELL, K, TILE = 96, 256, 16, 4, 32
    heights = np.asarray([96, 61], np.int32)
    widths = np.asarray([256, 200], np.int32)
    # quantized pixels force plateau ties so the tie-break rules are
    # actually exercised
    img_np = (rng.randint(0, 24, (2, H, W)) / 24.0).astype(np.float32)
    for c, (h, w) in enumerate(zip(heights, widths)):
        img_np[c, h:] = img_np[c, h - 1]
        img_np[c, :, w:] = img_np[c, :, w - 1][:, None]
    img = jnp.asarray(img_np)
    taps = image_ops._np_gaussian_taps(7, 2.0)
    minthr, fastthr = 0.04, 0.12
    maxb = 64

    # XLA reference chain (exact top_k), mirroring ops/orb.py
    score, blur_ref = fast_corners_pallas(
        img, minthr, tile_h=TILE, interpret=True,
        heights=jnp.asarray(heights), taps=taps,
    )
    yy = jnp.arange(H, dtype=jnp.int32)[None, :, None]
    xx = jnp.arange(W, dtype=jnp.int32)[None, None, :]
    interior = (yy < (jnp.asarray(heights)[:, None, None] - fast.BORDER)) \
        & (xx < (jnp.asarray(widths)[:, None, None] - fast.BORDER))
    score = jnp.where(interior, score, 0.0)
    score = jnp.where(score > fastthr, score + 1.0, score)
    yx_ref, resp_ref, valid_ref = jax.vmap(
        lambda sc: topk_grid.select_keypoints(
            sc, maxb, cell=CELL, per_cell=K, approx=False
        )
    )(score)

    # select-fused kernel + the candidate-to-top-N glue
    blur, cv, cr = fast_select_pallas(
        img, minthr, fastthr, jnp.asarray(heights), jnp.asarray(widths),
        taps=taps, tile_h=TILE, cell=CELL, k=K, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(blur), np.asarray(blur_ref))
    # the PRODUCTION glue (what extract_orb_rig dispatches)
    yx, resp, valid = orb._select_from_cells(
        cv, cr, maxb, per_cell=K, cell=CELL, ncx=W // CELL, approx=False
    )
    valid = np.asarray(valid)

    np.testing.assert_array_equal(valid, np.asarray(valid_ref))
    for c in range(2):
        m = valid[c]
        np.testing.assert_array_equal(
            np.asarray(resp)[c][m], np.asarray(resp_ref)[c][m]
        )
        np.testing.assert_array_equal(
            np.asarray(yx)[c][m], np.asarray(yx_ref)[c][m]
        )


def test_patch_oriented_pallas_matches_xla():
    """The oriented-patch kernel must reproduce the indexed-DMA patches
    (bf16-rounded) and the IC moments of the XLA matmul form (same f32
    sums up to reduction order), so angle = atan2 agrees to float
    tolerance."""
    from mcslam_tpu.ops.patch_pallas import (
        extract_patches_indexed_pallas, extract_patches_oriented_pallas)

    rng = np.random.RandomState(3)
    imgs = jnp.asarray(rng.rand(3, 96, 160).astype(np.float32))
    T = 50
    ys = rng.randint(orb.PATCH_R, 96 - orb.PATCH_R, T)
    xs = rng.randint(orb.PATCH_R, 160 - orb.PATCH_R, T)
    yx = jnp.asarray(np.stack([ys, xs], -1).astype(np.int32))
    idx = jnp.asarray(rng.randint(0, 3, T).astype(np.int32))

    p_ref, org_ref = extract_patches_indexed_pallas(imgs, yx, idx,
                                                    interpret=True)
    ang_ref = orb.patch_orientation(p_ref, yx, org_ref)

    p, m, org = extract_patches_oriented_pallas(imgs, yx, idx,
                                                interpret=True)
    np.testing.assert_array_equal(np.asarray(org), np.asarray(org_ref))
    np.testing.assert_array_equal(
        np.asarray(p), np.asarray(p_ref.astype(jnp.bfloat16))
    )
    ang = np.arctan2(np.asarray(m)[:, 1], np.asarray(m)[:, 0])
    d = np.abs(np.unwrap(np.asarray(ang_ref)) - np.unwrap(ang))
    d = np.minimum(d, 2 * np.pi - d)
    assert d.max() < 1e-4, d.max()


def test_patch_pallas_matches_xla():
    """The DMA patch-extraction kernel (interpret mode on CPU) must
    reproduce the dynamic-slice reference bit-exactly, including clamped
    border keypoints and the aligned-start row/col rolls."""
    import jax

    from mcslam_tpu.ops import orb
    from mcslam_tpu.ops.patch_pallas import extract_patches_pallas

    rng = np.random.RandomState(9)
    C, H, W, N = 2, 96, 200, 70
    imgs = jnp.asarray(rng.rand(C, H, W).astype(np.float32))
    yx = jnp.asarray(np.stack([
        rng.randint(0, H, (C, N)), rng.randint(0, W, (C, N)),
    ], axis=-1).astype(np.int32))
    got_p, got_o = extract_patches_pallas(imgs, yx, batch=16, interpret=True)
    ref_p, ref_o = jax.vmap(orb.extract_patches)(imgs, yx)
    np.testing.assert_array_equal(np.asarray(got_o), np.asarray(ref_o))
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(ref_p))


def test_patch_pallas_indexed_matches_xla():
    """Flat-list variant (per-keypoint source-image index) must match the
    dynamic-slice reference bit-exactly, with keypoints hitting arbitrary
    images of the batch in arbitrary order."""
    from mcslam_tpu.ops import orb
    from mcslam_tpu.ops.patch_pallas import extract_patches_indexed_pallas

    rng = np.random.RandomState(13)
    B, H, W, T = 5, 96, 200, 70
    imgs = jnp.asarray(rng.rand(B, H, W).astype(np.float32))
    yx = jnp.asarray(np.stack([
        rng.randint(0, H, T), rng.randint(0, W, T),
    ], axis=-1).astype(np.int32))
    idx = jnp.asarray(rng.randint(0, B, T).astype(np.int32))
    got_p, got_o = extract_patches_indexed_pallas(
        imgs, yx, idx, batch=16, interpret=True
    )
    ref_p, ref_o = orb.extract_patches_indexed(imgs, yx, idx)
    np.testing.assert_array_equal(np.asarray(got_o), np.asarray(ref_o))
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(ref_p))


def test_early_compaction_matches_late():
    """extract_orb_rig's early cross-level compaction (round-4 speedup:
    patches/orientation/descriptors only for the surviving num_points
    slots) must select the identical keypoint set with identical
    descriptors as the late-compaction formulation it replaced
    (MCSLAM_LATE_COMPACT=1)."""
    import os

    from mcslam_tpu.ops import orb

    rng = np.random.RandomState(3)
    imgs = jnp.asarray(rng.rand(2, 120, 160).astype(np.float32) ** 2)
    kw = dict(num_points=96, num_levels=3, approx_topk=False)
    early = orb.extract_orb_rig(imgs, **kw)
    os.environ["MCSLAM_LATE_COMPACT"] = "1"
    try:
        late = orb.extract_orb_rig(imgs, **kw)
    finally:
        del os.environ["MCSLAM_LATE_COMPACT"]
    np.testing.assert_array_equal(np.asarray(early.valid), np.asarray(late.valid))
    np.testing.assert_array_equal(np.asarray(early.octave), np.asarray(late.octave))
    np.testing.assert_array_equal(np.asarray(early.xy), np.asarray(late.xy))
    np.testing.assert_array_equal(np.asarray(early.desc), np.asarray(late.desc))
    np.testing.assert_allclose(
        np.asarray(early.angle), np.asarray(late.angle), atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(early.response), np.asarray(late.response)
    )


# ---------- topk_grid ----------

def test_select_keypoints_balanced():
    score = np.zeros((64, 64), np.float32)
    # strong cluster in one cell, weak singles elsewhere
    score[10, 10], score[10, 11] = 5.0, 4.9
    score[12, 12], score[13, 10] = 4.8, 4.7
    score[11, 13], score[10, 14] = 4.6, 4.5  # 6 in one cell
    score[40, 40] = 0.5
    score[50, 20] = 0.4
    yx, resp, valid = topk_grid.select_keypoints(jnp.asarray(score), 8, cell=16, per_cell=4)
    got = {tuple(p) for p in np.asarray(yx)[np.asarray(valid)].tolist()}
    # weak singles survive because the strong cell is capped at 4
    assert (40, 40) in got and (50, 20) in got
    assert sum(1 for (y, x) in got if y < 16 and x < 16) == 4


def test_select_keypoints_subcell():
    """Subcell-max selection: the per-subcell top-per_sub survive, with
    raster-order tie-breaking and empty subcells masked out."""
    score = np.zeros((64, 64), np.float32)
    score[10, 10], score[10, 11] = 5.0, 4.9   # same 8x8 subcell (1,1)
    score[12, 12], score[13, 10] = 4.8, 4.7   # also subcell (1,1)
    score[40, 40] = 0.5                        # subcell (5,5)
    score[50, 20] = 0.4                        # subcell (6,2)
    score[33, 57] = 2.0
    score[32, 56] = 2.0                        # tie in subcell (4,7)

    # per_sub=1: strict one winner per subcell
    yx, resp, valid = topk_grid.select_keypoints_subcell(
        jnp.asarray(score), 8, sub=8, per_sub=1)
    got = {tuple(p) for p in np.asarray(yx)[np.asarray(valid)].tolist()}
    assert (10, 10) in got and (40, 40) in got and (50, 20) in got
    assert sum(1 for (y, x) in got if y < 16 and x < 16) == 1
    # raster-order tie-break: (32, 56) precedes (33, 57)
    assert (32, 56) in got and (33, 57) not in got
    assert int(np.asarray(valid).sum()) == 4
    by_pos = {tuple(p): float(r) for p, r in zip(
        np.asarray(yx).tolist(), np.asarray(resp).tolist())}
    assert by_pos[(10, 10)] == 5.0 and by_pos[(32, 56)] == 2.0

    # per_sub=2 (default): the cluster keeps its two best, the tie pair
    # yields both pixels (knockout makes the picks distinct)
    yx2, resp2, valid2 = topk_grid.select_keypoints_subcell(
        jnp.asarray(score), 16, sub=8, per_sub=2)
    got2 = {tuple(p) for p in np.asarray(yx2)[np.asarray(valid2)].tolist()}
    assert (10, 10) in got2 and (10, 11) in got2
    assert (12, 12) not in got2  # third-best in its subcell
    assert (32, 56) in got2 and (33, 57) in got2
    assert (40, 40) in got2 and (50, 20) in got2
    assert int(np.asarray(valid2).sum()) == 6


def test_select_keypoints_padding():
    score = np.zeros((32, 32), np.float32)
    score[5, 5] = 1.0
    yx, resp, valid = topk_grid.select_keypoints(jnp.asarray(score), 16)
    assert int(np.asarray(valid).sum()) == 1
    assert tuple(np.asarray(yx)[np.asarray(valid)][0]) == (5, 5)


# ---------- image ----------

def test_gaussian_blur_matches_opencv():
    cv2 = __import__("cv2")
    rng = np.random.RandomState(6)
    img = rng.rand(40, 50).astype(np.float32)
    # default border (REFLECT_101) matches jnp.pad mode="reflect"
    ref = cv2.GaussianBlur(img, (7, 7), 2.0)
    ours = image.gaussian_blur(jnp.asarray(img), 7, 2.0)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_pyramid_shapes():
    img = jnp.zeros((480, 640))
    levels = image.build_pyramid(img, 8, 1.2)
    assert len(levels) == 8
    assert levels[0].shape == (480, 640)
    assert levels[1].shape == (400, 533)


# ---------- orb ----------

def _textured_image(seed=0, h=240, w=320):
    cv2 = __import__("cv2")
    rng = np.random.RandomState(seed)
    img = (rng.rand(h // 8, w // 8) * 255).astype(np.uint8)
    img = cv2.resize(img, (w, h), interpolation=cv2.INTER_NEAREST)
    img = cv2.GaussianBlur(img, (5, 5), 1.0)
    return img.astype(np.float32) / 255.0


def test_extract_orb_shapes_and_validity():
    img = jnp.asarray(_textured_image())
    kp = orb.extract_orb(img, num_points=512, num_levels=4)
    n = kp.xy.shape[0]
    assert kp.desc.shape == (n, 8)
    assert kp.valid.shape == (n,)
    assert int(jnp.sum(kp.valid)) > 100
    v = np.asarray(kp.valid)
    xy = np.asarray(kp.xy)[v]
    assert xy[:, 0].max() < 320 and xy[:, 1].max() < 240


def test_orb_descriptor_rotation_tolerance():
    """Descriptors of the same (rotated) patch should be close in Hamming."""
    cv2 = __import__("cv2")
    img = _textured_image(seed=2)
    angle = 20.0
    M = cv2.getRotationMatrix2D((160, 120), angle, 1.0)
    rot = cv2.warpAffine(img, M, (320, 240), flags=cv2.INTER_LINEAR)
    kp1 = orb.extract_orb(jnp.asarray(img), num_points=256, num_levels=1)
    kp2 = orb.extract_orb(jnp.asarray(rot), num_points=256, num_levels=1)
    # map kp1 into rotated frame, find those with a nearby kp2
    ones = np.ones((kp1.xy.shape[0], 1), np.float32)
    proj = np.concatenate([np.asarray(kp1.xy), ones], axis=1) @ M.T  # (N, 2)
    v1, v2 = np.asarray(kp1.valid), np.asarray(kp2.valid)
    xy2 = np.asarray(kp2.xy)
    d = hamming.hamming_matrix(kp1.desc, kp2.desc)
    d = np.asarray(d)
    matched, low = 0, 0
    for i in np.nonzero(v1)[0]:
        dist2 = np.linalg.norm(xy2 - proj[i], axis=1)
        dist2[~v2] = 1e9
        j = int(np.argmin(dist2))
        if dist2[j] < 2.0:
            matched += 1
            if d[i, j] < 64:
                low += 1
    assert matched > 20
    assert low / matched > 0.7, (low, matched)


def test_extract_orb_rig_batched():
    img = jnp.asarray(_textured_image())
    imgs = jnp.stack([img, img * 0.8 + 0.1])
    kps = orb.extract_orb_rig(imgs, num_points=256, num_levels=2)
    assert kps.xy.shape[0] == 2
    assert int(jnp.sum(kps.valid[0])) > 50


def test_anchored_sq_px_dist_matches_gather_form():
    """The matmul-form anchored pixel-distance (no (M,N,2) gather) must
    agree with the naive gather form to sub-pixel^2 accuracy."""
    from mcslam_tpu.tracking_kernels import _GATE_BIG, _anchored_sq_px_dist

    rng = np.random.RandomState(3)
    M, N, C = 37, 53, 4
    uv = jnp.asarray(rng.uniform(0, 640, (M, 2)).astype(np.float32))
    anchor = jnp.asarray(rng.randint(0, C, M).astype(np.int32))
    proj = jnp.asarray(rng.uniform(-50, 700, (C, N, 2)).astype(np.float32))
    penal = jnp.asarray(rng.rand(C, N) < 0.3)

    d2 = np.asarray(_anchored_sq_px_dist(uv, anchor, proj, penal))
    proj_a = np.asarray(proj)[np.asarray(anchor)]  # (M, N, 2)
    ref = np.sum((np.asarray(uv)[:, None, :] - proj_a) ** 2, axis=-1)
    pen_a = np.asarray(penal)[np.asarray(anchor)]
    assert np.all(d2[pen_a] >= 1e11)
    assert np.allclose(d2[~pen_a], ref[~pen_a], atol=1.0), (
        np.abs(d2[~pen_a] - ref[~pen_a]).max()
    )
