"""Fused FAST-9/16 + NMS as a Pallas TPU kernel.

The XLA formulation (ops/fast.py) materializes 16 shifted copies and their
rolling arc reductions in HBM (~80 MB of intermediates per 4-camera VGA
frame, measured ~5 ms). This kernel DMAs one row-band of the image into
VMEM per grid step and computes neighbor diffs, doubling-tree arc minima,
corner score, threshold, and 3x3 NMS entirely in registers/VMEM — one HBM
read and one write of the image.

Grid: (cams, row_tiles). The caller pads rows by HALO on both sides; column
shifts use pltpu.roll (wrap-around is masked off with the 3-pixel border).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcslam_tpu.ops.fast import ARC_LEN, BORDER, CIRCLE

HALO = 4  # 3 (circle radius) + 1 (NMS)


def _blur_band(band, taps, tile_h):
    """7-tap separable blur of the band's output rows, entirely in VMEM.

    Replaces image_ops.gaussian_blur's two (H, H)/(W, W) f32 banded MXU
    matmuls for the frame-build path: the band form pays O(H) work per
    output row for a 7-tap kernel; here it is 14 VPU multiply-adds on
    data the FAST kernel already DMA'd. Boundary semantics: the caller's
    halo rows are edge-replicated and lane rolls wrap — both only differ
    from the XLA reflect form within 3 px of the stacked-batch borders,
    which no descriptor ever samples (keypoints live >= EDGE=19 px inside
    every true image, so blur taps stop >= 13 px inside)."""
    acc = None
    r = len(taps) // 2
    for t, w in enumerate(taps):
        rows = band[HALO - r + t: HALO - r + t + tile_h, :]
        acc = rows * w if acc is None else acc + rows * w
    out = None
    for t, w in enumerate(taps):
        dx = t - r
        cols = pltpu.roll(acc, (-dx) % acc.shape[1], axis=1) if dx else acc
        out = cols * w if out is None else out + cols * w
    return out


def _fast_kernel(img_hbm, out_ref, scratch, sem, *, tile_h, width, height,
                 threshold, taps=None, blur_ref=None):
    c = pl.program_id(0)
    i = pl.program_id(1)
    _fast_tile_body(img_hbm, out_ref, scratch, sem, c, i, tile_h=tile_h,
                    width=width, height=height, threshold=threshold)
    if taps is not None:
        blur_ref[0] = _blur_band(scratch[:], taps, tile_h)


def _fast_kernel_blur(img_hbm, out_ref, blur_ref, scratch, sem, **kw):
    _fast_kernel(img_hbm, out_ref, scratch, sem, blur_ref=blur_ref, **kw)


def _fast_kernel_hskip(h_ref, img_hbm, out_ref, scratch, sem, *, tile_h,
                       width, height, threshold, taps=None, blur_ref=None):
    """Variant with per-image true heights (scalar-prefetched): pyramid
    levels are edge-padded to the level-0 shape, and a tile whose output
    rows all fall at or beyond h_img - BORDER produces only scores the
    caller's interior mask zeroes — skip its DMA and compute entirely.

    With a fused blur output the skip threshold moves from h - BORDER to
    h: descriptor patches sample blurred rows up to h - 1 (keypoints sit
    >= EDGE from the true bottom), while FAST scores in [h - BORDER, h)
    are caller-masked either way — so the blur rows must exist but the
    score rows may be garbage-free zeros, and both conditions are
    bit-identical after the caller's interior mask."""
    c = pl.program_id(0)
    i = pl.program_id(1)
    out_ref[0] = jnp.zeros_like(out_ref[0])
    h_skip = h_ref[c] if taps is not None else h_ref[c] - BORDER
    if taps is not None:
        blur_ref[0] = jnp.zeros_like(blur_ref[0])

    @pl.when(i * tile_h < h_skip)
    def _():
        _fast_tile_body(img_hbm, out_ref, scratch, sem, c, i, tile_h=tile_h,
                        width=width, height=height, threshold=threshold)
        if taps is not None:
            blur_ref[0] = _blur_band(scratch[:], taps, tile_h)


def _fast_kernel_hskip_blur(h_ref, img_hbm, out_ref, blur_ref, scratch, sem,
                            **kw):
    _fast_kernel_hskip(h_ref, img_hbm, out_ref, scratch, sem,
                       blur_ref=blur_ref, **kw)


def _fast_tile_body(img_hbm, out_ref, scratch, sem, c, i, **kw):
    out_ref[0] = _fast_tile_score(img_hbm, scratch, sem, c, i, **kw)


def _fast_tile_score(img_hbm, scratch, sem, c, i, *, tile_h, width,
                     height, threshold):
    # DMA this row band (tile + halos) into VMEM
    dma = pltpu.make_async_copy(
        img_hbm.at[c, pl.ds(i * tile_h, tile_h + 2 * HALO), :],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()

    band = scratch[:]  # (tile_h + 2*HALO, W)
    # rows needed for scores: out rows plus 1-row NMS halo
    # score region: rows [HALO-1, HALO-1 + tile_h + 2) of the band
    ctr = band[HALO - 1 : HALO - 1 + tile_h + 2, :]

    diffs = []
    for (dy, dx) in CIRCLE:
        rows = band[HALO - 1 + dy : HALO - 1 + dy + tile_h + 2, :]
        if dx != 0:
            rows = pltpu.roll(rows, (-dx) % rows.shape[1], axis=1)
        diffs.append(rows - ctr)

    def arc_scores(ds):
        # min over ARC_LEN=9 contiguous circle entries, max over 16 starts,
        # via a doubling tree: min2 -> min4 -> min8 -> min9
        m2 = [jnp.minimum(ds[s], ds[(s + 1) % 16]) for s in range(16)]
        m4 = [jnp.minimum(m2[s], m2[(s + 2) % 16]) for s in range(16)]
        m8 = [jnp.minimum(m4[s], m4[(s + 4) % 16]) for s in range(16)]
        m9 = [jnp.minimum(m8[s], ds[(s + 8) % 16]) for s in range(16)]
        out = m9[0]
        for s in range(1, 16):
            out = jnp.maximum(out, m9[s])
        return out

    bright = arc_scores(diffs)
    dark = arc_scores([-d for d in diffs])
    score = jnp.maximum(bright, dark)
    score = jnp.where(score > threshold, score, 0.0)

    # interior mask (x border; y border handled per-row below)
    w_ids = jax.lax.broadcasted_iota(jnp.int32, score.shape, 1)
    y_ids = (
        jax.lax.broadcasted_iota(jnp.int32, score.shape, 0)
        + i * tile_h - 1  # global row of each score row
    )
    interior = (
        (w_ids >= BORDER) & (w_ids < width - BORDER)
        & (y_ids >= BORDER) & (y_ids < height - BORDER)
    )
    score = jnp.where(interior, score, 0.0)

    # 3x3 NMS on the (tile_h + 2, W) score band -> (tile_h, W) output
    mid = score[1 : 1 + tile_h, :]
    pooled = mid
    for dy in (-1, 0, 1):
        rows = score[1 + dy : 1 + dy + tile_h, :]
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            shifted = (pltpu.roll(rows, (-dx) % rows.shape[1], axis=1)
                       if dx != 0 else rows)
            pooled = jnp.maximum(pooled, shifted)
    return jnp.where((mid >= pooled) & (mid > 0.0), mid, 0.0)


def _cell_topk_band(score, *, fast_threshold, h_img, w_img, row0, cell, k):
    """Exact per-cell top-k of the masked+bonused score tile, in VMEM.

    Replaces (WHAT) the XLA selection chain's per-cell stage
    (topk_grid.select_keypoints: strided (cell x cell) transpose + k
    knockout passes over the dense HBM score map — the largest stage-A
    sub-kernel in the round-4 chip bisection). Here the tile is already
    register-resident, so each knockout round is: a sublane reduction to
    per-column (max, min-rid-of-max), two 4-step lane doubling trees
    (suffix + prefix windows clipped at cell boundaries via lane masks,
    wrap-around rolls always cross a boundary so the masks kill them),
    and a one-op knockout of the winner pixel. The (value, rid) combine
    is lexicographic (value desc, rid asc) with rid = raster offset
    inside the cell — bit-identical tie-breaking to jnp.argmax over the
    flattened cell.

    Applies the caller's per-image true-bounds interior mask
    (rows/cols < h/w - BORDER) and the two-threshold rank bonus
    (ORBextractor.cpp:780 semantics: +1.0 above iniThFAST) BEFORE
    selection, exactly like the XLA path in ops/orb.py.

    Returns (vals, rids), each (k * ncr, Wp): row r*ncr + j holds round
    r's per-cell result for the tile's j-th cell row, broadcast across
    every lane of its cell (the caller slices lane stride `cell`).
    """
    tile_h, Wp = score.shape
    ncr = tile_h // cell
    NEG = jnp.float32(-1.0)  # knocked-out marker; real scores are >= 0
    BIG = jnp.int32(cell * cell)

    rows = jax.lax.broadcasted_iota(jnp.int32, score.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, score.shape, 1)
    ok = ((rows + row0 < h_img - BORDER) & (cols < w_img - BORDER))
    s = jnp.where(ok, score, 0.0)
    s = jnp.where(s > fast_threshold, s + 1.0, s)

    rid = (rows % cell) * cell + (cols % cell)  # raster offset in cell
    rid3 = rid.reshape(ncr, cell, Wp)
    lc = jax.lax.broadcasted_iota(jnp.int32, (ncr, Wp), 1) % cell

    def comb(v1, r1, v2, r2):
        take = (v2 > v1) | ((v2 == v1) & (r2 < r1))
        return jnp.where(take, v2, v1), jnp.where(take, r2, r1)

    out_v, out_r = [], []
    x = s
    for _ in range(k):
        # per-column best within the cell row (ties -> smallest row)
        x3 = x.reshape(ncr, cell, Wp)
        vcol = jnp.max(x3, axis=1)  # (ncr, Wp)
        hit = x3 == vcol[:, None, :]
        rcol = jnp.min(jnp.where(hit, rid3, BIG), axis=1)
        # suffix windows [j, min(j + 2^t, cell)) by doubling
        sv, sr = vcol, rcol
        sh = 1
        while sh < cell:
            v2 = pltpu.roll(sv, Wp - sh, axis=1)  # value from lane j + sh
            r2 = pltpu.roll(sr, Wp - sh, axis=1)
            in_cell = lc + sh < cell
            sv, sr = comb(sv, sr, jnp.where(in_cell, v2, NEG),
                          jnp.where(in_cell, r2, BIG))
            sh *= 2
        # prefix windows (max(j - 2^t, 0), j] by doubling
        pv, pr = vcol, rcol
        sh = 1
        while sh < cell:
            v2 = pltpu.roll(pv, sh, axis=1)  # value from lane j - sh
            r2 = pltpu.roll(pr, sh, axis=1)
            in_cell = lc >= sh
            pv, pr = comb(pv, pr, jnp.where(in_cell, v2, NEG),
                          jnp.where(in_cell, r2, BIG))
            sh *= 2
        bv, br = comb(sv, sr, pv, pr)  # full-cell best at every lane
        out_v.append(bv)
        out_r.append(br)
        # knock out the winner pixel (rid unique within each cell)
        br_full = jnp.broadcast_to(
            br[:, None, :], (ncr, cell, Wp)
        ).reshape(tile_h, Wp)
        x = jnp.where(rid == br_full, NEG, x)
    return jnp.concatenate(out_v, axis=0), jnp.concatenate(out_r, axis=0)


def _fast_kernel_select(hw_ref, img_hbm, blur_ref, cv_ref, cr_ref, scratch,
                        sem, *, tile_h, width, height, threshold, taps,
                        fast_threshold, cell, k, num_cams):
    """FAST + NMS + blur + per-cell top-k selection, one launch: the
    dense score map never visits HBM. Skip rule matches the blur+hskip
    variant (tiles at or beyond the true height emit zeros)."""
    c = pl.program_id(0)
    i = pl.program_id(1)
    blur_ref[0] = jnp.zeros_like(blur_ref[0])
    cv_ref[0] = jnp.zeros_like(cv_ref[0])
    cr_ref[0] = jnp.zeros_like(cr_ref[0])

    @pl.when(i * tile_h < hw_ref[c])
    def _():
        score = _fast_tile_score(
            img_hbm, scratch, sem, c, i, tile_h=tile_h, width=width,
            height=height, threshold=threshold,
        )
        blur_ref[0] = _blur_band(scratch[:], taps, tile_h)
        vals, rids = _cell_topk_band(
            score, fast_threshold=fast_threshold, h_img=hw_ref[c],
            w_img=hw_ref[num_cams + c], row0=i * tile_h, cell=cell, k=k,
        )
        cv_ref[0] = vals
        cr_ref[0] = rids


@functools.partial(jax.jit, static_argnames=(
    "min_threshold", "fast_threshold", "tile_h", "cell", "k", "interpret",
    "taps"))
def fast_select_pallas(img: jax.Array, min_threshold: float,
                       fast_threshold: float, heights: jax.Array,
                       widths: jax.Array, taps: tuple, tile_h: int = 64,
                       cell: int = 16, k: int = 4, interpret: bool = False):
    """(C, H, W) float32 -> (blurred (C, H, W), cand_v (C, G, k),
    cand_rid (C, G, k)): FAST scores at min_threshold, NMS, 7-tap blur,
    per-image interior mask + rank bonus, and exact per-(cell x cell)
    top-k — all in ONE Pallas launch, with the dense score map staying in
    VMEM. G = total cell rows x cells per row, raster order; candidate
    (g, r) sits at pixel (g // ncx * cell + rid // cell,
    g % ncx * cell + rid % cell) with ncx = ceil_to_128(W) // cell.
    Skipped-height tiles and out-of-bounds cells emit value 0 (invalid
    under the caller's resp > 0 rule), matching the XLA chain.
    """
    C, H, W = img.shape
    assert tile_h % cell == 0, "cell must divide tile_h"
    n_tiles = -(-H // tile_h)
    pad_h = n_tiles * tile_h - H
    Wp = -(-W // 128) * 128
    assert Wp % cell == 0, "cell must divide the padded lane width"
    ncr = tile_h // cell
    padded = jnp.pad(
        img, ((0, 0), (HALO, HALO + pad_h), (0, Wp - W)), mode="edge"
    )
    blur_shape = jax.ShapeDtypeStruct((C, n_tiles * tile_h, Wp), jnp.float32)
    cand_v_shape = jax.ShapeDtypeStruct(
        (C, n_tiles * k * ncr, Wp), jnp.float32
    )
    cand_r_shape = jax.ShapeDtypeStruct(
        (C, n_tiles * k * ncr, Wp), jnp.int32
    )
    blur_spec = pl.BlockSpec(
        (1, tile_h, Wp), lambda c, i, hw_sp: (c, i, 0),
        memory_space=pltpu.VMEM,
    )
    cand_spec = pl.BlockSpec(
        (1, k * ncr, Wp), lambda c, i, hw_sp: (c, i, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(C, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(blur_spec, cand_spec, cand_spec),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * HALO, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    hw = jnp.concatenate(
        [heights.astype(jnp.int32), widths.astype(jnp.int32)]
    )
    blur, cv, cr = pl.pallas_call(
        functools.partial(
            _fast_kernel_select, tile_h=tile_h, width=W, height=H,
            threshold=min_threshold, taps=taps,
            fast_threshold=fast_threshold, cell=cell, k=k, num_cams=C,
        ),
        grid_spec=grid_spec,
        out_shape=(blur_shape, cand_v_shape, cand_r_shape),
        interpret=interpret,
    )(hw, padded)
    # per-cell results are broadcast across the cell's lanes; take the
    # leader lane and order candidates (cell raster-major, round-minor)
    # to match topk_grid.select_keypoints' flattening
    cv = cv.reshape(C, n_tiles, k, ncr, Wp)[..., ::cell]
    cr = cr.reshape(C, n_tiles, k, ncr, Wp)[..., ::cell]
    cv = cv.transpose(0, 1, 3, 4, 2).reshape(C, -1, k)
    cr = cr.transpose(0, 1, 3, 4, 2).reshape(C, -1, k)
    return blur[:, :H, :W], cv, cr


@functools.partial(jax.jit, static_argnames=("threshold", "tile_h",
                                              "interpret", "taps"))
def fast_corners_pallas(img: jax.Array, threshold: float, tile_h: int = 64,
                        interpret: bool = False,
                        heights: jax.Array | None = None,
                        taps: tuple | None = None):
    """(C, H, W) float32 -> (C, H, W) NMS'd FAST score map.

    `heights` (optional, (C,) int32): each image's TRUE row count when the
    batch packs edge-padded pyramid levels (extract_orb_rig). Row tiles
    entirely at or beyond heights[c] - BORDER skip their DMA + compute and
    write zeros — bit-identical after the caller's per-level interior mask
    (which zeroes those rows regardless), ~19% fewer tiles at the
    production 4-level VGA shape.

    `taps` (optional, static tuple of floats): ALSO emit the separable
    blur of the image from the same row-band DMA (see _blur_band) and
    return (score, blurred) — replaces the standalone gaussian_blur
    banded-matmul pass of the frame build.
    """
    C, H, W = img.shape
    n_tiles = -(-H // tile_h)
    pad_h = n_tiles * tile_h - H
    # Mosaic needs the lane dimension 128-aligned for VMEM slices
    Wp = -(-W // 128) * 128
    padded = jnp.pad(
        img, ((0, 0), (HALO, HALO + pad_h), (0, Wp - W)), mode="edge"
    )

    map_shape = jax.ShapeDtypeStruct((C, n_tiles * tile_h, Wp), jnp.float32)
    out_shape = (map_shape, map_shape) if taps is not None else map_shape
    scratch_shapes = [
        pltpu.VMEM((tile_h + 2 * HALO, Wp), jnp.float32),
        pltpu.SemaphoreType.DMA,
    ]
    common = dict(tile_h=tile_h, width=W, height=H, threshold=threshold)
    if taps is not None:
        common["taps"] = taps
    if heights is None:
        spec = pl.BlockSpec(
            (1, tile_h, Wp), lambda c, i: (c, i, 0),
            memory_space=pltpu.VMEM,
        )
        out = pl.pallas_call(
            functools.partial(
                _fast_kernel_blur if taps is not None else _fast_kernel,
                **common,
            ),
            grid=(C, n_tiles),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=(spec, spec) if taps is not None else spec,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(padded)
    else:
        spec = pl.BlockSpec(
            (1, tile_h, Wp), lambda c, i, h_sp: (c, i, 0),
            memory_space=pltpu.VMEM,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(C, n_tiles),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=(spec, spec) if taps is not None else spec,
            scratch_shapes=scratch_shapes,
        )
        out = pl.pallas_call(
            functools.partial(
                _fast_kernel_hskip_blur if taps is not None
                else _fast_kernel_hskip,
                **common,
            ),
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(heights.astype(jnp.int32), padded)
    if taps is not None:
        return out[0][:, :H, :W], out[1][:, :H, :W]
    return out[:, :H, :W]
