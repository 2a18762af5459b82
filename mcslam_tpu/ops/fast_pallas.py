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


def _fast_tile_body(img_hbm, out_ref, scratch, sem, c, i, *, tile_h, width,
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
    out_ref[0] = jnp.where((mid >= pooled) & (mid > 0.0), mid, 0.0)


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
