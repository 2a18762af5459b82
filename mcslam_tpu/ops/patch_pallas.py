"""Per-keypoint patch extraction as a Pallas scalar-prefetch DMA kernel.

The XLA formulation (orb.extract_patches: vmap of dynamic_slice per
keypoint) lowers to a serialized gather on TPU — measured ~11 ms for a
4-camera VGA frame, the single largest item of the frame-build stage. Here
the keypoint coordinates are scalar-prefetched into SMEM and each grid step
issues a batch of B concurrent 2D window DMAs HBM->VMEM; the DMA engine
does strided window copies natively, so the whole extraction is one pass
at copy bandwidth with B-deep latency hiding.

TPU DMA slice starts in the sublane (row) dimension must be provably
8-aligned, so each copy starts at the aligned row below the patch origin
and the kernel rolls the extra rows off in VMEM.

Replaces the per-keypoint patch loop of the reference's ORB descriptor
sampling (ORBextractor::computeOrbDescriptor walks patch pointers per
keypoint, /root/reference/MCSlam/src/ORBextractor.cpp:106).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _patch_kernel(org_ref, img_hbm, out_ref, scratch, sems, *, B, P, Psub,
                  Rows, Lanes, Sub):
    c = pl.program_id(0)
    t = pl.program_id(1)
    dmas = []
    for b in range(B):
        n = t * B + b
        packed = org_ref[c, n]  # y0 * 65536 + x0 (SMEM-friendly layout)
        y0 = packed // 65536
        x0 = packed % 65536
        ya = (y0 // Sub) * Sub  # provably sublane-aligned start
        xa = (x0 // 128) * 128  # provably 128-aligned lane start
        dma = pltpu.make_async_copy(
            img_hbm.at[c, pl.ds(ya, Rows), pl.ds(xa, Lanes)],
            scratch.at[b],
            sems.at[b],
        )
        dma.start()
        dmas.append(dma)
    for b, dma in enumerate(dmas):
        dma.wait()
        n = t * B + b
        packed = org_ref[c, n]
        dy = (packed // 65536) % Sub
        dx = (packed % 65536) % 128
        band = scratch[b]  # (Rows, Lanes)
        # roll the residual offsets off the top/left; wrapped garbage
        # lands in rows >= Psub / lanes >= 128 and is sliced away
        band = pltpu.roll(band, (-dy) % band.shape[0], axis=0)
        band = pltpu.roll(band, (-dx) % band.shape[1], axis=1)
        out_ref[b] = band[:Psub, :128]


@functools.partial(jax.jit, static_argnames=("batch", "interpret"))
def extract_patches_pallas(
    imgs: jax.Array,  # (C, H, W) float32
    yx: jax.Array,  # (C, N, 2) int32 keypoint (y, x)
    batch: int = 64,
    interpret: bool = False,
):
    """-> ((C, N, P, P) patches, (C, N, 2) int32 patch origins).

    Origins are the clamped top-left corners (same contract as
    orb.extract_patches): the patch is img[y0:y0+P, x0:x0+P].
    """
    from mcslam_tpu.ops.orb import PATCH, PATCH_R

    C, H, W = imgs.shape
    N = yx.shape[1]
    P = PATCH
    # sublane packing depends on element width: 8 rows/tile for 4-byte
    # types, 16 for 2-byte (bf16) — DMA row starts must be tile-aligned.
    # bf16 patches halve the dominant cost of this kernel (the copy
    # amplification: a (Rows, 256) band is fetched per 39x39 patch).
    Sub = 8 if imgs.dtype.itemsize >= 4 else 16
    Psub = -(-P // Sub) * Sub  # output rows, sublane aligned
    Rows = Psub + Sub  # copied rows: aligned start + residual offset < Sub
    Lanes = 256  # copied cols: aligned start + residual (<128) + P <= 256
    y0 = jnp.clip(yx[..., 0] - PATCH_R, 0, H - P)
    x0 = jnp.clip(yx[..., 1] - PATCH_R, 0, W - P)
    origins = jnp.stack([y0, x0], axis=-1).astype(jnp.int32)  # (C, N, 2)
    # aligned-start copies read past the patch: pad bottom/right to keep
    # the (Rows, Lanes) window in bounds
    imgs_p = jnp.pad(imgs, ((0, 0), (0, Rows), (0, Lanes)), mode="edge")

    B = batch
    n_tiles = -(-N // B)
    Np = n_tiles * B
    # packed (C, Np) int32: a trailing dim of 2 would be padded to 128
    # lanes in SMEM (64x waste) — pack (y0, x0) into one word instead
    packed = origins[..., 0] * 65536 + origins[..., 1]
    org_p = jnp.pad(packed, ((0, 0), (0, Np - N)))

    kernel = functools.partial(_patch_kernel, B=B, P=P, Psub=Psub, Rows=Rows,
                               Lanes=Lanes, Sub=Sub)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(C, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (None, B, Psub, 128), lambda c, t, org_sp: (c, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((B, Rows, Lanes), imgs.dtype),
            pltpu.SemaphoreType.DMA((B,)),
        ],
    )
    patches = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C, Np, Psub, 128), imgs.dtype),
        interpret=interpret,
    )(org_p, imgs_p)
    return patches[:, :N, :P, :P], origins


def _patch_kernel_indexed(org_ref, idx_ref, img_hbm, out_ref, scratch, sems,
                          *, B, P, Psub, Rows, Lanes, Sub):
    t = pl.program_id(0)
    dmas = []
    for b in range(B):
        n = t * B + b
        packed = org_ref[n]
        y0 = packed // 65536
        x0 = packed % 65536
        ya = (y0 // Sub) * Sub
        xa = (x0 // 128) * 128
        dma = pltpu.make_async_copy(
            img_hbm.at[idx_ref[n], pl.ds(ya, Rows), pl.ds(xa, Lanes)],
            scratch.at[b],
            sems.at[b],
        )
        dma.start()
        dmas.append(dma)
    for b, dma in enumerate(dmas):
        dma.wait()
        n = t * B + b
        packed = org_ref[n]
        dy = (packed // 65536) % Sub
        dx = (packed % 65536) % 128
        band = scratch[b]
        band = pltpu.roll(band, (-dy) % band.shape[0], axis=0)
        band = pltpu.roll(band, (-dx) % band.shape[1], axis=1)
        out_ref[b] = band[:Psub, :128]


def _patch_kernel_oriented(org_ref, idx_ref, w_ref, img_hbm, out_ref, m_ref,
                           scratch, sems, *, B, P, Psub, Rows, Lanes, Sub):
    """Indexed patch DMA + in-kernel IC-moments: while each centered
    patch is register-resident, the two circular-moment sums (m10, m01 —
    orb._circle_weights) are computed as elementwise multiply + full
    reduces (the (P^2, 2) matmul outside paid an HBM round trip of all
    patches for ~2 MACs/pixel). Patches are emitted bf16: their ONLY
    remaining consumer is the steered-BRIEF matmul, which casts to bf16
    anyway (bits depend on signs of O(1) intensity differences); the
    f32->bf16 moment precision stays in-kernel. Moments land in lanes
    0/1 of a (B, 1, 128) row (lane-select trick; Mosaic cannot store
    scalars to VMEM). The weight masks arrive as a (2, P, P) VMEM input
    (Pallas forbids captured array constants)."""
    t = pl.program_id(0)
    wxa = w_ref[0]
    wya = w_ref[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    dmas = []
    for b in range(B):
        n = t * B + b
        packed = org_ref[n]
        y0 = packed // 65536
        x0 = packed % 65536
        ya = (y0 // Sub) * Sub
        xa = (x0 // 128) * 128
        dma = pltpu.make_async_copy(
            img_hbm.at[idx_ref[n], pl.ds(ya, Rows), pl.ds(xa, Lanes)],
            scratch.at[b],
            sems.at[b],
        )
        dma.start()
        dmas.append(dma)
    for b, dma in enumerate(dmas):
        dma.wait()
        n = t * B + b
        packed = org_ref[n]
        dy = (packed // 65536) % Sub
        dx = (packed % 65536) % 128
        band = scratch[b]
        band = pltpu.roll(band, (-dy) % band.shape[0], axis=0)
        band = pltpu.roll(band, (-dx) % band.shape[1], axis=1)
        patch = band[:Psub, :128]
        out_ref[b] = patch.astype(out_ref.dtype)
        win = patch[:P, :P]
        m10 = jnp.sum(win * wxa)
        m01 = jnp.sum(win * wya)
        m_ref[b] = jnp.where(lane == 0, m10, jnp.where(lane == 1, m01, 0.0))


@functools.partial(jax.jit, static_argnames=("batch", "interpret"))
def extract_patches_oriented_pallas(
    imgs: jax.Array,  # (B_img, H, W) float32
    yx: jax.Array,  # (T, 2) int32 keypoint (y, x)
    img_idx: jax.Array,  # (T,) int32 source image per keypoint
    batch: int = 64,
    interpret: bool = False,
):
    """extract_patches_indexed_pallas + in-kernel IC moments.

    -> ((T, P, P) bf16 patches, (T, 2) f32 moments [m10, m01],
        (T, 2) int32 origins). angle = arctan2(m01, m10) outside.
    """
    from mcslam_tpu.ops.orb import PATCH, PATCH_R, _circle_weights

    _, H, W = imgs.shape
    T = yx.shape[0]
    P = PATCH
    Sub = 8 if imgs.dtype.itemsize >= 4 else 16
    Psub = -(-P // Sub) * Sub
    Rows = Psub + Sub
    Lanes = 256
    y0 = jnp.clip(yx[:, 0] - PATCH_R, 0, H - P)
    x0 = jnp.clip(yx[:, 1] - PATCH_R, 0, W - P)
    origins = jnp.stack([y0, x0], axis=-1).astype(jnp.int32)
    imgs_p = jnp.pad(imgs, ((0, 0), (0, Rows), (0, Lanes)), mode="edge")

    B = batch
    n_tiles = -(-T // B)
    Tp = n_tiles * B
    packed = origins[..., 0] * 65536 + origins[..., 1]
    org_p = jnp.pad(packed, (0, Tp - T))
    idx_p = jnp.pad(img_idx.astype(jnp.int32), (0, Tp - T))

    wx, wy = _circle_weights()
    w_stack = jnp.asarray(np.stack([wx, wy]).astype(np.float32))
    kernel = functools.partial(
        _patch_kernel_oriented, B=B, P=P, Psub=Psub, Rows=Rows,
        Lanes=Lanes, Sub=Sub,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(
                (B, Psub, 128), lambda t, org_sp, idx_sp: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (B, 1, 128), lambda t, org_sp, idx_sp: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, Rows, Lanes), imgs.dtype),
            pltpu.SemaphoreType.DMA((B,)),
        ],
    )
    patches, m = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((Tp, Psub, 128), jnp.bfloat16),
            jax.ShapeDtypeStruct((Tp, 1, 128), jnp.float32),
        ),
        interpret=interpret,
    )(org_p, idx_p, w_stack, imgs_p)
    return patches[:T, :P, :P], m[:T, 0, :2], origins


@functools.partial(jax.jit, static_argnames=("batch", "interpret"))
def extract_patches_indexed_pallas(
    imgs: jax.Array,  # (B_img, H, W) float32
    yx: jax.Array,  # (T, 2) int32 keypoint (y, x)
    img_idx: jax.Array,  # (T,) int32 source image per keypoint
    batch: int = 64,
    interpret: bool = False,
):
    """Flat-list variant of extract_patches_pallas: every keypoint carries
    its own source-image index (used after cross-level compaction, where
    one camera's keypoint list mixes pyramid levels). Same DMA scheme; the
    image index is scalar-prefetched alongside the packed origins.

    -> ((T, P, P) patches, (T, 2) int32 patch origins).
    """
    from mcslam_tpu.ops.orb import PATCH, PATCH_R

    _, H, W = imgs.shape
    T = yx.shape[0]
    P = PATCH
    Sub = 8 if imgs.dtype.itemsize >= 4 else 16
    Psub = -(-P // Sub) * Sub
    Rows = Psub + Sub
    Lanes = 256
    y0 = jnp.clip(yx[:, 0] - PATCH_R, 0, H - P)
    x0 = jnp.clip(yx[:, 1] - PATCH_R, 0, W - P)
    origins = jnp.stack([y0, x0], axis=-1).astype(jnp.int32)  # (T, 2)
    imgs_p = jnp.pad(imgs, ((0, 0), (0, Rows), (0, Lanes)), mode="edge")

    B = batch
    n_tiles = -(-T // B)
    Tp = n_tiles * B
    packed = origins[..., 0] * 65536 + origins[..., 1]
    org_p = jnp.pad(packed, (0, Tp - T))
    idx_p = jnp.pad(img_idx.astype(jnp.int32), (0, Tp - T))

    kernel = functools.partial(_patch_kernel_indexed, B=B, P=P, Psub=Psub,
                               Rows=Rows, Lanes=Lanes, Sub=Sub)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (B, Psub, 128), lambda t, org_sp, idx_sp: (t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((B, Rows, Lanes), imgs.dtype),
            pltpu.SemaphoreType.DMA((B,)),
        ],
    )
    patches = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Tp, Psub, 128), imgs.dtype),
        interpret=interpret,
    )(org_p, idx_p, imgs_p)
    return patches[:T, :P, :P], origins
