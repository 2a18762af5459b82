"""Fused gated descriptor matching as ONE Pallas kernel.

Replaces (WHAT) the reference's BoW-bucketed Hamming matchers on the
tracking path (InterMatchingBow, /root/reference/MCSlam/src/
FrontEnd.cpp:3905-3972, and the searchLocalMap2 projection matcher,
FrontEnd.cpp:4901) exactly like ops/match.py does — but collapses the
whole XLA chain into a single kernel.

WHY (TPU): the XLA formulation materializes the (M, N) distance matrix
to HBM and then streams it through ~8-10 small elementwise/reduction
passes (gate where, mask wheres, argmin x2, take_along, one-hot mask,
min). Each pass is a separate fused kernel with fixed launch overhead on
a latency-bound path; the round-4 chip bisection priced the two matmul+
match stages at ~2 ms/frame net of floor against a ~0.2 ms roofline.
This kernel computes, per 128-row tile:

    dist  = (256 - A @ B^T) / 2          (descriptor bit-planes, MXU bf16)
    d2    = Ahat @ Bhat                  (projection-gate distance, MXU f32)
    gated = where(d2 < thr2, dist, BIG)
    row best/second/argmin  (this tile's rows, full N)
    col running min/argmin  (accumulated across tiles in the output block)

so the (M, N) matrix lives only in VMEM and the HBM traffic is just the
descriptors, the gate factors and the (M,)/(N,) outputs.

Gate algebra: every pairwise pixel-distance gate used by the callers is
a low-rank quadratic in per-row and per-column factors (see
tracking_kernels._anchored_sq_px_dist), so the gate arrives here as an
(M, DG) x (DG, N) matmul. Row/column validity and "ungated column"
(pass-always) conditions are folded into the same factors as +-LARGE
bias terms (see tracking_kernels for the exact encodings), which keeps
the kernel mask-free.

Tie-breaking matches ops/match.best_two exactly: argmin takes the FIRST
minimizing index (within a tile via jnp.argmin; across tiles the earlier
tile wins at equal value). Distances are integers held exactly in f32,
so kernel-vs-XLA selection is bit-identical; only the f32 d2 matmul
rounding can differ from the XLA einsum at the gate boundary (same
equivalence class as any reduction reorder, see docs/PERF.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BITS = 256
BIGF = float(1 << 20)  # matches ops/match.BIG
# bias magnitude for validity folding: must dominate the largest raw d2
# (projections are clipped to +-1e5 -> d2 <= ~4e10) plus the 1e12
# behind-camera penalty already inside the gate factors
PASS_BIAS = 1e13


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(a_ref, ahat_ref, bt_ref, bhat_ref, row_ref, col_ref, *,
            thr2: float, tm: int, want_cols: bool):
    i = pl.program_id(0)
    a = a_ref[:]  # (TM, 256) bf16
    # NOTE: precision must stay DEFAULT for bf16 operands — the ambient
    # fp32 contract precision makes Mosaic reject the matmul ("Bad lhs
    # type"); bf16xbf16->f32 accumulate is exact for ±1 planes anyway.
    dot = jax.lax.dot_general(
        a, bt_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )  # (TM, N)
    dist = (BITS - dot) * 0.5
    d2 = jax.lax.dot_general(
        ahat_ref[:], bhat_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TM, N)
    gated = jnp.where(d2 < thr2, dist, BIGF)
    n = gated.shape[1]

    # row best / second / argmin (first index at ties, like jnp.argmin)
    idx = jnp.argmin(gated, axis=1).astype(jnp.int32)  # (TM,)
    best = jnp.min(gated, axis=1)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (tm, n), 1)
    second = jnp.min(
        jnp.where(col_iota == idx[:, None], BIGF, gated), axis=1
    )
    row_ref[0, :] = best
    row_ref[1, :] = second
    row_ref[2, :] = idx.astype(jnp.float32)

    if want_cols:
        # column running argmin across row tiles; earlier tiles (lower
        # row indices) win ties, matching argmin-over-axis-0 semantics
        tile_min = jnp.min(gated, axis=0)  # (N,)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (tm, n), 0)
        tile_arg = jnp.min(
            jnp.where(gated == tile_min[None, :], row_iota, jnp.int32(tm)),
            axis=0,
        ) + i * tm

        @pl.when(i == 0)
        def _():
            col_ref[0, :] = tile_min
            col_ref[1, :] = tile_arg.astype(jnp.float32)

        @pl.when(i > 0)
        def _():
            better = tile_min < col_ref[0, :]
            col_ref[1, :] = jnp.where(
                better, tile_arg.astype(jnp.float32), col_ref[1, :]
            )
            col_ref[0, :] = jnp.where(better, tile_min, col_ref[0, :])


@functools.partial(
    jax.jit, static_argnames=("thr2", "want_cols", "interpret")
)
def hamming_argmin2(
    a_planes: jax.Array,  # (M, 256) bf16 ±1 bit planes (query rows)
    bt_planes: jax.Array,  # (256, N) bf16 ±1 bit planes (targets, transposed)
    ahat: jax.Array,  # (M, DG) f32 row gate factors
    bhat: jax.Array,  # (DG, N) f32 column gate factors
    thr2: float,
    want_cols: bool = True,
    interpret: bool = False,
):
    """-> (row_best f32 (M,), row_second f32 (M,), row_idx int32 (M,),
    col_idx int32 (N,) or None).

    Pair (i, j) is admissible iff (ahat @ bhat)[i, j] < thr2; inadmissible
    pairs score BIGF. Callers encode row/col validity into ahat/bhat.
    """
    m, _ = a_planes.shape
    n = bt_planes.shape[1]
    tm = 128
    mp = _round_up(m, tm)
    np_ = _round_up(n, 128)
    dg = _round_up(ahat.shape[1], 8)
    if mp != m:
        a_planes = jnp.pad(a_planes, ((0, mp - m), (0, 0)))
        # padded rows: no bias needed — their outputs are sliced off and
        # they only affect col argmin, guarded below via +PASS_BIAS
        ahat = jnp.pad(ahat, ((0, mp - m), (0, 0)))
    if np_ != n:
        bt_planes = jnp.pad(bt_planes, ((0, 0), (0, np_ - n)))
        bhat = jnp.pad(bhat, ((0, 0), (0, np_ - n)))
    if dg != ahat.shape[1]:
        ahat = jnp.pad(ahat, ((0, 0), (0, dg - ahat.shape[1])))
        bhat = jnp.pad(bhat, ((0, dg - bhat.shape[0]), (0, 0)))
    if mp != m:
        # exclude padded ROWS from column argmin: give them a failing gate
        pad_row = (
            jnp.arange(mp, dtype=jnp.float32) >= m
        ).astype(jnp.float32)[:, None] * PASS_BIAS
        ahat = jnp.concatenate([ahat, pad_row], axis=1)
        bhat = jnp.concatenate(
            [bhat, jnp.ones((1, np_), jnp.float32)], axis=0
        )
        dg += 1
    if np_ != n:
        # exclude padded COLUMNS from row argmin likewise
        pad_col = (
            jnp.arange(np_, dtype=jnp.float32) >= n
        )[None, :].astype(jnp.float32) * PASS_BIAS
        bhat = jnp.concatenate([bhat, pad_col], axis=0)
        ahat = jnp.concatenate(
            [ahat, jnp.ones((mp, 1), jnp.float32)], axis=1
        )
        dg += 1

    grid = (mp // tm,)
    row_out, col_out = pl.pallas_call(
        functools.partial(
            _kernel, thr2=float(thr2), tm=tm, want_cols=want_cols
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, BITS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, dg), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BITS, np_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dg, np_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((3, tm), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, np_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3, mp), jnp.float32),
            jax.ShapeDtypeStruct((2, np_), jnp.float32),
        ),
        interpret=interpret,
    )(a_planes, ahat, bt_planes, bhat)
    row_best = row_out[0, :m]
    row_second = row_out[1, :m]
    row_idx = row_out[2, :m].astype(jnp.int32)
    col_idx = col_out[1, :n].astype(jnp.int32) if want_cols else None
    return row_best, row_second, row_idx, col_idx
