"""Masked brute-force descriptor matching on dense Hamming matrices.

Replaces (WHAT, not HOW) the reference's DBoW2-bucketed matchers:
  * getMatches_distRatio (/root/reference/MCSlam/src/ORBextractor.cpp:1228+)
  * BowMatching / BruteForceMatch (/root/reference/MCSlam/src/
    MultiCameraFrame.cpp:946,1024)
  * InterMatchingBow (/root/reference/MCSlam/src/FrontEnd.cpp:3905-3972)

The BoW buckets only exist to prune CPU work; on TPU the full matrix is one
matmul, so matching is: distance matrix -> best + second-best per row ->
mutual-best consistency -> distance threshold -> Lowe ratio test, all masked
and static-shape. Default thresholds mirror the reference constants
(TH_LOW=50..75, ratio 0.7..0.85, ORBextractor.h:26-28,90).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

BIG = jnp.int32(1 << 20)


class MatchResult(NamedTuple):
    """Row-aligned match table: for each of N query descriptors."""

    idx: jax.Array  # (N,) int32 index into the M target set (undefined if !ok)
    dist: jax.Array  # (N,) int32 best distance
    ok: jax.Array  # (N,) bool


def best_two(dists: jax.Array, axis: int = -1) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(…, M) -> (best_idx, best, second_best) along `axis`."""
    best_idx = jnp.argmin(dists, axis=axis)
    best = jnp.take_along_axis(dists, jnp.expand_dims(best_idx, axis), axis=axis)
    masked = jnp.where(
        jax.nn.one_hot(best_idx, dists.shape[axis], axis=axis, dtype=bool),
        BIG,
        dists,
    )
    second = jnp.min(masked, axis=axis)
    return best_idx.astype(jnp.int32), jnp.squeeze(best, axis), second


def match_mutual(
    dist_matrix: jax.Array,
    row_mask: jax.Array | None = None,
    col_mask: jax.Array | None = None,
    max_dist: int = 50,
    ratio: float = 0.85,
    pair_mask: jax.Array | None = None,
) -> MatchResult:
    """Mutual-best-match with distance threshold and Lowe ratio test.

    dist_matrix: (N, M) int distances. row/col_mask: validity of each side's
    descriptors. pair_mask: (N, M) extra gate (e.g. epipolar y-gap) applied
    before the search. Returns row-aligned MatchResult.
    """
    d = dist_matrix
    if pair_mask is not None:
        d = jnp.where(pair_mask, d, BIG)
    if row_mask is not None:
        d = jnp.where(row_mask[:, None], d, BIG)
    if col_mask is not None:
        d = jnp.where(col_mask[None, :], d, BIG)

    fwd_idx, fwd_best, fwd_second = best_two(d, axis=1)
    bwd_idx = jnp.argmin(d, axis=0).astype(jnp.int32)  # (M,)

    rows = jnp.arange(d.shape[0], dtype=jnp.int32)
    mutual = bwd_idx[fwd_idx] == rows
    passes_ratio = fwd_best.astype(jnp.float32) <= ratio * fwd_second.astype(
        jnp.float32
    )
    ok = mutual & (fwd_best <= max_dist) & passes_ratio
    if row_mask is not None:
        ok = ok & row_mask
    return MatchResult(idx=fwd_idx, dist=fwd_best, ok=ok)


def match_one_way(
    dist_matrix: jax.Array,
    row_mask: jax.Array | None = None,
    col_mask: jax.Array | None = None,
    max_dist: int = 50,
    ratio: float = 1.0,
    pair_mask: jax.Array | None = None,
) -> MatchResult:
    """Best-match per row without the mutual check (projection matching)."""
    d = dist_matrix
    if pair_mask is not None:
        d = jnp.where(pair_mask, d, BIG)
    if row_mask is not None:
        d = jnp.where(row_mask[:, None], d, BIG)
    if col_mask is not None:
        d = jnp.where(col_mask[None, :], d, BIG)
    idx, best, second = best_two(d, axis=1)
    ok = (best <= max_dist) & (
        best.astype(jnp.float32) <= ratio * second.astype(jnp.float32)
    )
    if row_mask is not None:
        ok = ok & row_mask
    return MatchResult(idx=idx, dist=best, ok=ok)


def topk_neighbors(
    dist_matrix: jax.Array, k: int, col_mask: jax.Array | None = None
) -> tuple[jax.Array, jax.Array]:
    """k nearest targets per row: -> (idx (N, k), dist (N, k)).

    Replaces the cv::flann KD-tree kNN queries of the reference fast-tracking
    module (/root/reference/MCSlam/src/Tracking.cpp:321-360) with top-k over a
    dense distance matrix.
    """
    d = dist_matrix
    if col_mask is not None:
        d = jnp.where(col_mask[None, :], d, BIG)
    neg_d, idx = jax.lax.top_k(-d.astype(jnp.float32), k)
    return idx.astype(jnp.int32), (-neg_d).astype(dist_matrix.dtype)
