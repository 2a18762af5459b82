"""Cross-camera intra-matching: group features across the rig that observe
the same 3D point.

Parity (WHAT): MultiCameraFrame::computeIntraMatches
(/root/reference/MCSlam/src/MultiCameraFrame.cpp:586-943) — the reference
walks per-camera DBoW2 feature vectors word-by-word, takes mutual-best
Hamming matches per camera pair with an epipolar y-gap gate and merges
conflicting chains.

TPU-native design (HOW, completely different):
  1. all C*(C-1)/2 camera pairs get a dense Hamming matrix (one batched
     popcount matmul), gated by the pairwise epipolar constraint (Sampson
     distance under the known rig essential geometry — strictly stronger
     than the reference's rectified y-gap heuristic) and mutual-best + ratio;
  2. chains (cam a <-> cam b <-> cam c) are merged by parallel pointer
     jumping on a (C, N) parent table — O(log C) vectorized steps replace
     the reference's sequential merge/override logic;
  3. groups are compacted to a fixed number of slots by priority top-k
     (more rays first, then response), keeping shapes static.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mcslam_tpu.geometry import lie
from mcslam_tpu.ops import hamming, match


class IntraGroups(NamedTuple):
    ray_idx: jax.Array  # (M, C) int32 keypoint index per camera, -1 = none
    desc: jax.Array  # (M, 8) uint32 representative descriptor
    valid: jax.Array  # (M,) bool


def pair_essential(rig, i: int, j: int) -> jax.Array:
    """Essential matrix E_ij s.t. x_i^T E x_j = 0 for normalized coords."""
    T_ij = rig.cam_T_ref[i] @ lie.se3_inverse(rig.cam_T_ref)[j]  # cam_i <- cam_j
    R = T_ij[:3, :3]
    t = T_ij[:3, 3]
    return lie.so3_hat(t) @ R


def sampson_gate(
    xn_i: jax.Array, xn_j: jax.Array, E: jax.Array, thresh: float
) -> jax.Array:
    """(Ni, 2) x (Nj, 2) normalized coords -> (Ni, Nj) bool Sampson-distance
    gate under essential matrix E (x_i^T E x_j = 0)."""
    ones_i = jnp.ones_like(xn_i[:, :1])
    ones_j = jnp.ones_like(xn_j[:, :1])
    hi = jnp.concatenate([xn_i, ones_i], axis=-1)  # (Ni, 3)
    hj = jnp.concatenate([xn_j, ones_j], axis=-1)  # (Nj, 3)
    Exj = hj @ E.T  # (Nj, 3)
    Ethi = hi @ E  # (Ni, 3)
    num = (hi @ Exj.T) ** 2  # (Ni, Nj)
    den = (
        Exj[None, :, 0] ** 2
        + Exj[None, :, 1] ** 2
        + Ethi[:, None, 0] ** 2
        + Ethi[:, None, 1] ** 2
    )
    return num / jnp.maximum(den, 1e-12) < thresh**2


def intra_match(
    desc: jax.Array,  # (C, N, 8) uint32
    xy_ud: jax.Array,  # (C, N, 2) undistorted pixels
    valid: jax.Array,  # (C, N) bool
    response: jax.Array,  # (C, N)
    rig,
    max_out: int = 2048,
    max_dist: int = 60,
    ratio: float = 0.85,
    sampson_px: float = 3.0,
) -> IntraGroups:
    C, N = desc.shape[:2]

    # normalized coords for the epipolar gate
    f = rig.fxycxy[:, None, :]
    xn = (xy_ud - f[..., 2:]) / f[..., :2]  # (C, N, 2)
    # sampson threshold in normalized units (approx: pixels / focal)
    mean_f = jnp.mean(rig.fxycxy[:, 0])
    thr_n = sampson_px / mean_f

    planes = hamming.to_planes(desc.reshape(C * N, 8)).reshape(C, N, hamming.BITS)

    # parent[c, n] = flat index of the matched feature in the LOWEST camera
    # index that matched n; initialized to self.
    flat_self = (
        jnp.arange(C * N, dtype=jnp.int32).reshape(C, N)
    )
    parent = flat_self

    # all camera pairs processed by ONE vmapped matcher (an unrolled pair
    # loop multiplied trace/compile time ~P-fold; remote TPU compiles are
    # minutes, so this matters more than usual)
    pair_i = [i for i in range(C - 1) for _ in range(i + 1, C)]
    pair_j = [j for i in range(C - 1) for j in range(i + 1, C)]
    P = len(pair_i)
    if P:
        Ii = jnp.asarray(pair_i, jnp.int32)
        Jj = jnp.asarray(pair_j, jnp.int32)
        E_all = jnp.stack(
            [pair_essential(rig, i, j) for i, j in zip(pair_i, pair_j)]
        )

        def match_pair(pi, pj, E):
            d = hamming.hamming_from_planes(planes[pi], planes[pj])
            gate = sampson_gate(xn[pi], xn[pj], E, thr_n)
            res = match.match_mutual(
                d, row_mask=valid[pi], col_mask=valid[pj],
                max_dist=max_dist, ratio=ratio, pair_mask=gate,
            )
            # candidate parent for each cam-pj feature: the flat index of
            # its matched cam-pi feature. The row->col inversion is a dense
            # equality + first-true reduce instead of a scatter-min (TPU
            # scatters trace/compile to serialized emulation; mutual-best
            # makes the mapping 1-1, and argmax picks the lowest row =
            # the old scatter-min result even under duplicates).
            eq = res.ok[:, None] & (
                res.idx[:, None] == jnp.arange(N, dtype=jnp.int32)[None, :]
            )  # (N rows, N cols)
            row = jnp.argmax(eq, axis=0).astype(jnp.int32)
            return jnp.where(
                jnp.any(eq, axis=0), flat_self[pi][row], jnp.int32(C * N)
            )  # (N,)

        cands = jax.vmap(match_pair)(Ii, Jj, E_all)  # (P, N)
        # combine per target camera: min flat index over all incoming pairs
        # == "lowest camera wins" of the reference's sequential merge.
        # Rows are rebuilt and stacked (static layout) rather than written
        # with .at[j].set — each in-place row write lowers to a scatter.
        rows = [flat_self[0]]
        for j in range(1, C):
            sel = [p for p in range(P) if pair_j[p] == j]
            if not sel:
                rows.append(flat_self[j])
                continue
            best = cands[sel[0]]
            for p in sel[1:]:
                best = jnp.minimum(best, cands[p])
            take = best < flat_self[j]  # found a lower-camera parent
            rows.append(jnp.where(take, best, flat_self[j]))
        parent = jnp.stack(rows)

    # pointer jumping: resolve chains to their root (<= C hops, log2 steps)
    flat_parent = parent.reshape(C * N)
    for _ in range(3):  # 2^3 = 8 >= C_max hops
        flat_parent = flat_parent[flat_parent]

    # roots: features whose parent is themselves
    flat_valid = valid.reshape(C * N)
    is_root = (flat_parent == jnp.arange(C * N, dtype=jnp.int32)) & flat_valid

    # Group-table construction is fully DENSE (equality compares + reduces):
    # the earlier scatter-max formulation of ray_idx[r, c] traced fine but
    # compiled to minutes-long serialized scatter emulation on the remote
    # TPU backend. Per-camera presence and the per-slot ray table are
    # regular (rows, N) compare/reduce sweeps instead — identical outputs.
    parent_cn = flat_parent.reshape(C, N)
    root_ids = jnp.arange(C * N, dtype=jnp.int32)

    def _cam_presence(parent_c, valid_c):
        # (C*N,) bool: does camera c contribute a ray to root r?
        eq = (parent_c[None, :] == root_ids[:, None]) & valid_c[None, :]
        return jnp.any(eq, axis=1)

    pres = jax.vmap(_cam_presence)(parent_cn, valid)  # (C, C*N)
    n_rays = jnp.sum(pres, axis=0)  # cameras with a ray, as before

    flat_resp = response.reshape(C * N)
    # priority: many-ray groups first, then strong responses
    priority = jnp.where(
        is_root, n_rays.astype(jnp.float32) * 1e3 + flat_resp, -1.0
    )
    k = min(max_out, C * N)
    top_p, top_i = jax.lax.top_k(priority, k)
    out_valid = top_p > 0.0

    def _cam_rays(parent_c, valid_c):
        # (k,) int32: the feature index in camera c whose root is top_i[m]
        # (max over duplicates = the old scatter-max tie rule), -1 if none
        eq = (parent_c[None, :] == top_i[:, None]) & valid_c[None, :]
        return jnp.max(
            jnp.where(eq, jnp.arange(N, dtype=jnp.int32)[None, :], -1),
            axis=1,
        )

    table_k = jax.vmap(_cam_rays)(parent_cn, valid).T  # (k, C)
    ray_idx = jnp.where(out_valid[:, None], table_k, -1)
    out_desc = desc.reshape(C * N, 8)[top_i]
    if k < max_out:
        pad = max_out - k
        ray_idx = jnp.pad(ray_idx, ((0, pad), (0, 0)), constant_values=-1)
        out_desc = jnp.pad(out_desc, ((0, pad), (0, 0)))
        out_valid = jnp.pad(out_valid, (0, pad))
    return IntraGroups(ray_idx=ray_idx, desc=out_desc, valid=out_valid)
