"""Grid-balanced keypoint selection from dense score maps.

Replaces (WHAT) the reference's quad-tree keypoint distribution
(DistributeOctTree, /root/reference/MCSlam/src/ORBextractor.cpp:554): the goal
there is spatial uniformity of the selected corners. TPU-native equivalent:
partition the image into fixed cells, take the top-k responses per cell
(one reshaped top_k), then take the global top-N over the per-cell survivors.
Static output shape (N keypoints + validity mask), no recursion.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def select_keypoints_subcell(
    score: jax.Array,
    num_points: int,
    sub: int = 8,
    per_sub: int = 2,
    approx: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Subcell-max variant of select_keypoints: per_sub candidates per
    sub x sub subcell, then the same global top-N.

    2x the candidate density of the default (cell=2*sub, per_cell=4) at
    per_sub=2, but a fundamentally cheaper dataflow on TPU: the per-cell
    top-4 needs the (G, cell^2) lane layout (a strided transpose of the
    whole score map) plus k iterations of max/argmax/mask (12 streaming
    passes); the subcell max is per_sub rounds of two multi-axis
    reductions straight off the (H, W) layout — max for the value, masked
    min-of-raster-index for the position — with no transpose. Round-4
    chip bisection ranked selection as the largest stage-A sub-kernel
    (~1.2 ms net, docs/onchip_r04/bisect_frame.out); this targets exactly
    that.

    per_sub=1 was measured first and REGRESSED the easy blob scenes
    (verify drive ATE 0.054 -> 0.094): blob corners cluster within one
    8 px subcell and strict one-per-subcell drops their neighbors.
    per_sub=2 restores cluster coverage (up to 8 per legacy 16 px cell — a
    candidate superset of the old scheme's 4) while keeping the
    transpose-free form. Deterministic in the scores with raster-order
    tie-breaking, so frame-to-frame stability matches the exact sort.
    """
    h, w = score.shape
    gh, gw = -(-h // sub), -(-w // sub)
    padded = jnp.pad(
        score, ((0, gh * sub - h), (0, gw * sub - w)), constant_values=0.0
    )
    cells = padded.reshape(gh, sub, gw, sub)
    ry = jax.lax.broadcasted_iota(jnp.int32, cells.shape, 1)
    rx = jax.lax.broadcasted_iota(jnp.int32, cells.shape, 3)
    rid = ry * sub + rx
    big = jnp.int32(sub * sub)
    gy = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 0) * sub
    gx = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 1) * sub
    resp_r, ys_r, xs_r = [], [], []
    for _ in range(per_sub):
        m = jnp.max(cells, axis=(1, 3))  # (gh, gw)
        # position of the first (raster-order) pixel attaining the max
        hit = cells == m[:, None, :, None]
        amin = jnp.min(jnp.where(hit, rid, big), axis=(1, 3))
        amin = jnp.minimum(amin, big - 1)  # empty cell -> (0,0), masked
        resp_r.append(m)
        ys_r.append(gy + amin // sub)
        xs_r.append(gx + amin % sub)
        # knock out the winner pixel for the next round
        cells = jnp.where(rid == amin[:, None, :, None], -jnp.inf, cells)

    flat_resp = jnp.stack(resp_r, -1).reshape(-1)
    flat_ys = jnp.stack(ys_r, -1).reshape(-1)
    flat_xs = jnp.stack(xs_r, -1).reshape(-1)
    n = min(num_points, flat_resp.shape[0])
    if approx and n < flat_resp.shape[0]:
        top_resp, top_arg = jax.lax.approx_max_k(
            flat_resp, n, recall_target=0.98
        )
    else:
        top_resp, top_arg = jax.lax.top_k(flat_resp, n)
    yx = jnp.stack([flat_ys[top_arg], flat_xs[top_arg]], axis=-1)
    valid = top_resp > 0.0
    yx = jnp.where(valid[:, None], yx, 0)
    if n < num_points:
        pad = num_points - n
        yx = jnp.pad(yx, ((0, pad), (0, 0)))
        top_resp = jnp.pad(top_resp, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    return yx.astype(jnp.int32), top_resp, valid


def select_keypoints(
    score: jax.Array,
    num_points: int,
    cell: int = 16,
    per_cell: int = 4,
    approx: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """score: (H, W) dense NMS'd score map -> spatially balanced keypoints.

    Returns (yx (N, 2) int32, resp (N,) float32, valid (N,) bool), where
    N = num_points; invalid slots have resp 0 and yx (0, 0).

    approx=True routes the global selection through the TPU's native
    ApproxTopK reduction (jax.lax.approx_max_k, recall ~0.98 per bucket
    analysis): unlike the reverted threshold+compaction scheme it is a
    deterministic function of the scores alone (same scores -> same
    picks), so frame-to-frame stability matches the exact sort; only a
    few near-boundary (lowest-response) candidates can differ from it.
    """
    h, w = score.shape
    gh, gw = -(-h // cell), -(-w // cell)
    padded = jnp.pad(
        score, ((0, gh * cell - h), (0, gw * cell - w)), constant_values=0.0
    )
    cells = padded.reshape(gh, cell, gw, cell).transpose(0, 2, 1, 3)
    cells = cells.reshape(gh * gw, cell * cell)

    k = min(per_cell, cell * cell)
    # per-cell top-k by iterative max+mask: k is tiny (<=4 in practice),
    # so k passes of (max, argmax, one-hot mask) beat the sort lax.top_k
    # lowers to on TPU
    if k <= 8:
        vals = cells
        lane = jnp.arange(cells.shape[1], dtype=jnp.int32)[None, :]
        rv, ra = [], []
        for _ in range(k):
            a = jnp.argmax(vals, axis=1).astype(jnp.int32)
            rv.append(jnp.max(vals, axis=1))
            ra.append(a)
            vals = jnp.where(lane == a[:, None], -jnp.inf, vals)
        cell_resp = jnp.stack(rv, axis=1)  # (G, k)
        cell_arg = jnp.stack(ra, axis=1)
    else:
        cell_resp, cell_arg = jax.lax.top_k(cells, k)  # (G, k)

    # flat pixel coordinates of every candidate
    cy = cell_arg // cell
    cx = cell_arg % cell
    gy = (jnp.arange(gh * gw, dtype=jnp.int32) // gw)[:, None]
    gx = (jnp.arange(gh * gw, dtype=jnp.int32) % gw)[:, None]
    ys = gy * cell + cy
    xs = gx * cell + cx

    flat_resp = cell_resp.reshape(-1)
    flat_ys = ys.reshape(-1)
    flat_xs = xs.reshape(-1)

    n = min(num_points, flat_resp.shape[0])
    if approx and n < flat_resp.shape[0]:
        top_resp, top_arg = jax.lax.approx_max_k(
            flat_resp, n, recall_target=0.98
        )
    else:
        top_resp, top_arg = jax.lax.top_k(flat_resp, n)
    yx = jnp.stack([flat_ys[top_arg], flat_xs[top_arg]], axis=-1)
    valid = top_resp > 0.0
    yx = jnp.where(valid[:, None], yx, 0)
    if n < num_points:
        pad = num_points - n
        yx = jnp.pad(yx, ((0, pad), (0, 0)))
        top_resp = jnp.pad(top_resp, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    return yx.astype(jnp.int32), top_resp, valid
